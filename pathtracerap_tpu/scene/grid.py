"""Uniform-grid acceleration structure builder (host side, vectorized numpy).

Reproduces the reference's per-mesh 25^3 grid build (``Scene.cpp:318-396``):
each triangle's AABB is conservatively rasterized into the overlapping voxel
range (``computeVoxelIndex``, ``Scene.cpp:293-316``) and voxel buckets are
flattened CSR-style into ``per_voxel_tris`` with per-voxel index ranges.

The reference builds this with a triple-nested scalar loop per triangle; here
the stamping is fully vectorized (repeat + cartesian-decode + lexsort), which
is what makes the build fast enough in Python for large meshes.  Bucket
ordering matches the reference exactly: entries within a voxel appear in
ascending triangle order, because the reference's outer loop iterates
triangles in order (``Scene.cpp:349-375``) and a stable sort by voxel
preserves that.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class UniformGrid:
    voxel_width: np.ndarray  # (3,) f32
    voxel_tri_start: np.ndarray  # (GX*GY*GZ,) i32 CSR starts
    voxel_tri_count: np.ndarray  # (GX*GY*GZ,) i32
    tri_indices: np.ndarray  # (P,) i32 flattened bucket contents
    dims: tuple


def build_uniform_grid(
    tri_verts: np.ndarray,
    bbox_min: np.ndarray,
    bbox_max: np.ndarray,
    dims: tuple = (25, 25, 25),
    tri_index_base: int = 0,
    backend: str = "auto",
) -> UniformGrid:
    """Build one mesh's grid.

    Args:
      tri_verts: (T, 3, 3) triangle vertex positions in model space.
      bbox_min/bbox_max: (3,) mesh AABB (the grid covers exactly the AABB,
        ``Scene.cpp:341-347``).
      dims: grid resolution (gx, gy, gz).
      tri_index_base: value added to local triangle indices so bucket entries
        are global triangle ids (the reference stores global pool indices,
        ``Scene.cpp:371``).
      backend: "auto" prefers the native C++ builder (native/ptap_native.cc)
        and falls back to vectorized numpy; "native" requires it; "python"
        forces numpy.  Outputs are identical (tests/test_native.py).
    """
    if backend != "python":
        from .. import native as _native

        if _native.available():
            tv = np.asarray(tri_verts, dtype=np.float32)
            width, starts, counts, indices = _native.build_grid_native(
                tv.reshape(-1, 9) if tv.ndim == 3 else tv,
                np.asarray(bbox_min, np.float32),
                np.asarray(bbox_max, np.float32),
                dims,
                tri_index_base,
            )
            return UniformGrid(
                voxel_width=width,
                voxel_tri_start=starts,
                voxel_tri_count=counts,
                tri_indices=indices,
                dims=dims,
            )
        if backend == "native":
            raise RuntimeError("native grid backend requested but unavailable")
    gx, gy, gz = dims
    n_voxels = gx * gy * gz
    tri_verts = np.asarray(tri_verts, dtype=np.float32)
    t = tri_verts.shape[0]
    bbox_min = np.asarray(bbox_min, dtype=np.float32)
    bbox_max = np.asarray(bbox_max, dtype=np.float32)

    extent = bbox_max - bbox_min
    voxel_width = (extent / np.array(dims, dtype=np.float32)).astype(np.float32)
    # Guard degenerate (planar) meshes; the reference would divide by zero.
    safe_width = np.where(voxel_width > 0, voxel_width, np.float32(1e-30))

    if t == 0:
        return UniformGrid(
            voxel_width=voxel_width,
            voxel_tri_start=np.zeros(n_voxels, np.int32),
            voxel_tri_count=np.zeros(n_voxels, np.int32),
            tri_indices=np.zeros(0, np.int32),
            dims=dims,
        )

    t_min = tri_verts.min(axis=1)  # (T, 3)
    t_max = tri_verts.max(axis=1)

    # floor(abs(bb_min - t_min) / width), clamped — Scene.cpp:300-315.
    lo = np.floor(np.abs(bbox_min[None, :] - t_min) / safe_width[None, :]).astype(np.int64)
    hi = np.floor(np.abs(bbox_min[None, :] - t_max) / safe_width[None, :]).astype(np.int64)
    dims_arr = np.array(dims, dtype=np.int64)
    lo = np.clip(lo, 0, dims_arr - 1)
    hi = np.clip(hi, 0, dims_arr - 1)

    counts = hi - lo + 1  # (T, 3) voxel span per axis
    per_tri = counts.prod(axis=1)  # (T,)
    total = int(per_tri.sum())

    tri_ids = np.repeat(np.arange(t, dtype=np.int64), per_tri)
    starts = np.concatenate([[0], np.cumsum(per_tri)[:-1]])
    k = np.arange(total, dtype=np.int64) - starts[tri_ids]

    nx = counts[tri_ids, 0]
    ny = counts[tri_ids, 1]
    ix = lo[tri_ids, 0] + k % nx
    iy = lo[tri_ids, 1] + (k // nx) % ny
    iz = lo[tri_ids, 2] + k // (nx * ny)
    voxel_flat = ix + iy * gx + iz * gx * gy

    order = np.lexsort((tri_ids, voxel_flat))
    sorted_voxels = voxel_flat[order]
    sorted_tris = tri_ids[order]

    voxel_tri_count = np.bincount(sorted_voxels, minlength=n_voxels).astype(np.int32)
    voxel_tri_start = np.zeros(n_voxels, np.int32)
    np.cumsum(voxel_tri_count[:-1], out=voxel_tri_start[1:])

    return UniformGrid(
        voxel_width=voxel_width,
        voxel_tri_start=voxel_tri_start,
        voxel_tri_count=voxel_tri_count,
        tri_indices=(sorted_tris + tri_index_base).astype(np.int32),
        dims=dims,
    )


def grids_to_ell(
    voxel_tri_start: np.ndarray,
    voxel_tri_count: np.ndarray,
    per_voxel_tris: np.ndarray,
    pad_multiple: int = 8,
) -> np.ndarray:
    """Convert the CSR voxel buckets to a padded ELL matrix (NV, K).

    Rows are padded with -1; K is the max bucket size rounded up to
    ``pad_multiple`` (sublane alignment for the traversal gather).
    """
    nv = voxel_tri_start.shape[0]
    k_max = int(voxel_tri_count.max()) if nv else 0
    k = max(pad_multiple, -(-k_max // pad_multiple) * pad_multiple)
    ell = np.full((nv, k), -1, dtype=np.int32)
    # Vectorized scatter: row r gets per_voxel_tris[start[r] : start[r]+count[r]].
    total = int(voxel_tri_count.sum())
    if total:
        rows = np.repeat(np.arange(nv, dtype=np.int64), voxel_tri_count)
        within = np.arange(total, dtype=np.int64) - np.repeat(
            voxel_tri_start.astype(np.int64), voxel_tri_count
        )
        ell[rows, within] = per_voxel_tris[
            np.repeat(voxel_tri_start.astype(np.int64), voxel_tri_count) + within
        ]
    return ell
