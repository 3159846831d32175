"""MXU traversal engine: Pluecker-coordinate ray/triangle tests as matmuls.

This is the TPU-first redesign of the reference's traversal
(``Renderer.cpp:363-409``).  Two observations make it possible:

1. The reference shades with a *flat* per-triangle normal (average of the
   three vertex normals, ``Renderer.cpp:203``), so no barycentric
   coordinates are needed downstream — a hit is fully described by
   (distance, triangle id).
2. The Moeller-Trumbore edge tests are, in Pluecker coordinates, *bilinear*
   in (ray, triangle): with per-ray ``W = [dir, orig x dir]`` (6 floats) and
   per-edge ``[p x q; q - p]`` (6 floats), the signed side value is a plain
   dot product.  Testing a wavefront of N rays against T triangles is then
   one ``(N, 6) @ (6, 3T)`` matmul — exactly what the TPU's systolic array
   is built for — followed by cheap elementwise sign logic and an argmin.

The three side values satisfy ``s_ab + s_bc + s_ca = dir . n`` (n the
geometric normal), so the M-T determinant and barycentrics fall out for
free:  ``det = sum(s)``, ``u = s_ca / det``, ``v = s_ab / det``, and
``t = (d_plane - orig . n) / det`` — two more small matmuls.  The
reference's epsilon tests on (u, v, u+v, t) are applied verbatim (they are
unitless or world-unit quantities).

All model instances are baked into one world-space soup (per-mesh grids and
per-model ray transforms disappear; the reference's 11-model loop becomes a
single matmul sweep).  Rays are processed in chunks to bound the (chunk, 3T)
intermediate.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .. import constants
from ..scene.types import SceneDevice, WorldTriangles
from .intersect import HitRecord
from .math import inv3x3, normalize, normalize_guarded

F_MAX = constants.FLOAT_MAX
EPS = constants.EPSILON


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _morton3(p: jax.Array, lo: jax.Array, hi: jax.Array) -> jax.Array:
    """30-bit Morton code of points ``p`` (T, 3) within AABB [lo, hi]."""
    q = jnp.clip(
        (p - lo) / jnp.maximum(hi - lo, 1e-30) * 1023.0, 0.0, 1023.0
    ).astype(jnp.int32)

    def spread(x):
        x = (x | (x << 16)) & 0x030000FF
        x = (x | (x << 8)) & 0x0300F00F
        x = (x | (x << 4)) & 0x030C30C3
        x = (x | (x << 2)) & 0x09249249
        return x

    return (spread(q[:, 0]) << 2) | (spread(q[:, 1]) << 1) | spread(q[:, 2])


def bake_world_triangles(
    scene: SceneDevice, pad_to: int = 128, fused_tile: int | None = 512,
    ring_shards: int | None = None,
) -> WorldTriangles:
    """Bake all model instances into a world-space triangle soup.

    Pure jnp so gradients flow back to ``scene.vertex_pos`` /
    ``scene.model_to_world`` / material colors (inverse rendering).

    Triangles are sorted by the Morton code of their world centroid, so
    contiguous runs are spatially coherent — the culling granularity of the
    traversal kernels (cluster/block AABBs) tightens from "whichever
    triangles the models happened to emit adjacently" to real spatial
    locality.  Hit results are order-independent (nearest-t reduction;
    exact-t ties resolve to the lowest triangle index in every engine).

    ``fused_tile`` additionally emits the fused (16, 4*T) operand pack +
    per-block AABBs for the worklist pallas kernel (see
    ``WorldTriangles.fused_ops``); ``None`` skips them.

    ``ring_shards=D`` bakes for the geometry-sharded ring (parallel/
    geometry.py): the triangle axis is padded to ``D * fused_tile`` so the
    fused pack splits into D equal contiguous block groups, and
    ``block_aabb`` keeps its padding blocks as NaN rows (every slab/frustum
    comparison with NaN is false, so worklist builders can never select
    them) instead of truncating — truncation would break the equal-shard
    layout.
    """
    src = scene.world_tri_src
    mdl = scene.world_tri_model
    # model-alignment padding entries carry src == -1: their vertices are
    # zeroed (degenerate triangle, det always 0 => never accepted)
    src_valid = (src >= 0).astype(jnp.float32)[:, None]
    vidx = scene.tri_vidx[jnp.maximum(src, 0)]  # (Tw, 3)

    m2w = scene.model_to_world[mdl]  # (Tw, 4, 4)
    rot = m2w[:, :3, :3]
    trans = m2w[:, :3, 3]

    def xform(p):  # (Tw, 3) model-space points
        return (jnp.einsum("tij,tj->ti", rot, p) + trans) * src_valid

    a = xform(scene.vertex_pos[vidx[:, 0]])
    b = xform(scene.vertex_pos[vidx[:, 1]])
    c = xform(scene.vertex_pos[vidx[:, 2]])

    # Pluecker edge columns [p x q ; q - p] for edges (a,b), (b,c), (c,a)
    def edge(p, q):
        return jnp.concatenate([jnp.cross(p, q), q - p], axis=-1)  # (Tw, 6)

    e_ab = edge(a, b)
    e_bc = edge(b, c)
    e_ca = edge(c, a)

    n = jnp.cross(b - a, c - a)
    d_plane = jnp.sum(n * a, axis=-1)

    # shading normal: inverse-transpose of the per-model 3x3 applied to the
    # averaged vertex normal (Renderer.cpp:203,397 + utility.h:82-88)
    inv_t = jnp.transpose(inv3x3(scene.model_to_world[:, :3, :3]), (0, 2, 1))
    navg = (
        scene.vertex_nrm[vidx[:, 0]]
        + scene.vertex_nrm[vidx[:, 1]]
        + scene.vertex_nrm[vidx[:, 2]]
    ) * (1.0 / 3.0)
    navg = jnp.where(src_valid > 0, navg, jnp.array([1.0, 0.0, 0.0]))
    shade_n = normalize_guarded(jnp.einsum("tij,tj->ti", inv_t[mdl], navg))

    mat_type = scene.mat_type[mdl]
    mat_color = scene.mat_color[mdl]
    mat_ri = (
        scene.mat_refractive_index[mdl]
        if scene.mat_refractive_index is not None
        else jnp.full(mdl.shape, 1.5, jnp.float32)
    )
    tri_model = mdl

    # Sort world triangles into (fat | small-by-Morton | padding) order:
    #
    # * "fat" triangles (extent above ~15% of the scene diagonal — the
    #   enclosing-box walls, Scene.cpp:57-70) would poison every Morton
    #   block's AABB they land in, making block culling useless (measured:
    #   7.2/8 blocks slab-reachable per primary tile with a global Morton
    #   sort).  They get their own leading block(s).
    # * fat-FIRST visit order seeds every ray's running best_t with a wall
    #   hit on the first visit, so the per-visit `tmin <= best_t + margin`
    #   test prunes the tight blocks behind it — the wavefront analog of
    #   the reference's DDA early-exit (Renderer.cpp:326-329), still
    #   conservative.
    # * ties stay consistent across engines because every engine breaks
    #   exact-t ties by lowest index IN THIS BAKED ORDER.
    centroid = (a + b + c) * (1.0 / 3.0)
    scene_lo = jnp.min(jnp.where(src_valid > 0, centroid, F_MAX), axis=0)
    scene_hi = jnp.max(jnp.where(src_valid > 0, centroid, -F_MAX), axis=0)
    code = _morton3(centroid, scene_lo, scene_hi)
    tmin_ = jnp.minimum(jnp.minimum(a, b), c)
    tmax_ = jnp.maximum(jnp.maximum(a, b), c)
    diag_t = jnp.linalg.norm(tmax_ - tmin_, axis=-1)
    diag_s = jnp.linalg.norm(jnp.maximum(scene_hi - scene_lo, 1e-30))
    fat = diag_t > 0.15 * diag_s
    klass = jnp.where(
        src_valid[:, 0] > 0, jnp.where(fat, 0, 1), 2
    ).astype(jnp.int32)
    perm = jnp.argsort(code, stable=True)
    perm = perm[jnp.argsort(klass[perm], stable=True)]
    (a, b, c, e_ab, e_bc, e_ca, n, d_plane, shade_n, mat_type, mat_color,
     mat_ri, src_valid, tri_model) = (
        x[perm]
        for x in (a, b, c, e_ab, e_bc, e_ca, n, d_plane, shade_n, mat_type,
                  mat_color, mat_ri, src_valid, tri_model)
    )

    tw = a.shape[0]
    # static real-triangle count (model-padding rows sort last): the soup's
    # leading n_world_valid rows are the hittable triangles
    n_world_valid = int(scene.n_world_valid) or tw
    # The fused operand pack is held whole in VMEM by the worklist kernel
    # and the megakernel: (16, 4T) f32 = 256 bytes/triangle, so 131k
    # triangles cost ~34 MB — alongside the attr rows and the (R, 4*TB)
    # compute transients the pack fits the 100 MB scoped-VMEM budget up to
    # ~160k triangles (42 MB pack + 10 MB attrs; v5e has 128 MB physical).
    # Beyond that, big scenes fall back to the dense blocked-DMA kernel
    # (fused_ops=None path).
    # r4: the worklist kernels stream per-visit slabs from HBM above ~313
    # blocks (megakernel.STREAM_BLOCKS), so the pack no longer needs to fit
    # VMEM — the r3 cap of 160k triangles becomes a ~2M-triangle HBM
    # budget cap (pack 512 MB + attrs 128 MB).  Beyond it, the dense
    # blocked-DMA kernel remains the fallback.
    if fused_tile is not None and tw > 2_097_152 and ring_shards is None:
        fused_tile = None
    if fused_tile is not None:
        assert fused_tile % pad_to == 0, (fused_tile, pad_to)
        pad_to = fused_tile * (ring_shards or 1)
    t_pad = _round_up(tw, pad_to)
    pad = t_pad - tw

    def padt(x, value=0.0):
        cfg = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, cfg, constant_values=value)

    # edge-major layout: (3 edges, 6, T) — three clean (N,6)@(6,T) matmuls
    # per chunk instead of one (N,6)@(6,3T) followed by lane-strided slicing
    # (strided lane access forces TPU relayouts and destabilizes fusion)
    edge_pluecker = jnp.stack(
        [padt(e_ab).T, padt(e_bc).T, padt(e_ca).T], axis=0
    )  # (3, 6, T)
    # matmul-ready packs (K padded to 8 for clean MXU/VMEM tiling):
    edge_mat = jnp.pad(edge_pluecker, ((0, 0), (0, 2), (0, 0)))
    plane_mat = jnp.concatenate(
        [padt(n).T, padt(d_plane)[None, :], jnp.zeros((4, t_pad), jnp.float32)], axis=0
    )  # (8, T)

    # per-128-triangle cluster AABBs for in-kernel block culling; padding
    # triangles contribute an inverted AABB (min=+FMAX, max=-FMAX) that no
    # slab test can hit, so pure-padding clusters are always skipped
    tri_min = jnp.where(src_valid > 0, jnp.minimum(jnp.minimum(a, b), c), F_MAX)
    tri_max = jnp.where(src_valid > 0, jnp.maximum(jnp.maximum(a, b), c), -F_MAX)
    tri_min = jnp.concatenate(
        [tri_min, jnp.full((pad, 3), F_MAX, jnp.float32)], axis=0
    ).reshape(-1, 128, 3)
    tri_max = jnp.concatenate(
        [tri_max, jnp.full((pad, 3), -F_MAX, jnp.float32)], axis=0
    ).reshape(-1, 128, 3)
    cl_min = tri_min.min(axis=1)  # (T/128, 3)
    cl_max = tri_max.max(axis=1)
    # Inflate spatially: the EPSILON-slack barycentric accept (u, v down to
    # -EPS, Renderer.cpp:193-197) admits hit points up to ~2*EPS*edge_length
    # OUTSIDE the triangle — and at grazing angles no t-space margin can
    # cover a spatial miss, so the slack must be baked into the boxes.
    diag = jnp.linalg.norm(jnp.maximum(cl_max - cl_min, 0.0), axis=-1, keepdims=True)
    # scale-relative absolute term (fp slab error grows with coordinate
    # magnitude); EPSILON itself is an absolute reference constant
    scene_diag = jnp.linalg.norm(jnp.maximum(scene_hi - scene_lo, 0.0))
    pad_sp = 2.0 * EPS * diag + 1e-5 * scene_diag + 1e-6
    cl_min = cl_min - pad_sp
    cl_max = cl_max + pad_sp
    cluster_aabb = jnp.concatenate(
        [cl_min.T, cl_max.T, jnp.zeros((2, cl_min.shape[0]), jnp.float32)], axis=0
    )  # (8, T/128)

    fused_ops = block_aabb = attr_rows = sub_aabb = None
    if fused_tile is not None:
        nb = t_pad // fused_tile
        # fused (16, 4*T) pack: per block, columns [ab | bc | ca | plane];
        # rows match the ray vector [d, o x d, o, -1, alive, 0...] — see
        # WorldTriangles.fused_ops.  Edge columns live in rows 0-5, the
        # plane column in rows 6-9 (negated so the product is t*det).
        z10 = jnp.zeros((10, t_pad), jnp.float32)
        q_edges = [jnp.concatenate([edge_mat[k, 0:6], z10], axis=0) for k in range(3)]
        q_plane = jnp.concatenate(
            [
                jnp.zeros((6, t_pad), jnp.float32),
                -plane_mat[0:3],
                -plane_mat[3:4],
                jnp.zeros((6, t_pad), jnp.float32),
            ],
            axis=0,
        )
        fused_ops = (
            jnp.stack(q_edges + [q_plane], axis=0)  # (4, 16, T)
            .reshape(4, 16, nb, fused_tile)
            .transpose(1, 2, 0, 3)  # (16, nb, 4, TB)
            .reshape(16, 4 * t_pad)
        )
        # per-block AABBs with the same EPSILON-slack inflation as the
        # cluster boxes (pure-padding blocks stay inverted => never hit);
        # the absolute term is scale-relative (1e-5 of the block diagonal
        # floor'd at 1e-6) so millimeter- and kilometer-scale scenes get
        # proportionate slack instead of a fixed world-unit constant.
        b_min = tri_min.reshape(nb, -1, 3).min(axis=1)
        b_max = tri_max.reshape(nb, -1, 3).max(axis=1)
        b_diag = jnp.linalg.norm(
            jnp.maximum(b_max - b_min, 0.0), axis=-1, keepdims=True
        )
        b_pad = 2.0 * EPS * b_diag + 1e-5 * scene_diag + 1e-6
        block_aabb = jnp.concatenate(
            [b_min - b_pad, b_max + b_pad, jnp.zeros((nb, 2), jnp.float32)], axis=-1
        )  # (nb, 8)
        # Drop PURE-padding blocks structurally: their "inverted" AABB is
        # not unhittable under the min/max-swapped slab test (the swap
        # turns [+FMAX, -FMAX] into an always-hit ±inf box) — with them in
        # the table every ray tile paid full visits to empty blocks.  Real
        # triangles come first in the soup (fat | Morton | padding order),
        # so the real blocks are exactly the leading ceil(n_valid / TB).
        nb_real = -(-n_world_valid // fused_tile)
        # 128-triangle sub-block AABBs for the r5 sub-granularity worklists
        # (same inflated boxes as cluster_aabb, row-major).  Pure-padding
        # clusters (the soup's trailing rows) become NaN — the worklist
        # builders reject NaN for free in both branches, unlike the
        # inverted [F_MAX, -F_MAX] box, which the min/max-swapped slab
        # test always hits (the r3 phantom-block lesson).
        nsb_real = -(-n_world_valid // 128)
        sub_aabb = jnp.concatenate(
            [cl_min, cl_max, jnp.zeros((cl_min.shape[0], 2), jnp.float32)],
            axis=-1,
        )  # (nsb, 8)
        sub_row = jax.lax.broadcasted_iota(jnp.int32, sub_aabb.shape, 0)
        sub_aabb = jnp.where(sub_row < nsb_real, sub_aabb, jnp.nan)
        if ring_shards is None:
            block_aabb = block_aabb[:nb_real]
        else:
            # equal-shard layout: keep all nb rows, neutralize the
            # pure-padding ones with NaN (slab/frustum tests with NaN are
            # false, so no worklist ever selects them — unlike the inverted
            # AABB, which the min/max-swapped slab test always hits)
            row = jax.lax.broadcasted_iota(jnp.int32, block_aabb.shape, 0)
            block_aabb = jnp.where(row < nb_real, block_aabb, jnp.nan)
        # per-triangle shading attribute rows (16, T) for the megakernel's
        # in-kernel argmin select — ONE lane-contracted
        # ``dot_general(onehot (R, TB), slab (16, TB))`` HIGHEST-precision
        # MXU matmul per visit instead of 7+ VPU masked reductions.  Rows:
        # [shade_n(0:3), mat_type(3), rgb(4:7), geom_n(7:10), idx+1(10),
        # refractive_index(11), 0(12:16)].  Row 10 carries the global triangle index + 1 (exact
        # in f32 for any pack-sized scene) — the frozen-topology output the
        # differentiable replay consumes (diff/fast.py).  Row-major (16, T)
        # rather than (T, 16): the per-visit slab slice is then on the LANE
        # dimension, which Mosaic supports with DYNAMIC (worklist) starts.
        geom_n = normalize_guarded(n)
        attr_rows = jnp.concatenate(
            [
                padt(shade_n).T,
                padt(mat_type.astype(jnp.float32))[None, :],
                padt(mat_color).T,
                padt(geom_n).T,
                (jnp.arange(t_pad, dtype=jnp.float32) + 1.0)[None, :],
                padt(mat_ri)[None, :],  # row 11: refractive index (r5)
                jnp.zeros((4, t_pad), jnp.float32),
            ],
            axis=0,
        )  # (16, T)

    return WorldTriangles(
        edge_pluecker=edge_pluecker,
        edge_mat=edge_mat,
        plane_mat=plane_mat,
        cluster_aabb=cluster_aabb,
        plane_n=padt(n),
        plane_d=padt(d_plane),
        shade_normal=padt(shade_n),
        mat_type=padt(mat_type).astype(jnp.int32),
        mat_color=padt(mat_color),
        mat_ri=padt(mat_ri, value=1.5),
        valid=jnp.pad(src_valid[:, 0], (0, pad)),
        v0=padt(a),
        e1=padt(b - a),
        e2=padt(c - a),
        fused_ops=fused_ops,
        block_aabb=block_aabb,
        attr_rows=attr_rows,
        sub_aabb=sub_aabb,
        tri_block=fused_tile or 0,
        n_valid=n_world_valid,
        tri_model=padt(tri_model).astype(jnp.int32),
        mat_table=scene.mat_color,
    )


def _trace_chunk(world: WorldTriangles, ro, rd_n):
    """Intersect one chunk of rays against the full soup.

    ro, rd_n: (n, 3) with rd_n normalized.  Returns (t (n,), tri_idx (n,)).
    """
    w = jnp.concatenate([rd_n, jnp.cross(ro, rd_n)], axis=-1)  # (n, 6)

    def side(e):
        # HIGHEST: TPU "default" f32 matmul is single-pass bf16 (~3e-3 rel
        # error — at scene scale that swamps the 0.1 spawn offset,
        # Renderer.cpp:437, causing self-intersection acne)
        return jax.lax.dot_general(
            w,
            world.edge_pluecker[e],
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )  # (n, T)

    s_ab, s_bc, s_ca = side(0), side(1), side(2)
    det = s_ab + s_bc + s_ca  # = dir . n
    # safe division: padding/parallel triangles have det == 0; dividing by
    # it poisons reverse-mode AD with NaN through the jnp.where (the
    # standard "double where" rule), so neutralize the denominator first.
    parallel = det == 0.0
    inv_det = 1.0 / jnp.where(parallel, 1.0, det)
    u = s_ca * inv_det  # weight of vertex b
    v = s_ab * inv_det  # weight of vertex c

    # t from the plane equation; dir . n == det (no extra matmul needed)
    o_dot_n = jax.lax.dot_general(
        ro,
        world.plane_n.T,
        dimension_numbers=(((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )  # (n, T)
    t = (world.plane_d[None, :] - o_dot_n) * inv_det

    accept = (
        ~parallel
        & ~(u < -EPS)
        & ~(u > 1.0 + EPS)
        & ~(v < -EPS)
        & ~(u + v > 1.0 + EPS)
        & ~(t < -EPS)
        & (world.valid[None, :] > 0.0)
    )
    t_masked = jnp.where(accept, t, F_MAX)
    idx = jnp.argmin(t_masked, axis=1)
    best_t = jnp.take_along_axis(t_masked, idx[:, None], axis=1)[:, 0]
    return best_t, idx


def trace_mxu(
    world: WorldTriangles, ro: jax.Array, rd: jax.Array, chunk_size: int = 8192
) -> HitRecord:
    """Full-scene nearest-hit for a wavefront of world-space rays.

    Equivalent in results to ``computeRaySceneIntersectionKernel``
    (``Renderer.cpp:363-409``) minus the DDA early-exit quirk (this engine
    always returns the true nearest hit).
    """
    n = ro.shape[0]
    rd_n = normalize(rd)

    if n <= chunk_size:
        t, idx = _trace_chunk(world, ro, rd_n)
    else:
        n_pad = _round_up(n, chunk_size)
        ro_p = jnp.pad(ro, ((0, n_pad - n), (0, 0)))
        rd_p = jnp.pad(rd_n, ((0, n_pad - n), (0, 0)), constant_values=1.0)
        ro_c = ro_p.reshape(-1, chunk_size, 3)
        rd_c = rd_p.reshape(-1, chunk_size, 3)
        t, idx = jax.lax.map(lambda args: _trace_chunk(world, *args), (ro_c, rd_c))
        t = t.reshape(-1)[:n]
        idx = idx.reshape(-1)[:n]

    hit = t < F_MAX
    return HitRecord(
        t=t,
        normal=jnp.where(hit[:, None], world.shade_normal[idx], 0.0),
        mat_type=jnp.where(hit, world.mat_type[idx], 0),
        mat_color=jnp.where(hit[:, None], world.mat_color[idx], 0.0),
        geom_normal=jnp.where(
            hit[:, None], normalize_guarded(world.plane_n[idx]), 0.0
        ),
        mat_ri=(
            jnp.where(hit, world.mat_ri[idx], 1.5)
            if world.mat_ri is not None
            else None
        ),
    )
