"""Minimal Wavefront OBJ loader.

The reference imports meshes through Assimp with only ``aiProcess_FlipUVs``
(``Scene.cpp:229``) and asserts every face is already a triangle
(``Scene.cpp:281``).  Assimp's role there is purely to hand back positions,
normals and triangle indices, so a small pure-Python parser covering the
``v`` / ``vn`` / ``vt`` / ``f`` subset is a full functional replacement.

Import-time semantics mirrored from the reference:

* positions AND normals are scaled by ``BASE_MODEL_SCALE``
  (``Scene.cpp:255-262`` scales both through ``convertFromVector3D``;
  scaling normals is a quirk that is harmless because the shading rule
  re-normalizes, ``Renderer.cpp:203``);
* a vertex is a unique (position index, normal index) pair — corner normals
  are preserved so that the averaged-normal shading rule sees the same three
  normals per triangle as the reference does;
* quads/ngons are rejected, matching ``assert(face.mNumIndices == 3)``.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .. import constants


@dataclasses.dataclass
class ObjMesh:
    """A triangle mesh as parallel numpy arrays (host side)."""

    positions: np.ndarray  # (V, 3) float32
    normals: np.ndarray  # (V, 3) float32 (zero if the file had no normals)
    uvs: np.ndarray  # (V, 2) float32
    triangles: np.ndarray  # (T, 3) int32 indices into positions/normals
    bbox_min: np.ndarray  # (3,) float32
    bbox_max: np.ndarray  # (3,) float32

    @property
    def num_vertices(self) -> int:
        return int(self.positions.shape[0])

    @property
    def num_triangles(self) -> int:
        return int(self.triangles.shape[0])


def load_obj(
    path: str,
    scale: float = constants.BASE_MODEL_SCALE,
    backend: str = "auto",
) -> ObjMesh:
    """Parse a pre-triangulated OBJ file.

    Raises ``ValueError`` on non-triangle faces (the reference asserts,
    ``Scene.cpp:281``).

    ``backend``: "auto" uses the native C++ parser (native/ptap_native.cc)
    when its shared library is available and falls back to pure Python;
    "native" requires it; "python" forces the pure-Python path.  Both
    produce identical arrays (tests/test_native.py).
    """
    if backend != "python":
        from .. import native as _native

        if _native.available():
            pos, nrm, uv, tris, bbmin, bbmax = _native.load_obj_native(
                path, float(scale)
            )
            return ObjMesh(
                positions=pos, normals=nrm, uvs=uv, triangles=tris,
                bbox_min=bbmin, bbox_max=bbmax,
            )
        if backend == "native":
            raise RuntimeError("native OBJ backend requested but unavailable")
    raw_v: list = []
    raw_vn: list = []
    raw_vt: list = []
    corner_map: dict = {}
    positions: list = []
    normals: list = []
    uvs: list = []
    triangles: list = []

    def corner_index(token: str) -> int:
        if token in corner_map:
            return corner_map[token]
        parts = token.split("/")
        vi = int(parts[0])
        vi = vi - 1 if vi > 0 else len(raw_v) + vi
        ti = 0
        ni = -1
        if len(parts) > 1 and parts[1]:
            t = int(parts[1])
            ti = t - 1 if t > 0 else len(raw_vt) + t
        if len(parts) > 2 and parts[2]:
            n = int(parts[2])
            ni = n - 1 if n > 0 else len(raw_vn) + n
        idx = len(positions)
        positions.append(raw_v[vi])
        normals.append(raw_vn[ni] if ni >= 0 else (0.0, 0.0, 0.0))
        if raw_vt and len(parts) > 1 and parts[1]:
            uvs.append(raw_vt[ti])
        else:
            uvs.append((0.0, 0.0))
        corner_map[token] = idx
        return idx

    with open(path, "r", encoding="utf-8", errors="replace") as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            tok = line.split()
            if tok[0] == "v":
                raw_v.append((float(tok[1]), float(tok[2]), float(tok[3])))
            elif tok[0] == "vn":
                raw_vn.append((float(tok[1]), float(tok[2]), float(tok[3])))
            elif tok[0] == "vt":
                raw_vt.append((float(tok[1]), float(tok[2])))
            elif tok[0] == "f":
                if len(tok) != 4:
                    raise ValueError(
                        f"{path}: face with {len(tok) - 1} corners; only "
                        "pre-triangulated OBJs are supported (reference "
                        "Scene.cpp:281 asserts the same)"
                    )
                triangles.append(tuple(corner_index(t) for t in tok[1:4]))
            # everything else (mtllib, usemtl, o, g, s, ...) is ignored

    pos = np.asarray(positions, dtype=np.float32) * np.float32(scale)
    nrm = np.asarray(normals, dtype=np.float32) * np.float32(scale)
    uv = np.asarray(uvs, dtype=np.float32)
    tris = np.asarray(triangles, dtype=np.int32)
    if pos.size == 0:
        raise ValueError(f"{path}: no vertices")
    return ObjMesh(
        positions=pos,
        normals=nrm,
        uvs=uv,
        triangles=tris,
        bbox_min=pos.min(axis=0),
        bbox_max=pos.max(axis=0),
    )


def save_obj(path: str, mesh: ObjMesh, header: str = "") -> None:
    """Write an ObjMesh back out as a pre-triangulated v/vn/f OBJ.

    Used to export self-contained copies of benchmark geometry (so renders
    do not require the read-only reference checkout) and to persist
    synthetic meshes.  Positions/normals are written as stored — callers
    exporting a reference-scaled mesh should load with ``scale=1.0`` first.
    """
    has_n = bool(np.any(mesh.normals))
    with open(path, "w") as f:
        if header:
            for line in header.splitlines():
                f.write(f"# {line}\n")
        for p in mesh.positions:
            f.write(f"v {p[0]:.9g} {p[1]:.9g} {p[2]:.9g}\n")
        if has_n:
            for n in mesh.normals:
                f.write(f"vn {n[0]:.9g} {n[1]:.9g} {n[2]:.9g}\n")
        for t in mesh.triangles:
            if has_n:
                f.write(
                    f"f {t[0]+1}//{t[0]+1} {t[1]+1}//{t[1]+1} {t[2]+1}//{t[2]+1}\n"
                )
            else:
                f.write(f"f {t[0]+1} {t[1]+1} {t[2]+1}\n")
