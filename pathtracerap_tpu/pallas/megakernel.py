"""Whole-sample megakernel: trace + hit-attribute select + shade + RNG
consume fused into ONE Pallas kernel, ray state resident in VMEM across the
bounce loop.

Why: the per-bounce pipeline (``render/wavefront.py``) round-trips the full
ray state and HitRecords through HBM between a Pallas traversal launch and
XLA shading glue *every bounce* — at the reference scene's size (4k world
triangles) that glue dominates the sample time.  Here one grid step owns one
ray tile for an entire sample iteration: the bounce loop is unrolled inside
the kernel, the fused triangle operand pack stays VMEM-resident, and the
only HBM traffic per sample is the primary-ray pack, the pre-drawn uniforms
and R*4 floats of output.

This is the TPU answer to the reference's whole wavefront iteration
(``Renderer.cpp:582-640``: generate -> {intersect, shade, compact} loop),
minus the 21 kernel launches and full-device syncs per sample.

Semantics contract:

* traversal: identical accept logic to ``ops/plucker._trace_chunk``
  (epsilon-guarded Moeller-Trumbore via Pluecker side matmuls,
  Renderer.cpp:174-215); nearest hit with lexicographic (t, index) ties —
  blocks are visited in ascending index order with a strict ``<`` improve
  test, and the in-block argmin is first-win, so ties resolve to the lowest
  triangle index exactly like the dense engines.
* shading: a line-for-line port of :func:`render.shade.shade` (itself
  ``shadeRayKernel``, Renderer.cpp:411-479) on (R, 1)/(R, 3) VMEM slabs.
* RNG: consumes the SAME pre-drawn uniform stream as the other engines
  (``ops.rng.tile_uniforms`` per 8192-ray tile), so images match the MXU
  engine per pixel up to traversal ulps.
* matmul precision: ``jax.lax.Precision.HIGH`` (3-pass bf16 ~ f32
  fidelity).  HIGHEST (6-pass) doubles MXU time for precision beyond f32 —
  measured unnecessary: hit distances differ only at ~1e-6 rel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import constants
from ..ops.math import normalize
from ..ops.rng import bounce_key
from ..scene.types import MaterialType, WorldTriangles

F_MAX = constants.FLOAT_MAX
EPS = constants.EPSILON

RAY_TILE = 512
RNG_TILE = 8192  # uniforms stream granularity (matches DEFAULT_TILE)

# Traversal matmul precision mode.  Mosaic's in-kernel dot supports only
# DEFAULT (single-pass bf16 — rel error ~4e-3, enough to flip hit accepts at
# scene scale) and HIGHEST (full fp32 — 2x the MXU passes we need).  The
# sweet spot is a MANUAL 3-pass bf16 split (the "bf16x3" trick XLA calls
# Precision.HIGH, which Mosaic does not expose):
#   s = hi(w) @ hi(o) + hi(w) @ lo(o) + lo(w) @ hi(o)
# with hi/lo the leading/residual bf16 components.  Dropping the lo*lo term
# leaves ~2^-16 relative error — hit distances land within ~0.01 world units
# at the reference's ~1000-unit scene scale, far inside the 0.1 spawn
# offset (Renderer.cpp:437).
#   "f32"    — exact fp32 (Mosaic HIGHEST); also used in interpret mode so
#              CPU tests compare engines bit-for-bit.
#   "bf16x3" — 3-pass split; the TPU default.
#   "bf16"   — single pass; fastest, visibly wrong at scene scale (A/B only).
import os as _os

PRECISION_MODE = _os.environ.get("PTAP_MM_PRECISION", "bf16x3")

# A/B experiment flag: re-enable the per-visit lax.cond gates (AABB block
# skip + select skip) in the whole-sample megakernel.  Branch-free sweeps
# are the DEFAULT: every vector->scalar any() + branch is a Mosaic pipeline
# sync, measured (scripts/prof_r3_*.py, TPU v5e) to cost as much as the
# compute the gate skips at reference-scene block counts.
BLOCK_SKIP = _os.environ.get("PTAP_BLOCK_SKIP", "0") == "1"

# Gate the per-visit argmin + attribute-select (the most expensive
# non-matmul stage, measured 3.6 us/visit on v5e — scripts/prof_r4_parts.py)
# behind a scalar `any(can improve)` cond.  Unlike BLOCK_SKIP this gate is
# AFTER the traversal matmul, so gated and ungated kernels return identical
# results; the only question is sync cost vs skip rate, hence the A/B flag.
SELECT_GATE = _os.environ.get("PTAP_SELECT_GATE", "1") == "1"

# Samples per megakernel launch for the parity camera (grid (tiles, spp)):
# amortizes the per-sample XLA glue (~8% of sample time, prof_r4_parts).
# 1 disables batching (A/B).
SAMPLE_BATCH = int(_os.environ.get("PTAP_SAMPLE_BATCH", "8"))

# Binned engine: sort THIS many samples' wavefronts together per bounce
# (r5; see the sample-batched branch of render_samples_binned).  1
# disables batching (A/B).  Measured with BINNED_SLAB_TILES below —
# the two knobs trade density against combined wavefront size.
BINNED_SAMPLE_BATCH = int(_os.environ.get("PTAP_BINNED_SAMPLE_BATCH", "4"))

# Facade ray-slab size for the BINNED engine, in 8192-ray RNG tiles (the
# fused engine keeps its 64-tile slabs).  r5 density sweep on the
# reference workload (prof_r5_sub, Mrays/s): the engine peaks when the
# COMBINED sorted wavefront (slab x BINNED_SAMPLE_BATCH) stays near 512k
# rays while the sample density inside it rises:
#   batch x slab:  1x64 15.34 | 2x64 19.48 | 3x64 19.19 | 4x64 16.62
#                  8x64 14.70 | 2x32 19.97 | 4x16 20.13 | 8x8 17.50
# i.e. +31% from batching alone, provided the combined size does not
# grow with it (sort/gather HBM locality degrades past ~1M rows).
BINNED_SLAB_TILES = int(_os.environ.get("PTAP_BINNED_SLAB_TILES", "16"))

# Binned engine: re-sort the wavefront every this many bounces (A/B via
# PTAP_RESORT_EVERY).  The corrected microbenchmark (prof_r4_sort with
# scalarized outputs — the first cut fetched 48 MB per call through the
# axon tunnel and read 74 ms/bounce; the true cost is ~7) shows argsort +
# row gather at 3.4 + 6.1 ms/bounce, so per-bounce re-sorting is cheap and
# keeps both visit coherence AND the dead-ray tail that the per-tile
# nlive skip prunes.
RESORT_EVERY = int(_os.environ.get("PTAP_RESORT_EVERY", "1"))

# Lane-major (components, R) in-kernel shading: the row-major (R, 3)/(R, 1)
# slabs use 3 (or 1) of 128 VPU lanes per op — measured 70 ms/sample of
# lane waste (prof_r4_parts `noshade`).  Costs a handful of small
# relayouts per bounce at the trace boundary.  A/B via PTAP_SHADE_T.
SHADE_T = _os.environ.get("PTAP_SHADE_T", "1") == "1"

# r5 sub-block worklists (binned engine): cull per-tile visit sets at
# 128-triangle granularity (the bake's cluster AABBs) instead of the
# 512-triangle block quantum, while each kernel visit still sweeps a
# 512-wide operand — a GROUP of 4 worklist entries gathered into one
# (16, 2048) slab.  Finer culling without finer visits: the per-visit
# fixed costs (3 bf16 passes, accept chain, gated argmin+select) stay
# amortized over 512 columns, but the columns are now chosen at 4x finer
# granularity (VERDICT r4 next-round items 1+3).  A/B via PTAP_SUBBLOCKS.
SUBBLOCKS = _os.environ.get("PTAP_SUBBLOCKS", "1") == "1"
SUB_BLOCK = 128  # sub-block width == the bake's cluster size
# Binned-engine worklist tile height (rays per worklist row).  Smaller
# tiles mean tighter per-tile worklist unions (each tile's rays span a
# narrower sort-key range) at the cost of 2x the SMEM worklist rows and
# per-tile fixed costs.  Measured r5 third wave under the 4x16 sample
# batching (prof_r5_sub / prof_r5_scene_batch, min of 3): reference
# workload 512 -> 20.15, 256 -> 20.47, 128 -> 16.44 Mrays/s; metallic
# (same 32-sub scene, 1M rays) 16.94 vs 16.97 (tie); multimesh (72 subs)
# 23.83 vs 22.08 (256 LOSES — the 2x SMEM worklist rows bite as the
# per-tile list width grows).  Default is therefore ADAPTIVE on the
# worklist unit count: 256 when the scene culls over <= 32 units
# (sub-blocks or blocks), 512 above.  Force a fixed value for A/B via
# PTAP_RAY_TILE; the fused whole-sample engine keeps RAY_TILE (512).
_RAY_TILE_ENV = _os.environ.get("PTAP_RAY_TILE")
BINNED_RAY_TILE = int(_RAY_TILE_ENV) if _RAY_TILE_ENV else None
BINNED_SMALL_TILE_MAX_UNITS = 32


def _binned_ray_tile(world: "WorldTriangles") -> int:
    """Adaptive binned worklist tile height (see BINNED_RAY_TILE note)."""
    if BINNED_RAY_TILE is not None:
        return BINNED_RAY_TILE
    nb = world.block_aabb.shape[0]
    units = nb
    if (
        SUBBLOCKS
        and nb <= min(SUB_MAX_BLOCKS, STREAM_BLOCKS)
        and world.sub_aabb is not None
        and world.tri_block > SUB_BLOCK
        and world.tri_block % SUB_BLOCK == 0
    ):
        units = world.sub_aabb.shape[0]
    return 256 if units <= BINNED_SMALL_TILE_MAX_UNITS else 512
# Above this many 512-tri blocks the sub-granularity worklists hurt: the
# 4x-wider (nt, 4*nb) scalar-prefetch SMEM rows force 4x more wavefront
# chunking (trace.max_list_tiles) and the per-ray sub slab pass costs 4x.
# Measured r5: 8 blocks sub WINS (15.38 vs 15.11), 18 blocks WINS
# (multimesh 26.5 vs r4's 20.2), 287 blocks LOSES (highpoly 7.83 vs the
# block-granularity 9.2) — cap between, overridable for A/B.
SUB_MAX_BLOCKS = int(_os.environ.get("PTAP_SUB_MAX_BLOCKS", "64"))

# r5 bf16-first hierarchical accept (probe + refine), PERF_NOTES lever #1:
# each sub-group visit first runs ONLY the hi*hi bf16 pass (1/3 of the
# bf16x3 matmul) and evaluates a conservatively WIDENED accept on it; the
# remaining two refine passes + exact accept + select run only when some
# lane's probe lower bound could beat the running best.  The probe reuses
# its pass as the third term of the bf16x3 sum (same add order — refined
# results are bit-identical to the unprobed kernel).  Conservativeness:
# (a) exact-accepting lanes satisfy |det| >= absm/3.1 (all three
# barycentrics in [~0,1] forces each |s_k| <= (1+2eps)|det|), and the
# hi*hi pass's relative error (~2^-8 per product, f32 accumulate) cannot
# push them below the 0.25*absm probe-safe threshold, so probe-unsafe
# lanes are provably non-accepting; (b) safe lanes' u/v/t carry error
# <= ~0.004 * (absm/|det|) <= ~0.03 relative, covered 3x by the 0.1
# widening.  A/B via PTAP_BF16_PROBE.  Default OFF: measured 14.38 vs
# 15.38 Mrays/s on the reference workload (r5) — the XLA slab pass
# already pre-culls the worklists to mostly-improving visits, so the
# probe's extra vector->scalar sync + widened-accept chain costs more
# than the two matmul passes it can skip.  Kept for A/B on scenes with
# deeper occlusion (where tmin-sorted later visits rarely improve).
BF16_PROBE = _os.environ.get("PTAP_BF16_PROBE", "0") == "1"
PROBE_SLACK = 0.1

# r5 deferred shading for the binned engine: the bounce kernel returns
# only (best_t, winning global pack column) — the per-visit 6-pass
# HIGHEST attribute-select matmul becomes cheap argmin integer math and
# the whole in-kernel shade moves to XLA, where a 16-column attr gather
# (4.2 ms) + fused elementwise shade (2.5 ms) measure ~5x cheaper than
# the Mosaic in-kernel shade (~14 ms/bounce) at 800k rays
# (scripts/prof_r5_shade.py).  Requires the sub-block worklist path
# (VMEM-resident packs); streamed scenes keep the fused trace+shade
# kernel.  A/B via PTAP_DEFER_SHADE.  Default OFF: measured 14.61 vs
# 15.38 Mrays/s end-to-end on the reference workload — the in-kernel
# shade only runs on LIVE tiles (nlive skip; live fraction decays 0.89 ->
# 0.32 over bounces), while the XLA shade pays every lane every bounce,
# and the micro-costs above don't include the extra per-bounce HBM
# round-trip of (t, gcol) + the repack.  Kept for A/B; may win on
# workloads whose wavefronts stay near-fully live.
DEFER_SHADE = _os.environ.get("PTAP_DEFER_SHADE", "0") == "1"

# Above this many 512-triangle blocks the worklist kernels stop holding the
# operand pack whole in VMEM and stream per-visit slabs from HBM with
# double-buffered DMAs (see _trace_inkernel's stream mode) — the pack VMEM
# budget (~160k triangles / ~313 blocks in 100 MB) stops being a scene-size
# limit.  Override for testing via PTAP_STREAM_BLOCKS.
STREAM_BLOCKS = int(_os.environ.get("PTAP_STREAM_BLOCKS", "313"))


def _mm(a, b):
    """Matmul at the configured traversal precision (see PRECISION_MODE)."""
    mode = "f32" if _interpret() else PRECISION_MODE
    if mode == "f32":
        return jnp.dot(
            a, b, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    if mode == "bf16":
        return jnp.dot(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
    a_hi = a.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    b_hi = b.astype(jnp.bfloat16)
    b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
    # chained adds keep at most two (R, 4*TB) f32 partials live in VMEM
    s = dot(a_lo, b_hi)
    s = s + dot(a_hi, b_lo)
    return s + dot(a_hi, b_hi)

_MT_DIFFUSE = float(int(MaterialType.DIFFUSE))
_MT_REFLECTIVE = float(int(MaterialType.REFLECTIVE))
_MT_EMISSIVE = float(int(MaterialType.EMISSIVE))
_MT_COAT = float(int(MaterialType.COAT))
_MT_METAL = float(int(MaterialType.METAL))
_MT_SPECULAR = float(int(MaterialType.SPECULAR))
_MT_REFRACTIVE = float(int(MaterialType.REFRACTIVE))


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _idx_width(max_bounces: int) -> int:
    """Columns of the emit_idx output: max_bounces rounded up to a multiple
    of 8 (sublane alignment), so any bounce count works — the old fixed
    width of 8 made max_bounces > 8 crash at trace time (ADVICE r3)."""
    return max(8, -(-max_bounces // 8) * 8)


# ---------------------------------------------------------------------------
# In-kernel math on (R, 1)/(R, 3) slabs.  These mirror ops/math.py and
# ops/sampling.py exactly but keep everything >= 2D (Mosaic's vector layout
# wants a lane dimension).
# ---------------------------------------------------------------------------


def _norm3(v):
    return v * jax.lax.rsqrt(
        jnp.maximum(jnp.sum(v * v, axis=1, keepdims=True), 1e-30)
    )


def _cross3(a, b):
    ax, ay, az = a[:, 0:1], a[:, 1:2], a[:, 2:3]
    bx, by, bz = b[:, 0:1], b[:, 1:2], b[:, 2:3]
    return jnp.concatenate(
        [ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx], axis=1
    )


def _dot3(a, b):
    return jnp.sum(a * b, axis=1, keepdims=True)


def _axis_onehot(r, k):
    i = jax.lax.broadcasted_iota(jnp.int32, (r, 3), 1)
    return (i == k).astype(jnp.float32)


def _cosine_hemisphere(n, u0, u1):
    """calculateRandomDirectionInHemisphere (utility.h:91-123)."""
    up = jnp.sqrt(jnp.maximum(u0, 0.0))
    over = jnp.sqrt(jnp.maximum(1.0 - up * up, 0.0))
    around = u1 * constants.TWO_PI
    r = n.shape[0]
    ax = jnp.abs(n[:, 0:1])
    ay = jnp.abs(n[:, 1:2])
    s13 = constants.SQRT_OF_ONE_THIRD
    seed = jnp.where(
        ax < s13,
        _axis_onehot(r, 0),
        jnp.where(ay < s13, _axis_onehot(r, 1), _axis_onehot(r, 2)),
    )
    t1 = _norm3(_cross3(n, seed))
    t2 = _norm3(_cross3(n, t1))
    return up * n + (jnp.cos(around) * over) * t1 + (jnp.sin(around) * over) * t2


def _metal_scatter(n, d, u2, u3):
    """calculateMetalScattering: Phong-30 lobe (utility.h:145-170)."""
    phi = constants.TWO_PI * u2
    cos_t = jnp.power(
        jnp.maximum(1.0 - u3, 0.0), 1.0 / (constants.METAL_PHONG_EXPONENT + 1.0)
    )
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    ndotd = _dot3(n, d)
    w = _norm3(d - n * (2.0 * ndotd))
    r = n.shape[0]
    seed = jnp.where(
        jnp.abs(w[:, 0:1]) > 0.1, _axis_onehot(r, 1), _axis_onehot(r, 0)
    )
    u = _norm3(_cross3(seed, w))
    v = _cross3(w, u)
    return u * (jnp.cos(phi) * sin_t) + v * (jnp.sin(phi) * sin_t) + w * cos_t


def _reflect(d, n, parity: bool):
    dn = _dot3(d, n)
    base = n if parity else d  # utility.h:64-69 quirk in parity mode
    return base - 2.0 * dn * n


def _coat_scatter(n, d, u0, u1, u2, parity: bool):
    """calculateCoatScattering: 50/50 RR (utility.h:125-143)."""
    mirror = _reflect(d, n, parity)
    diffuse = _cosine_hemisphere(n, u1, u2)
    return jnp.where(u0 < constants.COAT_REFLECT_PROBABILITY, mirror, diffuse)


def _refract_scatter(n, d, ri, u3):
    """In-kernel port of ops/sampling.refract_scatter (row layout):
    Fresnel-roulette dielectric.  Returns (direction, orient) with the
    spawn point at ``pt + SPAWN_OFFSET * orient * n``."""
    entering = _dot3(d, n) < 0.0
    n_eff = jnp.where(entering, n, -n)
    cos_i = jnp.clip(-_dot3(d, n_eff), 0.0, 1.0)
    eta = jnp.where(entering, 1.0 / ri, ri)
    k = 1.0 - eta * eta * (1.0 - cos_i * cos_i)
    tir = k < 0.0
    cos_t = jnp.sqrt(jnp.maximum(k, 0.0))
    refr = _norm3(eta * d + (eta * cos_i - cos_t) * n_eff)
    r0 = ((ri - 1.0) / (ri + 1.0)) ** 2
    cos_x = jnp.where(entering, cos_i, cos_t)
    fres = r0 + (1.0 - r0) * (1.0 - cos_x) ** 5
    take_refl = tir | (u3 < fres)
    refl = d - 2.0 * _dot3(d, n_eff) * n_eff
    direction = jnp.where(take_refl, refl, refr)
    orient = jnp.where(take_refl, 1.0, -1.0) * jnp.where(entering, 1.0, -1.0)
    return direction, orient


# ---------------------------------------------------------------------------
# Transposed (lane-major) shading: every state array is (components, R) so
# rays ride the 128-lane dimension.  The row-major (R, 3)/(R, 1) slabs the
# r2/r3 shade used occupy 3 (or 1) of 128 lanes per VPU op — measured 70
# ms/sample of almost pure lane waste (prof_r4_parts `noshade`).  Same math,
# same RNG consumption; selected by PTAP_SHADE_T.
# ---------------------------------------------------------------------------


def _norm3_t(v):  # (3, R)
    return v * jax.lax.rsqrt(
        jnp.maximum(jnp.sum(v * v, axis=0, keepdims=True), 1e-30)
    )


def _cross3_t(a, b):  # (3, R)
    ax, ay, az = a[0:1], a[1:2], a[2:3]
    bx, by, bz = b[0:1], b[1:2], b[2:3]
    return jnp.concatenate(
        [ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx], axis=0
    )


def _dot3_t(a, b):  # -> (1, R)
    return jnp.sum(a * b, axis=0, keepdims=True)


def _axis_onehot_t(r, k):
    i = jax.lax.broadcasted_iota(jnp.int32, (3, r), 0)
    return (i == k).astype(jnp.float32)


def _cosine_hemisphere_t(n, u0, u1):
    up = jnp.sqrt(jnp.maximum(u0, 0.0))
    over = jnp.sqrt(jnp.maximum(1.0 - up * up, 0.0))
    around = u1 * constants.TWO_PI
    r = n.shape[1]
    ax = jnp.abs(n[0:1])
    ay = jnp.abs(n[1:2])
    s13 = constants.SQRT_OF_ONE_THIRD
    seed = jnp.where(
        ax < s13,
        _axis_onehot_t(r, 0),
        jnp.where(ay < s13, _axis_onehot_t(r, 1), _axis_onehot_t(r, 2)),
    )
    t1 = _norm3_t(_cross3_t(n, seed))
    t2 = _norm3_t(_cross3_t(n, t1))
    return up * n + (jnp.cos(around) * over) * t1 + (jnp.sin(around) * over) * t2


def _metal_scatter_t(n, d, u2, u3):
    phi = constants.TWO_PI * u2
    cos_t = jnp.power(
        jnp.maximum(1.0 - u3, 0.0), 1.0 / (constants.METAL_PHONG_EXPONENT + 1.0)
    )
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    ndotd = _dot3_t(n, d)
    w = _norm3_t(d - n * (2.0 * ndotd))
    r = n.shape[1]
    seed = jnp.where(
        jnp.abs(w[0:1]) > 0.1, _axis_onehot_t(r, 1), _axis_onehot_t(r, 0)
    )
    u = _norm3_t(_cross3_t(seed, w))
    v = _cross3_t(w, u)
    return u * (jnp.cos(phi) * sin_t) + v * (jnp.sin(phi) * sin_t) + w * cos_t


def _reflect_t(d, n, parity: bool):
    dn = _dot3_t(d, n)
    base = n if parity else d
    return base - 2.0 * dn * n


def _coat_scatter_t(n, d, u0, u1, u2, parity: bool):
    mirror = _reflect_t(d, n, parity)
    diffuse = _cosine_hemisphere_t(n, u1, u2)
    return jnp.where(u0 < constants.COAT_REFLECT_PROBABILITY, mirror, diffuse)


def _refract_scatter_t(n, d, ri, u3):
    """Transposed-layout _refract_scatter: operands (components, R)."""
    entering = _dot3_t(d, n) < 0.0
    n_eff = jnp.where(entering, n, -n)
    cos_i = jnp.clip(-_dot3_t(d, n_eff), 0.0, 1.0)
    eta = jnp.where(entering, 1.0 / ri, ri)
    k = 1.0 - eta * eta * (1.0 - cos_i * cos_i)
    tir = k < 0.0
    cos_t = jnp.sqrt(jnp.maximum(k, 0.0))
    refr = _norm3_t(eta * d + (eta * cos_i - cos_t) * n_eff)
    r0 = ((ri - 1.0) / (ri + 1.0)) ** 2
    cos_x = jnp.where(entering, cos_i, cos_t)
    fres = r0 + (1.0 - r0) * (1.0 - cos_x) ** 5
    take_refl = tir | (u3 < fres)
    refl = d - 2.0 * _dot3_t(d, n_eff) * n_eff
    direction = jnp.where(take_refl, refl, refr)
    orient = jnp.where(take_refl, 1.0, -1.0) * jnp.where(entering, 1.0, -1.0)
    return direction, orient


def _shade_inkernel_t(orig, dirn, color, remaining, t, n, mt, mc, gn, u,
                      parity: bool, ri=None):
    """Transposed-layout port of :func:`_shade_inkernel`: every operand is
    (components, R).  ``u`` is (4, R)."""
    alive = remaining > 0.0
    hit = t < F_MAX
    d = _norm3_t(dirn)
    pt = orig + d * t
    spawn = pt + constants.SPAWN_OFFSET * n

    def is_mat(v):
        return jnp.abs(mt - v) < 0.5

    is_diffuse = is_mat(_MT_DIFFUSE)
    is_metal = is_mat(_MT_METAL)
    is_coat = is_mat(_MT_COAT)
    is_emissive = is_mat(_MT_EMISSIVE)
    is_reflective = is_mat(_MT_REFLECTIVE)

    u0, u1, u2, u3 = u[0:1], u[1:2], u[2:3], u[3:4]
    dir_diffuse = _cosine_hemisphere_t(n, u0, u1)
    dir_metal = _metal_scatter_t(n, d, u2, u3)
    dir_coat = _coat_scatter_t(n, d, u0, u1, u2, parity)
    dir_refl = _reflect_t(d, n, parity)

    scatters = is_diffuse | is_metal | is_coat | is_reflective
    new_dir = jnp.where(
        is_diffuse,
        dir_diffuse,
        jnp.where(is_metal, dir_metal, jnp.where(is_coat, dir_coat, dir_refl)),
    )

    if not parity and ri is not None:
        # quality-mode SPECULAR mirror + REFRACTIVE dielectric (r5); see
        # render/shade.py for the authoritative XLA form
        is_spec = is_mat(_MT_SPECULAR)
        is_refr = is_mat(_MT_REFRACTIVE)
        dir_refr, orient = _refract_scatter_t(n, d, ri, u3)
        scatters = scatters | is_spec | is_refr
        new_dir = jnp.where(
            is_refr, dir_refr, jnp.where(is_spec, dir_refl, new_dir)
        )
        spawn = jnp.where(
            is_refr, pt + constants.SPAWN_OFFSET * orient * n, spawn
        )

    shaded = alive & hit
    upd_dir = shaded & scatters
    upd_col = shaded & (scatters | is_emissive)

    orig = jnp.where(upd_dir, spawn, orig)
    dirn = jnp.where(upd_dir, new_dir, dirn)
    if not parity:
        cosf = _dot3_t(dir_diffuse, gn)
        mc = mc * jnp.where(is_diffuse, jnp.maximum(cosf, 0.0), 1.0)
    color = jnp.where(upd_col, color * mc, color)
    missed = alive & ~hit
    color = jnp.where(missed, color * constants.MISS_ATTENUATION, color)
    kill = missed | (shaded & is_emissive)
    remaining = jnp.where(
        kill, 0.0, jnp.where(alive, remaining - 1.0, remaining)
    )
    return orig, dirn, color, remaining


def _shade_inkernel(orig, dirn, color, remaining, t, n, mt, mc, gn, u,
                    parity: bool, ri=None):
    """One wavefront shading step on VMEM slabs — port of
    :func:`render.shade.shade` (shadeRayKernel, Renderer.cpp:411-479)."""
    alive = remaining > 0.0
    hit = t < F_MAX
    d = _norm3(dirn)
    pt = orig + d * t
    spawn = pt + constants.SPAWN_OFFSET * n

    def is_mat(v):
        return jnp.abs(mt - v) < 0.5

    is_diffuse = is_mat(_MT_DIFFUSE)
    is_metal = is_mat(_MT_METAL)
    is_coat = is_mat(_MT_COAT)
    is_emissive = is_mat(_MT_EMISSIVE)
    is_reflective = is_mat(_MT_REFLECTIVE)

    u0, u1, u2, u3 = u[:, 0:1], u[:, 1:2], u[:, 2:3], u[:, 3:4]
    dir_diffuse = _cosine_hemisphere(n, u0, u1)
    dir_metal = _metal_scatter(n, d, u2, u3)
    dir_coat = _coat_scatter(n, d, u0, u1, u2, parity)
    dir_refl = _reflect(d, n, parity)

    scatters = is_diffuse | is_metal | is_coat | is_reflective
    new_dir = jnp.where(
        is_diffuse,
        dir_diffuse,
        jnp.where(is_metal, dir_metal, jnp.where(is_coat, dir_coat, dir_refl)),
    )

    if not parity and ri is not None:
        # quality-mode SPECULAR mirror + REFRACTIVE dielectric (r5)
        is_spec = is_mat(_MT_SPECULAR)
        is_refr = is_mat(_MT_REFRACTIVE)
        dir_refr, orient = _refract_scatter(n, d, ri, u3)
        scatters = scatters | is_spec | is_refr
        new_dir = jnp.where(
            is_refr, dir_refr, jnp.where(is_spec, dir_refl, new_dir)
        )
        spawn = jnp.where(
            is_refr, pt + constants.SPAWN_OFFSET * orient * n, spawn
        )

    shaded = alive & hit
    upd_dir = shaded & scatters
    upd_col = shaded & (scatters | is_emissive)

    orig = jnp.where(upd_dir, spawn, orig)
    dirn = jnp.where(upd_dir, new_dir, dirn)
    if not parity:
        # quality-mode cosine factor against the geometric normal
        # (Renderer.cpp:438) — see render/shade.py
        cosf = _dot3(dir_diffuse, gn)
        mc = mc * jnp.where(is_diffuse, jnp.maximum(cosf, 0.0), 1.0)
    color = jnp.where(upd_col, color * mc, color)
    missed = alive & ~hit
    color = jnp.where(missed, color * constants.MISS_ATTENUATION, color)
    kill = missed | (shaded & is_emissive)
    remaining = jnp.where(
        kill, 0.0, jnp.where(alive, remaining - 1.0, remaining)
    )
    return orig, dirn, color, remaining


def _accept_chain(s, tri_block: int, debug: bool = False):
    """Epsilon-guarded Moeller-Trumbore accept from the side/plane
    products ``s`` (R, 4*TB): returns (t_m (R, TB), blk_min (R, 1)).

    Shared by every worklist kernel (here and pallas/rayqueue.py) so the
    accept semantics — and therefore bit-identical hit distances across
    engines — live in exactly one place."""
    s_ab = s[:, 0:tri_block]
    s_bc = s[:, tri_block : 2 * tri_block]
    s_ca = s[:, 2 * tri_block : 3 * tri_block]
    num2 = s[:, 3 * tri_block :]  # t * det (plane columns negated)

    det = s_ab + s_bc + s_ca
    if debug:
        # explicit-mask form (PTAP_DEBUG=1) — regression guard for
        # the IEEE reasoning below (utils/debug.py)
        parallel = det == 0.0
        inv_det = 1.0 / jnp.where(parallel, 1.0, det)
    else:
        # det == 0 lanes produce inf/NaN in u/v/t; every IEEE
        # compare with NaN is false and +-inf fails one of the range
        # tests, so the explicit `parallel` mask of the AD-safe
        # engines is unnecessary here (this kernel is never
        # differentiated) — saves 3 VPU slab passes per visit
        inv_det = 1.0 / det
    t = num2 * inv_det
    u = s_ca * inv_det
    v = s_ab * inv_det
    # exact reformulation of the 5 epsilon tests (Renderer.cpp:193-201)
    # in 2 fused range checks: min(u,v,t) >= -EPS covers the three lower
    # bounds, max(u, u+v) <= 1+EPS the two upper bounds (v has no upper
    # test in the reference).  5 fewer VPU slab passes per visit; NaN/inf
    # lanes from det==0 still fail (min/max propagate NaN, NaN >= x is
    # false; +-inf fails one side).
    m_lo = jnp.minimum(jnp.minimum(u, v), t)
    m_hi = jnp.maximum(u, u + v)
    accept = (m_lo >= -EPS) & (m_hi <= 1.0 + EPS)
    if debug:
        accept = accept & ~parallel
    t_m = jnp.where(accept, t, F_MAX)
    blk_min = jnp.min(t_m, axis=1, keepdims=True)
    return t_m, blk_min


def _trace_inkernel(
    orig, dirn, remaining, aabb_ref, margin, ops_ref, attr_ref,
    tri_block: int, n_blocks: int, debug: bool = False, worklist=None,
    return_raw: bool = False, scratch=None, stream=None, sub=None,
    emit_gcol: bool = False,
):
    """Nearest hit + attribute select for the live wavefront, all in VMEM.

    Visits are BRANCH-FREE: every ``jnp.any``-gated ``lax.cond`` is a
    vector-reduce + scalar-branch Mosaic pipeline sync, measured to cost as
    much as the compute it can skip at these block counts.  Two modes:

    * ``worklist=None`` (the whole-sample megakernel, which cannot know
      future bounce positions at trace time): sweep ALL real blocks in
      ascending index order unconditionally.  ``PTAP_BLOCK_SKIP=1``
      restores the per-visit AABB+distance ``lax.cond`` gates for A/B.
    * ``worklist=(width, list_at)`` (the per-bounce binned engine, whose
      wavefront lives in HBM between bounces): visit exactly the blocks an
      XLA-level slab pass selected (-1-padded list, scalar ``blk >= 0``
      gate) — dead/fully-culled tiles skip every visit body.

    The winning triangle's 16 attribute columns (shade normal, material,
    color, geometric normal, idx+1 — see ``WorldTriangles.attr_rows``) are
    selected by contracting the argmin one-hot against the block's
    (TB, 16) attr slab in one HIGHEST-precision MXU matmul.  ``idx + 1``
    (0 = miss) is the frozen hit topology the differentiable replay
    consumes (diff/fast.py pattern).
    """
    r = orig.shape[0]
    d_n = _norm3(dirn)
    m = _cross3(orig, d_n)
    alive_f = (remaining > 0.0).astype(jnp.float32)
    w16 = jnp.concatenate(
        [d_n, m, orig, jnp.full((r, 1), -1.0, jnp.float32), alive_f,
         jnp.zeros((r, 5), jnp.float32)],
        axis=1,
    )
    # Gate choice is block-count dependent: at reference-scene counts
    # (nb <= 8) the per-visit cond sync costs as much as the compute it
    # skips, so the unconditional sweep wins; at larger packs (up to 64
    # blocks after the 32k-triangle limit) most blocks are skippable and
    # the gates pay for themselves.
    gated = worklist is None and (BLOCK_SKIP or n_blocks > 8)
    if gated:
        small = jnp.abs(d_n) < 1e-12
        inv_d = 1.0 / jnp.where(small, jnp.where(d_n < 0.0, -1e-12, 1e-12), d_n)
        alive = alive_f > 0.0

    col_iota = jax.lax.broadcasted_iota(jnp.int32, (r, tri_block), 1)

    def accept_from_s(s):
        return _accept_chain(s, tri_block, debug)

    def compute_blk(blk, ops_slab=None):
        """The per-block traversal math: (t_m (R, TB), blk_min (R, 1)).

        ``ops_slab`` (streamed mode) is the block's whole (16, 4*TB)
        operand slab already DMA'd into VMEM; otherwise it is sliced out
        of the VMEM-resident pack."""
        if ops_slab is None:
            cols = pl.ds(
                pl.multiple_of(blk * (4 * tri_block), 4 * tri_block),
                4 * tri_block,
            )
            ops_slab = ops_ref[:, cols]
        return accept_from_s(_mm(w16, ops_slab))

    def select_attrs(blk, t_m, attr_slab=None):
        """Winning attributes of this block: argmin one-hot contracted
        against the block's (16, TB) attr slab in one HIGHEST-precision
        MXU matmul (attribute values pass through exactly — the one-hot
        contraction sums a single f32 term per output).

        A single-pass bf16 select over a 3-way bf16-split (48, T) table
        (exact in IEEE terms and verified exact in interpret mode)
        MISCOMPILES under Mosaic — 72% of lanes read wrong values on a
        v5e (r4 measurement); see PERF_NOTES "negative results"."""
        local_arg = jnp.argmin(t_m, axis=1).astype(jnp.int32)[:, None]
        if attr_slab is None:
            acols = pl.ds(pl.multiple_of(blk * tri_block, tri_block), tri_block)
            attr_slab = attr_ref[:, acols]  # (16, TB) — lane slice: dynamic-safe
        slab = attr_slab
        onehot = (col_iota == local_arg).astype(jnp.float32)  # (R, TB)
        return jax.lax.dot_general(
            onehot, slab,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (R, 16)

    if worklist is not None and scratch is not None:
        # Scratch-resident best + @pl.when predication: the lax.cond form
        # below materializes its (R, 1)+(R, 16) carries through every
        # gated visit — measured ~66 ms/bounce of kernel time at mean 2.1
        # visits/tile (prof_r4_binned2), i.e. the conds cost more than the
        # visits.  Predicated writes into VMEM scratch are the dense
        # kernel's pattern (trace.py:_nearest_hit_kernel) and carry
        # nothing.
        nb_w, list_at = worklist
        if emit_gcol:
            # deferred-select mode (r5): the kernel tracks only
            # (best_t, winning global pack column); hit attributes are
            # gathered and shading runs in XLA after the kernel — the
            # argmin's integer select replaces the 6-pass HIGHEST
            # attribute matmul, and the global column doubles as the
            # exact (t, lowest-index) tie-break key.
            assert stream is None, "deferred select is VMEM-resident only"
            assert sub is not None, "deferred select rides the sub-block path"
            best_ref, gcol_ref = scratch
            best_ref[:] = jnp.full((r, 1), F_MAX, jnp.float32)
            gcol_ref[:] = jnp.full((r, 1), jnp.int32(2**30))
        else:
            best_ref, attrs_ref = scratch
            best_ref[:] = jnp.full((r, 1), F_MAX, jnp.float32)
            attrs_ref[:] = jnp.zeros((r, 16), jnp.float32)

        if sub is not None:
            # Sub-block visit groups (r5): each worklist entry is a
            # 128-triangle SUB-block id; one visit gathers ``group``
            # entries' operand/attr columns into a dense 512-wide slab and
            # runs the standard visit body on it.  The list builder
            # (trace._group_sub_lists) guarantees: a group is live iff its
            # first entry is >= 0, every entry of a live group is a valid
            # id, ids ascend within the group (first-win argmin then ties
            # to the lowest global triangle index), and short groups repeat
            # their first id (duplicates are harmless under nearest-min).
            sub_w, group = sub
            assert stream is None, "sub-block mode is VMEM-resident only"
            assert sub_w * group == tri_block, (sub_w, group, tri_block)
            assert nb_w % group == 0, (nb_w, group)
            mm_mode = "f32" if _interpret() else PRECISION_MODE
            probe = BF16_PROBE
            if probe and mm_mode != "f32":
                # hoist the ray-side split: loop-invariant across visits
                # (bf16 single-pass mode uses w_hi too — its probe IS the
                # full product)
                w_hi = w16.astype(jnp.bfloat16)
                if mm_mode == "bf16x3":
                    w_lo = (w16 - w_hi.astype(jnp.float32)).astype(
                        jnp.bfloat16
                    )

            def visit_sub(j, _):
                blk0 = list_at(j * group)

                @pl.when(blk0 >= 0)
                def _():
                    subs = [list_at(j * group + g) for g in range(group)]
                    # pack layout (16, nb, 4, TB): sub id s lives in parent
                    # block s // group at quadrant offset k*TB + (s %
                    # group)*sub_w; gather quadrant-major so the slab is
                    # exactly a virtual block of ``tri_block`` triangles
                    ops_slab = jnp.concatenate(
                        [
                            ops_ref[
                                :,
                                pl.ds(
                                    pl.multiple_of(
                                        (s // group) * (4 * tri_block)
                                        + k * tri_block
                                        + (s % group) * sub_w,
                                        sub_w,
                                    ),
                                    sub_w,
                                ),
                            ]
                            for k in range(4)
                            for s in subs
                        ],
                        axis=1,
                    )  # (16, 4*tri_block)
                    if not emit_gcol:
                        attr_slab = jnp.concatenate(
                            [
                                attr_ref[
                                    :,
                                    pl.ds(
                                        pl.multiple_of(s * sub_w, sub_w),
                                        sub_w,
                                    ),
                                ]
                                for s in subs
                            ],
                            axis=1,
                        )  # (16, tri_block)

                    def refine_and_update(s):
                        t_m, blk_min = accept_from_s(s)
                        if emit_gcol:
                            # integer select of the winning GLOBAL pack
                            # column: argmin over the group concat, then
                            # slot -> sub id via an SMEM-scalar where
                            # chain (r3's "Lane broadcast" limitation on
                            # argmin arithmetic no longer reproduces —
                            # verified by scripts/prof_r5_shade.py)
                            local = jnp.argmin(t_m, axis=1).astype(
                                jnp.int32
                            )[:, None]
                            slot = local // sub_w
                            loc = jax.lax.rem(local, sub_w)
                            base = jnp.full_like(slot, subs[0])
                            for g in range(1, group):
                                base = jnp.where(slot == g, subs[g], base)
                            gcol = base * sub_w + loc
                            best1 = best_ref[:]
                            g1 = gcol_ref[:]
                            improve = (blk_min < best1) | (
                                (blk_min == best1)
                                & (blk_min < F_MAX)
                                & (gcol < g1)
                            )
                            best_ref[:] = jnp.where(improve, blk_min, best1)
                            gcol_ref[:] = jnp.where(improve, gcol, g1)
                            return
                        best0 = best_ref[:]
                        improve_pre = (blk_min < best0) | (
                            (blk_min == best0) & (blk_min < F_MAX)
                        )

                        def do_update():
                            new_attrs = select_attrs(
                                0, t_m, attr_slab=attr_slab
                            )
                            best1 = best_ref[:]
                            attrs1 = attrs_ref[:]
                            improve = (blk_min < best1) | (
                                (blk_min == best1)
                                & (blk_min < F_MAX)
                                & (new_attrs[:, 10:11] < attrs1[:, 10:11])
                            )
                            best_ref[:] = jnp.where(improve, blk_min, best1)
                            attrs_ref[:] = jnp.where(improve, new_attrs, attrs1)

                        if SELECT_GATE:
                            pl.when(jnp.any(improve_pre))(do_update)
                        else:
                            do_update()

                    if not probe:
                        refine_and_update(_mm(w16, ops_slab))
                    else:
                        # --- probe pass: hi*hi bf16 (1/3 of bf16x3), or
                        # the exact product in f32/bf16 modes, with a
                        # conservatively widened accept (see BF16_PROBE)
                        dot = functools.partial(
                            jnp.dot, preferred_element_type=jnp.float32
                        )
                        if mm_mode == "f32":
                            sp = jnp.dot(
                                w16, ops_slab,
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST,
                            )
                        else:
                            b_hi = ops_slab.astype(jnp.bfloat16)
                            sp = dot(w_hi, b_hi)
                        p_ab = sp[:, 0:tri_block]
                        p_bc = sp[:, tri_block : 2 * tri_block]
                        p_ca = sp[:, 2 * tri_block : 3 * tri_block]
                        p_num = sp[:, 3 * tri_block :]
                        det_p = p_ab + p_bc + p_ca
                        absm = (
                            jnp.abs(p_ab) + jnp.abs(p_bc) + jnp.abs(p_ca)
                        )
                        # exact-accepting lanes provably satisfy
                        # |det| >= absm/3.1; below 0.25*absm the lane
                        # cannot accept, above it the probe quotients are
                        # trustworthy to ~3% relative
                        safe = jnp.abs(det_p) > 0.25 * absm
                        inv_p = 1.0 / det_p
                        tp = p_num * inv_p
                        up = p_ca * inv_p
                        vp = p_ab * inv_p
                        sl = PROBE_SLACK
                        uv_ok = (
                            jnp.minimum(up, vp) >= -EPS - sl
                        ) & (jnp.maximum(up, up + vp) <= 1.0 + EPS + sl)
                        t_ok = tp >= -EPS - sl * (1.0 + jnp.abs(tp))
                        cand = uv_ok & t_ok & safe
                        t_lb = jnp.where(
                            cand, tp - sl * (1.0 + jnp.abs(tp)), F_MAX
                        )
                        lb_min = jnp.min(t_lb, axis=1, keepdims=True)
                        best_p = best_ref[:]
                        possible = (lb_min < best_p) | (
                            (lb_min == best_p) & (lb_min < F_MAX)
                        )

                        @pl.when(jnp.any(possible))
                        def _():
                            if mm_mode == "f32" or mm_mode == "bf16":
                                s = sp
                            else:
                                # remaining bf16x3 terms in _mm's exact
                                # add order: (lo*hi + hi*lo) + hi*hi
                                b_hi2 = ops_slab.astype(jnp.bfloat16)
                                b_lo = (
                                    ops_slab - b_hi2.astype(jnp.float32)
                                ).astype(jnp.bfloat16)
                                s = dot(w_lo, b_hi2)
                                s = s + dot(w_hi, b_lo)
                                s = s + sp
                            refine_and_update(s)

                return 0

            jax.lax.fori_loop(0, nb_w // group, visit_sub, 0)
            if emit_gcol:
                return best_ref[:], gcol_ref[:]
            best_t, attrs = best_ref[:], attrs_ref[:]
            if return_raw:
                return best_t, attrs
            return (best_t, attrs[:, 0:3], attrs[:, 3:4], attrs[:, 4:7],
                    attrs[:, 7:10], attrs[:, 10:11], attrs[:, 11:12])

        if stream is not None:
            # Streamed mode: the operand pack lives in HBM; each worklist
            # entry's (16, 4*TB) ops + (16, TB) attr slabs are DMA'd into
            # double-buffered VMEM scratch, prefetching entry j+1 while
            # entry j computes.  Lifts the whole-pack VMEM residency limit
            # (~160k triangles) entirely — the worklist engine now scales
            # to any pack HBM can hold, and per-visit DMA (~160 KB, ~us)
            # hides behind the ~8 us visit.
            ops_hbm, attr_hbm, ops_buf, attr_buf, sem_o, sem_a = stream

            def dma_pair(blk, slot):
                return (
                    pltpu.make_async_copy(
                        ops_hbm.at[
                            :, pl.ds(blk * (4 * tri_block), 4 * tri_block)
                        ],
                        ops_buf.at[slot],
                        sem_o.at[slot],
                    ),
                    pltpu.make_async_copy(
                        attr_hbm.at[:, pl.ds(blk * tri_block, tri_block)],
                        attr_buf.at[slot],
                        sem_a.at[slot],
                    ),
                )

            first = list_at(0)

            @pl.when(first >= 0)
            def _():
                a, b = dma_pair(first, 0)
                a.start()
                b.start()

        def visit_sc(j, _):
            blk = list_at(j)

            @pl.when(blk >= 0)
            def _():
                if stream is not None:
                    slot = jax.lax.rem(j, 2)
                    a, b = dma_pair(blk, slot)
                    a.wait()
                    b.wait()
                    # prefetch the next valid entry into the other slot
                    # (worklists are -1-padded at the END, so entry j
                    # valid implies all earlier entries were valid)
                    nxt = list_at(jnp.minimum(j + 1, nb_w - 1))

                    @pl.when((j + 1 < nb_w) & (nxt >= 0))
                    def _():
                        a2, b2 = dma_pair(nxt, 1 - slot)
                        a2.start()
                        b2.start()

                    t_m, blk_min = compute_blk(blk, ops_slab=ops_buf[slot])
                    attr_slab = attr_buf[slot]
                else:
                    t_m, blk_min = compute_blk(blk)
                    attr_slab = None
                best0 = best_ref[:]
                improve_pre = (blk_min < best0) | (
                    (blk_min == best0) & (blk_min < F_MAX)
                )

                def do_update():
                    new_attrs = select_attrs(blk, t_m, attr_slab=attr_slab)
                    best1 = best_ref[:]
                    attrs1 = attrs_ref[:]
                    improve = (blk_min < best1) | (
                        (blk_min == best1)
                        & (blk_min < F_MAX)
                        & (new_attrs[:, 10:11] < attrs1[:, 10:11])
                    )
                    best_ref[:] = jnp.where(improve, blk_min, best1)
                    attrs_ref[:] = jnp.where(improve, new_attrs, attrs1)

                if SELECT_GATE:
                    pl.when(jnp.any(improve_pre))(do_update)
                else:
                    do_update()

            return 0

        jax.lax.fori_loop(0, nb_w, visit_sc, 0)
        best_t, attrs = best_ref[:], attrs_ref[:]
        if return_raw:
            return best_t, attrs
        return (best_t, attrs[:, 0:3], attrs[:, 3:4], attrs[:, 4:7],
                attrs[:, 7:10], attrs[:, 10:11], attrs[:, 11:12])

    def visit_block(blk, carry):
        best_t, attrs = carry
        t_m, blk_min = compute_blk(blk)

        # a visit can touch the carry only if some lane's block-min beats
        # (worklist: ties included for the index tie-break) its current
        # best — precomputing this BEFORE argmin + attribute select lets a
        # scalar cond skip them (~3.6 us/visit measured r4, 31% of the
        # whole kernel) for the cost of one vector->scalar sync (~0.8 us,
        # the r3 BLOCK_SKIP measurement).  Unlike the r3 AABB gates this
        # gate sits BEHIND the matmul, so it never changes which blocks
        # are traced — results are bit-identical gated or not.
        improve_pre = blk_min < best_t
        if worklist is not None:
            improve_pre = improve_pre | (
                (blk_min == best_t) & (blk_min < F_MAX)
            )

        def do_select(carry):
            best_t, attrs = carry
            new_attrs = select_attrs(blk, t_m)

            # lexicographic (t, idx) tie-break, matching the other engines.
            # In ascending-block order the strict < suffices; worklist mode
            # visits blocks tmin-sorted (out of index order), so exact-t
            # ties across blocks (shared mesh edges) need the explicit
            # index compare.  Both idx+1 values come from attr row 10 via
            # the select matmul — deriving the candidate from
            # ``blk * TB + local_arg`` instead hits Mosaic "Not
            # implemented: Lane broadcast" on the argmin layout.
            improve = blk_min < best_t
            if worklist is not None:
                improve = improve | (
                    (blk_min == best_t)
                    & (blk_min < F_MAX)
                    & (new_attrs[:, 10:11] < attrs[:, 10:11])
                )
            return (
                jnp.where(improve, blk_min, best_t),
                jnp.where(improve, new_attrs, attrs),
            )

        if SELECT_GATE:
            return jax.lax.cond(
                jnp.any(improve_pre), do_select, lambda c: c, carry
            )
        return do_select(carry)

    def visit_gated(blk, carry):
        best_t, attrs = carry
        bb_min = jnp.stack([aabb_ref[blk, 0], aabb_ref[blk, 1], aabb_ref[blk, 2]])
        bb_max = jnp.stack([aabb_ref[blk, 3], aabb_ref[blk, 4], aabb_ref[blk, 5]])
        lo = (bb_min[None, :] - orig) * inv_d
        hi = (bb_max[None, :] - orig) * inv_d
        tmin = jnp.max(jnp.minimum(lo, hi), axis=1, keepdims=True)
        tmax = jnp.min(jnp.maximum(lo, hi), axis=1, keepdims=True)
        box_hit = (
            (tmax >= -margin)
            & (tmin <= tmax + margin)
            & (tmin - margin <= best_t)
            & alive
        )
        return jax.lax.cond(
            jnp.any(box_hit), lambda c: visit_block(blk, c), lambda c: c, carry
        )

    if scratch is not None:
        # Scratch-resident best + @pl.when for the CONDLESS sweep: every
        # block's matmul+accept runs unconditionally, but argmin+select
        # update the scratch under predication instead of a
        # carry-materializing lax.cond (the worklist kernels' r4 win,
        # measured ~3 us/visit of pure cond-carry overhead).
        best_ref, attrs_ref = scratch
        best_ref[:] = jnp.full((r, 1), F_MAX, jnp.float32)
        attrs_ref[:] = jnp.zeros((r, 16), jnp.float32)

        def visit_sweep(blk, _):
            t_m, blk_min = compute_blk(blk)
            improve_pre = blk_min < best_ref[:]

            def do_update():
                new_attrs = select_attrs(blk, t_m)
                best1 = best_ref[:]
                attrs1 = attrs_ref[:]
                improve = blk_min < best1
                best_ref[:] = jnp.where(improve, blk_min, best1)
                attrs_ref[:] = jnp.where(improve, new_attrs, attrs1)

            if SELECT_GATE:
                pl.when(jnp.any(improve_pre))(do_update)
            else:
                do_update()
            return 0

        def visit_sweep_gated(blk, _):
            # AABB + distance pre-gate for many-block packs (the adaptive
            # gating of the 32k-triangle fused limit), scratch edition
            bb_min = jnp.stack(
                [aabb_ref[blk, 0], aabb_ref[blk, 1], aabb_ref[blk, 2]]
            )
            bb_max = jnp.stack(
                [aabb_ref[blk, 3], aabb_ref[blk, 4], aabb_ref[blk, 5]]
            )
            lo = (bb_min[None, :] - orig) * inv_d
            hi = (bb_max[None, :] - orig) * inv_d
            tmin = jnp.max(jnp.minimum(lo, hi), axis=1, keepdims=True)
            tmax = jnp.min(jnp.maximum(lo, hi), axis=1, keepdims=True)
            box_hit = (
                (tmax >= -margin)
                & (tmin <= tmax + margin)
                & (tmin - margin <= best_ref[:])
                & alive
            )
            @pl.when(jnp.any(box_hit))
            def _():
                visit_sweep(blk, None)

            return 0

        jax.lax.fori_loop(
            0, n_blocks, visit_sweep_gated if gated else visit_sweep, 0,
            unroll=n_blocks <= 8,
        )
        best_t, attrs = best_ref[:], attrs_ref[:]
        if return_raw:
            return best_t, attrs
        return (best_t, attrs[:, 0:3], attrs[:, 3:4], attrs[:, 4:7],
                attrs[:, 7:10], attrs[:, 10:11], attrs[:, 11:12])

    init = (jnp.full((r, 1), F_MAX, jnp.float32),
            jnp.zeros((r, 16), jnp.float32))
    if worklist is not None:
        # static loop bound + scalar SMEM `blk >= 0` gate: Mosaic rejects
        # dynamic trip counts here ("Not implemented: Lane broadcast"),
        # and a scalar-predicate cond costs no vector->scalar sync
        nb_w, list_at = worklist

        def visit_listed(j, c):
            blk = list_at(j)
            return jax.lax.cond(
                blk >= 0, lambda cc: visit_block(blk, cc), lambda cc: cc, c
            )

        best_t, attrs = jax.lax.fori_loop(0, nb_w, visit_listed, init)
    else:
        # unroll small block counts: straight-line code lets Mosaic
        # schedule across visits without loop-carried bookkeeping
        best_t, attrs = jax.lax.fori_loop(
            0,
            n_blocks,
            visit_gated if gated else visit_block,
            init,
            unroll=n_blocks <= 8,
        )
    if return_raw:
        return best_t, attrs
    # [shade_n, mat_type, rgb, geom_n, idx+1, ri] — WorldTriangles.attr_rows
    return (best_t, attrs[:, 0:3], attrs[:, 3:4], attrs[:, 4:7],
            attrs[:, 7:10], attrs[:, 10:11], attrs[:, 11:12])


def _megakernel(
    aabb_ref,  # SMEM (nb, 8)
    margin_ref,  # SMEM (1,)
    w_ref,  # (R, 16) primary pack [d, o x d, o, -1, 1, 0...]
    prim_ref,  # (R, 16) primary hit [t, shade_n(3), mt, rgb(3), geom_n(3), idx+1, ri, 0(3)]
    u_ref,  # (R, 4*B) uniforms, bounce-major ((1, R, 4*B) when sample-batched)
    ops_ref,  # (16, 4*T)
    attr_ref,  # (16, T)
    out_ref,  # (R, 4)
    *rest,  # [idx_ref (emit_idx only)], best_sc (R, 1), attrs_sc (R, 16)
    tri_block: int,
    n_blocks: int,
    max_bounces: int,
    parity: bool,
    use_primary: bool,
    emit_idx: bool = False,
    debug: bool = False,
    sample_batch: bool = False,
):
    if emit_idx:
        idx_ref, best_sc, attrs_sc = rest
    else:
        (best_sc, attrs_sc) = rest
        idx_ref = None
    r = w_ref.shape[0]
    margin = margin_ref[0]
    orig = w_ref[:, 6:9]
    dirn = w_ref[:, 0:3]
    idx_cols = []
    u_all = u_ref[0] if sample_batch else u_ref
    # emit_idx (the differentiable replay) stays on the row layout — its
    # per-bounce idx columns are row vectors by construction
    shade_t = SHADE_T and not emit_idx

    if shade_t:
        color_t = jnp.ones((3, r), jnp.float32)
        remaining_t = jnp.full((1, r), float(max_bounces), jnp.float32)
    else:
        color = jnp.ones((r, 3), jnp.float32)
        remaining = jnp.full((r, 1), float(max_bounces), jnp.float32)

    for b in range(max_bounces):
        if shade_t:
            remaining = remaining_t.T
        if b == 0 and use_primary:
            if shade_t:
                pt_ = prim_ref[:].T  # (16, R)
                t_t, n_t = pt_[0:1], pt_[1:4]
                mt_t, mc_t, gn_t = pt_[4:5], pt_[5:8], pt_[8:11]
                ri_t = pt_[12:13]
            else:
                t = prim_ref[:, 0:1]
                n = prim_ref[:, 1:4]
                mt = prim_ref[:, 4:5]
                mc = prim_ref[:, 5:8]
                gn = prim_ref[:, 8:11]
                idx1 = prim_ref[:, 11:12]
                ri = prim_ref[:, 12:13]
        elif shade_t:
            # sweep mode stays on the lax.cond/carry form: the scratch
            # variant measured 10.85 vs 11.04 Mrays/s here (the per-visit
            # scratch read-modify-write outweighs the occasional gated
            # cond's carry cost when every block is visited anyway);
            # scratch only wins where visits themselves are gated
            # (worklist kernels)
            best_t, attrs = _trace_inkernel(
                orig, dirn, remaining, aabb_ref, margin, ops_ref, attr_ref,
                tri_block, n_blocks, debug=debug, return_raw=True,
            )
            at = attrs.T  # (16, R) — ONE relayout instead of 5 row slices
            t_t = best_t.T
            n_t, mt_t, mc_t, gn_t = at[0:3], at[3:4], at[4:7], at[7:10]
            ri_t = at[11:12]
        else:
            t, n, mt, mc, gn, idx1, ri = _trace_inkernel(
                orig, dirn, remaining, aabb_ref, margin, ops_ref, attr_ref,
                tri_block, n_blocks, debug=debug,
            )
        if emit_idx:
            # a frozen topology entry only counts where the lane was live
            idx_cols.append(jnp.where(remaining > 0.0, idx1, 0.0))
        u = u_all[:, 4 * b : 4 * b + 4]
        if shade_t:
            o_t, d_t, color_t, remaining_t = _shade_inkernel_t(
                orig.T, dirn.T, color_t, remaining_t,
                t_t, n_t, mt_t, mc_t, gn_t, u.T, parity, ri=ri_t,
            )
            orig, dirn = o_t.T, d_t.T
        else:
            orig, dirn, color, remaining = _shade_inkernel(
                orig, dirn, color, remaining, t, n, mt, mc, gn, u, parity,
                ri=ri,
            )

    if shade_t:
        out = jnp.concatenate(
            [jnp.sqrt(jnp.maximum(color_t, 0.0)), jnp.zeros((1, r), jnp.float32)],
            axis=0,
        ).T
    else:
        out = jnp.concatenate(
            [jnp.sqrt(jnp.maximum(color, 0.0)), jnp.zeros((r, 1), jnp.float32)],
            axis=1,
        )
    if sample_batch:
        # grid (nt, ns): the output block index is constant over samples, so
        # the VMEM buffer persists across the s dimension — accumulate in
        # place, write-through happens when the tile changes (the per-tile
        # analog of the reference's image += per iteration,
        # Renderer.cpp:489-495, without per-sample HBM traffic)
        s = pl.program_id(1)

        @pl.when(s == 0)
        def _():
            out_ref[:] = out

        @pl.when(s != 0)
        def _():
            out_ref[:] = out_ref[:] + out
    else:
        out_ref[:] = out
    if emit_idx:
        idx_cols.append(
            jnp.zeros((r, _idx_width(max_bounces) - max_bounces), jnp.float32)
        )
        idx_ref[:] = jnp.concatenate(idx_cols, axis=1)



def _attr_table(world: WorldTriangles):
    """The (16, T) attribute table fed to the in-kernel select."""
    return world.attr_rows

def _sample_pallas_call(
    world: WorldTriangles,
    w16: jax.Array,  # (N, 16)
    prim: jax.Array,  # (N, 16)
    uniforms: jax.Array,  # (N, 4*B)
    margin: jax.Array,  # () f32
    max_bounces: int,
    parity: bool,
    use_primary: bool,
    ray_tile: int = RAY_TILE,
    emit_idx: bool = False,
    debug: bool = False,
):
    n = w16.shape[0]
    nb = world.block_aabb.shape[0]
    tri_block = world.tri_block
    assert n % ray_tile == 0, (n, ray_tile)
    nt = n // ray_tile
    ucols = uniforms.shape[1]

    out_specs = [pl.BlockSpec((ray_tile, 4), lambda i, A, M: (i, 0))]
    out_shape = [jax.ShapeDtypeStruct((n, 4), jnp.float32)]
    if emit_idx:
        iw = _idx_width(max_bounces)
        out_specs.append(pl.BlockSpec((ray_tile, iw), lambda i, A, M: (i, 0)))
        out_shape.append(jax.ShapeDtypeStruct((n, iw), jnp.float32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((ray_tile, 16), lambda i, A, M: (i, 0)),
            pl.BlockSpec((ray_tile, 16), lambda i, A, M: (i, 0)),
            pl.BlockSpec((ray_tile, ucols), lambda i, A, M: (i, 0)),
            pl.BlockSpec((16, world.fused_ops.shape[1]), lambda i, A, M: (0, 0)),
            pl.BlockSpec(_attr_table(world).shape, lambda i, A, M: (0, 0)),
        ],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((ray_tile, 1), jnp.float32),
            pltpu.VMEM((ray_tile, 16), jnp.float32),
        ],
    )
    outs = pl.pallas_call(
        functools.partial(
            _megakernel,
            tri_block=tri_block,
            n_blocks=nb,
            max_bounces=max_bounces,
            parity=parity,
            use_primary=use_primary,
            emit_idx=emit_idx,
            debug=debug,
        ),
        grid_spec=grid_spec,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=2 * n * world.fused_ops.shape[1] * 16 * max_bounces,
            bytes_accessed=n * (16 + 8 + ucols + 4) * 4 + world.fused_ops.size * 4,
            transcendentals=n * max_bounces * 8,
        ),
        # the default 16 MB scoped-vmem budget cannot hold the operand pack
        # plus two (R, 4*TB) f32 partials; v5e has 128 MB physical VMEM
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(
        world.block_aabb, margin.reshape(1),
        w16, prim, uniforms, world.fused_ops, _attr_table(world),
    )
    if emit_idx:
        return outs[0][:, 0:3], outs[1]
    return outs[0][:, 0:3]


def _sample_pallas_call_batched(
    world: WorldTriangles,
    w16: jax.Array,  # (N, 16)
    prim: jax.Array,  # (N, 16)
    uniforms: jax.Array,  # (ns, N, 4*B)
    margin: jax.Array,  # () f32
    max_bounces: int,
    parity: bool,
    ray_tile: int = RAY_TILE,
    debug: bool = False,
):
    """Sample-batched megakernel: grid (tiles, samples), the per-tile output
    accumulated in VMEM across the sample dimension (PERF_NOTES r3 lever 2).
    Parity camera only (same primary pack for every sample).  Returns the
    (N, 3) SUM of the ns samples' contributions."""
    n = w16.shape[0]
    ns = uniforms.shape[0]
    nb = world.block_aabb.shape[0]
    tri_block = world.tri_block
    assert n % ray_tile == 0, (n, ray_tile)
    nt = n // ray_tile
    ucols = uniforms.shape[2]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nt, ns),
        in_specs=[
            pl.BlockSpec((ray_tile, 16), lambda i, s, A, M: (i, 0)),
            pl.BlockSpec((ray_tile, 16), lambda i, s, A, M: (i, 0)),
            pl.BlockSpec((1, ray_tile, ucols), lambda i, s, A, M: (s, i, 0)),
            pl.BlockSpec(
                (16, world.fused_ops.shape[1]), lambda i, s, A, M: (0, 0)
            ),
            pl.BlockSpec(
                _attr_table(world).shape, lambda i, s, A, M: (0, 0)
            ),
        ],
        out_specs=[pl.BlockSpec((ray_tile, 4), lambda i, s, A, M: (i, 0))],
        scratch_shapes=[
            pltpu.VMEM((ray_tile, 1), jnp.float32),
            pltpu.VMEM((ray_tile, 16), jnp.float32),
        ],
    )
    (out,) = pl.pallas_call(
        functools.partial(
            _megakernel,
            tri_block=tri_block,
            n_blocks=nb,
            max_bounces=max_bounces,
            parity=parity,
            use_primary=True,
            emit_idx=False,
            debug=debug,
            sample_batch=True,
        ),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n, 4), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * world.fused_ops.shape[1] * 16 * max_bounces * ns,
            bytes_accessed=n * (16 + 12 + ns * ucols + 4) * 4
            + world.fused_ops.size * 4,
            transcendentals=n * max_bounces * 8 * ns,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(
        world.block_aabb, margin.reshape(1),
        w16, prim, uniforms, world.fused_ops, _attr_table(world),
    )
    return out[:, 0:3]


def _rng_tiling(n: int, n_pad: int, rng_tile: int = RNG_TILE):
    """The other engines draw per-ray uniforms in tiles of
    ``min(n, 8192)`` rays (``render_ray_array``); reproduce that tiling so
    streams match per pixel.  Returns (tile_n, n_tiles)."""
    if n <= rng_tile:
        return n, 1
    return rng_tile, -(-n // rng_tile)


def _pad_rows(u: jax.Array, n_pad: int) -> jax.Array:
    if u.shape[0] < n_pad:
        return jnp.pad(u, ((0, n_pad - u.shape[0]), (0, 0)))
    return u[:n_pad]


def chunk_uniforms(
    key: jax.Array,
    sample_index,
    max_bounces: int,
    n: int,
    n_pad: int,
    tile_base=0,
) -> jax.Array:
    """(n_pad, 4*max_bounces) uniforms for one sample iteration, drawn from
    the SAME per-ray-tile stream as ``ops.rng.tile_uniforms`` so the
    megakernel's noise is per-pixel identical to the other engines'."""
    tile_n, nt = _rng_tiling(n, n_pad)

    def per_depth(depth):
        kd = bounce_key(key, sample_index, depth)
        keys = jax.vmap(lambda k: jax.random.fold_in(kd, k))(
            tile_base + jnp.arange(nt)
        )
        u = jax.vmap(lambda kk: jax.random.uniform(kk, (tile_n, 4)))(keys)
        return _pad_rows(u.reshape(-1, 4), n_pad)

    return jnp.concatenate(
        [per_depth(max_bounces - b) for b in range(max_bounces)], axis=1
    )


def render_samples_fused(
    world: WorldTriangles,
    ro: jax.Array,
    rd: jax.Array,
    key: jax.Array,
    n_samples: int,
    max_bounces: int,
    sample_offset=0,
    parity: bool = True,
    tile_base=0,
    jitter_step=None,
    ray_tile: int = RAY_TILE,
    debug=None,
) -> jax.Array:
    """Accumulate ``n_samples`` sample iterations with the megakernel;
    returns (N, 3) contribution sums (pre-normalization).

    The primary trace runs ONCE per chunk through the worklist kernel (the
    reference's first-intersection cache, Renderer.cpp:594-613) unless
    ``jitter_step`` enables the quality-mode AA camera, in which case every
    sample re-traces its jittered primaries inside the megakernel.
    """
    from .trace import _slab_margin, trace_pallas
    from ..ops.rng import camera_jitter_uniforms
    from ..utils.debug import resolve_debug

    debug = resolve_debug(debug)
    n = ro.shape[0]
    rd_n = normalize(rd)
    pad = (-n) % ray_tile
    if pad:
        ro_p = jnp.pad(ro, ((0, pad), (0, 0)))
        rd_p = jnp.pad(rd_n, ((0, pad), (0, 0)), constant_values=1.0)
        rd_raw = jnp.pad(rd, ((0, pad), (0, 0)), constant_values=1.0)
    else:
        ro_p, rd_p, rd_raw = ro, rd_n, rd
    n_pad = ro_p.shape[0]
    margin = _slab_margin(world.block_aabb)

    use_primary = jitter_step is None

    def pack_rays(rd_cur):
        m = _cross3(ro_p, rd_cur)
        return jnp.concatenate(
            [rd_cur, m, ro_p, jnp.full((n_pad, 1), -1.0, jnp.float32),
             jnp.ones((n_pad, 1), jnp.float32),
             jnp.zeros((n_pad, 5), jnp.float32)],
            axis=1,
        )

    if use_primary:
        hits0 = trace_pallas(world, ro_p, rd_p)
        ri0 = (
            hits0.mat_ri[:, None]
            if hits0.mat_ri is not None
            else jnp.full((n_pad, 1), 1.5, jnp.float32)
        )
        prim = jnp.concatenate(
            [
                hits0.t[:, None],
                hits0.normal,
                hits0.mat_type.astype(jnp.float32)[:, None],
                hits0.mat_color,
                hits0.geom_normal,
                jnp.zeros((n_pad, 1), jnp.float32),
                ri0,
                jnp.zeros((n_pad, 3), jnp.float32),
            ],
            axis=1,
        )
        w16 = pack_rays(rd_p)
    else:
        prim = jnp.zeros((n_pad, 16), jnp.float32)

    if use_primary and SAMPLE_BATCH > 1 and n_samples > 1:
        # sample-batched grid (PERF_NOTES r3 lever 2): uniforms for up to
        # SAMPLE_BATCH samples are pre-drawn and streamed per grid step;
        # the per-tile output accumulates in VMEM across the sample
        # dimension.  Sub-batched so the uniform buffer stays bounded
        # (~0.5 GB at 8 x 800k x 20 cols).
        acc = jnp.zeros((n_pad, 3), jnp.float32)
        done = 0
        while done < n_samples:
            ns = min(SAMPLE_BATCH, n_samples - done)
            offs = sample_offset + done + jnp.arange(ns)
            u_all = jax.vmap(
                lambda s: chunk_uniforms(key, s, max_bounces, n, n_pad, tile_base)
            )(offs)
            acc = acc + _sample_pallas_call_batched(
                world, w16, prim, u_all, margin, max_bounces, parity,
                ray_tile=ray_tile, debug=debug,
            )
            done += ns
        return acc[:n]

    def body(i, acc):
        s = sample_offset + i
        u = chunk_uniforms(key, s, max_bounces, n, n_pad, tile_base)
        if use_primary:
            w = w16
        else:
            tile_n, nt = _rng_tiling(n, n_pad)
            ju = jax.vmap(
                lambda k: camera_jitter_uniforms(key, s, k, tile_n)
            )(tile_base + jnp.arange(nt)).reshape(-1, 2)
            ju = _pad_rows(ju, n_pad)
            # jitter offsets apply to the UNNORMALIZED image-plane direction
            # (rd = pix - eye, Renderer.cpp:548), matching _render_tile
            rd_s = rd_raw + jnp.concatenate(
                [ju[:, 0:1] * jitter_step[0], ju[:, 1:2] * jitter_step[1],
                 jnp.zeros((n_pad, 1), jnp.float32)], axis=1,
            )
            w = pack_rays(normalize(rd_s))
        contrib = _sample_pallas_call(
            world, w, prim, u, margin, max_bounces, parity, use_primary,
            ray_tile=ray_tile, debug=debug,
        )
        return acc + contrib

    acc = jax.lax.fori_loop(
        0, n_samples, body, jnp.zeros((n_pad, 3), jnp.float32)
    )
    return acc[:n]


# ---------------------------------------------------------------------------
# Binned wavefront: one bounce per kernel call, rays re-sorted between
# bounces by (origin Morton, direction octant).
#
# After bounce 0 a 512-ray tile mixes every direction and position, so
# tile-level block culling degenerates to visiting nearly every block
# (measured 4.7/8 on primaries but ~all on secondaries).  Sorting the
# wavefront between bounces restores tile coherence at the cost of an XLA
# argsort + gathers per bounce — the "ray stream" reordering of wavefront
# tracers, TPU-style.  Per-ray uniforms ride the permutation (gathered by
# original ray id), so the binned image is bit-identical to the unbinned
# megakernel's up to traversal tie-breaks.
# ---------------------------------------------------------------------------


def _bounce_kernel(
    nlive_ref,  # SMEM (nt,) i32 — live rays per tile (dead tiles skipped)
    list_ref,  # SMEM (nt, nb) i32 — per-tile tmin-sorted block worklist
    st_ref,  # (R, 16) [orig(0:3), dir(3:6), color(6:9), remaining(9), 0...]
    u_ref,  # (R, 4)
    ops_ref,  # (16, 4*T) — VMEM-resident, or HBM (ANY) when streamed
    attr_ref,  # (16, T) — ditto
    out_ref,  # (R, 16)
    best_sc,  # scratch VMEM (R, 1) — worklist best-t (see _trace_inkernel)
    attrs_sc,  # scratch VMEM (R, 16)
    *stream_scratch,  # streamed only: ops_buf, attr_buf, sem_ops, sem_attr
    tri_block: int,
    parity: bool,
    debug: bool = False,
    streamed: bool = False,
    sub_group: int = 0,
):
    """One binned wavefront bounce: worklist trace + shade.

    The visit set comes entirely from the XLA-level slab pass
    (``trace._tile_block_lists`` on the sorted wavefront) — the kernel
    gates each entry on a scalar SMEM ``blk >= 0`` test (no
    vector->scalar syncs).  Sorting sinks dead rays to the wavefront's
    tail, so whole-tile death is the common case on late bounces (live
    fraction 0.89 -> 0.32 over bounces 1-4, prof_r4_binned): the per-tile
    ``nlive`` scalar skips trace AND shade for such tiles with a plain
    state pass-through — the wavefront analog of the reference's shrinking
    compacted launches (Renderer.cpp:628-634).

    ``streamed=True`` keeps the operand pack in HBM and double-buffers
    per-visit slab DMAs through the extra scratch (see _trace_inkernel's
    stream mode) — the route for scenes above the VMEM pack limit."""
    i = pl.program_id(0)
    if streamed:
        ops_buf, attr_buf, sem_o, sem_a = stream_scratch
        stream = (ops_ref, attr_ref, ops_buf, attr_buf, sem_o, sem_a)
    else:
        stream = None
    sub = (SUB_BLOCK, sub_group) if sub_group else None

    @pl.when(nlive_ref[i] == 0)
    def _():
        out_ref[:] = st_ref[:]

    @pl.when(nlive_ref[i] > 0)
    def _():
        orig = st_ref[:, 0:3]
        dirn = st_ref[:, 3:6]
        color = st_ref[:, 6:9]
        remaining = st_ref[:, 9:10]
        r = orig.shape[0]
        if SHADE_T:
            best_t, attrs = _trace_inkernel(
                orig, dirn, remaining, None, 0.0, ops_ref, attr_ref,
                tri_block, 0, debug=debug,
                worklist=(list_ref.shape[1], lambda j: list_ref[i, j]),
                return_raw=True, scratch=(best_sc, attrs_sc), stream=stream,
                sub=sub,
            )
            at = attrs.T
            o_t, d_t, c_t, r_t = _shade_inkernel_t(
                orig.T, dirn.T, color.T, remaining.T,
                best_t.T, at[0:3], at[3:4], at[4:7], at[7:10],
                u_ref[:].T, parity, ri=at[11:12],
            )
            out_ref[:] = jnp.concatenate([o_t, d_t, c_t, r_t], axis=0).T
        else:
            t, n, mt, mc, gn, _, ri = _trace_inkernel(
                orig, dirn, remaining, None, 0.0, ops_ref, attr_ref,
                tri_block, 0, debug=debug,
                worklist=(list_ref.shape[1], lambda j: list_ref[i, j]),
                scratch=(best_sc, attrs_sc), stream=stream, sub=sub,
            )
            orig, dirn, color, remaining = _shade_inkernel(
                orig, dirn, color, remaining, t, n, mt, mc, gn, u_ref[:],
                parity, ri=ri,
            )
            out_ref[:] = jnp.concatenate(
                [orig, dirn, color, remaining], axis=1
            )


def _bounce_call(world, margin, pack, u, parity, ray_tile, debug=False):
    from .trace import _group_sub_lists, _tile_block_lists, max_list_tiles

    n = pack.shape[0]
    tri_block = world.tri_block
    nt = n // ray_tile

    nb = world.block_aabb.shape[0]
    streamed = nb > STREAM_BLOCKS
    # r5 sub-block worklists: cull at 128-triangle granularity, visit in
    # groups of tri_block/128 entries (VMEM-resident packs only — the
    # streamed kernels keep whole-block DMAs)
    use_sub = (
        SUBBLOCKS
        and not streamed
        and nb <= SUB_MAX_BLOCKS
        and world.sub_aabb is not None
        and tri_block > SUB_BLOCK
        and tri_block % SUB_BLOCK == 0
    )
    sub_group = tri_block // SUB_BLOCK if use_sub else 0

    # bound the (nt, lists) scalar-prefetch SMEM worklists by chunking rows
    list_width = world.sub_aabb.shape[0] if use_sub else nb
    max_tiles = max_list_tiles(list_width)
    if nt > max_tiles:
        chunk = max_tiles * ray_tile
        outs = [
            _bounce_call(world, margin, pack[s0:s0 + chunk],
                         u[s0:s0 + chunk], parity, ray_tile, debug=debug)
            for s0 in range(0, n, chunk)
        ]
        return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)

    orig = pack[:, 0:3]
    d_n = pack[:, 3:6] * jax.lax.rsqrt(
        jnp.maximum(jnp.sum(pack[:, 3:6] ** 2, axis=1, keepdims=True), 1e-30)
    )
    alive_f = (pack[:, 9:10] > 0.0).astype(jnp.float32)
    if use_sub:
        sub_lists = _tile_block_lists(
            world.sub_aabb, orig, d_n, alive_f, ray_tile, margin
        )
        block_list = _group_sub_lists(sub_lists, sub_group)
    else:
        block_list = _tile_block_lists(
            world.block_aabb, orig, d_n, alive_f, ray_tile, margin
        )
    nlive = jnp.sum(
        alive_f.reshape(nt, ray_tile).astype(jnp.int32), axis=1
    )
    scratch_shapes = [
        pltpu.VMEM((ray_tile, 1), jnp.float32),
        pltpu.VMEM((ray_tile, 16), jnp.float32),
    ]
    if streamed:
        # pack stays in HBM (ANY); per-visit slabs ride double-buffered DMAs
        ops_spec = pl.BlockSpec(memory_space=pltpu.ANY)
        attr_spec = pl.BlockSpec(memory_space=pltpu.ANY)
        scratch_shapes += [
            pltpu.VMEM((2, 16, 4 * tri_block), jnp.float32),
            pltpu.VMEM((2, 16, tri_block), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    else:
        ops_spec = pl.BlockSpec(
            (16, world.fused_ops.shape[1]), lambda i, L, W: (0, 0)
        )
        attr_spec = pl.BlockSpec(_attr_table(world).shape, lambda i, L, W: (0, 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((ray_tile, pack.shape[1]), lambda i, L, W: (i, 0)),
            pl.BlockSpec((ray_tile, 4), lambda i, L, W: (i, 0)),
            ops_spec,
            attr_spec,
        ],
        out_specs=[
            pl.BlockSpec((ray_tile, pack.shape[1]), lambda i, L, W: (i, 0))
        ],
        scratch_shapes=scratch_shapes,
    )
    (out,) = pl.pallas_call(
        functools.partial(
            _bounce_kernel, tri_block=tri_block, parity=parity, debug=debug,
            streamed=streamed, sub_group=sub_group,
        ),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n, pack.shape[1]), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(nlive, block_list, pack, u, world.fused_ops, _attr_table(world))
    return out


def _bounce_trace_kernel(
    nlive_ref,  # SMEM (nt,) i32
    list_ref,  # SMEM (nt, nsb) i32 grouped sub-block worklists
    st_ref,  # (R, 16) ray state pack
    ops_ref,  # (16, 4*T) VMEM-resident operand pack
    out_ref,  # (R, 2) [best_t, gcol+1 (0 = miss)]
    best_sc,  # scratch VMEM (R, 1) f32
    gcol_sc,  # scratch VMEM (R, 1) i32
    *,
    tri_block: int,
    sub_group: int,
    debug: bool = False,
):
    """Trace-only binned bounce (deferred shading, r5): nearest hit +
    winning global pack column; attribute gather + shading happen in XLA
    after the kernel (see DEFER_SHADE)."""
    i = pl.program_id(0)
    r = st_ref.shape[0]

    @pl.when(nlive_ref[i] == 0)
    def _():
        out_ref[:] = jnp.concatenate(
            [jnp.full((r, 1), F_MAX, jnp.float32),
             jnp.zeros((r, 1), jnp.float32)], axis=1
        )

    @pl.when(nlive_ref[i] > 0)
    def _():
        orig = st_ref[:, 0:3]
        dirn = st_ref[:, 3:6]
        remaining = st_ref[:, 9:10]
        best_t, gcol = _trace_inkernel(
            orig, dirn, remaining, None, 0.0, ops_ref, None,
            tri_block, 0, debug=debug,
            worklist=(list_ref.shape[1], lambda j: list_ref[i, j]),
            scratch=(best_sc, gcol_sc), sub=(SUB_BLOCK, sub_group),
            emit_gcol=True,
        )
        hit = best_t < F_MAX
        out_ref[:] = jnp.concatenate(
            [best_t, jnp.where(hit, gcol.astype(jnp.float32) + 1.0, 0.0)],
            axis=1,
        )


def _bounce_trace_call(world, margin, pack, ray_tile, debug=False):
    """(N, 2) [best_t, gcol+1] for one deferred-shading bounce."""
    from .trace import _group_sub_lists, _tile_block_lists, max_list_tiles

    n = pack.shape[0]
    tri_block = world.tri_block
    nt = n // ray_tile
    sub_group = tri_block // SUB_BLOCK

    max_tiles = max_list_tiles(world.sub_aabb.shape[0])
    if nt > max_tiles:
        chunk = max_tiles * ray_tile
        outs = [
            _bounce_trace_call(world, margin, pack[s0:s0 + chunk],
                               ray_tile, debug=debug)
            for s0 in range(0, n, chunk)
        ]
        return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)

    orig = pack[:, 0:3]
    d_n = pack[:, 3:6] * jax.lax.rsqrt(
        jnp.maximum(jnp.sum(pack[:, 3:6] ** 2, axis=1, keepdims=True), 1e-30)
    )
    alive_f = (pack[:, 9:10] > 0.0).astype(jnp.float32)
    sub_lists = _tile_block_lists(
        world.sub_aabb, orig, d_n, alive_f, ray_tile, margin
    )
    block_list = _group_sub_lists(sub_lists, sub_group)
    nlive = jnp.sum(alive_f.reshape(nt, ray_tile).astype(jnp.int32), axis=1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((ray_tile, pack.shape[1]), lambda i, L, W: (i, 0)),
            pl.BlockSpec(
                (16, world.fused_ops.shape[1]), lambda i, L, W: (0, 0)
            ),
        ],
        out_specs=[pl.BlockSpec((ray_tile, 2), lambda i, L, W: (i, 0))],
        scratch_shapes=[
            pltpu.VMEM((ray_tile, 1), jnp.float32),
            pltpu.VMEM((ray_tile, 1), jnp.int32),
        ],
    )
    (out,) = pl.pallas_call(
        functools.partial(
            _bounce_trace_kernel, tri_block=tri_block, sub_group=sub_group,
            debug=debug,
        ),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n, 2), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(nlive, block_list, pack, world.fused_ops)
    return out


def _bounce_defer(world, margin, pack, u, parity, ray_tile, debug=False):
    """One deferred-shading bounce: trace kernel -> XLA attr gather +
    wavefront shade -> repacked state.  Same uniform-column consumption as
    the fused kernels, so images agree with the other engines."""
    tg = _bounce_trace_call(world, margin, pack, ray_tile, debug=debug)
    return _defer_shade_apply(world, pack, tg, u, parity)


def _defer_shade_apply(world, pack, tg, u, parity):
    """XLA half of the deferred bounce: gather the winning column's attr
    rows and advance the wavefront state (also the binned DIFF forward's
    state-advance, diff/fast.py)."""
    from ..ops.intersect import HitRecord
    from ..render.shade import RayState, shade

    t = tg[:, 0]
    g1 = tg[:, 1].astype(jnp.int32)
    hit = g1 > 0
    idx = jnp.maximum(g1 - 1, 0)
    a = world.attr_rows.T[idx]  # (N, 16) row gather of the winning column
    rec = HitRecord(
        t=jnp.where(hit, t, F_MAX),
        normal=jnp.where(hit[:, None], a[:, 0:3], 0.0),
        mat_type=jnp.where(hit, a[:, 3].astype(jnp.int32), 0),
        mat_color=jnp.where(hit[:, None], a[:, 4:7], 0.0),
        geom_normal=jnp.where(hit[:, None], a[:, 7:10], 0.0),
        mat_ri=jnp.where(hit, a[:, 11], 1.5),
    )
    state = RayState(
        orig=pack[:, 0:3],
        dir=pack[:, 3:6],
        color=pack[:, 6:9],
        remaining=pack[:, 9].astype(jnp.int32),
    )
    state = shade(state, rec, u, parity=parity)
    return jnp.concatenate(
        [state.orig, state.dir, state.color,
         state.remaining.astype(jnp.float32)[:, None]],
        axis=1,
    )


# Wavefront sort key granularity (A/B via PTAP_SORT_KEY):
#   "oct21"   — 3-bit direction octant (major) + 21-bit origin Morton.
#   "dir6"    — 6-bit direction quantization (4 levels/axis of the
#               normalized direction) + 21-bit origin Morton: finer
#               direction cones per tile, at the cost of more origin
#               scatter within each cone.
#   "nearest" — r5 queue-lite: the ray's NEAREST candidate sub-block id
#               (argmin entry distance over its per-ray slab tests) as
#               the major bits, then octant, then origin Morton.  Rays
#               sharing a tile then share their first candidate block by
#               construction, so the tile-union worklists collapse toward
#               the per-ray slab floor — the grouping half of VERDICT
#               r4's per-block ray queues WITHOUT the pair expansion,
#               whose XLA glue measured 130 ms/bounce vs the binned
#               engine's ~18 (scripts/prof_r5_queue_glue.py; see
#               PERF_NOTES r5 "ray-queue dead end").  Needs the per-ray
#               slab pass: one extra (N, nsb) test per re-sort, measured
#               2.6 ms at 512k rays x 32 sub-blocks.
SORT_KEY = _os.environ.get("PTAP_SORT_KEY", "oct21")

# "nearest" needs per-ray slab tests, affordable only below this many
# sub-blocks (the same exact-branch bound as trace.FRUSTUM_LIST_THRESHOLD).
NEAREST_KEY_MAX_SUBS = 48


def scene_morton_bounds(block_aabb):
    """(lo, hi) world bounds for the wavefront sort's Morton
    quantization, ignoring NaN/inverted padding rows.  Shared by the
    binned engine and the diff path's binned forward (diff/fast.py) so
    the two bounce loops cannot drift apart on the sort key."""
    finite = jnp.abs(block_aabb[:, 0:6]) < F_MAX
    lo = jnp.min(
        jnp.where(finite[:, 0:3], block_aabb[:, 0:3], F_MAX), axis=0
    )
    hi = jnp.max(
        jnp.where(finite[:, 3:6], block_aabb[:, 3:6], -F_MAX), axis=0
    )
    return lo, hi


def _use_nearest_key(world) -> bool:
    return (
        SORT_KEY == "nearest"
        and world is not None
        and world.sub_aabb is not None
        and world.sub_aabb.shape[0] <= NEAREST_KEY_MAX_SUBS
    )


def _sort_keys(pack, lo, hi, world=None, margin=None):
    """(N,) i32 sort key: direction bits (major), 21-bit origin Morton
    (minor); dead rays sink to the end.

    Direction-major, not origin-major: measured per-live-tile
    slab-reachable blocks on the reference scene's secondary bounces are
    ~5.5/8 under octant-major vs ~7.7/8 under origin-major
    (scripts/prof_r3_visits.py) — a tile's block-union frustum is
    dominated by direction spread, not origin spread.

    With ``SORT_KEY == "nearest"`` (and ``world``/``margin`` provided),
    the ray's nearest candidate sub-block id leads the key — see the
    SORT_KEY note above."""
    from ..ops.plucker import _morton3

    orig = pack[:, 0:3]
    d = pack[:, 3:6]
    alive = pack[:, 9] > 0.0
    morton = _morton3(orig, lo, hi) >> 9  # 21 bits
    if SORT_KEY == "dir6":
        dn = d * jax.lax.rsqrt(
            jnp.maximum(jnp.sum(d * d, axis=1, keepdims=True), 1e-30)
        )
        q = jnp.clip(((dn + 1.0) * 2.0).astype(jnp.int32), 0, 3)  # (N, 3)
        dirk = (q[:, 0] << 4) | (q[:, 1] << 2) | q[:, 2]  # 6 bits
    else:
        dirk = (
            (d[:, 0] < 0).astype(jnp.int32) * 4
            + (d[:, 1] < 0).astype(jnp.int32) * 2
            + (d[:, 2] < 0).astype(jnp.int32)
        )
    key = (dirk << 21) | morton
    if _use_nearest_key(world):
        sub_aabb = world.sub_aabb
        d_n = d * jax.lax.rsqrt(
            jnp.maximum(jnp.sum(d * d, axis=1, keepdims=True), 1e-30)
        )
        small = jnp.abs(d_n) < 1e-12
        inv_d = 1.0 / jnp.where(
            small, jnp.where(d_n < 0.0, -1e-12, 1e-12), d_n
        )
        blo = (sub_aabb[None, :, 0:3] - orig[:, None, :]) * inv_d[:, None, :]
        bhi = (sub_aabb[None, :, 3:6] - orig[:, None, :]) * inv_d[:, None, :]
        tmin = jnp.max(jnp.minimum(blo, bhi), axis=-1)  # (N, nsb)
        tmax = jnp.min(jnp.maximum(blo, bhi), axis=-1)
        hit = (tmax >= -margin) & (tmin <= tmax + margin)
        tsel = jnp.where(hit, tmin, jnp.inf)
        first = jnp.argmin(tsel, axis=1).astype(jnp.int32)
        # no-candidate rays (guaranteed miss) group together at the top
        # of the live range — their tiles' worklists are empty
        first = jnp.where(jnp.any(hit, axis=1), first, NEAREST_KEY_MAX_SUBS)
        key = (first << 24) | key
    return jnp.where(alive, key, jnp.int32(1 << 30))


def render_samples_binned(
    world: WorldTriangles,
    ro: jax.Array,
    rd: jax.Array,
    key: jax.Array,
    n_samples: int,
    max_bounces: int,
    sample_offset=0,
    parity: bool = True,
    tile_base=0,
    ray_tile: int | None = None,
    debug=None,
) -> jax.Array:
    """Accumulate ``n_samples`` with per-bounce ray binning; returns (N, 3).

    Parity camera only (primary-hit cache required); the facade falls back
    to the unbinned megakernel for the jittered quality camera.
    """
    from .trace import _slab_margin, trace_pallas
    from ..render.shade import RayState, shade
    from ..utils.debug import resolve_debug

    debug = resolve_debug(debug)
    if ray_tile is None:
        ray_tile = _binned_ray_tile(world)
    n = ro.shape[0]
    rd_n = normalize(rd)
    pad = (-n) % ray_tile
    if pad:
        ro_p = jnp.pad(ro, ((0, pad), (0, 0)))
        rd_p = jnp.pad(rd_n, ((0, pad), (0, 0)), constant_values=1.0)
    else:
        ro_p, rd_p = ro, rd_n
    n_pad = ro_p.shape[0]
    margin = _slab_margin(world.block_aabb)
    hits0 = trace_pallas(world, ro_p, rd_p)

    lo, hi = scene_morton_bounds(world.block_aabb)

    def bounce_sweep(pack, pix, u_flat):
        """The shared per-bounce loop: sort -> worklist bounce kernel ->
        state advance, for a (possibly multi-sample) wavefront whose
        per-ray uniform rows are ``u_flat`` indexed by original id."""
        for b in range(1, max_bounces):
            # Re-sort the wavefront every RESORT_EVERY bounces (default 1:
            # the corrected sort microbenchmark — see the RESORT_EVERY
            # definition — puts argsort + row gather at ~9.5 ms/bounce at
            # 800k rays, cheap enough that per-bounce sorting keeps both
            # visit coherence and the prunable dead-ray tail).
            if (b - 1) % RESORT_EVERY == 0:
                perm = jnp.argsort(
                    _sort_keys(pack, lo, hi, world=world, margin=margin),
                    stable=True,
                )
                pack = pack[perm]
                pix = pix[perm]
            u_b = u_flat[:, 4 * b : 4 * b + 4][pix]
            nb_w = world.block_aabb.shape[0]
            if (
                DEFER_SHADE
                and SUBBLOCKS
                and world.sub_aabb is not None
                and nb_w <= SUB_MAX_BLOCKS
                and nb_w <= STREAM_BLOCKS
                and world.tri_block > SUB_BLOCK
            ):
                pack = _bounce_defer(world, margin, pack, u_b, parity,
                                     ray_tile, debug=debug)
            else:
                pack = _bounce_call(world, margin, pack, u_b, parity,
                                    ray_tile, debug=debug)
        contrib = jnp.sqrt(jnp.maximum(pack[:, 6:9], 0.0))
        # un-permute by inverse-permutation GATHER: the row scatter
        # (.at[pix].set) measured 35 ms/sample on v5e vs ~11 for
        # argsort + gather (prof_r4_binned2 `scatter` row)
        return contrib[jnp.argsort(pix)]

    def pack_of(state):
        # 10 columns [orig, dir, color, remaining] — no padding tail:
        # the per-bounce argsort row gather pays per real column (r5)
        return jnp.concatenate(
            [state.orig, state.dir, state.color,
             state.remaining.astype(jnp.float32)[:, None]],
            axis=1,
        )

    def group_contrib(offs):
        """One group of samples, traced as ONE combined sorted wavefront
        (r5): the per-bounce argsort packs each 512-ray tile from an
        S-times denser sampling of the same key space, so tile worklist
        unions tighten toward the per-ray slab floor (the candidate-set
        lever of VERDICT r4 item 1 with no new data movement), the
        per-bounce XLA glue amortizes over S samples, and the dead-ray
        tail is shared.  Images are bit-equal to the unbatched loop:
        every ray keeps its own (sample, pixel) uniform stream via
        ``pix`` indexing into the batched rows.  Returns the (n_pad, 3)
        sum over the group."""
        ns = offs.shape[0]
        u_all = jax.vmap(
            lambda s: chunk_uniforms(key, s, max_bounces, n, n_pad,
                                     tile_base)
        )(offs)  # (ns, n_pad, 4*max_bounces)
        big = lambda x: jnp.broadcast_to(
            x[None], (ns,) + x.shape
        ).reshape((ns * x.shape[0],) + x.shape[1:])
        state = RayState.primary(big(ro_p), big(rd_p), max_bounces)
        hits_b = jax.tree.map(big, hits0)
        u_flat = u_all.reshape(ns * n_pad, 4 * max_bounces)
        state = shade(state, hits_b, u_flat[:, 0:4], parity=parity)
        pix = jnp.arange(ns * n_pad, dtype=jnp.int32)
        contrib = bounce_sweep(pack_of(state), pix, u_flat)
        return jnp.sum(contrib.reshape(ns, n_pad, 3), axis=0)

    def body(i, acc):
        s = sample_offset + i
        u_all = chunk_uniforms(key, s, max_bounces, n, n_pad, tile_base)
        state = RayState.primary(ro_p, rd_p, max_bounces)
        state = shade(state, hits0, u_all[:, 0:4], parity=parity)
        pix = jnp.arange(n_pad, dtype=jnp.int32)
        return acc + bounce_sweep(pack_of(state), pix, u_all)

    acc = jnp.zeros((n_pad, 3), jnp.float32)
    sb = BINNED_SAMPLE_BATCH
    n_groups, rem = (n_samples // sb, n_samples % sb) if sb > 1 else (0, n_samples)
    if n_groups:
        # lax.scan over full groups: ONE traced copy of the batched
        # pipeline regardless of spp (compile time through the remote
        # tunnel is per-instance)
        def g_body(acc_c, g):
            offs = sample_offset + g * sb + jnp.arange(sb)
            return acc_c + group_contrib(offs), None
        acc, _ = jax.lax.scan(g_body, acc, jnp.arange(n_groups))
    if rem:
        acc = jax.lax.fori_loop(
            n_samples - rem, n_samples, body, acc
        )
    return acc[:n]
