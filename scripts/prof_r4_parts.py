"""r4: where does the whole-sample megakernel's time actually go?

The r3 cost model (docs/PERF_NOTES.md) attributes ~340 of ~400 ms/sample to
trace visits; the accept-chain trim that should have saved ~8% measured 0%.
This script isolates the megakernel's stages by ablation on the real chip —
each variant is the REAL kernel with one stage stubbed:

  full        - unmodified render_samples_fused (baseline)
  noshade     - _shade_inkernel replaced by a 6-op trivial update
  notrace     - _trace_inkernel replaced by constant hit values
  noselect    - trace keeps matmul+accept+min but skips argmin+attr select

Run: python scripts/prof_r4_parts.py [variant ...]
"""
import sys

sys.path.insert(0, "/root/repo")

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

print = functools.partial(print, flush=True)

from pathtracerap_tpu.config import RenderConfig
from pathtracerap_tpu.ops.plucker import bake_world_triangles
from pathtracerap_tpu.pallas import megakernel as MK
from pathtracerap_tpu.render.camera import generate_rays
from pathtracerap_tpu.scene.build import build_reference_scene
from pathtracerap_tpu.utils.profiling import enable_compile_cache

enable_compile_cache()

scene = build_reference_scene().to_device()
world = jax.jit(bake_world_triangles)(scene)
cfg = RenderConfig(resolution=(1000, 800), samples_per_pixel=1, max_bounces=5)
ro, rd = generate_rays(cfg.camera, cfg.resolution)
n = ro.shape[0]
key = jax.random.PRNGKey(0)
SPP = 8

_orig_shade = MK._shade_inkernel
_orig_trace = MK._trace_inkernel


def shade_stub(orig, dirn, color, remaining, t, n_, mt, mc, gn, u, parity,
               ri=None):
    d = MK._norm3(dirn)
    hit = t < MK.F_MAX
    orig = jnp.where(hit, orig + d * t + 0.1 * n_, orig)
    dirn = jnp.where(hit, dirn - 2.0 * MK._dot3(d, n_) * n_, dirn)
    color = color * jnp.where(hit, mc, 1.0)
    remaining = jnp.where(remaining > 0.0, remaining - 1.0, remaining)
    return orig, dirn, color, remaining


def trace_stub(orig, dirn, remaining, aabb_ref, margin, ops_ref, attr_ref,
               tri_block, n_blocks, debug=False, worklist=None, **kw):
    r = orig.shape[0]
    t = jnp.full((r, 1), 100.0, jnp.float32)
    n_ = jnp.concatenate(
        [jnp.zeros((r, 2), jnp.float32), jnp.ones((r, 1), jnp.float32)], axis=1)
    mt = jnp.zeros((r, 1), jnp.float32)
    mc = jnp.full((r, 3), 0.9, jnp.float32)
    # r5: the non-raw contract grew a trailing ri column
    return (t, n_, mt, mc, n_, jnp.ones((r, 1), jnp.float32),
            jnp.full((r, 1), 1.5, jnp.float32))


def trace_noselect(orig, dirn, remaining, aabb_ref, margin, ops_ref, attr_ref,
                   tri_block, n_blocks, debug=False, worklist=None, **kw):
    """matmul + accept + min, but no argmin / attr-select matmul."""
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    r = orig.shape[0]
    d_n = MK._norm3(dirn)
    m = MK._cross3(orig, d_n)
    alive_f = (remaining > 0.0).astype(jnp.float32)
    w16 = jnp.concatenate(
        [d_n, m, orig, jnp.full((r, 1), -1.0, jnp.float32), alive_f,
         jnp.zeros((r, 5), jnp.float32)], axis=1)

    def visit_block(blk, best_t):
        cols = pl.ds(pl.multiple_of(blk * (4 * tri_block), 4 * tri_block),
                     4 * tri_block)
        s = MK._mm(w16, ops_ref[:, cols])
        s_ab = s[:, 0:tri_block]
        s_bc = s[:, tri_block:2 * tri_block]
        s_ca = s[:, 2 * tri_block:3 * tri_block]
        num2 = s[:, 3 * tri_block:]
        det = s_ab + s_bc + s_ca
        inv_det = 1.0 / det
        t = num2 * inv_det
        u = s_ca * inv_det
        v = s_ab * inv_det
        m_lo = jnp.minimum(jnp.minimum(u, v), t)
        m_hi = jnp.maximum(u, u + v)
        accept = (m_lo >= -MK.EPS) & (m_hi <= 1.0 + MK.EPS)
        t_m = jnp.where(accept, t, MK.F_MAX)
        return jnp.minimum(best_t, jnp.min(t_m, axis=1, keepdims=True))

    best_t = jax.lax.fori_loop(
        0, n_blocks, visit_block, jnp.full((r, 1), MK.F_MAX, jnp.float32),
        unroll=n_blocks <= 8)
    n_ = jnp.concatenate(
        [jnp.zeros((r, 2), jnp.float32), jnp.ones((r, 1), jnp.float32)], axis=1)
    mc = jnp.full((r, 3), 0.9, jnp.float32)
    return (best_t, n_, jnp.zeros((r, 1), jnp.float32), mc, n_,
            jnp.ones((r, 1), jnp.float32),
            jnp.full((r, 1), 1.5, jnp.float32))


def measure(tag):
    f = jax.jit(lambda: MK.render_samples_fused(
        world, ro, rd, key, n_samples=SPP, max_bounces=5))
    np.asarray(f())
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(f())
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    print(f"{tag:10s}: {dt/SPP*1e3:7.1f} ms/sample  "
          f"({n*5*SPP/dt/1e6:5.2f} Mrays/s counted)")
    return dt / SPP


variants = sys.argv[1:] or ["full", "noshade", "notrace", "noselect"]
for v in variants:
    MK._shade_inkernel = _orig_shade
    MK._trace_inkernel = _orig_trace
    if v == "noshade":
        MK._shade_inkernel = shade_stub
    elif v == "notrace":
        MK._trace_inkernel = trace_stub
    elif v == "noselect":
        MK._trace_inkernel = trace_noselect
    measure(v)
MK._shade_inkernel = _orig_shade
MK._trace_inkernel = _orig_trace
