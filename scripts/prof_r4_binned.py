"""r4: per-stage breakdown of the binned per-bounce engine on the real chip.

The binned engine's visit counts are ~3.5/8 blocks per tile (vs the
condless megakernel's 6) but r3 measured it SLOWER overall (8.4 vs 10.0) —
the savings were repaid as per-bounce glue.  This script measures, at the
reference workload and amortizing spp:

  binned_full   - render_samples_binned as-is
  sort_only     - the per-bounce argsort + 2 gathers, isolated
  lists_only    - the per-bounce _tile_block_lists build, isolated
  kernel_only   - the bounce kernel on a pre-sorted wavefront, fixed lists
  visit_stats   - mean worklist length per bounce (host-side)
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
from pathtracerap_tpu.ops.math import normalize
from pathtracerap_tpu.ops.plucker import bake_world_triangles
from pathtracerap_tpu.pallas import megakernel as MK
from pathtracerap_tpu.pallas.trace import _slab_margin, _tile_block_lists, trace_pallas
from pathtracerap_tpu.render.camera import generate_rays
from pathtracerap_tpu.render.shade import RayState, shade
from pathtracerap_tpu.scene.build import build_reference_scene
from pathtracerap_tpu.utils.profiling import enable_compile_cache

enable_compile_cache()

scene = build_reference_scene().to_device()
world = jax.jit(bake_world_triangles)(scene)
cfg = RenderConfig(resolution=(1000, 800), samples_per_pixel=1, max_bounces=5)
ro, rd = generate_rays(cfg.camera, cfg.resolution)
n = ro.shape[0]
key = jax.random.PRNGKey(0)
SPP = 24


def timeit(f, reps=3):
    np.asarray(jax.tree_util.tree_leaves(f())[0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(jax.tree_util.tree_leaves(f())[0])
        ts.append(time.perf_counter() - t0)
    return min(ts)


def scalarize(fn):
    """Reduce a pack-returning loop to ONE scalar before the host fetch —
    fetching the (N, 16) pack through the axon tunnel costs ~1.5 s/call
    and silently dominated the first-cut r4 numbers."""
    def wrapped():
        out = fn()
        leaves = jax.tree_util.tree_leaves(out)
        return sum(jnp.sum(l[..., 0]) if l.ndim else l for l in leaves)
    return wrapped


# ---- full binned engine
f_full = jax.jit(lambda: MK.render_samples_binned(
    world, ro, rd, key, n_samples=SPP, max_bounces=5))
dt = timeit(f_full)
print(f"binned_full {SPP}spp/5b: {dt*1e3:.0f} ms -> "
      f"{n*5*SPP/dt/1e6:.2f} Mrays/s  ({dt/SPP*1e3:.1f} ms/sample)")

# ---- build one representative post-bounce-0 wavefront pack
rd_n = normalize(rd)
pad = (-n) % 512
ro_p = jnp.pad(ro, ((0, pad), (0, 0)))
rd_p = jnp.pad(rd_n, ((0, pad), (0, 0)), constant_values=1.0)
n_pad = ro_p.shape[0]
margin = _slab_margin(world.block_aabb)
hits0 = jax.jit(lambda: trace_pallas(world, ro_p, rd_p))()
u_all = jax.jit(lambda: MK.chunk_uniforms(key, 0, 5, n, n_pad))()
state = RayState.primary(ro_p, rd_p, 5)
state = jax.jit(lambda s, h, u: shade(s, h, u[:, 0:4], parity=True))(
    state, hits0, u_all)
pack0 = jnp.concatenate(
    [state.orig, state.dir, state.color,
     state.remaining.astype(jnp.float32)[:, None],
     jnp.zeros((n_pad, 6), jnp.float32)], axis=1)
pack0 = jax.device_put(pack0)

bb = world.block_aabb
finite = jnp.abs(bb[:, 0:6]) < MK.F_MAX
lo = jnp.min(jnp.where(finite[:, 0:3], bb[:, 0:3], MK.F_MAX), axis=0)
hi = jnp.max(jnp.where(finite[:, 3:6], bb[:, 3:6], -MK.F_MAX), axis=0)

REP = 20  # in-program repeats to dodge the ~0.4 s dispatch floor


def sort_loop():
    def body(i, pk):
        perm = jnp.argsort(MK._sort_keys(pk, lo, hi), stable=True)
        return pk[perm]
    return jax.lax.fori_loop(0, REP, body, pack0)


def lists_loop():
    def body(i, acc):
        d_n = pack0[:, 3:6] * jax.lax.rsqrt(
            jnp.maximum(jnp.sum(pack0[:, 3:6] ** 2, axis=1, keepdims=True), 1e-30))
        alive_f = (pack0[:, 9:10] > 0.0).astype(jnp.float32)
        bl = _tile_block_lists(world.block_aabb, pack0[:, 0:3], d_n, alive_f,
                               512, margin)
        return acc + jnp.sum(bl)
    return jax.lax.fori_loop(0, REP, body, jnp.int32(0))


def kernel_loop():
    def body(i, pk):
        return MK._bounce_call(world, margin, pk, u_all[:, 4:8], True, 512)
    return jax.lax.fori_loop(0, REP, body, pack0)


for name, fn in [("sort_only", sort_loop), ("lists_only", lists_loop),
                 ("kernel_only", kernel_loop)]:
    dt = timeit(jax.jit(scalarize(fn))) / REP
    print(f"{name:12s}: {dt*1e3:6.2f} ms/bounce")

# ---- visit stats: post-sort worklist lengths per bounce
perm = jnp.argsort(MK._sort_keys(pack0, lo, hi), stable=True)
pk = pack0[perm]
for b in range(1, 5):
    d_n = pk[:, 3:6] * jax.lax.rsqrt(
        jnp.maximum(jnp.sum(pk[:, 3:6] ** 2, axis=1, keepdims=True), 1e-30))
    alive_f = (pk[:, 9:10] > 0.0).astype(jnp.float32)
    bl = np.asarray(_tile_block_lists(world.block_aabb, pk[:, 0:3], d_n,
                                      alive_f, 512, margin))
    lens = (bl >= 0).sum(axis=1)
    print(f"bounce {b}: mean worklist len {lens.mean():.2f} "
          f"(p90 {np.percentile(lens, 90):.0f}), live "
          f"{float((alive_f > 0).mean()):.2f}")
    pk = MK._bounce_call(world, margin, pk, u_all[:, 4*b:4*b+4], True, 512)
    perm = jnp.argsort(MK._sort_keys(pk, lo, hi), stable=True)
    pk = pk[perm]
