"""r4: find the binned engine's unaccounted ~290 ms/sample.

Stage sums (corrected, scalarized): kernel 23 + sort 7.8 + lists 1.7 per
bounce -> ~130 ms/sample expected; measured 412.  This script rebuilds the
sample body piecewise (all scalarized outputs, fori-looped reps):

  uniforms   - chunk_uniforms alone
  b0_shade   - bounce-0 XLA shade (hits0 precomputed) + pack build
  scatter    - final sqrt + .at[pix].set scatter-add
  bounces    - the 4 sorted bounce iterations alone (sort+ugather+kernel)
  full_body  - everything (should reproduce ~412)
"""
import sys

sys.path.insert(0, "/root/repo")

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

print = functools.partial(print, flush=True)

from pathtracerap_tpu.ops.math import normalize
from pathtracerap_tpu.ops.plucker import bake_world_triangles
from pathtracerap_tpu.pallas import megakernel as MK
from pathtracerap_tpu.pallas.trace import _slab_margin, trace_pallas
from pathtracerap_tpu.render.camera import generate_rays
from pathtracerap_tpu.render.shade import RayState, shade
from pathtracerap_tpu.scene.build import build_reference_scene
from pathtracerap_tpu.utils.profiling import enable_compile_cache
from pathtracerap_tpu.config import RenderConfig

enable_compile_cache()

scene = build_reference_scene().to_device()
world = jax.jit(bake_world_triangles)(scene)
ro, rd = generate_rays(RenderConfig().camera, (1000, 800))
n = ro.shape[0]
key = jax.random.PRNGKey(0)

rd_n = normalize(rd)
pad = (-n) % 512
ro_p = jnp.pad(ro, ((0, pad), (0, 0)))
rd_p = jnp.pad(rd_n, ((0, pad), (0, 0)), constant_values=1.0)
n_pad = ro_p.shape[0]
margin = _slab_margin(world.block_aabb)
hits0 = jax.jit(lambda: trace_pallas(world, ro_p, rd_p))()

bb = world.block_aabb
finite = jnp.abs(bb[:, 0:6]) < MK.F_MAX
lo = jnp.min(jnp.where(finite[:, 0:3], bb[:, 0:3], MK.F_MAX), axis=0)
hi = jnp.max(jnp.where(finite[:, 3:6], bb[:, 3:6], -MK.F_MAX), axis=0)

REP = 8


def timeit(name, per_sample):
    def loop():
        def f(i, acc):
            return acc + per_sample(i)
        return jax.lax.fori_loop(0, REP, f, jnp.float32(0.0))

    g = jax.jit(loop)
    np.asarray(g())
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(g())
        ts.append(time.perf_counter() - t0)
    print(f"{name:10s}: {min(ts)/REP*1e3:7.1f} ms/sample")


def uniforms(s):
    u = MK.chunk_uniforms(key, s, 5, n, n_pad)
    return jnp.sum(u[:, 0])


def b0_shade(s):
    u_all = MK.chunk_uniforms(key, s, 5, n, n_pad)
    state = RayState.primary(ro_p, rd_p, 5)
    state = shade(state, hits0, u_all[:, 0:4], parity=True)
    pack = jnp.concatenate(
        [state.orig, state.dir, state.color,
         state.remaining.astype(jnp.float32)[:, None],
         jnp.zeros((n_pad, 6), jnp.float32)], axis=1)
    return jnp.sum(pack[:, 0])


def scatter(s):
    pix = jnp.arange(n_pad, dtype=jnp.int32)[::-1]
    contrib = jnp.full((n_pad, 3), 0.5, jnp.float32) * (1.0 + s)
    out = jnp.zeros((n_pad, 3), jnp.float32).at[pix].set(
        jnp.sqrt(jnp.maximum(contrib, 0.0)))
    return jnp.sum(out[:, 0])


def bounces(s):
    u_all = MK.chunk_uniforms(key, s, 5, n, n_pad)
    state = RayState.primary(ro_p, rd_p, 5)
    state = shade(state, hits0, u_all[:, 0:4], parity=True)
    pack = jnp.concatenate(
        [state.orig, state.dir, state.color,
         state.remaining.astype(jnp.float32)[:, None],
         jnp.zeros((n_pad, 6), jnp.float32)], axis=1)
    pix = jnp.arange(n_pad, dtype=jnp.int32)
    for b in range(1, 5):
        perm = jnp.argsort(MK._sort_keys(pack, lo, hi), stable=True)
        pack = pack[perm]
        pix = pix[perm]
        u_b = u_all[:, 4 * b: 4 * b + 4][pix]
        pack = MK._bounce_call(world, margin, pack, u_b, True, 512)
    return jnp.sum(pack[:, 6])


def full_body(s):
    u_all = MK.chunk_uniforms(key, s, 5, n, n_pad)
    state = RayState.primary(ro_p, rd_p, 5)
    state = shade(state, hits0, u_all[:, 0:4], parity=True)
    pack = jnp.concatenate(
        [state.orig, state.dir, state.color,
         state.remaining.astype(jnp.float32)[:, None],
         jnp.zeros((n_pad, 6), jnp.float32)], axis=1)
    pix = jnp.arange(n_pad, dtype=jnp.int32)
    for b in range(1, 5):
        perm = jnp.argsort(MK._sort_keys(pack, lo, hi), stable=True)
        pack = pack[perm]
        pix = pix[perm]
        u_b = u_all[:, 4 * b: 4 * b + 4][pix]
        pack = MK._bounce_call(world, margin, pack, u_b, True, 512)
    contrib = jnp.sqrt(jnp.maximum(pack[:, 6:9], 0.0))
    out = jnp.zeros((n_pad, 3), jnp.float32).at[pix].set(contrib)
    return jnp.sum(out[:, 0])


for name, fn in [("uniforms", uniforms), ("b0_shade", b0_shade),
                 ("scatter", scatter), ("bounces", bounces),
                 ("full_body", full_body)]:
    timeit(name, fn)


def bounces_noker(s):
    """bounces with the pallas kernel replaced by identity — isolates the
    per-bounce glue (sort + gathers + lists) from the kernel itself."""
    u_all = MK.chunk_uniforms(key, s, 5, n, n_pad)
    state = RayState.primary(ro_p, rd_p, 5)
    state = shade(state, hits0, u_all[:, 0:4], parity=True)
    pack = jnp.concatenate(
        [state.orig, state.dir, state.color,
         state.remaining.astype(jnp.float32)[:, None],
         jnp.zeros((n_pad, 6), jnp.float32)], axis=1)
    pix = jnp.arange(n_pad, dtype=jnp.int32)
    from pathtracerap_tpu.pallas.trace import _tile_block_lists
    for b in range(1, 5):
        perm = jnp.argsort(MK._sort_keys(pack, lo, hi), stable=True)
        pack = pack[perm]
        pix = pix[perm]
        u_b = u_all[:, 4 * b: 4 * b + 4][pix]
        d_n = pack[:, 3:6] * jax.lax.rsqrt(
            jnp.maximum(jnp.sum(pack[:, 3:6] ** 2, axis=1, keepdims=True),
                        1e-30))
        alive_f = (pack[:, 9:10] > 0.0).astype(jnp.float32)
        bl = _tile_block_lists(world.block_aabb, pack[:, 0:3], d_n, alive_f,
                               512, margin)
        # fold everything into the carry so nothing is DCE'd
        pack = pack + 1e-12 * (jnp.sum(u_b) + jnp.sum(bl))
        pack = pack.at[:, 9].add(-1.0)
    return jnp.sum(pack[:, 6])


timeit("bounces_noker", bounces_noker)
