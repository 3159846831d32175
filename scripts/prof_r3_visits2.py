"""Round-3 diagnosis part 2: the culling FLOOR.

Per-RAY reachable/pruned block counts (the best any tile granularity can
do), tile-size sweep under octant-major sort, and sort-cost variants.
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
from pathtracerap_tpu.ops.plucker import bake_world_triangles, _morton3
from pathtracerap_tpu.ops.rng import tile_uniforms
from pathtracerap_tpu.pallas.trace import _slab_margin, trace_pallas
from pathtracerap_tpu.render.camera import generate_rays
from pathtracerap_tpu.render.shade import RayState, shade
from pathtracerap_tpu.scene.build import build_reference_scene
from pathtracerap_tpu.config import RenderConfig
from pathtracerap_tpu.utils.profiling import enable_compile_cache

enable_compile_cache()
F_MAX = 3.402823e38

scene = build_reference_scene().to_device()
world = jax.jit(bake_world_triangles)(scene)
cfg = RenderConfig(resolution=(1000, 800), samples_per_pixel=1, max_bounces=5)
ro, rd = generate_rays(cfg.camera, cfg.resolution)
n = ro.shape[0]
key = jax.random.PRNGKey(0)

a = world.v0
b = world.v0 + world.e1
c = world.v0 + world.e2
valid = world.valid > 0
tri_min = jnp.where(valid[:, None], jnp.minimum(jnp.minimum(a, b), c), F_MAX)
tri_max = jnp.where(valid[:, None], jnp.maximum(jnp.maximum(a, b), c), -F_MAX)

bb = world.block_aabb
finite = jnp.abs(bb[:, 0:6]) < F_MAX
lo_s = jnp.min(jnp.where(finite[:, 0:3], bb[:, 0:3], F_MAX), axis=0)
hi_s = jnp.max(jnp.where(finite[:, 3:6], bb[:, 3:6], -F_MAX), axis=0)
margin = float(_slab_margin(world.block_aabb))


def block_aabbs(tb):
    bm = tri_min.reshape(-1, tb, 3).min(axis=1)
    bM = tri_max.reshape(-1, tb, 3).max(axis=1)
    return bm, bM


@functools.partial(jax.jit, static_argnames=("tb", "rtile"))
def stats(o, d_n, alive, hit_t, tb, rtile):
    bm, bM = block_aabbs(tb)
    small = jnp.abs(d_n) < 1e-12
    inv_d = 1.0 / jnp.where(small, jnp.where(d_n < 0.0, -1e-12, 1e-12), d_n)
    lo = (bm[None] - o[:, None]) * inv_d[:, None]
    hi = (bM[None] - o[:, None]) * inv_d[:, None]
    tmin = jnp.max(jnp.minimum(lo, hi), axis=-1)
    tmax = jnp.min(jnp.maximum(lo, hi), axis=-1)
    reach = (tmax >= -margin) & (tmin <= tmax + margin) & alive[:, None]
    prune = reach & (tmin - margin <= hit_t[:, None])
    # per-ray floor (live rays only)
    nlive = jnp.maximum(alive.sum(), 1)
    ray_reach = reach.sum(axis=1).sum() / nlive
    ray_prune = prune.sum(axis=1).sum() / nlive
    # per-tile union at rtile granularity
    nt = o.shape[0] // rtile
    p_tile = prune.reshape(nt, rtile, -1).any(axis=1).sum(axis=1)
    dead = (~alive.reshape(nt, rtile)).all(axis=1)
    live_tiles = jnp.maximum((~dead).sum(), 1)
    tile_prune = jnp.where(dead, 0, p_tile).sum() / live_tiles
    return ray_reach, ray_prune, tile_prune, dead.mean()


def octant_perm(o, d, alive):
    morton = _morton3(o, lo_s, hi_s) >> 9
    octant = ((d[:, 0] < 0).astype(jnp.int32) * 4
              + (d[:, 1] < 0).astype(jnp.int32) * 2
              + (d[:, 2] < 0).astype(jnp.int32))
    k = (octant << 21) | morton
    k = jnp.where(alive, k, jnp.int32(1 << 30))
    return jnp.argsort(k, stable=True)


state = RayState.primary(ro, normalize(rd), cfg.max_bounces)
pad = (-n) % 512

for bounce in range(cfg.max_bounces):
    alive = state.remaining > 0
    hits = trace_pallas(world, state.orig, state.dir, alive=alive)
    o = jnp.pad(state.orig, ((0, pad), (0, 0)))
    d_n = jnp.pad(normalize(state.dir), ((0, pad), (0, 0)), constant_values=1.0)
    al = jnp.pad(alive, (0, pad))
    ht = jnp.pad(hits.t, (0, pad), constant_values=-F_MAX)
    perm = octant_perm(o, d_n, al)
    os_, ds_, as_, ts_ = o[perm], d_n[perm], al[perm], ht[perm]
    lines = [f"bounce {bounce} live={float(alive.mean()):.3f}"]
    for tb in (128, 256, 512):
        rr, rp, _, _ = stats(os_, ds_, as_, ts_, tb, 512)
        sub = [f"TB{tb}: ray reach={float(rr):5.2f} pruned={float(rp):5.2f} "
               f"(tris={float(rp)*tb:6.0f})"]
        for rtile in (64, 128, 256, 512):
            _, _, tp, dead = stats(os_, ds_, as_, ts_, tb, rtile)
            sub.append(f"R{rtile}:{float(tp):5.1f}")
        lines.append(" | ".join(sub))
    print("\n   ".join(lines))
    u = tile_uniforms(key, 0, cfg.max_bounces - bounce, 0, n)
    state = shade(state, hits, u, parity=True)

# ---- sort variants cost
o = jnp.pad(state.orig, ((0, pad), (0, 0)))
d8 = jnp.pad(state.dir, ((0, pad), (0, 0)), constant_values=1.0)
morton = _morton3(o, lo_s, hi_s)
octant = ((d8[:, 0] < 0).astype(jnp.int32) * 4
          + (d8[:, 1] < 0).astype(jnp.int32) * 2
          + (d8[:, 2] < 0).astype(jnp.int32))
key32 = (octant << 21) | (morton >> 9)
pack = jnp.concatenate([o, d8, o, d8, o, d8[:, :1]], axis=1)[:, :16]
u4 = jnp.zeros((o.shape[0], 4), jnp.float32)
N = o.shape[0]


def timeit(fn, *args, rep=5):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])[:1]
    ts = []
    for _ in range(rep):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])[:1]
        ts.append(time.perf_counter() - t0)
    return min(ts)


t1 = timeit(jax.jit(lambda k, p, u: (lambda pm: (p[pm], u[pm]))(
    jnp.argsort(k, stable=True))), key32, pack, u4)
print(f"argsort stable + gather:   {t1*1e3:6.1f} ms")
t2 = timeit(jax.jit(lambda k, p, u: (lambda pm: (p[pm], u[pm]))(
    jnp.argsort(k, stable=False))), key32, pack, u4)
print(f"argsort unstable + gather: {t2*1e3:6.1f} ms")
t3 = timeit(jax.jit(lambda k, p, u: (lambda pm: (p[pm], u[pm]))(
    jnp.argsort(jnp.where(k >= 0, octant, 8), stable=False))), key32, pack, u4)
print(f"argsort 3-bit key + gather:{t3*1e3:6.1f} ms")


@jax.jit
def grouped_sort(k, p, u):
    # independent argsort within 65536-ray groups
    g = 65536
    kg = k.reshape(-1, g)
    pm = jnp.argsort(kg, axis=1, stable=False)
    off = (jnp.arange(kg.shape[0]) * g)[:, None]
    pm = (pm + off).reshape(-1)
    return p[pm], u[pm]


if N % 65536 == 0:
    t4 = timeit(grouped_sort, key32, pack, u4)
    print(f"grouped-64k argsort + gather: {t4*1e3:6.1f} ms")
else:
    print(f"N={N} not divisible by 65536; grouped sort skipped")


@jax.jit
def sort_kv(k, p, u):
    # single lax.sort with payload columns as co-sorted operands
    ops = (k,) + tuple(p[:, i] for i in range(16)) + tuple(u[:, i] for i in range(4))
    out = jax.lax.sort(ops, num_keys=1, is_stable=False)
    return jnp.stack(out[1:17], axis=1), jnp.stack(out[17:], axis=1)


t5 = timeit(sort_kv, key32, pack, u4)
print(f"lax.sort key+20 payload:   {t5*1e3:6.1f} ms")
