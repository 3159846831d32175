"""Round-3 diagnosis: where do the block visits go?

For each bounce's outgoing wavefront (reference scene, 1000x800), measure:
  * per 512-ray-tile slab-REACHABLE triangle-block counts, for block sizes
    TB in {128, 256, 512}, under three ray orders: unsorted, origin-Morton
    sort (the current binned key), octant-major sort;
  * per-tile PRUNED visit counts: blocks whose entry distance can still beat
    the ray's final hit t (the steady state of front-to-back best-t pruning);
  * cost of the binning itself (argsort + gather of the 16-col pack) on TPU.
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
RAY_TILE = 512

# triangle AABBs in baked order
a = world.v0
b = world.v0 + world.e1
c = world.v0 + world.e2
valid = world.valid > 0
tri_min = jnp.where(valid[:, None], jnp.minimum(jnp.minimum(a, b), c), F_MAX)
tri_max = jnp.where(valid[:, None], jnp.maximum(jnp.maximum(a, b), c), -F_MAX)
print("padded tris:", a.shape[0], "valid:", int(valid.sum()))

bb = world.block_aabb
finite = jnp.abs(bb[:, 0:6]) < F_MAX
lo_s = jnp.min(jnp.where(finite[:, 0:3], bb[:, 0:3], F_MAX), axis=0)
hi_s = jnp.max(jnp.where(finite[:, 3:6], bb[:, 3:6], -F_MAX), axis=0)
margin = float(_slab_margin(world.block_aabb))


def block_aabbs(tb):
    bm = tri_min.reshape(-1, tb, 3).min(axis=1)
    bM = tri_max.reshape(-1, tb, 3).max(axis=1)
    return bm, bM


@functools.partial(jax.jit, static_argnames=("tb",))
def tile_stats(o, d_n, alive, hit_t, tb):
    """per-tile (reachable, pruned) block counts for block size tb."""
    bm, bM = block_aabbs(tb)
    small = jnp.abs(d_n) < 1e-12
    inv_d = 1.0 / jnp.where(small, jnp.where(d_n < 0.0, -1e-12, 1e-12), d_n)
    lo = (bm[None] - o[:, None]) * inv_d[:, None]
    hi = (bM[None] - o[:, None]) * inv_d[:, None]
    tmin = jnp.max(jnp.minimum(lo, hi), axis=-1)  # (N, nb)
    tmax = jnp.min(jnp.maximum(lo, hi), axis=-1)
    reach = (tmax >= -margin) & (tmin <= tmax + margin) & alive[:, None]
    prune = reach & (tmin - margin <= hit_t[:, None])
    nt = o.shape[0] // RAY_TILE
    r_tile = reach.reshape(nt, RAY_TILE, -1).any(axis=1).sum(axis=1)
    p_tile = prune.reshape(nt, RAY_TILE, -1).any(axis=1).sum(axis=1)
    dead_tiles = (~alive.reshape(nt, RAY_TILE)).all(axis=1)
    return r_tile, p_tile, dead_tiles


def sort_perm(o, d, alive, mode):
    morton = _morton3(o, lo_s, hi_s) >> 9
    octant = ((d[:, 0] < 0).astype(jnp.int32) * 4
              + (d[:, 1] < 0).astype(jnp.int32) * 2
              + (d[:, 2] < 0).astype(jnp.int32))
    if mode == "none":
        return jnp.arange(o.shape[0])
    if mode == "origin":
        k = (morton << 3) | octant
    else:  # octant-major
        k = (octant << 21) | morton
    k = jnp.where(alive, k, jnp.int32(1 << 30))
    return jnp.argsort(k, stable=True)


# walk the wavefront with the XLA engine (same semantics as the megakernel)
state = RayState.primary(ro, normalize(rd), cfg.max_bounces)
pad = (-n) % RAY_TILE
o = jnp.pad(state.orig, ((0, pad), (0, 0)))
dd = jnp.pad(state.dir, ((0, pad), (0, 0)), constant_values=1.0)

for bounce in range(cfg.max_bounces):
    alive = state.remaining > 0
    hits = trace_pallas(world, state.orig, state.dir, alive=alive)
    o = jnp.pad(state.orig, ((0, pad), (0, 0)))
    d_n = jnp.pad(normalize(state.dir), ((0, pad), (0, 0)), constant_values=1.0)
    al = jnp.pad(alive, (0, pad))
    ht = jnp.pad(hits.t, (0, pad), constant_values=-F_MAX)
    frac = float(alive.mean())
    row = [f"bounce {bounce} live={frac:.3f}"]
    for mode in ("none", "origin", "octant"):
        perm = sort_perm(o, d_n, al, mode)
        os_, ds_, as_, ts_ = o[perm], d_n[perm], al[perm], ht[perm]
        for tb in (128, 256, 512):
            r_t, p_t, dead = jax.jit(tile_stats, static_argnames=("tb",))(
                os_, ds_, as_, ts_, tb)
            r_t, p_t, dead = np.asarray(r_t), np.asarray(p_t), np.asarray(dead)
            livemask = ~dead
            row.append(
                f"{mode}/TB{tb}: reach={r_t[livemask].mean():5.1f} "
                f"pruned={p_t[livemask].mean():5.1f} deadtiles={dead.mean():.2f}"
            )
    print("\n   ".join(row))
    u = tile_uniforms(key, 0, cfg.max_bounces - bounce, 0, n)
    state = shade(state, hits, u, parity=True)

# binning overhead: argsort + gather of a 16-col pack + 4-col uniforms
pack = jnp.concatenate([o, dd, o, dd, o, dd[:, :1]], axis=1)[:, :16]
keys = _morton3(o, lo_s, hi_s)


@jax.jit
def bin_step(pack, keys, u4):
    perm = jnp.argsort(keys, stable=True)
    return pack[perm], u4[perm]


u4 = jnp.zeros((o.shape[0], 4), jnp.float32)
r = bin_step(pack, keys, u4)
np.asarray(r[0][:1])
ts = []
for _ in range(5):
    t0 = time.perf_counter()
    r = bin_step(pack, keys, u4)
    np.asarray(r[0][:1])
    ts.append(time.perf_counter() - t0)
print(f"argsort+gather {o.shape[0]} rays: {min(ts)*1e3:.1f} ms")
