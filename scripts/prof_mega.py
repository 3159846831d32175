"""Time the megakernel on the real chip, vs the per-bounce pallas engine."""
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


def timeit(fn, *args, n=5):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        ts.append(time.perf_counter() - t0)
    return min(ts)


scene = build_reference_scene().to_device()
world = jax.jit(bake_world_triangles)(scene)
cfg = RenderConfig(resolution=(1000, 800), samples_per_pixel=1, max_bounces=5)
ro, rd = generate_rays(cfg.camera, cfg.resolution)
n = ro.shape[0]
key = jax.random.PRNGKey(0)

# how many blocks can each tile reach? (host-side worklist stats)
from pathtracerap_tpu.pallas.trace import _tile_block_lists, _slab_margin
from pathtracerap_tpu.ops.math import normalize

margin = _slab_margin(world.block_aabb)
n_pad = -(-n // 512) * 512
ro_p = jnp.pad(ro, ((0, n_pad - n), (0, 0)))
rd_p = jnp.pad(normalize(rd), ((0, n_pad - n), (0, 0)), constant_values=1.0)
alive = jnp.ones((n_pad, 1), jnp.float32)
bl = np.asarray(jax.jit(
    lambda: _tile_block_lists(world.block_aabb, ro_p, rd_p, alive, 512, margin))())
print("mean primary blocks/tile (slab-reachable):", (bl >= 0).sum(axis=1).mean())

spp = 1
f1 = jax.jit(lambda: MK.render_samples_fused(
    world, ro, rd, key, n_samples=spp, max_bounces=5))
t1 = timeit(f1)
rays = n * 5 * spp
print(f"megakernel {spp}spp/5b: {t1*1e3:.1f} ms -> {rays/t1/1e6:.1f} Mrays/s (counted)")

spp = 8
f8 = jax.jit(lambda: MK.render_samples_fused(
    world, ro, rd, key, n_samples=spp, max_bounces=5))
t8 = timeit(f8, n=3)
rays = n * 5 * spp
print(f"megakernel {spp}spp/5b: {t8*1e3:.1f} ms -> {rays/t8/1e6:.1f} Mrays/s (counted)")
print(f"  marginal per-sample: {(t8 - t1)/7*1e3:.1f} ms")
