"""Round-3 first measurement: binned vs fused megakernel on the real chip,
reference workload (1000x800, 5 bounces)."""
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


def timeit(fn, *args, n=3):
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

for spp in (1, 8):
    rays = n * 5 * spp
    tF = timeit(jax.jit(lambda spp=spp: MK.render_samples_fused(
        world, ro, rd, key, n_samples=spp, max_bounces=5)))
    print(f"fused  {spp}spp: {tF*1e3:7.1f} ms -> {rays/tF/1e6:6.1f} Mrays/s")
    tB = timeit(jax.jit(lambda spp=spp: MK.render_samples_binned(
        world, ro, rd, key, n_samples=spp, max_bounces=5)))
    print(f"binned {spp}spp: {tB*1e3:7.1f} ms -> {rays/tB/1e6:6.1f} Mrays/s")
