"""Round-3 sweep: TB (fused_tile) x engine x sort cadence on the real chip.

Also times the binning permutation itself (argsort + gathers) correctly
(lazy one-row fetch, no full-array tunnel transfer).
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
from pathtracerap_tpu.ops.plucker import bake_world_triangles, _morton3
from pathtracerap_tpu.pallas import megakernel as MK
from pathtracerap_tpu.render.camera import generate_rays
from pathtracerap_tpu.scene.build import build_reference_scene
from pathtracerap_tpu.utils.profiling import enable_compile_cache

enable_compile_cache()


def timeit(fn, *args, n=3):
    out = fn(*args)
    np.asarray(out[:1])
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(out[:1])
        ts.append(time.perf_counter() - t0)
    return min(ts)


scene = build_reference_scene().to_device()
cfg = RenderConfig(resolution=(1000, 800), samples_per_pixel=1, max_bounces=5)
ro, rd = generate_rays(cfg.camera, cfg.resolution)
n = ro.shape[0]
key = jax.random.PRNGKey(0)
spp = 8
rays = n * 5 * spp

# ---- binning permutation cost (honest measurement)
o = jnp.pad(ro, ((0, (-n) % 512), (0, 0)))
pack16 = jnp.concatenate([o, o, o, o, o, o[:, :1]], axis=1)[:, :16]
keys32 = _morton3(o, o.min(axis=0), o.max(axis=0))
u4 = jnp.zeros((o.shape[0], 4), jnp.float32)
t_sort = timeit(
    jax.jit(lambda k, p, u: (lambda pm: p[pm] + u[pm].sum())(jnp.argsort(k))),
    keys32, pack16, u4,
)
print(f"argsort+gather(16+4 cols) {o.shape[0]} rays: {t_sort*1e3:.1f} ms")

for tb in (512, 256):
    world = jax.jit(functools.partial(bake_world_triangles, fused_tile=tb))(scene)
    nb = world.block_aabb.shape[0]
    print(f"TB{tb}: nb_real={nb} packT={world.fused_ops.shape[1]//4}")
    tF = timeit(jax.jit(lambda w=world: MK.render_samples_fused(
        w, ro, rd, key, n_samples=spp, max_bounces=5)))
    print(f"  fused  {spp}spp: {tF*1e3:7.1f} ms -> {rays/tF/1e6:6.1f} Mrays/s")
    tB = timeit(jax.jit(lambda w=world: MK.render_samples_binned(
        w, ro, rd, key, n_samples=spp, max_bounces=5)))
    print(f"  binned {spp}spp: {tB*1e3:7.1f} ms -> {rays/tB/1e6:6.1f} Mrays/s")
