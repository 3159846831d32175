"""r4: tune (fused_tile TB, ray_tile R) for the binned worklist engine.

With the scratch-predicated kernel, visits are cheap to SKIP — finer
triangle blocks and/or finer ray tiles tighten the worklists (per-ray
floor: ~2.0 blocks at TB512 vs ~2.5 at TB128, r3 finding 4) at the price
of more per-visit fixed cost.  Usage:

    python scripts/prof_r4_tune.py TB R [TB R ...]
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
ro, rd = generate_rays(RenderConfig().camera, (1000, 800))
n = ro.shape[0]
key = jax.random.PRNGKey(0)
SPP = 24

args = [int(x) for x in sys.argv[1:]] or [256, 512, 512, 256]
pairs = list(zip(args[::2], args[1::2]))

for tb, rt in pairs:
    world = jax.jit(
        functools.partial(bake_world_triangles, fused_tile=tb)
    )(scene)
    f = jax.jit(lambda w=world, r=rt: MK.render_samples_binned(
        w, ro, rd, key, n_samples=SPP, max_bounces=5, ray_tile=r))
    out = np.asarray(f())
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(f())
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    print(f"binned TB={tb} R={rt}: {dt*1e3:6.0f} ms -> "
          f"{n*5*SPP/dt/1e6:5.2f} Mrays/s (mean {out.mean()/SPP:.5f})")
