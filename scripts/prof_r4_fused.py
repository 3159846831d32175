"""r4: time the whole-sample fused megakernel on the real chip.

Measures the reference workload (1000x800, 5 bounces, parity camera) at
24 spp like bench.py, but without the Renderer facade / fwd+bwd section so
kernel-change iteration is fast.  PTAP_MM_PRECISION can A/B the matmul
precision mode (bf16x3 default / bf16 single-pass ceiling probe).
"""
import sys

sys.path.insert(0, "/root/repo")

import functools
import os
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

print("PTAP_MM_PRECISION =", os.environ.get("PTAP_MM_PRECISION", "bf16x3"))

scene = build_reference_scene().to_device()
world = jax.jit(bake_world_triangles)(scene)
cfg = RenderConfig(resolution=(1000, 800), samples_per_pixel=1, max_bounces=5)
ro, rd = generate_rays(cfg.camera, cfg.resolution)
n = ro.shape[0]
key = jax.random.PRNGKey(0)

spp = int(os.environ.get("PTAP_PROF_SPP", "24"))
f = jax.jit(lambda: MK.render_samples_fused(
    world, ro, rd, key, n_samples=spp, max_bounces=5))
out = f()
img = np.asarray(out)
print(f"image mean (sanity, {spp}spp): {img.mean() / spp:.5f}")
ts = []
for _ in range(3):
    t0 = time.perf_counter()
    np.asarray(f())
    ts.append(time.perf_counter() - t0)
dt = min(ts)
rays = n * 5 * spp
print(f"fused {spp}spp/5b: {dt*1e3:.1f} ms -> {rays/dt/1e6:.2f} Mrays/s")
