"""r4: A/B the optimized engines on the reference workload (real chip).

Variants (each a separate in-process measurement, 24 spp amortized):
  fused (SELECT_GATE + SAMPLE_BATCH from env)
  binned with RESORT_EVERY from env (dead-tile skip always on)

Env knobs: PTAP_SELECT_GATE, PTAP_SAMPLE_BATCH, PTAP_RESORT_EVERY.
Prints Mrays/s + image means (must match across engine variants).
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

print("SELECT_GATE:", MK.SELECT_GATE, "SAMPLE_BATCH:", MK.SAMPLE_BATCH,
      "RESORT_EVERY:", MK.RESORT_EVERY)

scene = build_reference_scene().to_device()
world = jax.jit(bake_world_triangles)(scene)
ro, rd = generate_rays(RenderConfig().camera, (1000, 800))
n = ro.shape[0]
key = jax.random.PRNGKey(0)
SPP = 24


def measure(tag, fn):
    f = jax.jit(fn)
    out = np.asarray(f())
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(f())
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    print(f"{tag:24s}: {dt*1e3:7.0f} ms -> {n*5*SPP/dt/1e6:5.2f} Mrays/s "
          f"(mean {out.mean()/SPP:.5f})")


which = sys.argv[1:] or ["fused", "binned"]
if "fused" in which:
    measure("fused", lambda: MK.render_samples_fused(
        world, ro, rd, key, n_samples=SPP, max_bounces=5))
if "binned" in which:
    measure(f"binned(resort={MK.RESORT_EVERY})", lambda: MK.render_samples_binned(
        world, ro, rd, key, n_samples=SPP, max_bounces=5))
