"""r4: decompose the fwd+bwd (inverse rendering) step on the real chip.

bench.py r4: fwd 11.01 Mrays/s but fwd+bwd only 5.02 — the one-hot
mat_color fix didn't move it, so the scatter wasn't (or wasn't the only)
bottleneck.  Variants (reference workload, 2 spp, mat_color params):

  fwd_render   - render_samples_fused forward (baseline megakernel)
  diff_fwd     - render_for_params(engine='fused') forward only (emit_idx
                 megakernel + frozen-topology replay, no grad)
  loss_grad    - jax.value_and_grad of image_loss (the bench step)
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
from pathtracerap_tpu.diff.grad import extract_params, image_loss, render_for_params
from pathtracerap_tpu.ops.plucker import bake_world_triangles
from pathtracerap_tpu.pallas import megakernel as MK
from pathtracerap_tpu.render.camera import generate_rays
from pathtracerap_tpu.scene.build import build_reference_scene
from pathtracerap_tpu.utils.profiling import enable_compile_cache

enable_compile_cache()

scene = build_reference_scene().to_device()
world = jax.jit(bake_world_triangles)(scene)
cfg = RenderConfig(resolution=(1000, 800))
ro, rd = generate_rays(cfg.camera, cfg.resolution)
n = ro.shape[0]
key = jax.random.PRNGKey(0)
params = extract_params(scene, ("mat_color",))
target = jnp.zeros((n, 3), jnp.float32)
SPP = 2
B = 5
rays = n * B * SPP


def timeit(tag, f, *a):
    out = f(*a)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = f(*a)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    print(f"{tag:10s}: {dt*1e3:7.0f} ms -> {rays/dt/1e6:5.2f} Mrays/s")


timeit("fwd_render", jax.jit(lambda: MK.render_samples_fused(
    world, ro, rd, key, n_samples=SPP, max_bounces=B)))

timeit("diff_fwd", jax.jit(lambda p: render_for_params(
    p, scene, key, cfg.camera, cfg.resolution, SPP, B,
    tile_size=8192, engine="fused")), params)

timeit("loss_grad", jax.jit(jax.value_and_grad(lambda p: image_loss(
    p, scene, target, key, cfg.camera, cfg.resolution, SPP, B,
    tile_size=8192, engine="fused"))), params)
