"""r4 (VERDICT task 8): Mosaic-vs-interpret cross-check of the megakernel.

Renders the reference scene small with the whole-sample fused megakernel
twice on the SAME TPU process:

  * compiled Mosaic kernel with PTAP_MM_PRECISION=f32 (HIGHEST matmuls);
  * the identical kernel under ``pltpu.force_tpu_interpret_mode()`` (the
    kernel body evaluated as plain XLA ops).

With f32 matmuls both sides compute the same IEEE arithmetic, so any
difference is a Mosaic lowering divergence (layout-dependent reassociation,
predication semantics) — exactly the drift class ``utils/debug.py``'s IEEE
reasoning worries about.  Exactness result is printed and asserted through
a small ULP budget.

Run: PTAP_MM_PRECISION=f32 python scripts/check_tpu_exactness.py
"""
import os
import sys

sys.path.insert(0, "/root/repo")

os.environ.setdefault("PTAP_MM_PRECISION", "f32")
assert os.environ["PTAP_MM_PRECISION"] == "f32", "run with PTAP_MM_PRECISION=f32"

import jax
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from pathtracerap_tpu.config import RenderConfig
from pathtracerap_tpu.ops.plucker import bake_world_triangles
from pathtracerap_tpu.pallas import megakernel as MK
from pathtracerap_tpu.render.camera import generate_rays
from pathtracerap_tpu.scene.build import build_reference_scene
from pathtracerap_tpu.utils.profiling import enable_compile_cache

enable_compile_cache()
assert jax.default_backend() == "tpu", jax.default_backend()

scene = build_reference_scene().to_device()
world = jax.jit(bake_world_triangles)(scene)
cfg = RenderConfig(resolution=(32, 16), samples_per_pixel=1, max_bounces=5)
ro, rd = generate_rays(cfg.camera, cfg.resolution)
key = jax.random.PRNGKey(0)

f = jax.jit(lambda: MK.render_samples_fused(
    world, ro, rd, key, n_samples=1, max_bounces=5))
img_mosaic = np.asarray(f())

with pltpu.force_tpu_interpret_mode():
    img_interp = np.asarray(jax.jit(lambda: MK.render_samples_fused(
        world, ro, rd, key, n_samples=1, max_bounces=5))())

exact = np.array_equal(img_mosaic, img_interp)
diff = np.abs(img_mosaic - img_interp)
n_diff = int((diff > 0).sum())
print(f"bit-exact: {exact}; differing components: {n_diff}/{diff.size}; "
      f"max abs diff: {diff.max():.3e}; image mean {img_mosaic.mean():.6f}")
# budget: identical IEEE ops may still reassociate inside reductions —
# demand agreement to float32-noise level on every component and exact
# equality for the overwhelming majority
assert diff.max() <= 2e-5 * max(1.0, np.abs(img_mosaic).max()), diff.max()
assert n_diff <= diff.size * 0.01, n_diff
print("Mosaic vs interpret: PASS")
