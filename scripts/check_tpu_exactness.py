"""r4 (VERDICT task 8): Mosaic-vs-interpret cross-check of the megakernel.

Renders the reference scene small with the whole-sample fused megakernel
twice, with f32 (HIGHEST) matmuls on both sides so the IEEE arithmetic is
identical:

  * compiled Mosaic kernel on the TPU (PTAP_MM_PRECISION=f32);
  * the identical kernel interpreted on the CPU backend (the test suite's
    standard execution mode), in a subprocess.

Any difference is a Mosaic lowering divergence (layout-dependent
reassociation, predication semantics) — the drift class
``utils/debug.py``'s IEEE reasoning worries about.  (An in-process
``pltpu.force_tpu_interpret_mode`` comparison was the first cut; per-op
emulation of the whole-sample kernel through the axon tunnel exceeds any
practical runtime, so the interpret side runs on CPU instead — same
kernel code, same interpreter the CPU test suite uses.)

Run on a TPU host: PTAP_MM_PRECISION=f32 python scripts/check_tpu_exactness.py
"""
import os
import subprocess
import sys

sys.path.insert(0, "/root/repo")

os.environ.setdefault("PTAP_MM_PRECISION", "f32")
assert os.environ["PTAP_MM_PRECISION"] == "f32", "run with PTAP_MM_PRECISION=f32"

import jax
import numpy as np

from pathtracerap_tpu.config import RenderConfig
from pathtracerap_tpu.ops.plucker import bake_world_triangles
from pathtracerap_tpu.pallas import megakernel as MK
from pathtracerap_tpu.render.camera import generate_rays
from pathtracerap_tpu.scene.build import build_reference_scene
from pathtracerap_tpu.utils.profiling import enable_compile_cache

enable_compile_cache()
assert jax.default_backend() == "tpu", jax.default_backend()

RES = (96, 64)
SPP = 1
# Two comparisons:
#  * 1 bounce — color is the primary hit's albedo (+ miss mask): pure
#    traversal matmuls + select + mask algebra, NO trig-derived scatter
#    directions.  Cross-backend this must agree to f32-reassociation
#    noise; it is the comparison that catches Mosaic lowering bugs (it is
#    how the bf16-split select miscompile manifested).
#  * 5 bounces — REPORTED, not asserted: backend transcendental ulp
#    differences (cos/sin/pow) perturb scatter directions at ~1e-7 and
#    path transport is chaotic, so multi-bounce bitwise agreement across
#    backends is not a well-defined target (measured: 40% of components
#    differ, max 0.88, while the 1-bounce image is clean).
B_EXACT = 1
B_REPORT = 5

scene = build_reference_scene().to_device()
world = jax.jit(bake_world_triangles)(scene)
cfg = RenderConfig(resolution=RES, samples_per_pixel=SPP, max_bounces=B_REPORT)
ro, rd = generate_rays(cfg.camera, cfg.resolution)
key = jax.random.PRNGKey(0)

def tpu_render(b):
    return np.asarray(jax.jit(lambda: MK.render_samples_fused(
        world, ro, rd, key, n_samples=SPP, max_bounces=b))())

img_mosaic = tpu_render(B_EXACT)
img_mosaic5 = tpu_render(B_REPORT)

CPU_CODE = f"""
import sys
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from pathtracerap_tpu.ops.plucker import bake_world_triangles
from pathtracerap_tpu.pallas import megakernel as MK
from pathtracerap_tpu.render.camera import generate_rays
from pathtracerap_tpu.scene.build import build_reference_scene
from pathtracerap_tpu.config import RenderConfig
scene = build_reference_scene().to_device()
world = jax.jit(bake_world_triangles)(scene)
cfg = RenderConfig(resolution={RES!r}, samples_per_pixel={SPP}, max_bounces=1)
ro, rd = generate_rays(cfg.camera, cfg.resolution)
key = jax.random.PRNGKey(0)
for b, path in ((({B_EXACT}), "/tmp/ptap_exact_interp.npy"),
                (({B_REPORT}), "/tmp/ptap_exact_interp5.npy")):
    img = np.asarray(MK.render_samples_fused(
        world, ro, rd, key, n_samples={SPP}, max_bounces=b))
    np.save(path, img)
"""
env = dict(os.environ, PTAP_MM_PRECISION="f32")
subprocess.run([sys.executable, "-c", CPU_CODE], check=True, env=env,
               timeout=1800)
img_interp = np.load("/tmp/ptap_exact_interp.npy")
img_interp5 = np.load("/tmp/ptap_exact_interp5.npy")

diff = np.abs(img_mosaic - img_interp)
n_diff = int((diff > 0).sum())
print(f"1-bounce: bit-exact={np.array_equal(img_mosaic, img_interp)}; "
      f"differing components: {n_diff}/{diff.size}; "
      f"max abs diff: {diff.max():.3e}; image mean {img_mosaic.mean():.6f}")
# budget: identical IEEE ops may still reassociate inside reductions —
# demand agreement at float32-ulp level on every component (measured:
# max diff 5.96e-08 = ONE ulp at ~0.9, on 3.5% of components — the
# sqrt/accumulate reassociation signature; a lowering bug shows up as
# O(0.1..1) diffs on most lanes, like the bf16-split select miscompile)
assert diff.max() <= 1e-6 * max(1.0, np.abs(img_mosaic).max()), diff.max()
assert n_diff <= diff.size * 0.10, n_diff

d5 = np.abs(img_mosaic5 - img_interp5)
print(f"5-bounce (chaos-amplified, report only): mean|diff|={d5.mean():.4f} "
      f"p99={np.percentile(d5, 99):.4f} max={d5.max():.4f}; "
      f"means {img_mosaic5.mean():.5f} vs {img_interp5.mean():.5f}")
assert abs(img_mosaic5.mean() - img_interp5.mean()) < 2e-3
print("Mosaic (TPU) vs interpret (CPU): PASS")
