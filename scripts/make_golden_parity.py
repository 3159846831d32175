"""Parity-engine (per-ray DDA) full-res render of the reference scene —
the r2 VERDICT item-7 cross-check of the committed fused golden.

The full 1000x800 parity render in one dispatch crashes the TPU worker
(lax.while_loop DDA at 8192-ray tiles x 98-tile scan); render in separate
per-sample dispatches at a smaller tile size instead.

Usage: python scripts/make_golden_parity.py [spp] [tile]
"""
import sys

sys.path.insert(0, "/root/repo")

import functools
import time

import jax
import numpy as np

print = functools.partial(print, flush=True)

spp = int(sys.argv[1]) if len(sys.argv) > 1 else 4
tile = int(sys.argv[2]) if len(sys.argv) > 2 else 2048

from pathtracerap_tpu.config import RenderConfig
from pathtracerap_tpu.io.bmp import quantize_image, read_bmp, write_bmp
from pathtracerap_tpu.render.wavefront import render_accumulate
from pathtracerap_tpu.scene.build import build_reference_scene
from pathtracerap_tpu.utils.profiling import enable_compile_cache

enable_compile_cache()

cfg = RenderConfig(resolution=(1000, 800), samples_per_pixel=spp,
                   max_bounces=5, engine="parity")
scene = build_reference_scene().to_device()
key = jax.random.PRNGKey(cfg.seed)
acc = None
for s in range(spp):
    t0 = time.perf_counter()
    acc = render_accumulate(
        scene, key, cfg.camera, cfg.resolution, n_samples=1,
        max_bounces=cfg.max_bounces, engine="parity", parity=True,
        sample_offset=s, init_accum=acc, tile_size=tile,
    )
    acc_h = np.asarray(acc)
    print(f"sample {s}: {time.perf_counter()-t0:.1f}s mean={acc_h.mean()/(s+1):.4f}")

w, h = cfg.resolution
out = "/root/repo/assets/golden/reference_scene_parity.bmp"
write_bmp(out, quantize_image(acc_h.reshape(h, w, 3), spp))
print("wrote", out)

g = read_bmp("/root/repo/assets/golden/reference_scene.bmp").astype(np.float32) / 255.0
q = read_bmp(out).astype(np.float32) / 255.0


def down(x, f=8):
    hh, ww, _ = x.shape
    return x[: hh - hh % f, : ww - ww % f].reshape(hh // f, f, ww // f, f, 3).mean(
        axis=(1, 3)
    )


mad = float(np.abs(down(q) - down(g)).mean())
corr = float(np.corrcoef(down(q).ravel(), down(g).ravel())[0, 1])
print(f"parity-vs-fused golden: downsampled mean|diff|={mad:.4f} corr={corr:.4f}")
