"""r5: fwd+bwd throughput with VERTEX gradients (VERDICT r4 item 7).

Full-replay train step over {mat_color, vertex_pos} on the reference
workload, quality mode (parity=False: the cosine factor is what gives
pixel-loss vertex gradients).  A/B the segment-sum gather VJP
(PTAP_SEGMENT_VJP=0 restores the scatter-add backward).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/prof_r5_diff.py
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from pathtracerap_tpu.config import RenderConfig
from pathtracerap_tpu.diff import fast as DF
from pathtracerap_tpu.diff.grad import extract_params, make_train_step
from pathtracerap_tpu.scene.build import build_reference_scene
from pathtracerap_tpu.utils.profiling import enable_compile_cache

enable_compile_cache()
jax.jit(lambda x: x * 2.0)(jnp.ones((8,))).block_until_ready()

resolution = (1000, 800)
spp = 8
bounces = 5
scene = build_reference_scene().to_device()
cfg = RenderConfig()
n = resolution[0] * resolution[1]
target = jnp.zeros((n, 3), jnp.float32)
key = jax.random.PRNGKey(0)

step = make_train_step(
    scene, cfg.camera, resolution, spp, bounces, tile_size=8192,
    engine="fused", parity=False,
)
params = extract_params(scene, ("mat_color", "vertex_pos"))
loss, _ = step(params, target, key)
float(loss)
ts = []
for _ in range(3):
    t0 = time.perf_counter()
    loss, _ = step(params, target, key)
    float(loss)
    ts.append(time.perf_counter() - t0)
rays = n * spp * bounces
print(json.dumps({
    "what": "fwd+bwd vertex_pos+mat_color, quality mode",
    "segment_vjp": DF._SEGMENT_VJP,
    "mrays_per_s": round(rays / min(ts) / 1e6, 2),
    "loss": float(loss),
}))
