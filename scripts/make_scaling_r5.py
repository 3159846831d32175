"""SCALING_r5.json: strong-scaling evidence + analytic communication model.

Adds over r4 (VERDICT r4 missing item 2): a REAL two-process
jax.distributed row — two localhost CPU workers (4 fake devices each)
form one 8-device job, run a sharded train step + sample-parallel render
with cross-process psums, and the artifact records the measured result
against the single-process computation.

Adds over r3 (VERDICT r3 weak item 5):
  * `comm_model` — analytic per-step communication volumes/times for DP
    render, DP train and the geometry ring (parallel/distributed.comm_model),
    quantifying the ">=85% expected" claim instead of asserting it;
  * a real-TPU geometry-ring row (n_dev=1 ring vs replicated fast path) so
    the ring kernel path's single-device overhead is on record.
"""
import json
import subprocess
import sys

sys.path.insert(0, "/root/repo")

CPU_CODE = r"""
import os, json
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
from pathtracerap_tpu.config import RenderConfig, CameraConfig
from pathtracerap_tpu.parallel.distributed import scaling_report
from pathtracerap_tpu.scene.build import build_cornell_box_scene
cfg = RenderConfig(
    resolution=(256, 256), samples_per_pixel=8, max_bounces=4, engine="pallas",
    camera=CameraConfig(position=(0.0, 0.0, 150.0), plane_x=(-40.0, 40.0),
                        plane_y=(-40.0, 40.0), plane_z=100.0))
print(json.dumps(scaling_report(build_cornell_box_scene().to_device(), cfg,
                                repeats=3)))
"""

TPU_CODE = r"""
import json, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
from jax.sharding import Mesh
from pathtracerap_tpu.config import RenderConfig
from pathtracerap_tpu.parallel.distributed import scaling_report
from pathtracerap_tpu.parallel.geometry import render_image_geometry_sharded
from pathtracerap_tpu.scene.build import build_reference_scene
from pathtracerap_tpu.utils.profiling import enable_compile_cache
enable_compile_cache()
scene = build_reference_scene().to_device()
cfg = RenderConfig(resolution=(1000, 800), samples_per_pixel=8, max_bounces=5,
                   engine="fused")
rep = scaling_report(scene, cfg, repeats=2)

# geometry ring at n_dev=1 (the only real-chip configuration available):
# quantifies the ring path's kernel overhead vs the replicated fast path
ring_cfg = RenderConfig(resolution=(1000, 800), samples_per_pixel=2,
                        max_bounces=5, engine="pallas")
mesh = Mesh(np.asarray(jax.devices()[:1]), ("shard",))
img = np.asarray(render_image_geometry_sharded(scene, ring_cfg, mesh=mesh,
                                               tile_size=65536))
best = float("inf")
for _ in range(2):
    t0 = time.perf_counter()
    np.asarray(render_image_geometry_sharded(scene, ring_cfg, mesh=mesh,
                                             tile_size=65536))
    best = min(best, time.perf_counter() - t0)
rays = 1000 * 800 * 2 * 5
rep["geometry_ring_1dev"] = {
    "wall_s": round(best, 4),
    "mrays_per_s": round(rays / best / 1e6, 2),
    "image_mean": round(float(img.mean()), 5),
}
print(json.dumps(rep))
"""


def run(code):
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=3600)
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(out.stderr[-2000:])
    return json.loads(lines[-1])


tpu = run(TPU_CODE)
cpu = run(CPU_CODE)

from pathtracerap_tpu.parallel.distributed import comm_model

# REAL multi-process execution on localhost (the code path a pod's DCN
# coordinator runs): reuse the test worker
import os
import socket
import tempfile

with socket.socket() as s:
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
worker = "/root/repo/tests/_distributed_worker.py"
outp = tempfile.mktemp(suffix=".json")
env = dict(os.environ)
env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")
env.pop("XLA_FLAGS", None)
procs = [
    subprocess.Popen([sys.executable, worker, str(i), "2", str(port), outp],
                     env=env, stdout=subprocess.PIPE,
                     stderr=subprocess.STDOUT)
    for i in range(2)
]
for p in procs:
    p.communicate(timeout=900)
assert all(p.returncode == 0 for p in procs)
two_proc = json.load(open(outp))

art = {
    "round": 5,
    "harness": "pathtracerap_tpu.parallel.distributed.scaling_report "
               "(strong scaling: fixed image, rays sharded n ways, DP "
               "megakernel)",
    "tpu": {
        **tpu,
        "note": "1 physical chip via the axon tunnel; same code path an "
                "N-chip pod runs.  geometry_ring_1dev is the fused-pack "
                "ring tracer at D=1 — its gap vs the DP row is the ring "
                "path's fixed kernel overhead, not communication.",
    },
    "cpu_fake_mesh": {
        **cpu,
        "note": "8 XLA host devices share ONE machine's cores: total "
                "compute is constant, so efficiency-vs-linear MUST fall "
                "toward 1/n by construction.  Evidence of correct "
                "partitioning, not parallel speedup.",
    },
    "two_process_localhost": {
        **two_proc,
        "note": "REAL jax.distributed.initialize across 2 localhost "
                "processes (4 fake CPU devices each -> one 8-device job); "
                "the sharded train step's loss/grad psums and the "
                "sample-parallel render's image psum crossed the process "
                "boundary over the gRPC coordinator.  The companion test "
                "(tests/test_distributed.py::test_two_process_distributed) "
                "asserts equality with the single-process computation.",
    },
    "comm_model": {
        "dp_render_8dev": comm_model((1000, 800), 8),
        "dp_train_8dev_matcolor": comm_model(
            (1000, 800), 8, param_bytes=11 * 3 * 4),
        "ring_8dev_reference_scene": comm_model(
            (1000, 800), 8, world_triangles=4096,
            ring_trace_calls_per_device=5 * 8),
        "note": "per-step volumes are tiny vs compute: the DP image "
                "all-reduce is 9.6 MB once per render (sub-ms on ICI, "
                "<1 ms on DCN) against seconds of per-chip tracing, which "
                "is the quantitative basis for the >=85% multi-host "
                "efficiency expectation.",
    },
}
with open("/root/repo/SCALING_r5.json", "w") as f:
    json.dump(art, f, indent=1)
print(json.dumps(art, indent=1))
