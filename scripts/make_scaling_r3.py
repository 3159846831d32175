"""SCALING_r3.json: strong-scaling evidence from both available backends.

Real multi-chip hardware is not available (1 TPU chip via the axon
tunnel); the committed evidence is (a) the 1-chip TPU row from the same
harness a pod would run, and (b) the 8-fake-device CPU-mesh rows that
exercise the sharded program end-to-end.  The CPU rows CANNOT show real
parallel efficiency — all fake devices share one host's cores, so
per-device throughput cannot increase — the artifact says so explicitly.
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
import json, sys
sys.path.insert(0, "/root/repo")
from pathtracerap_tpu.config import RenderConfig
from pathtracerap_tpu.parallel.distributed import scaling_report
from pathtracerap_tpu.scene.build import build_reference_scene
from pathtracerap_tpu.utils.profiling import enable_compile_cache
enable_compile_cache()
cfg = RenderConfig(resolution=(1000, 800), samples_per_pixel=8, max_bounces=5,
                   engine="fused")
print(json.dumps(scaling_report(build_reference_scene().to_device(), cfg,
                                repeats=2)))
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

art = {
    "round": 3,
    "harness": "pathtracerap_tpu.parallel.distributed.scaling_report "
               "(strong scaling: fixed image, rays sharded n ways, DP "
               "megakernel since r3)",
    "tpu": {
        **tpu,
        "note": "1 physical chip available via the axon tunnel; this row is "
                "the same code path an N-chip pod runs (8192-ray-aligned "
                "slabs, RNG-stream-exact vs single device — "
                "tests/test_sharding.py).  Rays are embarrassingly parallel "
                "with zero inter-chip communication until the final image "
                "gather, so the >=85% BASELINE target is expected to hold on "
                "real pods; no recorded multi-chip wall-clock exists yet.",
    },
    "cpu_fake_mesh": {
        **cpu,
        "note": "8 XLA host devices share ONE machine's cores: total compute "
                "is constant, so efficiency-vs-linear MUST fall toward 1/n "
                "by construction.  These rows evidence that the sharded "
                "program partitions and executes correctly at every device "
                "count, not parallel speedup.",
    },
}
with open("/root/repo/SCALING_r3.json", "w") as f:
    json.dump(art, f, indent=1)
print(json.dumps(art, indent=1))
