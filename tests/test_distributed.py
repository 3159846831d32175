"""Multi-host entry + scaling harness (single-process degenerate forms on
the 8-device CPU mesh; real pods exercise the same code paths)."""

import numpy as np

from pathtracerap_tpu.config import CameraConfig, RenderConfig
from pathtracerap_tpu.parallel.distributed import (
    _pow2_counts,
    init_distributed,
    scaling_report,
)
from pathtracerap_tpu.scene.build import build_cornell_box_scene

CAMERA = CameraConfig(
    position=(0.0, 0.0, 150.0),
    plane_x=(-40.0, 40.0),
    plane_y=(-30.0, 30.0),
    plane_z=100.0,
)


def test_init_distributed_single_process_noop():
    info = init_distributed()
    assert info["process_index"] == 0
    assert info["process_count"] == 1
    assert info["global_devices"] == 8
    assert not info["initialized_multiprocess"]


def test_pow2_counts():
    assert _pow2_counts(8) == [1, 2, 4, 8]
    assert _pow2_counts(6) == [1, 2, 4]
    assert _pow2_counts(1) == [1]


def test_scaling_report_shape():
    scene = build_cornell_box_scene().to_device()
    cfg = RenderConfig(resolution=(32, 16), samples_per_pixel=1, max_bounces=2,
                       camera=CAMERA, engine="mxu")
    rep = scaling_report(scene, cfg, device_counts=[1, 2], repeats=1)
    assert [r["devices"] for r in rep["rows"]] == [1, 2]
    assert rep["rows"][0]["efficiency"] == 1.0
    for r in rep["rows"]:
        assert r["mrays_per_s"] > 0.0
        assert np.isfinite(r["wall_s"])
