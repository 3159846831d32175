"""Benchmark-suite scenes build and render sanely (tiny shapes on CPU)."""

import numpy as np
import pytest

from pathtracerap_tpu.bench_suite import (
    _ROOM_CAMERA,
    build_highpoly_scene,
    build_multimesh_scene,
    suite_configs,
)
from pathtracerap_tpu.config import RenderConfig
from pathtracerap_tpu.render.wavefront import Renderer


def test_suite_configs_cover_baseline():
    names = set(suite_configs().keys())
    assert names == {"cornell", "highpoly", "metallic", "multimesh"}


def test_multimesh_scene_renders():
    scene = build_multimesh_scene()
    assert scene.num_models == 6
    img = np.asarray(
        Renderer(
            scene.to_device(),
            RenderConfig(resolution=(32, 24), samples_per_pixel=1, max_bounces=3,
                         camera=_ROOM_CAMERA, engine="fused"),
        ).render()
    )
    assert np.all(np.isfinite(img)) and img.max() > 0.01


def test_highpoly_scene_falls_back_to_dense_kernel():
    import jax

    from pathtracerap_tpu.ops.plucker import bake_world_triangles

    scene = build_highpoly_scene(subdiv=128)  # ~33k tris > 16384 VMEM limit
    dev = scene.to_device()
    world = jax.jit(bake_world_triangles)(dev)
    assert world.fused_ops is None  # blocked-DMA dense path
    img = np.asarray(
        Renderer(
            dev,
            RenderConfig(resolution=(24, 16), samples_per_pixel=1, max_bounces=2,
                         camera=_ROOM_CAMERA, engine="fused"),  # falls back
        ).render()
    )
    assert np.all(np.isfinite(img)) and img.max() > 0.01
