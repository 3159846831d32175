"""Fused Pallas nearest-hit kernel vs the XLA MXU engine (interpret mode on
the CPU test backend; the exact same kernel compiles on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pathtracerap_tpu.ops.plucker import bake_world_triangles, trace_mxu
from pathtracerap_tpu.pallas.trace import trace_pallas
from pathtracerap_tpu.scene.build import build_cornell_box_scene


@pytest.fixture(scope="module")
def world():
    return bake_world_triangles(build_cornell_box_scene().to_device())


def test_pallas_matches_mxu_engine(world, rng):
    n = 640
    ro = rng.uniform(-150, 150, size=(n, 3)).astype(np.float32)
    target = rng.uniform(-180, 180, size=(n, 3)).astype(np.float32)
    rd = (target - ro).astype(np.float32)

    h_ref = jax.jit(lambda w, o, d: trace_mxu(w, o, d))(world, ro, rd)
    h_pal = jax.jit(lambda w, o, d: trace_pallas(w, o, d))(world, ro, rd)

    t_ref = np.asarray(h_ref.t)
    t_pal = np.asarray(h_pal.t)
    np.testing.assert_allclose(t_pal, t_ref, rtol=1e-5, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(h_pal.mat_type), np.asarray(h_ref.mat_type))
    np.testing.assert_allclose(
        np.asarray(h_pal.normal), np.asarray(h_ref.normal), atol=1e-6
    )


def test_pallas_renderer_end_to_end(rng):
    from pathtracerap_tpu.config import CameraConfig, RenderConfig
    from pathtracerap_tpu.render.wavefront import Renderer

    scene = build_cornell_box_scene().to_device()
    camera = CameraConfig(
        position=(0.0, 0.0, 150.0),
        plane_x=(-40.0, 40.0),
        plane_y=(-30.0, 30.0),
        plane_z=100.0,
    )
    cfg = dict(resolution=(16, 8), samples_per_pixel=4, max_bounces=3, camera=camera)
    img_p = np.asarray(Renderer(scene, RenderConfig(engine="pallas", **cfg)).render())
    img_m = np.asarray(Renderer(scene, RenderConfig(engine="mxu", **cfg)).render())
    np.testing.assert_allclose(img_p, img_m, atol=1e-5)


@pytest.mark.parametrize("scale", [1e-3, 1e3])
def test_blocked_culling_safe_at_extreme_scene_scales(rng, scale):
    """Culling margins are scale-relative (r1 VERDICT weak item 4): at
    millimeter and kilometer scene scales the blocked/worklist kernels must
    agree with the dense MXU sweep — no false block skips."""
    world = bake_world_triangles(
        build_cornell_box_scene(size=400.0 * scale).to_device()
    )
    n = 640
    ro = (rng.uniform(-150, 150, size=(n, 3)) * scale).astype(np.float32)
    target = (rng.uniform(-180, 180, size=(n, 3)) * scale).astype(np.float32)
    rd = (target - ro).astype(np.float32)

    h_ref = jax.jit(lambda w, o, d: trace_mxu(w, o, d))(world, ro, rd)
    h_pal = jax.jit(lambda w, o, d: trace_pallas(w, o, d))(world, ro, rd)

    t_ref = np.asarray(h_ref.t)
    t_pal = np.asarray(h_pal.t)
    hit_ref = t_ref < 9999999.0
    hit_pal = t_pal < 9999999.0
    np.testing.assert_array_equal(hit_pal, hit_ref)
    np.testing.assert_allclose(
        t_pal[hit_pal], t_ref[hit_ref], rtol=1e-5, atol=1e-4 * scale
    )
    np.testing.assert_array_equal(
        np.asarray(h_pal.mat_type), np.asarray(h_ref.mat_type)
    )
