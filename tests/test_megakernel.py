"""Whole-sample megakernel engine vs the per-bounce engines.

The megakernel consumes the same uniform stream as the other engines, so at
matched configs the rendered images must agree per pixel (interpret mode on
the CPU test backend runs the exact same kernel code that compiles on TPU).
"""

import numpy as np
import pytest

from pathtracerap_tpu.config import CameraConfig, RenderConfig
from pathtracerap_tpu.render.wavefront import Renderer
from pathtracerap_tpu.scene.build import build_cornell_box_scene


@pytest.fixture(scope="module")
def scene():
    return build_cornell_box_scene().to_device()


CAMERA = CameraConfig(
    position=(0.0, 0.0, 150.0),
    plane_x=(-40.0, 40.0),
    plane_y=(-30.0, 30.0),
    plane_z=100.0,
)


def _render(scene, engine, **over):
    cfg = dict(
        resolution=(16, 8), samples_per_pixel=4, max_bounces=3, camera=CAMERA
    )
    cfg.update(over)
    return np.asarray(Renderer(scene, RenderConfig(engine=engine, **cfg)).render())


def test_fused_matches_mxu_engine(scene):
    img_f = _render(scene, "fused")
    img_m = _render(scene, "mxu")
    np.testing.assert_allclose(img_f, img_m, atol=1e-5)


def test_fused_matches_pallas_engine(scene):
    img_f = _render(scene, "fused")
    img_p = _render(scene, "pallas")
    np.testing.assert_allclose(img_f, img_p, atol=1e-5)


def test_fused_more_bounces_and_odd_resolution(scene):
    # resolution whose ray count is not a RAY_TILE multiple exercises the
    # padding path; 5 bounces exercises the unrolled loop depth
    over = dict(resolution=(19, 7), samples_per_pixel=2, max_bounces=5)
    img_f = _render(scene, "fused", **over)
    img_m = _render(scene, "mxu", **over)
    np.testing.assert_allclose(img_f, img_m, atol=1e-5)


def test_fused_quality_mode_jitter(scene):
    cam = CameraConfig(
        position=CAMERA.position,
        plane_x=CAMERA.plane_x,
        plane_y=CAMERA.plane_y,
        plane_z=CAMERA.plane_z,
        jitter=True,
    )
    over = dict(camera=cam, parity=False)
    img_f = _render(scene, "fused", **over)
    img_m = _render(scene, "mxu", **over)
    np.testing.assert_allclose(img_f, img_m, atol=1e-5)


def test_live_ray_curve(scene):
    import jax

    from pathtracerap_tpu.render.diagnostics import live_ray_curve

    cfg = RenderConfig(
        resolution=(16, 8), samples_per_pixel=1, max_bounces=4,
        camera=CAMERA, engine="mxu",
    )
    curve = live_ray_curve(scene, cfg, jax.random.PRNGKey(0))
    assert len(curve) == 4
    assert curve[0] == 1.0
    # monotone non-increasing decay (rays only die)
    assert all(a >= b for a, b in zip(curve, curve[1:]))


def test_slabbed_fused_calls_compose_exactly(scene):
    """Slabbing the ray array over multiple megakernel calls with global
    RNG tile numbering must reproduce the single-call result (the >=1024^2
    SMEM slabbing path in render_accumulate)."""
    import jax
    import jax.numpy as jnp

    from pathtracerap_tpu.ops.plucker import bake_world_triangles
    from pathtracerap_tpu.pallas.megakernel import RNG_TILE, render_samples_fused
    from pathtracerap_tpu.render.camera import generate_rays

    world = jax.jit(bake_world_triangles)(scene)
    # two full RNG tiles worth of rays (small RNG_TILE would need a huge
    # image; emulate by slicing a 2*RNG_TILE ray array)
    res = (RNG_TILE // 64, 128)  # 128 x 128 = 16384 = 2 * RNG_TILE
    from pathtracerap_tpu.config import CameraConfig

    cam = CameraConfig(position=(0.0, 0.0, 150.0), plane_x=(-40.0, 40.0),
                       plane_y=(-30.0, 30.0), plane_z=100.0)
    ro, rd = generate_rays(cam, res)
    assert ro.shape[0] == 2 * RNG_TILE
    key = jax.random.PRNGKey(11)

    full = render_samples_fused(world, ro, rd, key, n_samples=2, max_bounces=3)
    part0 = render_samples_fused(world, ro[:RNG_TILE], rd[:RNG_TILE], key,
                                 n_samples=2, max_bounces=3, tile_base=0)
    part1 = render_samples_fused(world, ro[RNG_TILE:], rd[RNG_TILE:], key,
                                 n_samples=2, max_bounces=3, tile_base=1)
    np.testing.assert_allclose(
        np.asarray(full), np.asarray(jnp.concatenate([part0, part1])),
        atol=1e-6,
    )


def test_binned_matches_fused_engine(scene):
    """Per-bounce ray binning is a pure permutation with per-ray uniform
    streams riding the sort — images must equal the unbinned megakernel's."""
    img_b = _render(scene, "binned", max_bounces=4)
    img_f = _render(scene, "fused", max_bounces=4)
    np.testing.assert_allclose(img_b, img_f, atol=1e-5)
