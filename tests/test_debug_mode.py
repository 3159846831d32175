"""PTAP_DEBUG mode: explicit det==0/NaN masks + checkify'd invariants.

The fast kernels rely on IEEE inf/NaN compare semantics to reject
parallel/degenerate triangles without an explicit mask
(megakernel._trace_inkernel, trace._fused_list_kernel).  These tests pin
that reasoning: the explicit-mask debug kernels must agree with the fast
kernels on grazing/degenerate rays, and the checkify wrapper must accept a
healthy traversal and fire on a broken one.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pathtracerap_tpu.config import CameraConfig, RenderConfig
from pathtracerap_tpu.ops.plucker import bake_world_triangles
from pathtracerap_tpu.pallas.trace import trace_pallas
from pathtracerap_tpu.render.wavefront import Renderer
from pathtracerap_tpu.scene.build import build_cornell_box_scene

CAMERA = CameraConfig(
    position=(0.0, 0.0, 150.0),
    plane_x=(-40.0, 40.0),
    plane_y=(-30.0, 30.0),
    plane_z=100.0,
)


@pytest.fixture(scope="module")
def world():
    return jax.jit(bake_world_triangles)(build_cornell_box_scene().to_device())


def _degenerate_rays(world):
    """Rays built to stress the det==0 / grazing accept paths."""
    v0 = np.asarray(world.v0)
    e1 = np.asarray(world.e1)
    e2 = np.asarray(world.e2)
    valid = np.asarray(world.valid) > 0
    i = int(np.argmax(valid))
    a, d1, d2 = v0[i], e1[i], e2[i]
    n = np.cross(d1, d2)
    n = n / np.linalg.norm(n)
    ros, rds = [], []
    # in-plane ray (det == 0 exactly for that triangle)
    ros.append(a - 3.0 * d1)
    rds.append(d1)
    # grazing the edge (u ~ 0) from off-plane
    ros.append(a + 0.5 * d1 + 10.0 * n)
    rds.append(-n)
    # origin exactly on the surface (t ~ 0)
    ros.append(a + 0.25 * d1 + 0.25 * d2)
    rds.append(-n)
    # near-parallel: tiny normal component
    rds.append(d1 + 1e-7 * n)
    ros.append(a - 2.0 * d1 + 1e-3 * n)
    # zero-ish direction lane
    ros.append(a + 5.0 * n)
    rds.append(1e-13 * n)
    ro = np.stack(ros).astype(np.float32)
    rd = np.stack(rds).astype(np.float32)
    return jnp.asarray(ro), jnp.asarray(rd)


def test_debug_kernel_matches_fast_kernel_on_degenerates(world):
    ro, rd = _degenerate_rays(world)
    fast = trace_pallas(world, ro, rd, debug=False)
    dbg = trace_pallas(world, ro, rd, debug=True)
    np.testing.assert_allclose(np.asarray(fast.t), np.asarray(dbg.t), rtol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(fast.mat_type), np.asarray(dbg.mat_type)
    )


def test_debug_megakernel_image_matches_fast(world):
    scene = build_cornell_box_scene().to_device()
    cfg = RenderConfig(resolution=(16, 8), samples_per_pixel=2, max_bounces=3,
                       camera=CAMERA, engine="fused")
    from pathtracerap_tpu.pallas.megakernel import render_samples_fused
    from pathtracerap_tpu.render.camera import generate_rays

    ro, rd = generate_rays(cfg.camera, cfg.resolution)
    key = jax.random.PRNGKey(0)
    fast = render_samples_fused(world, ro, rd, key, 2, 3, debug=False)
    dbg = render_samples_fused(world, ro, rd, key, 2, 3, debug=True)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(dbg), atol=1e-6)


def test_checked_trace_passes_on_healthy_scene(world):
    from pathtracerap_tpu.utils.debug import checked_trace
    from pathtracerap_tpu.render.camera import generate_rays

    ro, rd = generate_rays(CAMERA, (16, 8))
    rec = checked_trace(world, ro, rd)
    assert bool(jnp.any(rec.t < 1e30))


def test_checked_trace_fires_on_broken_invariant(world):
    """Marking every triangle invalid while leaving its geometry hittable
    violates the padding-rejection invariant — checkify must raise."""
    from jax.experimental.checkify import JaxRuntimeError
    from pathtracerap_tpu.utils.debug import checked_trace
    from pathtracerap_tpu.render.camera import generate_rays

    broken = world.replace(valid=jnp.zeros_like(world.valid))
    ro, rd = generate_rays(CAMERA, (16, 8))
    with pytest.raises(JaxRuntimeError):
        checked_trace(broken, ro, rd)


def test_renderer_facade_debug_env(monkeypatch):
    """PTAP_DEBUG=1 runs the checkified primary validation inside render."""
    monkeypatch.setenv("PTAP_DEBUG", "1")
    scene = build_cornell_box_scene().to_device()
    cfg = RenderConfig(resolution=(16, 8), samples_per_pixel=1, max_bounces=2,
                       camera=CAMERA, engine="fused")
    img = np.asarray(Renderer(scene, cfg).render())
    assert np.all(np.isfinite(img))
