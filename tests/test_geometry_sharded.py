"""Geometry-sharded (triangle ring) renderer vs the replicated engine."""

import numpy as np
import jax
from jax.sharding import Mesh
import pytest

from pathtracerap_tpu.config import CameraConfig, RenderConfig
from pathtracerap_tpu.parallel.geometry import render_image_geometry_sharded
from pathtracerap_tpu.render.wavefront import Renderer
from pathtracerap_tpu.scene.build import build_cornell_box_scene

RES = (32, 16)
CAMERA = CameraConfig(
    position=(0.0, 0.0, 150.0),
    plane_x=(-40.0, 40.0),
    plane_y=(-30.0, 30.0),
    plane_z=100.0,
)


def test_geometry_sharded_matches_replicated():
    scene = build_cornell_box_scene().to_device()
    cfg = RenderConfig(
        resolution=RES, samples_per_pixel=4, max_bounces=3, camera=CAMERA,
        engine="pallas",
    )
    mesh = Mesh(np.asarray(jax.devices()), ("shard",))
    img_ring = np.asarray(
        render_image_geometry_sharded(scene, cfg, mesh=mesh, tile_size=64)
    )
    assert img_ring.shape == (RES[1], RES[0], 3)
    assert np.isfinite(img_ring).all()

    # same tile size + tile numbering => identical RNG; ring reduction is
    # rotation-order independent, so images must match the DP renderer
    from pathtracerap_tpu.parallel.sharding import render_image_dp

    img_dp = np.asarray(
        render_image_dp(scene, cfg, mesh=Mesh(np.asarray(jax.devices()), ("rays",)),
                        tile_size=64)
    )
    np.testing.assert_allclose(img_ring, img_dp, atol=1e-5)

    # the r2 dense-sweep ring must agree with the r4 fused-worklist ring
    # (identical accept logic, rotation-order-independent reduction)
    img_dense = np.asarray(
        render_image_geometry_sharded(
            scene, cfg, mesh=mesh, tile_size=64, engine="dense"
        )
    )
    np.testing.assert_allclose(img_ring, img_dense, atol=1e-5)


def test_geometry_sharded_train_step_matches_single_device():
    """Ring-forward diff step == single-device diff step (VERDICT r3 task 4:
    the geometry-sharded mode is a first-class differentiable citizen)."""
    import jax.numpy as jnp

    from pathtracerap_tpu.diff.grad import extract_params, image_loss
    from pathtracerap_tpu.parallel.geometry import make_geometry_sharded_train_step

    scene = build_cornell_box_scene().to_device()
    n_dev = len(jax.devices())
    mesh = Mesh(np.asarray(jax.devices()), ("shard",))
    res = RES
    n = res[0] * res[1]
    tile = n // n_dev
    step = make_geometry_sharded_train_step(
        scene, CAMERA, res, n_samples=2, max_bounces=3, mesh=mesh,
        tile_size=tile,
    )
    params = extract_params(scene, ("mat_color",))
    target = jnp.zeros((n, 3), jnp.float32)
    key = jax.random.PRNGKey(0)
    loss, new_params = step(params, target, key)
    assert np.isfinite(float(loss))

    # single-device reference: same tile size => same RNG streams; the
    # pallas diff tracer and the ring diff tracer share accept logic and
    # the one-hot material replay, so grads agree to fp roundoff
    def sum_loss(p):
        return image_loss(
            p, scene, target, key, CAMERA, res, 2, 3,
            tile_size=tile, reduce="sum", engine="pallas",
        )

    loss1, g1 = jax.jit(jax.value_and_grad(sum_loss))(params)
    np.testing.assert_allclose(float(loss), float(loss1), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(new_params["mat_color"]),
        np.asarray(params["mat_color"] - 0.05 * g1["mat_color"]),
        rtol=1e-4, atol=1e-6,
    )


def test_geometry_sharded_train_step_masks_padding_rays():
    """ADVICE r4 (medium): pad rays (ray count not divisible by
    n_dev*tile_size) must not leak loss/grads — the ring step's loss must
    equal the replicated computation with pad rows dropped."""
    import jax.numpy as jnp

    from pathtracerap_tpu.diff.grad import extract_params, render_for_params
    from pathtracerap_tpu.parallel.geometry import make_geometry_sharded_train_step
    from pathtracerap_tpu.render.camera import generate_rays

    scene = build_cornell_box_scene().to_device()
    n_dev = len(jax.devices())
    mesh = Mesh(np.asarray(jax.devices()), ("shard",))
    res = (32, 17)  # 544 rays: NOT divisible by 8 devices x 32-ray tiles
    n = res[0] * res[1]
    tile = 32
    step = make_geometry_sharded_train_step(
        scene, CAMERA, res, n_samples=2, max_bounces=3, mesh=mesh,
        tile_size=tile,
    )
    params = extract_params(scene, ("mat_color",))
    target = jnp.full((n, 3), 0.25, jnp.float32)
    key = jax.random.PRNGKey(5)
    loss, new_params = step(params, target, key)

    per_dev = -(-(-(-n // n_dev)) // tile) * tile
    n_pad = per_dev * n_dev
    ro, rd = generate_rays(CAMERA, res)
    ro_p = jnp.pad(ro, ((0, n_pad - n), (0, 0)))
    rd_p = jnp.pad(rd, ((0, n_pad - n), (0, 0)), constant_values=1.0)

    def ref_loss(p):
        img = render_for_params(
            p, scene, key, CAMERA, res, 2, 3, tile_size=tile,
            ro=ro_p, rd=rd_p, tile_base=0, engine="pallas",
        )
        return jnp.sum((img[:n] - target) ** 2)

    import jax as _jax

    loss_ref, g_ref = _jax.jit(_jax.value_and_grad(ref_loss))(params)
    np.testing.assert_allclose(float(loss), float(loss_ref), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(new_params["mat_color"]),
        np.asarray(params["mat_color"] - 0.05 * g_ref["mat_color"]),
        rtol=1e-4, atol=1e-6,
    )


def test_geometry_sharded_vertex_training_matches_replicated():
    """VERDICT r4 item 5: vertex-position training over the geometry ring.
    The re-baking ring step's loss/grads for {mat_color, vertex_pos} must
    match the replicated diff path (quality mode: the cosine factor is
    what carries pixel-loss vertex gradients)."""
    import jax.numpy as jnp

    from pathtracerap_tpu.diff.grad import extract_params, image_loss
    from pathtracerap_tpu.parallel.geometry import make_geometry_sharded_train_step

    scene = build_cornell_box_scene().to_device()
    n_dev = len(jax.devices())
    mesh = Mesh(np.asarray(jax.devices()), ("shard",))
    res = RES
    n = res[0] * res[1]
    tile = n // n_dev
    step = make_geometry_sharded_train_step(
        scene, CAMERA, res, n_samples=2, max_bounces=3, mesh=mesh,
        tile_size=tile, parity=False,
        param_names=("mat_color", "vertex_pos"),
    )
    params = extract_params(scene, ("mat_color", "vertex_pos"))
    target = jnp.full((n, 3), 0.3, jnp.float32)
    key = jax.random.PRNGKey(2)
    loss, new_params = step(params, target, key)
    assert np.isfinite(float(loss))

    def sum_loss(p):
        return image_loss(
            p, scene, target, key, CAMERA, res, 2, 3,
            tile_size=tile, reduce="sum", engine="pallas", parity=False,
        )

    loss1, g1 = jax.jit(jax.value_and_grad(sum_loss))(params)
    np.testing.assert_allclose(float(loss), float(loss1), rtol=1e-5)
    # vertex gradients are real (nonzero) and match the replicated path
    assert np.abs(np.asarray(g1["vertex_pos"])).max() > 0.0
    for name in ("mat_color", "vertex_pos"):
        np.testing.assert_allclose(
            np.asarray(new_params[name]),
            np.asarray(params[name] - 0.05 * g1[name]),
            rtol=1e-4, atol=1e-6,
        )
