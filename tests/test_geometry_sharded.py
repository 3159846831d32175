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
