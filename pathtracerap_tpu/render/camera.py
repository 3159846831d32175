"""Primary ray generation.

Mirrors ``generateRaysKernel`` (``Renderer.cpp:521-555``): a pinhole eye
shooting through an axis-aligned image-plane rectangle, one ray per pixel,
row 0 at the *bottom* (matching the BMP writer's bottom-up row order).  The
reference never jitters — every sample iteration shoots the identical
primary ray (the README images' aliasing comes from this) — so jitter is an
opt-in quality extension.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import CameraConfig


def generate_rays(
    camera: CameraConfig,
    resolution: Tuple[int, int],
    key: Optional[jax.Array] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (orig (N, 3), dir (N, 3)); dir is unnormalized (pix - eye),
    exactly like ``Renderer.cpp:548``.  N = W*H, index = y*W + x, y up."""
    w, h = resolution
    n = w * h
    iray = jnp.arange(n, dtype=jnp.int32)
    y = iray // w
    x = iray % w

    x0, x1 = camera.plane_x
    y0, y1 = camera.plane_y
    step_x = (x1 - x0) / w
    step_y = (y1 - y0) / h

    fx = x.astype(jnp.float32)
    fy = y.astype(jnp.float32)
    if camera.jitter and key is not None:
        jx, jy = jax.random.uniform(key, (2, n), dtype=jnp.float32)
        fx = fx + jx
        fy = fy + jy

    world_x = x0 + fx * step_x
    world_y = y0 + fy * step_y
    world_z = jnp.full((n,), camera.plane_z, jnp.float32)

    eye = jnp.asarray(camera.position, jnp.float32)
    pix = jnp.stack([world_x, world_y, world_z], axis=-1)
    ro = jnp.broadcast_to(eye, (n, 3))
    rd = pix - eye
    return ro, rd
