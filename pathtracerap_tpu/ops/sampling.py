"""BSDF direction sampling.

Vectorized re-implementations of the reference's scattering helpers with
identical math given identical uniform draws:

* :func:`cosine_hemisphere` — ``calculateRandomDirectionInHemisphere``
  (utility.h:91-123): cosine-weighted sample in a tangent frame built from
  the axis least aligned with the normal.
* :func:`metal_scatter` — ``calculateMetalScattering`` (utility.h:145-170):
  Phong-lobe (exponent 30) perturbation of the mirror direction.  Note the
  reference draws ``up``/``around`` first and never uses them; draw slots
  here mirror that (u[2] = phi draw, u[3] = r2 draw).
* :func:`coat_scatter` — ``calculateCoatScattering`` (utility.h:125-143):
  50/50 Russian roulette between (quirky) mirror reflection and a diffuse
  bounce; roulette consumes u[0], the diffuse branch consumes u[1], u[2].

All take pre-drawn uniforms so the NumPy oracle and the jitted renderer can
consume the exact same random stream.
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import constants
from .math import cross3, normalize, reflect_parity, reflect_standard

_SQRT13 = constants.SQRT_OF_ONE_THIRD
_TWO_PI = constants.TWO_PI


def cosine_hemisphere(normal: jnp.ndarray, u0: jnp.ndarray, u1: jnp.ndarray) -> jnp.ndarray:
    """Cosine-weighted hemisphere direction around ``normal``.

    normal: (..., 3); u0, u1: (...,) uniforms.
    """
    up = jnp.sqrt(u0)  # cos(theta)
    over = jnp.sqrt(jnp.maximum(1.0 - up * up, 0.0))  # sin(theta)
    around = u1 * _TWO_PI

    ax, ay = jnp.abs(normal[..., 0]), jnp.abs(normal[..., 1])
    # tangent seed: x if |nx| < sqrt(1/3), else y if |ny| < sqrt(1/3), else z
    ex = jnp.zeros_like(normal).at[..., 0].set(1.0)
    ey = jnp.zeros_like(normal).at[..., 1].set(1.0)
    ez = jnp.zeros_like(normal).at[..., 2].set(1.0)
    seed = jnp.where(
        (ax < _SQRT13)[..., None], ex, jnp.where((ay < _SQRT13)[..., None], ey, ez)
    )

    t1 = normalize(cross3(normal, seed))
    t2 = normalize(cross3(normal, t1))

    return (
        up[..., None] * normal
        + (jnp.cos(around) * over)[..., None] * t1
        + (jnp.sin(around) * over)[..., None] * t2
    )


def metal_scatter(
    normal: jnp.ndarray, ray_dir: jnp.ndarray, u2: jnp.ndarray, u3: jnp.ndarray
) -> jnp.ndarray:
    """Phong-lobe (exp 30) perturbed mirror reflection.

    ray_dir is the (normalized) incident direction; u2 -> phi, u3 -> r2,
    matching the reference's 3rd and 4th engine draws (utility.h:156-157).
    """
    phi = _TWO_PI * u2
    cos_theta = jnp.power(
        jnp.maximum(1.0 - u3, 0.0), 1.0 / (constants.METAL_PHONG_EXPONENT + 1.0)
    )
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0))

    ndotd = jnp.sum(normal * ray_dir, axis=-1, keepdims=True)
    w = normalize(ray_dir - normal * 2.0 * ndotd)
    ey = jnp.zeros_like(w).at[..., 1].set(1.0)
    ex = jnp.zeros_like(w).at[..., 0].set(1.0)
    seed = jnp.where((jnp.abs(w[..., 0]) > 0.1)[..., None], ey, ex)
    u = normalize(cross3(seed, w))
    v = cross3(w, u)

    return (
        u * (jnp.cos(phi) * sin_theta)[..., None]
        + v * (jnp.sin(phi) * sin_theta)[..., None]
        + w * cos_theta[..., None]
    )


def coat_scatter(
    normal: jnp.ndarray,
    ray_dir: jnp.ndarray,
    u0: jnp.ndarray,
    u1: jnp.ndarray,
    u2: jnp.ndarray,
    parity: bool = True,
) -> jnp.ndarray:
    """50/50 roulette between mirror reflection and diffuse (utility.h:125-143).

    In parity mode the mirror branch uses the reference's quirky
    ``reflectRay`` (utility.h:136 -> 64-69); otherwise the standard formula.
    """
    reflect = reflect_parity if parity else reflect_standard
    mirror = reflect(ray_dir, normal)
    diffuse = cosine_hemisphere(normal, u1, u2)
    take_mirror = (u0 < constants.COAT_REFLECT_PROBABILITY)[..., None]
    return jnp.where(take_mirror, mirror, diffuse)
