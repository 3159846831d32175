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


def refract_scatter(
    normal: jnp.ndarray,  # (N, 3) unit shading normal (outward)
    ray_dir: jnp.ndarray,  # (N, 3) unit incident direction
    ior: jnp.ndarray,  # (N, 1) material index of refraction (vacuum outside)
    u: jnp.ndarray,  # (N,) uniform for the Fresnel roulette
):
    """Fresnel-weighted dielectric scatter (quality mode, r5).

    The reference declares REFRACTIVE and carries ``refractive_index`` in
    its data model (Primitive.h:70-84) but never shades it; this is the
    physically standard implementation SURVEY.md section 7 step 4 promised:
    Snell refraction with Schlick's Fresnel approximation deciding a
    reflect/refract roulette, total internal reflection forced to reflect.

    Returns ``(direction, orient)`` with ``orient`` in {+1, -1} such that
    the spawn point is ``hit + SPAWN_OFFSET * orient * normal`` (the
    UNoriented shading normal): the offset pushes toward whichever side of
    the surface the ray continues on (incident side for reflection,
    opposite side for transmission).
    """
    entering = jnp.sum(ray_dir * normal, axis=-1, keepdims=True) < 0.0
    n_eff = jnp.where(entering, normal, -normal)
    cos_i = jnp.clip(-jnp.sum(ray_dir * n_eff, axis=-1, keepdims=True), 0.0, 1.0)
    eta = jnp.where(entering, 1.0 / ior, ior)
    k = 1.0 - eta * eta * (1.0 - cos_i * cos_i)
    tir = k < 0.0
    # double-where: sqrt'(0) is inf, and on TIR lanes max(k, 0) == 0 would
    # poison reverse-mode AD with 0 * inf = NaN
    cos_t = jnp.where(tir, 0.0, jnp.sqrt(jnp.where(tir, 1.0, k)))
    refr = normalize(eta * ray_dir + (eta * cos_i - cos_t) * n_eff)
    r0 = ((ior - 1.0) / (ior + 1.0)) ** 2
    # Schlick on the angle in the DENSER medium's vacuum side: incident
    # angle when entering, transmitted angle when exiting
    cos_x = jnp.where(entering, cos_i, cos_t)
    fres = r0 + (1.0 - r0) * (1.0 - cos_x) ** 5
    take_refl = tir | (u[..., None] < fres)
    refl = reflect_standard(ray_dir, n_eff)
    direction = jnp.where(take_refl, refl, refr)
    orient = jnp.where(take_refl, 1.0, -1.0) * jnp.where(entering, 1.0, -1.0)
    return direction, orient
