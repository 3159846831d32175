"""Differentiable fast-path traversal: Pallas forward, recompute backward.

VERDICT r1 item 5: the fastest traversal engine (the Pallas worklist
kernel) and the differentiable engine (XLA MXU matmuls) were different code
paths.  This module unifies them with the detached-topology estimator the
framework already uses everywhere:

* the **discrete** part of traversal — which triangle is nearest — comes
  from the Pallas kernel under ``stop_gradient`` (no backward cost at all);
* the **continuous** hit quantities (t, shading normal, material color) are
  recomputed differentiably at the frozen argmin index from the baked
  ``WorldTriangles.v0/e1/e2`` (carried for exactly this,
  ``scene/types.py``) via closed-form Moeller-Trumbore — algebraically the
  same distance the kernel computed (Renderer.cpp:174-215), so forward
  values agree to fp roundoff while gradients flow to vertex positions,
  model transforms and material colors through the bake.

This is equivalent to a ``jax.custom_vjp`` whose forward calls the kernel
and whose backward differentiates the recompute — expressed with
``stop_gradient`` + re-evaluation instead, which composes with ``vmap`` /
``shard_map`` / higher-order AD for free.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import constants
from ..ops.intersect import HitRecord
from ..ops.math import normalize
from ..scene.types import WorldTriangles

F_MAX = constants.FLOAT_MAX


def hit_from_index(
    world: WorldTriangles, ro: jax.Array, rd_n: jax.Array, idx: jax.Array,
    hit: jax.Array,
) -> HitRecord:
    """Differentiable hit quantities at a frozen triangle index.

    Moeller-Trumbore with the triangle's (v0, e1, e2); ``hit`` masks lanes
    whose kernel trace missed (their values are the miss sentinels, whose
    gradient is zero by construction of the ``where``)."""
    v0 = world.v0[idx]
    e1 = world.e1[idx]
    e2 = world.e2[idx]
    pvec = jnp.cross(rd_n, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    safe = jnp.where(det == 0.0, 1.0, det)
    tvec = ro - v0
    qvec = jnp.cross(tvec, e1)
    t = jnp.sum(e2 * qvec, axis=-1) / safe

    return HitRecord(
        t=jnp.where(hit, t, F_MAX),
        normal=jnp.where(hit[:, None], world.shade_normal[idx], 0.0),
        mat_type=jnp.where(hit, world.mat_type[idx], 0),
        mat_color=jnp.where(hit[:, None], world.mat_color[idx], 0.0),
        # geometric normal straight from positions — the quality-mode
        # cosine factor's vertex-gradient carrier (render/shade.py)
        geom_normal=jnp.where(
            hit[:, None], normalize(jnp.cross(e1, e2), eps=1e-30), 0.0
        ),
    )


def trace_pallas_diff(
    world: WorldTriangles, ro: jax.Array, rd: jax.Array, alive=None
) -> HitRecord:
    """Drop-in differentiable tracer with the Pallas kernel's forward speed.

    Same result contract as ``trace_pallas`` / ``trace_mxu``; gradients of
    (t, normal, mat_color) w.r.t. scene parameters flow through
    :func:`hit_from_index`.
    """
    from ..pallas.trace import trace_pallas

    rd_n = normalize(rd)
    rec, idx = trace_pallas(
        jax.lax.stop_gradient(world),
        jax.lax.stop_gradient(ro),
        jax.lax.stop_gradient(rd_n),
        alive=alive,
        return_idx=True,
    )
    hit = rec.t < F_MAX  # already gradient-free: all kernel inputs stopped
    return hit_from_index(world, ro, rd_n, idx, hit)
