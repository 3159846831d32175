"""Checkify'd debug mode for the Pallas traversal kernels (SURVEY.md §5).

The fast kernels deliberately skip the explicit ``det == 0`` mask: IEEE
inf/NaN from the division fail every range compare, so parallel/padding
triangles can never be accepted (``pallas/trace.py`` compute,
``pallas/megakernel._trace_inkernel``).  That reasoning is correct for IEEE
semantics but is exactly the kind of assumption a compiler change (Mosaic
fast-math, reciprocal approximations) could silently break — and
``interpret=True`` CPU tests would not notice, because interpret mode uses
XLA:CPU arithmetic, not Mosaic's.

Debug mode provides the regression guard two ways:

* ``PTAP_DEBUG=1`` (or ``debug=True`` kernel args) switches the in-kernel
  accept chain to the explicit-mask form (``parallel = det == 0`` masking,
  guarded reciprocal) — the same 3 extra VPU passes the AD-safe MXU engine
  always pays (``ops/plucker.py:318-320``);
* :func:`checked_trace` runs the kernel under ``jax.experimental.checkify``
  and asserts the output invariants the IEEE reasoning guarantees: hit
  distances are finite-or-sentinel and ``>= -EPSILON``, indices are in
  range, and the kernel agrees with the explicitly-masked MXU engine.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax.experimental import checkify

from .. import constants

F_MAX = constants.FLOAT_MAX
EPS = constants.EPSILON


def debug_enabled() -> bool:
    """True when PTAP_DEBUG=1: kernels use the explicit det==0/NaN masks."""
    return os.environ.get("PTAP_DEBUG", "0") == "1"


def resolve_debug(flag) -> bool:
    """Kernel-arg convention: ``None`` defers to the env var."""
    return debug_enabled() if flag is None else bool(flag)


def _trace_invariants(world, ro, rd):
    """Checkified invariants of one kernel traversal (see module doc)."""
    from ..ops.math import normalize
    from ..ops.plucker import trace_mxu
    from ..pallas.trace import trace_pallas

    rec, idx = trace_pallas(world, ro, normalize(rd), return_idx=True)
    hit = rec.t < F_MAX

    checkify.check(
        jnp.all(jnp.isfinite(jnp.where(hit, rec.t, 0.0))),
        "kernel returned non-finite hit distance",
    )
    checkify.check(
        jnp.all(jnp.where(hit, rec.t, 0.0) >= -EPS),
        "kernel accepted a hit below the -EPSILON floor (Renderer.cpp:201)",
    )
    n_tris = world.valid.shape[0]
    checkify.check(
        jnp.all((idx >= 0) & (idx < n_tris)),
        "kernel hit index out of range",
    )
    checkify.check(
        jnp.all(jnp.where(hit, world.valid[idx], 1.0) > 0.0),
        "kernel accepted a padding (invalid) triangle — the IEEE "
        "inf/NaN-rejection reasoning no longer holds",
    )
    # cross-engine agreement: the MXU engine always carries the explicit
    # parallel mask; per-ray distances must match to fp tolerance
    ref = trace_mxu(world, ro, rd)
    scale = jnp.maximum(jnp.max(jnp.where(hit, rec.t, 0.0)), 1.0)
    both_hit = hit & (ref.t < F_MAX)
    checkify.check(
        jnp.all(jnp.where(both_hit, jnp.abs(rec.t - ref.t), 0.0) <= 1e-4 * scale),
        "kernel hit distances diverge from the explicitly-masked MXU engine",
    )
    checkify.check(
        jnp.all(hit == (ref.t < F_MAX)),
        "kernel hit/miss classification diverges from the MXU engine",
    )
    return rec


def checked_trace(world, ro, rd):
    """Run one traversal with the invariants above; raises on violation.

    Returns the HitRecord.  Intended for debug-mode spot checks (the
    Renderer facade validates a slice of primary rays per render when
    ``PTAP_DEBUG=1``).
    """
    err, rec = checkify.checkify(_trace_invariants)(world, ro, rd)
    err.throw()
    return rec
