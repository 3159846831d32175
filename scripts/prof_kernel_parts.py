"""Isolate per-visit costs inside the traversal kernel on the real chip.

Variants (all: grid over 512-ray tiles, fori over 8 block visits):
  mm_bf16    - matmul only, single-pass bf16
  mm_bf16x3  - matmul only, manual 3-pass split
  mm_f32     - matmul only, Mosaic HIGHEST (native fp32)
  accept     - bf16x3 matmul + accept chain + min
  argmin     - ... + argmin + improve/update
  select     - ... + 7-attr one-hot select per visit
"""
import sys

sys.path.insert(0, "/root/repo")

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print = functools.partial(print, flush=True)

R = 512
TB = 512
NB = 8
T = NB * TB
N = 800256  # padded ray count
EPS = 0.005
F_MAX = 9999999.0


def make_kernel(variant):
    def kernel(w_ref, ops_ref, attr_ref, out_ref):
        w = w_ref[:]
        col_iota = jax.lax.broadcasted_iota(jnp.int32, (R, TB), 1)

        def mm(a, b):
            if variant == "mm_f32":
                return jnp.dot(a, b, preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)
            if variant == "mm_bf16":
                return jnp.dot(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                               preferred_element_type=jnp.float32)
            a_hi = a.astype(jnp.bfloat16)
            a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            b_hi = b.astype(jnp.bfloat16)
            b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
            s = dot(a_lo, b_hi)
            s = s + dot(a_hi, b_lo)
            return s + dot(a_hi, b_hi)

        def visit(blk, carry):
            best_t, attrs = carry
            cols = pl.ds(pl.multiple_of(blk * (4 * TB), 4 * TB), 4 * TB)
            s = mm(w, ops_ref[:, cols])
            if variant.startswith("mm_"):
                return (jnp.minimum(best_t, jnp.min(s, axis=1, keepdims=True)),
                        attrs)
            s_ab = s[:, 0:TB]
            s_bc = s[:, TB:2*TB]
            s_ca = s[:, 2*TB:3*TB]
            num2 = s[:, 3*TB:]
            det = s_ab + s_bc + s_ca
            parallel = det == 0.0
            inv_det = 1.0 / jnp.where(parallel, 1.0, det)
            t = num2 * inv_det
            u = s_ca * inv_det
            v = s_ab * inv_det
            accept = (~parallel & (u >= -EPS) & (u <= 1.0 + EPS) & (v >= -EPS)
                      & (u + v <= 1.0 + EPS) & (t >= -EPS))
            t_m = jnp.where(accept, t, F_MAX)
            blk_min = jnp.min(t_m, axis=1, keepdims=True)
            if variant == "accept":
                return jnp.minimum(best_t, blk_min), attrs
            local_arg = jnp.argmin(t_m, axis=1).astype(jnp.int32)[:, None]
            improve = blk_min < best_t
            if variant == "argmin":
                best_t = jnp.where(improve, blk_min, best_t)
                return best_t, jnp.where(improve, local_arg.astype(jnp.float32) + attrs, attrs)
            acols = pl.ds(pl.multiple_of(blk * TB, TB), TB)
            slab = attr_ref[:, acols]
            onehot = (col_iota == local_arg).astype(jnp.float32)
            sel = [jnp.sum(onehot * slab[k:k+1, :], axis=1, keepdims=True)
                   for k in range(7)]
            new_attrs = jnp.concatenate(sel, axis=1)
            return (jnp.where(improve, blk_min, best_t),
                    jnp.where(improve, new_attrs, attrs[:, 0:7]).sum(axis=1, keepdims=True) + attrs * 0)

        na = 1
        best_t, attrs = jax.lax.fori_loop(
            0, NB, visit,
            (jnp.full((R, 1), F_MAX, jnp.float32), jnp.zeros((R, na), jnp.float32)))
        out_ref[:] = best_t + attrs[:, 0:1]

    return kernel


def run(variant):
    nt = N // R
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (N, 16), jnp.float32)
    ops = jax.random.normal(key, (16, 4 * T), jnp.float32)
    attr = jax.random.normal(key, (16, T), jnp.float32)

    f = pl.pallas_call(
        make_kernel(variant),
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((R, 16), lambda i: (i, 0)),
            pl.BlockSpec((16, 4 * T), lambda i: (0, 0)),
            pl.BlockSpec((16, T), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((R, 1), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((N, 1), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )
    g = jax.jit(lambda w: f(w, ops, attr))
    out = g(w)
    np.asarray(out)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(g(w))
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    visits = nt * NB
    print(f"{variant:10s}: {dt*1e3:7.1f} ms total, {dt/visits*1e6:6.2f} us/visit")


for v in ["mm_bf16", "mm_bf16x3", "mm_f32", "accept", "argmin", "select"]:
    run(v)
