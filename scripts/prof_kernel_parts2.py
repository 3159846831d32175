"""Second round: isolate the 10us/visit fixed cost.

  empty        - kernel does w->out copy only (grid-step floor)
  mm_bf16      - baseline from round 1 (dynamic-slice, K=16)
  mm_k128      - w zero-padded to (R,128), ops stored (128, 4T): real K=128
  mm_unroll    - K=16 but python-unrolled visits (static slices)
  mm_k128_unr  - K=128 + unrolled
  mm_k32       - K padded to 32 only
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
N = 800256
F_MAX = 9999999.0


def make_kernel(variant, K):
    unroll = "unr" in variant or variant == "mm_unroll"

    def kernel(w_ref, ops_ref, out_ref):
        if variant == "empty":
            out_ref[:] = w_ref[:, 0:1]
            return
        w = w_ref[:]

        def body(blk, best):
            cols = pl.ds(pl.multiple_of(blk * (4 * TB), 4 * TB), 4 * TB)
            s = jnp.dot(w.astype(jnp.bfloat16), ops_ref[:, cols].astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
            return jnp.minimum(best, jnp.min(s, axis=1, keepdims=True))

        best = jnp.full((R, 1), F_MAX, jnp.float32)
        if unroll:
            for blk in range(NB):
                s = jnp.dot(
                    w.astype(jnp.bfloat16),
                    ops_ref[:, blk * 4 * TB : (blk + 1) * 4 * TB].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
                best = jnp.minimum(best, jnp.min(s, axis=1, keepdims=True))
        else:
            best = jax.lax.fori_loop(0, NB, body, best)
        out_ref[:] = best

    return kernel


def run(variant, K=16):
    nt = N // R
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (N, K), jnp.float32)
    ops = jax.random.normal(key, (K, 4 * T), jnp.float32)

    f = pl.pallas_call(
        make_kernel(variant, K),
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((R, K), lambda i: (i, 0)),
            pl.BlockSpec((K, 4 * T), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((R, 1), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((N, 1), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )
    g = jax.jit(lambda w: f(w, ops))
    np.asarray(g(w))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(g(w))
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    visits = nt * NB
    print(f"{variant:12s} K={K:3d}: {dt*1e3:7.1f} ms total, "
          f"{dt/visits*1e6:6.2f} us/visit, {dt/nt*1e6:6.1f} us/tile")


run("empty", 16)
run("mm_bf16", 16)
run("mm_k32", 32)
run("mm_k128", 128)
run("mm_unroll", 16)
run("mm_k128_unr", 128)
