"""r4: decompose the binned engine's 74 ms/bounce sort+permute cost.

Variants at the reference wavefront size (800256 rays, 16-col f32 pack):
  argsort_global   - jnp.argsort of the i32 keys, full wavefront
  gather_global    - pack[perm] + pix[perm] with a precomputed perm
  sort_gather      - both (the engine's actual per-bounce cost)
  argsort_seg      - per-8192-ray-slab argsort (vmapped)
  gather_seg       - per-slab take_along_axis
  keys_only        - _sort_keys compute alone
  counting_octant  - 8-bucket stable counting sort (cumsum + scatter rows)
"""
import sys

sys.path.insert(0, "/root/repo")

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

print = functools.partial(print, flush=True)

from pathtracerap_tpu.pallas import megakernel as MK
from pathtracerap_tpu.utils.profiling import enable_compile_cache

enable_compile_cache()

N = 786432  # 96 x 8192 (segmented variants need SEG-divisible N)
SEG = 8192
key = jax.random.PRNGKey(0)
pack = jax.random.normal(key, (N, 16), jnp.float32)
pack = pack.at[:, 9].set((jax.random.uniform(key, (N,)) > 0.3).astype(jnp.float32))
lo = jnp.zeros((3,), jnp.float32)
hi = jnp.ones((3,), jnp.float32) * 400.0
keys = MK._sort_keys(pack, lo, hi)
perm = jnp.argsort(keys, stable=True)
pix = jnp.arange(N, dtype=jnp.int32)

REP = 10


def timeit(name, body):
    # IMPORTANT: the loop result is reduced to ONE scalar before fetching —
    # returning the (N, 16) pack costs ~1.5 s of host transfer through the
    # axon tunnel per call, which silently dominated the r4 first-cut
    # numbers (and prof_r4_binned's sort_only/kernel_only rows).
    def loop():
        def f(i, c):
            return body(c)
        out = jax.lax.fori_loop(0, REP, f, pack)
        return jnp.sum(out[:, 0])

    g = jax.jit(loop)
    np.asarray(g())
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(g())
        ts.append(time.perf_counter() - t0)
    print(f"{name:16s}: {min(ts)/REP*1e3:7.2f} ms/bounce")


timeit("keys_only", lambda p: p.at[:, 15].set(
    MK._sort_keys(p, lo, hi).astype(jnp.float32)))
timeit("argsort_global", lambda p: p.at[:, 15].set(
    jnp.argsort(MK._sort_keys(p, lo, hi), stable=True).astype(jnp.float32)))
timeit("gather_global", lambda p: p[perm])
timeit("sort_gather", lambda p: p[jnp.argsort(MK._sort_keys(p, lo, hi),
                                              stable=True)])


def seg_sort(p):
    k = MK._sort_keys(p, lo, hi).reshape(-1, SEG)
    sperm = jnp.argsort(k, axis=1, stable=True)
    return p.reshape(-1, SEG, 16)[
        jnp.arange(k.shape[0])[:, None], sperm].reshape(-1, 16)


timeit("argsort_seg", lambda p: p.at[:, 15].set(
    jnp.argsort(MK._sort_keys(p, lo, hi).reshape(-1, SEG), axis=1,
                stable=True).reshape(-1).astype(jnp.float32)))
timeit("seg_sort_gather", seg_sort)


def counting_octant(p):
    d = p[:, 3:6]
    alive = p[:, 9] > 0.0
    oct_ = ((d[:, 0] < 0).astype(jnp.int32) * 4
            + (d[:, 1] < 0).astype(jnp.int32) * 2
            + (d[:, 2] < 0).astype(jnp.int32))
    oct_ = jnp.where(alive, oct_, 8)
    onehot = jax.nn.one_hot(oct_, 9, dtype=jnp.int32)  # (N, 9)
    within = jnp.cumsum(onehot, axis=0) - onehot  # rank within bucket
    base = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(jnp.sum(onehot, axis=0))[:-1]])
    pos = jnp.sum(onehot * (base[None, :] + within), axis=1)
    return jnp.zeros_like(p).at[pos].set(p)


timeit("counting_octant", counting_octant)
