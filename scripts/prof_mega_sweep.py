"""Sweep megakernel ray_tile + isolate the per-grid-step overhead source."""
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

from pathtracerap_tpu.config import RenderConfig
from pathtracerap_tpu.ops.plucker import bake_world_triangles
from pathtracerap_tpu.pallas import megakernel as MK
from pathtracerap_tpu.render.camera import generate_rays
from pathtracerap_tpu.scene.build import build_reference_scene
from pathtracerap_tpu.utils.profiling import enable_compile_cache

enable_compile_cache()

N = 800256
R = 512


def empty_variant(with_ops: bool):
    def kernel(*refs):
        w_ref, out_ref = refs[0], refs[-1]
        out_ref[:] = w_ref[:, 0:1]

    nt = N // R
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (N, 16), jnp.float32)
    ops = jax.random.normal(key, (16, 16384), jnp.float32)
    in_specs = [pl.BlockSpec((R, 16), lambda i: (i, 0))]
    args = [w]
    if with_ops:
        in_specs.append(pl.BlockSpec((16, 16384), lambda i: (0, 0)))
        args.append(ops)
    f = pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((R, 1), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((N, 1), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )
    g = jax.jit(lambda *a: f(*a))
    np.asarray(g(*args))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(g(*args))
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    print(f"empty with_ops={with_ops}: {dt*1e3:7.1f} ms, {dt/nt*1e6:6.1f} us/step")


empty_variant(True)
empty_variant(False)

scene = build_reference_scene().to_device()
world = jax.jit(bake_world_triangles)(scene)
cfg = RenderConfig(resolution=(1000, 800), samples_per_pixel=1, max_bounces=5)
ro, rd = generate_rays(cfg.camera, cfg.resolution)
key = jax.random.PRNGKey(0)
n = ro.shape[0]

for ray_tile in [1024, 2048, 4096]:
    f = jax.jit(lambda: MK.render_samples_fused(
        world, ro, rd, key, n_samples=1, max_bounces=5, ray_tile=ray_tile))
    try:
        np.asarray(f())
    except Exception as e:
        print(f"ray_tile={ray_tile}: FAILED {type(e).__name__}: {str(e)[:160]}")
        continue
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(f())
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    print(f"megakernel ray_tile={ray_tile}: {dt*1e3:7.1f} ms/sample "
          f"-> {n*5/dt/1e6:6.1f} Mrays/s counted")

# XLA mxu engine for comparison
from pathtracerap_tpu.ops.plucker import trace_mxu

fm = jax.jit(lambda ro, rd: trace_mxu(world, ro, rd).t)
np.asarray(fm(ro, rd))
ts = []
for _ in range(3):
    t0 = time.perf_counter()
    np.asarray(fm(ro, rd))
    ts.append(time.perf_counter() - t0)
print(f"trace_mxu 800k rays (1 bounce-equiv): {min(ts)*1e3:7.1f} ms")
