"""Round-2 profiling: where does the render time go on the real chip?"""
import sys

sys.path.insert(0, "/root/repo")

import time

import jax
import jax.numpy as jnp
import numpy as np
import functools
print = functools.partial(print, flush=True)

from pathtracerap_tpu.config import RenderConfig
from pathtracerap_tpu.ops.plucker import bake_world_triangles
from pathtracerap_tpu.pallas.trace import trace_pallas, _tile_block_lists, _slab_margin
from pathtracerap_tpu.render.camera import generate_rays
from pathtracerap_tpu.render.wavefront import render_accumulate
from pathtracerap_tpu.scene.build import build_reference_scene
from pathtracerap_tpu.utils.profiling import enable_compile_cache

enable_compile_cache()


def timeit(fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    np.asarray(jax.tree_util.tree_leaves(out)[0])  # force sync through tunnel
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        ts.append(time.perf_counter() - t0)
    return min(ts)


scene = build_reference_scene().to_device()
world = jax.jit(bake_world_triangles)(scene)
print("T padded:", world.valid.shape, "blocks:", world.block_aabb.shape)

cfg = RenderConfig(resolution=(1000, 800), samples_per_pixel=1, max_bounces=5, engine="pallas")
ro, rd = generate_rays(cfg.camera, cfg.resolution)
n = ro.shape[0]
print("rays:", n)

# 1. one full trace (all lanes alive)
f_trace = jax.jit(lambda ro, rd: trace_pallas(world, ro, rd).t)
dt = timeit(f_trace, ro, rd)
print(f"trace_pallas 800k rays: {dt*1e3:.2f} ms -> {n/dt/1e6:.1f} Mray-traces/s")

# 2. worklist build alone
margin = _slab_margin(world.block_aabb)
alive = jnp.ones((n, 1), jnp.float32)
f_wl = jax.jit(lambda ro, rd: _tile_block_lists(world.block_aabb, ro, rd, alive, 512, margin))
dt_wl = timeit(f_wl, ro, rd)
print(f"_tile_block_lists:      {dt_wl*1e3:.2f} ms")

# block visit stats: how many blocks does the avg tile visit?
bl = np.asarray(f_wl(ro, rd))
print("mean blocks/tile in worklist:", (bl >= 0).sum(axis=1).mean())

# 3. full render, 1 spp / 5 bounces
key = jax.random.PRNGKey(0)
f_rend = lambda: render_accumulate(
    scene, key, cfg.camera, cfg.resolution, n_samples=1, max_bounces=5,
    engine="pallas", parity=True, world=world)
dt_r = timeit(f_rend, n=3)
rays = n * 5
print(f"render 1spp/5b: {dt_r*1e3:.2f} ms -> {rays/dt_r/1e6:.1f} Mrays/s (counted)")
print(f"  5x trace alone would be {5*dt*1e3:.2f} ms")

# 4. MXU precision ratio microbench (shapes like the fused kernel visit)
a = jax.random.normal(jax.random.PRNGKey(1), (8192, 16), jnp.float32)
b = jax.random.normal(jax.random.PRNGKey(2), (16, 16384), jnp.float32)
for prec in ["DEFAULT", "HIGH", "HIGHEST"]:
    f = jax.jit(lambda a, b, p=prec: jnp.dot(a, b, precision=getattr(jax.lax.Precision, p),
                                             preferred_element_type=jnp.float32))
    d = timeit(f, a, b, n=10)
    print(f"xla dot (8192,16)@(16,16384) {prec}: {d*1e3:.3f} ms")
