import time, jax, jax.numpy as jnp, numpy as np
import pathtracerap_tpu.pallas.trace as PT
from pathtracerap_tpu.scene.build import build_reference_scene
from pathtracerap_tpu.ops.plucker import bake_world_triangles
from pathtracerap_tpu.render.camera import generate_rays
from pathtracerap_tpu.config import CameraConfig
from pathtracerap_tpu.utils.profiling import enable_compile_cache
enable_compile_cache()
scene = build_reference_scene().to_device()
world = jax.jit(bake_world_triangles)(scene)
ro, rd = generate_rays(CameraConfig(), (1000, 800))
N = ro.shape[0]

def bench(name, fn, *args, reps=5):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps): out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name}: {dt*1e3:.1f} ms -> {N/dt/1e6:.1f} Mrays/s")
    return out

from functools import partial
def tr(prec):
    def f(ro, rd):
        from pathtracerap_tpu.ops.math import normalize
        rd_n = normalize(rd)
        pad = (-N) % 512
        ro_p = jnp.pad(ro, ((0,pad),(0,0))); rd_p = jnp.pad(rd_n, ((0,pad),(0,0)), constant_values=1.0)
        al = jnp.ones((ro_p.shape[0],1), jnp.float32)
        m = jnp.cross(ro_p, rd_p)
        w = jnp.concatenate([rd_p, m, jnp.zeros((ro_p.shape[0],2))], -1)
        wo = jnp.concatenate([ro_p, jnp.full((ro_p.shape[0],1),-1.0), al, jnp.zeros((ro_p.shape[0],3))], -1)
        bl = PT._tile_block_lists(world.block_aabb, ro_p, rd_p, al, 512)
        return PT.nearest_hit_blocked(w, wo, world.edge_blocks, world.plane_blocks, world.block_aabb, bl, 512, precision=prec)
    return jax.jit(f)

hi = bench("HIGHEST", tr(jax.lax.Precision.HIGHEST), ro, rd)
h3 = bench("HIGH(bf16x3)", tr(jax.lax.Precision.HIGH), ro, rd)
d1 = bench("DEFAULT(bf16)", tr(jax.lax.Precision.DEFAULT), ro, rd)
t0, t3, t1 = np.asarray(hi[0]), np.asarray(h3[0]), np.asarray(d1[0])
i0, i3, i1 = np.asarray(hi[1]), np.asarray(h3[1]), np.asarray(d1[1])
print("HIGH   : idx mismatch", (i0!=i3).mean(), "t absdiff p99.9", np.percentile(np.abs(t0-t3),99.9), "max", np.abs(t0-t3).max())
print("DEFAULT: idx mismatch", (i0!=i1).mean(), "t absdiff p99.9", np.percentile(np.abs(t0-t1),99.9), "max", np.abs(t0-t1).max())
