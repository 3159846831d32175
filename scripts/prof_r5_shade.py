"""r5 micro-experiments for the deferred-select design:

1. Cost of an XLA (out-of-kernel) shade pass + 16-col attr row gather at
   800k rays — the candidate replacement for the in-kernel shade+select.
2. Whether integer arithmetic on an in-kernel argmin output lowers under
   Mosaic today (r3 hit "Not implemented: Lane broadcast" there).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/prof_r5_shade.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

print = functools.partial(print, flush=True)

from pathtracerap_tpu.ops.plucker import bake_world_triangles
from pathtracerap_tpu.render.camera import generate_rays
from pathtracerap_tpu.render.shade import RayState, shade
from pathtracerap_tpu.pallas.trace import trace_pallas
from pathtracerap_tpu.scene.build import build_reference_scene
from pathtracerap_tpu.utils.profiling import enable_compile_cache
from pathtracerap_tpu.config import RenderConfig

enable_compile_cache()
scene = build_reference_scene().to_device()
world = jax.jit(bake_world_triangles)(scene)
ro, rd = generate_rays(RenderConfig().camera, (1000, 800))
n_pad = 800 * 1024
ro_p = jnp.pad(ro, ((0, n_pad - ro.shape[0]), (0, 0)))
rd_p = jnp.pad(rd, ((0, n_pad - rd.shape[0]), (0, 0)), constant_values=1.0)
key = jax.random.PRNGKey(0)
hits0 = jax.jit(lambda: trace_pallas(world, ro_p, rd_p))()

REP = 16


def timeit(name, per_rep):
    def loop():
        def f(i, acc):
            return acc + per_rep(i)
        return jax.lax.fori_loop(0, REP, f, jnp.float32(0.0))

    g = jax.jit(loop)
    np.asarray(g())
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(g())
        ts.append(time.perf_counter() - t0)
    print(f"{name:18s}: {min(ts)/REP*1e3:7.2f} ms/rep")


def xla_shade(i):
    u = jax.random.uniform(jax.random.fold_in(key, i), (n_pad, 4))
    state = RayState.primary(ro_p, rd_p, 5)
    s2 = shade(state, hits0, u, parity=True)
    return jnp.sum(s2.color[:, 0]) + jnp.sum(s2.orig[:, 0])


def attr_gather(i):
    # 16-col row gather by winning global column (the deferred select)
    idx = (jnp.arange(n_pad, dtype=jnp.int32) * (i + 7)) % world.attr_rows.shape[1]
    a = world.attr_rows.T[idx]  # (n_pad, 16)
    return jnp.sum(a[:, 0])


def shade_plus_gather(i):
    u = jax.random.uniform(jax.random.fold_in(key, i), (n_pad, 4))
    idx = (jnp.arange(n_pad, dtype=jnp.int32) * (i + 7)) % world.attr_rows.shape[1]
    a = world.attr_rows.T[idx]
    from pathtracerap_tpu.ops.intersect import HitRecord
    rec = HitRecord(
        t=jnp.where(a[:, 10] > 0, 100.0, 3.4e38),
        normal=a[:, 0:3], mat_type=a[:, 3].astype(jnp.int32),
        mat_color=a[:, 4:7], geom_normal=a[:, 7:10],
    )
    state = RayState.primary(ro_p, rd_p, 5)
    s2 = shade(state, rec, u, parity=True)
    return jnp.sum(s2.color[:, 0]) + jnp.sum(s2.orig[:, 0])


timeit("xla_shade", xla_shade)
timeit("attr_gather16", attr_gather)
timeit("shade+gather", shade_plus_gather)

# --- Mosaic lowering check: integer math on an argmin output + SMEM
# scalar broadcast into the vector domain
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def k(bases_ref, x_ref, o_ref):
    am = jnp.argmin(x_ref[:], axis=1).astype(jnp.int32)[:, None]  # (R,1)
    g = am // 128
    local = jax.lax.rem(am, 128)
    b0, b1, b2, b3 = bases_ref[0], bases_ref[1], bases_ref[2], bases_ref[3]
    base = jnp.where(g == 0, b0, jnp.where(g == 1, b1, jnp.where(g == 2, b2, b3)))
    o_ref[:] = base * 128 + local


try:
    x = jax.random.normal(jax.random.PRNGKey(1), (512, 512))
    bases = jnp.asarray([3, 9, 1, 7], jnp.int32)
    out = pl.pallas_call(
        k,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec((512, 512), lambda i, B: (0, 0))],
            out_specs=[pl.BlockSpec((512, 1), lambda i, B: (0, 0))],
        ),
        out_shape=[jax.ShapeDtypeStruct((512, 1), jnp.int32)],
    )(bases, x)[0]
    ref_am = np.argmin(np.asarray(x), axis=1)
    ref = np.asarray(bases)[ref_am // 128] * 128 + ref_am % 128
    ok = (np.asarray(out)[:, 0] == ref).all()
    print(f"argmin-int-math kernel: compiled and {'CORRECT' if ok else 'WRONG'}")
except Exception as e:  # noqa: BLE001
    print(f"argmin-int-math kernel: FAILED to lower: {type(e).__name__}: {e}")
