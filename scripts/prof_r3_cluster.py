"""Round-3 bake experiment: does kd-median clustering + fat-triangle
subdivision tighten per-ray block reach vs the Morton sort?

Runs on CPU (numpy clustering + mxu-engine wavefronts at reduced res).
"""
import sys

sys.path.insert(0, "/root/repo")

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=1"
).strip()
import jax

jax.config.update("jax_platforms", "cpu")

import functools

import jax.numpy as jnp
import numpy as np

print = functools.partial(print, flush=True)

from pathtracerap_tpu.config import RenderConfig
from pathtracerap_tpu.ops.math import normalize
from pathtracerap_tpu.ops.plucker import bake_world_triangles, trace_mxu
from pathtracerap_tpu.ops.rng import tile_uniforms
from pathtracerap_tpu.render.camera import generate_rays
from pathtracerap_tpu.render.shade import RayState, shade
from pathtracerap_tpu.scene.build import build_reference_scene

F_MAX = 3.402823e38

scene = build_reference_scene().to_device()
world = jax.jit(bake_world_triangles)(scene)
cfg = RenderConfig(resolution=(250, 200), samples_per_pixel=1, max_bounces=5)
ro, rd = generate_rays(cfg.camera, cfg.resolution)
key = jax.random.PRNGKey(0)

# raw world triangles (valid only)
valid = np.asarray(world.valid) > 0
a = np.asarray(world.v0)[valid]
b = (np.asarray(world.v0) + np.asarray(world.e1))[valid]
c = (np.asarray(world.v0) + np.asarray(world.e2))[valid]
print("valid tris:", a.shape[0])


def subdivide(a, b, c, max_diag):
    """Recursively 4-split triangles whose AABB diagonal exceeds max_diag."""
    tris = np.stack([a, b, c], axis=1)  # (T, 3, 3)
    out = []
    stack = [tris]
    while stack:
        t = stack.pop()
        lo = t.min(axis=1)
        hi = t.max(axis=1)
        d = np.linalg.norm(hi - lo, axis=1)
        big = d > max_diag
        out.append(t[~big])
        tb = t[big]
        if tb.shape[0]:
            A, B, C = tb[:, 0], tb[:, 1], tb[:, 2]
            AB, BC, CA = (A + B) / 2, (B + C) / 2, (C + A) / 2
            stack.append(np.stack([A, AB, CA], axis=1))
            stack.append(np.stack([AB, B, BC], axis=1))
            stack.append(np.stack([CA, BC, C], axis=1))
            stack.append(np.stack([AB, BC, CA], axis=1))
    t = np.concatenate(out, axis=0)
    return t[:, 0], t[:, 1], t[:, 2]


def kd_order(a, b, c, leaf):
    """Balanced kd median-split order; returns permutation of tris."""
    cent = (a + b + c) / 3.0
    idx = np.arange(cent.shape[0])
    out = []

    def rec(ids):
        if ids.shape[0] <= leaf:
            out.append(ids)
            return
        p = cent[ids]
        ax = np.argmax(p.max(axis=0) - p.min(axis=0))
        med = ids[np.argsort(p[:, ax], kind="stable")]
        h = (med.shape[0] + 1) // 2
        # round half to leaf multiples so blocks do not straddle leaves
        h = max(leaf, (h // leaf) * leaf) if med.shape[0] > leaf else h
        rec(med[:h])
        rec(med[h:])

    rec(idx)
    return np.concatenate(out)


def block_aabbs_from(a, b, c, tb):
    t = a.shape[0]
    pad = (-t) % tb
    lo = np.minimum(np.minimum(a, b), c)
    hi = np.maximum(np.maximum(a, b), c)
    lo = np.concatenate([lo, np.full((pad, 3), F_MAX, np.float32)])
    hi = np.concatenate([hi, np.full((pad, 3), -F_MAX, np.float32)])
    return (lo.reshape(-1, tb, 3).min(axis=1), hi.reshape(-1, tb, 3).max(axis=1))


def ray_stats(o, d_n, alive, hit_t, bm, bM, margin=0.01):
    o = np.asarray(o); d_n = np.asarray(d_n)
    small = np.abs(d_n) < 1e-12
    inv_d = 1.0 / np.where(small, np.where(d_n < 0, -1e-12, 1e-12), d_n)
    lo = (bm[None] - o[:, None]) * inv_d[:, None]
    hi = (bM[None] - o[:, None]) * inv_d[:, None]
    tmin = np.minimum(lo, hi).max(axis=-1)
    tmax = np.maximum(lo, hi).min(axis=-1)
    reach = (tmax >= -margin) & (tmin <= tmax + margin) & alive[:, None]
    prune = reach & (tmin - margin <= hit_t[:, None])
    nlive = max(int(alive.sum()), 1)
    return reach.sum() / nlive, prune.sum() / nlive


VARIANTS = {}
# current: morton order as baked (use world arrays in baked order)
VARIANTS["morton(asbaked)"] = (a, b, c, None)
for leaf in (128, 512):
    p = kd_order(a, b, c, leaf)
    VARIANTS[f"kd{leaf}"] = (a[p], b[p], c[p], None)
# subdivision at 20% / 10% of scene diag + kd
lo_s = a.min(axis=0); hi_s = a.max(axis=0)
diag = np.linalg.norm(hi_s - lo_s)
for frac in (0.2, 0.1):
    sa, sb, sc = subdivide(a, b, c, frac * diag)
    for leaf in (128, 512):
        p = kd_order(sa, sb, sc, leaf)
        VARIANTS[f"split{frac}+kd{leaf}"] = (sa[p], sb[p], sc[p], None)
    print(f"split{frac}: {sa.shape[0]} tris")

# wavefront walk (mxu engine, CPU)
state = RayState.primary(ro, normalize(rd), cfg.max_bounces)
for bounce in range(cfg.max_bounces):
    alive = np.asarray(state.remaining > 0)
    hits = trace_mxu(world, state.orig, state.dir)
    ht = np.asarray(hits.t)
    o = np.asarray(state.orig)
    d_n = np.asarray(normalize(state.dir))
    print(f"bounce {bounce} live={alive.mean():.3f}")
    for name, (va, vb, vc, _) in VARIANTS.items():
        for tb in (128, 512):
            bm, bM = block_aabbs_from(va, vb, vc, tb)
            rr, rp = ray_stats(o, d_n, alive, ht, bm, bM)
            print(f"   {name:18s} TB{tb}: reach={rr:6.2f} ({rr*tb:7.0f} tris) "
                  f"pruned={rp:6.2f} ({rp*tb:7.0f} tris) nb={bm.shape[0]}")
    u = tile_uniforms(key, 0, cfg.max_bounces - bounce, 0, ro.shape[0])
    state = shade(state, hits, u, parity=True)
