"""r5: quantify tile coherence per sort key — mean sub-block worklist
entries per live tile on REAL secondary wavefronts (reference scene).

For each bounce b of one sample, sorts the wavefront with each key and
reports: live tiles, mean/max sub-list entries per live tile, implied
candidate triangles per ray, and the per-ray slab floor for comparison.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/prof_r5_keyvisits.py
"""

import functools
import sys

import numpy as np

print = functools.partial(print, flush=True)


def main():
    import os

    import jax
    import jax.numpy as jnp

    from pathtracerap_tpu.config import RenderConfig
    from pathtracerap_tpu.ops.plucker import bake_world_triangles
    import pathtracerap_tpu.pallas.megakernel as MK
    from pathtracerap_tpu.pallas.trace import (
        _slab_margin,
        _tile_block_lists,
        trace_pallas,
    )
    from pathtracerap_tpu.render.camera import generate_rays
    from pathtracerap_tpu.render.shade import RayState, shade
    from pathtracerap_tpu.scene.build import build_reference_scene
    from pathtracerap_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()

    resolution = (1000, 800)
    max_bounces = 5
    ray_tile = 512
    N = 64 * MK.RNG_TILE  # first slab, like render_accumulate

    scene = build_reference_scene().to_device()
    world = jax.jit(bake_world_triangles)(scene)
    margin = _slab_margin(world.block_aabb)
    ro, rd = generate_rays(RenderConfig().camera, resolution)
    ro, rd = ro[:N], rd[:N]
    rd_n = rd / jnp.linalg.norm(rd, axis=1, keepdims=True)
    key = jax.random.PRNGKey(0)

    hits0 = jax.jit(lambda: trace_pallas(world, ro, rd_n))()
    u_all = jax.jit(
        lambda: MK.chunk_uniforms(key, 0, max_bounces, N, N, 0)
    )()
    lo, hi = MK.scene_morton_bounds(world.block_aabb)
    nsb = world.sub_aabb.shape[0]
    nt = N // ray_tile
    print(f"N={N} nsb={nsb} tiles={nt}")

    def keys_for(pack, mode):
        old = MK.SORT_KEY
        MK.SORT_KEY = mode
        try:
            return MK._sort_keys(pack, lo, hi, world=world, margin=margin)
        finally:
            MK.SORT_KEY = old

    @jax.jit
    def advance(pack, u_b):
        return MK._bounce_call(world, margin, pack, u_b, True, ray_tile)

    @jax.jit
    def stats_for(pack_sorted):
        orig = pack_sorted[:, 0:3]
        d = pack_sorted[:, 3:6]
        d_n = d * jax.lax.rsqrt(
            jnp.maximum(jnp.sum(d * d, axis=1, keepdims=True), 1e-30))
        alive_f = (pack_sorted[:, 9:10] > 0.0).astype(jnp.float32)
        lists = _tile_block_lists(world.sub_aabb, orig, d_n, alive_f,
                                  ray_tile, margin)
        nlive_t = jnp.sum(alive_f.reshape(nt, ray_tile), axis=1)
        live_tile = nlive_t > 0
        entries = jnp.sum(lists >= 0, axis=1).astype(jnp.float32)
        mean_e = jnp.sum(jnp.where(live_tile, entries, 0.0)) / jnp.maximum(
            jnp.sum(live_tile), 1)
        max_e = jnp.max(jnp.where(live_tile, entries, 0.0))
        # per-ray slab floor on the same wavefront
        sa = world.sub_aabb
        small = jnp.abs(d_n) < 1e-12
        inv_d = 1.0 / jnp.where(small, jnp.where(d_n < 0, -1e-12, 1e-12), d_n)
        blo = (sa[None, :, 0:3] - orig[:, None, :]) * inv_d[:, None, :]
        bhi = (sa[None, :, 3:6] - orig[:, None, :]) * inv_d[:, None, :]
        tmin = jnp.max(jnp.minimum(blo, bhi), axis=-1)
        tmax = jnp.min(jnp.maximum(blo, bhi), axis=-1)
        hitm = (tmax >= -margin) & (tmin <= tmax + margin) & (alive_f > 0)
        per_ray = jnp.sum(hitm, axis=1).astype(jnp.float32)
        nlive = jnp.maximum(jnp.sum(alive_f), 1.0)
        return (mean_e, max_e, jnp.sum(live_tile), jnp.sum(per_ray) / nlive,
                jnp.sum(alive_f))

    # build the true wavefront bounce by bounce (oct21 dynamics — the
    # trajectory itself is key-independent since images are identical)
    state = RayState.primary(ro, rd_n, max_bounces)
    state = jax.jit(lambda s, h, u: shade(s, h, u, parity=True))(
        state, hits0, u_all[:, 0:4])
    pack = jnp.concatenate(
        [state.orig, state.dir, state.color,
         state.remaining.astype(jnp.float32)[:, None]], axis=1)

    for b in range(1, max_bounces):
        u_b = u_all[:, 4 * b: 4 * b + 4]
        for mode in ("oct21", "nearest"):
            k = keys_for(pack, mode)
            perm = jnp.argsort(k, stable=True)
            ps = pack[perm]
            me, mx, lt, pr, nl = [float(x) for x in stats_for(ps)]
            print(f"bounce {b} {mode:8s}: live={int(nl):7d} "
                  f"live_tiles={int(lt):5d} mean_sublists/tile={me:6.2f} "
                  f"max={int(mx):3d} per_ray_floor={pr:5.2f} "
                  f"cands/ray={me * MK.SUB_BLOCK:7.0f}")
        # advance with the shipped key ordering (restore original order)
        k = keys_for(pack, "oct21")
        perm = jnp.argsort(k, stable=True)
        pix = jnp.arange(N, dtype=jnp.int32)[perm]
        ps = advance(pack[perm], u_all[:, 4 * b: 4 * b + 4][pix])
        pack = ps[jnp.argsort(pix)]


if __name__ == "__main__":
    main()
