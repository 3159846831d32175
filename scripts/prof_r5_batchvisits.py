"""r5: tile-union worklist lengths for SAMPLE-BATCHED wavefronts.

Builds S samples' real bounce-b wavefronts (reference scene), sorts them
together, and reports mean sub-block worklist entries per live tile vs
the single-sample wavefront — the measured mechanism behind
PTAP_BINNED_SAMPLE_BATCH.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/prof_r5_batchvisits.py [S]
"""

import functools
import sys

import numpy as np

print = functools.partial(print, flush=True)


def main():
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
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    slab_tiles = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    resolution = (1000, 800)
    max_bounces = 5
    ray_tile = 512
    N = slab_tiles * MK.RNG_TILE

    scene = build_reference_scene().to_device()
    world = jax.jit(bake_world_triangles)(scene)
    margin = _slab_margin(world.block_aabb)
    ro, rd = generate_rays(RenderConfig().camera, resolution)
    ro, rd = ro[:N], rd[:N]
    rd_n = rd / jnp.linalg.norm(rd, axis=1, keepdims=True)
    key = jax.random.PRNGKey(0)
    hits0 = jax.jit(lambda: trace_pallas(world, ro, rd_n))()
    lo, hi = MK.scene_morton_bounds(world.block_aabb)
    nsb = world.sub_aabb.shape[0]

    @jax.jit
    def advance(pack, u_b):
        return MK._bounce_call(world, margin, pack, u_b, True, ray_tile)

    def stats_for(pack_sorted):
        n_all = pack_sorted.shape[0]
        nt = n_all // ray_tile
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
        return float(mean_e), int(jnp.sum(live_tile)), int(jnp.sum(alive_f))

    # per-sample wavefronts at each bounce
    packs = []
    for s in range(S):
        u_all = jax.jit(
            lambda s=s: MK.chunk_uniforms(key, s, max_bounces, N, N, 0))()
        state = RayState.primary(ro, rd_n, max_bounces)
        state = jax.jit(lambda st, h, u: shade(st, h, u, parity=True))(
            state, hits0, u_all[:, 0:4])
        pack = jnp.concatenate(
            [state.orig, state.dir, state.color,
             state.remaining.astype(jnp.float32)[:, None]], axis=1)
        packs.append((pack, u_all))

    for b in range(1, max_bounces):
        # single-sample stat (sample 0)
        p0 = packs[0][0]
        k0 = MK._sort_keys(p0, lo, hi)
        me1, lt1, nl1 = stats_for(p0[jnp.argsort(k0, stable=True)])
        big = jnp.concatenate([p for p, _ in packs], axis=0)
        kb = MK._sort_keys(big, lo, hi)
        meS, ltS, nlS = stats_for(big[jnp.argsort(kb, stable=True)])
        print(f"bounce {b}: 1-sample mean_sublists/tile={me1:6.2f} "
              f"(tiles={lt1}) | {S}-sample={meS:6.2f} (tiles={ltS}) "
              f"cands/ray {me1 * MK.SUB_BLOCK:6.0f} -> {meS * MK.SUB_BLOCK:6.0f}")
        # advance each sample one bounce, restoring original ray order so
        # the per-bounce uniform indexing stays aligned
        nxt = []
        for p, u in packs:
            perm = jnp.argsort(MK._sort_keys(p, lo, hi), stable=True)
            adv = advance(p[perm], u[:, 4 * b: 4 * b + 4][perm])
            nxt.append((adv[jnp.argsort(perm)], u))
        packs = nxt


if __name__ == "__main__":
    main()
