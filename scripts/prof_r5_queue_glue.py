"""r5: cost the per-bounce GLUE of a per-block ray-queue engine (VERDICT
r4 item 1) before building it.

Scheme being costed (per bounce, per 512k-ray slab):
  1. per-ray slab test vs world.sub_aabb -> hit mask (N, nsb)
  2. per-ray K-truncated lists + per-block ranks (cumsums)
  3. scatter ray ids into 512-padded per-block queue segments (N*K updates)
  4. gather pair state rows (PAIR_CAP, 8)
  5. after the kernel: two scatter-mins (t, then tie-break gcol) back to rays

Wavefront realism: origins are random points in the scene bounds with
random unit directions (an upper bound on secondary-bounce incoherence;
primaries are also measured for the coherent end).

Usage: python scripts/prof_r5_queue_glue.py [N] [K]
"""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

print = functools.partial(print, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from pathtracerap_tpu.config import RenderConfig
    from pathtracerap_tpu.ops.plucker import bake_world_triangles
    from pathtracerap_tpu.pallas.trace import _slab_margin
    from pathtracerap_tpu.render.camera import generate_rays
    from pathtracerap_tpu.scene.build import build_reference_scene
    from pathtracerap_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 524288
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    C = 512

    scene = build_reference_scene().to_device()
    world = jax.jit(bake_world_triangles)(scene)
    sub_aabb = world.sub_aabb
    nsb = sub_aabb.shape[0]
    margin = float(_slab_margin(world.block_aabb))
    PAIR_CAP = ((4 * N + nsb * C) // C) * C
    C_CAP = PAIR_CAP // C
    print(f"N={N} nsb={nsb} K={K} PAIR_CAP={PAIR_CAP} chunks={C_CAP}")

    # incoherent wavefront: random origins in the finite scene bounds,
    # random unit directions
    finite = np.abs(np.asarray(sub_aabb[:, 0:6])) < 1e30
    sa = np.asarray(sub_aabb[:, 0:6])
    lo_w = np.nanmin(np.where(finite[:, 0:3], sa[:, 0:3], np.nan), axis=0)
    hi_w = np.nanmax(np.where(finite[:, 3:6], sa[:, 3:6], np.nan), axis=0)
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    orig_i = jax.random.uniform(k1, (N, 3)) * (hi_w - lo_w) + lo_w
    d = jax.random.normal(k2, (N, 3))
    dir_i = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    alive = (jax.random.uniform(k3, (N,)) < 0.6).astype(jnp.float32)

    ro, rd = generate_rays(RenderConfig().camera, (1000, 800))
    orig_c = ro[:N]
    dir_c = rd[:N] / jnp.linalg.norm(rd[:N], axis=1, keepdims=True)

    bmin = sub_aabb[:, 0:3]
    bmax = sub_aabb[:, 3:6]
    BIG = jnp.int32(2**30)

    def mask_of(orig, d_n, alive_f):
        small = jnp.abs(d_n) < 1e-12
        inv_d = 1.0 / jnp.where(small, jnp.where(d_n < 0.0, -1e-12, 1e-12), d_n)
        lo = (bmin[None, :, :] - orig[:, None, :]) * inv_d[:, None, :]
        hi = (bmax[None, :, :] - orig[:, None, :]) * inv_d[:, None, :]
        tmin = jnp.max(jnp.minimum(lo, hi), axis=-1)
        tmax = jnp.min(jnp.maximum(lo, hi), axis=-1)
        return (tmax >= -margin) & (tmin <= tmax + margin) & (alive_f[:, None] > 0.0)

    def build(orig, d_n, alive_f):
        hit = mask_of(orig, d_n, alive_f)
        hi32 = hit.astype(jnp.int32)
        rk1 = jnp.cumsum(hi32, axis=1)
        kept = hit & (rk1 <= K)
        k32 = kept.astype(jnp.int32)
        cs0 = jnp.cumsum(k32, axis=0)
        rank0 = cs0 - k32
        cnt = cs0[-1]
        padded = ((cnt + C - 1) // C) * C
        ends = jnp.cumsum(padded)
        offs = ends - padded
        keys = jnp.where(kept, jax.lax.broadcasted_iota(jnp.int32, kept.shape, 1), BIG)
        lists = jnp.sort(keys, axis=1)[:, :K]
        valid = lists < BIG
        lsafe = jnp.where(valid, lists, 0)
        rank_k = jnp.take_along_axis(rank0, lsafe, axis=1)
        slot = jnp.where(valid, offs[lsafe] + rank_k, PAIR_CAP)
        return slot, ends, offs, cnt

    def scatter_q(slot):
        rid = jnp.broadcast_to(
            jnp.arange(N, dtype=jnp.int32)[:, None], slot.shape)
        return jnp.full((PAIR_CAP,), N, jnp.int32).at[slot.ravel()].set(
            rid.ravel(), mode="drop", unique_indices=True)

    def gather_pairs(qr, orig, d_n):
        st = jnp.concatenate(
            [orig, d_n, jnp.zeros((N, 2), jnp.float32)], axis=1)
        st = jnp.concatenate(
            [st, jnp.full((1, 8), 0.5, jnp.float32)], axis=0)
        return st[qr]

    def reduce_back(qr, t_pair, g_pair):
        t_best = jnp.full((N + 1,), 1e30, jnp.float32).at[qr].min(t_pair)
        tb = t_best[qr]
        g_c = jnp.where((t_pair == tb) & (t_pair < 1e30), g_pair, BIG)
        g_best = jnp.full((N + 1,), BIG, jnp.int32).at[qr].min(g_c)
        return t_best[:N], g_best[:N]

    # one-time stats
    for nm, (o, dd, al) in (
        ("incoherent", (orig_i, dir_i, alive)),
        ("primaries", (orig_c, dir_c, jnp.ones((N,), jnp.float32))),
    ):
        hit = mask_of(o, dd, al)
        h = jnp.sum(hit, axis=1)
        slot, ends, offs, cnt = build(o, dd, al)
        pairs = int(jnp.sum(jnp.minimum(h, K)))
        print(f"[{nm}] pairs={pairs} ({pairs/N:.2f}/ray) "
              f"mean_hits_live={float(jnp.sum(h)/jnp.maximum(jnp.sum(al if nm=='incoherent' else 1.0*(h>=0)),1)):.2f} "
              f"over_K={int(jnp.sum(h > K))} "
              f"used_chunks={int(ends[-1])//C}/{C_CAP} "
              f"dropped={int(jnp.sum((slot < PAIR_CAP) & (slot >= PAIR_CAP)))}")

    REP = 10

    def timeit(name, body):
        def loop():
            def f(i, c):
                return body(c)
            out = jax.lax.fori_loop(0, REP, f, orig_i)
            return jnp.sum(out[:, 0])
        g = jax.jit(loop)
        np.asarray(g())
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(g())
            ts.append(time.perf_counter() - t0)
        print(f"{name:16s}: {min(ts)/REP*1e3:7.2f} ms/bounce")

    def perturb(o):
        # data-dependence so the loop body isn't hoisted
        return o + 1e-7

    timeit("mask_only", lambda o: perturb(
        o.at[:, 0].add(jnp.sum(mask_of(o, dir_i, alive), axis=1) * 0.0)))

    def build_body(o):
        slot, ends, offs, cnt = build(o, dir_i, alive)
        return perturb(o.at[:, 0].add(slot[:, 0].astype(jnp.float32) * 0.0))

    timeit("build_lists", build_body)

    def scatter_body(o):
        slot, *_ = build(o, dir_i, alive)
        qr = scatter_q(slot)
        return perturb(o.at[:, 0].add(qr[:N].astype(jnp.float32) * 0.0))

    timeit("build+scatter", scatter_body)

    def gather_body(o):
        slot, *_ = build(o, dir_i, alive)
        qr = scatter_q(slot)
        pr = gather_pairs(qr, o, dir_i)
        return perturb(o.at[:, 0].add(
            jax.lax.dynamic_slice(pr[:, 0], (0,), (N,)) * 0.0))

    timeit("+pair_gather", gather_body)

    def full_body(o):
        slot, *_ = build(o, dir_i, alive)
        qr = scatter_q(slot)
        pr = gather_pairs(qr, o, dir_i)
        # stand-in kernel outputs
        t_pair = pr[:, 0] + pr[:, 3]
        g_pair = (pr[:, 1] * 100.0).astype(jnp.int32)
        t_b, g_b = reduce_back(qr, t_pair, g_pair)
        return perturb(o.at[:, 0].add(t_b * 0.0 + g_b.astype(jnp.float32) * 0.0))

    timeit("full_glue", full_body)

    # ---- decomposition of build_lists ----
    def cumsum0_body(o):
        hit = mask_of(o, dir_i, alive)
        cs0 = jnp.cumsum(hit.astype(jnp.int32), axis=0)
        return perturb(o.at[:, 0].add(cs0[:, 0].astype(jnp.float32) * 0.0))

    timeit("mask+cumsum0", cumsum0_body)

    def cumsum0_2level(o):
        hit = mask_of(o, dir_i, alive)
        k32 = hit.astype(jnp.int32).reshape(-1, 512, nsb)
        within = jnp.cumsum(k32, axis=1)
        base = jnp.cumsum(within[:, -1, :], axis=0) - within[:, -1, :]
        cs0 = (within + base[:, None, :]).reshape(-1, nsb)
        return perturb(o.at[:, 0].add(cs0[:, 0].astype(jnp.float32) * 0.0))

    timeit("mask+cumsum0_2l", cumsum0_2level)

    def rowsort_body(o):
        hit = mask_of(o, dir_i, alive)
        keys = jnp.where(
            hit, jax.lax.broadcasted_iota(jnp.int32, hit.shape, 1), BIG)
        lists = jnp.sort(keys, axis=1)[:, :K]
        return perturb(o.at[:, 0].add(lists[:, 0].astype(jnp.float32) * 0.0))

    timeit("mask+rowsort", rowsort_body)

    # scatter-free reduction: gather kernel outputs back at the known
    # per-ray slots and row-min over K (replaces the two scatter-mins)
    def reduce_gather(o):
        slot, *_ = build(o, dir_i, alive)
        t_out = jnp.concatenate(
            [o[:, 0], o[:, 1], o[:, 2], o[:, 0]])[:PAIR_CAP + 1]
        sl = jnp.minimum(slot, PAIR_CAP)
        t_k = t_out[sl]  # (N, K)
        t_b = jnp.min(jnp.where(slot < PAIR_CAP, t_k, 1e30), axis=1)
        return perturb(o.at[:, 0].add(t_b * 0.0))

    timeit("build+red_gather", reduce_gather)

    # global argsort alternative to scatter: order (N*K) pairs by slot
    def argsort_pairs(o):
        slot, *_ = build(o, dir_i, alive)
        order = jnp.argsort(slot.ravel())
        return perturb(o.at[:, 0].add(order[:N].astype(jnp.float32) * 0.0))

    timeit("build+argsortNK", argsort_pairs)


if __name__ == "__main__":
    main()
