"""Geometry-sharded rendering: triangle shards ring-rotating over ICI.

For scenes too large to replicate per chip, the world-space triangle soup's
heavy matmul operands (Pluecker edge matrix: 24 floats/tri, plane matrix:
8 floats/tri) are sharded over the mesh axis; rays stay resident on their
home device and the *triangle shards* rotate around the ring with
``lax.ppermute`` — the weights-stationary sibling of ring attention (fixed
size state circulating over ICI while each device keeps its data shard;
SURVEY.md section 5 "long-context analog").  After ``D`` steps every ray
has been tested against every shard and each device holds its rays'
global nearest hit.

Rotating triangles instead of rays is the right direction whenever
``bytes(triangle shard) < bytes(ray block)`` — at the reference workload
(3k triangles vs 100k rays/device) it is ~100x less traffic.

Tie-break is made rotation-order-independent by reducing on the
lexicographic key (t, global triangle id), so results are bit-identical to
the single-device engine whichever device a ray lands on.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from .. import constants
from ..ops.intersect import HitRecord
from ..ops.math import normalize, normalize_guarded
from ..scene.types import SceneDevice, WorldTriangles

F_MAX = constants.FLOAT_MAX


def _ring(n_dev: int):
    return [(i, (i + 1) % n_dev) for i in range(n_dev)]


def make_geometry_sharded_tracer_fused(n_dev: int, axis: str = "shard"):
    """Fast-path ring tracer: the FUSED worklist pack rotates over ICI.

    VERDICT r3 task 4: the r2 ring sliced only the dense Pluecker packs and
    ran the slow dense-sweep kernel.  Here each device holds ``nb/D``
    fused-pack blocks (``fused_ops`` columns + ``block_aabb`` rows, baked
    with ``ring_shards=D``); per rotation step the per-tile worklists are
    rebuilt against the LOCAL shard's block AABBs and the worklist kernel
    (``pallas.trace.nearest_hit_fused``) traces only reachable blocks —
    the same kernel the single-device fast path runs.

    Returns ``tracer(world_l, ro, rd, alive=None) -> HitRecord`` for use
    INSIDE shard_map, where ``world_l.fused_ops`` is the local (16, 4*Ts)
    column shard, ``world_l.block_aabb`` the local (nb/D, 8) rows (NaN rows
    for padding blocks — never selected by a worklist), and the
    per-triangle attribute tables (shade_normal / mat_type / mat_color /
    plane_n) are replicated full-length arrays.  The lexicographic
    (t, global idx) reduction makes results bit-identical to the
    replicated engine regardless of rotation order.
    """
    from ..pallas.trace import _slab_margin, _tile_block_lists, nearest_hit_fused

    def tracer(world_l, ro, rd, alive=None, return_idx: bool = False):
        n = ro.shape[0]
        rd_n = normalize(rd)
        alive_f = (
            jnp.ones((n, 1), jnp.float32)
            if alive is None
            else alive.astype(jnp.float32)[:, None]
        )
        pad = (-n) % 512
        ro_p = jnp.pad(ro, ((0, pad), (0, 0)))
        rd_p = jnp.pad(rd_n, ((0, pad), (0, 0)), constant_values=1.0)
        alive_p = jnp.pad(alive_f, ((0, pad), (0, 0)))
        m = jnp.cross(ro_p, rd_p)
        w16 = jnp.concatenate(
            [rd_p, m, ro_p, jnp.full((ro_p.shape[0], 1), -1.0, jnp.float32),
             alive_p, jnp.zeros((ro_p.shape[0], 5), jnp.float32)],
            axis=-1,
        )
        tri_block = world_l.tri_block
        t_shard = world_l.fused_ops.shape[1] // 4

        my = jax.lax.axis_index(axis)
        best_t = jnp.full((ro_p.shape[0],), F_MAX, jnp.float32)
        best_idx = jnp.full((ro_p.shape[0],), jnp.iinfo(jnp.int32).max, jnp.int32)

        state = (world_l.fused_ops, world_l.block_aabb, my * t_shard)
        for _ in range(n_dev):
            ops_s, aabb_s, off = state
            margin = _slab_margin(aabb_s)
            block_list = _tile_block_lists(
                aabb_s, ro_p, rd_p, alive_p, 512, margin
            )
            t, idx = nearest_hit_fused(
                w16, ops_s, aabb_s, block_list, margin, ray_tile=512,
                tri_block=tri_block,
            )
            g_idx = jnp.where(idx >= 0, idx + off, jnp.iinfo(jnp.int32).max)
            improve = (t < best_t) | (
                (t == best_t) & (t < F_MAX) & (g_idx < best_idx)
            )
            best_t = jnp.where(improve, t, best_t)
            best_idx = jnp.where(improve, g_idx, best_idx)
            state = jax.lax.ppermute(state, axis, _ring(n_dev))

        best_t = best_t[:n]
        hit = best_t < F_MAX
        best_idx = jnp.where(hit, best_idx[:n], 0)
        rec = HitRecord(
            t=best_t,
            normal=jnp.where(hit[:, None], world_l.shade_normal[best_idx], 0.0),
            mat_type=jnp.where(hit, world_l.mat_type[best_idx], 0),
            mat_color=jnp.where(hit[:, None], world_l.mat_color[best_idx], 0.0),
            geom_normal=jnp.where(
                hit[:, None],
                normalize_guarded(world_l.plane_n[best_idx]),
                0.0,
            ),
            mat_ri=(
                jnp.where(hit, world_l.mat_ri[best_idx], 1.5)
                if world_l.mat_ri is not None
                else None
            ),
        )
        if return_idx:
            return rec, best_idx
        return rec

    return tracer


def make_ring_diff_tracer(n_dev: int, axis: str = "shard"):
    """Differentiable ring tracer: fused-ring forward (stop-grad), backward
    recomputed at the frozen winning triangle via ``hit_from_index`` on the
    replicated diff tables (v0/e1/e2/tri_model/mat_table) — the ring
    edition of ``diff.fast.trace_pallas_diff``.  Gradients flow to
    ``world.mat_table`` (mat_color/emission) through the one-hot matmul."""
    from ..diff.fast import hit_from_index

    ring = make_geometry_sharded_tracer_fused(n_dev, axis)

    def tracer(world_l, ro, rd, alive=None):
        rd_n = normalize(rd)
        rec, idx = ring(
            jax.lax.stop_gradient(world_l),
            jax.lax.stop_gradient(ro),
            jax.lax.stop_gradient(rd_n),
            alive=alive,
            return_idx=True,
        )
        hit = rec.t < F_MAX
        return hit_from_index(world_l, ro, rd_n, idx, hit)

    return tracer


def ring_world_specs(world, axis: str = "shard"):
    """PartitionSpecs for a ``ring_shards``-baked world: heavy fused pack
    sharded over ``axis``, per-triangle attribute tables replicated."""
    from jax.sharding import PartitionSpec as P

    specs = jax.tree_util.tree_map(lambda _: P(), world)
    return specs.replace(
        fused_ops=P(None, axis),
        block_aabb=P(axis, None),
        # the dense packs ride along sharded too (unused by the fused
        # tracer but kept consistent so nothing replicates 24 floats/tri)
        edge_mat=P(None, None, axis),
        edge_pluecker=P(None, None, axis),
        plane_mat=P(None, axis),
        cluster_aabb=P(None, axis),
        attr_rows=P(None, axis),
    )


def make_geometry_sharded_tracer(n_dev: int, axis: str = "shard"):
    """Returns ``tracer(world_l, ro, rd)`` usable INSIDE shard_map, where
    ``world_l.edge_mat`` / ``world_l.plane_mat`` are the local triangle
    shard and the per-triangle attribute tables (shade_normal / mat_type /
    mat_color — 7 floats/tri) are replicated full-length arrays."""
    from ..pallas.trace import nearest_hit

    def tracer(world_l, ro, rd, alive=None):
        edge_shard, plane_shard = world_l.edge_mat, world_l.plane_mat
        aabb_shard = world_l.cluster_aabb
        t_shard = plane_shard.shape[1]
        n = ro.shape[0]
        rd_n = normalize(rd)
        alive_f = (
            jnp.ones((n, 1), jnp.float32)
            if alive is None
            else alive.astype(jnp.float32)[:, None]
        )
        pad = (-n) % 512
        ro_p = jnp.pad(ro, ((0, pad), (0, 0)))
        rd_p = jnp.pad(rd_n, ((0, pad), (0, 0)), constant_values=1.0)
        alive_p = jnp.pad(alive_f, ((0, pad), (0, 0)))
        m = jnp.cross(ro_p, rd_p)
        w = jnp.concatenate([rd_p, m, jnp.zeros((ro_p.shape[0], 2), jnp.float32)], -1)
        wo = jnp.concatenate(
            [ro_p, jnp.full((ro_p.shape[0], 1), -1.0), alive_p,
             jnp.zeros((ro_p.shape[0], 3), jnp.float32)],
            -1,
        )

        my = jax.lax.axis_index(axis)
        best_t = jnp.full((ro_p.shape[0],), F_MAX, jnp.float32)
        best_idx = jnp.full((ro_p.shape[0],), jnp.iinfo(jnp.int32).max, jnp.int32)

        state = (edge_shard, plane_shard, aabb_shard, my * t_shard)
        for _ in range(n_dev):
            e_s, p_s, a_s, off = state
            t, idx = nearest_hit(w, wo, e_s, p_s, a_s)
            g_idx = idx + off
            # rotation-order-independent lexicographic (t, idx) reduction
            improve = (t < best_t) | ((t == best_t) & (g_idx < best_idx))
            best_t = jnp.where(improve, t, best_t)
            best_idx = jnp.where(improve, g_idx, best_idx)
            state = jax.lax.ppermute(state, axis, _ring(n_dev))

        best_t = best_t[:n]
        best_idx = jnp.where(best_idx[:n] == jnp.iinfo(jnp.int32).max, 0, best_idx[:n])
        hit = best_t < F_MAX
        return HitRecord(
            t=best_t,
            normal=jnp.where(hit[:, None], world_l.shade_normal[best_idx], 0.0),
            mat_type=jnp.where(hit, world_l.mat_type[best_idx], 0),
            mat_color=jnp.where(hit[:, None], world_l.mat_color[best_idx], 0.0),
            geom_normal=jnp.where(
                hit[:, None],
                normalize_guarded(world_l.plane_n[best_idx]),
                0.0,
            ),
            mat_ri=(
                jnp.where(hit, world_l.mat_ri[best_idx], 1.5)
                if world_l.mat_ri is not None
                else None
            ),
        )

    return tracer


def render_image_geometry_sharded(
    scene: SceneDevice,
    config,
    mesh: Optional[Mesh] = None,
    tile_size: int = 2048,
    engine: str = "fused",
):
    """Full render with triangles sharded + rays sharded over one mesh axis.

    Both shardings share the axis: device d owns ray rows d and triangle
    shard d; every trace call runs the D-step ring.

    ``engine="fused"`` (default, VERDICT r3 task 4) rotates the fused
    worklist pack and runs the same ``nearest_hit_fused`` kernel as the
    single-device fast path; ``engine="dense"`` keeps the r2 dense-sweep
    ring for A/B.
    """
    from ..ops.plucker import bake_world_triangles
    from ..render.camera import generate_rays
    from ..render.wavefront import _render_tile, render_ray_array

    if mesh is None:
        from .sharding import default_mesh

        mesh = default_mesh()
        mesh = Mesh(mesh.devices, ("shard",))
    n_dev = mesh.devices.size

    if engine == "fused":
        world = jax.jit(
            functools.partial(bake_world_triangles, ring_shards=n_dev)
        )(scene)
        shard_tracer = make_geometry_sharded_tracer_fused(n_dev)
        world_specs = ring_world_specs(world)
    else:
        # r2 path: lane-aligned dense packs, dense-sweep kernel per shard
        world = jax.jit(
            functools.partial(
                bake_world_triangles, pad_to=128 * n_dev, fused_tile=None
            )
        )(scene)
        shard_tracer = make_geometry_sharded_tracer(n_dev)
        world_specs = jax.tree_util.tree_map(lambda _: P(), world)
        world_specs = world_specs.replace(
            edge_mat=P(None, None, "shard"),
            plane_mat=P(None, "shard"),
            cluster_aabb=P(None, "shard"),
        )

    key = jax.random.PRNGKey(config.seed)
    ro, rd = generate_rays(config.camera, config.resolution)
    n = ro.shape[0]
    per_dev = -(-n // n_dev)
    per_dev = -(-per_dev // tile_size) * tile_size
    n_pad = per_dev * n_dev
    ro = jnp.pad(ro, ((0, n_pad - n), (0, 0)))
    rd = jnp.pad(rd, ((0, n_pad - n), (0, 0)), constant_values=1.0)
    tiles_per_dev = per_dev // tile_size

    def local_render(world_l, key_l, ro_l, rd_l):
        tracer = lambda o, d, alive=None: shard_tracer(world_l, o, d, alive=alive)
        render_tile = functools.partial(
            _render_tile,
            tracer,
            key=key_l,
            n_samples=config.samples_per_pixel,
            max_bounces=config.max_bounces,
            parity=config.parity,
            sample_offset=0,
            scene=scene,
        )
        tile_base = jax.lax.axis_index("shard") * tiles_per_dev
        return render_ray_array(render_tile, ro_l, rd_l, tile_size, tile_base=tile_base)

    shard = jax.shard_map(
        local_render,
        mesh=mesh,
        in_specs=(world_specs, P(), P("shard"), P("shard")),
        out_specs=P("shard"),
        check_vma=False,
    )
    acc = jax.jit(shard)(world, key, ro, rd)[:n]
    w, h = config.resolution
    return acc.reshape(h, w, 3) / config.samples_per_pixel


def make_geometry_sharded_train_step(
    scene: SceneDevice,
    camera,
    resolution,
    n_samples: int,
    max_bounces: int,
    mesh: Mesh,
    lr: float = 0.05,
    tile_size: int = 2048,
    parity: bool = True,
    param_names=("mat_color",),
):
    """Differentiable train step over a geometry-sharded ring.

    Two regimes by ``param_names`` (VERDICT r4 next-round item 5):

    * ``("mat_color",)`` — the heavy traversal packs are baked ONCE
      (frozen, stop-gradient — the ring trace is detached hit topology
      exactly like every other engine); the differentiable material table
      rides as the parameter and is re-injected into the local world each
      step, so mat_color/emission gradients flow through
      :func:`diff.fast.hit_from_index`'s one-hot matmul while triangles
      stay sharded.
    * any geometry parameter (``vertex_pos`` / ``model_to_world``) — the
      world is RE-BAKED from the parameters inside the loss every step
      (``bake_world_triangles(ring_shards=D)``) with its heavy pack
      sharding-constrained back onto the ring axis, so the forward trace
      sees the current geometry and the frozen-topology replay's
      v0/e1/e2/normal tables are differentiable functions of the
      parameters.  Use ``parity=False`` for pixel-loss vertex gradients
      (in parity mode color is a pure albedo product and carries none —
      render/shade.py).

    Returns jitted ``step(params, target_flat, key) -> (loss, new_params)``.
    """
    from ..ops.plucker import bake_world_triangles
    from ..render.camera import generate_rays
    from ..render.wavefront import _render_tile, render_ray_array

    n_dev = mesh.devices.size
    axis = mesh.axis_names[0]
    rebake = any(name != "mat_color" for name in param_names)
    world = jax.jit(
        functools.partial(bake_world_triangles, ring_shards=n_dev)
    )(scene)
    if not rebake:
        world = jax.lax.stop_gradient(world)
    world_specs = ring_world_specs(world, axis)
    diff_tracer = make_ring_diff_tracer(n_dev, axis)

    ro, rd = generate_rays(camera, resolution)
    n = ro.shape[0]
    per_dev = -(-n // n_dev)
    per_dev = -(-per_dev // tile_size) * tile_size
    n_pad = per_dev * n_dev
    ro = jnp.pad(ro, ((0, n_pad - n), (0, 0)))
    rd = jnp.pad(rd, ((0, n_pad - n), (0, 0)), constant_values=1.0)
    # pad rays (rows >= n) render real content vs a zero target — mask
    # them out of the loss (ADVICE r4)
    w_valid = (jnp.arange(n_pad) < n).astype(jnp.float32)[:, None]
    tiles_per_dev = per_dev // tile_size

    if rebake:
        from jax.sharding import NamedSharding

        shard_tree = jax.tree_util.tree_map(
            lambda spec: NamedSharding(mesh, spec), world_specs
        )

        def local_loss(world_l, target_l, key_l, ro_l, rd_l, w_l):
            tile_base = jax.lax.axis_index(axis) * tiles_per_dev
            tracer = lambda o, d, alive=None: diff_tracer(
                world_l, o, d, alive=alive
            )
            render_tile = functools.partial(
                _render_tile,
                tracer,
                key=key_l,
                n_samples=n_samples,
                max_bounces=max_bounces,
                parity=parity,
                sample_offset=0,
                scene=scene,
            )
            acc = render_ray_array(
                render_tile, ro_l, rd_l, tile_size, tile_base=tile_base
            )
            img = acc / n_samples
            return jax.lax.psum(
                jnp.sum(w_l * (img - target_l) ** 2), axis
            )

        sharded_loss = jax.shard_map(
            local_loss,
            mesh=mesh,
            in_specs=(world_specs, P(axis), P(), P(axis), P(axis), P(axis)),
            out_specs=P(),
            check_vma=False,
        )

        @jax.jit
        def step_rebake(params, target_flat, key):
            t = jnp.pad(
                target_flat, ((0, n_pad - target_flat.shape[0]), (0, 0))
            )

            def loss_fn(p):
                world_p = bake_world_triangles(
                    scene.replace(**p), ring_shards=n_dev
                )
                # pin the heavy pack back onto the ring axis so the bake's
                # output materializes sharded, not replicated
                world_p = jax.lax.with_sharding_constraint(
                    world_p, shard_tree
                )
                return sharded_loss(world_p, t, key, ro, rd, w_valid)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            new_params = jax.tree_util.tree_map(
                lambda q, g: q - lr * g, params, grads
            )
            return loss, new_params

        return step_rebake

    def local_step(params, world_l, target_l, key_l, ro_l, rd_l, w_l):
        tile_base = jax.lax.axis_index(axis) * tiles_per_dev

        def loss_fn(p):
            w = world_l.replace(mat_table=p["mat_color"])
            tracer = lambda o, d, alive=None: diff_tracer(w, o, d, alive=alive)
            render_tile = functools.partial(
                _render_tile,
                tracer,
                key=key_l,
                n_samples=n_samples,
                max_bounces=max_bounces,
                parity=parity,
                sample_offset=0,
                scene=scene,
            )
            acc = render_ray_array(
                render_tile, ro_l, rd_l, tile_size, tile_base=tile_base
            )
            img = acc / n_samples
            return jnp.sum(w_l * (img - target_l) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        loss = jax.lax.psum(loss, axis)
        grads = jax.lax.psum(grads, axis)
        new_params = jax.tree_util.tree_map(
            lambda q, g: q - lr * g, params, grads
        )
        return loss, new_params

    sharded = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), world_specs, P(axis), P(), P(axis), P(axis), P(axis)),
        out_specs=(P(), P()),
        check_vma=False,
    )

    @jax.jit
    def step(params, target_flat, key):
        t = jnp.pad(target_flat, ((0, n_pad - target_flat.shape[0]), (0, 0)))
        return sharded(params, world, t, key, ro, rd, w_valid)

    return step
