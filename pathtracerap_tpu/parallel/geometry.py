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
from ..ops.math import normalize
from ..scene.types import SceneDevice, WorldTriangles

F_MAX = constants.FLOAT_MAX


def _ring(n_dev: int):
    return [(i, (i + 1) % n_dev) for i in range(n_dev)]


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
        )

    return tracer


def render_image_geometry_sharded(
    scene: SceneDevice,
    config,
    mesh: Optional[Mesh] = None,
    tile_size: int = 2048,
):
    """Full render with triangles sharded + rays sharded over one mesh axis.

    Both shardings share the axis: device d owns ray rows d and triangle
    shard d; every trace call runs the D-step ring.
    """
    from ..ops.plucker import bake_world_triangles
    from ..render.camera import generate_rays
    from ..render.wavefront import _render_tile, render_ray_array

    if mesh is None:
        from .sharding import default_mesh

        mesh = default_mesh()
        mesh = Mesh(mesh.devices, ("shard",))
    n_dev = mesh.devices.size

    # pad triangles so every shard is lane-aligned for the pallas kernel
    # fused_tile=None: the ring path slices the dense packs per shard and
    # uses the dense-sweep kernel (shards are small), not the prefetch-list
    # kernel, so the blocked packs would only waste memory
    world = jax.jit(
        functools.partial(bake_world_triangles, pad_to=128 * n_dev, fused_tile=None)
    )(scene)

    key = jax.random.PRNGKey(config.seed)
    ro, rd = generate_rays(config.camera, config.resolution)
    n = ro.shape[0]
    per_dev = -(-n // n_dev)
    per_dev = -(-per_dev // tile_size) * tile_size
    n_pad = per_dev * n_dev
    ro = jnp.pad(ro, ((0, n_pad - n), (0, 0)))
    rd = jnp.pad(rd, ((0, n_pad - n), (0, 0)), constant_values=1.0)
    tiles_per_dev = per_dev // tile_size

    shard_tracer = make_geometry_sharded_tracer(n_dev)

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

    world_specs = jax.tree_util.tree_map(lambda _: P(), world)
    world_specs = world_specs.replace(
        edge_mat=P(None, None, "shard"),
        plane_mat=P(None, "shard"),
        cluster_aabb=P(None, "shard"),
    )

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
