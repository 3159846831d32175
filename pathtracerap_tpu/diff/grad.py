"""Differentiable rendering and inverse rendering.

The reference is forward-only CUDA; differentiability is a capability this
framework adds (BASELINE.json north star).  The MXU engine is differentiable
end-to-end by construction:

* hit distances come from matmuls over baked world triangles
  (``ops/plucker.py``) — gradients flow to vertex positions and model
  transforms through the bake;
* the discrete winner (argmin triangle index, material branch, RR decision)
  is treated as fixed hit topology — the standard detached-sampling
  estimator: gradients flow through throughput products, hit points and
  normals, not through visibility changes;
* the image is an average of per-sample ``sqrt`` tone-mapped throughputs,
  so pixel-loss gradients reach material colors, emission colors, vertex
  positions and TRS matrices.

``make_sharded_train_step`` runs the whole loss+grad under ``shard_map``
with rays sharded over the mesh and one psum for (loss, grads) — the
gradient all-reduce rides ICI once per step.
"""

from __future__ import annotations

import functools
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.plucker import bake_world_triangles
from ..render.camera import generate_rays
from ..render.wavefront import _make_tracer, _render_tile, render_ray_array
from ..scene.types import SceneDevice

DEFAULT_PARAMS: Tuple[str, ...] = ("mat_color",)


def extract_params(scene: SceneDevice, names: Sequence[str] = DEFAULT_PARAMS) -> Dict:
    """Pull the optimizable leaves out of the scene pytree."""
    return {n: getattr(scene, n) for n in names}


def apply_params(scene: SceneDevice, params: Dict) -> SceneDevice:
    return scene.replace(**params)


DEFAULT_DIFF_ENGINE = "pallas"


def render_for_params(
    params: Dict,
    scene: SceneDevice,
    key: jax.Array,
    camera,
    resolution,
    n_samples: int,
    max_bounces: int,
    tile_size: int = 2048,
    ro=None,
    rd=None,
    tile_base=0,
    engine: str = DEFAULT_DIFF_ENGINE,
    parity: bool = True,
) -> jax.Array:
    """(N, 3) image (mean contribution) as a differentiable function of
    ``params``.  ``ro``/``rd`` may be passed for pre-sharded ray slices.

    ``engine="pallas"`` (default) traces through
    :func:`diff.fast.trace_pallas_diff` — Pallas-kernel forward speed with
    the backward recomputed at the frozen argmin; ``engine="mxu"`` differentiates
    straight through the XLA matmul engine (the r1 path, kept for
    cross-checking gradients).  ``parity=False`` enables the quality-mode
    cosine throughput factor so color carries vertex gradients
    (render/shade.py)."""
    s = apply_params(scene, params)
    world = bake_world_triangles(s)
    if engine == "fused" and world.fused_ops is None:
        # mirror render/wavefront.effective_engine: scenes above the
        # VMEM-resident pack limit have no fused pack — downgrade to the
        # per-bounce Pallas diff tracer instead of falling through to the
        # engine dispatch below (which knows no "fused") and crashing.
        # make_sharded_train_step routes through here too, so the sharded
        # path inherits the same fallback.
        engine = "pallas"
    if engine == "fused":
        # whole-sample megakernel forward + frozen-topology XLA replay
        # backward (diff/fast.py); RNG tiling is the megakernel's own
        # 8192-row chunk stream, with ``tile_base`` in those units (callers
        # pre-sharding rays must align slabs to 8192 rows)
        from ..pallas.megakernel import BINNED_SLAB_TILES
        from .fast import binned_forward_active, render_samples_fused_diff

        if ro is None:
            ro, rd = generate_rays(camera, resolution)
        # binned-forward scenes use the binned engine's measured-optimal
        # slab (density sweep, megakernel.BINNED_SLAB_TILES); the fused
        # emit_idx forward keeps its 64-tile slabs
        slab = (BINNED_SLAB_TILES if binned_forward_active(world) else 64) * 8192
        n = ro.shape[0]
        # material-only parity training never reads geometry in the color
        # path — use the color-only replay (diff/fast.replay_color_only),
        # which skips the v0/e1/e2/normal row gathers that dominate the
        # full replay (scripts/prof_r4_diff.py)
        color_only = parity and set(params.keys()) <= {"mat_color"}
        parts = [
            render_samples_fused_diff(
                world, ro[s0:s0 + slab], rd[s0:s0 + slab], key,
                n_samples=n_samples, max_bounces=max_bounces,
                parity=parity, tile_base=tile_base + s0 // 8192,
                color_only=color_only,
            )
            for s0 in range(0, n, slab)
        ]
        acc = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
        return acc / n_samples
    if engine == "pallas":
        from .fast import trace_pallas_diff

        tracer = lambda ro_, rd_, alive=None: trace_pallas_diff(
            world, ro_, rd_, alive=alive
        )
    else:
        tracer = _make_tracer(s, engine, world=world)
    if ro is None:
        ro, rd = generate_rays(camera, resolution)
    render_tile = functools.partial(
        _render_tile,
        tracer,
        key=key,
        n_samples=n_samples,
        max_bounces=max_bounces,
        parity=parity,
        sample_offset=0,
        scene=s,
    )
    acc = render_ray_array(render_tile, ro, rd, tile_size, tile_base=tile_base)
    return acc / n_samples


def image_loss(
    params: Dict,
    scene: SceneDevice,
    target: jax.Array,
    key: jax.Array,
    camera,
    resolution,
    n_samples: int,
    max_bounces: int,
    tile_size: int = 2048,
    ro=None,
    rd=None,
    tile_base=0,
    reduce: str = "mean",
    engine: str = DEFAULT_DIFF_ENGINE,
    parity: bool = True,
    weight=None,
) -> jax.Array:
    """Squared pixel loss vs an (N, 3) target.

    ``weight`` (optional, (N,) or (N, 1)) scales per-ray error — sharded
    callers use it to zero tile-padding rays, which otherwise render real
    scene content against a zero target and inject spurious gradients."""
    img = render_for_params(
        params, scene, key, camera, resolution, n_samples, max_bounces,
        tile_size=tile_size, ro=ro, rd=rd, tile_base=tile_base,
        engine=engine, parity=parity,
    )
    err = (img - target) ** 2
    if weight is not None:
        w = weight if weight.ndim == 2 else weight[:, None]
        err = err * w
    return jnp.mean(err) if reduce == "mean" else jnp.sum(err)


def render_aovs(
    params: Dict,
    scene: SceneDevice,
    camera,
    resolution,
    ro=None,
    rd=None,
):
    """Differentiable first-hit AOVs: (depth (N,), normal (N, 3), hit (N,)).

    Color in this renderer is a pure product of albedos (the reference
    dropped the cosine factor, ``Renderer.cpp:438``), so pixel colors carry
    no vertex-position gradient under frozen hit topology.  Geometry
    gradients are exposed the principled way instead: through depth/normal
    AOVs, whose values are smooth functions of vertex positions via the
    Pluecker-plane hit distance.
    """
    from ..ops.plucker import trace_mxu

    s = apply_params(scene, params)
    world = bake_world_triangles(s)
    if ro is None:
        ro, rd = generate_rays(camera, resolution)
    hits = trace_mxu(world, ro, rd)
    return hits.t, hits.normal, hits.hit


def geometry_loss(
    params: Dict,
    scene: SceneDevice,
    target_depth: jax.Array,
    target_normal: jax.Array,
    camera,
    resolution,
    normal_weight: float = 1.0,
    ro=None,
    rd=None,
) -> jax.Array:
    """Depth + normal matching loss for inverse-geometry fitting.

    Misses are masked out on both sides (visibility changes are a discrete
    event this estimator deliberately detaches)."""
    depth, normal, hit = render_aovs(params, scene, camera, resolution, ro=ro, rd=rd)
    mask = hit & (target_depth < 9999999.0)
    w = mask.astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(w), 1.0)
    d_err = jnp.sum(w * (depth - target_depth) ** 2) / denom
    n_err = jnp.sum(w[:, None] * (normal - target_normal) ** 2) / denom
    return d_err + normal_weight * n_err


def make_train_step(
    scene: SceneDevice,
    camera,
    resolution,
    n_samples: int,
    max_bounces: int,
    lr: float = 0.05,
    tile_size: int = 2048,
    engine: str = DEFAULT_DIFF_ENGINE,
    parity: bool = True,
):
    """Single-device SGD step on the pixel loss; returns jitted
    ``step(params, target, key) -> (loss, new_params)``."""

    @functools.partial(jax.jit, static_argnames=())
    def step(params, target, key):
        loss, grads = jax.value_and_grad(image_loss)(
            params, scene, target, key, camera, resolution, n_samples, max_bounces,
            tile_size=tile_size, engine=engine, parity=parity,
        )
        new_params = jax.tree_util.tree_map(lambda p, g: p - lr * g, params, grads)
        return loss, new_params

    return step


def make_sharded_train_step(
    scene: SceneDevice,
    camera,
    resolution,
    n_samples: int,
    max_bounces: int,
    mesh: Mesh,
    lr: float = 0.05,
    tile_size: int = 2048,
    engine: str = DEFAULT_DIFF_ENGINE,
    overlap_chunks: int = 1,
    parity: bool = True,
):
    """Multi-device train step: rays sharded over the ``rays`` axis,
    loss/grads psum-reduced, parameters updated replicated.

    ``overlap_chunks > 1`` splits each device's rays into that many
    segments and psum-reduces each segment's gradients INSIDE the segment
    scan — the all-reduce of chunk i rides ICI while chunk i+1's
    forward/backward computes (the north star's "gradient all-reduce
    overlapped with the backward bounce sweep").  Results are identical to
    the single-psum step up to f32 summation order.

    Returns jitted ``step(params, target_flat, key) -> (loss, new_params)``
    where ``target_flat`` is the (N, 3) target image in ray order.
    """
    n_dev = mesh.devices.size
    if engine == "fused":
        # the fused diff path's RNG stream is tiled at 8192 rows; device
        # slabs must align so tile_base is in those units (see
        # render_for_params)
        tile_size = 8192
    ro, rd = generate_rays(camera, resolution)
    n = ro.shape[0]
    per_dev = -(-n // n_dev)
    per_dev = -(-per_dev // (tile_size * overlap_chunks)) * (
        tile_size * overlap_chunks
    )
    n_pad = per_dev * n_dev
    ro = jnp.pad(ro, ((0, n_pad - n), (0, 0)))
    rd = jnp.pad(rd, ((0, n_pad - n), (0, 0)), constant_values=1.0)
    # tile-padding rays (rows >= n) render real scene content against a
    # zero-padded target; weight them out of the loss (ADVICE r4)
    w_valid = (jnp.arange(n_pad) < n).astype(jnp.float32)[:, None]
    tiles_per_dev = per_dev // tile_size
    tiles_per_chunk = tiles_per_dev // overlap_chunks
    rays_per_chunk = per_dev // overlap_chunks

    def local_step(params, scene_l, target_l, key_l, ro_l, rd_l, w_l):
        tile_base = jax.lax.axis_index("rays") * tiles_per_dev

        def chunk_loss(p, ro_c, rd_c, target_c, base_c, w_c):
            return image_loss(
                p, scene_l, target_c, key_l, camera, resolution,
                n_samples, max_bounces, tile_size=tile_size,
                ro=ro_c, rd=rd_c, tile_base=base_c, reduce="sum",
                engine=engine, weight=w_c, parity=parity,
            )

        if overlap_chunks == 1:
            loss, grads = jax.value_and_grad(chunk_loss)(
                params, ro_l, rd_l, target_l, tile_base, w_l
            )
            loss = jax.lax.psum(loss, "rays")
            grads = jax.lax.psum(grads, "rays")
        else:
            ro_cs = ro_l.reshape(overlap_chunks, rays_per_chunk, 3)
            rd_cs = rd_l.reshape(overlap_chunks, rays_per_chunk, 3)
            t_cs = target_l.reshape(overlap_chunks, rays_per_chunk, 3)
            w_cs = w_l.reshape(overlap_chunks, rays_per_chunk, 1)

            def body(carry, inp):
                acc_loss, acc_grads, k = carry
                ro_c, rd_c, t_c, w_c = inp
                l_c, g_c = jax.value_and_grad(chunk_loss)(
                    params, ro_c, rd_c, t_c,
                    tile_base + k * tiles_per_chunk, w_c,
                )
                # per-chunk all-reduce: XLA's async collectives overlap
                # this psum with the next chunk's compute
                l_c = jax.lax.psum(l_c, "rays")
                g_c = jax.lax.psum(g_c, "rays")
                acc_grads = jax.tree_util.tree_map(jnp.add, acc_grads, g_c)
                return (acc_loss + l_c, acc_grads, k + 1), None

            zero_g = jax.tree_util.tree_map(jnp.zeros_like, params)
            (loss, grads, _), _ = jax.lax.scan(
                body, (jnp.float32(0.0), zero_g, jnp.int32(0)),
                (ro_cs, rd_cs, t_cs, w_cs),
            )

        new_params = jax.tree_util.tree_map(lambda p, g: p - lr * g, params, grads)
        return loss, new_params

    sharded = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), P(), P("rays"), P(), P("rays"), P("rays"), P("rays")),
        out_specs=(P(), P()),
        check_vma=False,
    )

    @jax.jit
    def step(params, target_flat, key):
        t = jnp.pad(target_flat, ((0, n_pad - target_flat.shape[0]), (0, 0)))
        return sharded(params, scene, t, key, ro, rd, w_valid)

    return step
