"""Whole-sample megakernel engine vs the per-bounce engines.

The megakernel consumes the same uniform stream as the other engines, so at
matched configs the rendered images must agree per pixel (interpret mode on
the CPU test backend runs the exact same kernel code that compiles on TPU).
"""

import numpy as np
import pytest

from pathtracerap_tpu.config import CameraConfig, RenderConfig
from pathtracerap_tpu.render.wavefront import Renderer
from pathtracerap_tpu.scene.build import build_cornell_box_scene


@pytest.fixture(scope="module")
def scene():
    return build_cornell_box_scene().to_device()


CAMERA = CameraConfig(
    position=(0.0, 0.0, 150.0),
    plane_x=(-40.0, 40.0),
    plane_y=(-30.0, 30.0),
    plane_z=100.0,
)


def _render(scene, engine, **over):
    cfg = dict(
        resolution=(16, 8), samples_per_pixel=4, max_bounces=3, camera=CAMERA
    )
    cfg.update(over)
    return np.asarray(Renderer(scene, RenderConfig(engine=engine, **cfg)).render())


def test_fused_matches_mxu_engine(scene):
    img_f = _render(scene, "fused")
    img_m = _render(scene, "mxu")
    np.testing.assert_allclose(img_f, img_m, atol=1e-5)


def test_fused_matches_pallas_engine(scene):
    img_f = _render(scene, "fused")
    img_p = _render(scene, "pallas")
    np.testing.assert_allclose(img_f, img_p, atol=1e-5)


def test_fused_more_bounces_and_odd_resolution(scene):
    # resolution whose ray count is not a RAY_TILE multiple exercises the
    # padding path; 5 bounces exercises the unrolled loop depth
    over = dict(resolution=(19, 7), samples_per_pixel=2, max_bounces=5)
    img_f = _render(scene, "fused", **over)
    img_m = _render(scene, "mxu", **over)
    np.testing.assert_allclose(img_f, img_m, atol=1e-5)


def test_fused_quality_mode_jitter(scene):
    cam = CameraConfig(
        position=CAMERA.position,
        plane_x=CAMERA.plane_x,
        plane_y=CAMERA.plane_y,
        plane_z=CAMERA.plane_z,
        jitter=True,
    )
    over = dict(camera=cam, parity=False)
    img_f = _render(scene, "fused", **over)
    img_m = _render(scene, "mxu", **over)
    np.testing.assert_allclose(img_f, img_m, atol=1e-5)


def test_live_ray_curve(scene):
    import jax

    from pathtracerap_tpu.render.diagnostics import live_ray_curve

    cfg = RenderConfig(
        resolution=(16, 8), samples_per_pixel=1, max_bounces=4,
        camera=CAMERA, engine="mxu",
    )
    curve = live_ray_curve(scene, cfg, jax.random.PRNGKey(0))
    assert len(curve) == 4
    assert curve[0] == 1.0
    # monotone non-increasing decay (rays only die)
    assert all(a >= b for a, b in zip(curve, curve[1:]))


def test_slabbed_fused_calls_compose_exactly(scene):
    """Slabbing the ray array over multiple megakernel calls with global
    RNG tile numbering must reproduce the single-call result (the >=1024^2
    SMEM slabbing path in render_accumulate)."""
    import jax
    import jax.numpy as jnp

    from pathtracerap_tpu.ops.plucker import bake_world_triangles
    from pathtracerap_tpu.pallas.megakernel import RNG_TILE, render_samples_fused
    from pathtracerap_tpu.render.camera import generate_rays

    world = jax.jit(bake_world_triangles)(scene)
    # two full RNG tiles worth of rays (small RNG_TILE would need a huge
    # image; emulate by slicing a 2*RNG_TILE ray array)
    res = (RNG_TILE // 64, 128)  # 128 x 128 = 16384 = 2 * RNG_TILE
    from pathtracerap_tpu.config import CameraConfig

    cam = CameraConfig(position=(0.0, 0.0, 150.0), plane_x=(-40.0, 40.0),
                       plane_y=(-30.0, 30.0), plane_z=100.0)
    ro, rd = generate_rays(cam, res)
    assert ro.shape[0] == 2 * RNG_TILE
    key = jax.random.PRNGKey(11)

    full = render_samples_fused(world, ro, rd, key, n_samples=2, max_bounces=3)
    part0 = render_samples_fused(world, ro[:RNG_TILE], rd[:RNG_TILE], key,
                                 n_samples=2, max_bounces=3, tile_base=0)
    part1 = render_samples_fused(world, ro[RNG_TILE:], rd[RNG_TILE:], key,
                                 n_samples=2, max_bounces=3, tile_base=1)
    np.testing.assert_allclose(
        np.asarray(full), np.asarray(jnp.concatenate([part0, part1])),
        atol=1e-6,
    )


def test_binned_matches_fused_engine(scene):
    """Per-bounce ray binning is a pure permutation with per-ray uniform
    streams riding the sort — images must equal the unbinned megakernel's."""
    img_b = _render(scene, "binned", max_bounces=4)
    img_f = _render(scene, "fused", max_bounces=4)
    np.testing.assert_allclose(img_b, img_f, atol=1e-5)


def test_mosaic_vs_interpret_exactness(scene):
    """VERDICT r3 task 8: with f32 (HIGHEST) matmuls, the compiled Mosaic
    megakernel and the interpret-mode evaluation of the same kernel body
    compute the same IEEE arithmetic — any divergence is a Mosaic lowering
    drift.  Runs only in a TPU session (``scripts/check_tpu_exactness.py``
    is the full-size standalone); under the CPU test mesh the kernel is
    already interpreted so the comparison is vacuous."""
    import jax

    if jax.default_backend() != "tpu":
        import pytest

        pytest.skip("Mosaic-vs-interpret comparison needs a real TPU")
    import os

    if os.environ.get("PTAP_MM_PRECISION", "bf16x3") != "f32":
        import pytest

        pytest.skip("set PTAP_MM_PRECISION=f32 for an IEEE-comparable run")
    if os.environ.get("PTAP_SLOW_TESTS", "0") != "1":
        import pytest

        pytest.skip(
            "per-op interpret emulation of the megakernel is impractically "
            "slow through the axon compile tunnel (set PTAP_SLOW_TESTS=1 "
            "on a local TPU); scripts/check_tpu_exactness.py is the "
            "cross-process TPU-vs-CPU-interpret equivalent"
        )
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from pathtracerap_tpu.ops.plucker import bake_world_triangles
    from pathtracerap_tpu.pallas.megakernel import render_samples_fused
    from pathtracerap_tpu.render.camera import generate_rays

    world = jax.jit(bake_world_triangles)(scene)
    ro, rd = generate_rays(CAMERA, (64, 32))
    key = jax.random.PRNGKey(3)
    # ONE bounce: the comparison with no trig-derived scatter directions —
    # multi-bounce bitwise agreement is chaos-amplified transcendental ulp
    # noise, not a lowering property (see scripts/check_tpu_exactness.py)
    a = np.asarray(render_samples_fused(world, ro, rd, key, 1, 1))
    with pltpu.force_tpu_interpret_mode():
        b = np.asarray(render_samples_fused(world, ro, rd, key, 1, 1))
    diff = np.abs(a - b)
    assert diff.max() <= 2e-5 * max(1.0, np.abs(a).max()), diff.max()


def test_streamed_worklist_kernels_match(scene, monkeypatch):
    """r4: above STREAM_BLOCKS the worklist kernels keep the operand pack
    in HBM and double-buffer per-visit slab DMAs.  Forcing the threshold
    to 2 on the reference scene (6 real blocks) streams every visit; with
    the SMEM worklist budget also shrunk, the row-chunking path runs too.
    Results must be bit-identical to the VMEM-resident kernels."""
    import pathtracerap_tpu.pallas.megakernel as MK
    import pathtracerap_tpu.pallas.trace as TR
    from pathtracerap_tpu.ops.plucker import bake_world_triangles, trace_mxu
    from pathtracerap_tpu.pallas.trace import trace_pallas
    from pathtracerap_tpu.render.camera import generate_rays
    from pathtracerap_tpu.scene.build import build_reference_scene

    import jax

    ref = build_reference_scene().to_device()
    world = jax.jit(bake_world_triangles)(ref)
    ro, rd = generate_rays(RenderConfig().camera, (32, 16))
    key = jax.random.PRNGKey(7)

    f_base = np.asarray(MK.render_samples_fused(
        world, ro, rd, key, n_samples=2, max_bounces=3))

    monkeypatch.setattr(MK, "STREAM_BLOCKS", 2)
    monkeypatch.setattr(TR, "SMEM_LIST_INTS", 16)
    h_stream = trace_pallas(world, ro, rd)
    h_ref = trace_mxu(world, ro, rd)
    np.testing.assert_array_equal(np.asarray(h_stream.t), np.asarray(h_ref.t))
    b_stream = np.asarray(MK.render_samples_binned(
        world, ro, rd, key, n_samples=2, max_bounces=3))
    np.testing.assert_allclose(b_stream, f_base, atol=1e-6)


def test_subblock_worklists_match_block_worklists(scene):
    """r5: the sub-block (128-tri granularity) worklist path must be
    bit-identical to the block-granularity path — grouping only changes
    WHICH columns each visit sweeps, never the accept logic or the
    (t, lowest-global-index) tie contract."""
    import jax

    import pathtracerap_tpu.pallas.megakernel as MK
    from pathtracerap_tpu.ops.plucker import bake_world_triangles
    from pathtracerap_tpu.render.camera import generate_rays
    from pathtracerap_tpu.scene.build import build_reference_scene

    ref = build_reference_scene().to_device()
    world = jax.jit(bake_world_triangles)(ref)
    assert world.sub_aabb is not None
    ro, rd = generate_rays(RenderConfig().camera, (32, 16))
    key = jax.random.PRNGKey(7)

    old = MK.SUBBLOCKS
    try:
        MK.SUBBLOCKS = True
        b_sub = np.asarray(MK.render_samples_binned(
            world, ro, rd, key, n_samples=2, max_bounces=4))
        MK.SUBBLOCKS = False
        b_blk = np.asarray(MK.render_samples_binned(
            world, ro, rd, key, n_samples=2, max_bounces=4))
    finally:
        MK.SUBBLOCKS = old
    np.testing.assert_array_equal(b_sub, b_blk)


def test_sample_batched_binned_bit_identical(scene):
    """r5: sorting several samples' wavefronts together (the tile-
    coherence lever) must not change a single bit — each ray keeps its
    own (sample, pixel) uniform stream through the batched ``pix``
    indexing, and tile membership never affects a ray's result."""
    import jax

    import pathtracerap_tpu.pallas.megakernel as MK
    from pathtracerap_tpu.ops.plucker import bake_world_triangles
    from pathtracerap_tpu.render.camera import generate_rays
    from pathtracerap_tpu.scene.build import build_reference_scene

    ref = build_reference_scene().to_device()
    world = jax.jit(bake_world_triangles)(ref)
    ro, rd = generate_rays(RenderConfig().camera, (32, 16))
    key = jax.random.PRNGKey(11)

    old = MK.BINNED_SAMPLE_BATCH
    try:
        MK.BINNED_SAMPLE_BATCH = 1
        base = np.asarray(MK.render_samples_binned(
            world, ro, rd, key, n_samples=3, max_bounces=4))
        MK.BINNED_SAMPLE_BATCH = 2  # 3 samples -> groups of 2 + 1
        batched = np.asarray(MK.render_samples_binned(
            world, ro, rd, key, n_samples=3, max_bounces=4))
    finally:
        MK.BINNED_SAMPLE_BATCH = old
    np.testing.assert_array_equal(base, batched)


def test_group_sub_lists_contract():
    """The regrouped worklist invariants the sub-mode kernel relies on:
    live groups are a prefix, live groups contain only valid ascending ids,
    short groups repeat their first id."""
    import jax.numpy as jnp

    from pathtracerap_tpu.pallas.trace import _group_sub_lists

    lists = jnp.asarray([
        [3, 9, 1, 7, 2, -1, -1, -1],   # 5 valid -> 2 groups
        [-1, -1, -1, -1, -1, -1, -1, -1],  # dead tile
        [5, -1, -1, -1, -1, -1, -1, -1],   # 1 valid
    ], jnp.int32)
    g = np.asarray(_group_sub_lists(lists, 4))
    assert g.shape == (3, 8)
    # row 0: first group = sorted first 4 entries; second group pads with
    # its first id
    assert list(g[0, :4]) == [1, 3, 7, 9]
    assert list(g[0, 4:]) == [2, 2, 2, 2]
    # dead tile stays all -1
    assert (g[1] == -1).all()
    # single-entry group repeats it; trailing group dead
    assert list(g[2, :4]) == [5, 5, 5, 5]
    assert (g[2, 4:] == -1).all()
