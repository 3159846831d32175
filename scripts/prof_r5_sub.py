"""r5: A/B the sub-block worklist binned engine on the real chip.

Reference workload (1000x800, 5 bounces, parity camera, primary cached),
24 spp per dispatch to amortize the ~0.4 s tunnel dispatch floor.

Usage: run one config per process (env flags are read at import):
    python scripts/prof_r5_sub.py binned            # PTAP_SUBBLOCKS as set
    PTAP_SUBBLOCKS=0 python scripts/prof_r5_sub.py binned
    python scripts/prof_r5_sub.py fused
"""

import json
import sys
import time

import numpy as np


def main() -> None:
    import os

    engine = sys.argv[1] if len(sys.argv) > 1 else "binned"
    spp = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    # unset -> None: the binned engine applies its adaptive default
    # (megakernel._binned_ray_tile); set PTAP_RAY_TILE to force a value
    _rt = os.environ.get("PTAP_RAY_TILE")
    ray_tile = int(_rt) if _rt else None  # fused resolves None below

    import jax
    import jax.numpy as jnp

    from pathtracerap_tpu.config import RenderConfig
    from pathtracerap_tpu.ops.plucker import bake_world_triangles
    import pathtracerap_tpu.pallas.megakernel as MK
    from pathtracerap_tpu.render.camera import generate_rays
    from pathtracerap_tpu.scene.build import build_reference_scene
    from pathtracerap_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()
    jax.jit(lambda x: x * 2.0)(jnp.ones((8,))).block_until_ready()

    resolution = (1000, 800)
    max_bounces = 5
    scene = build_reference_scene().to_device()
    world = jax.jit(bake_world_triangles)(scene)
    ro, rd = generate_rays(RenderConfig().camera, resolution)
    key = jax.random.PRNGKey(0)

    fn = (
        MK.render_samples_binned if engine == "binned"
        else MK.render_samples_fused
    )
    if engine != "binned" and ray_tile is None:
        ray_tile = MK.RAY_TILE

    # slab like render_accumulate does (SMEM worklist budget);
    # PTAP_SLAB_TILES overrides for the batch-density experiments
    slab = int(os.environ.get("PTAP_SLAB_TILES", "64")) * MK.RNG_TILE

    @jax.jit
    def render():
        n = ro.shape[0]
        parts = []
        for s0 in range(0, n, slab):
            parts.append(
                fn(world, ro[s0:s0 + slab], rd[s0:s0 + slab], key,
                   n_samples=spp, max_bounces=max_bounces,
                   tile_base=s0 // MK.RNG_TILE, ray_tile=ray_tile)
            )
        acc = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
        return jnp.mean(acc)  # scalarize: host fetch rides a ~30 MB/s tunnel

    t0 = time.perf_counter()
    m = float(render())
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        m = float(render())
        times.append(time.perf_counter() - t0)
    dt = min(times)
    rays = resolution[0] * resolution[1] * spp * max_bounces
    print(json.dumps({
        "engine": engine,
        "ray_tile": ray_tile,
        "subblocks": MK.SUBBLOCKS,
        "resort_every": MK.RESORT_EVERY,
        "mrays_per_s": round(rays / dt / 1e6, 2),
        "s_per_sample": round(dt / spp, 4),
        "compile_s": round(compile_s, 1),
        "mean": round(m / spp, 5),
    }))


if __name__ == "__main__":
    main()
