"""r5: scalarized per-scene batch/slab probe (no image fetch — the suite
fetch rides a ~10-30 MB/s tunnel and masks compute deltas at low spp).

Usage: PYTHONPATH=... python scripts/prof_r5_scene_batch.py <scene> <spp>
with scene in {multimesh, metallic, highpoly, megascene, reference}.
Reads PTAP_BINNED_SAMPLE_BATCH / PTAP_BINNED_SLAB_TILES like the engine.
"""

import json
import sys
import time


def main():
    import jax
    import jax.numpy as jnp

    from pathtracerap_tpu import bench_suite as BS
    from pathtracerap_tpu.config import RenderConfig
    import pathtracerap_tpu.pallas.megakernel as MK
    from pathtracerap_tpu.ops.plucker import bake_world_triangles
    from pathtracerap_tpu.render.wavefront import render_accumulate
    from pathtracerap_tpu.scene.build import build_reference_scene
    from pathtracerap_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()
    name = sys.argv[1] if len(sys.argv) > 1 else "multimesh"
    spp = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    if name == "reference":
        scene = build_reference_scene().to_device()
        cfg = RenderConfig(resolution=(1000, 800), max_bounces=5)
    else:
        spec = BS.suite_configs()[name]
        scene = spec["scene"]().to_device()
        cfg = RenderConfig(engine="binned", **{**spec["cfg"],
                                               "samples_per_pixel": spp,
                                               "samples_per_chunk": spp})
    world = jax.jit(bake_world_triangles)(scene)
    key = jax.random.PRNGKey(0)

    @jax.jit
    def render():
        acc = render_accumulate(
            scene, key, cfg.camera, cfg.resolution, n_samples=spp,
            max_bounces=cfg.max_bounces, engine="binned", world=world,
        )
        return jnp.mean(acc)

    m = float(render())
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        m = float(render())
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    w, h = cfg.resolution
    rays = w * h * spp * cfg.max_bounces
    print(json.dumps({
        "scene": name, "spp": spp,
        "batch": MK.BINNED_SAMPLE_BATCH, "slab_tiles": MK.BINNED_SLAB_TILES,
        "mrays_per_s": round(rays / dt / 1e6, 2),
        "wall_s": round(dt, 4), "mean": round(m / spp, 5),
    }))


if __name__ == "__main__":
    main()
