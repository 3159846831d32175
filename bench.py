"""Benchmark driver: forward path-tracing throughput on the reference scene.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload matches the reference's headline configuration
(``Config.h:12-19``): 1000x800 primary rays, 5 bounces, on the real chip.
Throughput counts ray-bounce traversals the way the reference's derived
upper bound does (SURVEY.md section 6: W*H*spp*bounces), i.e. dead lanes
count — the masked-wavefront analog of the reference's compacted launches.

vs_baseline is value / 100 (the BASELINE.json north-star target of
100 Mrays/s/chip); the reference itself publishes no numbers.
"""

from __future__ import annotations

import json
import time

import jax
import numpy as np


def main() -> None:
    from pathtracerap_tpu.config import RenderConfig
    from pathtracerap_tpu.render.wavefront import Renderer
    from pathtracerap_tpu.scene.build import build_reference_scene
    from pathtracerap_tpu.utils.profiling import enable_compile_cache

    # warm-start compiles across processes; first-ever compile of the fused
    # traversal kernels through the remote compile tunnel takes minutes
    enable_compile_cache()

    resolution = (1000, 800)
    # enough samples to amortize the fixed per-dispatch cost (~0.4 s through
    # the axon tunnel) the way the reference's 500-iteration run does
    # (Renderer.cpp:582); throughput converges by ~24 spp
    spp = 24
    max_bounces = 5

    # absorb the (highly variable) first-compile-in-process service cost on
    # a trivial program so the real compiles below are predictable
    import jax.numpy as jnp

    jax.jit(lambda x: x * 2.0)(jnp.ones((8,))).block_until_ready()

    scene = build_reference_scene().to_device()
    cfg = RenderConfig(
        resolution=resolution,
        samples_per_pixel=spp,
        max_bounces=max_bounces,
        engine="fused",
    )
    r = Renderer(scene, cfg)

    # warmup + compile; time with a host fetch — block_until_ready does not
    # reliably synchronize through the axon remote-execution tunnel
    np.asarray(r.render())

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        img = np.asarray(r.render())
        times.append(time.perf_counter() - t0)
    dt = min(times)

    rays = resolution[0] * resolution[1] * spp * max_bounces
    mrays = rays / dt / 1e6
    sanity = float(img.mean())
    assert 0.01 < sanity < 1.0, f"render sanity check failed: mean={sanity}"

    # fwd+bwd: one SGD step of the inverse renderer (pixel-loss grads via
    # the Pallas-forward/recompute-backward diff path, diff/fast.py) on the
    # same scene; BASELINE metric line is "Mrays/s/chip fwd+bwd"
    import jax.random as jrandom

    from pathtracerap_tpu.diff.grad import extract_params, make_train_step

    # 8 samples: with the one-hot material replay (diff/fast.py r4) the
    # step is megakernel-forward dominated, so spp amortizes the fixed
    # dispatch cost exactly like the forward bench (the r3 note about the
    # scatter-dominated backward not amortizing is obsolete — the scatter
    # is gone)
    bwd_spp = 8
    step = make_train_step(
        scene, cfg.camera, resolution, bwd_spp, max_bounces, tile_size=8192,
        engine="fused",
    )
    params = extract_params(scene, ("mat_color",))
    key = jrandom.PRNGKey(0)
    target = jnp.zeros((resolution[0] * resolution[1], 3), jnp.float32)
    loss, _ = step(params, target, key)  # compile + warmup
    float(loss)
    tb = []
    for _ in range(3):
        t0 = time.perf_counter()
        loss, _ = step(params, target, key)
        float(loss)
        tb.append(time.perf_counter() - t0)
    rays_b = resolution[0] * resolution[1] * bwd_spp * max_bounces
    mrays_b = rays_b / min(tb) / 1e6
    assert float(loss) > 0.0 and jnp.isfinite(loss)

    from pathtracerap_tpu.render.wavefront import effective_engine

    routed = effective_engine(cfg.engine, r.world, False,
                              n_rays=resolution[0] * resolution[1])
    print(
        json.dumps(
            {
                "metric": "fwd_path_trace_throughput",
                "value": round(mrays, 2),
                "unit": "Mrays/s/chip",
                "vs_baseline": round(mrays / 100.0, 4),
                "fwd_bwd_mrays_per_s": round(mrays_b, 2),
                "engine": routed,
            }
        )
    )


if __name__ == "__main__":
    main()
