"""Benchmark suite: the BASELINE.json forward configs as runnable benchmarks.

Configs (BASELINE.md "Benchmark configs"):
  1. cornell   — Cornell box, diffuse-only, 256x256, 4 bounces, 64 spp
  2. highpoly  — dense mesh traversal, 512x512, 8 bounces (the bunny OBJ is
                 LFS-missing upstream, PathTracerAP/.MISSING_LARGE_BLOBS, so
                 a ~73k-triangle synthetic sphere stands in: same regime —
                 triangle count far above the VMEM-resident pack limit,
                 exercising the blocked-DMA dense kernel)
  3. metallic  — the reference scene (3 METAL/COAT/REFLECTIVE monkeys,
                 README metallic render), 1024x1024, 256 spp
  4. multimesh — multi-mesh mixed-material scene, 1024x1024, 1024 spp

Full-quality spp on configs 3/4 is hours of wall time; throughput is what
the baseline tracks, so each config times ``measure_spp`` samples and
reports Mrays/s (dead lanes counted, like the reference's derived bound —
SURVEY.md section 6) plus the wall time a full-spp render would take at
that rate.
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional

import numpy as np

from .config import CameraConfig, RenderConfig
from .scene.build import (
    SceneBuilder,
    build_cornell_box_scene,
    build_reference_scene,
    make_box_mesh,
    make_sphere_mesh,
)
from .scene.types import Material, MaterialType


def build_highpoly_scene(subdiv: int = 192):
    """A dense (~2*subdiv^2 triangles) sphere in a diffuse room."""
    b = SceneBuilder()
    room = b.add_mesh(make_box_mesh(size=(400.0, 400.0, 400.0), inward=True))
    ball = b.add_mesh(make_sphere_mesh(radius=80.0, subdiv=subdiv))
    panel = b.add_mesh(make_box_mesh(size=(120.0, 4.0, 120.0)))
    M = MaterialType
    b.add_instance(room, Material(M.DIFFUSE, (0.9, 0.9, 0.9)))
    b.add_instance(ball, Material(M.DIFFUSE, (0.8, 0.3, 0.2)),
                   translate=(0.0, -40.0, 0.0))
    b.add_instance(panel, Material(M.EMISSIVE, (1.0, 1.0, 1.0)),
                   translate=(0.0, 190.0, 0.0))
    return b.build()


def build_multimesh_scene():
    """Mixed materials over several meshes (BASELINE config 4)."""
    b = SceneBuilder()
    room = b.add_mesh(make_box_mesh(size=(400.0, 400.0, 400.0), inward=True))
    ball = b.add_mesh(make_sphere_mesh(radius=50.0, subdiv=48))
    cube = b.add_mesh(make_box_mesh(size=(70.0, 70.0, 70.0)))
    panel = b.add_mesh(make_box_mesh(size=(140.0, 4.0, 140.0)))
    M = MaterialType
    b.add_instance(room, Material(M.DIFFUSE, (0.85, 0.85, 0.85)))
    b.add_instance(ball, Material(M.METAL, (0.9, 0.7, 0.2)),
                   translate=(-90.0, -60.0, 20.0))
    b.add_instance(ball, Material(M.COAT, (0.3, 0.5, 0.9)),
                   translate=(90.0, -60.0, -30.0))
    b.add_instance(cube, Material(M.REFLECTIVE, (0.9, 0.9, 0.9)),
                   translate=(0.0, -120.0, -80.0), rotate_y_deg=30.0)
    b.add_instance(cube, Material(M.DIFFUSE, (0.2, 0.8, 0.3)),
                   translate=(20.0, -120.0, 100.0), rotate_y_deg=-20.0)
    b.add_instance(panel, Material(M.EMISSIVE, (1.0, 1.0, 1.0)),
                   translate=(0.0, 190.0, 0.0))
    return b.build()


_ROOM_CAMERA = CameraConfig(
    position=(0.0, 0.0, 380.0),
    plane_x=(-120.0, 120.0),
    plane_y=(-96.0, 96.0),
    plane_z=240.0,
)


def suite_configs() -> Dict[str, dict]:
    return {
        "cornell": dict(
            scene=build_cornell_box_scene,
            cfg=dict(resolution=(256, 256), samples_per_pixel=64, max_bounces=4,
                     camera=CameraConfig(position=(0.0, 0.0, 150.0),
                                         plane_x=(-40.0, 40.0),
                                         plane_y=(-40.0, 40.0),
                                         plane_z=100.0)),
            measure_spp=16,
        ),
        "highpoly": dict(
            scene=build_highpoly_scene,
            cfg=dict(resolution=(512, 512), samples_per_pixel=64, max_bounces=8,
                     camera=_ROOM_CAMERA),
            measure_spp=4,
        ),
        "metallic": dict(
            scene=build_reference_scene,
            cfg=dict(resolution=(1024, 1024), samples_per_pixel=256,
                     max_bounces=5),
            measure_spp=8,
        ),
        "multimesh": dict(
            scene=build_multimesh_scene,
            cfg=dict(resolution=(1024, 1024), samples_per_pixel=1024,
                     max_bounces=5, camera=_ROOM_CAMERA),
            measure_spp=8,
        ),
    }


def run_config(name: str, engine: str = "fused", repeats: int = 2) -> dict:
    from .render.wavefront import Renderer

    spec = suite_configs()[name]
    scene = spec["scene"]().to_device()
    spp = spec["measure_spp"]
    cfg = RenderConfig(engine=engine, **{**spec["cfg"],
                                         "samples_per_pixel": spp,
                                         "samples_per_chunk": spp})
    r = Renderer(scene, cfg)
    # report the engine that actually runs (pack-limit fallback, many-block
    # fused->binned switch — render/wavefront.effective_engine)
    from .render.wavefront import effective_engine

    actual_engine = effective_engine(cfg.engine, r.world, cfg.camera.jitter)
    img = np.asarray(r.render())
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        img = np.asarray(r.render())
        best = min(best, time.perf_counter() - t0)
    w, h = cfg.resolution
    rays = w * h * spp * cfg.max_bounces
    mrays = rays / best / 1e6
    full_spp = spec["cfg"].get("samples_per_pixel", spp)
    return {
        "config": name,
        "engine": actual_engine,
        "resolution": [w, h],
        "full_spp": full_spp,
        "measured_spp": spp,
        "bounces": cfg.max_bounces,
        "triangles": int(scene.tri_vidx.shape[0]),
        "wall_s": round(best, 4),
        "mrays_per_s": round(mrays, 2),
        "projected_full_render_s": round(best * full_spp / spp, 1),
        "image_mean": round(float(img.mean()), 5),
    }


def run_suite(which: str = "baseline", engine: str = "fused",
              names: Optional[List[str]] = None) -> dict:
    import jax

    if which != "baseline":
        raise ValueError(f"unknown suite {which!r}; only 'baseline' exists")
    names = names or list(suite_configs().keys())
    return {
        "suite": which,
        "device": str(jax.devices()[0]),
        "configs": [run_config(n, engine=engine) for n in names],
    }
