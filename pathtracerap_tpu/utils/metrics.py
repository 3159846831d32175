"""Structured per-render metrics.

The reference's observability is two ``std::cout`` wall-time prints and a
memory report (``Renderer.cpp:643,647``, ``utility.h:37-38``).  This module
provides the structured equivalent: per-chunk timings, derived Mrays/s,
live-ray statistics, JSONL emission, and host-0 gating for multi-process
runs.
"""

from __future__ import annotations

import dataclasses
import json
import sys
import time
from typing import List, Optional, TextIO

import jax


@dataclasses.dataclass
class RenderMetrics:
    resolution: tuple
    samples_per_pixel: int
    max_bounces: int
    engine: str
    wall_s: float
    samples_done: int
    mrays_per_s: float
    device: str
    chunks: List[dict] = dataclasses.field(default_factory=list)
    # fraction of rays alive entering each bounce (SURVEY.md section 5
    # "live-ray curve per bounce"); filled by Renderer.render when a
    # metrics logger is attached
    live_ray_curve: List[float] = dataclasses.field(default_factory=list)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self))


class MetricsLogger:
    """Collects chunk timings during a render; host-0 only output."""

    def __init__(self, config, stream: Optional[TextIO] = None, enabled: bool = True):
        self.config = config
        self.stream = stream or sys.stderr
        self.enabled = enabled and jax.process_index() == 0
        self.chunks: List[dict] = []
        self.live_ray_curve: List[float] = []
        self._t0 = time.perf_counter()

    def chunk_done(self, samples: int, wall_s: float) -> None:
        w, h = self.config.resolution
        rays = w * h * samples * self.config.max_bounces
        rec = {
            "samples": samples,
            "wall_s": round(wall_s, 4),
            "mrays_per_s": round(rays / wall_s / 1e6, 2),
        }
        self.chunks.append(rec)
        if self.enabled:
            print(f"[metrics] chunk {json.dumps(rec)}", file=self.stream, flush=True)

    def record_live_curve(self, curve) -> None:
        self.live_ray_curve = list(curve)
        if self.enabled:
            print(f"[metrics] live_ray_curve {json.dumps(self.live_ray_curve)}",
                  file=self.stream, flush=True)

    def finalize(self, samples_done: int) -> RenderMetrics:
        wall = time.perf_counter() - self._t0
        w, h = self.config.resolution
        rays = w * h * samples_done * self.config.max_bounces
        m = RenderMetrics(
            resolution=tuple(self.config.resolution),
            samples_per_pixel=self.config.samples_per_pixel,
            max_bounces=self.config.max_bounces,
            engine=self.config.engine,
            wall_s=round(wall, 4),
            samples_done=samples_done,
            mrays_per_s=round(rays / wall / 1e6, 2) if wall > 0 else 0.0,
            device=str(jax.devices()[0]),
            chunks=self.chunks,
            live_ray_curve=self.live_ray_curve,
        )
        if self.enabled:
            print(f"[metrics] render {m.to_json()}", file=self.stream, flush=True)
        return m
