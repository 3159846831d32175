"""Traversal/debug visualizer.

The reference *declared* a debug visualizer (``Debug_Visualizer.h:11``
behind ``ENABLE_VISUALIZER``, with per-ray visited-voxel recording hooks in
the traversal, ``Renderer.h:36-43`` / ``Renderer.cpp:316-319``) but ships
no implementation — enabling the flag cannot link.  This module is the
working equivalent: first-hit AOV images (depth, world normal, material id,
flat color) plus DDA traversal heatmaps (voxel steps per ray, triangle
tests per ray) rendered to BMPs.
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np
import jax
import jax.numpy as jnp

from ..config import RenderConfig
from ..io.bmp import write_bmp
from ..ops.intersect import trace_parity
from ..scene.types import SceneDevice
from .camera import generate_rays


def render_aovs(scene: SceneDevice, config: RenderConfig) -> Dict[str, np.ndarray]:
    """Returns a dict of (H, W, ...) float arrays of first-hit AOVs and
    traversal statistics."""
    w, h = config.resolution
    ro, rd = generate_rays(config.camera, config.resolution)
    hits, stats = jax.jit(
        lambda s, o, d: trace_parity(s, o, d, return_stats=True)
    )(scene, ro, rd)

    t = np.asarray(hits.t).reshape(h, w)
    hit = t < 9999999.0
    return {
        "depth": np.where(hit, t, np.nan),
        "normal": np.asarray(hits.normal).reshape(h, w, 3),
        "mat_type": np.asarray(hits.mat_type).reshape(h, w),
        "albedo": np.asarray(hits.mat_color).reshape(h, w, 3),
        "hit": hit,
        "dda_steps": np.asarray(stats["steps"]).reshape(h, w),
        "tri_tests": np.asarray(stats["tri_tests"]).reshape(h, w),
    }


def _to_u8(x: np.ndarray) -> np.ndarray:
    x = np.clip(x, 0.0, 1.0)
    return (x * 255.0).astype(np.uint8)


def _colorize_scalar(x: np.ndarray) -> np.ndarray:
    """Normalized grayscale (NaN -> 0) replicated to 3 channels."""
    v = np.nan_to_num(x, nan=0.0).astype(np.float64)
    lo, hi = v.min(), v.max()
    g = (v - lo) / (hi - lo) if hi > lo else np.zeros_like(v)
    return np.repeat(_to_u8(g)[..., None], 3, axis=2)


def write_aov_bmps(scene: SceneDevice, config: RenderConfig, out_dir: str) -> Dict[str, str]:
    """Render all AOVs and write one BMP each; returns {name: path}."""
    os.makedirs(out_dir, exist_ok=True)
    aovs = render_aovs(scene, config)
    paths = {}

    images = {
        "depth": _colorize_scalar(aovs["depth"]),
        "normal": _to_u8(np.asarray(aovs["normal"]) * 0.5 + 0.5),
        "mat_type": _colorize_scalar(aovs["mat_type"].astype(np.float32)),
        "albedo": _to_u8(aovs["albedo"]),
        "hit": _colorize_scalar(aovs["hit"].astype(np.float32)),
        "dda_steps": _colorize_scalar(aovs["dda_steps"].astype(np.float32)),
        "tri_tests": _colorize_scalar(aovs["tri_tests"].astype(np.float32)),
    }
    for name, img in images.items():
        p = os.path.join(out_dir, f"{name}.bmp")
        write_bmp(p, img)
        paths[name] = p
    return paths
