from .math import (
    transform_position,
    transform_direction,
    transform_normal,
    reflect_parity,
    reflect_standard,
    normalize,
)
from .rng import sample_uniforms
from .sampling import cosine_hemisphere, metal_scatter, coat_scatter
from .intersect import HitRecord, trace_parity, moller_trumbore, slab_test
from .plucker import bake_world_triangles, trace_mxu

__all__ = [
    "transform_position",
    "transform_direction",
    "transform_normal",
    "reflect_parity",
    "reflect_standard",
    "normalize",
    "sample_uniforms",
    "cosine_hemisphere",
    "metal_scatter",
    "coat_scatter",
    "HitRecord",
    "trace_parity",
    "trace_mxu",
    "bake_world_triangles",
    "moller_trumbore",
    "slab_test",
]
