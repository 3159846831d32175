from .types import MaterialType, Material, SceneHost, SceneDevice, WorldTriangles
from .build import (
    SceneBuilder,
    build_reference_scene,
    build_cornell_box_scene,
)
from .grid import build_uniform_grid, UniformGrid

__all__ = [
    "MaterialType",
    "Material",
    "SceneHost",
    "SceneDevice",
    "WorldTriangles",
    "SceneBuilder",
    "build_reference_scene",
    "build_cornell_box_scene",
    "build_uniform_grid",
    "UniformGrid",
]
