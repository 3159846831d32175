from .sharding import (
    default_mesh,
    render_accumulate_dp,
    render_image_dp,
)

__all__ = ["default_mesh", "render_accumulate_dp", "render_image_dp"]
