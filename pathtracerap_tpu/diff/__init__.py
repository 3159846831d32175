from .grad import (
    extract_params,
    apply_params,
    render_for_params,
    render_aovs,
    image_loss,
    geometry_loss,
    make_train_step,
    make_sharded_train_step,
)

__all__ = [
    "extract_params",
    "apply_params",
    "render_for_params",
    "render_aovs",
    "image_loss",
    "geometry_loss",
    "make_train_step",
    "make_sharded_train_step",
]
