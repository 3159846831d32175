from .camera import generate_rays
from .wavefront import Renderer, render_image, render_accumulate

__all__ = ["generate_rays", "Renderer", "render_image", "render_accumulate"]
