from .obj import load_obj
from .ply import load_ply
from .bmp import write_bmp, read_bmp

__all__ = ["load_obj", "load_ply", "write_bmp", "read_bmp"]
