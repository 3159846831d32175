from .obj import load_obj
from .bmp import write_bmp, read_bmp

__all__ = ["load_obj", "write_bmp", "read_bmp"]
