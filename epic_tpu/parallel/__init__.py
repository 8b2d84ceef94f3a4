from . import sharded
from .sharded import make_mesh

__all__ = ["sharded", "make_mesh"]
