from . import core, reference_np

__all__ = ["core", "reference_np"]
