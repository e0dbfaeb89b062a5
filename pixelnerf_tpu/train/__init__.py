from . import checkpoints

__all__ = ["checkpoints"]
