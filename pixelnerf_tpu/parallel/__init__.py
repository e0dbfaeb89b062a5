from .mesh import (
    BATCH_KEY_KINDS,
    batch_shardings,
    make_ray_mesh,
    make_train_mesh,
)
from .pipeline import RenderPipeline, unpack_simple

__all__ = [
    "BATCH_KEY_KINDS",
    "RenderPipeline",
    "batch_shardings",
    "make_ray_mesh",
    "make_train_mesh",
    "unpack_simple",
]
