from .mesh import make_ray_mesh, make_train_mesh
from .pipeline import RenderPipeline, unpack_simple

__all__ = ["RenderPipeline", "make_ray_mesh", "make_train_mesh", "unpack_simple"]
