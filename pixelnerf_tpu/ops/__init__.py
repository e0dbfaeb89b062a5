from .grid_sample import grid_sample, resize_bilinear

__all__ = ["grid_sample", "resize_bilinear"]
