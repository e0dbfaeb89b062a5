from . import lpips

__all__ = ["lpips"]
