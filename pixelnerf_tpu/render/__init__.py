from .renderer import NeRFRenderer, RenderConfig, composite, render_rays
from . import rays

__all__ = ["NeRFRenderer", "RenderConfig", "composite", "render_rays", "rays"]
