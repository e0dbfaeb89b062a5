from .code import PositionalEncoding
from .encoder import GlobalEncoder, ImageEncoder, SpatialEncoder
from .mlp import ImplicitNet
from .pixelnerf import EncodedScene, PixelNeRFNet, make_encode_fn, make_model
from .resnetfc import ResnetBlockFC, ResnetFC
from .attention import (
    CBAM,
    ChannelAttention,
    CrossViewAttention,
    MultiViewAttention,
    SpatialAttention,
)
from .fusion import (
    AdaptiveFeatureSampler,
    MultiScaleFusionModule,
    SmartFeatureFusion,
    create_feature_fusion,
)

__all__ = [
    "PositionalEncoding",
    "GlobalEncoder",
    "ImageEncoder",
    "SpatialEncoder",
    "ImplicitNet",
    "EncodedScene",
    "PixelNeRFNet",
    "make_encode_fn",
    "make_model",
    "ResnetBlockFC",
    "ResnetFC",
    "CBAM",
    "ChannelAttention",
    "CrossViewAttention",
    "MultiViewAttention",
    "SpatialAttention",
    "AdaptiveFeatureSampler",
    "MultiScaleFusionModule",
    "SmartFeatureFusion",
    "create_feature_fusion",
]
