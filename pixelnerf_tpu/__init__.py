"""pixelnerf_tpu — a TPU-native (JAX/Flax/Pallas) pixel-NeRF multiscale framework.

A from-scratch rebuild of the capabilities of Zxhh123/pixel-nerf-multiscale
(few-shot novel view synthesis: pixel-aligned ResNet features + conditioned
NeRF MLP + volume rendering, with multi-scale feature fusion) designed for
TPU hardware: functional models, jitted renderers, SPMD ray sharding over
device meshes, and Pallas kernels on the hot paths.

Subpackages
-----------
config    HOCON config trees + CLI argument surface
utils     geometry / metrics / torch-weight conversion
ops       grid-sample gather, compositing, importance sampling (XLA + Pallas)
models    Flax encoder/MLP/fusion modules and the PixelNeRF net
render    stratified+importance sampling and volume rendering
data      SRN / DVR / DTU / multi-object dataset adapters
train     epoch trainer, optax optimization, orbax checkpoints
parallel  mesh construction and sharded render/train steps
eval      metrics (SSIM / LPIPS) and evaluation helpers
"""

__version__ = "0.1.0"
