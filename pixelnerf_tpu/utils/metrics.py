"""Image quality metrics and visualization helpers.

PSNR matches reference util.psnr (util.py:479-486).  SSIM implements
skimage.metrics.structural_similarity defaults (7x7 uniform window, K1=0.01,
K2=0.03, sample covariance normalization) since skimage is not available in this
environment — the eval scripts (reference eval/eval.py:324-332,
calc_metrics.py:189-191) depend on those exact semantics.
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np


def psnr(pred: np.ndarray, target: np.ndarray) -> float:
    """PSNR in dB for arrays in [0, 1] (util.py:479-486)."""
    mse = float(np.mean((np.asarray(pred) - np.asarray(target)) ** 2))
    if mse == 0:
        return float("inf")
    return -10.0 * math.log10(mse)


def _uniform_filter(img: np.ndarray, size: int) -> np.ndarray:
    """Mean filter with reflect-free 'valid'-equivalent handling via cumsum;
    matches scipy.ndimage.uniform_filter on the interior, and SSIM crops to the
    interior anyway (skimage pad=win//2 crop)."""
    from scipy.ndimage import uniform_filter

    return uniform_filter(img, size=size, mode="reflect")


def ssim(
    img0: np.ndarray,
    img1: np.ndarray,
    data_range: float = 1.0,
    win_size: int = 7,
    K1: float = 0.01,
    K2: float = 0.03,
    channel_axis: Optional[int] = -1,
) -> float:
    """Structural similarity with skimage-compatible defaults.

    Multichannel inputs are averaged over channels (skimage multichannel=True
    behavior used by eval.py:324-332).
    """
    img0 = np.asarray(img0, dtype=np.float64)
    img1 = np.asarray(img1, dtype=np.float64)
    if channel_axis is not None and img0.ndim == 3:
        vals = [
            ssim(
                np.take(img0, c, axis=channel_axis),
                np.take(img1, c, axis=channel_axis),
                data_range=data_range,
                win_size=win_size,
                K1=K1,
                K2=K2,
                channel_axis=None,
            )
            for c in range(img0.shape[channel_axis])
        ]
        return float(np.mean(vals))

    NP = win_size**img0.ndim
    cov_norm = NP / (NP - 1)  # sample covariance (skimage default)
    ux = _uniform_filter(img0, win_size)
    uy = _uniform_filter(img1, win_size)
    uxx = _uniform_filter(img0 * img0, win_size)
    uyy = _uniform_filter(img1 * img1, win_size)
    uxy = _uniform_filter(img0 * img1, win_size)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    C1 = (K1 * data_range) ** 2
    C2 = (K2 * data_range) ** 2
    S = ((2 * ux * uy + C1) * (2 * vxy + C2)) / (
        (ux**2 + uy**2 + C1) * (vx + vy + C2)
    )
    pad = (win_size - 1) // 2
    core = S[tuple(slice(pad, s - pad) for s in S.shape)]
    return float(core.mean())


def image_float_to_uint8(img: np.ndarray) -> np.ndarray:
    """Min-max normalize a float image to uint8 (util.py:12-23)."""
    img = np.asarray(img, dtype=np.float32)
    vmin, vmax = float(np.min(img)), float(np.max(img))
    if vmax - vmin < 1e-10:
        vmax += 1e-10
    img = (img - vmin) / (vmax - vmin) * 255.0
    return img.astype(np.uint8)


def cmap(img: np.ndarray, color_map: Optional[int] = None) -> np.ndarray:
    """Apply the HOT colormap to a float image -> (H, W, 3) uint8 RGB
    (util.py:26-30; used for depth/alpha rows in vis grids)."""
    import cv2

    if color_map is None:
        color_map = cv2.COLORMAP_HOT
    bgr = cv2.applyColorMap(image_float_to_uint8(img), color_map)
    return bgr[..., ::-1]
