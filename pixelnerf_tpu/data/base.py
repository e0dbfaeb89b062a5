"""Shared dataset helpers: image IO, bbox-from-mask, camera decomposition.

The reference's `data/` package is absent from its snapshot (SURVEY §0.1); these
helpers implement the contract reconstructed from its call sites (SURVEY §2.6):
images (NV, H, W, 3) float32 in [-1, 1] (NHWC here — TPU layout), poses (NV, 4, 4)
camera-to-world in the standard x-right/y-up/z-out convention, masks (NV, H, W, 1),
bbox (NV, 4) as [cmin, rmin, cmax, rmax].
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import imageio.v2 as imageio
import numpy as np

# CV-camera (x right, y down, z forward) <-> GL-camera (x right, y up, z back)
CV_TO_GL = np.diag(np.array([1.0, -1.0, -1.0, 1.0], dtype=np.float32))


def load_image(path: str, size: Optional[Tuple[int, int]] = None) -> np.ndarray:
    """Load RGB image -> (H, W, 3) float32 in [-1, 1] (the upstream
    image_to_tensor convention; the fork's half-migration to [0,1] is a bug,
    SURVEY §0.5)."""
    img = imageio.imread(path)
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    if img.shape[-1] == 4:
        # composite alpha over white (NMR renders white-background RGBA)
        alpha = img[..., 3:4].astype(np.float32) / 255.0
        rgb = img[..., :3].astype(np.float32) / 255.0
        img = rgb * alpha + (1.0 - alpha)
    else:
        img = img[..., :3].astype(np.float32) / 255.0
    if size is not None and img.shape[:2] != size:
        import cv2

        img = cv2.resize(
            img, (size[1], size[0]), interpolation=cv2.INTER_AREA
        ).astype(np.float32)
    return img * 2.0 - 1.0


def load_mask(path: str, size: Optional[Tuple[int, int]] = None) -> np.ndarray:
    """Load a binary mask -> (H, W, 1) float32 in [0, 1]."""
    m = imageio.imread(path)
    if m.ndim == 3:
        m = m[..., -1] if m.shape[-1] == 4 else m[..., 0]
    m = m.astype(np.float32) / 255.0
    if size is not None and m.shape[:2] != size:
        import cv2

        m = cv2.resize(m, (size[1], size[0]), interpolation=cv2.INTER_NEAREST)
    return m[..., None]


def mask_to_bbox(mask: np.ndarray, thresh: float = 0.5) -> np.ndarray:
    """Tight foreground bbox [cmin, rmin, cmax, rmax] (the layout consumed by
    bbox_sample, reference train/train.py:296-298 + util.py:450-463)."""
    m = mask[..., 0] if mask.ndim == 3 else mask
    rows = np.any(m > thresh, axis=1)
    cols = np.any(m > thresh, axis=0)
    if not rows.any():
        h, w = m.shape
        return np.array([0, 0, w - 1, h - 1], dtype=np.float32)
    rmin, rmax = np.where(rows)[0][[0, -1]]
    cmin, cmax = np.where(cols)[0][[0, -1]]
    return np.array([cmin, rmin, cmax, rmax], dtype=np.float32)


def mask_from_white_background(img: np.ndarray, thresh: float = 0.996) -> np.ndarray:
    """Foreground mask from a white-background render; img in [-1, 1]."""
    white = np.all(img > (thresh * 2.0 - 1.0), axis=-1)
    return (~white).astype(np.float32)[..., None]


def decompose_projection(P: np.ndarray):
    """Decompose a 3x4 CV projection matrix P = K [R|t] into (K, c2w_gl).

    Returns intrinsics K (3, 3, normalized so K[2,2]=1) and the 4x4
    camera-to-world matrix in the GL convention used throughout the framework.
    """
    import cv2

    K, R, t_h = cv2.decomposeProjectionMatrix(P.astype(np.float64))[:3]
    # cv2's RQ does not fix signs: a projection stored with a NEGATIVE
    # overall scale (real DTU world_mats have arbitrary projective scale)
    # comes back with negative focal lengths and a flipped rotation.
    # Normalize: positive-diagonal K (K S)(S R) = K R, then absorb the
    # projective sign into R so it is a proper rotation; the camera center
    # (P's null space) is scale/sign independent.
    S = np.diag(np.sign(np.diag(K)))
    K = K @ S
    R = S @ R
    if np.linalg.det(R) < 0:
        R = -R
    K = (K / K[2, 2]).astype(np.float32)
    center = (t_h[:3, 0] / t_h[3, 0]).astype(np.float32)
    # R is the world->camera rotation of the CV camera
    w2c = np.eye(4, dtype=np.float32)
    w2c[:3, :3] = R.astype(np.float32)
    w2c[:3, 3] = -R.astype(np.float32) @ center
    c2w_cv = np.linalg.inv(w2c)
    return K, (c2w_cv @ CV_TO_GL).astype(np.float32)


class BaseDataset:
    """Minimal dataset protocol: __len__, __getitem__ -> dict of numpy arrays,
    plus the attributes the renderer/trainer read (SURVEY §2.6): z_near, z_far,
    lindisp."""

    z_near: float = 0.8
    z_far: float = 1.8
    lindisp: bool = False

    def __len__(self) -> int:
        raise NotImplementedError

    def __getitem__(self, index: int) -> dict:
        raise NotImplementedError
