"""SRN chairs/cars dataset adapter (format ``srn``).

On-disk layout (the public SRN release referenced by README.md:45-48):

    <datadir>/<category>_<split>/<object>/
        rgb/NNNNNN.png          white-background renders
        pose/NNNNNN.txt         16 floats, row-major 4x4 camera-to-world
        intrinsics.txt          "f cx cy 0." on the first line, "H W" on the last

SRN poses use a CV-style camera (z forward); they are converted to the standard
GL convention by right-multiplying diag(1,-1,-1,1).  z bounds follow the
reference defaults: cars 0.8-1.8 (eval_real.py:47-48), chairs 1.25-2.75.
"""

from __future__ import annotations

import glob
import os

import numpy as np

from .base import (
    BaseDataset,
    CV_TO_GL,
    load_image,
    mask_from_white_background,
    mask_to_bbox,
)


class SRNDataset(BaseDataset):
    def __init__(self, path: str, stage: str = "train", image_size=(128, 128), world_scale: float = 1.0):
        self.base_path = path
        self.stage = stage
        self.image_size = tuple(image_size)
        self.world_scale = float(world_scale)

        cands = sorted(glob.glob(os.path.join(path, f"*_{stage}")))
        if len(cands) == 0 and os.path.isdir(os.path.join(path, stage)):
            cands = [os.path.join(path, stage)]
        if len(cands) == 0:
            raise FileNotFoundError(
                f"No SRN '<cat>_{stage}' directory under {path!r}"
            )
        self.split_dir = cands[0]
        is_chair = "chair" in os.path.basename(self.split_dir)
        # SRN chairs train set nests one extra level
        nested = os.path.join(self.split_dir, os.path.basename(self.split_dir))
        if is_chair and stage == "train" and os.path.isdir(nested):
            self.split_dir = nested

        self.objs = sorted(
            d
            for d in glob.glob(os.path.join(self.split_dir, "*"))
            if os.path.isdir(os.path.join(d, "rgb"))
        )
        if is_chair:
            self.z_near, self.z_far = 1.25, 2.75
        else:
            self.z_near, self.z_far = 0.8, 1.8
        self.lindisp = False

    def __len__(self) -> int:
        return len(self.objs)

    def __getitem__(self, index: int) -> dict:
        obj_dir = self.objs[index]
        rgb_paths = sorted(glob.glob(os.path.join(obj_dir, "rgb", "*")))
        pose_paths = sorted(glob.glob(os.path.join(obj_dir, "pose", "*")))
        assert len(rgb_paths) == len(pose_paths), obj_dir

        with open(os.path.join(obj_dir, "intrinsics.txt")) as f:
            focal, cx, cy, _ = map(float, f.readline().split())

        images, poses, masks, bboxes = [], [], [], []
        for rgb_path, pose_path in zip(rgb_paths, pose_paths):
            img = load_image(rgb_path, size=self.image_size)
            pose = np.loadtxt(pose_path, dtype=np.float32).reshape(4, 4)
            pose = pose @ CV_TO_GL
            if self.world_scale != 1.0:
                pose[:3, 3] *= self.world_scale
            mask = mask_from_white_background(img)
            images.append(img)
            poses.append(pose)
            masks.append(mask)
            bboxes.append(mask_to_bbox(mask))

        result = {
            "path": obj_dir,
            "img_id": index,
            "images": np.stack(images).astype(np.float32),
            "poses": np.stack(poses).astype(np.float32),
            "masks": np.stack(masks).astype(np.float32),
            "bbox": np.stack(bboxes).astype(np.float32),
            "focal": np.float32(focal * self.world_scale),
            "c": np.array([[cx, cy]], dtype=np.float32),  # (1,2): see encode's
            # 1-D-means-per-view convention (backup2:133-135)
        }
        return result
