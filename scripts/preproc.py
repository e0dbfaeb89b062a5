"""Preprocess in-the-wild images for eval_real: segment the foreground object,
fit a crop around it, and write ``<name>_normalize.png`` on a white background
(the contract consumed by eval/eval_real.py; reference scripts/preproc.py:106-303).

Backends, in order of preference:
  * detectron2 PointRend instance segmentation (the reference's segmenter) when
    detectron2 is installed (`--backend pointrend`);
  * an OpenCV GrabCut fallback (`--backend grabcut`, default here) that needs no
    ML dependencies: initialized from a centered rectangle (or --rect), iterated,
    largest component kept.

Both produce the same output contract: an ellipse/bbox-normalized square crop,
object scaled to ~80% of the frame, alpha-composited over white.
"""

import argparse
import glob
import os

import cv2
import numpy as np

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def segment_grabcut(img_bgr: np.ndarray, rect=None, iters: int = 5) -> np.ndarray:
    """Foreground mask via GrabCut (uint8 {0,1})."""
    h, w = img_bgr.shape[:2]
    if rect is None:
        m = int(0.05 * min(h, w))
        rect = (m, m, w - 2 * m, h - 2 * m)
    mask = np.zeros((h, w), np.uint8)
    bgd = np.zeros((1, 65), np.float64)
    fgd = np.zeros((1, 65), np.float64)
    cv2.grabCut(img_bgr, mask, rect, bgd, fgd, iters, cv2.GC_INIT_WITH_RECT)
    fg = ((mask == cv2.GC_FGD) | (mask == cv2.GC_PR_FGD)).astype(np.uint8)
    # keep the largest connected component
    n, labels, stats, _ = cv2.connectedComponentsWithStats(fg, 8)
    if n > 1:
        largest = 1 + int(np.argmax(stats[1:, cv2.CC_STAT_AREA]))
        fg = (labels == largest).astype(np.uint8)
    return fg


def segment_pointrend(img_bgr: np.ndarray):
    """PointRend segmentation, mirroring the reference wrapper
    (preproc.py:106-173).  Returns uint8 mask or None if nothing detected."""
    from detectron2.config import get_cfg
    from detectron2.engine import DefaultPredictor
    from detectron2.projects import point_rend

    cfg = get_cfg()
    point_rend.add_pointrend_config(cfg)
    cfg.merge_from_file(
        os.path.join(
            os.path.dirname(point_rend.__file__),
            "..",
            "configs",
            "InstanceSegmentation",
            "pointrend_rcnn_R_50_FPN_3x_coco.yaml",
        )
    )
    cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST = 0.5
    predictor = DefaultPredictor(cfg)
    out = predictor(img_bgr)
    inst = out["instances"]
    if len(inst) == 0:
        return None
    best = int(inst.scores.argmax())
    return inst.pred_masks[best].cpu().numpy().astype(np.uint8)


def normalize_crop(
    img_bgr: np.ndarray,
    mask: np.ndarray,
    out_size: int = 128,
    obj_frac: float = 0.8,
) -> np.ndarray:
    """Ellipse-fit the mask, crop a square around the object scaled so it fills
    ~obj_frac of the frame, composite over white (reference preproc.py:192-269
    crop heuristic)."""
    ys, xs = np.nonzero(mask)
    if len(xs) == 0:
        raise ValueError("empty mask")
    pts = np.stack([xs, ys], axis=-1).astype(np.float32)
    if len(pts) >= 5:
        (cx, cy), (MA, ma), _ = cv2.fitEllipse(pts)
        radius = max(MA, ma) * 0.5
    else:
        cx, cy = xs.mean(), ys.mean()
        radius = max(xs.ptp(), ys.ptp()) * 0.5
    half = radius / obj_frac

    white = np.full_like(img_bgr, 255)
    comp = np.where(mask[..., None] > 0, img_bgr, white)

    x0, x1 = int(cx - half), int(cx + half)
    y0, y1 = int(cy - half), int(cy + half)
    pad_l, pad_t = max(0, -x0), max(0, -y0)
    pad_r = max(0, x1 - comp.shape[1])
    pad_b = max(0, y1 - comp.shape[0])
    comp = cv2.copyMakeBorder(
        comp, pad_t, pad_b, pad_l, pad_r, cv2.BORDER_CONSTANT, value=(255, 255, 255)
    )
    crop = comp[y0 + pad_t : y1 + pad_t, x0 + pad_l : x1 + pad_l]
    return cv2.resize(crop, (out_size, out_size), interpolation=cv2.INTER_AREA)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--input", "-I", type=str, default=os.path.join(ROOT, "input")
    )
    parser.add_argument("--size", type=int, default=128, help="Output size")
    parser.add_argument(
        "--backend",
        type=str,
        default="auto",
        choices=["auto", "pointrend", "grabcut"],
    )
    parser.add_argument(
        "--rect",
        type=str,
        default="",
        help="GrabCut init rect 'x y w h' (default: centered)",
    )
    parser.add_argument("--scale", type=float, default=0.8, help="Object fraction")
    args = parser.parse_args()

    backend = args.backend
    if backend == "auto":
        try:
            import detectron2  # noqa: F401

            backend = "pointrend"
        except ImportError:
            backend = "grabcut"
    print("Segmentation backend:", backend)

    rect = tuple(map(int, args.rect.split())) if args.rect else None

    images = [
        p
        for p in sorted(glob.glob(os.path.join(args.input, "*")))
        if os.path.splitext(p)[1].lower() in (".jpg", ".jpeg", ".png")
        and not p.endswith("_normalize.png")
    ]
    if not images:
        print("No input images found in", args.input)
        return
    for path in images:
        print("Processing", path)
        img = cv2.imread(path, cv2.IMREAD_COLOR)
        if backend == "pointrend":
            mask = segment_pointrend(img)
            if mask is None:
                print("  no instance found; falling back to grabcut")
                mask = segment_grabcut(img, rect)
        else:
            mask = segment_grabcut(img, rect)
        try:
            out = normalize_crop(img, mask, out_size=args.size, obj_frac=args.scale)
        except ValueError:
            print("  empty mask, skipped")
            continue
        out_path = os.path.splitext(path)[0] + "_normalize.png"
        cv2.imwrite(out_path, out)
        print("  wrote", out_path)


if __name__ == "__main__":
    main()
