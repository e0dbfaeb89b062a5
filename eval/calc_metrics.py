"""Standalone metrics computation over rendered outputs (CLI parity with the
reference eval/calc_metrics.py:23-349): map step writes per-object metrics.txt
(PSNR/SSIM + LPIPS when weights are available), reduce step aggregates into
all_metrics.txt with an optional per-category table.

LPIPS: the torch ``lpips`` package isn't available offline; supply weights via
--lpips_weights / LPIPS_WEIGHTS env to enable it, otherwise LPIPS is reported
as nan and noted.
"""

import argparse
import json
import os
import os.path as osp
import sys
import warnings

sys.path.insert(0, osp.abspath(osp.join(osp.dirname(__file__), "..")))

import numpy as np

parser = argparse.ArgumentParser(description="Calculate metrics for rendered images.")
parser.add_argument("--datadir", "-D", type=str, required=True, help="Dataset directory")
parser.add_argument(
    "--output", "-O", type=str, default="eval", help="Root of rendered output (from eval.py)"
)
parser.add_argument(
    "--dataset_format", "-F", type=str, default="dvr", help="nerf | srn | dvr"
)
parser.add_argument(
    "--list_name", type=str, default="softras_test", help="Filter list prefix for DVR"
)
parser.add_argument(
    "--gpu_id", type=int, default=0, help="Device id (single device only)"
)
parser.add_argument("--overwrite", action="store_true", help="overwrite metrics.txt")
parser.add_argument(
    "--exclude_dtu_bad", action="store_true", help="exclude hardcoded DTU bad views"
)
parser.add_argument(
    "--multicat", action="store_true", help="Prepend category id to object id"
)
parser.add_argument(
    "--viewlist", "-L", type=str, default="", help="Source-view list to exclude"
)
parser.add_argument("--eval_view_list", type=str, default=None)
parser.add_argument("--primary", "-P", type=str, default="", help="Views to exclude")
parser.add_argument("--lpips_batch_size", type=int, default=32)
parser.add_argument("--lpips_weights", type=str, default=None)
parser.add_argument(
    "--reduce_only", "-R", action="store_true", help="skip the map step"
)
parser.add_argument(
    "--metadata", type=str, default="metadata.yaml", help="category metadata for --multicat"
)
parser.add_argument(
    "--dtu_sort", action="store_true", help="Sort using DTU scene order"
)
args = parser.parse_args()

if args.dataset_format in ("dvr", "dvr_gen", "dvr_dtu"):
    # dvr_gen/dvr_dtu share the DVR on-disk layout (the reference expects
    # plain "dvr" here, calc_metrics.py:38-44; accepting the specific format
    # names avoids a confusing failure when reusing the eval.py -F value)
    if args.dataset_format == "dvr_dtu" and args.list_name == "softras_test":
        args.list_name = "new_val"
    list_name = args.list_name + ".lst"
    img_dir_name = "image"
elif args.dataset_format == "srn":
    list_name = ""
    img_dir_name = "rgb"
elif args.dataset_format == "nerf":
    warnings.warn("test split not implemented for NeRF synthetic data format")
    list_name = ""
    img_dir_name = ""
else:
    raise NotImplementedError("Not supported data format " + args.dataset_format)

data_root = args.datadir
render_root = args.output

METRIC_NAMES = ["psnr", "ssim", "lpips"]

# views with bad GT in the DTU capture rig (reference calc_metrics.py:142-145)
DTU_BAD_VIEWS = [3, 4, 5, 6, 7, 16, 17, 18, 19, 20, 21, 36, 37, 38, 39]


def _load_metadata():
    path = osp.join(args.datadir, args.metadata)
    with open(path) as f:
        text = f.read()
    try:
        return json.loads(text)
    except json.JSONDecodeError:
        # minimal YAML subset: "cat:\n  name: ..." entries
        meta = {}
        cur = None
        for line in text.splitlines():
            if not line.strip() or line.strip().startswith("#"):
                continue
            if not line.startswith(" "):
                cur = line.split(":")[0].strip()
                meta[cur] = {}
            elif cur is not None and ":" in line:
                k, v = line.strip().split(":", 1)
                meta[cur][k.strip()] = v.strip()
        return meta


def run_map():
    import imageio.v2 as imageio

    from pixelnerf_tpu.utils import metrics as M

    try:
        from pixelnerf_tpu.eval.lpips import lpips_fn

        lpips = lpips_fn(args.lpips_weights)
        print("LPIPS enabled")
    except FileNotFoundError as e:
        print(f"LPIPS disabled: {e}")
        lpips = None

    exclude_lut = {}
    if args.viewlist:
        # viewlist rows: `<cat> <obj> <view view ...>` (viewlist/src_*.txt)
        print("Excluding views from list", args.viewlist)
        with open(args.viewlist) as f:
            for row in f:
                cat_id, obj_id, *views = row.split()
                exclude_lut[f"{cat_id}/{obj_id}"] = [int(v) for v in views]
    base_exclude_views = [int(v) for v in args.primary.split()]
    if args.exclude_dtu_bad:
        base_exclude_views += DTU_BAD_VIEWS

    eval_views = None
    if args.eval_view_list is not None:
        with open(args.eval_view_list) as f:
            eval_views = [int(v) for v in f.readline().split()]
        print("Only using views", eval_views)

    def split_members(cat_root):
        """Object ids of ``cat_root`` restricted to the split .lst, if any."""
        members = sorted(
            x for x in os.listdir(cat_root) if osp.isdir(osp.join(cat_root, x))
        )
        if list_name and osp.exists(osp.join(cat_root, list_name)):
            with open(osp.join(cat_root, list_name)) as f:
                keep = {ln.strip() for ln in f}
            members = [x for x in members if x in keep]
        return members

    # (gt object dir, render dir) pairs; render dir is `<cat>_<obj>` under
    # --multicat, bare `<obj>` otherwise — eval.py's output naming
    cat_ids = sorted(os.listdir(data_root)) if args.multicat else ["."]
    all_objs = []
    total_objs = 0
    print("CATEGORICAL SUMMARY")
    for cat_id in cat_ids:
        cat_root = osp.join(data_root, cat_id)
        if not osp.isdir(cat_root):
            continue
        n_cat = 0
        for obj_id in split_members(cat_root):
            rend_name = f"{cat_id}_{obj_id}" if args.multicat else obj_id
            rend_dir = osp.join(render_root, rend_name)
            n_cat += 1
            if osp.exists(rend_dir):
                all_objs.append((osp.join(cat_root, obj_id), rend_dir))
        print(cat_id, "TOTAL", n_cat, "AVAILABLE",
              sum(1 for g, _ in all_objs if g.startswith(cat_root + osp.sep)))
        total_objs += n_cat
    print(">>> USING", len(all_objs), "OF", total_objs, "OBJECTS")

    def load_image(p):
        return imageio.imread(p).astype(np.float32)[..., :3] / 255.0

    def eligible_pairs(gt_dir, rend_dir):
        """Yield (pred, gt) float [0,1] image pairs for every view of this
        object that has a render and isn't excluded (viewlist LUT keyed
        `<cat>/<obj>`, --primary, DTU bad views, --eval_view_list)."""
        im_root = osp.join(gt_dir, img_dir_name) if img_dir_name else gt_dir
        skip = set(base_exclude_views)
        skip.update(
            exclude_lut.get(osp.basename(rend_dir).replace("_", "/"), [])
        )
        for im_name in sorted(os.listdir(im_root)):
            stem, ext = osp.splitext(im_name)
            if ext not in (".jpg", ".png"):
                continue
            view = int(stem)
            rend_file = osp.join(rend_dir, f"{view:06}.png")
            if view in skip or not osp.exists(rend_file):
                continue
            if eval_views is not None and view not in eval_views:
                continue
            pred = load_image(rend_file)
            gt = load_image(osp.join(im_root, im_name))
            if pred.shape != gt.shape:
                # renders produced with eval.py --scale: compare at the render
                # resolution (matches eval.py's own scaled GT comparison)
                from PIL import Image

                gt = (
                    np.asarray(
                        Image.fromarray((gt * 255.0).astype(np.uint8)).resize(
                            (pred.shape[1], pred.shape[0]), Image.BILINEAR
                        )
                    ).astype(np.float32)
                    / 255.0
                )
            yield pred, gt

    def process_obj(gt_dir, rend_dir):
        out_path = osp.join(rend_dir, "metrics.txt")
        if osp.exists(out_path) and not args.overwrite:
            return
        pairs = list(eligible_pairs(gt_dir, rend_dir))
        if not pairs:
            return
        psnr = float(np.mean([M.psnr(p, g) for p, g in pairs]))
        ssim = float(np.mean([M.ssim(p, g, data_range=1.0) for p, g in pairs]))
        lpips_val = float("nan")
        if lpips is not None:
            # LPIPS consumes [-1, 1] batches
            preds = np.stack([p for p, _ in pairs]) * 2.0 - 1.0
            gts = np.stack([g for _, g in pairs]) * 2.0 - 1.0
            B = args.lpips_batch_size
            lpips_val = float(
                np.concatenate(
                    [
                        np.asarray(lpips(preds[s : s + B], gts[s : s + B]))
                        for s in range(0, len(pairs), B)
                    ]
                ).mean()
            )
        with open(out_path, "w") as f:
            f.write(f"psnr {psnr}\nssim {ssim}\nlpips {lpips_val}")

    for gt_dir, rend_dir in all_objs:
        process_obj(gt_dir, rend_dir)


def _metric_cells(avg: dict) -> str:
    """The all_metrics.txt value columns: `` psnr: x.xxxxxx ssim: ...``.

    The 6-decimal cell layout, the 12-char left-padded label column, and the
    ``---``-separated total row below are the byte contract of the reference's
    output (reference calc_metrics.py:317-341; sample README.md:219-238) —
    pinned by tests/test_cli.py::test_calc_metrics_reduce_format."""
    return "".join(f" {name}: {avg[name]:.6f}" for name in METRIC_NAMES)


def _metric_means(records) -> dict:
    return {
        name: float(np.mean([r[name] for r in records])) for name in METRIC_NAMES
    }


def run_reduce():
    """Aggregate every per-object metrics.txt under the render root into
    all_metrics.txt: parse each file into a record, group records by category
    (``--multicat``), emit one mean row per category plus the overall mean."""
    obj_dirs = sorted(
        d
        for d in (
            osp.join(render_root, x)
            for x in os.listdir(render_root)
            if not x.startswith("_")
        )
        if osp.isdir(d) and osp.isfile(osp.join(d, "metrics.txt"))
    )
    if args.dtu_sort:
        # DTU object dirs are scanNNN — numeric scene order
        obj_dirs.sort(key=lambda d: int(osp.basename(d)[4:]))
    print(">>> PROCESSING", len(obj_dirs), "OBJECTS")
    if not obj_dirs:
        return

    records = []  # (object dir, {metric: value})
    for d in obj_dirs:
        with open(osp.join(d, "metrics.txt")) as f:
            vals = {
                key: float(val)
                for key, val in (ln.split() for ln in f if ln.strip())
            }
        records.append((d, vals))
    if len(records) < 100:
        for d, vals in records:
            print(d, " ".join(repr(vals[n]) for n in METRIC_NAMES if n in vals))

    lines = []
    if args.multicat:
        meta = _load_metadata()
        by_cat = {}
        for d, vals in records:
            by_cat.setdefault(osp.basename(d).split("_")[0], []).append(vals)
        for cat in sorted(meta):
            if cat not in by_cat:
                continue
            label = meta[cat].get("name", cat).split(",")[0]
            lines.append(
                f"{label:<12s}{_metric_cells(_metric_means(by_cat[cat]))}"
                f" n_inst: {len(by_cat[cat])}"
            )
        total_prefix = f"---\n{'total':<12s}"
    else:
        total_prefix = ""

    overall = _metric_means([vals for _, vals in records])
    for name in METRIC_NAMES:
        print(name, overall[name])
    lines.append(total_prefix + _metric_cells(overall))

    text = "\n".join(lines)
    out_path = osp.join(render_root, "all_metrics.txt")
    with open(out_path, "w") as f:
        f.write(text)
    print("WROTE", out_path)
    print(text)


if __name__ == "__main__":
    if not args.reduce_only:
        print(">>> Compute")
        run_map()
    print(">>> Reduce")
    run_reduce()
