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

    if args.multicat:
        cats = os.listdir(data_root)

        def fmt_obj_name(c, x):
            return c + "_" + x

    else:
        cats = ["."]

        def fmt_obj_name(c, x):
            return x

    use_exclude_lut = len(args.viewlist) > 0
    if use_exclude_lut:
        print("Excluding views from list", args.viewlist)
        with open(args.viewlist) as f:
            tmp = [x.strip().split() for x in f.readlines()]
        exclude_lut = {
            x[0] + "/" + x[1]: list(map(int, x[2:])) for x in tmp
        }
    base_exclude_views = list(map(int, args.primary.split()))
    if args.exclude_dtu_bad:
        base_exclude_views.extend(
            [3, 4, 5, 6, 7, 16, 17, 18, 19, 20, 21, 36, 37, 38, 39]
        )

    if args.eval_view_list is not None:
        with open(args.eval_view_list) as f:
            eval_views = list(map(int, f.readline().split()))
        print("Only using views", eval_views)
    else:
        eval_views = None

    all_objs = []
    total_objs = 0
    print("CATEGORICAL SUMMARY")
    for cat in cats:
        cat_root = osp.join(data_root, cat)
        if not osp.isdir(cat_root):
            continue
        objs = sorted(os.listdir(cat_root))
        if len(list_name) > 0:
            list_path = osp.join(cat_root, list_name)
            if osp.exists(list_path):
                with open(list_path) as f:
                    split = set(x.strip() for x in f.readlines())
                objs = [x for x in objs if x in split]
        objs_rend = [osp.join(render_root, fmt_obj_name(cat, x)) for x in objs]
        objs = [osp.join(cat_root, x) for x in objs]
        objs = [x for x in objs if osp.isdir(x)]
        pairs = list(zip(objs, objs_rend))
        avail = [x for x in pairs if osp.exists(x[1])]
        print(cat, "TOTAL", len(pairs), "AVAILABLE", len(avail))
        total_objs += len(pairs)
        all_objs.extend(avail)
    print(">>> USING", len(all_objs), "OF", total_objs, "OBJECTS")

    def isimage(path):
        return osp.splitext(path)[1] in (".jpg", ".png")

    def process_obj(path, rend_path):
        im_root = osp.join(path, img_dir_name) if img_dir_name else path
        out_path = osp.join(rend_path, "metrics.txt")
        if osp.exists(out_path) and not args.overwrite:
            return
        ims = [x for x in sorted(os.listdir(im_root)) if isimage(x)]
        if use_exclude_lut:
            lut_key = osp.basename(rend_path).replace("_", "/")
            exclude_views = list(exclude_lut.get(lut_key, []))
        else:
            exclude_views = []
        exclude_views.extend(base_exclude_views)

        psnr_avg = ssim_avg = 0.0
        gts, preds = [], []
        num_ims = 0
        for im_name in ims:
            im_name_id = int(osp.splitext(im_name)[0])
            im_rend_path = osp.join(
                rend_path, "{:06}.png".format(im_name_id)
            )
            if not osp.exists(im_rend_path) or im_name_id in exclude_views:
                continue
            if eval_views is not None and im_name_id not in eval_views:
                continue
            gt = (
                imageio.imread(osp.join(im_root, im_name)).astype(np.float32)[
                    ..., :3
                ]
                / 255.0
            )
            pred = (
                imageio.imread(im_rend_path).astype(np.float32)[..., :3] / 255.0
            )
            if pred.shape != gt.shape:
                # renders produced with eval.py --scale: compare at the render
                # resolution (matches eval.py's own scaled GT comparison)
                from PIL import Image

                gt = (
                    np.asarray(
                        Image.fromarray(
                            (gt * 255.0).astype(np.uint8)
                        ).resize(
                            (pred.shape[1], pred.shape[0]), Image.BILINEAR
                        )
                    ).astype(np.float32)
                    / 255.0
                )
            psnr_avg += M.psnr(pred, gt)
            ssim_avg += M.ssim(pred, gt, data_range=1.0)
            gts.append(gt * 2.0 - 1.0)
            preds.append(pred * 2.0 - 1.0)
            num_ims += 1
        if num_ims == 0:
            return
        if lpips is not None:
            vals = []
            for s in range(0, num_ims, args.lpips_batch_size):
                p = np.stack(preds[s : s + args.lpips_batch_size])
                g = np.stack(gts[s : s + args.lpips_batch_size])
                vals.append(np.asarray(lpips(p, g)))
            lpips_val = float(np.concatenate(vals).mean())
        else:
            lpips_val = float("nan")
        psnr_avg /= num_ims
        ssim_avg /= num_ims
        with open(out_path, "w") as f:
            f.write(f"psnr {psnr_avg}\nssim {ssim_avg}\nlpips {lpips_val}")

    for obj_path, obj_rend_path in all_objs:
        process_obj(obj_path, obj_rend_path)


def run_reduce():
    if args.multicat:
        meta = _load_metadata()
        cats = sorted(meta.keys())
        cat_description = {
            cat: meta[cat].get("name", cat).split(",")[0] for cat in cats
        }

    objs = [osp.join(render_root, x) for x in os.listdir(render_root) if x[0] != "_"]
    objs = [x for x in objs if osp.isdir(x) and osp.exists(osp.join(x, "metrics.txt"))]
    if args.dtu_sort:
        objs = sorted(objs, key=lambda x: int(x[x.rindex("/") + 5 :]))
    else:
        objs = sorted(objs)
    print(">>> PROCESSING", len(objs), "OBJECTS")
    if not objs:
        return

    out_metrics_path = osp.join(render_root, "all_metrics.txt")
    cat_sz = {}
    all_metrics = {}
    if args.multicat:
        for cat in cats:
            cat_sz[cat] = 0
            for name in METRIC_NAMES:
                all_metrics[cat + "." + name] = 0.0
    for name in METRIC_NAMES:
        all_metrics[name] = 0.0

    should_print = len(objs) < 100
    for obj_root in objs:
        with open(osp.join(obj_root, "metrics.txt")) as f:
            obj_metrics = [line.split() for line in f.readlines()]
        if args.multicat:
            cat_name = osp.basename(obj_root).split("_")[0]
            if cat_name in cat_sz:
                cat_sz[cat_name] += 1
                for metric, val in obj_metrics:
                    all_metrics[cat_name + "." + metric] += float(val)
        for metric, val in obj_metrics:
            all_metrics[metric] += float(val)
        if should_print:
            print(obj_root, " ".join(v for _, v in obj_metrics))

    for name in METRIC_NAMES:
        if args.multicat:
            for cat in cats:
                if cat_sz[cat] > 0:
                    all_metrics[cat + "." + name] /= cat_sz[cat]
        all_metrics[name] /= len(objs)
        print(name, all_metrics[name])

    metrics_txt = []
    if args.multicat:
        for cat in cats:
            if cat_sz[cat] > 0:
                cat_txt = "{:12s}".format(cat_description[cat])
                for name in METRIC_NAMES:
                    cat_txt += " {}: {:.6f}".format(
                        name, all_metrics[cat + "." + name]
                    )
                cat_txt += " n_inst: {}".format(cat_sz[cat])
                metrics_txt.append(cat_txt)
        total_txt = "---\n{:12s}".format("total")
    else:
        total_txt = ""
    for name in METRIC_NAMES:
        total_txt += " {}: {:.6f}".format(name, all_metrics[name])
    metrics_txt.append(total_txt)
    metrics_txt = "\n".join(metrics_txt)
    with open(out_metrics_path, "w") as f:
        f.write(metrics_txt)
    print("WROTE", out_metrics_path)
    print(metrics_txt)


if __name__ == "__main__":
    if not args.reduce_only:
        print(">>> Compute")
        run_map()
    print(">>> Reduce")
    run_reduce()
