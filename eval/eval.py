"""Full quantitative evaluation over a dataset split (CLI parity with the
reference eval/eval.py:30-363): per-object source-view conditioning (fixed -P
list or per-object viewlist LUT), chunked rendering of all target views,
PSNR/SSIM against GT, per-view PNG/depth/compare outputs, and the finish.txt
append-journal for resumable evaluation.

The reference's hard 50-object debug cap (eval.py:187-188) is replaced by an
explicit --max_objs flag (0 = evaluate the full split, the upstream behavior).
"""

import os
import sys
import warnings

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import numpy as np


def extra_args(parser):
    parser.add_argument(
        "--split", type=str, default="test", help="Split of data to use"
    )
    parser.add_argument(
        "--source",
        "-P",
        type=str,
        default="64",
        help="Source view(s) for each object; or use -L viewlist",
    )
    parser.add_argument(
        "--eval_view_list", type=str, default=None, help="Path to eval view list"
    )
    parser.add_argument(
        "--coarse", action="store_true", help="Coarse network as fine"
    )
    parser.add_argument(
        "--no_compare_gt",
        action="store_true",
        help="Skip GT comparison and only render images",
    )
    parser.add_argument(
        "--multicat",
        action="store_true",
        help="Prepend category id to object id (multi-category models)",
    )
    parser.add_argument(
        "--viewlist",
        "-L",
        type=str,
        default="",
        help="Path to source view list e.g. src_dvr.txt; overrides -P",
    )
    parser.add_argument(
        "--output", "-O", type=str, default="eval", help="Output directory"
    )
    parser.add_argument(
        "--include_src",
        action="store_true",
        help="Include source views in calculation",
    )
    parser.add_argument(
        "--scale", type=float, default=1.0, help="Render scale relative to input"
    )
    parser.add_argument(
        "--write_depth", action="store_true", help="Write depth image"
    )
    parser.add_argument(
        "--write_compare", action="store_true", help="Write GT comparison image"
    )
    parser.add_argument(
        "--free_pose",
        action="store_true",
        help="Poses may change between objects (regenerate rays per object)",
    )
    parser.add_argument(
        "--max_objs",
        type=int,
        default=0,
        help="Evaluate at most this many objects (0 = all)",
    )
    parser.add_argument(
        "--mlp_impl",
        type=str,
        default="auto",
        choices=["auto", "xla", "pallas"],
        help="Field MLP implementation (auto = fused Pallas kernel on TPU)",
    )
    parser.add_argument(
        "--accel",
        type=str,
        default="off",
        choices=["off", "rays", "proposal"],
        help="Opt-in per-object occupancy-grid pruning (render/accel.py) to "
        "speed up full-split evals: 'rays' skips verified-empty rays "
        "(identical coarse draw; kept rays' fine importance draws are "
        "stochastically re-drawn, >= 40 dB vs dense), 'proposal' replaces "
        "the coarse MLP pass with grid-guided sampling (fastest; small "
        "stochastic deviation — do not combine with --coarse).  Default "
        "off: the quality-parity eval composites every sample like the "
        "reference",
    )
    parser.add_argument(
        "--accel_build",
        type=str,
        default="fast",
        choices=["fast", "full"],
        help="Per-object grid-build budget: 'fast' probes a 64^3 grid under "
        "one view direction (~13x fewer field probes — the per-object cost "
        "that dominates full-split --accel evals), 'full' the 96^3/4-probe "
        "build gen_video uses (one grid amortized over a whole video)",
    )
    parser.add_argument(
        "--no_accel_gate",
        action="store_true",
        help="Skip the per-object self-gate (first target view rendered "
        "dense AND pruned; < 30 dB walks proposal -> proposal+8 -> "
        "proposal+16 -> rays -> dense). "
        "The gate costs 2-5 extra view renders per object (one per rung "
        "tried) and makes --accel quality-safe for metric runs",
    )
    return parser


def main():
    import imageio.v2 as imageio
    import jax
    import jax.numpy as jnp

    from pixelnerf_tpu.config import parse_args
    from pixelnerf_tpu.data import get_split_dataset
    from pixelnerf_tpu.models import make_encode_fn, make_model
    from pixelnerf_tpu.parallel import RenderPipeline, make_ray_mesh
    from pixelnerf_tpu.render import NeRFRenderer
    from pixelnerf_tpu.train import checkpoints
    from pixelnerf_tpu.utils import geometry, metrics

    args, conf = parse_args(extra_args)
    args.resume = True

    # accel validity is pure argparse state — fail/inform before any model
    # construction or checkpoint loading
    if args.coarse and args.accel == "proposal":
        raise SystemExit(
            "--accel proposal renders only the fine head; "
            "it cannot be combined with --coarse"
        )
    use_accel = args.accel != "off"
    # PIXELNERF_ACCEL_CPU_OK=1: tests exercise the accel+gate path on the
    # CPU backend (where it is a slowdown, never a correctness issue)
    if (
        use_accel
        and jax.default_backend() == "cpu"
        and os.environ.get("PIXELNERF_ACCEL_CPU_OK", "0") != "1"
    ):
        print(
            f"WARNING: --accel {args.accel} ignored on the CPU backend "
            "(the grid build is a large field-probe pass that only pays "
            "off at accelerator rates); evaluating dense"
        )
        use_accel = False

    dset = get_split_dataset(
        args.dataset_format, args.datadir, want_split=args.split, training=False
    )

    output_dir = args.output.strip()
    has_output = len(output_dir) > 0

    total_psnr, total_ssim, cnt = 0.0, 0.0, 0
    finished = set()
    finish_file = None
    if has_output:
        os.makedirs(output_dir, exist_ok=True)
        finish_path = os.path.join(output_dir, "finish.txt")
        if os.path.exists(finish_path):
            with open(finish_path) as f:
                lines = [x.strip().split() for x in f.readlines()]
            lines = [x for x in lines if len(x) == 4]
            finished = set(x[0] for x in lines)
            total_psnr = sum(float(x[1]) for x in lines)
            total_ssim = sum(float(x[2]) for x in lines)
            cnt = sum(int(x[3]) for x in lines)
            if cnt > 0:
                print("resume psnr", total_psnr / cnt, "ssim", total_ssim / cnt)
            else:
                total_psnr = total_ssim = 0.0
        finish_file = open(finish_path, "a", buffering=1)
        print("Writing images to", output_dir)

    net = make_model(conf["model"], mlp_impl=args.mlp_impl)
    renderer = NeRFRenderer.from_conf(
        conf["renderer"], lindisp=dset.lindisp, eval_batch_size=args.ray_batch_size
    )
    if renderer.n_coarse < 64:
        renderer.n_coarse = 64
    if args.coarse:
        renderer.n_coarse = 64
        renderer.n_fine = 0  # coarse-only output

    z_near, z_far = dset.z_near, dset.z_far

    use_source_lut = len(args.viewlist) > 0
    if use_source_lut:
        print("Using views from list", args.viewlist)
        with open(args.viewlist) as f:
            tmp = [x.strip().split() for x in f.readlines()]
        source_lut = {
            x[0] + "/" + x[1]: np.array(list(map(int, x[2:])), dtype=np.int64)
            for x in tmp
        }
        source = None
    else:
        source = np.array(
            sorted(map(int, args.source.split())), dtype=np.int64
        )

    NV = dset[0]["images"].shape[0]
    if args.eval_view_list is not None:
        with open(args.eval_view_list) as f:
            eval_views = np.array(list(map(int, f.readline().split())))
        target_view_mask_init = np.zeros(NV, dtype=bool)
        target_view_mask_init[eval_views] = True
    else:
        target_view_mask_init = np.ones(NV, dtype=bool)

    variables = None
    pipeline = None
    # one jitted encode reused across every object (a fresh per-object wrap
    # would retrace; the eager apply would pay a device round trip per op)
    encode_fn = make_encode_fn(net)
    all_rays = None
    novel_view_idxs = None
    src_view_mask = None
    total_objs = len(dset)
    rng = jax.random.PRNGKey(0)

    for obj_idx in range(total_objs):
        if args.max_objs > 0 and obj_idx >= args.max_objs:
            break
        data = dset[obj_idx]
        dpath = data["path"]
        obj_basename = os.path.basename(dpath)
        cat_name = os.path.basename(os.path.dirname(dpath))
        obj_name = (
            cat_name + "_" + obj_basename if args.multicat else obj_basename
        )
        print(
            "OBJECT",
            obj_idx,
            "OF",
            total_objs,
            "PROGRESS",
            obj_idx / total_objs * 100.0,
            "%",
            dpath,
        )
        if has_output and obj_name in finished:
            print("(skip)")
            continue

        images = data["images"]  # (NV, H, W, 3)
        NV, H0, W0, _ = images.shape
        H, W = H0, W0
        if args.scale != 1.0:
            Ht, Wt = int(H * args.scale), int(W * args.scale)
            if abs(Ht / args.scale - H) > 1e-10 or abs(Wt / args.scale - W) > 1e-10:
                warnings.warn(
                    f"Inexact scaling, please check {args.scale} x ({H},{W})"
                )
            H, W = Ht, Wt

        focal = np.asarray(data["focal"], dtype=np.float32)
        c = data.get("c")
        poses = data["poses"]

        if all_rays is None or use_source_lut or args.free_pose:
            if use_source_lut:
                obj_id = cat_name + "/" + obj_basename
                source = source_lut[obj_id]
            src_view_mask = np.zeros(NV, dtype=bool)
            src_view_mask[source] = True

            target_view_mask = target_view_mask_init.copy()
            if not args.include_src:
                target_view_mask &= ~src_view_mask
            novel_view_idxs = np.nonzero(target_view_mask)[0]

            all_rays = geometry.gen_rays_np(
                poses[target_view_mask],
                W,
                H,
                focal * args.scale,
                z_near,
                z_far,
                c=np.asarray(c) * args.scale if c is not None else None,
            ).reshape(-1, 8)

        n_gen_views = len(novel_view_idxs)
        src_images = images[src_view_mask][None]
        src_poses = poses[src_view_mask][None]

        if variables is None:
            # jitted init: flax Module.init otherwise dispatches thousands
            # of eager ops, each paying a remote-TPU tunnel round trip
            variables = jax.jit(net.init)(
                jax.random.PRNGKey(0),
                jnp.asarray(src_images),
                jnp.asarray(src_poses),
                jnp.asarray(focal),
                jnp.zeros((1, 8, 3), jnp.float32),
                jnp.zeros((1, 8, 3), jnp.float32),
                c=jnp.asarray(c) if c is not None else None,
            )
            variables = checkpoints.load_weights(args, variables)
            mesh = (
                make_ray_mesh(len(args.gpu_id)) if len(args.gpu_id) > 1 else None
            )
            pipeline = RenderPipeline(net, renderer, mesh=mesh)
            if use_accel:
                pipeline.set_accel_mode(args.accel)

        scene = encode_fn(
            variables,
            jnp.asarray(src_images),
            jnp.asarray(src_poses),
            jnp.asarray(focal),
            c=jnp.asarray(c) if c is not None else None,
        )
        rng, obj_rng = jax.random.split(rng)
        if use_accel:
            # per-object grid: one field-probe pass amortized over all of the
            # object's target views.  --accel_build fast trades grid
            # resolution/probe count for ~13x less build compute — at
            # full-split scale (8762 NMR objects) the build, not the render,
            # dominates --accel wall clock.
            pipeline.set_accel_mode(args.accel)
            build_kw = (
                dict(resolution=64, n_dir_probes=1)
                if args.accel_build == "fast"
                else {}
            )
            pipeline.build_accel(
                variables, scene, all_rays,
                ray_batch_size=args.ray_batch_size,
                **build_kw,
            )
            if not args.no_accel_gate and pipeline.accel is not None:
                # per-object self-gate: the first target view rendered dense
                # and pruned with the same key, walking the shared quality
                # ladder (RenderPipeline.gate_accel_mode: proposal ->
                # proposal+8 -> proposal+16 -> rays -> dense) so a grid that
                # misrepresents THIS field can't poison metrics
                label, psnrs = pipeline.gate_accel_mode(
                    variables, scene, all_rays[: H * W],
                    jax.random.PRNGKey(11),
                    ray_batch_size=args.ray_batch_size,
                )
                trail = ", ".join(
                    f"{k} {v:.1f} dB" for k, v in psnrs.items()
                )
                print(f"  accel gate: {trail} -> {label}")
        all_rgb, all_depth = pipeline.render_simple(
            variables, scene, all_rays, obj_rng, ray_batch_size=args.ray_batch_size
        )
        all_depth = (np.asarray(all_depth) - z_near) / (z_far - z_near)
        all_depth = all_depth.reshape(n_gen_views, H, W)
        all_rgb = np.clip(
            np.asarray(all_rgb).reshape(n_gen_views, H, W, 3), 0.0, 1.0
        )

        obj_out_dir = os.path.join(output_dir, obj_name)
        if has_output:
            os.makedirs(obj_out_dir, exist_ok=True)
            for i in range(n_gen_views):
                out_file = os.path.join(
                    obj_out_dir, "{:06}.png".format(int(novel_view_idxs[i]))
                )
                imageio.imwrite(out_file, (all_rgb[i] * 255).astype(np.uint8))
                if args.write_depth:
                    import cv2

                    base = os.path.join(
                        obj_out_dir, "{:06}".format(int(novel_view_idxs[i]))
                    )
                    try:
                        cv2.imwrite(base + "_depth.exr", all_depth[i])
                    except cv2.error:
                        # cv2 built without OpenEXR: keep raw depth as .npy
                        np.save(base + "_depth.npy", all_depth[i])
                    imageio.imwrite(
                        base + "_depth_norm.png", metrics.cmap(all_depth[i])
                    )

        curr_psnr = curr_ssim = 0.0
        if not args.no_compare_gt:
            images_0to1 = images * 0.5 + 0.5
            rgb_gt_all = images_0to1[target_view_mask]
            if rgb_gt_all.shape[1:3] != all_rgb.shape[1:3]:
                # scaled render (--scale != 1): compare against GT resized to
                # the render resolution (the reference crashes here and makes
                # users pass --no_compare_gt + calc_metrics; resizing is the
                # same comparison calc_metrics.py performs)
                import cv2

                rgb_gt_all = np.stack(
                    [
                        cv2.resize(
                            g,
                            (all_rgb.shape[2], all_rgb.shape[1]),
                            interpolation=cv2.INTER_AREA,
                        )
                        for g in rgb_gt_all
                    ]
                )
            for view_idx in range(n_gen_views):
                curr_ssim += metrics.ssim(
                    all_rgb[view_idx], rgb_gt_all[view_idx], data_range=1.0
                )
                curr_psnr += metrics.psnr(all_rgb[view_idx], rgb_gt_all[view_idx])
                if args.write_compare and has_output:
                    out_file = os.path.join(
                        obj_out_dir,
                        "{:06}_compare.png".format(int(novel_view_idxs[view_idx])),
                    )
                    out_im = np.hstack(
                        (all_rgb[view_idx], rgb_gt_all[view_idx])
                    )
                    imageio.imwrite(out_file, (out_im * 255).astype(np.uint8))
        curr_psnr /= n_gen_views
        curr_ssim /= n_gen_views
        total_psnr += curr_psnr
        total_ssim += curr_ssim
        cnt += 1
        if not args.no_compare_gt:
            print(
                "curr psnr",
                curr_psnr,
                "ssim",
                curr_ssim,
                "running psnr",
                total_psnr / cnt,
                "running ssim",
                total_ssim / cnt,
            )
        if finish_file is not None:
            finish_file.write(f"{obj_name} {curr_psnr} {curr_ssim} 1\n")

    if cnt > 0:
        print("final psnr", total_psnr / cnt, "ssim", total_ssim / cnt)


if __name__ == "__main__":
    main()
