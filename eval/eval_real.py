"""Render a 360° novel-view video from a single in-the-wild image (CLI parity
with the reference eval/eval_real.py:21-171).

Expects segmentation-normalized inputs ``<input>/*_normalize.png`` produced by
scripts/preproc.py; conditions the model on the image with a dummy identity pose
at distance ``--radius`` and renders a Blender-coordinate spherical path.
"""

import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

ROOT_DIR = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def extra_args(parser):
    parser.add_argument(
        "--input",
        "-I",
        type=str,
        default=os.path.join(ROOT_DIR, "input"),
        help="Image directory",
    )
    parser.add_argument(
        "--output",
        "-O",
        type=str,
        default=os.path.join(ROOT_DIR, "output"),
        help="Output directory",
    )
    parser.add_argument("--size", type=int, default=128, help="Input image maxdim")
    parser.add_argument(
        "--out_size",
        type=str,
        default="128",
        help="Output image size, either 1 or 2 numbers (w h)",
    )
    parser.add_argument("--focal", type=float, default=131.25, help="Focal length")
    parser.add_argument("--radius", type=float, default=1.3, help="Camera distance")
    parser.add_argument("--z_near", type=float, default=0.8)
    parser.add_argument("--z_far", type=float, default=1.8)
    parser.add_argument(
        "--elevation", "-e", type=float, default=0.0, help="Elevation angle"
    )
    parser.add_argument(
        "--num_views", type=int, default=24, help="Number of video frames"
    )
    parser.add_argument("--fps", type=int, default=15, help="FPS of video")
    parser.add_argument("--gif", action="store_true", help="Store gif instead of mp4")
    parser.add_argument(
        "--no_vid", action="store_true", help="Only write image frames"
    )
    parser.add_argument(
        "--accel_mode",
        type=str,
        default="auto",
        choices=["auto", "off", "rays", "proposal", "samples"],
        help="Per-image occupancy-grid pruning for the 360-degree render "
        "(render/accel.py); 'auto' (default) tries 'proposal' and self-gates "
        "it against a dense render of frame 0 (>= 30 dB or step down to "
        "'rays'), 'proposal' forces grid-guided sampling in place of the "
        "coarse MLP pass (fastest; ungated), 'off' composites every sample "
        "like the reference",
    )
    parser.add_argument(
        "--mlp_impl",
        type=str,
        default="auto",
        choices=["auto", "xla", "pallas"],
        help="Field MLP implementation (auto = fused Pallas kernel on TPU)",
    )
    return parser


def main():
    import imageio.v2 as imageio
    import jax
    import jax.numpy as jnp

    from pixelnerf_tpu.config import parse_args
    from pixelnerf_tpu.models import make_encode_fn, make_model
    from pixelnerf_tpu.parallel import RenderPipeline
    from pixelnerf_tpu.render import NeRFRenderer
    from pixelnerf_tpu.train import checkpoints
    from pixelnerf_tpu.utils import geometry

    args, conf = parse_args(
        extra_args, default_expname="srn_car", default_data_format="srn"
    )
    args.resume = True

    net = make_model(conf["model"], mlp_impl=args.mlp_impl)
    renderer = NeRFRenderer.from_conf(
        conf["renderer"], eval_batch_size=args.ray_batch_size
    )

    z_near, z_far = args.z_near, args.z_far
    focal = np.float32(args.focal)

    in_sz = args.size
    sz = list(map(int, args.out_size.split()))
    if len(sz) == 1:
        H = W = sz[0]
    else:
        assert len(sz) == 2
        W, H = sz

    coord_from_blender = geometry.coord_from_blender()
    print("Generating rays")
    render_poses = np.stack(
        [
            coord_from_blender
            @ geometry.pose_spherical(angle, args.elevation, args.radius)
            for angle in np.linspace(-180, 180, args.num_views + 1)[:-1]
        ]
    )
    render_rays_all = geometry.gen_rays_np(
        render_poses, W, H, focal, z_near, z_far
    ).reshape(-1, 8)

    inputs_all = os.listdir(args.input) if os.path.isdir(args.input) else []
    inputs = [
        os.path.join(args.input, x)
        for x in inputs_all
        if x.endswith("_normalize.png")
    ]
    os.makedirs(args.output, exist_ok=True)

    if len(inputs) == 0:
        if len(inputs_all) == 0:
            print("No input images found, please place an image into ./input")
        else:
            print(
                "No processed input images found, did you run 'scripts/preproc.py'?"
            )
        sys.exit(1)

    cam_pose = np.eye(4, dtype=np.float32)
    cam_pose[2, -1] = args.radius
    print("SET DUMMY CAMERA")
    print(cam_pose)

    variables = None
    pipeline = RenderPipeline(net, renderer)
    # one jitted encode for every input image (pixelnerf.make_encode_fn:
    # the eager apply pays a device round trip per encoder op)
    encode_fn = make_encode_fn(net)
    rng = jax.random.PRNGKey(0)

    from PIL import Image

    for i, image_path in enumerate(inputs):
        print("IMAGE", i + 1, "of", len(inputs), "@", image_path)
        image = Image.open(image_path).convert("RGB")
        scale = in_sz / min(image.size)
        image = image.resize(
            (round(image.width * scale), round(image.height * scale)),
            Image.BILINEAR,
        )
        img = np.asarray(image, np.float32) / 255.0 * 2.0 - 1.0  # [-1, 1]
        src_images = img[None, None]  # (1, 1, H, W, 3)
        src_poses = cam_pose[None, None]

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
            )
            variables = checkpoints.load_weights(args, variables)

        scene = encode_fn(
            variables,
            jnp.asarray(src_images),
            jnp.asarray(src_poses),
            jnp.asarray(focal),
        )
        if args.accel_mode != "off" and jax.default_backend() != "cpu":
            auto = args.accel_mode == "auto"
            pipeline.set_accel_mode("proposal" if auto else args.accel_mode)
            pipeline.build_accel(
                variables, scene, render_rays_all, ray_batch_size=80000
            )
            if auto and pipeline.accel is not None:
                # frame-0 self-gate (same logic as gen_video / bench.py)
                frame0 = render_rays_all[: H * W]
                rng, gate_rng = jax.random.split(rng)
                grid = pipeline.accel
                pipeline.accel = None
                rgb_d, _ = pipeline.render_simple(
                    variables, scene, frame0, gate_rng, ray_batch_size=80000
                )
                pipeline.accel = grid
                rgb_p, _ = pipeline.render_simple(
                    variables, scene, frame0, gate_rng, ray_batch_size=80000
                )
                mse = float(np.mean((rgb_p - rgb_d) ** 2))
                psnr = -10.0 * np.log10(max(mse, 1e-12))
                if psnr < 30.0:
                    pipeline.set_accel_mode("rays")
                    print(
                        f"accel auto: proposal failed self-gate "
                        f"({psnr:.1f} dB); using ray compaction"
                    )
                else:
                    print(
                        f"accel auto: proposal passes self-gate ({psnr:.1f} dB)"
                    )
        print("Rendering", args.num_views * H * W, "rays")
        rng, step = jax.random.split(rng)
        rgb_fine, _ = pipeline.render_simple(
            variables, scene, render_rays_all, step, ray_batch_size=80000,
            pack="u8",  # frames are quantized by the writer anyway
        )
        frames = (
            np.clip(np.asarray(rgb_fine).reshape(args.num_views, H, W, 3), 0, 1)
            * 255
        ).astype(np.uint8)

        im_name = os.path.basename(os.path.splitext(image_path)[0])
        frames_dir_name = os.path.join(args.output, im_name + "_frames")
        os.makedirs(frames_dir_name, exist_ok=True)
        for fi in range(args.num_views):
            imageio.imwrite(
                os.path.join(frames_dir_name, "{:04}.png".format(fi)), frames[fi]
            )

        if not args.no_vid:
            try:
                if args.gif:
                    vid_path = os.path.join(args.output, im_name + "_vid.gif")
                    imageio.mimwrite(vid_path, frames, duration=1000.0 / args.fps)
                else:
                    vid_path = os.path.join(args.output, im_name + "_vid.mp4")
                    imageio.mimwrite(vid_path, frames, fps=args.fps, quality=8)
            except Exception:
                vid_path = os.path.join(args.output, im_name + "_vid.gif")
                imageio.mimwrite(vid_path, frames, duration=1000.0 / args.fps)
            print("Wrote to", vid_path)


if __name__ == "__main__":
    main()
