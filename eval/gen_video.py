"""Render a smooth novel-view video for one object (CLI parity with the
reference eval/gen_video.py:21-244).

Usage:
    python eval/gen_video.py -n <exp> -D <datadir> [-F <format>] -S <subset>
        [--split test] -P "<source view ids>" [--num_views 40] [--elevation -10]
        [--scale 1.0] [--radius 0.0] [--fps 30] [-R <ray batch>]

Writes visuals/<exp>/video<t|v>NNNN_vNNN....mp4 and a source-view jpg.
"""

import os
import sys
import warnings

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import numpy as np


def extra_args(parser):
    parser.add_argument(
        "--subset", "-S", type=int, default=0, help="Subset in data to use"
    )
    parser.add_argument(
        "--split",
        type=str,
        default="train",
        help="Split of data to use train | val | test",
    )
    parser.add_argument(
        "--source",
        "-P",
        type=str,
        default="64",
        help="Source view(s) in image, in increasing order. -1 to do random",
    )
    parser.add_argument(
        "--num_views",
        type=int,
        default=40,
        help="Number of video frames (rotated views)",
    )
    parser.add_argument(
        "--elevation",
        type=float,
        default=-10.0,
        help="Elevation angle (negative is above)",
    )
    parser.add_argument(
        "--scale", type=float, default=1.0, help="Video scale relative to input size"
    )
    parser.add_argument(
        "--radius",
        type=float,
        default=0.0,
        help="Distance of camera from origin, default is average of z_far, z_near",
    )
    parser.add_argument("--fps", type=int, default=30, help="FPS of video")
    parser.add_argument(
        "--mlp_impl",
        type=str,
        default="auto",
        choices=["auto", "xla", "pallas"],
        help="Field MLP implementation (auto = fused Pallas kernel on TPU)",
    )
    parser.add_argument(
        "--no_accel",
        action="store_true",
        help="Disable the per-scene occupancy-grid sample pruning "
        "(render/accel.py) and composite every sample like the reference",
    )
    parser.add_argument(
        "--accel_mode",
        type=str,
        default="auto",
        choices=["auto", "rays", "proposal", "samples"],
        help="Occupancy-pruning strategy: 'auto' (default) tries 'proposal' "
        "and SELF-GATES it — frame 0 is rendered both dense and pruned, and "
        "if they agree below 30 dB PSNR the video steps down to 'rays' "
        "(conservative, >= 40 dB by construction); 'rays' skips whole "
        "verified-empty rays (identical coarse z draw; kept rays' fine "
        "importance draws are stochastically re-drawn), 'proposal' forces "
        "grid-guided importance sampling in place of the coarse MLP pass "
        "(fastest; ungated), 'samples' compacts individual samples",
    )
    return parser


def main():
    import jax
    import jax.numpy as jnp

    from pixelnerf_tpu.config import parse_args
    from pixelnerf_tpu.data import get_split_dataset
    from pixelnerf_tpu.models import make_encode_fn, make_model
    from pixelnerf_tpu.parallel import RenderPipeline, make_ray_mesh
    from pixelnerf_tpu.render import NeRFRenderer
    from pixelnerf_tpu.train import checkpoints
    from pixelnerf_tpu.utils import geometry

    args, conf = parse_args(extra_args)
    args.resume = True

    dset = get_split_dataset(
        args.dataset_format, args.datadir, want_split=args.split, training=False
    )
    data = dset[args.subset]
    data_path = data["path"]
    print("Data instance loaded:", data_path)

    images = data["images"]  # (NV, H, W, 3) in [-1, 1]
    poses = data["poses"]  # (NV, 4, 4)
    focal = np.asarray(data["focal"], dtype=np.float32)
    c = data.get("c")

    NV, H, W, _ = images.shape

    if args.scale != 1.0:
        Ht, Wt = int(H * args.scale), int(W * args.scale)
        if abs(Ht / args.scale - H) > 1e-10 or abs(Wt / args.scale - W) > 1e-10:
            warnings.warn(
                f"Inexact scaling, please check {args.scale} times ({H}, {W}) "
                "is integral"
            )
        H, W = Ht, Wt

    net = make_model(conf["model"], mlp_impl=args.mlp_impl)

    renderer = NeRFRenderer.from_conf(
        conf["renderer"], lindisp=dset.lindisp, eval_batch_size=args.ray_batch_size
    )
    # Ensure decent sampling resolution for video (reference gen_video.py:192-195)
    if renderer.n_coarse < 64:
        renderer.n_coarse = 64
        renderer.n_fine = 128

    z_near, z_far = dset.z_near, dset.z_far
    print("Generating rays")

    dtu_format = getattr(dset, "sub_format", None) == "dtu"
    if dtu_format:
        print("Using DTU camera trajectory")
        render_poses = dtu_spline_poses(args.num_views)
        args.num_views = render_poses.shape[0]
    else:
        print("Using default (360 loop) camera trajectory")
        if args.radius == 0.0:
            radius = (z_near + z_far) * 0.5
            print("> Using default camera radius", radius)
        else:
            radius = args.radius
        render_poses = np.stack(
            [
                geometry.pose_spherical(angle, args.elevation, radius)
                for angle in np.linspace(-180, 180, args.num_views + 1)[:-1]
            ]
        )

    render_rays_all = np.asarray(
        geometry.gen_rays(
            render_poses,
            W,
            H,
            focal * args.scale,
            z_near,
            z_far,
            c=c * args.scale if c is not None else None,
        )
    ).reshape(-1, 8)

    source = np.array(list(map(int, args.source.split())), dtype=np.int64)
    NS = len(source)
    random_source = NS == 1 and source[0] == -1
    assert not (source >= NV).any()

    if random_source:
        src_view = np.random.default_rng().integers(0, NV, (1,))
    else:
        src_view = source

    # --- model init + weights ---
    rng = jax.random.PRNGKey(0)
    src_images = images[src_view][None]  # (1, NS, H0, W0, 3)
    src_poses = poses[src_view][None]
    init_xyz = jnp.zeros((1, 8, 3), jnp.float32)
    init_dirs = jnp.zeros((1, 8, 3), jnp.float32)
    # jitted init: flax Module.init otherwise dispatches thousands of eager
    # ops, each paying a remote-TPU tunnel round trip (~minutes wall)
    variables = jax.jit(net.init)(
        rng,
        jnp.asarray(src_images),
        jnp.asarray(src_poses),
        jnp.asarray(focal),
        init_xyz,
        init_dirs,
        c=jnp.asarray(c) if c is not None else None,
    )
    variables = checkpoints.load_weights(args, variables)

    print("Encoding source view(s)")
    # jitted: the eager apply pays a device round trip per encoder op on
    # remote-TPU backends (pixelnerf.make_encode_fn)
    scene = make_encode_fn(net)(
        variables,
        jnp.asarray(src_images),
        jnp.asarray(src_poses),
        jnp.asarray(focal),
        c=jnp.asarray(c) if c is not None else None,
    )

    mesh = make_ray_mesh(len(args.gpu_id)) if len(args.gpu_id) > 1 else None
    pipeline = RenderPipeline(net, renderer, mesh=mesh, simple_output=True)

    # one occupancy grid amortizes over every video frame; pruning only skips
    # verified-empty space (the reference composites everything).  CPU runs
    # skip it: the grid build is itself a large field-probe pass that only
    # pays off at accelerator rates.
    if not args.no_accel and jax.default_backend() != "cpu":
        auto = args.accel_mode == "auto"
        pipeline.set_accel_mode("proposal" if auto else args.accel_mode)
        pipeline.build_accel(
            variables, scene, render_rays_all,
            ray_batch_size=args.ray_batch_size,
        )
        if auto and pipeline.accel is not None:
            # self-gate, per video: frame 0 rendered dense and pruned with the
            # same key, walking the shared quality ladder
            # (RenderPipeline.gate_accel_mode: proposal -> proposal+8 ->
            # proposal+16 -> rays -> dense).  Costs a few extra frame renders (programs land
            # in the persistent compilation cache, so reruns only pay the
            # render).
            frame0 = render_rays_all[: H * W]
            label, psnrs = pipeline.gate_accel_mode(
                variables, scene, frame0, jax.random.PRNGKey(7),
                ray_batch_size=args.ray_batch_size,
            )
            trail = ", ".join(f"{k} {v:.1f} dB" for k, v in psnrs.items())
            print(f"accel auto: self-gate settled on {label} ({trail})")

    print("Rendering", args.num_views * H * W, "rays")
    rgb_fine, _depth = pipeline.render_simple(
        variables,
        scene,
        render_rays_all,
        jax.random.PRNGKey(1),
        ray_batch_size=args.ray_batch_size,
        pack="u8",  # frames are quantized by the writer anyway; 5 B/ray D2H
    )
    frames = np.clip(np.asarray(rgb_fine).reshape(-1, H, W, 3), 0.0, 1.0)

    print("Writing video")
    vid_name = "{:04}".format(args.subset)
    if args.split == "test":
        vid_name = "t" + vid_name
    elif args.split == "val":
        vid_name = "v" + vid_name
    vid_name += "_v" + "_".join("{:03}".format(int(x)) for x in src_view)
    vid_path = os.path.join(args.visual_path, args.name, "video" + vid_name + ".mp4")
    viewimg_path = os.path.join(
        args.visual_path, args.name, "video" + vid_name + "_view.jpg"
    )

    import imageio.v2 as imageio

    frames_u8 = (frames * 255).astype(np.uint8)
    try:
        imageio.mimwrite(vid_path, frames_u8, fps=args.fps, quality=8)
    except Exception as e:  # no ffmpeg -> fall back to gif
        warnings.warn(f"mp4 write failed ({e}); writing gif instead")
        vid_path = vid_path[:-4] + ".gif"
        imageio.mimwrite(vid_path, frames_u8, duration=1000.0 / args.fps)

    img_np = (images[src_view] * 0.5 + 0.5) * 255
    img_np = np.hstack(list(img_np.astype(np.uint8)))
    imageio.imwrite(viewimg_path, img_np)

    print("Wrote to", vid_path, "view:", viewimg_path)


def dtu_spline_poses(num_views: int) -> np.ndarray:
    """DTU quaternion CubicSpline camera path (reference gen_video.py:120-156,
    keyframe quaternions from IDR)."""
    import jax.numpy as jnp
    from scipy.interpolate import CubicSpline

    from pixelnerf_tpu.utils import geometry

    t_in = np.array([0, 2, 3, 5, 6], dtype=np.float32)
    pose_quat = np.array(
        [
            [0.9698, 0.2121, 0.1203, -0.0039],
            [0.7020, 0.1578, 0.4525, 0.5268],
            [0.6766, 0.3176, 0.5179, 0.4161],
            [0.9085, 0.4020, 0.1139, -0.0025],
            [0.9698, 0.2121, 0.1203, -0.0039],
        ],
        dtype=np.float32,
    )
    n_inter = max(num_views // 5, 1)
    t_out = np.linspace(t_in[0], t_in[-1], n_inter * int(t_in[-1])).astype(
        np.float32
    )
    scales = np.full(5, 2.0, dtype=np.float32)

    s_new = CubicSpline(t_in, scales, bc_type="periodic")(t_out)
    q_new = CubicSpline(t_in, pose_quat, bc_type="periodic")(t_out)
    q_new = q_new / np.linalg.norm(q_new, axis=1, keepdims=True)

    render_poses = []
    for quat, scale in zip(q_new, s_new):
        R = np.asarray(geometry.quat_to_rot(jnp.asarray(quat[None])))[0]
        t = R[:, 2] * scale
        pose = np.eye(4, dtype=np.float32)
        pose[:3, :3] = R
        pose[:3, 3] = t
        render_poses.append(pose)
    return np.stack(render_poses)


if __name__ == "__main__":
    main()
