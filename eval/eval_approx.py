"""Approximate (fast) evaluation: one random target view per object, batched over
objects (CLI parity with the reference eval/eval_approx.py:28-153)."""

import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import numpy as np


def extra_args(parser):
    parser.add_argument(
        "--split", type=str, default="val", help="Split of data to use"
    )
    parser.add_argument(
        "--source",
        "-P",
        type=str,
        default="64",
        help="Source view(s), increasing order. -1 for random 1 view",
    )
    parser.add_argument("--batch_size", type=int, default=4, help="Batch size")
    parser.add_argument(
        "--seed", type=int, default=1234, help="Seed for target view selection"
    )
    parser.add_argument(
        "--coarse", action="store_true", help="Coarse network as fine"
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
    import jax
    import jax.numpy as jnp

    from pixelnerf_tpu.config import parse_args
    from pixelnerf_tpu.data import DataLoader, get_split_dataset
    from pixelnerf_tpu.models import make_encode_fn, make_model
    from pixelnerf_tpu.parallel import RenderPipeline
    from pixelnerf_tpu.render import NeRFRenderer
    from pixelnerf_tpu.train import checkpoints
    from pixelnerf_tpu.utils import geometry, metrics

    args, conf = parse_args(extra_args)
    args.resume = True

    dset = get_split_dataset(
        args.dataset_format, args.datadir, want_split=args.split, training=False
    )
    loader = DataLoader(dset, batch_size=args.batch_size, shuffle=False)

    net = make_model(conf["model"], mlp_impl=args.mlp_impl)
    renderer = NeRFRenderer.from_conf(
        conf["renderer"], eval_batch_size=args.ray_batch_size
    )
    if renderer.n_coarse < 64:
        renderer.n_coarse = 64
    if args.coarse:
        renderer.n_coarse = 64
        renderer.n_fine = 0

    z_near, z_far = dset.z_near, dset.z_far
    rng = np.random.default_rng(args.seed)
    jrng = jax.random.PRNGKey(args.seed)

    source = np.array(list(map(int, args.source.split())), dtype=np.int64)
    NS = len(source)
    random_source = NS == 1 and source[0] == -1

    total_psnr = total_ssim = 0.0
    cnt = 0
    variables = None
    pipeline = None
    # one jitted encode for every object (pixelnerf.make_encode_fn: the
    # eager apply pays a device round trip per encoder op)
    encode_fn = make_encode_fn(net)

    for data in loader:
        images = data["images"]  # (SB, NV, H, W, 3)
        poses = data["poses"]
        focal = np.asarray(data["focal"][0], np.float32)
        images_0to1 = images * 0.5 + 0.5
        SB, NV, H, W, _ = images.shape

        if random_source:
            src_view = rng.integers(0, NV, (SB, 1))
        else:
            if (source < 0).any() or (source >= NV).any():
                raise SystemExit(
                    f"source view(s) {source.tolist()} out of range for a "
                    f"{NV}-view dataset; pass -P with views in [0, {NV})"
                )
            src_view = np.broadcast_to(source[None], (SB, NS)).copy()

        # random non-source target view per object (eval_approx.py:115-117)
        dest_view = rng.integers(0, NV - NS, (SB, 1))
        for i in range(NS):
            dest_view += dest_view >= src_view[:, i : i + 1]

        all_rays = []
        for sb in range(SB):
            all_rays.append(
                geometry.gen_rays_np(
                    poses[sb, dest_view[sb]], W, H, focal, z_near, z_far
                ).reshape(-1, 8)
            )
        pri_images = np.stack([images[b, src_view[b]] for b in range(SB)])
        pri_poses = np.stack([poses[b, src_view[b]] for b in range(SB)])

        if variables is None:
            # jitted init: flax Module.init otherwise dispatches thousands
            # of eager ops, each paying a remote-TPU tunnel round trip
            variables = jax.jit(net.init)(
                jax.random.PRNGKey(0),
                jnp.asarray(pri_images[:1]),
                jnp.asarray(pri_poses[:1]),
                jnp.asarray(focal),
                jnp.zeros((1, 8, 3), jnp.float32),
                jnp.zeros((1, 8, 3), jnp.float32),
            )
            variables = checkpoints.load_weights(args, variables)
            pipeline = RenderPipeline(net, renderer)

        # per-object render (scene conditioning differs per object)
        for sb in range(SB):
            scene = encode_fn(
                variables,
                jnp.asarray(pri_images[sb : sb + 1]),
                jnp.asarray(pri_poses[sb : sb + 1]),
                jnp.asarray(focal),
            )
            jrng, step = jax.random.split(jrng)
            rgb, _depth = pipeline.render_simple(
                variables,
                scene,
                all_rays[sb],
                step,
                ray_batch_size=args.ray_batch_size,
            )
            rgb = np.clip(np.asarray(rgb).reshape(H, W, 3), 0, 1)
            gt = images_0to1[sb, dest_view[sb, 0]]
            total_ssim += metrics.ssim(rgb, gt, data_range=1.0)
            total_psnr += metrics.psnr(rgb, gt)
            cnt += 1
        print("curr psnr", total_psnr / cnt, "ssim", total_ssim / cnt)
    print("final psnr", total_psnr / cnt, "ssim", total_ssim / cnt)


if __name__ == "__main__":
    main()
