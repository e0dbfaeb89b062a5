"""Training entry point (CLI parity with reference train/train.py:27-546).

Usage:
    python train/train.py -n <exp> -c conf/exp/<x>.conf -D <datadir>
        [-B 4] [-V "1 2"] [--epochs N] [--lr 1e-4] [-R 128] [--resume] ...
"""

import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import numpy as np


def extra_args(parser):
    parser.add_argument(
        "--batch_size", "-B", type=int, default=4, help="Object batch size ('SB')"
    )
    parser.add_argument(
        "--nviews",
        "-V",
        type=str,
        default="1",
        help="Number of source views (multiview); '1 2' to use 1 or 2 randomly",
    )
    parser.add_argument(
        "--freeze_enc",
        action="store_true",
        default=None,
        help="Freeze encoder weights and only train MLP",
    )
    parser.add_argument(
        "--no_bbox_step",
        type=int,
        default=100000,
        help="Step to stop using bbox sampling",
    )
    parser.add_argument(
        "--fixed_test",
        action="store_true",
        default=None,
        help="Freeze test view for visualization",
    )
    parser.add_argument("--use_amp", action="store_true", default=None)
    parser.add_argument("--no_amp", action="store_true", default=None)
    parser.add_argument("--check_gradients", action="store_true", default=None)
    parser.add_argument("--grad_clip", type=float, default=1.0)
    parser.add_argument(
        "--debug_nans",
        action="store_true",
        default=None,
        help="Enable jax NaN debugging (numerical sanitizer; SURVEY §5.2)",
    )
    parser.add_argument(
        "--profile_dir",
        type=str,
        default=None,
        help="Capture a jax.profiler device trace of train steps 3-5 into "
        "this directory (TensorBoard-viewable; TPU-native analog of the "
        "reference's torch record_function tracing, SURVEY §5.1)",
    )
    parser.add_argument(
        "--mlp_impl",
        type=str,
        default="auto",
        choices=("auto", "pallas", "xla"),
        help="Field-MLP implementation for train steps: 'auto' uses the fused "
        "VMEM-resident Pallas kernel (forward + custom-VJP backward) on TPU "
        "and XLA elsewhere; 'pallas' forces the kernel; 'xla' forces the "
        "plain (memory-bound) XLA MLP",
    )
    return parser


def main():
    import jax
    import jax.numpy as jnp

    from pixelnerf_tpu.config import parse_args
    from pixelnerf_tpu.data import get_split_dataset
    from pixelnerf_tpu.models import PixelNeRFNet, make_model
    from pixelnerf_tpu.parallel import RenderPipeline
    from pixelnerf_tpu.render import NeRFRenderer
    from pixelnerf_tpu.train import checkpoints
    from pixelnerf_tpu.train.trainer import Trainer
    from pixelnerf_tpu.utils import geometry, metrics

    args, conf = parse_args(
        extra_args, training=True, default_ray_batch_size=128
    )

    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)
        print("NaN debugging enabled")

    # conf-vs-CLI AMP precedence (reference train.py:92-101)
    use_amp = conf.get_bool("train.use_amp", True)
    if args.use_amp:
        use_amp = True
    if args.no_amp:
        use_amp = False
    args.use_amp = use_amp

    dset, val_dset, _ = get_split_dataset(args.dataset_format, args.datadir)
    print(
        "dset z_near {}, z_far {}, lindisp {}".format(
            dset.z_near, dset.z_far, dset.lindisp
        )
    )

    # diff_mode keeps every field-kernel input dense (no eval-only deferred
    # LatentGather/RawCode forms) so the fused MLP is differentiable — the
    # training analog of the reference's autograd through resnetfc.py:173-236
    net = make_model(
        conf["model"],
        stop_encoder_grad=bool(args.freeze_enc),
        mlp_impl=args.mlp_impl,
        diff_mode=True,
    )
    renderer = NeRFRenderer.from_conf(
        conf["renderer"], lindisp=dset.lindisp, eval_batch_size=args.ray_batch_size
    )

    # --- init model variables from one sample ---
    sample = dset[0]
    H, W = sample["images"].shape[1:3]
    max_nviews = max(int(x) for x in args.nviews.split())
    init_images = jnp.asarray(
        sample["images"][None, :max_nviews], jnp.float32
    )
    init_poses = jnp.asarray(sample["poses"][None, :max_nviews], jnp.float32)
    init_focal = jnp.asarray(np.asarray(sample["focal"], np.float32))
    init_c = sample.get("c")
    # jitted init: flax Module.init otherwise dispatches thousands of eager
    # ops, each paying a remote-TPU tunnel round trip (~minutes wall)
    variables = jax.jit(net.init)(
        jax.random.PRNGKey(0),
        init_images,
        init_poses,
        init_focal,
        jnp.zeros((1, 8, 3), jnp.float32),
        jnp.zeros((1, 8, 3), jnp.float32),
        c=jnp.asarray(init_c) if init_c is not None else None,
    )
    # pretrained ImageNet backbone first (reference encoder.py:61-67) — but a
    # resumed checkpoint would overwrite it anyway, so skip the fetch then
    # (both checkpoint schemes count: upstream pixel_nerf_latest AND the
    # Trainer-managed latest.ckpt)
    managed_latest = os.path.join(
        args.checkpoints_path, args.name, "latest.ckpt"
    )
    if not (
        args.resume
        and (
            os.path.exists(checkpoints.checkpoint_path(args))
            or os.path.exists(managed_latest)
        )
    ):
        from pixelnerf_tpu.utils import torch_convert

        variables = torch_convert.load_pretrained_backbones(
            variables, conf["model"]
        )
    variables = checkpoints.load_weights(args, variables, opt_init=True)

    # --- multi-device training mesh (reference: --gpu_id '0 1 3' drives
    # DataParallel, train.py:171 / nerf.py:368-370; here the gpu_id count is a
    # device-count hint selecting an SPMD ("data", "rays") mesh) ---
    mesh = None
    n_req = len(args.gpu_id)
    if n_req > 1:
        import math

        from pixelnerf_tpu.parallel import make_train_mesh

        n_dev = min(n_req, len(jax.devices()))
        if n_dev < n_req:
            print(
                f"WARNING: --gpu_id requests {n_req} devices, "
                f"only {n_dev} available; using {n_dev}"
            )
        # object batch shards over "data"; leftover devices shard the
        # per-object ray batch over "rays"
        dp = math.gcd(n_dev, args.batch_size)
        rp = n_dev // dp
        if args.ray_batch_size % rp != 0:
            args.ray_batch_size = -(-args.ray_batch_size // rp) * rp
            print(
                f"NOTE: ray_batch_size rounded up to {args.ray_batch_size} "
                f"(multiple of rays axis {rp})"
            )
        mesh = make_train_mesh(n_dev, data_parallel=dp)
        print(
            f"Training mesh: data={dp} x rays={rp} over "
            f"{n_dev} {jax.devices()[0].platform} device(s)"
        )

    class PixelNeRFTrainer(Trainer):
        def __init__(self):
            super().__init__(
                net, variables, dset, val_dset, renderer, args, conf, mesh=mesh
            )
            self._fixed_vis_idx = 0

        def vis_step(self, data):
            """Render one held-out view; grid = [src | gt | depth | coarse rgb |
            fine rgb] (reference train.py:423-537)."""
            images = data["images"][0]  # (NV, H, W, 3)
            poses = data["poses"][0]
            focal = np.asarray(data["focal"][0])
            c = data.get("c")
            c = None if c is None else np.asarray(c[0])
            NV = images.shape[0]
            if getattr(args, "fixed_test", False):
                src_view = np.array([0])
                target = min(1, NV - 1)
            else:
                perm = self.rng.permutation(NV)
                src_view, target = perm[:1], int(perm[-1])

            scene = self.net.apply(
                {"params": self.state.params, "batch_stats": self.state.batch_stats},
                jnp.asarray(images[src_view][None]),
                jnp.asarray(poses[src_view][None]),
                jnp.asarray(focal),
                c=jnp.asarray(c) if c is not None else None,
                method=PixelNeRFNet.encode,
            )
            rays = geometry.gen_rays_np(
                poses[target : target + 1], W, H, focal, self.z_near, self.z_far, c=c
            ).reshape(-1, 8)
            pipeline = RenderPipeline(self.net, self.renderer)
            out = pipeline.render(
                {"params": self.state.params, "batch_stats": self.state.batch_stats},
                scene,
                rays,
                jax.random.PRNGKey(int(self.global_step)),
                ray_batch_size=args.ray_batch_size * 16,
                want_weights=True,
            )
            gt = images[target] * 0.5 + 0.5
            src_vis = images[src_view[0]] * 0.5 + 0.5

            # one row per head: src | gt | depth | rgb | alpha
            # (reference vis layout, train.py:497-527)
            def row(branch):
                rgb = np.clip(branch["rgb"].reshape(H, W, 3), 0, 1)
                depth_vis = (
                    metrics.cmap(branch["depth"].reshape(H, W)).astype(np.float32)
                    / 255.0
                )
                alpha = branch["weights"].reshape(H, W, -1).sum(-1)
                alpha_vis = metrics.cmap(alpha).astype(np.float32) / 255.0
                return np.hstack([src_vis, gt, depth_vis, rgb, alpha_vis]), rgb

            rows = [row(out["coarse"])]
            if "fine" in out:
                rows.append(row(out["fine"]))
            grid = np.vstack([r[0] for r in rows])
            vis_psnr = metrics.psnr(rows[-1][1], gt)
            return (grid * 255).astype(np.uint8), vis_psnr

    trainer = PixelNeRFTrainer()
    trainer.start()
    # final model weights in the upstream pixel_nerf_latest location
    checkpoints.save_weights(
        args,
        {"params": trainer.state.params, "batch_stats": trainer.state.batch_stats},
    )


if __name__ == "__main__":
    main()
