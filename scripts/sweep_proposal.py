"""One-off TPU study: proposal-mode sample counts vs throughput and quality.

Reuses bench.py's scene/training/timing machinery, then sweeps
(accel_proposal_samples, n_fine_depth-in-proposal) over the SAME trained
scene, reporting rays/s and PSNR vs the dense render for each point.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/sweep_proposal.py
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench


def main():
    from pixelnerf_tpu.config.args import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from pixelnerf_tpu.config import hocon
    from pixelnerf_tpu.data import SyntheticDataset
    from pixelnerf_tpu.models import PixelNeRFNet, make_model
    from pixelnerf_tpu.parallel import RenderPipeline, unpack_simple
    from pixelnerf_tpu.render import NeRFRenderer
    from pixelnerf_tpu.utils import geometry

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    conf = hocon.parse_file(os.path.join(here, "conf", "exp", "sn64.conf"))
    net = make_model(conf["model"], mlp_impl="auto")
    use_viewdirs = net.conf.get_bool("use_viewdirs", False)

    ds = SyntheticDataset(n_objs=1, n_views=4, image_size=64)
    sample = ds[0]
    focal = np.float32(sample["focal"])

    variables = net.init(
        jax.random.PRNGKey(0),
        jnp.asarray(sample["images"][None, :1]),
        jnp.asarray(sample["poses"][None, :1]),
        jnp.asarray(focal),
        jnp.zeros((1, 8, 3), jnp.float32),
        jnp.zeros((1, 8, 3), jnp.float32),
    )
    steps = int(os.environ.get("BENCH_TRAIN_STEPS", 4000))
    train_net = make_model(conf["model"], mlp_impl="xla")
    variables = bench.quick_train(
        train_net, variables, sample, focal, use_viewdirs, steps,
        white_bkgd=conf["renderer"].get_bool("white_bkgd", True),
    )
    scene = net.apply(
        variables,
        jnp.asarray(sample["images"][None, :1]),
        jnp.asarray(sample["poses"][None, :1]),
        jnp.asarray(focal),
        method=PixelNeRFNet.encode,
    )

    renderer = NeRFRenderer.from_conf(conf["renderer"], eval_batch_size=1_000_000)
    pipeline = RenderPipeline(net, renderer)
    poses = np.stack(
        [
            geometry.pose_spherical(a, -15.0, 1.3)
            for a in np.linspace(-180, 180, 17)[:-1]
        ]
    )
    rays = geometry.gen_rays_np(poses, 64, 64, float(focal), 0.8, 1.8).reshape(
        -1, 8
    )
    chunk = int(os.environ.get("BENCH_RAY_CHUNK", 16384))
    rng = jax.random.PRNGKey(1)

    rgb_dense, _ = pipeline.render_simple(
        variables, scene, rays, rng, ray_batch_size=chunk
    )
    rgb_dense = np.asarray(rgb_dense)

    def timed(n_passes=3):
        t0 = time.perf_counter()
        pending = [
            pipeline.render_simple(
                variables, scene, rays, jax.random.fold_in(rng, i),
                ray_batch_size=chunk, as_numpy=False,
            )
            for i in range(n_passes)
        ]
        outs = [unpack_simple(p) for p in pending]
        dt = time.perf_counter() - t0
        return n_passes * rays.shape[0] / dt, outs[0][0]

    pipeline.set_accel_mode("proposal")
    pipeline.build_accel(variables, scene, rays, ray_batch_size=chunk)
    base_cfg = pipeline.renderer.base_cfg

    # sweep points: (proposal_samples, n_fine_depth, proposal_uniform)
    # uniform < 0 strips the grid's sigma field (binary-mask pdf baseline)
    grid = [
        (40, 16, -1.0), (40, 16, 0.15),
        (32, 8, -1.0), (32, 8, 0.15),
        (24, 8, 0.15), (24, 8, 0.3),
        (16, 8, 0.15), (16, 4, 0.15), (12, 4, 0.15),
    ]
    if os.environ.get("SWEEP_GRID"):
        grid = [
            tuple(float(v) for v in p.split(","))
            for p in os.environ["SWEEP_GRID"].split(";")
        ]
    sig_accel = pipeline.accel
    mask_accel = dataclasses.replace(sig_accel, sig=None, thresh=None)
    results = []
    for nprop, ndep, uni in grid:
        nprop, ndep = int(nprop), int(ndep)
        pipeline.accel = mask_accel if uni < 0 else sig_accel
        pipeline.renderer.base_cfg = dataclasses.replace(
            base_cfg,
            accel_proposal_samples=nprop,
            n_fine_depth=ndep,
            n_fine=base_cfg.n_fine - base_cfg.n_fine_depth + ndep,
            accel_proposal_uniform=max(uni, 0.0),
        )
        timed()  # compile + warmup
        rates = [timed()[0] for _ in range(3)]
        rate = float(np.median(rates))
        _, rgb = timed(1)
        mse = float(np.mean((np.asarray(rgb) - rgb_dense) ** 2))
        psnr = -10.0 * np.log10(max(mse, 1e-12))
        evals = nprop + ndep
        pdf = "mask " if uni < 0 else f"sig u={uni:.2f}"
        results.append((nprop, ndep, pdf, evals, rate, psnr))
        print(
            f"prop={nprop:3d} depth={ndep:3d} pdf={pdf} evals/ray={evals:3d} "
            f"rate={rate:10,.0f} rays/s  PSNR-vs-dense={psnr:5.1f} dB",
            flush=True,
        )

    print("\nsummary:")
    for nprop, ndep, pdf, evals, rate, psnr in results:
        print(f"{nprop},{ndep},{pdf},{evals},{rate:.0f},{psnr:.2f}")


if __name__ == "__main__":
    main()
