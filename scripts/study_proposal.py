"""Perf/quality study: proposal-mode sample counts vs the probe ladder.

Trains the bench scene ONCE (bench.quick_train), then sweeps
(accel_probe_samples, accel_proposal_samples) variants through the same
timed-round protocol bench.py uses, reporting rays/s and PSNR-vs-dense per
variant.  Grid probes are lookups (~free); proposal samples are MLP evals —
the hypothesis is that a finer probe pdf lets fewer proposal samples hit the
same PSNR gate, cutting field evals per ray.

Run on TPU:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/study_proposal.py
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench as benchmod


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

    log = benchmod.log
    log("study: backend", jax.default_backend())

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
    variables = benchmod.quick_train(
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
    base_cfg = renderer.base_cfg
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

    # dense reference render (also sanity: object present)
    rgb_dense, _ = pipeline.render_simple(
        variables, scene, rays, rng, ray_batch_size=chunk
    )
    rgb_dense = np.asarray(rgb_dense)
    fg_frac = float(np.mean(np.abs(rgb_dense - 1.0).max(axis=-1) > 0.08))
    log(f"study: dense fg_frac {fg_frac:.3f}")
    assert fg_frac > 0.03, "empty scene; study meaningless"

    def timed_round(n_passes: int = 3) -> float:
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
        assert all(np.isfinite(rgb).all() for rgb, _ in outs)
        return n_passes * rays.shape[0] / dt

    # (probe, proposal_samples[, n_fine_depth]) variants
    VARIANTS = [
        (0, 40, None),    # current production point (275k baseline)
        (128, 40, None),  # finer pdf, same evals — quality delta only
        (128, 32, None),
        (128, 24, None),
        (128, 16, None),
        (64, 24, None),   # is the finer ladder actually needed at low counts?
        (128, 24, 8),     # sharper depth estimate -> fewer depth-centered draws
        (128, 32, 8),
    ]
    results = []
    for probe, nprop, nfd in VARIANTS:
        cfg = dataclasses.replace(
            base_cfg,
            accel_mode="proposal",
            accel_probe_samples=probe,
            accel_proposal_samples=nprop,
            **({} if nfd is None else {"n_fine_depth": nfd}),
        )
        renderer.base_cfg = cfg
        pipeline.build_accel(variables, scene, rays, ray_batch_size=chunk)
        if pipeline.accel is None:
            log(f"study: variant {probe}/{nprop} -> accel disabled, skipping")
            continue
        t0 = time.perf_counter()
        rgb_p, _ = pipeline.render_simple(
            variables, scene, rays, rng, ray_batch_size=chunk
        )
        compile_s = time.perf_counter() - t0
        mse = float(np.mean((np.asarray(rgb_p) - rgb_dense) ** 2))
        psnr = -10.0 * np.log10(max(mse, 1e-12))
        timed_round()  # steady-state warmup
        rates = [timed_round()]
        for _ in range(4):
            rates.append(timed_round())
            if abs(rates[-1] - rates[-2]) / max(rates[-1], rates[-2]) < 0.04:
                break
        rate = float(np.median(rates))
        evals = nprop + (nfd if nfd is not None else base_cfg.n_fine_depth)
        row = {
            "probe": probe, "proposal_samples": nprop,
            "n_fine_depth": nfd if nfd is not None else base_cfg.n_fine_depth,
            "evals_per_ray": evals, "psnr_vs_dense": round(psnr, 1),
            "rays_per_sec": round(rate, 0), "compile_s": round(compile_s, 1),
        }
        results.append(row)
        log("study:", json.dumps(row))

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
