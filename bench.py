"""Benchmark: gen_video ray throughput on the flagship sn64 pixel-NeRF model.

Measures steady-state rays/sec through the full conditioned render path
(pixel-aligned feature indexing + coarse 64 / fine 32+16 sampling + compositing
— the reference's default operating point, conf/default.conf:50-55) on one chip,
on a synthetic 64x64 scene with one source view.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference publishes no throughput numbers (BASELINE.md) — the
denominator is a 50,000 rays/sec nominal figure for the reference torch
DataParallel path on one datacenter GPU (its default -R chunk of 50k rays takes
on the order of a second at 112 samples/ray on a V100-class part; README.md:140
and the "many days"/"quite slow" operating notes, README.md:99,162).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

REFERENCE_RAYS_PER_SEC = 50_000.0


def main():
    from pixelnerf_tpu.config.args import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from pixelnerf_tpu.config import hocon
    from pixelnerf_tpu.data import SyntheticDataset
    from pixelnerf_tpu.models import PixelNeRFNet, make_model
    from pixelnerf_tpu.parallel import RenderPipeline
    from pixelnerf_tpu.render import NeRFRenderer
    from pixelnerf_tpu.utils import geometry

    here = os.path.dirname(os.path.abspath(__file__))
    conf_name = os.environ.get("BENCH_CONF", "sn64")
    conf_path = (
        conf_name
        if os.sep in conf_name
        else os.path.join(here, "conf", "exp", f"{conf_name}.conf")
    )
    conf = hocon.parse_file(conf_path)
    # "auto": fused Pallas kernel on TPU, plain XLA elsewhere (CPU dry runs)
    mlp_impl = "auto" if os.environ.get("BENCH_PALLAS", "1") != "0" else "xla"
    net = make_model(conf["model"], mlp_impl=mlp_impl)

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

    scene = net.apply(
        variables,
        jnp.asarray(sample["images"][None, :1]),
        jnp.asarray(sample["poses"][None, :1]),
        jnp.asarray(focal),
        method=PixelNeRFNet.encode,
    )

    import jax.numpy as _jnp

    # reference renderer defaults: 64 coarse + (16 importance + 16 depth) fine
    renderer = NeRFRenderer.from_conf(
        conf["renderer"], eval_batch_size=1_000_000
    )
    # measured: matmul rate is dtype-independent on this part and the casts
    # cost ~5%, so f32 inputs are the default (the fused kernel computes in
    # bf16 with f32 accumulation regardless)
    use_bf16 = os.environ.get("BENCH_BF16", "0") != "0"
    # on a multi-chip host, shard the ray axis over all local chips (the
    # metric is rays/sec/chip, so the reported value divides by chip count)
    mesh = None
    n_chips = len(jax.devices())
    if n_chips > 1:
        from pixelnerf_tpu.parallel import make_ray_mesh

        mesh = make_ray_mesh()
    pipeline = RenderPipeline(
        net,
        renderer,
        mesh=mesh,
        compute_dtype=_jnp.bfloat16 if use_bf16 else None,
    )

    # video rays: 16 frames of 64x64 = 65,536 rays per timed pass
    poses = np.stack(
        [
            geometry.pose_spherical(a, -15.0, 1.3)
            for a in np.linspace(-180, 180, 17)[:-1]
        ]
    )
    rays = geometry.gen_rays_np(poses, 64, 64, float(focal), 0.8, 1.8).reshape(
        -1, 8
    )
    # -R semantics: upper bound on the device-side ray chunk; the pipeline
    # renders the whole pass in ONE dispatch (lax.map over chunks on device).
    # 16384 measures ~1.3% over 8192 on the NS=1 fused path (fewer lax.map
    # steps); the RenderPipeline default stays 8192 because dense-gather NS=3
    # full-res shapes double their HBM-resident sampled latents with chunk.
    chunk = int(os.environ.get("BENCH_RAY_CHUNK", 16384))

    from pixelnerf_tpu.parallel import unpack_simple

    rng = jax.random.PRNGKey(1)
    # warmup / compile
    pipeline.render_simple(variables, scene, rays, rng, ray_batch_size=chunk)

    # gen_video's consumer loop: enqueue every pass (async dispatch), then
    # fetch the packed (rgb, depth) frames — fetch of pass i overlaps device
    # compute of pass i+1, exactly how a video writer drains frames
    n_timed = 3
    t0 = time.perf_counter()
    pending = [
        pipeline.render_simple(
            variables, scene, rays, jax.random.fold_in(rng, i),
            ray_batch_size=chunk, as_numpy=False,
        )
        for i in range(n_timed)
    ]
    outs = [unpack_simple(p) for p in pending]
    dt = time.perf_counter() - t0
    assert all(np.isfinite(rgb).all() for rgb, _ in outs)

    rays_per_sec = n_timed * rays.shape[0] / dt / n_chips
    print(
        json.dumps(
            {
                "metric": "gen_video_rays_per_sec_per_chip",
                "value": round(rays_per_sec, 1),
                "unit": "rays/s",
                "vs_baseline": round(rays_per_sec / REFERENCE_RAYS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
