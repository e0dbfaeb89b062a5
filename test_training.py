"""End-to-end training smoke test with phase timing (parity with the reference
test_training.py:1-427): replays the full train setup and a few training steps,
timing data prep / forward+backward separately and reporting memory.

Run: python test_training.py [-F synthetic|dvr|srn] [-D datadir] [--steps 3]
Defaults to the built-in synthetic dataset so it works with no downloads.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset_format", "-F", type=str, default="synthetic")
    parser.add_argument("--datadir", "-D", type=str, default="data")
    parser.add_argument("--conf", "-c", type=str, default="conf/exp/sn64.conf")
    parser.add_argument("--steps", type=int, default=3)
    parser.add_argument("--ray_batch_size", "-R", type=int, default=128)
    parser.add_argument("--batch_size", "-B", type=int, default=2)
    args = parser.parse_args()

    import psutil

    proc = psutil.Process()

    def rss_mb():
        return proc.memory_info().rss / 1e6

    print("=" * 60)
    print("TRAINING SMOKE TEST")
    print(f"  backend rss at start: {rss_mb():.0f} MB")
    print("=" * 60)

    import jax
    import jax.numpy as jnp
    import optax

    from pixelnerf_tpu.config import parse_file
    from pixelnerf_tpu.data import get_split_dataset
    from pixelnerf_tpu.data.loader import DataLoader, collate
    from pixelnerf_tpu.models import make_model
    from pixelnerf_tpu.models.losses import l2_loss
    from pixelnerf_tpu.render import RenderConfig
    from pixelnerf_tpu.train.trainer import (
        TrainState,
        make_step_fns,
        prepare_ray_batch,
    )

    t0 = time.time()
    conf = parse_file(args.conf)
    dset = get_split_dataset(
        args.dataset_format, args.datadir, want_split="train"
    )
    print(f"[setup] dataset: {len(dset)} objects ({time.time()-t0:.1f}s)")

    net = make_model(conf["model"])
    sample = dset[0]
    variables = net.init(
        jax.random.PRNGKey(0),
        jnp.asarray(sample["images"][None, :1]),
        jnp.asarray(sample["poses"][None, :1]),
        jnp.asarray(np.asarray(sample["focal"], np.float32)),
        jnp.zeros((1, 8, 3), jnp.float32),
        jnp.zeros((1, 8, 3), jnp.float32),
    )
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))
    print(f"[setup] model: {n_params:,} params, rss {rss_mb():.0f} MB")

    cfg = RenderConfig(
        n_coarse=conf.get_int("renderer.n_coarse", 64),
        n_fine=conf.get_int("renderer.n_fine", 32),
        n_fine_depth=conf.get_int("renderer.n_fine_depth", 16),
        white_bkgd=bool(conf.get_float("renderer.white_bkgd", True)),
    )
    optimizer = optax.adam(1e-4)
    train_step, _ = make_step_fns(
        net, optimizer, cfg, 1.0, 1.0, l2_loss, l2_loss, use_viewdirs=True
    )
    state = TrainState(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=optimizer.init(variables["params"]),
        step=jnp.zeros((), jnp.int32),
    )

    loader = DataLoader(dset, batch_size=args.batch_size, shuffle=True)
    rng_np = np.random.default_rng(0)
    rng = jax.random.PRNGKey(0)

    prep_times, step_times, losses = [], [], []
    it = iter(loader)
    for i in range(args.steps):
        try:
            data = next(it)
        except StopIteration:
            it = iter(loader)
            data = next(it)

        t0 = time.time()
        batch = prepare_ray_batch(
            data, 1, args.ray_batch_size, dset.z_near, dset.z_far, True, rng_np
        )
        prep_times.append(time.time() - t0)

        rng, step_rng = jax.random.split(rng)
        t0 = time.time()
        state, loss_dict = train_step(
            state, {k: jnp.asarray(v) for k, v in batch.items()}, step_rng
        )
        jax.block_until_ready(loss_dict["t"])
        step_times.append(time.time() - t0)
        losses.append(float(loss_dict["t"]))
        print(
            f"[step {i}] prep {prep_times[-1]*1e3:.0f} ms, "
            f"fwd+bwd+update {step_times[-1]*1e3:.0f} ms, "
            f"loss {losses[-1]:.5f}, rss {rss_mb():.0f} MB"
        )

    print("=" * 60)
    print(
        f"RESULT: compile+first step {step_times[0]:.1f}s; "
        f"steady state {np.mean(step_times[1:]) if len(step_times) > 1 else float('nan'):.2f}s/step"
    )
    ok = all(np.isfinite(losses))
    print("losses finite:", ok)
    print("SMOKE TEST", "PASSED" if ok else "FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
