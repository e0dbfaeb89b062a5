"""Decisive offcenter forensic: does the trained field reproduce its own
TRAINING views?

docs/SCENES.md (round 5) narrowed the offcenter collapse to a degenerate
view-dependent fit after refuting dead-relu (softplus ablation),
supervision coverage, conditioning geometry, and ray<->target
correspondence.  This probe separates the two remaining explanations:

- reproduce-train / fail-novel  -> degenerate view-dependent fit (the
  optimizer explains supervised pixels without view-consistent density);
- fail-both                     -> train-loss vs render-path inconsistency.

Run (TPU): ``python scripts/probe_offcenter_trainview.py``
Env: the bench training knobs apply (BENCH_TRAIN_*, BENCH_SIGMA_ACT).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("BENCH_SCENE", "offcenter")
os.environ.setdefault("BENCH_TRAIN_ALPHA", "1.0")
os.environ.setdefault("BENCH_TRAIN_COARSE", "64")

import bench  # noqa: E402


def main():
    from pixelnerf_tpu.config.args import enable_compilation_cache
    from pixelnerf_tpu.utils import geometry

    enable_compilation_cache()
    s = bench.setup_scene()
    H, W = s.sample["images"].shape[1:3]
    n_report = min(4, s.sample["images"].shape[0])
    near, far = (float(np.asarray(s.rays[0, 6])), float(np.asarray(s.rays[0, 7])))

    def render(rays_np):
        import jax.numpy as jnp

        rgb, _ = s.pipeline.render_simple(
            s.variables, s.scene, jnp.asarray(rays_np), s.rng,
            ray_batch_size=s.chunk, pack="u8",
        )
        return np.asarray(rgb)

    # render the field from its own supervision poses (dense path — no
    # pruning, so an empty result is the field, not the grid)
    for v in range(n_report):
        pose = s.sample["poses"][v]
        rays = geometry.gen_rays_np(
            pose[None], W, H, float(s.focal), near, far
        ).reshape(-1, 8)
        rgb = render(rays)
        gt01 = s.sample["images"][v].reshape(-1, 3) * 0.5 + 0.5
        psnr = bench.psnr_vs(rgb, gt01)
        fg = float(np.mean(np.abs(rgb - 1.0).max(axis=-1) > 0.08))
        gt_fg = float(np.mean(np.abs(gt01 - 1.0).max(axis=-1) > 0.08))
        bench.log(
            f"probe: train view {v}: PSNR vs its own training image "
            f"{psnr:.1f} dB, rendered fg {fg:.3f} (gt fg {gt_fg:.3f})"
        )

    # and one novel ring pose for contrast
    novel = np.asarray(geometry.pose_spherical(45.0, -15.0, 1.3))
    rays = geometry.gen_rays_np(
        novel[None], W, H, float(s.focal), near, far
    ).reshape(-1, 8)
    fg = float(np.mean(np.abs(render(rays) - 1.0).max(axis=-1) > 0.08))
    bench.log(f"probe: novel pose rendered fg {fg:.3f}")


if __name__ == "__main__":
    main()
