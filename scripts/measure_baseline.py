"""Measure a reproducible baseline for the reference's eval ray throughput.

The reference (Zxhh123/pixel-nerf-multiscale) publishes NO throughput numbers
(BASELINE.md), so the bench's ``vs_baseline`` denominator has to be derived.
This script grounds it two ways:

1. **Measured**: a freshly written torch module chain computationally
   equivalent to the reference's per-point hot path — uv projection, 512-ch
   bilinear ``F.grid_sample`` feature indexing (encoder.py:182-205),
   positional code (code.py:21-28), 5-block ResnetFC with per-block latent
   injection (resnetfc.py:173-236), sigmoid/relu heads (models.py.backup2:279)
   — timed on THIS host's CPU at the reference's eval_batch_size=100k point
   chunking (nerf.py:195-216), together with this host's measured peak f32
   matmul rate for calibration.
2. **FLOP-derived**: the analytic FLOPs/point of that chain, scaled to
   datacenter-GPU peak rates under stated utilization assumptions.

Output: a small JSON report; the interpretation lives in
docs/BASELINE_MEASUREMENT.md.  sn64 operating point: 64 coarse + 32 fine + 16
depth = 112 samples/ray (conf/default.conf:50-55), NS=1 source view.

Run: python scripts/measure_baseline.py  (torch CPU only; no jax needed)
"""

import json
import sys
import time

import numpy as np
import torch
import torch.nn.functional as F

torch.manual_seed(0)

D_HIDDEN = 512
N_BLOCKS = 5
D_LATENT = 512
NUM_FREQS = 6
SAMPLES_PER_RAY = 112  # 64 coarse + (16 importance + 16 depth) fine
FEAT_HW = 32  # sn64: 64x64 input, stride-2 layer0, use_first_pool=False


class RefPointPipeline(torch.nn.Module):
    """Computational twin of the reference per-point eval path (fresh code,
    reference cited for the op sequence only)."""

    def __init__(self):
        super().__init__()
        d_code = 3 * (2 * NUM_FREQS + 1)  # include_input
        d_in = d_code + 3  # + viewdirs appended post-code
        self.latent = torch.randn(1, D_LATENT, FEAT_HW, FEAT_HW)
        freqs = 1.5 * 2.0 ** torch.arange(NUM_FREQS, dtype=torch.float32)
        self.register_buffer("freqs", freqs)
        self.lin_in = torch.nn.Linear(d_in, D_HIDDEN)
        self.blocks = torch.nn.ModuleList(
            [
                torch.nn.ModuleDict(
                    {
                        "fc0": torch.nn.Linear(D_HIDDEN, D_HIDDEN),
                        "fc1": torch.nn.Linear(D_HIDDEN, D_HIDDEN),
                    }
                )
                for _ in range(N_BLOCKS)
            ]
        )
        # combine_layer=3: blocks 0..2 get latent injection (default_mv.conf:9)
        self.lin_z = torch.nn.ModuleList(
            [torch.nn.Linear(D_LATENT, D_HIDDEN) for _ in range(3)]
        )
        self.lin_out = torch.nn.Linear(D_HIDDEN, 4)

    def forward(self, xyz: torch.Tensor, viewdirs: torch.Tensor):
        # projection: uv = -xy/z * focal + c (models.py.backup2:215-221)
        uv = -xyz[:, :2] / xyz[:, 2:3] * 60.0 + 32.0
        grid = (uv / 32.0 - 1.0).view(1, 1, -1, 2)
        z = (
            F.grid_sample(
                self.latent, grid, mode="bilinear", padding_mode="border",
                align_corners=True,
            )
            .view(D_LATENT, -1)
            .t()
        )  # (P, 512)
        # positional code (code.py:21-28)
        ang = xyz[..., None] * self.freqs  # (P, 3, F)
        code = torch.cat(
            [xyz, torch.sin(ang).flatten(1), torch.cos(ang).flatten(1)], dim=1
        )
        x = self.lin_in(torch.cat([code, viewdirs], dim=1))
        for i, blk in enumerate(self.blocks):
            if i < 3:
                x = x + self.lin_z[i](z)
            dx = blk["fc1"](F.relu(blk["fc0"](F.relu(x))))
            x = x + dx
        out = self.lin_out(F.relu(x))
        return torch.cat(
            [torch.sigmoid(out[:, :3]), F.relu(out[:, 3:])], dim=1
        )


def flops_per_point() -> float:
    d_code = 3 * (2 * NUM_FREQS + 1)
    d_in = d_code + 3
    macs = (
        d_in * D_HIDDEN  # lin_in
        + N_BLOCKS * 2 * D_HIDDEN * D_HIDDEN  # resnet blocks
        + 3 * D_LATENT * D_HIDDEN  # lin_z injections
        + D_HIDDEN * 4  # lin_out
    )
    return 2.0 * macs  # + ~4*512 grid_sample taps and sin/cos, negligible


def measure_model_cpu(n_points: int = 100_000, n_chunks: int = 4) -> float:
    model = RefPointPipeline().eval()
    xyz = torch.randn(n_points, 3) * 0.5 + torch.tensor([0.0, 0.0, -1.3])
    dirs = F.normalize(torch.randn(n_points, 3), dim=1)
    with torch.no_grad():
        model(xyz[:1024], dirs[:1024])  # warmup
        t0 = time.perf_counter()
        for _ in range(n_chunks):
            model(xyz, dirs)
        dt = time.perf_counter() - t0
    return n_chunks * n_points / dt


def measure_train_step_cpu(n_steps: int = 3) -> dict:
    """Torch fwd+bwd+Adam through the same chain at the reference TRAIN recipe
    (train.py:88, conf/default.conf:50-55): 4 objects x 128 rays x 160 field
    evals (64 coarse + 96 fine-union) = 81,920 points/step, NS=1.

    Returns the measured train points/s and the fwd+bwd/fwd-only rate ratio —
    the ground truth for the bench's /3 'zero-overhead autograd' assumption
    (the measured eager ratio is WORSE than 3x, so /3 stays generous)."""
    pts_step = 4 * 128 * 160
    model = RefPointPipeline().train()
    opt = torch.optim.Adam(model.parameters(), lr=1e-4)
    xyz = torch.randn(pts_step, 3) * 0.5 + torch.tensor([0.0, 0.0, -1.3])
    dirs = F.normalize(torch.randn(pts_step, 3), dim=1)
    target = torch.rand(pts_step, 4)

    def step():
        opt.zero_grad()
        out = model(xyz, dirs)
        loss = F.mse_loss(out, target)
        loss.backward()
        opt.step()

    step()  # warmup
    t0 = time.perf_counter()
    for _ in range(n_steps):
        step()
    dt = time.perf_counter() - t0
    train_pts = n_steps * pts_step / dt

    with torch.no_grad():
        model(xyz, dirs)
        t0 = time.perf_counter()
        for _ in range(n_steps):
            model(xyz, dirs)
        fwd_pts = n_steps * pts_step / (time.perf_counter() - t0)
    return {
        "train_points_per_sec": round(train_pts),
        "train_rays_per_sec": round(train_pts / 160.0, 1),
        "fwd_points_per_sec_same_chunk": round(fwd_pts),
        "fwd_over_train_ratio": round(fwd_pts / train_pts, 2),
    }


def measure_cpu_peak_gflops(n: int = 1024, reps: int = 8) -> float:
    a = torch.randn(n, n)
    b = torch.randn(n, n)
    a @ b
    t0 = time.perf_counter()
    for _ in range(reps):
        a @ b
    dt = time.perf_counter() - t0
    return reps * 2 * n**3 / dt / 1e9


def main():
    fpp = flops_per_point()
    pts_cpu = measure_model_cpu()
    peak_cpu = measure_cpu_peak_gflops()
    eff_cpu = fpp * pts_cpu / 1e9  # model-effective GFLOP/s on CPU
    util_cpu = eff_cpu / peak_cpu

    # datacenter-GPU peak matmul rates (public spec sheets) for the dtypes the
    # reference would use: V100 fp32 (pre-TF32 torch), A100 TF32 (torch >= 1.7
    # default on Ampere).  requirements.txt pins torch 1.6-1.13-era.
    gpus = {
        "V100_fp32": 15.7e12,
        "A100_tf32": 156e12,  # dense TF32 (sparse would be 312)
    }

    report = {
        "flops_per_point": fpp,
        "samples_per_ray": SAMPLES_PER_RAY,
        "cpu": {
            "model_points_per_sec": round(pts_cpu),
            "model_rays_per_sec": round(pts_cpu / SAMPLES_PER_RAY, 1),
            "peak_matmul_gflops": round(peak_cpu, 1),
            "model_effective_gflops": round(eff_cpu, 1),
            "model_utilization_of_peak": round(util_cpu, 3),
        },
        "gpu_estimates_rays_per_sec": {},
    }
    # utilization band: the CPU-measured utilization is the floor (cache-poor
    # 1-core host); batched 100k-point GPU chunks typically land 0.4-0.7 of
    # peak on this op mix (matmul-dominated with one scattered gather)
    for name, peak in gpus.items():
        for util in (0.4, 0.7):
            rays = peak * util / fpp / SAMPLES_PER_RAY
            report["gpu_estimates_rays_per_sec"][f"{name}_util{util}"] = round(
                rays
            )
    if "--train" in sys.argv:
        report["train"] = measure_train_step_cpu()
    json.dump(report, sys.stdout, indent=2)
    print()


if __name__ == "__main__":
    main()
