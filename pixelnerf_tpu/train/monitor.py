"""Training monitor: sliding-window loss/PSNR statistics, ETA, sanity warnings,
convergence detection (reference train/monitor.py:12-89).

Standalone utility — not wired into the trainer by default, mirroring the
reference, but available for interactive use and notebooks.
"""

from __future__ import annotations

import time
from collections import deque

import numpy as np


class TrainingMonitor:
    def __init__(self, window_size: int = 100):
        self.window_size = window_size
        self.losses = deque(maxlen=window_size)
        self.psnrs = deque(maxlen=window_size)
        self.all_losses = []
        self.all_psnrs = []
        self.start_time = time.time()
        self.iter_times = deque(maxlen=window_size)

    def update(self, loss: float, psnr: float) -> None:
        self.losses.append(loss)
        self.psnrs.append(psnr)
        self.all_losses.append(loss)
        self.all_psnrs.append(psnr)

    def get_stats(self) -> dict:
        if len(self.losses) == 0:
            return {}
        return {
            "loss_mean": float(np.mean(self.losses)),
            "loss_std": float(np.std(self.losses)),
            "psnr_mean": float(np.mean(self.psnrs)),
            "psnr_std": float(np.std(self.psnrs)),
            "psnr_max": float(np.max(self.psnrs)),
            "psnr_min": float(np.min(self.psnrs)),
        }

    def print_stats(self, epoch: int, iteration: int, total_iterations: int) -> None:
        stats = self.get_stats()
        if not stats:
            return
        elapsed = time.time() - self.start_time
        eta = elapsed / (iteration + 1) * (total_iterations - iteration - 1)
        print("=" * 70)
        print(f"Epoch {epoch} | Iter {iteration}/{total_iterations}")
        print(f"Loss:  {stats['loss_mean']:.6f} +/- {stats['loss_std']:.6f}")
        print(
            f"PSNR:  {stats['psnr_mean']:.2f} +/- {stats['psnr_std']:.2f} dB "
            f"(min {stats['psnr_min']:.2f}, max {stats['psnr_max']:.2f})"
        )
        print(f"Time:  elapsed {elapsed / 60:.1f} min, ETA {eta / 60:.1f} min")
        print("=" * 70)
        # sanity banding (same thresholds as reference monitor.py:64-71)
        if stats["psnr_mean"] < 10:
            print(
                "warning: mean PSNR under 10 dB — likely a data or model "
                "wiring problem"
            )
        elif stats["psnr_mean"] < 15:
            print(
                "warning: mean PSNR under 15 dB — training may need "
                "hyperparameter adjustment"
            )
        elif stats["psnr_mean"] > 30:
            print("mean PSNR above 30 dB — excellent reconstruction quality")
        elif stats["psnr_mean"] > 25:
            print("mean PSNR above 25 dB — within the expected range")

    def check_convergence(self, patience: int = 10, threshold: float = 0.1) -> bool:
        """PSNR improvement over the last `patience` window below `threshold`
        -> probably converged (reference monitor.py:73-89)."""
        if len(self.all_psnrs) < patience * 2:
            return False
        recent = self.all_psnrs[-patience:]
        previous = self.all_psnrs[-patience * 2 : -patience]
        improvement = float(np.mean(recent) - np.mean(previous))
        if improvement < threshold:
            print("warning: PSNR has plateaued — training looks converged")
            print(f"   improvement over the last window: {improvement:.4f} dB")
            print("   consider lowering the learning rate or stopping early")
            return True
        return False
