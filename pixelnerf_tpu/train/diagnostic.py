"""On-demand verification routines (reference train/diagnostic.py:13-313):
dataset range / NaN checks, architecture dimension-consistency check, and
forward-output range check.  One deliberate divergence: the reference's
diagnostic asserts images in [0, 1] (diagnostic.py:50-56), which contradicts its
own training math (``images * 0.5 + 0.5`` at train.py:280) — this framework uses
the upstream [-1, 1] convention throughout (SURVEY §0.5), and the check here
validates that.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


class DiagnosticTool:
    def __init__(self, save_dir: str = "debug"):
        self.save_dir = save_dir
        os.makedirs(save_dir, exist_ok=True)

    # ------------------------------------------------------------------
    def check_data_range(self, dataset, num_samples: int = 5) -> bool:
        print("=" * 70)
        print("DATA RANGE VERIFICATION")
        print("=" * 70)
        ok = True
        for i in range(min(num_samples, len(dataset))):
            try:
                sample = dataset[i]
            except Exception as e:
                print(f"   ERROR loading sample {i}: {e}")
                ok = False
                continue
            print(f"Sample {i}: path={sample.get('path', 'N/A')}")
            for key, value in sample.items():
                if not isinstance(value, np.ndarray):
                    continue
                v = value.astype(np.float64)
                print(
                    f"   {key}: shape {value.shape} dtype {value.dtype} "
                    f"range [{v.min():.4f}, {v.max():.4f}] "
                    f"mean {v.mean():.4f} std {v.std():.4f}"
                )
                if np.isnan(v).any():
                    print("      ERROR: contains NaN!")
                    ok = False
                if np.isinf(v).any():
                    print("      ERROR: contains Inf!")
                    ok = False
                if key == "images":
                    if v.min() >= -1.01 and v.max() <= 1.01 and v.min() < -0.1:
                        print("      OK: images in [-1, 1] (upstream convention)")
                    elif v.min() >= 0:
                        print(
                            "      WARNING: images look [0, 1]-normalized; this "
                            "framework expects [-1, 1]"
                        )
                        ok = False
        print("=" * 70)
        return ok

    # ------------------------------------------------------------------
    def check_model_architecture(self, net, variables: Optional[dict] = None) -> bool:
        print("=" * 70)
        print("MODEL ARCHITECTURE VERIFICATION")
        print("=" * 70)
        bound = net.bind(variables) if variables is not None else None
        tgt = bound if bound is not None else net
        try:
            enc = tgt.encoder
            print(f"Encoder: {type(enc).__name__} latent_size={enc.latent_size} "
                  f"multi_scale={enc.use_multi_scale}")
        except Exception:
            print("Encoder: (unbound)")
        ok = True
        if bound is not None:
            print(
                f"Model: latent_size={bound.latent_size} d_latent={bound.d_latent} "
                f"d_in={bound.d_in} d_out={bound.d_out}"
            )
            enc_ls = bound.encoder.latent_size
            expected = sum(enc_ls) if isinstance(enc_ls, (list, tuple)) else enc_ls
            if not bound.use_smart_fusion and bound.latent_size != expected:
                print(
                    f"   ERROR: latent size mismatch! expected {expected}, "
                    f"got {bound.latent_size}"
                )
                ok = False
            else:
                print("   OK: latent sizes consistent")
        if variables is not None:
            n_params = sum(
                int(np.prod(x.shape)) for x in jax.tree.leaves(variables["params"])
            )
            n_stats = sum(
                int(np.prod(x.shape))
                for x in jax.tree.leaves(variables.get("batch_stats", {}))
            )
            print(f"Parameters: {n_params:,} (+ {n_stats:,} batch stats)")
        print("=" * 70)
        return ok

    # ------------------------------------------------------------------
    def check_model_output(self, net, variables, sample: dict) -> bool:
        """Forward a sample and verify rgb in [0,1], sigma >= 0, all finite
        (reference diagnostic.py:105-187)."""
        from ..models.pixelnerf import PixelNeRFNet

        print("=" * 70)
        print("MODEL OUTPUT VERIFICATION")
        print("=" * 70)
        images = jnp.asarray(sample["images"][None, :1])
        poses = jnp.asarray(sample["poses"][None, :1])
        focal = jnp.asarray(np.asarray(sample["focal"], np.float32))
        scene = net.apply(
            variables, images, poses, focal, method=PixelNeRFNet.encode
        )
        rng = np.random.default_rng(0)
        xyz = jnp.asarray(rng.normal(size=(1, 64, 3)).astype(np.float32) * 0.3)
        dirs = jnp.asarray(rng.normal(size=(1, 64, 3)).astype(np.float32))
        out = np.asarray(
            net.apply(
                variables,
                scene,
                xyz,
                viewdirs=dirs,
                coarse=True,
                method=PixelNeRFNet.query,
            )
        )
        rgb, sigma = out[..., :3], out[..., 3]
        ok = True
        print(f"rgb range [{rgb.min():.4f}, {rgb.max():.4f}]")
        print(f"sigma range [{sigma.min():.4f}, {sigma.max():.4f}]")
        if not np.isfinite(out).all():
            print("   ERROR: non-finite outputs!")
            ok = False
        if rgb.min() < -1e-6 or rgb.max() > 1 + 1e-6:
            print("   ERROR: rgb outside [0, 1]!")
            ok = False
        if sigma.min() < -1e-6:
            print("   ERROR: negative sigma!")
            ok = False
        if ok:
            print("   OK: outputs well-formed")
        print("=" * 70)
        return ok
