"""Perf/quality study: proposal-mode operating points vs the dense render.

Builds the bench scene ONCE through bench.setup_scene() (same scaffold and
timing protocol as the published bench.py numbers), then sweeps proposal-mode
variants — probe-ladder size, proposal sample count, depth-centered draws,
pdf shape (grid-sigma vs binary mask, uniform mix) — reporting rays/s and
PSNR-vs-dense per variant.

Grid probes are lookups (~free); proposal samples are MLP evals — the core
hypothesis is that a sharper pdf lets fewer proposal samples hit the same
PSNR gate, cutting field evals per ray.

Run on TPU:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/study_proposal.py
Custom grid: STUDY_GRID="probe,prop,nfd,uniform;..." (uniform < 0 = mask pdf)
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench


# (probe_samples, proposal_samples, n_fine_depth, proposal_uniform)
# probe 0 = n_coarse ladder; uniform < 0 = strip grid sigma (binary-mask pdf)
DEFAULT_GRID = [
    (0, 40, 16, 0.15),    # current production point (275k rays/s headline)
    (128, 40, 16, 0.15),  # finer pdf, same evals — quality delta only
    (128, 32, 16, 0.15),
    (128, 24, 16, 0.15),
    (128, 16, 16, 0.15),
    (64, 24, 16, 0.15),   # is the finer ladder actually needed at low counts?
    (128, 24, 8, 0.15),   # sharper depth estimate -> fewer depth draws
    (128, 32, 8, 0.15),
    (128, 32, 8, -1.0),   # mask-pdf baseline at the same budget
]


def main():
    from pixelnerf_tpu.config.args import enable_compilation_cache

    enable_compilation_cache()

    import jax

    log = bench.log
    log("study: backend", jax.default_backend())

    s = bench.setup_scene()
    base_cfg = s.renderer.base_cfg

    rgb_dense, fg_frac = s.render_dense_reference()
    log(f"study: dense fg_frac {fg_frac:.3f}")
    assert fg_frac > 0.03, "empty scene; study meaningless"

    grid = DEFAULT_GRID
    if os.environ.get("STUDY_GRID"):
        # probe,prop,nfd,uniform[,alpha_cap] — cap defaults to the config's
        grid = [
            tuple(float(v) for v in p.split(","))
            for p in os.environ["STUDY_GRID"].split(";")
        ]

    s.pipeline.set_accel_mode("proposal")
    s.pipeline.build_accel(s.variables, s.scene, s.rays, ray_batch_size=s.chunk)
    sig_accel = s.pipeline.accel
    if sig_accel is None:
        log("study: accel disabled on this scene; nothing to sweep")
        return
    mask_accel = dataclasses.replace(sig_accel, sig=None, thresh=None)

    results = []
    for row_vals in grid:
        probe, nprop, nfd, uni = row_vals[:4]
        cap = float(row_vals[4]) if len(row_vals) > 4 else None
        probe, nprop, nfd = int(probe), int(nprop), int(nfd)
        s.pipeline.accel = mask_accel if uni < 0 else sig_accel
        s.renderer.base_cfg = dataclasses.replace(
            base_cfg,
            accel_mode="proposal",
            accel_probe_samples=probe,
            accel_proposal_samples=nprop,
            accel_depth_samples=nfd,
            accel_proposal_uniform=max(uni, 0.0),
            **(
                {}
                if cap is None
                else {"accel_proposal_alpha_cap": cap}
            ),
        )
        # capacities re-sized for the new probe ladder
        s.pipeline._autoselect_capacity(s.rays, ray_batch_size=s.chunk)
        if s.pipeline.accel is None:
            log(f"study: variant {probe}/{nprop} -> accel disabled, skipping")
            continue
        t0 = time.perf_counter()
        rgb_p, _ = s.pipeline.render_simple(
            s.variables, s.scene, s.rays, s.rng, ray_batch_size=s.chunk
        )
        compile_s = time.perf_counter() - t0
        psnr = bench.psnr_vs(rgb_p, rgb_dense)
        rate, _ = bench.measure_steady(s, max_rounds=5)
        row = {
            "probe": probe, "proposal_samples": nprop, "n_fine_depth": nfd,
            "pdf": "mask" if uni < 0 else f"sigma u={uni:g}",
            "alpha_cap": cap if cap is not None else base_cfg.accel_proposal_alpha_cap,
            "evals_per_ray": nprop + nfd, "psnr_vs_dense": round(psnr, 1),
            "rays_per_sec": round(rate, 0), "compile_s": round(compile_s, 1),
        }
        results.append(row)
        log("study:", json.dumps(row))

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
