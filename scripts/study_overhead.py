"""Perf decomposition: where does the proposal render's NON-MLP time go?

Replaces the conditioned field MLP with a cheap analytic stub (same output
contract, ~zero FLOPs) inside the SAME pipeline/accel/protocol as bench.py,
then sweeps structural knobs under the stub.  The stub pass time is the
pipeline overhead floor (probe gathers + compaction + sampling/sort +
compositing + dispatch/fetch); the full-vs-stub delta is the true MLP share.

Run on TPU:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/study_overhead.py
"""

import dataclasses
import json
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

    log = bench.log
    log("study: backend", jax.default_backend())

    s = bench.setup_scene()
    base_cfg = s.renderer.base_cfg

    rgb_dense, fg_frac = s.render_dense_reference()
    assert fg_frac > 0.03

    s.pipeline.set_accel_mode("proposal")
    s.pipeline.build_accel(s.variables, s.scene, s.rays, ray_batch_size=s.chunk)
    assert s.pipeline.accel is not None

    def measure(tag):
        s.pipeline.render_simple(
            s.variables, s.scene, s.rays, s.rng, ray_batch_size=s.chunk
        )  # compile + warm
        rate, _ = bench.measure_steady(s, max_rounds=5)
        ms = 1e3 * s.rays.shape[0] / rate
        log(
            "study:",
            json.dumps({"variant": tag, "rays_per_sec": round(rate),
                        "ms_per_pass": round(ms, 1)}),
        )
        return ms

    results = {}
    # 1. control: full MLP at the production operating point
    results["full"] = measure("full (production)")

    # 2. stub field: same contract, ~zero FLOPs -> pipeline overhead floor
    def stub_closure(variables, scene):
        def field(points, viewdirs, coarse):
            r2 = jnp.sum(points * points, axis=-1)
            sigma = 60.0 * (r2 < 0.16).astype(jnp.float32)
            rgb = jnp.transpose(0.5 + 0.0 * points, (0, 2, 1))
            return jnp.concatenate([rgb, sigma[:, None, :]], axis=1)

        return field

    real_closure = s.pipeline._field_closure
    s.pipeline._field_closure = stub_closure
    s.pipeline._jitted = {}
    results["stub"] = measure("stub field (overhead floor)")

    # 3. structural slopes under the stub (isolate per-stage costs)
    def with_cfg(tag, **kw):
        s.renderer.base_cfg = dataclasses.replace(base_cfg, **kw)
        s.pipeline._jitted = {}
        s.pipeline._autoselect_capacity(s.rays, ray_batch_size=s.chunk)
        return measure(tag)

    # probe-gather slope: 2x probes -> delta = cost of 32 probes/ray
    results["stub_probe64"] = with_cfg("stub, 64 probes", accel_probe_samples=64)
    # sampling/sort slope: 2x proposal draws
    results["stub_prop32"] = with_cfg(
        "stub, 32 proposal draws", accel_proposal_samples=32
    )
    # compaction cost: capacity 1.0 short-circuits the gather/scatter wrapper
    results["stub_nocompact"] = with_cfg(
        "stub, no ray compaction", accel_capacity_rays=1.0
    )

    s.pipeline._field_closure = real_closure
    s.renderer.base_cfg = base_cfg

    ms_mlp = results["full"] - results["stub"]
    summary = {
        "ms_full": round(results["full"], 1),
        "ms_overhead_floor": round(results["stub"], 1),
        "ms_mlp_share": round(ms_mlp, 1),
        "ms_probes_32": round(results["stub_probe64"] - results["stub"], 1),
        "ms_sampling_16draws": round(
            results["stub_prop32"] - results["stub"], 1
        ),
        "ms_compaction": round(
            results["stub"] - results["stub_nocompact"], 1
        ),
    }
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
