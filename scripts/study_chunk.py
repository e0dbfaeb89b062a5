"""Perf study: device ray-chunk size vs throughput (dense and proposal).

bench.py's BENCH_RAY_CHUNK only lowers the effective chunk — RenderPipeline's
``device_chunk`` (8192) caps it from above (pipeline.py:204) — so chunks above
8192 have never actually been measured.  Larger chunks amortize per-chunk
fixed costs (compaction gather/scatter, sampling sort, lax.map step overhead)
at the price of bigger live activations; this sweep measures the real curve
through the SAME scene/protocol as the published bench numbers.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/study_chunk.py
Knobs: STUDY_CHUNKS="8192,16384,32768,65536"  STUDY_MODE=proposal|rays|dense
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def main():
    from pixelnerf_tpu.config.args import enable_compilation_cache

    enable_compilation_cache()

    import jax

    log = bench.log
    log("study: backend", jax.default_backend())

    s = bench.setup_scene()

    rgb_dense, fg_frac = s.render_dense_reference()
    log(f"study: dense fg_frac {fg_frac:.3f}")
    assert fg_frac > 0.03, "empty scene; study meaningless"

    chunks = [
        int(c)
        for c in os.environ.get(
            "STUDY_CHUNKS", "8192,16384,32768,65536"
        ).split(",")
    ]
    mode = os.environ.get("STUDY_MODE", "proposal")

    if mode != "dense":
        s.pipeline.set_accel_mode(mode)

    results = []
    for chunk in chunks:
        s.chunk = chunk
        s.pipeline.device_chunk = chunk
        if mode == "dense":
            s.pipeline.accel = None
        else:
            # rebuild capacities for this chunk's windowing (the grid itself
            # is chunk-independent; build_accel caches the jitted builder)
            s.pipeline.build_accel(
                s.variables, s.scene, s.rays, ray_batch_size=chunk
            )
        t0 = time.perf_counter()
        rgb_p, _ = s.pipeline.render_simple(
            s.variables, s.scene, s.rays, s.rng, ray_batch_size=chunk
        )
        compile_s = time.perf_counter() - t0
        psnr = bench.psnr_vs(rgb_p, rgb_dense)
        rate, rates = bench.measure_steady(s, max_rounds=5)
        row = {
            "mode": mode,
            "chunk": chunk,
            "psnr_vs_dense": round(psnr, 1),
            "rays_per_sec": round(rate, 0),
            "compile_s": round(compile_s, 1),
        }
        results.append(row)
        log("study:", json.dumps(row))

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
