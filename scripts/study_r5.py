"""Round-5 TPU study driver: all measurement phases in ONE process (one
tunnel attach — the relay wedges at process attach under contention, so
batching is the reliable protocol).

Phases (R5_PHASES env, comma-separated; default "headline"):

  headline  — capacity-quantizer + polish A/B on the bench sphere:
              r3-control recipe (same-day attribution), cosine default,
              cosine+polish variants.  The round-4 regression levers.
  overflow  — stratified-liveness audit of the settled capacity: max window
              live fraction over many render keys vs the chosen cap_rays
              (the tightened quantizer must not push chunks onto the dense
              lax.cond fallback).
  hifi      — high-fidelity field: long cosine train to >= 25 dB vs traced
              GT, then the full gate ladder + rates (VERDICT r4 #3).
  margin    — multiscale operating-point sweep for >= 3 dB gate margin at
              >= 500k rays/s (VERDICT r4 #5).
  scenes    — adversarial families with the fixed per-step mask supervision
              (bench.py round-5 fix) + fg-frac sampling (VERDICT r4 #2).

Each phase appends JSON lines to STUDY_OUT (default /tmp/r5_study.jsonl).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/study_r5.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

OUT = os.environ.get("STUDY_OUT", "/tmp/r5_study.jsonl")


def reset_env():
    """Clear per-case bench knobs phases may have left behind (run_case does
    this itself; the direct-setup phases must too)."""
    from scripts.study_scenes import _KNOBS

    for k in _KNOBS + ("BENCH_SCENE", "BENCH_NS", "BENCH_HW",
                       "BENCH_WHITE_BKGD", "BENCH_CONF"):
        os.environ.pop(k, None)


def emit(row: dict):
    row = dict(row)
    line = json.dumps(row)
    print(line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


def phase_headline():
    """A/B the quantizer + polish levers on the published bench scene."""
    from scripts.study_scenes import run_case

    variants = [
        # same-day legacy control for attribution (r3 recipe as a set)
        ("const-legacy", {"BENCH_TRAIN_SCHED": "const"}),
        # round-4 default under the new quantizer
        ("cosine-default", {}),
        # polish ladder: carve stray liveness at the tail
        ("cosine-polish100", {"BENCH_TRAIN_POLISH": "100"}),
        ("cosine-polish200", {"BENCH_TRAIN_POLISH": "200"}),
    ]
    for name, env in variants:
        t0 = time.perf_counter()
        row = run_case("sphere", "sn64", 1, env=env)
        row.update(variant=name, phase="headline",
                   case_wall_s=round(time.perf_counter() - t0, 1))
        emit(row)


def phase_overflow(keys: int = 16):
    """Audit: with the settled capacities, how close do stratified render
    draws come to overflowing the ray-compaction buffer?  Builds the bench
    scene + grid once, then measures max window live fraction over ``keys``
    independent stratified coarse draws (the render's actual z sampling)."""
    import jax
    import jax.numpy as jnp

    import bench
    from pixelnerf_tpu.render.accel import occupancy_lookup

    reset_env()
    s = bench.setup_scene()
    rgb_dense, fg = s.render_dense_reference()
    s.pipeline.set_accel_mode("proposal")
    s.pipeline.build_accel(s.variables, s.scene, s.rays, ray_batch_size=s.chunk)
    if s.pipeline.accel is None:
        emit({"phase": "overflow", "note": "pruning disabled at build"})
        return
    label, _ = s.pipeline.gate_accel_mode(
        s.variables, s.scene, s.rays, s.rng, rgb_dense,
        ray_batch_size=s.chunk, pack="u8",
    )
    cfg = s.pipeline.renderer.base_cfg
    cap = cfg.accel_capacity_rays
    kc = cfg.accel_probe_samples or cfg.n_coarse
    rays_np = np.asarray(s.rays)
    N = rays_np.shape[0]
    chunk = s.pipeline.accel_chunk or s.pipeline.device_chunk
    look = jax.jit(lambda p: occupancy_lookup(s.pipeline.accel, p))
    rng = np.random.default_rng(1234)
    worst = 0.0
    base = np.arange(kc, dtype=np.float32) / kc
    for _ in range(keys):
        t = base[None] + rng.random((N, kc), np.float32) / kc
        z = rays_np[:, 6:7] + t * (rays_np[:, 7:8] - rays_np[:, 6:7])
        pts = rays_np[:, None, :3] + z[..., None] * rays_np[:, None, 3:6]
        live = np.asarray(look(jnp.asarray(pts))).any(axis=-1)
        n_win = -(-N // chunk)
        pad = np.concatenate([live, np.tile(live[-1:], n_win * chunk - N)])
        worst = max(worst, float(pad.reshape(n_win, chunk).mean(1).max()))
    emit({
        "phase": "overflow", "mode": label, "cap_rays": cap,
        "probe_kc": kc, "chunk": chunk, "keys": keys,
        "worst_window_live": round(worst, 4),
        "headroom": round(cap - worst, 4),
        "would_overflow": bool(worst > cap),
    })


def phase_hifi():
    """Long-trained (sharp) field: does the ladder hold up at >= 25 dB vs
    analytic GT, and where does the gate settle?"""
    from scripts.study_scenes import run_case

    for steps in (4000, 8000):
        env = {"BENCH_TRAIN_STEPS": str(steps)}
        t0 = time.perf_counter()
        row = run_case("sphere", "sn64", 1, env=env)
        row.update(variant=f"cosine-{steps}", phase="hifi",
                   case_wall_s=round(time.perf_counter() - t0, 1))
        emit(row)


def phase_margin():
    """Multiscale gate-margin sweep: probe the proposal operating points
    around the round-4 631.9k point for >= 33 dB at >= 500k rays/s."""
    import dataclasses

    import bench

    reset_env()
    os.environ["BENCH_CONF"] = "sn64_multiscale"
    s = bench.setup_scene()
    rgb_dense, fg = s.render_dense_reference()
    dense_rate, _ = bench.measure_steady(s)
    emit({"phase": "margin", "variant": "dense", "fg": round(fg, 3),
          "rays_per_sec": round(dense_rate / s.n_chips, 1)})
    s.pipeline.set_accel_mode("proposal")
    s.pipeline.build_accel(s.variables, s.scene, s.rays, ray_batch_size=s.chunk)
    if s.pipeline.accel is None:
        emit({"phase": "margin", "note": "pruning disabled at build"})
        return
    base_cfg = s.pipeline.renderer.base_cfg
    # (proposal draws, probe ladder, pdf alpha cap)
    grid = [
        (base_cfg.accel_proposal_samples, base_cfg.accel_probe_samples,
         base_cfg.accel_proposal_alpha_cap),
        (24, 32, 0.15),
        (32, 32, 0.15),
        (24, 32, 0.25),
        (32, 32, 0.25),
        (24, 64, 0.15),
    ]
    seen = set()
    for prop, probe, cap in grid:
        key = (prop, probe, cap)
        if key in seen:
            continue
        seen.add(key)
        s.pipeline.renderer.base_cfg = dataclasses.replace(
            base_cfg,
            accel_proposal_samples=prop,
            accel_probe_samples=probe,
            accel_proposal_alpha_cap=cap,
        )
        s.pipeline._autoselect_capacity(
            np.asarray(s.rays), ray_batch_size=s.chunk
        )
        if s.pipeline.accel is None:
            emit({"phase": "margin", "variant": str(key),
                  "note": "capacity disabled pruning"})
            continue
        rgb_p, _ = s.pipeline.render_simple(
            s.variables, s.scene, s.rays, s.rng, ray_batch_size=s.chunk,
            pack="u8",
        )
        psnr = bench.psnr_vs(rgb_p, rgb_dense)
        rate, rates = bench.measure_steady(s)
        emit({
            "phase": "margin", "variant": f"prop{prop}_probe{probe}_cap{cap}",
            "proposal_samples": prop, "probe_samples": probe,
            "alpha_cap": cap,
            "cap_rays": s.pipeline.renderer.base_cfg.accel_capacity_rays,
            "psnr_vs_dense": round(psnr, 1),
            "rays_per_sec": round(rate / s.n_chips, 1),
            "margin_db": round(psnr - 30.0, 1),
        })


def phase_scenes():
    """Adversarial-family rescue probes with per-step masks + fg sampling."""
    from scripts.study_scenes import run_case

    recipes = {
        # per-step mask alpha at the cosine default
        "cos-alpha": {"BENCH_TRAIN_ALPHA": "1.0", "BENCH_TRAIN_COARSE": "64"},
        # + mask-guided foreground sampling
        "cos-alpha-fg": {"BENCH_TRAIN_ALPHA": "1.0", "BENCH_TRAIN_FG": "0.5",
                         "BENCH_TRAIN_COARSE": "64"},
        # const control with the fixed masks (what r3/r4 _HARD wanted to be)
        "const-alpha-fg": {"BENCH_TRAIN_ALPHA": "1.0", "BENCH_TRAIN_FG": "0.5",
                           "BENCH_TRAIN_COARSE": "64",
                           "BENCH_TRAIN_SCHED": "const",
                           "BENCH_TRAIN_LR": "1e-4",
                           "BENCH_TRAIN_STEPS": "2000"},
    }
    scenes = os.environ.get("R5_SCENES", "multi3,thin").split(",")
    wanted = os.environ.get("R5_RECIPES")
    if wanted:
        recipes = {k: v for k, v in recipes.items() if k in wanted.split(",")}
    for scene in scenes:
        for name, env in recipes.items():
            t0 = time.perf_counter()
            row = run_case(scene, "sn64", 1, env=env)
            row.update(variant=name, phase="scenes",
                       case_wall_s=round(time.perf_counter() - t0, 1))
            emit(row)


PHASES = {
    "headline": phase_headline,
    "overflow": phase_overflow,
    "hifi": phase_hifi,
    "margin": phase_margin,
    "scenes": phase_scenes,
}


def main():
    from pixelnerf_tpu.config.args import enable_compilation_cache

    enable_compilation_cache()
    names = os.environ.get("R5_PHASES", "headline").split(",")
    for name in names:
        name = name.strip()
        if not name:
            continue
        print(f"=== phase {name} ===", file=sys.stderr, flush=True)
        t0 = time.perf_counter()
        PHASES[name]()
        print(
            f"=== phase {name} done in {time.perf_counter() - t0:.0f}s ===",
            file=sys.stderr, flush=True,
        )


if __name__ == "__main__":
    main()
