"""Benchmark: gen_video ray throughput on the flagship sn64 pixel-NeRF model.

Measures steady-state rays/sec through the full conditioned render path
(pixel-aligned feature indexing + coarse 64 / fine 32+16 sampling + compositing
— the reference's default operating point, conf/default.conf:50-55) on one chip,
on a synthetic 64x64 sphere scene with one source view.

The model is first trained briefly on the scene (BENCH_TRAIN_STEPS, default
800, warmup+cosine lr — see quick_train) so its density field is object-like
— mostly empty space, exactly the regime every real eval render runs in.  The occupancy-grid sample pruning
(render/accel.py) then skips verified-empty samples, like gen_video does by
default; a dense-vs-pruned PSNR gate (>= 30 dB) disables pruning if the grid
misrepresents the field.  The reference composites every sample of every ray
(/root/reference/src/render/nerf.py:163-249).

Timing: rounds of 3 async video passes (enqueue all, drain — the video-writer
consumption pattern) after a full warmup round; rounds repeat until the rate
is steady (last two within 4%) up to 6 rounds, and the MEDIAN round rate is
reported, so first-dispatch jitter and background load don't land in the
number.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference publishes no throughput numbers (BASELINE.md) — the
denominator is a 50,000 rays/sec figure for the reference torch path on one
datacenter GPU, backed by the measured + FLOP-derived estimate in
docs/BASELINE_MEASUREMENT.md (scripts/measure_baseline.py).

Env knobs: BENCH_CONF, BENCH_PALLAS=0, BENCH_BF16=1, BENCH_RAY_CHUNK,
BENCH_ACCEL=0 (dense timing), BENCH_TRAIN_STEPS=0 (random-init model),
BENCH_SCENE/BENCH_NS (scene family, source views), BENCH_HW="76x100"
(non-square frame), BENCH_WHITE_BKGD (compositing override),
BENCH_SIGMA_ACT (model density activation: relu | softplus |
softplus_floor), BENCH_TRAIN_FG / BENCH_TRAIN_FG_END (mask-guided
foreground ray fraction, optionally ramped per step as a curriculum).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

REFERENCE_RAYS_PER_SEC = 50_000.0

# The round-3 driver-captured quick-train control (BENCH_r03 tail): 4000
# steps x 1024 rays in 95.9 s wall to final loss 0.1586.  quick_train prints
# its progress rate in these units so recipe changes stay comparable.
_R3_CONTROL_RAYS = 4000 * 1024
_R3_CONTROL_WALL_S = 95.9
_R3_CONTROL_LOSS = 0.1586


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def quick_train(net, variables, sample, focal, use_viewdirs, steps: int,
                white_bkgd: bool = True, z_near: float = 0.8,
                z_far: float = 1.8):
    """Overfit the scene for a few hundred steps so sigma is object-like.

    ``net`` should be built with ``diff_mode=True``: training rides the fused
    Pallas field kernel's custom-VJP backward on TPU (ops/resnetfc_vjp.py)
    and the XLA MLP elsewhere; the trained params drop into the eval net —
    identical parameter structure, different query lowering."""
    import jax
    import jax.numpy as jnp
    import optax

    from pixelnerf_tpu.models.losses import l2_loss
    from pixelnerf_tpu.render.renderer import RenderConfig
    from pixelnerf_tpu.train.trainer import (
        TrainState,
        make_step_fns,
        prepare_ray_batch,
    )

    # positive density-head bias at init: relu(sigma) has no gradient below
    # zero, and the first background-dominated steps otherwise drive the
    # whole field negative before the object is ever supervised (dead-relu
    # collapse to the all-white solution — measured, as was the "colored
    # fog" degenerate solution that large sigma noise converges to)
    import flax.serialization

    params = flax.serialization.to_state_dict(variables["params"])
    for head in ("mlp_coarse", "mlp_fine"):
        if head in params and "lin_out" in params[head]:
            b = np.asarray(params[head]["lin_out"]["bias"]).copy()
            b[3] += 1.0
            params[head]["lin_out"]["bias"] = b
    params = flax.serialization.from_state_dict(variables["params"], params)

    # Recipe default (round 4): 800 steps, lr 2e-4 under linear warmup (100
    # steps) + cosine decay to 10% of peak.  Swept on TPU against the
    # constant-lr round-2/3 control (4000 steps at the reference's 1e-4 —
    # the only CONSTANT rate that escapes the all-white plateau; const
    # 1e-3/3e-4 dead-relu to fg 0.000, and the warmup is what lets the 2e-4
    # peak survive the background-dominated first steps): the cosine recipe
    # reaches loss 0.0027 (vs the control's 0.1586) in 37 s wall vs 96 s —
    # 2.58x the control's effective training rate at BETTER final loss, with
    # an equally object-like field (fg 0.291 vs 0.300) that passes the
    # proposal quality gate at 33.0 dB.  Sweep rows: /tmp-archived in
    # docs/PERFORMANCE.md "quick-train recipe" section; rerun via
    # scripts/study_train_recipe.py.  BENCH_TRAIN_SCHED=const restores the
    # control recipe.
    # BENCH_TRAIN_SCHED=const restores the r2/3 CONTROL DEFAULTS as a set —
    # lr 1e-4 (under a constant schedule 2e-4 dead-relus: measured fg 0.000
    # at const 3e-4) and, in setup_scene, 4000 steps — so the published
    # control reproduces from the one knob; explicit BENCH_TRAIN_LR/STEPS
    # still override.
    sched = os.environ.get("BENCH_TRAIN_SCHED", "cosine")
    lr_peak = float(
        os.environ.get("BENCH_TRAIN_LR", "2e-4" if sched == "cosine" else "1e-4")
    )
    lr = lr_peak
    warmup = 0
    if sched == "cosine":
        warmup = int(os.environ.get("BENCH_TRAIN_WARMUP", 100))
        lr = optax.warmup_cosine_decay_schedule(
            0.0, lr_peak, warmup, steps, end_value=0.1 * lr_peak
        )
    opt = optax.adam(lr)
    state = TrainState(
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        # jitted: eager optax init dispatches one zeros() per param leaf,
        # each paying the remote-TPU tunnel round trip
        opt_state=jax.jit(opt.init)(params),
        step=jnp.zeros((), jnp.int32),
    )
    # light sampling is enough to shape the density field.  white_bkgd must
    # match the scene, and sigma NOISE is essential: without it the first
    # background-dominated steps drive pre-relu sigma negative everywhere and
    # the density head dead-relus (loss freezes at the all-white plateau —
    # measured; the reference survives only because it trains at lr 1e-4).
    # The noise must then be annealed off GRADUALLY: cut to zero abruptly, the
    # slightly-sub-zero pre-relu surface sigma that rendered through the noise
    # dies the same relu death (also measured); a linear ramp keeps pushing
    # it up as the noise shrinks.
    # BENCH_TRAIN_COARSE: training-time coarse samples/ray.  32 matches the
    # round-2 sphere recipe (z span 1.0 -> 0.031 spacing); wide-span scenes
    # (adversarial families, z 0.45-2.4) need ~2x the samples to keep the
    # same spacing or the field under-resolves (measured: sphere at the wide
    # span drops 35 dB -> 10.6 dB at 32 samples).
    cfg = RenderConfig(
        n_coarse=int(os.environ.get("BENCH_TRAIN_COARSE", 32)),
        n_fine=8, n_fine_depth=8, white_bkgd=white_bkgd,
        noise_std=1.0,
    )
    # BENCH_TRAIN_ALPHA: weight of the mask-supervised pixel-alpha loss
    # (trainer.make_step_fns lambda_alpha_mask).  The RGB loss alone cannot
    # escape the all-transparent minimum on small/scattered-foreground
    # white-background scenes (multi3/offcenter collapse to an all-white
    # render under EVERY swept knob: lr, steps, noise anneal, bbox warmup,
    # 2x coarse samples); supervising accumulated alpha with the dataset
    # mask pushes sigma up exactly where the objects are.
    lambda_alpha_mask = float(os.environ.get("BENCH_TRAIN_ALPHA", "0"))
    # BENCH_TRAIN_FG: fraction of each batch's rays drawn from mask-positive
    # pixels (prepare_ray_batch fg_frac) — the scattered-foreground rescue:
    # bbox warmup still drowns fragmented objects in background rays, mask-
    # guided sampling cannot
    fg_frac = float(os.environ.get("BENCH_TRAIN_FG", "0"))
    # BENCH_TRAIN_FG_END: linear per-step ramp of the fg fraction from
    # BENCH_TRAIN_FG to this value — the balanced curriculum for scenes
    # whose supervision mix has no static operating point between white-
    # collapse (background-dominated) and fog-collapse (foreground-forced):
    # early foreground-heavy batches grow density at the object, the ramp
    # hands off to uniform rgb so the background still carves
    # (docs/SCENES.md "offcenter").  Default: no ramp.
    fg_end = float(os.environ.get("BENCH_TRAIN_FG_END", str(fg_frac)))
    train_step, _ = make_step_fns(
        net, opt, cfg, 1.0, 1.0, l2_loss, l2_loss, use_viewdirs,
        # the fused kernel's custom VJP recomputes in VMEM — outer remat
        # would only add a redundant forward replay (docs/PERFORMANCE.md)
        remat=not net.field_backward_in_kernel(1),
        lambda_alpha_mask=lambda_alpha_mask,
    )
    data = {
        "images": sample["images"][None],
        "poses": sample["poses"][None],
        "focal": np.asarray([focal], np.float32),
    }
    if lambda_alpha_mask > 0 or fg_frac > 0 or fg_end > 0:
        data["masks"] = sample["masks"][None]
    # pre-generate every ray batch on the host, then run ALL steps in one
    # lax.scan dispatch — per-step dispatches pay the device-tunnel round
    # trip ~steps times (measured ~0.6 s/step through the tunnel).  Uniform
    # pixel sampling: with sigma noise it reaches loss ~0.12 by 1000 steps
    # (bbox-alternated batches measured DIVERGENT at this lr)
    host_rng = np.random.default_rng(int(os.environ.get("BENCH_TRAIN_SEED", 7)))
    # BENCH_TRAIN_BBOX_FRAC: leading fraction of steps sampled inside the
    # foreground bbox (the reference's bbox-guided warmup, train.py:251-256 /
    # no_bbox_step) — small-foreground scenes (multi-object, off-center)
    # otherwise see so few object rays that training collapses to the
    # all-white solution.  0 = uniform only (the sphere-tuned round-2 recipe).
    bbox_frac = float(os.environ.get("BENCH_TRAIN_BBOX_FRAC", "0"))
    bbox_data = dict(data, bbox=sample["bbox"][None]) if bbox_frac else data
    # interleaved, not a block: background rays must keep carving while bbox
    # batches feed the object.  When the knob is OFF, draw NOTHING from
    # host_rng — consuming `steps` draws here shifts the batch stream of the
    # default recipe and silently retrains the published control field
    # (measured: occupancy 0.071 -> 0.158, headline 960k -> 688k rays/s)
    use_bbox = (
        host_rng.random(steps) < bbox_frac
        if bbox_frac > 0
        else np.zeros(steps, bool)
    )
    t_prep0 = time.perf_counter()
    R = int(os.environ.get("BENCH_TRAIN_R", 1024))
    # identical stream when no ramp is requested (fg_sched constant ==
    # fg_frac), so the published control recipes are untouched
    fg_sched = np.linspace(fg_frac, fg_end, steps) if steps > 1 else (
        np.full(max(steps, 1), fg_frac)
    )
    batches = [
        prepare_ray_batch(
            bbox_data if use_bbox[i] else data, 1, R, z_near, z_far,
            bool(use_bbox[i]), host_rng, fg_frac=float(fg_sched[i]),
        )
        for i in range(steps)
    ]
    host_prep_s = time.perf_counter() - t_prep0
    t_up0 = time.perf_counter()
    # per-STEP keys are scanned; everything else is closed over once.
    # mask_gt is per-step (it indexes the same sampled pixels as rays/rgb_gt
    # — feeding step 0's mask to every step supervises alpha at the WRONG
    # pixels, which actively fights the mask loss it was meant to provide)
    per_keys = [k for k in ("rays", "rgb_gt", "mask_gt") if k in batches[0]]
    per_T = {
        k: jnp.asarray(np.stack([b[k] for b in batches])) for k in per_keys
    }
    fixed = {
        k: jnp.asarray(batches[0][k])
        for k in batches[0]
        if k not in per_keys
    }
    jax.block_until_ready(per_T)
    upload_s = time.perf_counter() - t_up0

    # sigma noise off by default (the positive bias init replaces it; the
    # noise_scale ramp stays a traced argument so schedules need no
    # recompile).  BENCH_TRAIN_NOISE > 0 turns the linear anneal back on —
    # multi-object / fragmented scenes need the noise to keep gradient
    # flowing through sub-threshold density while the background carves.
    noise0 = float(os.environ.get("BENCH_TRAIN_NOISE", "0"))
    if noise0 > 0:
        ramp_end = int(0.6 * steps)
        noise_T = noise0 * jnp.clip(
            1.0 - jnp.arange(steps, dtype=jnp.float32) / max(ramp_end, 1),
            0.0,
            1.0,
        )
    else:
        noise_T = jnp.zeros((steps,), jnp.float32)

    @jax.jit
    def run(state, per_T, noise_T, key):
        def body(carry, xs):
            st, k = carry
            k, sk = jax.random.split(k)
            per, ns = xs
            st, ld = train_step(
                st, dict(fixed, **per), sk, noise_scale=ns
            )
            return (st, k), ld["t"]

        (state, _), losses = jax.lax.scan(
            body, (state, key), (per_T, noise_T)
        )
        return state, losses

    # segment the scan: a single >~1000-step dispatch runs long enough to
    # trip the TPU worker watchdog through the tunnel (measured crash at
    # 4000); EQUAL-length segments reuse ONE compiled program for every
    # segment — a different-length tail would pay a whole second trace+
    # compile (~14 s), and that one would land inside the steady window and
    # corrupt the MFU/effective-rate attribution.  At least TWO segments
    # whenever the step count allows, so the steady-segment MFU stays
    # separable from the first segment's trace+compile; prefer the smallest
    # segment count >= the minimum that divides steps evenly (800 -> 2x400,
    # 2500 -> 5x500, 801 -> 3x267), falling back to a ceil split (+ tail
    # recompile, logged) only for step counts with no divisor in range.
    min_segs = max(-(-steps // 1000), 2 if steps >= 100 else 1)
    n_segs = next(
        (n for n in range(min_segs, min(min_segs + 4, steps + 1))
         if steps % n == 0),
        min_segs,
    )
    seg = -(-steps // n_segs)
    if steps % n_segs:
        log(
            f"bench: quick-train steps {steps} not divisible into {n_segs} "
            f"equal segments; the shorter tail recompiles inside the steady "
            f"window (MFU/effective-rate will read low)"
        )
    t0 = time.perf_counter()
    parts = []
    start = 0
    compile_s = None
    while start < steps:
        sl = slice(start, start + min(seg, steps - start))
        state, ls = run(
            state, {k: v[sl] for k, v in per_T.items()}, noise_T[sl],
            jax.random.fold_in(jax.random.PRNGKey(2), start),
        )
        parts.append(np.asarray(ls))
        if compile_s is None:
            # first segment's wall = trace+compile + one segment of steps;
            # the attribution line below separates it from the steady rest
            compile_s = time.perf_counter() - t0
        start = sl.stop
    losses = np.concatenate(parts)
    train_s = time.perf_counter() - t0

    # Optional density-carve polish (BENCH_TRAIN_POLISH steps): a short
    # CONSTANT low-lr anneal with mask-supervised alpha at the tail.  The
    # cosine recipe's field renders well but leaves stray near-threshold
    # density around the object (worst-window ray liveness 0.499 vs the
    # const control's 0.422 — BENCH_r04), which inflates the compaction
    # buffers the eval path pays for every ray.  Alpha at the full cosine
    # peak over-drives (docs/PERFORMANCE.md); at the tail, with the RGB loss
    # already converged, it only pushes accumulated alpha toward the mask —
    # i.e. it deletes density exactly where the mask says empty.
    # Default ON for the cosine recipe (round 5): measured same-day ladder
    # cosine 907.2k rays/s (worst-window liveness 0.497 -> cap 0.52) ->
    # polish100 980.7k (cap 0.4375) -> polish200 1,030.3k (cap 0.406), vs
    # the const-legacy control's 1,001.0k — the polish recovers MORE than
    # the round-4 regression at ~7s steady (+ one cached compile) while the
    # 800-step train line stays intact (4.2x the r3 control, warm).  The
    # const control recipe stays unpolished — it is the frozen r2/r3
    # comparison point.
    polish = int(
        os.environ.get(
            "BENCH_TRAIN_POLISH", "200" if sched == "cosine" else "0"
        )
    )
    polish_s = 0.0
    if polish > 0:
        t_p0 = time.perf_counter()
        lr_p = float(os.environ.get("BENCH_TRAIN_POLISH_LR", "2e-5"))
        alpha_p = float(os.environ.get("BENCH_TRAIN_POLISH_ALPHA", "0.3"))
        pdata = (
            data if "masks" in data
            else dict(data, masks=sample["masks"][None])
        )
        opt_p = optax.adam(lr_p)
        step_p, _ = make_step_fns(
            net, opt_p, cfg, 1.0, 1.0, l2_loss, l2_loss, use_viewdirs,
            remat=not net.field_backward_in_kernel(1),
            lambda_alpha_mask=alpha_p,
        )
        pbatches = [
            prepare_ray_batch(pdata, 1, R, z_near, z_far, False, host_rng)
            for _ in range(polish)
        ]
        pkeys = [k for k in ("rays", "rgb_gt", "mask_gt") if k in pbatches[0]]
        pper = {
            k: jnp.asarray(np.stack([b[k] for b in pbatches])) for k in pkeys
        }
        pfixed = {
            k: jnp.asarray(pbatches[0][k])
            for k in pbatches[0]
            if k not in pkeys
        }
        pstate = TrainState(
            params=state.params,
            batch_stats=state.batch_stats,
            opt_state=jax.jit(opt_p.init)(state.params),
            step=jnp.zeros((), jnp.int32),
        )

        @jax.jit
        def run_polish(st0, per_T, key):
            def body(carry, xs):
                st, k = carry
                k, sk = jax.random.split(k)
                st, ld = step_p(st, dict(pfixed, **xs), sk)
                return (st, k), ld["t"]

            (st0, _), ls = jax.lax.scan(body, (st0, key), per_T)
            return st0, ls

        pstate, pls = run_polish(pstate, pper, jax.random.PRNGKey(5))
        pls = np.asarray(pls)
        state = state.replace(
            params=pstate.params, batch_stats=pstate.batch_stats
        )
        polish_s = time.perf_counter() - t_p0
        log(
            f"bench: polish {polish} steps (const lr {lr_p:g}, mask-alpha "
            f"{alpha_p:g}) in {polish_s:.1f}s incl. compile, loss "
            f"{pls[0]:.4f} -> {float(np.mean(pls[-10:])):.4f}"
        )
    # model-math MFU over the STEADY segments (3x-fwd field math; same
    # accounting as bench_train — compile excluded, recompute not counted).
    # Dims come from the param tree (flax setup fields aren't readable
    # outside apply): lin_in (d_in, H), lin_z_k (d_latent, H), blocks_k 2x
    # (H, H), lin_out (H, d_out).
    pm = flax.serialization.to_state_dict(state.params).get("mlp_coarse", {})
    H_, d_out_ = np.shape(pm["lin_out"]["kernel"]) if "lin_out" in pm else (1, 4)
    nb_ = sum(1 for k in pm if k.startswith("blocks_"))
    nz_ = sum(1 for k in pm if k.startswith("lin_z_"))
    d_in_ = np.shape(pm["lin_in"]["kernel"])[0] if "lin_in" in pm else 0
    d_lat_ = np.shape(pm["lin_z_0"]["kernel"])[0] if nz_ else 0
    mac = d_in_ * H_ + nz_ * d_lat_ * H_ + nb_ * 2 * H_ * H_ + H_ * d_out_
    union = cfg.n_coarse + cfg.n_fine + cfg.n_fine_depth
    flops_step = 3 * 2 * mac * R * (cfg.n_coarse + union)
    steady_s = train_s - compile_s
    steady_steps = steps - seg
    peak = float(os.environ.get("BENCH_PEAK_TFLOPS", 197)) * 1e12
    if steady_steps > 0 and steady_s > 0.5:
        mfu = flops_step * steady_steps / steady_s / peak
    else:  # single-segment run: compile not separable, report inclusive
        mfu = flops_step * steps / max(train_s, 1e-9) / peak
    loss_final = float(np.mean(losses[-10:]))
    log(
        f"bench: quick-train {steps} steps in {train_s:.1f}s "
        f"(host batch prep {host_prep_s:.1f}s, H2D upload {upload_s:.1f}s, "
        f"first segment incl. compile {compile_s:.1f}s, steady segments "
        f"{steady_s:.1f}s = {mfu * 100:.0f}% MFU), loss {losses[0]:.4f} -> "
        f"{loss_final:.4f}"
    )
    # effective training rate in ROUND-3-CONTROL units: the r3 bench trained
    # 4000x1024 rays in 95.9 s to final loss 0.1586 (BENCH_r03 tail).  A
    # recipe that reaches the same (or better) loss in less wall delivers the
    # same field faster — control-rays / wall is the honest progress rate
    # (raw rays/s would reward padding steps that add no convergence).
    wall_s = host_prep_s + upload_s + train_s
    if loss_final <= _R3_CONTROL_LOSS + 5e-4:
        eff = _R3_CONTROL_RAYS / wall_s
        ctrl = _R3_CONTROL_RAYS / _R3_CONTROL_WALL_S
        # the wall multiplier folds in the first segment's trace+compile,
        # which depends on compile-cache warmth (same recipe: 2.58x cold vs
        # 3.60x warm) — print a steady-only rate alongside so cold and
        # warm-cache runs normalize against each other
        line = (
            f"bench: quick-train effective {eff:,.0f} control-rays/s over "
            f"{wall_s:.1f}s wall = {eff / ctrl:.2f}x "
            f"the r3 control recipe, at matched final loss "
            f"({loss_final:.4f} <= {_R3_CONTROL_LOSS})"
        )
        if steady_steps > 0 and steady_s > 0:
            seg0_steady = seg * (steady_s / steady_steps)
            steady_eff = _R3_CONTROL_RAYS / (
                host_prep_s + upload_s + steady_s + seg0_steady
            )
            line += (
                f"; compile-excluded {steady_eff:,.0f} = "
                f"{steady_eff / ctrl:.2f}x "
                f"(first segment incl. compile {compile_s:.1f}s)"
            )
        log(line)
    else:
        log(
            f"bench: quick-train final loss {loss_final:.4f} above the r3 "
            f"control {_R3_CONTROL_LOSS}; no effective-rate claim"
        )
    quick_train.last_info = {
        "steps": steps, "R": R, "train_s": train_s, "steady_s": steady_s,
        "loss_final": loss_final, "mfu": mfu,
        "losses": losses,
        # the resolved recipe that produced the trained field, so the bench
        # JSON is self-describing (the default changed const-4000 -> cosine-
        # 800 in round 4 and r03-vs-r04 comparisons needed env context)
        "recipe": {
            "sched": sched, "steps": steps, "lr_peak": lr_peak,
            "warmup": warmup, "rays_per_step": R,
            "alpha": lambda_alpha_mask, "bbox_frac": bbox_frac,
            "fg_frac": fg_frac, "noise": noise0, "coarse": cfg.n_coarse,
            "polish": polish,
            "loss_final": round(loss_final, 5),
        },
    }
    return {"params": state.params, "batch_stats": state.batch_stats}


class BenchScene:
    """Everything the timing protocol needs, built once by :func:`setup_scene`
    and shared by bench.py and the scripts/study_proposal.py sweeps (one
    scaffold — the studies must measure through the SAME protocol the
    published numbers use)."""

    def __init__(self, **kw):
        self.__dict__.update(kw)

    def render_dense_reference(self):
        """Dense render of the video rays + foreground-fraction sanity check.
        Returns (rgb_dense (N, 3) numpy, fg_frac)."""
        rgb_dense, _ = self.pipeline.render_simple(
            self.variables, self.scene, self.rays, self.rng,
            ray_batch_size=self.chunk, pack="u8",
        )
        rgb_dense = np.asarray(rgb_dense)
        bg = 1.0 if self.white_bkgd else 0.0
        fg_frac = float(np.mean(np.abs(rgb_dense - bg).max(axis=-1) > 0.08))
        return rgb_dense, fg_frac


def setup_scene():
    """Build the bench scene: conf, net, synthetic sphere data, quick-trained
    variables, encoded scene, pipeline, video-pass rays.

    Env knobs: BENCH_CONF, BENCH_PALLAS=0, BENCH_BF16=1, BENCH_RAY_CHUNK,
    BENCH_TRAIN_STEPS, BENCH_SCENE, BENCH_NS, BENCH_HW, BENCH_WHITE_BKGD.
    """
    import jax
    import jax.numpy as jnp

    from pixelnerf_tpu.config import hocon
    from pixelnerf_tpu.data import SyntheticDataset
    from pixelnerf_tpu.models import make_encode_fn, make_model
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
    # BENCH_SIGMA_ACT=softplus: dead-zone-free density head (model conf
    # `sigma_activation`), the rescue knob for scenes whose tiny foreground
    # fraction dead-relus the whole field (docs/SCENES.md "offcenter")
    if os.environ.get("BENCH_SIGMA_ACT"):
        conf.put("model.sigma_activation", os.environ["BENCH_SIGMA_ACT"])
    # "auto": fused Pallas kernel on TPU, plain XLA elsewhere (CPU dry runs)
    mlp_impl = "auto" if os.environ.get("BENCH_PALLAS", "1") != "0" else "xla"
    net = make_model(conf["model"], mlp_impl=mlp_impl)
    use_viewdirs = net.conf.get_bool("use_viewdirs", False)
    white_bkgd = conf["renderer"].get_bool("white_bkgd", True)
    # the synthetic tracer renders white backgrounds; BENCH_WHITE_BKGD=1
    # keeps compositing consistent with the scene when a conf (e.g. dtu)
    # defaults black — one flag, identical compute cost
    if os.environ.get("BENCH_WHITE_BKGD"):
        white_bkgd = os.environ["BENCH_WHITE_BKGD"] != "0"

    # scene family + source-view count: the published headline is the
    # "sphere" NS=1 control; scripts/study_scenes.py sweeps the adversarial
    # kinds (multi3/thin/offcenter/large/cluster) and NS through these knobs.
    # BENCH_HW="76x100" (HxW) sets a non-square frame — the DTU 0.25-scale
    # acceptance shape (/root/reference/README.md:99 "quite slow" full-res).
    scene_kind = os.environ.get("BENCH_SCENE", "sphere")
    ns = int(os.environ.get("BENCH_NS", 1))
    if os.environ.get("BENCH_HW"):
        H, W = (int(x) for x in os.environ["BENCH_HW"].split("x"))
    else:
        H = W = 64
    # BENCH_Z="near:far" overrides the scene family's depth span (z-span /
    # sample-spacing ablations — scripts/study_scenes.py)
    z_range = None
    if os.environ.get("BENCH_Z"):
        z_range = tuple(float(x) for x in os.environ["BENCH_Z"].split(":"))
    t_sub = time.perf_counter()
    sub = {}

    def subphase(name):
        nonlocal t_sub
        now = time.perf_counter()
        sub[name] = round(now - t_sub, 1)
        t_sub = now

    # warm the tunnel's D2H transfer path with one tiny fetch BEFORE any
    # timed work: the remote-TPU relay initializes its data channel lazily
    # on the first device->host read, and under relay congestion that first
    # read has been measured to stall 100-200 s.  Paying (and printing) it
    # here keeps a transient stall out of the quick_train/encode sub-phases
    # so regressions in THOSE numbers stay attributable to code.
    np.asarray(jnp.zeros((1,), jnp.float32))
    subphase("tunnel_warmup")

    # BENCH_TRAIN_VIEWS: supervision views in the synthetic scene (default
    # 4).  GT-fidelity studies raise it — with 4 views the field's novel-
    # pose PSNR vs the analytic tracer ceilings in the teens regardless of
    # steps (docs/studies/r5_study.jsonl "hifi"), which is a supervision
    # limit, not a capacity one.
    n_sup_views = int(os.environ.get("BENCH_TRAIN_VIEWS", 0)) or max(4, ns)
    ds = SyntheticDataset(
        n_objs=1, n_views=n_sup_views, image_size=(H, W),
        scene_kind=scene_kind, z_range=z_range,
    )
    sample = ds[0]
    focal = np.float32(sample["focal"])
    subphase("synth_data")

    # jit the init: flax's Module.init runs eagerly op-by-op, and through the
    # remote-TPU tunnel every one of those thousands of dispatches pays a
    # round trip (measured 153 s for the multiscale conf); one jitted (and
    # persistently cached) program runs it in seconds
    variables = jax.jit(net.init)(
        jax.random.PRNGKey(0),
        jnp.asarray(sample["images"][None, :1]),
        jnp.asarray(sample["poses"][None, :1]),
        jnp.asarray(focal),
        jnp.zeros((1, 8, 3), jnp.float32),
        jnp.zeros((1, 8, 3), jnp.float32),
    )
    jax.block_until_ready(variables)
    subphase("net_init")

    train_steps = int(
        os.environ.get(
            "BENCH_TRAIN_STEPS",
            800 if os.environ.get("BENCH_TRAIN_SCHED", "cosine") == "cosine"
            else 4000,  # const = the r2/3 control recipe (see quick_train)
        )
    )
    if train_steps > 0:
        # diff_mode keeps field-kernel inputs dense so train steps ride the
        # fused kernel's custom-VJP backward (auto: TPU only)
        train_net = make_model(conf["model"], mlp_impl=mlp_impl, diff_mode=True)
        variables = quick_train(
            train_net, variables, sample, focal, use_viewdirs, train_steps,
            white_bkgd=white_bkgd, z_near=ds.z_near, z_far=ds.z_far,
        )
        subphase("quick_train")

    # jitted encode: the eager apply dispatches each encoder op through the
    # tunnel (measured ~90 s for the multiscale conf vs ~1 s compiled)
    scene = make_encode_fn(net)(
        variables,
        jnp.asarray(sample["images"][None, :ns]),
        jnp.asarray(sample["poses"][None, :ns]),
        jnp.asarray(focal),
    )
    jax.block_until_ready(scene)
    subphase("encode")
    log(
        "bench: setup sub-phases "
        + ", ".join(f"{k}={v}" for k, v in sub.items())
    )

    # reference renderer defaults: 64 coarse + (16 importance + 16 depth) fine
    renderer = NeRFRenderer.from_conf(conf["renderer"], eval_batch_size=1_000_000)
    if renderer.base_cfg.white_bkgd != white_bkgd:
        import dataclasses

        renderer.base_cfg = dataclasses.replace(
            renderer.base_cfg, white_bkgd=white_bkgd
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
        compute_dtype=jnp.bfloat16 if use_bf16 else None,
    )

    # video rays: 16 frames (64x64 default = 65,536 rays per timed pass)
    poses = np.stack(
        [
            geometry.pose_spherical(a, -15.0, 1.3)
            for a in np.linspace(-180, 180, 17)[:-1]
        ]
    )
    rays = geometry.gen_rays_np(
        poses, W, H, float(focal), ds.z_near, ds.z_far
    ).reshape(-1, 8)
    # -R semantics: upper bound on the device-side ray chunk; the pipeline
    # renders the whole pass in ONE dispatch (lax.map over chunks on device)
    # and, under pruning, auto-sizes the chunk within this bound from the
    # live-point budget (pipeline._autoselect_capacity) — 65536 lets the
    # proposal path take the measured-fastest whole-pass chunk
    # (scripts/study_chunk.py: 328k rays/s vs 252k at 8192); the dense path
    # keeps the conservative device_chunk.
    chunk = int(os.environ.get("BENCH_RAY_CHUNK", 65536))
    # commit the ray batch to the device ONCE: gen_video uploads each ray
    # once too — re-uploading the same 2 MB every timed pass would charge the
    # bench a tunnel H2D cost the real video loop never pays per-frame-pass
    rays = jax.device_put(jnp.asarray(rays))

    return BenchScene(
        conf=conf,
        net=net,
        sample=sample,
        scene_kind=scene_kind,
        ns=ns,
        focal=focal,
        variables=variables,
        scene=scene,
        renderer=renderer,
        pipeline=pipeline,
        rays=rays,
        chunk=chunk,
        rng=jax.random.PRNGKey(1),
        n_chips=n_chips,
        train_steps=train_steps,
        use_viewdirs=use_viewdirs,
        white_bkgd=white_bkgd,
    )


def timed_round(s: BenchScene, n_passes: int = 3) -> float:
    """gen_video's consumer loop: enqueue every pass (async dispatch), then
    fetch the packed (rgb, depth) frames — fetch of pass i overlaps device
    compute of pass i+1, exactly how a video writer drains frames."""
    import jax

    from pixelnerf_tpu.parallel import unpack_simple

    t0 = time.perf_counter()
    pending = [
        s.pipeline.render_simple(
            s.variables, s.scene, s.rays, jax.random.fold_in(s.rng, i),
            ray_batch_size=s.chunk, as_numpy=False, pack="u8",
        )
        for i in range(n_passes)
    ]
    outs = [unpack_simple(p) for p in pending]
    dt = time.perf_counter() - t0
    assert all(np.isfinite(rgb).all() for rgb, _ in outs)
    return n_passes * s.rays.shape[0] / dt


def measure_steady(s: BenchScene, max_rounds: int = 6, tol: float = 0.04,
                   min_rounds: int = 4):
    """Timed rounds until the rate is steady (last two within ``tol``);
    returns (median rate, all round rates).  Callers must have rendered at
    least once already (compile warmup).

    ``min_rounds`` floors the sample count before the stability early-exit:
    the remote-TPU link jitters per-dispatch latency by up to ~20% on busy
    days (measured round rates 747k-918k on one setup), and two adjacent
    LOW rounds otherwise satisfy ``tol`` and freeze the median on the dip."""
    timed_round(s)  # steady-state warmup (second-dispatch caches, allocator)
    rates = [timed_round(s)]
    for _ in range(max_rounds - 1):
        rates.append(timed_round(s))
        if (
            len(rates) >= min_rounds
            and abs(rates[-1] - rates[-2]) / max(rates[-1], rates[-2]) < tol
        ):
            break
    return float(np.median(rates)), rates


def psnr_vs(rgb, rgb_ref) -> float:
    mse = float(np.mean((np.asarray(rgb) - np.asarray(rgb_ref)) ** 2))
    return -10.0 * np.log10(max(mse, 1e-12))


REFERENCE_TRAIN_RAYS_PER_SEC = 16_700.0
# = REFERENCE_RAYS_PER_SEC / 3: a train step costs forward + ~2x-forward
# backward on the same chain the eval denominator priced, so dividing the
# (already generous, docs/BASELINE_MEASUREMENT.md) 50k eval figure by the
# FLOP ratio assumes the reference's eager autograd adds ZERO overhead over
# its eval path — maximally generous.  The measured torch fwd+bwd/fwd-only
# rate ratio on this host is reproducible via
# `python scripts/measure_baseline.py --train` (see the doc's train section).


def bench_train():
    """Training-throughput bench (BENCH_MODE=train): the reference SRN recipe
    — SB=4 objects x 128 rays/object x (64 coarse + 96 fine-union) samples,
    NS=1 — through the real Trainer step (make_step_fns: bf16 AMP, remat,
    donated state), on synthetic 128px data.

    Steps run in lax.scan segments (one dispatch per segment) so the number
    measures DEVICE throughput, not the host/tunnel round trip the real
    Trainer hides with prefetch overlap.  Prints ONE JSON line like the eval
    bench; stderr logs steps/s and the model-math MFU.

    Env knobs: BENCH_TRAIN_CONF (default srn), BENCH_PALLAS=0 (XLA MLP),
    BENCH_TRAIN_BATCH (SB, default 4), BENCH_TRAIN_RAYS (default 128),
    BENCH_PEAK_TFLOPS (default 197, v5e bf16).
    """
    import jax
    import jax.numpy as jnp
    import optax

    from pixelnerf_tpu.config import hocon
    from pixelnerf_tpu.data import SyntheticDataset
    from pixelnerf_tpu.models import make_model
    from pixelnerf_tpu.models.losses import l2_loss
    from pixelnerf_tpu.render.renderer import RenderConfig
    from pixelnerf_tpu.train.trainer import (
        TrainState,
        make_step_fns,
        prepare_ray_batch,
    )

    # warm the tunnel D2H path (see setup_scene): keeps a lazy relay
    # data-channel init out of the timed segments
    np.asarray(jnp.zeros((1,), jnp.float32))

    here = os.path.dirname(os.path.abspath(__file__))
    conf_name = os.environ.get("BENCH_TRAIN_CONF", "srn")
    conf_path = (
        conf_name
        if os.sep in conf_name
        else os.path.join(here, "conf", "exp", f"{conf_name}.conf")
    )
    conf = hocon.parse_file(conf_path)
    if os.environ.get("BENCH_SIGMA_ACT"):
        conf.put("model.sigma_activation", os.environ["BENCH_SIGMA_ACT"])
    mlp_impl = "auto" if os.environ.get("BENCH_PALLAS", "1") != "0" else "xla"
    net = make_model(conf["model"], mlp_impl=mlp_impl, diff_mode=True)
    use_viewdirs = net.conf.get_bool("use_viewdirs", False)

    SB = int(os.environ.get("BENCH_TRAIN_BATCH", 4))
    R = int(os.environ.get("BENCH_TRAIN_RAYS", 128))
    ds = SyntheticDataset(n_objs=SB, n_views=3, image_size=128)
    samples = [ds[i] for i in range(SB)]
    focal = np.float32(samples[0]["focal"])
    data = {
        "images": np.stack([s["images"] for s in samples]),
        "poses": np.stack([s["poses"] for s in samples]),
        "focal": np.full((SB,), focal, np.float32),
    }

    variables = jax.jit(net.init)(
        jax.random.PRNGKey(0),
        jnp.asarray(data["images"][:1, :1]),
        jnp.asarray(data["poses"][:1, :1]),
        jnp.asarray(focal),
        jnp.zeros((1, 8, 3), jnp.float32),
        jnp.zeros((1, 8, 3), jnp.float32),
    )

    rcf = conf["renderer"]
    cfg = RenderConfig(
        n_coarse=rcf.get_int("n_coarse", 64),
        n_fine=rcf.get_int("n_fine", 32),
        n_fine_depth=rcf.get_int("n_fine_depth", 16),
        white_bkgd=rcf.get_bool("white_bkgd", True),
        noise_std=0.0,
    )
    opt = optax.adam(1e-4)
    state = TrainState(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=jax.jit(opt.init)(variables["params"]),
        step=jnp.zeros((), jnp.int32),
    )
    nviews = int(os.environ.get("BENCH_TRAIN_NVIEWS", 1))
    # remat default mirrors the Trainer: OFF when the fused kernel handles
    # the field backward (its custom VJP already recomputes in VMEM — an
    # outer jax.checkpoint would only add a redundant forward replay), ON
    # for the XLA MLP (no-remat residuals = every layer activation)
    remat_env = os.environ.get("BENCH_TRAIN_REMAT", "auto")
    if remat_env == "auto":
        remat = not net.field_backward_in_kernel(nviews)
    else:
        remat = remat_env != "0"
    train_step, _ = make_step_fns(
        net, opt, cfg, 1.0, 1.0, l2_loss, l2_loss, use_viewdirs, remat=remat
    )

    seg = int(os.environ.get("BENCH_TRAIN_SEG", 24))
    n_seg = int(os.environ.get("BENCH_TRAIN_SEGS", 4))
    host_rng = np.random.default_rng(3)
    batches = [
        prepare_ray_batch(data, nviews, R, 0.8, 1.8, False, host_rng)
        for _ in range(seg)
    ]
    rays_T = jnp.asarray(np.stack([b["rays"] for b in batches]))
    gt_T = jnp.asarray(np.stack([b["rgb_gt"] for b in batches]))
    fixed = {
        k: jnp.asarray(batches[0][k])
        for k in batches[0]
        if k not in ("rays", "rgb_gt")
    }

    @jax.jit
    def run_seg(state, key):
        def body(carry, xs):
            st, k = carry
            k, sk = jax.random.split(k)
            rays, gt = xs
            st, ld = train_step(st, dict(fixed, rays=rays, rgb_gt=gt), sk)
            return (st, k), ld["t"]

        (state, _), losses = jax.lax.scan(body, (state, key), (rays_T, gt_T))
        return state, losses

    # warmup: compile + one steady segment
    state, losses = run_seg(state, jax.random.PRNGKey(1))
    jax.block_until_ready(losses)
    state, losses = run_seg(state, jax.random.PRNGKey(2))
    jax.block_until_ready(losses)
    assert np.isfinite(np.asarray(losses)).all()

    rates = []
    for i in range(n_seg):
        t0 = time.perf_counter()
        state, losses = run_seg(state, jax.random.PRNGKey(3 + i))
        jax.block_until_ready(losses)
        rates.append(seg / (time.perf_counter() - t0))
    steps_per_sec = float(np.median(rates))
    train_rays_per_sec = steps_per_sec * SB * R

    # model-math MFU: lin_in + lin_z(x combine_layer) + blocks + lin_out MACs
    # per field eval; evals/step = SB*R*(n_coarse + fine union)*NS; train =
    # 3x forward (fwd + dgrad + wgrad — remat/recompute replays NOT counted
    # as useful, so their cost shows up as lower MFU, as it should)
    mc = conf["model"]["mlp_coarse"]
    H = mc.get_int("d_hidden", 512)
    nb = mc.get_int("n_blocks", 5)
    cl = min(mc.get_int("combine_layer", 3), nb)
    code = conf["model"].get("code", hocon.ConfigTree({}))
    d_in = 3 * (2 * code.get_int("num_freqs", 6) + 1) + (
        3 if use_viewdirs else 0
    )
    d_latent = 512  # resnet34 4-layer concat (encoder latent_size)
    mac_eval = d_in * H + cl * d_latent * H + nb * 2 * H * H + H * 4
    union = cfg.n_coarse + cfg.n_fine + cfg.n_fine_depth
    evals = SB * R * (cfg.n_coarse + union) * nviews
    flops_step = 3 * 2 * mac_eval * evals
    peak = float(os.environ.get("BENCH_PEAK_TFLOPS", 197)) * 1e12
    mfu = flops_step * steps_per_sec / peak
    log(
        f"bench_train[{mlp_impl}]: {steps_per_sec:.1f} steps/s "
        f"({1000.0 / steps_per_sec:.1f} ms/step), segment rates "
        + ", ".join(f"{r:.1f}" for r in rates)
    )
    log(
        f"bench_train: {flops_step / 1e9:.2f} GFLOP/step useful (3x-fwd "
        f"model math) -> {mfu * 100:.1f}% MFU of {peak / 1e12:.0f} TF/s peak"
    )
    print(
        json.dumps(
            {
                "metric": "train_rays_per_sec_per_chip",
                "value": round(train_rays_per_sec, 1),
                "unit": "rays/s",
                "vs_baseline": round(
                    train_rays_per_sec / REFERENCE_TRAIN_RAYS_PER_SEC, 3
                ),
            }
        )
    )


def main():
    from pixelnerf_tpu.config.args import enable_compilation_cache

    enable_compilation_cache()

    if os.environ.get("BENCH_MODE", "eval") == "train":
        bench_train()
        return

    phases = {}
    t_phase = time.perf_counter()

    def phase(name):
        nonlocal t_phase
        now = time.perf_counter()
        phases[name] = round(now - t_phase, 1)
        t_phase = now

    s = setup_scene()
    phase("setup(train+encode)")
    pipeline, variables, scene, rays, chunk, rng = (
        s.pipeline, s.variables, s.scene, s.rays, s.chunk, s.rng,
    )

    use_accel = os.environ.get("BENCH_ACCEL", "1") != "0" and s.train_steps > 0
    if use_accel:
        # dense pass first (also the compile warmup for the fallback branch);
        # scene sanity: the trained model must actually render an object —
        # an (all-background) render would make any pruning "win" vacuous
        rgb_dense, fg_frac = s.render_dense_reference()
        log(f"bench: dense-render foreground fraction {fg_frac:.3f}")
        phase("dense_ref")
        if fg_frac < 0.03:
            log("bench: scene sanity failed (empty render); accel disabled")
            use_accel = False
    if use_accel:
        t0 = time.perf_counter()
        # "proposal" = ray compaction + grid-guided importance sampling in
        # place of the coarse MLP pass (render/renderer.py accel_mode docs);
        # the PSNR gate below walks the quality ladder (proposal -> proposal+8
        # -> proposal+16 -> rays -> dense) if the
        # grid misrepresents the field, so the timed number can never ride a
        # degenerate render
        mode = os.environ.get("BENCH_ACCEL_MODE", "proposal")
        pipeline.set_accel_mode(mode)
        # BENCH_ACCEL_RES: occupancy-grid resolution (default 96) — thin-
        # structure scenes are the case a finer grid could help
        pipeline.build_accel(
            variables, scene, rays, ray_batch_size=chunk,
            resolution=int(os.environ.get("BENCH_ACCEL_RES", 96)),
        )
        log(f"bench: accel grid built in {time.perf_counter() - t0:.1f}s")
        phase("grid_build")
        # shared quality ladder (RenderPipeline.gate_accel_mode):
        # proposal -> proposal+8 -> proposal+16 -> rays -> dense
        label, psnrs = pipeline.gate_accel_mode(
            variables, scene, rays, rng, rgb_dense,
            ray_batch_size=chunk, pack="u8",
        )
        for rung, p in psnrs.items():
            log(f"bench: {rung}-vs-dense PSNR {p:.1f} dB")
        log(f"bench: accel gate settled on {label}")
        phase("psnr_gate")

    # warmup / compile
    pipeline.render_simple(
        variables, scene, rays, rng, ray_batch_size=chunk, pack="u8"
    )
    phase("warmup_compile")

    rate, rates = measure_steady(s)
    phase("timed_rounds")
    log("bench: round rates " + ", ".join(f"{r:,.0f}" for r in rates))
    log(
        "bench: phase wall seconds "
        + ", ".join(f"{k}={v}" for k, v in phases.items())
    )
    rays_per_sec = rate / s.n_chips

    payload = {
        "metric": "gen_video_rays_per_sec_per_chip",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / REFERENCE_RAYS_PER_SEC, 3),
    }
    # self-describing: which quick-train recipe produced the timed field
    # (the default recipe changed in round 4; without this, cross-round
    # comparisons need out-of-band BENCH_TRAIN_SCHED context)
    info = getattr(quick_train, "last_info", None)
    if info is not None:
        payload["train_recipe"] = info["recipe"]
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
