"""Train-step time attribution (VERDICT r4 #4): where do the ~50% of the
step that isn't field-MLP math go?

The eval path got its speed from a measured per-phase ladder; this study
produces the train-side equivalent by ABLATION — the same bench_train
protocol (srn recipe: SB=4 x R=128 rays, 64+48-union samples, NS=1, scan
segments so the number is device throughput), timed under structural
variants that delete one phase at a time:

  full        — the real train step (encoder fwd+bwd, field fwd+bwd,
                sampling/compositing, loss, adam)
  enc_nograd  — stop_gradient on the encoded scene: encoder BACKWARD deleted
  enc_frozen  — scene precomputed outside the step: encoder fwd+bwd deleted
  fwd_only    — loss forward without value_and_grad: all backward deleted
  field_only  — field fwd+bwd on the same point count, no render/encode glue

Differences between adjacent rows attribute the phase costs; the residual
against the MLP roofline is the named glue.  One JSON line per variant.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/study_train_phases.py
Env: PHASE_CONF (default srn), PHASE_SB/PHASE_R, PHASE_PALLAS=0 (XLA MLP),
     PHASE_REMAT (default auto), STUDY_OUT.
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

OUT = os.environ.get("STUDY_OUT", "/tmp/r5_train_phases.jsonl")


def emit(row):
    line = json.dumps(row)
    print(line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from pixelnerf_tpu.config import hocon
    from pixelnerf_tpu.config.args import enable_compilation_cache
    from pixelnerf_tpu.data import SyntheticDataset
    from pixelnerf_tpu.models import make_model
    from pixelnerf_tpu.models.losses import l2_loss
    from pixelnerf_tpu.models.pixelnerf import PixelNeRFNet
    from pixelnerf_tpu.render import RenderConfig
    from pixelnerf_tpu.render.renderer import render_rays
    from pixelnerf_tpu.train.trainer import (
        TrainState,
        make_step_fns,
        prepare_ray_batch,
    )

    enable_compilation_cache()
    np.asarray(jnp.zeros((1,), jnp.float32))  # tunnel D2H warmup

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    conf_name = os.environ.get("PHASE_CONF", "srn")
    conf = hocon.parse_file(os.path.join(here, "conf", "exp",
                                         f"{conf_name}.conf"))
    mlp_impl = "auto" if os.environ.get("PHASE_PALLAS", "1") != "0" else "xla"
    net = make_model(conf["model"], mlp_impl=mlp_impl, diff_mode=True)
    use_viewdirs = net.conf.get_bool("use_viewdirs", False)

    SB = int(os.environ.get("PHASE_SB", 4))
    R = int(os.environ.get("PHASE_R", 128))
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
        eval_batch_size=0,
    )
    remat_env = os.environ.get("PHASE_REMAT", "auto")
    if remat_env == "auto":
        remat = not net.field_backward_in_kernel(1)
    else:
        remat = remat_env != "0"
    opt = optax.adam(1e-4)

    host_rng = np.random.default_rng(3)
    seg = int(os.environ.get("PHASE_SEG", 24))
    batches = [
        prepare_ray_batch(data, 1, R, 0.8, 1.8, False, host_rng)
        for _ in range(seg)
    ]
    rays_T = jnp.asarray(np.stack([b["rays"] for b in batches]))
    gt_T = jnp.asarray(np.stack([b["rgb_gt"] for b in batches]))
    fixed = {
        k: jnp.asarray(batches[0][k])
        for k in batches[0]
        if k not in ("rays", "rgb_gt")
    }

    def time_scan(step_fn, label, state):
        """Time `seg`-step scan segments of step_fn; median of 4."""

        @jax.jit
        def run_seg(state, key):
            def body(carry, xs):
                st, k = carry
                k, sk = jax.random.split(k)
                rays, gt = xs
                st, val = step_fn(st, dict(fixed, rays=rays, rgb_gt=gt), sk)
                return (st, k), val

            (state, _), vals = jax.lax.scan(body, (state, key), (rays_T, gt_T))
            return state, vals

        t0 = time.perf_counter()
        state, vals = run_seg(state, jax.random.PRNGKey(1))
        jax.block_until_ready(vals)
        compile_s = time.perf_counter() - t0
        state, vals = run_seg(state, jax.random.PRNGKey(2))
        jax.block_until_ready(vals)
        times = []
        for i in range(4):
            t0 = time.perf_counter()
            state, vals = run_seg(state, jax.random.PRNGKey(3 + i))
            jax.block_until_ready(vals)
            times.append((time.perf_counter() - t0) / seg)
        ms = float(np.median(times) * 1e3)
        emit({"variant": label, "ms_per_step": round(ms, 2),
              "compile_s": round(compile_s, 1), "remat": remat,
              "mlp_impl": mlp_impl, "SB": SB, "R": R})
        return ms

    # --- shared loss builder, with ablation switches ---
    def build_loss(enc_mode: str):
        """enc_mode: 'train' (full), 'nograd' (stop_gradient on scene),
        'frozen' (scene precomputed, passed via closure)."""
        frozen_scene = None
        if enc_mode == "frozen":
            frozen_scene = net.apply(
                variables,
                jnp.asarray(data["images"][:, :1]),
                jnp.asarray(data["poses"][:, :1]),
                jnp.asarray(data["focal"]),
                method=PixelNeRFNet.encode,
            )

        def compute_loss(params, batch, rng):
            vars_ = {"params": params,
                     "batch_stats": variables.get("batch_stats", {})}
            if enc_mode == "frozen":
                scene = frozen_scene
            else:
                scene = net.apply(
                    vars_,
                    batch["src_images"],
                    batch["src_poses"],
                    batch["focal"],
                    train=False,
                    method=PixelNeRFNet.encode,
                )
                if enc_mode == "nograd":
                    scene = jax.tree.map(jax.lax.stop_gradient, scene)

            cast = lambda t: jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if hasattr(x, "dtype") and x.dtype == jnp.float32
                else x,
                t,
            )
            qvars = {"params": cast(params),
                     "batch_stats": variables.get("batch_stats", {})}
            scene_f = scene.replace(latents=cast(scene.latents))

            def _field(points, viewdirs, coarse):
                return net.apply(
                    qvars, scene_f, points,
                    viewdirs=viewdirs if use_viewdirs else None,
                    coarse=coarse, planar_out=True,
                    compute_dtype=jnp.bfloat16,
                    method=PixelNeRFNet.query,
                )

            if remat:
                policy = jax.checkpoint_policies.save_only_these_names(
                    "pixel_latent"
                )
                fc = jax.checkpoint(lambda p, v: _field(p, v, True),
                                    policy=policy)
                ff = jax.checkpoint(lambda p, v: _field(p, v, False),
                                    policy=policy)
                field = lambda p, v, coarse: (fc if coarse else ff)(p, v)
            else:
                field = _field
            out = render_rays(field, batch["rays"], rng, cfg,
                              training=True, use_viewdirs=use_viewdirs)
            loss = l2_loss(out["coarse"]["rgb"], batch["rgb_gt"])
            if "fine" in out:
                loss = loss + l2_loss(out["fine"]["rgb"], batch["rgb_gt"])
            return loss

        return compute_loss

    def train_variant(enc_mode):
        loss_fn = build_loss(enc_mode)

        def step(state, batch, rng):
            loss, grads = jax.value_and_grad(
                lambda p: loss_fn(p, batch, rng)
            )(state.params)
            updates, new_opt = opt.update(grads, state.opt_state, state.params)
            return (
                state.replace(
                    params=optax.apply_updates(state.params, updates),
                    opt_state=new_opt,
                    step=state.step + 1,
                ),
                loss,
            )

        return step

    def fwd_variant():
        loss_fn = build_loss("train")

        def step(state, batch, rng):
            return state, loss_fn(state.params, batch, rng)

        return step

    def make_state():
        return TrainState(
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=jax.jit(opt.init)(variables["params"]),
            step=jnp.zeros((), jnp.int32),
        )

    # reference row: the REAL trainer step (amp+remat exactly as shipped)
    real_step, _ = make_step_fns(
        net, opt, cfg, 1.0, 1.0, l2_loss, l2_loss, use_viewdirs, remat=remat
    )
    full_ms = time_scan(
        lambda st, b, k: (lambda s2, ld: (s2, ld["t"]))(*real_step(st, b, k)),
        "full(make_step_fns)", make_state(),
    )
    t_full = time_scan(train_variant("train"), "full(study)", make_state())
    t_nograd = time_scan(train_variant("nograd"), "enc_nograd", make_state())
    t_frozen = time_scan(train_variant("frozen"), "enc_frozen", make_state())
    t_fwd = time_scan(fwd_variant(), "fwd_only", make_state())

    # field-only fwd+bwd on an equivalent point count (union + coarse)
    n_pts = SB * R * (cfg.n_coarse + cfg.n_coarse + cfg.n_fine)
    pts = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, n_pts, 3)), jnp.float32
    )
    dirs = jnp.asarray(
        np.random.default_rng(1).normal(size=(1, n_pts, 3)), jnp.float32
    )
    frozen_scene = net.apply(
        variables,
        jnp.asarray(data["images"][:1, :1]),
        jnp.asarray(data["poses"][:1, :1]),
        jnp.asarray(data["focal"][:1]),
        method=PixelNeRFNet.encode,
    )

    cast16 = lambda t: jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32
        else x,
        t,
    )
    scene16 = frozen_scene.replace(latents=cast16(frozen_scene.latents))

    def field_loss(params):
        # bf16 operands like the real step's AMP path — an f32 field here
        # runs the slow multi-pass MXU path and is not comparable
        qvars = {"params": cast16(params),
                 "batch_stats": variables.get("batch_stats", {})}
        out = net.apply(
            qvars, scene16, pts,
            viewdirs=dirs if use_viewdirs else None,
            coarse=True, planar_out=True,
            compute_dtype=jnp.bfloat16,
            method=PixelNeRFNet.query,
        )
        return jnp.mean(out.astype(jnp.float32) ** 2)

    def time_jit(fn, label, **extra):
        jfn = jax.jit(fn)
        out = jfn(variables["params"])
        jax.block_until_ready(out)
        times = []
        for _ in range(6):
            t0 = time.perf_counter()
            out = jfn(variables["params"])
            jax.block_until_ready(out)
            times.append(time.perf_counter() - t0)
        ms = float(np.median(times) * 1e3)
        emit({"variant": label, "ms_per_step": round(ms, 2),
              "n_points": n_pts, **extra})
        return ms

    t_field_f = time_jit(field_loss, "field_only(fwd)")
    t_field = time_jit(jax.grad(field_loss), "field_only(fwd+bwd)")

    # model-math roofline for the step (3x-forward accounting, bf16 peak)
    mc = conf["model"]["mlp_coarse"]
    H = mc.get_int("d_hidden", 512)
    nb = mc.get_int("n_blocks", 5)
    cl = min(mc.get_int("combine_layer", 3), nb)
    code = conf["model"].get("code", hocon.ConfigTree({}))
    d_in = 3 * (2 * code.get_int("num_freqs", 6) + 1) + (
        3 if use_viewdirs else 0
    )
    mac = d_in * H + cl * 512 * H + nb * 2 * H * H + H * 4
    peak = float(os.environ.get("BENCH_PEAK_TFLOPS", 197)) * 1e12
    roofline_ms = 3 * 2 * mac * n_pts / peak * 1e3
    emit({
        "variant": "attribution",
        "full_ms": round(t_full, 2),
        "real_step_ms": round(full_ms, 2),
        "encoder_bwd_ms": round(t_full - t_nograd, 2),
        "encoder_fwd_ms": round(t_nograd - t_frozen, 2),
        "backward_total_ms": round(t_full - t_fwd, 2),
        "field_fwd_ms": round(t_field_f, 2),
        "field_fwdbwd_ms": round(t_field, 2),
        "glue_ms": round(t_frozen - t_field, 2),
        "roofline_ms": round(roofline_ms, 2),
        "mfu_full": round(roofline_ms / t_full, 3),
    })


if __name__ == "__main__":
    main()
