"""Epoch-based training harness.

Rebuild of the reference trainer stack (train/trainlib/trainer.py:111-715 +
train/train.py:178-537) as a host-side loop around one jitted TPU train step:

  * per-object random pixel-ray sampling, bbox-guided until ``no_bbox_step``
    (train.py:251-300) — host numpy, static (SB, R) shapes;
  * the whole encode -> render -> loss -> grad -> Adam update is ONE XLA program
    (`make_train_step`); the reference's AMP GradScaler path (train.py:385-398)
    maps to TPU bf16 matmuls, which need no loss scaling — ``use_amp`` toggles
    the default bf16 matmul precision vs forced fp32;
  * epoch checkpointing with the fork's retention policies
    (epoch_%04d / latest / best, keep_last | milestone | keep_all,
    trainer.py:465-618) in flax msgpack, carrying optimizer + LR-schedule +
    renderer-schedule + epoch/global_step state;
  * resume with epoch/global_step consistency auto-repair (trainer.py:648-665);
  * TensorBoard scalars/images matching the reference tags (SURVEY §5.5).
"""

from __future__ import annotations

import dataclasses
import glob
import os
import re
import time
from typing import Any, Callable, Dict, List, Optional, Tuple

import flax.serialization
import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.loader import DataLoader
from ..models.losses import get_rgb_loss
from ..models.pixelnerf import PixelNeRFNet
from ..render.renderer import NeRFRenderer, RenderConfig, render_rays
from ..utils import geometry, metrics

Array = jnp.ndarray


class TrainState(flax.struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: Array  # global step counter (device scalar)


# ---------------------------------------------------------------------------
# Host-side batch preparation (ray sampling)
# ---------------------------------------------------------------------------


def prepare_ray_batch(
    data: dict,
    nviews: int,
    ray_batch_size: int,
    z_near: float,
    z_far: float,
    use_bbox: bool,
    rng: np.random.Generator,
    fg_frac: float = 0.0,
) -> Optional[dict]:
    """Sample per-object pixel rays + source views (reference train.py:237-330).

    :param data: collated batch (images (SB,NV,H,W,3) in [-1,1], poses, focal,
        optional c/bbox)
    :param fg_frac: fraction of each object's rays drawn uniformly from
        mask-POSITIVE pixels (needs ``data["masks"]``), the rest uniform over
        all pixels.  Sharper than the reference's bbox warmup for scattered
        foreground (multi-object / thin structures): a bbox over fragments is
        mostly background, so bbox-guided batches still drown the object
        gradient — mask-guided batches cannot.  0 disables (default).
    :return: dict with src_images (SB,NS,H,W,3), src_poses, focal, c, rays
        (SB,R,8), rgb_gt (SB,R,3), and mask_gt (SB,R) when the batch carries
        per-view masks (all shipped dataset adapters do)
    """
    if "images" not in data:
        return None
    all_images = data["images"]
    SB, NV, H, W = all_images.shape[:4]
    all_poses = data["poses"]
    all_bboxes = data.get("bbox") if use_bbox else None
    all_focals = np.asarray(data["focal"])
    all_c = data.get("c")

    src_images, src_poses = [], []
    all_rays, all_rgb_gt, all_mask_gt = [], [], []
    for obj_idx in range(SB):
        images = all_images[obj_idx]
        poses = all_poses[obj_idx]
        focal = all_focals[obj_idx]
        c = None if all_c is None else np.asarray(all_c[obj_idx])

        if nviews == 1:
            image_ord = rng.integers(0, NV, (1,))
        else:
            image_ord = rng.choice(NV, nviews, replace=False)

        # rays/targets only at the ~ray_batch_size sampled pixels — building
        # the full (NV, H, W) ray grid per object costs more host time on this
        # box than the entire device step (gen_rays_at_np == gen_rays_np math)
        if all_bboxes is not None:
            pix = geometry.bbox_sample_np(
                all_bboxes[obj_idx], ray_batch_size, rng
            )
        else:
            n_fg = 0
            fg_flat = None
            if fg_frac > 0.0 and "masks" in data:
                fg_flat = np.flatnonzero(
                    np.asarray(data["masks"][obj_idx])[..., 0].reshape(-1)
                    > 0.5
                )
                if fg_flat.size:
                    n_fg = int(round(ray_batch_size * min(fg_frac, 1.0)))
            flat = rng.integers(0, NV * H * W, (ray_batch_size,))
            if n_fg:
                flat[:n_fg] = fg_flat[
                    rng.integers(0, fg_flat.size, (n_fg,))
                ]
            pix = np.stack(
                [flat // (H * W), (flat // W) % H, flat % W], axis=-1
            )

        all_rgb_gt.append(
            images[pix[:, 0], pix[:, 1], pix[:, 2]] * 0.5 + 0.5
        )
        if "masks" in data:
            all_mask_gt.append(
                np.asarray(data["masks"][obj_idx])[
                    pix[:, 0], pix[:, 1], pix[:, 2], 0
                ]
            )
        all_rays.append(
            geometry.gen_rays_at_np(poses, W, H, focal, z_near, z_far, pix, c=c)
        )
        src_images.append(images[image_ord])
        src_poses.append(poses[image_ord])

    batch = {
        "src_images": np.stack(src_images).astype(np.float32),
        "src_poses": np.stack(src_poses).astype(np.float32),
        "focal": all_focals.astype(np.float32),
        "rays": np.stack(all_rays).astype(np.float32),
        "rgb_gt": np.stack(all_rgb_gt).astype(np.float32),
    }
    if all_c is not None:
        batch["c"] = np.asarray(all_c, np.float32)
    if all_mask_gt:
        batch["mask_gt"] = np.stack(all_mask_gt).astype(np.float32)
    return batch


# ---------------------------------------------------------------------------
# The jitted train/eval step
# ---------------------------------------------------------------------------


def make_step_fns(
    net: PixelNeRFNet,
    optimizer: optax.GradientTransformation,
    render_cfg: RenderConfig,
    lambda_coarse: float,
    lambda_fine: float,
    rgb_coarse_crit: Callable,
    rgb_fine_crit: Callable,
    use_viewdirs: bool,
    amp: bool = True,
    remat: bool = True,
    alpha_crit=None,
    lambda_alpha_mask: float = 0.0,
):
    """Build jitted (train_step, eval_step).  ``amp=True`` keeps TPU-default
    bf16 matmuls (the AMP equivalent); False forces fp32 everywhere.
    ``remat`` checkpoints the field evaluation (recompute-in-backward).
    ``alpha_crit`` optionally adds the Neural-Volumes alpha prior
    (models.losses.AlphaLossNV2, reference loss.py:4-37) on the fine head's
    pixel alpha; its epoch gate is evaluated at BUILD time (the Trainer
    rebuilds the step when the gate flips — one extra compile).
    ``lambda_alpha_mask`` > 0 adds mask-supervised pixel alpha (MSE between
    each head's accumulated alpha and the dataset's foreground mask, conf
    ``loss.lambda_alpha_mask``) when the batch carries ``mask_gt``.  A
    deliberate extension over the reference (PARITY.md): white-background
    scenes with small or scattered foreground otherwise fall into the
    all-transparent local minimum the RGB loss alone cannot escape
    (collapse to an all-background render; measured on the multi-object
    synthetic families at the reference's own lr)."""
    # training/eval batches are small (ray_batch_size rays); inner point
    # chunking (sized for huge eval renders) would only serialize the MXU
    render_cfg = dataclasses.replace(render_cfg, eval_batch_size=0)
    precision_ctx = (
        (lambda: jax.default_matmul_precision("highest"))
        if not amp
        else (lambda: jax.default_matmul_precision("default"))
    )

    def compute_loss(params, batch_stats, batch, rng, training: bool,
                     noise_scale=None):
        rng_render, rng_drop = jax.random.split(rng)
        variables = {"params": params, "batch_stats": batch_stats}
        c = batch.get("c")
        if training:
            scene, mutated = net.apply(
                variables,
                batch["src_images"],
                batch["src_poses"],
                batch["focal"],
                c=c,
                train=True,
                method=PixelNeRFNet.encode,
                mutable=["batch_stats"],
                rngs={"dropout": rng_drop},
            )
            new_batch_stats = mutated["batch_stats"]
        else:
            scene = net.apply(
                variables,
                batch["src_images"],
                batch["src_poses"],
                batch["focal"],
                c=c,
                train=False,
                method=PixelNeRFNet.encode,
            )
            new_batch_stats = batch_stats

        # The torch-AMP equivalent: the field MLP runs with bf16 operands
        # (params cast per-step from the f32 masters — the cast's transpose
        # accumulates gradients back to f32, so no GradScaler is needed with
        # bf16's fp32-sized exponent).  Geometry, compositing, and the loss
        # stay f32; "default" matmul precision on f32 operands alone would
        # still run the slow multi-pass f32 MXU path.
        if amp:
            cast = lambda t: jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if hasattr(x, "dtype") and x.dtype == jnp.float32
                else x,
                t,
            )
            qvars = {"params": cast(params), "batch_stats": new_batch_stats}
            scene_f = scene.replace(latents=cast(scene.latents))
            field_dtype = jnp.bfloat16
        else:
            qvars = {"params": params, "batch_stats": new_batch_stats}
            scene_f = scene
            field_dtype = None

        def _field_impl(points, viewdirs, coarse):
            return net.apply(
                qvars,
                scene_f,
                points,
                viewdirs=viewdirs if use_viewdirs else None,
                coarse=coarse,
                planar_out=True,
                compute_dtype=field_dtype,
                method=PixelNeRFNet.query,
            )

        # Rematerialize the field in the backward pass: storing every MLP-layer
        # activation for rays x samples x views points costs ~2 GB/layer per
        # 1k-ray object batch (OOMs a 16 GB chip at ray_batch_size 1024); with
        # checkpointing only the (points -> rgbsigma) boundary is saved and the
        # layers are recomputed — the standard HBM-for-FLOPs trade on TPU.
        if remat:
            # keep the sampled pixel latent as a stored residual — replaying
            # the scattered HBM feature gather costs more than the ~1 KB/point
            # it saves; everything else (the MLP tower) rematerializes
            policy = jax.checkpoint_policies.save_only_these_names(
                "pixel_latent"
            )
            field_c = jax.checkpoint(
                lambda p, v: _field_impl(p, v, True), policy=policy
            )
            field_f = jax.checkpoint(
                lambda p, v: _field_impl(p, v, False), policy=policy
            )

            def field(points, viewdirs, coarse):
                return (field_c if coarse else field_f)(points, viewdirs)

        else:
            field = _field_impl

        alpha_active = (
            alpha_crit is not None
            and alpha_crit.lambda_alpha > 0.0
            and alpha_crit.epoch >= alpha_crit.init_epoch
        )
        mask_active = lambda_alpha_mask > 0.0 and "mask_gt" in batch
        out = render_rays(
            field,
            batch["rays"],
            rng_render,
            render_cfg,
            want_weights=alpha_active or mask_active,
            training=training,
            use_viewdirs=use_viewdirs,
            noise_scale=noise_scale,
        )
        rgb_gt = batch["rgb_gt"]
        loss_c = rgb_coarse_crit(out["coarse"]["rgb"], rgb_gt)
        loss_dict = {"rc": loss_c * lambda_coarse}
        loss = loss_c * lambda_coarse
        if "fine" in out:
            loss_f = rgb_fine_crit(out["fine"]["rgb"], rgb_gt)
            loss = loss + loss_f * lambda_fine
            loss_dict["rf"] = loss_f * lambda_fine
        if mask_active:
            mask_gt = batch["mask_gt"]
            loss_am = jnp.mean(
                (jnp.sum(out["coarse"]["weights"], -1) - mask_gt) ** 2
            ) * lambda_coarse
            if "fine" in out:
                loss_am = loss_am + jnp.mean(
                    (jnp.sum(out["fine"]["weights"], -1) - mask_gt) ** 2
                ) * lambda_fine
            loss = loss + lambda_alpha_mask * loss_am
            loss_dict["am"] = lambda_alpha_mask * loss_am
        if alpha_active:
            head = out["fine"] if "fine" in out else out["coarse"]
            pix_alpha = jnp.sum(head["weights"], axis=-1)
            loss_a = alpha_crit(pix_alpha)
            loss = loss + loss_a
            loss_dict["la"] = loss_a
        loss_dict["t"] = loss
        return loss, (new_batch_stats, loss_dict)

    def train_step(state: TrainState, batch: dict, rng: Array,
                   noise_scale=None):
        """``noise_scale`` optionally anneals cfg.noise_std per step (a traced
        scalar — no recompile across a schedule)."""
        with precision_ctx():
            grad_fn = jax.value_and_grad(
                lambda p: compute_loss(
                    p, state.batch_stats, batch, rng, True, noise_scale
                ),
                has_aux=True,
            )
            (loss, (new_bs, loss_dict)), grads = grad_fn(state.params)
            updates, new_opt = optimizer.update(
                grads, state.opt_state, state.params
            )
            new_params = optax.apply_updates(state.params, updates)
            gnorm = optax.global_norm(grads)
            loss_dict = dict(loss_dict, grad_norm=gnorm)
            return (
                state.replace(
                    params=new_params,
                    batch_stats=new_bs,
                    opt_state=new_opt,
                    step=state.step + 1,
                ),
                loss_dict,
            )

    def eval_step(state: TrainState, batch: dict, rng: Array):
        with precision_ctx():
            loss, (_, loss_dict) = compute_loss(
                state.params, state.batch_stats, batch, rng, False
            )
            return loss_dict

    # donate the TrainState: params/opt-state buffers are updated in place
    # (XLA input-output aliasing) instead of allocating a fresh ~3x-params
    # set of arrays every step — callers always rebind `state` to the result
    return jax.jit(train_step, donate_argnums=(0,)), jax.jit(eval_step)


_PREFETCH_END = object()


def _prefetch(gen, depth: int = 2):
    """Run `gen` on a daemon thread, keeping up to `depth` items queued.

    Host-side batch prep (ray sampling is numpy) and the H2D upload overlap
    the device step of the previous batch; exceptions re-raise in the
    consumer.  If the consumer abandons the generator early (exception in the
    train step, KeyboardInterrupt), a stop event unblocks the worker's
    ``put`` so the thread and its queued device batches are released instead
    of leaking for the process lifetime."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    stop = threading.Event()

    def _put(item) -> bool:
        """put with a stop check; returns False if the consumer is gone."""
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for item in gen:
                if not _put((True, item)):
                    return
        except BaseException as e:  # propagate to consumer
            _put((False, e))
            return
        _put((True, _PREFETCH_END))

    threading.Thread(target=worker, daemon=True).start()
    try:
        while True:
            ok, item = q.get()
            if not ok:
                raise item
            if item is _PREFETCH_END:
                return
            yield item
    finally:
        stop.set()


# ---------------------------------------------------------------------------
# Checkpoint manager (fork scheme: epoch_%04d / latest / best + retention)
# ---------------------------------------------------------------------------


class CheckpointManager:
    def __init__(
        self,
        ckpt_dir: str,
        strategy: str = "keep_last",
        keep_last: int = 20,
        milestone_interval: int = 50,
    ):
        self.ckpt_dir = ckpt_dir
        self.strategy = strategy
        self.keep_last = keep_last
        self.milestone_interval = milestone_interval
        os.makedirs(ckpt_dir, exist_ok=True)

    def _epoch_path(self, epoch: int) -> str:
        return os.path.join(self.ckpt_dir, f"epoch_{epoch:04d}.ckpt")

    def save(self, payload: dict, epoch: int, is_best: bool = False) -> None:
        data = flax.serialization.to_bytes(payload)
        path = self._epoch_path(epoch)
        with open(path + ".tmp", "wb") as f:
            f.write(data)
        os.replace(path + ".tmp", path)
        # latest stamped epoch+1 so a restart resumes the *next* epoch
        # (reference trainer.py:474-478)
        latest = dict(payload, epoch=epoch + 1)
        with open(os.path.join(self.ckpt_dir, "latest.ckpt.tmp"), "wb") as f:
            f.write(flax.serialization.to_bytes(latest))
        os.replace(
            os.path.join(self.ckpt_dir, "latest.ckpt.tmp"),
            os.path.join(self.ckpt_dir, "latest.ckpt"),
        )
        if is_best:
            with open(os.path.join(self.ckpt_dir, "best.ckpt"), "wb") as f:
                f.write(data)
        self.cleanup()

    def epochs_on_disk(self) -> List[int]:
        out = []
        for p in glob.glob(os.path.join(self.ckpt_dir, "epoch_*.ckpt")):
            m = re.match(r"epoch_(\d+)\.ckpt$", os.path.basename(p))
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    def cleanup(self) -> None:
        """Retention policies (reference trainer.py:481-551)."""
        if self.strategy == "keep_all":
            return
        epochs = self.epochs_on_disk()
        to_delete = []
        if self.strategy == "keep_last":
            to_delete = epochs[: -self.keep_last] if self.keep_last > 0 else []
        elif self.strategy == "milestone":
            to_delete = [
                e
                for e in epochs[: -1]
                if self.milestone_interval <= 0
                or e % self.milestone_interval != 0
            ]
        for e in to_delete:
            try:
                os.remove(self._epoch_path(e))
            except OSError:
                pass

    def disk_usage_mb(self) -> float:
        total = 0
        for p in glob.glob(os.path.join(self.ckpt_dir, "*.ckpt")):
            total += os.path.getsize(p)
        return total / 1e6

    def load_latest(self, target_payload: dict) -> Optional[dict]:
        path = os.path.join(self.ckpt_dir, "latest.ckpt")
        if not os.path.exists(path):
            epochs = self.epochs_on_disk()
            if not epochs:
                return None
            path = self._epoch_path(epochs[-1])
        with open(path, "rb") as f:
            return flax.serialization.from_bytes(target_payload, f.read())


# ---------------------------------------------------------------------------
# Trainer
# ---------------------------------------------------------------------------


class Trainer:
    """Generic epoch trainer (reference trainlib/trainer.py:111-715).  Subclass
    hooks: ``post_batch``, ``extra_save_state``, ``vis_step``."""

    def __init__(
        self,
        net: PixelNeRFNet,
        init_variables: dict,
        train_dataset,
        test_dataset,
        renderer: NeRFRenderer,
        args,
        conf,  # full conf tree
        device_rng: Optional[Array] = None,
        mesh=None,
    ):
        """:param mesh: optional jax.sharding.Mesh with ("data", "rays") axes —
        shards the object superbatch over "data" and the per-object ray batch
        over "rays"; params/optimizer replicated (XLA inserts the psum grad
        all-reduce).  None = single device."""
        self.net = net
        self.renderer = renderer
        self.args = args
        self.conf = conf
        train_conf = conf["train"] if "train" in conf else None

        def tc(key, default):
            if train_conf is None:
                return default
            getter = {
                int: train_conf.get_int,
                float: train_conf.get_float,
                bool: train_conf.get_bool,
                str: train_conf.get_string,
            }[type(default)]
            return getter(key, default)

        self.print_interval = tc("print_interval", 2)
        self.save_interval = tc("save_interval", 50)
        self.vis_interval = tc("vis_interval", 100)
        self.eval_interval = tc("eval_interval", 50)
        self.num_epoch_repeats = tc("num_epoch_repeats", 1)
        self.num_epochs = args.epochs
        self.accu_grad = tc("accu_grad", 1)
        self.use_amp = getattr(args, "use_amp", tc("use_amp", True))
        # train.remat default: OFF when the field backward rides the fused
        # Pallas custom-VJP kernel (it recomputes its tower in VMEM and stores
        # only kernel inputs, so an outer jax.checkpoint would only add a
        # redundant forward replay — measured +16-19% step time); ON for the
        # XLA MLP (whose no-remat residuals are every layer activation).
        remat = getattr(args, "remat", None)
        if remat is None and train_conf is not None and "remat" in train_conf:
            remat = train_conf.get_bool("remat")
        if remat is None:
            max_nviews = max(
                int(v) for v in str(getattr(args, "nviews", "1")).split()
            )
            remat = not (
                hasattr(net, "field_backward_in_kernel")
                and net.field_backward_in_kernel(max_nviews)
            )
        self.remat = bool(remat)
        self.grad_clip = getattr(args, "grad_clip", tc("grad_clip", 0.0))
        self.check_gradients = getattr(
            args, "check_gradients", tc("check_gradients", False)
        )
        # --profile_dir: capture a jax.profiler device trace of a few
        # steady-state train steps (TensorBoard-viewable; the TPU-native
        # analog of the reference's torch record_function cut points —
        # SURVEY §5.1).  Steps 0-1 are skipped so compile/warmup never
        # pollutes the trace.
        self.profile_dir = getattr(args, "profile_dir", None)
        self._profile_active = False
        self._profile_done = self.profile_dir is None
        self._profile_steps_seen = 0

        batch_size = getattr(args, "batch_size", tc("batch_size", 4))
        # decoded-sample cache: multi-epoch training re-reads every object per
        # epoch, and on a single-core host the PNG decode dominates the loop
        # once the device step is fast; `data.cache_mb = 0` disables.  The
        # cache freezes when full (see DataLoader), so datasets beyond the cap
        # still get cap/total hits without eviction churn or unbounded RAM.
        cache_mb = 4096.0
        if "data" in conf:
            cache_mb = conf["data"].get_float("cache_mb", cache_mb)
        self.train_loader = DataLoader(
            train_dataset,
            batch_size=batch_size,
            shuffle=True,
            seed=0,
            cache_mb=cache_mb,
        )
        self.test_loader = DataLoader(
            test_dataset,
            batch_size=min(batch_size, 4),
            shuffle=True,
            seed=1,
            cache_mb=cache_mb / 4,
        )

        self.z_near = train_dataset.z_near
        self.z_far = train_dataset.z_far

        # --- optimizer + LR schedule (trainer.py:169-189 / fork conf keys) ---
        steps_per_epoch = max(
            1, len(self.train_loader) * self.num_epoch_repeats
        )
        lr = getattr(args, "lr", None) or tc("lr", 1e-4)
        gamma = getattr(args, "gamma", 1.0)
        lr_policy = tc("lr_policy", "exp" if gamma != 1.0 else "const")
        if lr_policy == "step":
            decay_epochs = tc("lr_decay_epochs", 50)
            factor = tc("lr_decay_factor", 0.5)
            schedule = optax.exponential_decay(
                lr,
                transition_steps=decay_epochs * steps_per_epoch,
                decay_rate=factor,
                staircase=True,
            )
        elif lr_policy == "exp" and gamma != 1.0:
            schedule = optax.exponential_decay(
                lr,
                transition_steps=steps_per_epoch,
                decay_rate=gamma,
                staircase=True,
            )
        elif lr_policy == "cosine":
            # warmup + cosine decay to 10% of peak: the TPU-swept quick-train
            # recipe (docs/PERFORMANCE.md "Quick-train recipe") — warmup lets
            # a >1e-4 peak survive the background-dominated first steps that
            # dead-relu the density head under a constant schedule.
            # The decay horizon must be explicit or derivable: args.epochs
            # defaults to an effectively-unbounded sentinel (args.py), and a
            # horizon of steps_per_epoch x 10^7 would hold lr at the full
            # peak forever — the documented decay silently never happening.
            # args.py's default_num_epochs (the unbounded sentinel) is
            # 10,000,000 — any epoch count below THAT is a user-provided
            # finite horizon and must be honored
            epochs = int(getattr(args, "epochs", 0) or 0)
            total = tc(
                "lr_total_steps",
                steps_per_epoch * epochs if 0 < epochs < 10_000_000 else 0,
            )
            if int(total) <= 0:
                raise ValueError(
                    "train.lr_policy = cosine needs a decay horizon: set "
                    "train.lr_total_steps (steps) or pass a finite --epochs"
                )
            schedule = optax.warmup_cosine_decay_schedule(
                0.0,
                lr,
                tc("lr_warmup_steps", 100),
                int(total),
                end_value=0.1 * lr,
            )
        else:
            schedule = lr
        self._schedule = schedule

        txs = []
        if self.check_gradients and self.grad_clip > 0:
            txs.append(optax.clip_by_global_norm(self.grad_clip))
        txs.append(
            optax.adam(
                schedule, b1=tc("beta1", 0.9), b2=tc("beta2", 0.999)
            )
        )
        wd = tc("weight_decay", 0.0)
        if wd > 0:
            txs.insert(-1, optax.add_decayed_weights(wd))
        optimizer = optax.chain(*txs)
        if self.accu_grad > 1:
            # gradient accumulation (conf train.accu_grad, reference
            # default.conf:87-89): update applied every accu_grad steps
            optimizer = optax.MultiSteps(optimizer, every_k_schedule=self.accu_grad)
        self.optimizer = optimizer

        # the jitted train step donates the TrainState (input-output buffer
        # aliasing) — copy caller-provided variables so donation only ever
        # recycles buffers this trainer owns (callers may reuse / share
        # init_variables, e.g. to build a second Trainer)
        params = jax.tree_util.tree_map(jnp.array, init_variables["params"])
        self.state = TrainState(
            params=params,
            batch_stats=jax.tree_util.tree_map(
                jnp.array, init_variables.get("batch_stats", {})
            ),
            opt_state=self.optimizer.init(params),
            step=jnp.zeros((), jnp.int32),
        )

        # --- losses (conf loss subtree, train.py:196-207) ---
        loss_conf = conf["loss"] if "loss" in conf else None
        if loss_conf is not None:
            self.lambda_coarse = loss_conf.get_float("lambda_coarse", 1.0)
            self.lambda_fine = loss_conf.get_float("lambda_fine", 1.0)
            crit_c = get_rgb_loss(loss_conf["rgb"], coarse=True)
            fine_sub = (
                loss_conf["rgb_fine"] if "rgb_fine" in loss_conf else loss_conf["rgb"]
            )
            crit_f = get_rgb_loss(fine_sub, coarse=False)
        else:
            self.lambda_coarse = self.lambda_fine = 1.0
            from ..models.losses import l2_loss

            crit_c = crit_f = l2_loss

        # Neural-Volumes alpha prior (reference loss.py:4-37; conf
        # loss.alpha, lambda_alpha = 0 in every shipped conf = off).  The
        # epoch gate flips the jitted step (one rebuild at init_epoch).
        self.alpha_crit = None
        if loss_conf is not None and "alpha" in loss_conf:
            from ..models.losses import get_alpha_loss

            crit_a = get_alpha_loss(loss_conf["alpha"])
            if crit_a.lambda_alpha > 0.0:
                self.alpha_crit = crit_a
        # mask-supervised pixel alpha (our extension — see make_step_fns)
        self.lambda_alpha_mask = (
            loss_conf.get_float("lambda_alpha_mask", 0.0)
            if loss_conf is not None
            else 0.0
        )

        self.mesh = mesh
        self.use_viewdirs = net.conf.get_bool("use_viewdirs", False)
        self._crit_c, self._crit_f = crit_c, crit_f
        self._train_step, self._eval_step = make_step_fns(
            net,
            self.optimizer,
            renderer.cfg,
            self.lambda_coarse,
            self.lambda_fine,
            crit_c,
            crit_f,
            self.use_viewdirs,
            amp=self.use_amp,
            remat=self.remat,
            alpha_crit=self.alpha_crit,
            lambda_alpha_mask=self.lambda_alpha_mask,
        )
        if mesh is not None:
            self._train_step, self._eval_step = self._shard_steps(
                self._train_step, self._eval_step
            )
        self._step_cfg = renderer.cfg
        self._step_alpha = self._alpha_active()

        # --- bookkeeping ---
        self.epoch = 0
        self.global_step = 0
        self.best_val_loss = float("inf")
        self.managed_weight_saving = True
        exp_name = args.name
        self.ckpt_dir = os.path.join(args.checkpoints_path, exp_name)
        self.ckpt_manager = CheckpointManager(
            self.ckpt_dir,
            strategy=tc("ckpt_strategy", "keep_last"),
            keep_last=tc("keep_last", 20),
            milestone_interval=tc("milestone_interval", 50),
        )
        self.visual_path = os.path.join(args.visual_path, exp_name)
        os.makedirs(self.visual_path, exist_ok=True)

        self.writer = None
        logs_path = os.path.join(args.logs_path, exp_name)
        try:
            from tensorboardX import SummaryWriter

            self.writer = SummaryWriter(logs_path)
        except Exception as e:
            print(f"TensorBoard writer unavailable: {e}")

        self.rng = np.random.default_rng(getattr(args, "seed", 1234))
        self.jrng = device_rng if device_rng is not None else jax.random.PRNGKey(7)

        self.use_bbox = getattr(args, "no_bbox_step", 100000) > 0
        # mask-guided foreground ray sampling (train.fg_sample_frac): the
        # scattered-foreground rescue — see prepare_ray_batch's fg_frac
        self.fg_sample_frac = tc("fg_sample_frac", 0.0)
        self.nviews: List[int] = [
            int(x) for x in str(getattr(args, "nviews", "1")).split()
        ]

        if getattr(args, "resume", False):
            self.load_checkpoint()

    # -------------------- checkpoint payload --------------------
    def _payload(self) -> dict:
        return {
            "epoch": self.epoch,
            "global_step": self.global_step,
            "best_val_loss": self.best_val_loss,
            "state": flax.serialization.to_state_dict(self.state),
            "renderer": self.renderer.state_dict(),
        }

    def save_checkpoint(self, is_best: bool = False) -> None:
        self.ckpt_manager.save(self._payload(), self.epoch, is_best=is_best)
        print(
            f"Saved checkpoint epoch {self.epoch} "
            f"({self.ckpt_manager.disk_usage_mb():.1f} MB on disk)"
        )

    def load_checkpoint(self) -> bool:
        payload = self.ckpt_manager.load_latest(self._payload())
        if payload is None:
            print("No checkpoint found; starting fresh")
            return False
        self.epoch = int(payload["epoch"])
        self.global_step = int(payload["global_step"])
        self.best_val_loss = float(payload["best_val_loss"])
        self.state = flax.serialization.from_state_dict(
            self.state, payload["state"]
        )
        self.renderer.load_state_dict(payload["renderer"])
        # epoch/global_step consistency auto-repair (trainer.py:648-665)
        steps_per_epoch = len(self.train_loader) * self.num_epoch_repeats
        expected = self.epoch * steps_per_epoch
        if steps_per_epoch > 0 and abs(self.global_step - expected) > steps_per_epoch:
            print(
                f"WARNING: checkpoint global_step {self.global_step} inconsistent "
                f"with epoch {self.epoch} (expected ~{expected}); auto-correcting"
            )
            self.global_step = expected
        print(f"Resumed from epoch {self.epoch}, step {self.global_step}")
        return True

    # -------------------- steps --------------------
    def _batch_shardings(self, batch: dict) -> dict:
        """Per-tensor shardings for one batch — the shared
        :func:`pixelnerf_tpu.parallel.batch_shardings` table, so the driver's
        dryrun and the Trainer can never disagree about a batch key."""
        from ..parallel import batch_shardings

        return batch_shardings(self.mesh, batch)

    def _shard_steps(self, train_step, eval_step):
        """Re-jit the step functions with explicit mesh shardings."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(self.mesh, P())

        def sharded_train(state, batch, rng):
            sh = self._batch_shardings(batch)
            batch = {k: jax.device_put(v, sh[k]) for k, v in batch.items()}
            state = jax.device_put(state, repl)
            with self.mesh:
                return train_step(state, batch, rng)

        def sharded_eval(state, batch, rng):
            sh = self._batch_shardings(batch)
            batch = {k: jax.device_put(v, sh[k]) for k, v in batch.items()}
            with self.mesh:
                return eval_step(jax.device_put(state, repl), batch, rng)

        return sharded_train, sharded_eval

    def _alpha_active(self) -> bool:
        ac = self.alpha_crit
        return (
            ac is not None
            and ac.lambda_alpha > 0.0
            and ac.epoch >= ac.init_epoch
        )

    def _maybe_rebuild_step(self):
        """Renderer schedule changed, or the alpha-prior epoch gate flipped ->
        rebuild the jitted step for the new static configuration."""
        if (
            self.renderer.cfg != self._step_cfg
            or self._alpha_active() != self._step_alpha
        ):
            self._train_step, self._eval_step = make_step_fns(
                self.net,
                self.optimizer,
                self.renderer.cfg,
                self.lambda_coarse,
                self.lambda_fine,
                self._crit_c,
                self._crit_f,
                self.use_viewdirs,
                amp=self.use_amp,
                remat=self.remat,
                alpha_crit=self.alpha_crit,
                lambda_alpha_mask=self.lambda_alpha_mask,
            )
            if self.mesh is not None:
                self._train_step, self._eval_step = self._shard_steps(
                    self._train_step, self._eval_step
                )
            self._step_cfg = self.renderer.cfg
            self._step_alpha = self._alpha_active()

    def _prep(self, data, is_train: bool = True) -> Optional[dict]:
        nviews = int(self.nviews[self.rng.integers(0, len(self.nviews))])
        use_bbox = is_train and self.use_bbox
        batch = prepare_ray_batch(
            data,
            nviews,
            self.args.ray_batch_size,
            self.z_near,
            self.z_far,
            use_bbox,
            self.rng,
            fg_frac=self.fg_sample_frac if is_train else 0.0,
        )
        return batch

    def _maybe_flip_bbox(self) -> None:
        """One-shot bbox->uniform sampling switch (reference train.py:251-256).
        With prefetch the flip takes effect on batches prepped after this
        point (depth may delay it by <= 2 steps)."""
        if (
            self.use_bbox
            and self.global_step >= getattr(self.args, "no_bbox_step", 100000)
        ):
            self.use_bbox = False
            print(">>> Stopped using bbox sampling @ iter", self.global_step)

    def _device_train_step(self, batch: dict):
        """Dispatch one prepared device batch; returns the on-device loss
        dict (async — only fetched when printed/logged)."""
        self.jrng, step_rng = jax.random.split(self.jrng)
        self.state, loss_dict = self._train_step(self.state, batch, step_rng)
        self.global_step += 1
        return loss_dict

    def _maybe_profile(self, loss_dict) -> None:
        """Trace train steps 3-5 with jax.profiler (steps 1-2 absorb
        compile/warmup; the counter spans epochs so short epochs still
        capture a window).  No-op unless ``profile_dir`` is set."""
        if self._profile_done:
            return
        self._profile_steps_seen += 1
        n_done = self._profile_steps_seen
        if not self._profile_active and n_done >= 2:
            os.makedirs(self.profile_dir, exist_ok=True)
            # drain step 2's async dispatch first so its device execution
            # (and any residual warmup) cannot bleed into the trace window
            jax.block_until_ready(loss_dict)
            try:
                jax.profiler.start_trace(self.profile_dir)
                self._profile_active = True
            except Exception as e:  # backend without profiler support
                print(f"profile: start_trace failed ({e}); disabled")
                self._profile_done = True
        elif self._profile_active and n_done >= 5:
            jax.block_until_ready(loss_dict)
            self._stop_profile()

    def _stop_profile(self) -> None:
        if not self._profile_active:
            return
        try:
            jax.profiler.stop_trace()
            print(
                f"profile: device trace written to {self.profile_dir} "
                f"(view: tensorboard --logdir {self.profile_dir})"
            )
        except Exception as e:
            print(f"profile: stop_trace failed ({e})")
        self._profile_active = False
        self._profile_done = True

    def train_step(self, data) -> Optional[Dict[str, float]]:
        self._maybe_flip_bbox()
        batch = self._prep(data, is_train=True)
        if batch is None:
            return None
        loss_dict = self._device_train_step(
            {k: jnp.asarray(v) for k, v in batch.items()}
        )
        # profiling applies to the public step API too, not just train_epoch
        self._maybe_profile(loss_dict)
        return {k: float(v) for k, v in loss_dict.items()}

    def eval_step(self, data) -> Optional[Dict[str, float]]:
        batch = self._prep(data, is_train=False)
        if batch is None:
            return None
        self.jrng, step_rng = jax.random.split(self.jrng)
        loss_dict = self._eval_step(
            self.state, {k: jnp.asarray(v) for k, v in batch.items()}, step_rng
        )
        return {k: float(v) for k, v in loss_dict.items()}

    def post_batch(self, epoch: int, batch_idx: int) -> None:
        self.renderer.sched_step(1)
        self._maybe_rebuild_step()

    def vis_step(self, data) -> Optional[Tuple[np.ndarray, float]]:
        return None  # implemented by PixelNeRFTrainer

    # -------------------- loops --------------------
    def current_lr(self) -> float:
        if callable(self._schedule):
            return float(self._schedule(int(self.global_step)))
        return float(self._schedule)

    def _train_batches(self):
        """Producer: load + host-side ray sampling + async H2D upload for one
        epoch pass.  Runs on a prefetch thread so prep of batch N+1 overlaps
        device compute of batch N."""
        for batch_idx, data in enumerate(self.train_loader):
            batch = self._prep(data, is_train=True)
            if batch is None:
                continue
            yield batch_idx, {k: jnp.asarray(v) for k, v in batch.items()}

    def train_epoch(self) -> Dict[str, float]:
        t_start = time.time()
        if self.alpha_crit is not None:
            # epoch-gated alpha prior (reference loss.py sched_step contract)
            self.alpha_crit.epoch = self.epoch
            self._maybe_rebuild_step()
        n_batches = 0
        last: Dict[str, Any] = {}
        for _ in range(self.num_epoch_repeats):
            self.train_loader.set_epoch(self.epoch)
            for batch_idx, batch in _prefetch(self._train_batches()):
                self._maybe_flip_bbox()
                loss_dict = self._device_train_step(batch)
                n_batches += 1
                last = loss_dict
                self._maybe_profile(loss_dict)
                if self.global_step % self.print_interval == 0:
                    floats = {k: float(v) for k, v in loss_dict.items()}
                    if self.writer is not None:
                        for k, v in floats.items():
                            self.writer.add_scalar(
                                f"train/{k}", v, self.global_step
                            )
                        self.writer.add_scalar(
                            "train/lr", self.current_lr(), self.global_step
                        )
                    s_it = (time.time() - t_start) / max(n_batches, 1)
                    items = " ".join(
                        f"{k}:{v:.5f}" for k, v in floats.items()
                    )
                    print(
                        f"E{self.epoch} B{batch_idx} {items} "
                        f"lr:{self.current_lr():.2e} {s_it:.2f}s/it"
                    )
                self.post_batch(self.epoch, batch_idx)
        return {k: float(v) for k, v in last.items()}

    def validate(self) -> float:
        losses = []
        for data in self.test_loader:
            try:
                ld = self.eval_step(data)
            except Exception as e:  # skip bad batches (trainer.py:440-443)
                print(f"validate: skipping batch ({e})")
                continue
            if ld is not None:
                losses.append(ld["t"])
        val_loss = float(np.mean(losses)) if losses else float("inf")
        if self.writer is not None:
            self.writer.add_scalar("val/loss", val_loss, self.global_step)
        return val_loss

    def start(self) -> None:
        """Main loop (reference trainer.py:670-714)."""
        try:
            self._run_epochs()
        finally:
            # an exception / KeyboardInterrupt mid-training must still flush
            # an open profiler trace, or the trace files are unusable
            self._stop_profile()
        self.epoch = self.num_epochs

    def _run_epochs(self) -> None:
        start_epoch = self.epoch
        for epoch in range(start_epoch, self.num_epochs):
            self.epoch = epoch
            self.train_epoch()

            is_best = False
            if (epoch + 1) % self.eval_interval == 0 or epoch == self.num_epochs - 1:
                val_loss = self.validate()
                print(f"Epoch {epoch}: val loss {val_loss:.5f}")
                if val_loss < self.best_val_loss:
                    self.best_val_loss = val_loss
                    is_best = True
            if (epoch + 1) % self.save_interval == 0 or epoch == self.num_epochs - 1:
                self.save_checkpoint(is_best=is_best)
            if (epoch + 1) % self.vis_interval == 0:
                try:
                    data = next(iter(self.test_loader))
                    vis = self.vis_step(data)
                    if vis is not None:
                        vis_img, vis_psnr = vis
                        import imageio.v2 as imageio

                        path = os.path.join(
                            self.visual_path, f"{epoch:04d}_vis.png"
                        )
                        imageio.imwrite(path, vis_img)
                        if self.writer is not None:
                            self.writer.add_image(
                                "vis",
                                vis_img.transpose(2, 0, 1),
                                self.global_step,
                            )
                            self.writer.add_scalar(
                                "vis/psnr", vis_psnr, self.global_step
                            )
                        print(f"Wrote vis to {path} (psnr {vis_psnr:.2f})")
                except Exception as e:
                    print(f"vis_step failed: {e}")
