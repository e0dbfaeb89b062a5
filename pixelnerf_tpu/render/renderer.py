"""NeRF volume renderer — jitted compositing over sampled ray points.

Functional redesign of the reference NeRFRenderer (nerf.py:45-371):

  * :func:`render_rays` is a pure function of (model_fn, rays, rng) under a static
    :class:`RenderConfig`; the whole coarse->importance->fine pipeline is one XLA
    program — no per-chunk host loop like the reference's torch.split eval batching
    (nerf.py:195-216).  Memory is bounded instead with ``lax.map`` over point chunks
    (rematerialized scan), sized by ``eval_batch_size``.
  * The sample-count *schedule* (nerf.py:318-338) is host-side state on
    :class:`NeRFRenderer`, which simply swaps the static config (a new jit cache
    entry per schedule stage, exactly one compile each).
  * DataParallel-over-rays (nerf.py:354-371) is replaced by sharding the ray axis
    over the device mesh (see :mod:`pixelnerf_tpu.parallel`).

The compositing math matches nerf.py:163-249: deltas with far-boundary delta,
``alpha = 1 - exp(-delta * relu(sigma))``, exclusive transmittance cumprod with the
1e-10 guard, white-background completion.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from . import rays as ray_sampling

Array = jnp.ndarray

# model_fn(points (SB, P, 3), viewdirs (SB, P, 3) | None, coarse: bool)
#   -> (SB, 4, P) channel-major [r, g, b, sigma] planes
# (channel-major so each channel is a contiguous plane — column-slicing a
# point-major (P, 4) result costs a ~70 ms/M-point lane relayout on TPU;
# build it with PixelNeRFNet.query(..., planar_out=True))
ModelFn = Callable[..., Array]


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    n_coarse: int = 128
    n_fine: int = 0
    n_fine_depth: int = 0
    noise_std: float = 0.0
    depth_std: float = 0.01
    eval_batch_size: int = 100000
    white_bkgd: bool = False
    lindisp: bool = False
    sched: Optional[Tuple[Tuple[int, ...], ...]] = None
    # --- occupancy-grid pruning (render/accel.py; eval-only) ---
    # "rays": compact away rays whose every coarse sample lands in verified-
    #   empty space — compaction traffic at ray granularity (~B elements) is
    #   ~100x cheaper than per-sample gathers, and miss rays dominate object-
    #   centric renders.  "samples": per-sample compaction through the field
    #   (wins only when the live fraction is far below the ~40% break-even of
    #   the measured 25-40 ms/Mpt gather+scatter overhead; docs/PERFORMANCE.md).
    #   "proposal": ray compaction PLUS the coarse MLP pass is replaced by
    #   occupancy-grid lookups as the importance-sampling proposal — the fine
    #   union becomes accel_proposal_samples grid-guided draws +
    #   accel_depth_samples depth draws (the n_coarse probe z's are never
    #   MLP-evaluated), cutting field evals 5x vs dense at the 64/32/16
    #   default (dense: 64 coarse + a 96-sample fine union = 160 evals/ray;
    #   proposal: 24 + 8 = 32).
    #   The "coarse" head then holds the proposal
    #   (rgb = background, depth/weights from the grid mask), not a render —
    #   use the fine head (gen_video/eval default); eval --coarse must not use
    #   this mode.
    accel_mode: str = "rays"
    # "proposal" mode: stratified importance samples drawn from the grid
    # pdf in place of the coarse pass (the fine union is this +
    # accel_depth_samples depth draws).  Operating point from the bench-scene
    # sweeps (scripts/study_proposal.py): at alpha cap 0.25 PSNR-vs-dense
    # tracks this count alone (40 -> 38.2 dB, 32 -> 36.2, 24 -> 33.7,
    # 16 -> 31.0); sharpening the pdf to cap 0.15 buys the same quality at
    # 16 draws (33.6 dB, 717k rays/s vs 653k at 24/cap-0.25 — same protocol,
    # same scene).
    accel_proposal_samples: int = 16
    # fraction of the proposal pdf taken from the occupied-uniform mask (the
    # rest is the grid-sigma compositing weight) — a coverage hedge against
    # the dilated grid sigma over/under-shooting the field's true surface
    accel_proposal_uniform: float = 0.15
    # per-bin alpha ceiling in the grid-sigma pdf: the dilated grid's entry
    # sits 1-2 voxels BEFORE the field's true surface, and an uncapped opaque
    # voxel (alpha ~ 0.9) collapses the pdf's transmittance within ~3 bins of
    # that early entry — under-sampling the real surface behind it (measured
    # on the tests/test_accel.py sphere: 27.6 dB uncapped vs 47.2 dB at
    # cap 0.25, 24+8 proposal samples).  Capping at a spreads
    # the window over ~1/a bins while still suppressing occluded mass.
    # 0.15 measured equal quality to cap-0.25 with 2/3 the proposal draws
    # (study_proposal.py pdf-shape sweep).  <= 0 or >= 1 disables the cap.
    accel_proposal_alpha_cap: float = 0.15
    # number of stratified grid-probe z's per ray in proposal mode (liveness
    # test + pdf support); 0 = use n_coarse.  Probes are grid LOOKUPS, not
    # MLP evals, but random-access HBM gathers are the proposal path's
    # dominant non-MLP cost — swept at the 24+8 union (study_proposal.py):
    # 32 probes measured 545k rays/s at 35.0 dB vs 64's 405k at 33.7 and
    # 128's ~260k (quality UP with the coarser ladder: larger probe deltas
    # keep the capped-alpha pdf from collapsing into the dilated grid's
    # early-entry voxels).  Liveness stays conservative as long as the probe
    # step is below the dilated surface thickness (>= 3 grid cells).
    accel_probe_samples: int = 32
    # depth-centered draws in proposal mode ONLY (None = follow n_fine_depth;
    # conf value < 0 maps to None).  The sigma-pdf proposal already
    # concentrates draws at the surface, making the gaussian-around-depth
    # draws largely redundant there (measured on the bench scene: 16 -> 8 ->
    # 0 depth draws at fixed proposal count costs 0.0 dB vs dense;
    # scripts/study_proposal.py) — 8 keeps a depth-refinement channel for
    # real scenes at half the reference's 16.  The DENSE path keeps the
    # reference's n_fine_depth untouched.
    accel_depth_samples: Optional[int] = 8
    # static compaction capacities as a fraction of the chunk; chunks with
    # more live elements fall back to the dense path (lax.cond), so results
    # are never wrong, only occasionally unpruned
    accel_capacity_rays: float = 0.5
    accel_capacity: float = 0.5
    # separate capacity for the fine pass (importance samples concentrate on
    # surfaces, so its live fraction is higher); None = use accel_capacity
    accel_capacity_fine: Optional[float] = None
    # fine-pass transmittance floor: samples entered with coarse-estimated
    # T below this are occluded behind the surface and pruned
    accel_t_eps: float = 1e-4

    @property
    def using_fine(self) -> bool:
        return self.n_fine > 0

    @classmethod
    def from_conf(
        cls,
        conf,
        white_bkgd: bool = False,
        lindisp: bool = False,
        eval_batch_size: int = 100000,
    ) -> "RenderConfig":
        # reference nerf.py:340-352 (white_bkgd read as float there; bool here)
        sched = conf.get_list("sched", None)
        if sched is not None and len(sched) == 0:
            sched = None
        if sched is not None:
            sched = tuple(tuple(s) for s in sched)
        accel_mode = conf.get_string("accel_mode", "rays")
        if accel_mode not in ("rays", "proposal", "samples"):
            # fail at parse time: an unknown string would otherwise fall
            # through render_rays' mode dispatch into per-sample compaction
            # ("samples" semantics) — use gen_video --no_accel / the
            # PIXELNERF_ACCEL=0 env to disable pruning, not a conf value
            raise ValueError(
                f"renderer.accel_mode must be one of 'rays', 'proposal', "
                f"'samples' (got {accel_mode!r}); disable pruning with "
                f"--no_accel or PIXELNERF_ACCEL=0 instead"
            )
        return cls(
            n_coarse=conf.get_int("n_coarse", 128),
            n_fine=conf.get_int("n_fine", 0),
            n_fine_depth=conf.get_int("n_fine_depth", 0),
            noise_std=conf.get_float("noise_std", 0.0),
            depth_std=conf.get_float("depth_std", 0.01),
            white_bkgd=bool(conf.get_float("white_bkgd", white_bkgd)),
            lindisp=conf.get_bool("lindisp", lindisp),
            eval_batch_size=conf.get_int("eval_batch_size", eval_batch_size),
            sched=sched,
            accel_mode=accel_mode,
            accel_proposal_samples=conf.get_int("accel_proposal_samples", 16),
            accel_proposal_uniform=conf.get_float(
                "accel_proposal_uniform", 0.15
            ),
            accel_proposal_alpha_cap=conf.get_float(
                "accel_proposal_alpha_cap", 0.15
            ),
            accel_probe_samples=conf.get_int("accel_probe_samples", 32),
            accel_depth_samples=(
                None
                if conf.get_int("accel_depth_samples", 8) < 0
                else conf.get_int("accel_depth_samples", 8)
            ),
            accel_capacity_rays=conf.get_float("accel_capacity_rays", 0.5),
            accel_capacity=conf.get_float("accel_capacity", 0.5),
            accel_capacity_fine=(
                conf.get_float("accel_capacity_fine", 0.0) or None
            ),
            accel_t_eps=conf.get_float("accel_t_eps", 1e-4),
        )


def _eval_model_chunked(
    model_fn: ModelFn,
    points: Array,  # (SB, P, 3)
    viewdirs: Optional[Array],  # (SB, P, 3) | None
    coarse: bool,
    chunk: int,
) -> Array:
    """Evaluate the field at P points per scene object, bounding live memory by
    scanning over chunks of ``chunk`` points (lax.map == sequential scan, so only
    one chunk's activations are alive at a time)."""
    SB, P, _ = points.shape
    if chunk <= 0 or P <= chunk:
        return model_fn(points, viewdirs, coarse)
    n_chunks = -(-P // chunk)
    pad = n_chunks * chunk - P

    def pad_pts(x):
        return jnp.pad(x, ((0, 0), (0, pad), (0, 0))).reshape(
            SB, n_chunks, chunk, 3
        ).transpose(1, 0, 2, 3)  # (n_chunks, SB, chunk, 3)

    pts = pad_pts(points)
    if viewdirs is not None:
        dirs = pad_pts(viewdirs)
        out = jax.lax.map(
            lambda pd: model_fn(pd[0], pd[1], coarse), (pts, dirs)
        )
    else:
        out = jax.lax.map(lambda p: model_fn(p, None, coarse), pts)
    # (n_chunks, SB, 4, chunk) -> (SB, 4, P)
    out = out.transpose(1, 2, 0, 3).reshape(SB, 4, n_chunks * chunk)
    return out[..., :P]


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _eval_model_masked(
    model_fn: ModelFn,
    points: Array,  # (SB, P, 3)
    viewdirs: Optional[Array],  # (SB, P, 3) | None
    coarse: bool,
    mask: Array,  # (SB, P) bool — True = evaluate
    capacity: int,
) -> Array:
    """Evaluate the field only at masked points via fixed-capacity compaction.

    Live points are gathered into a ``capacity``-point buffer
    (``jnp.nonzero(size=...)`` with an out-of-bounds fill), so the positional
    code, projection, feature gather and MLP all run on ``capacity`` points
    instead of P; outputs scatter back (OOB indices dropped).  Pruned points
    read rgb = 0, sigma = 0 — exactly zero compositing weight.  If the chunk
    has more live points than capacity, ``lax.cond`` takes the dense path
    (never-wrong fallback; docs/PERFORMANCE.md).
    """
    SB, P, _ = points.shape
    assert SB == 1, "masked compaction assumes SB == 1 (eval path)"
    n_act = jnp.sum(mask.astype(jnp.int32))

    def compact(_):
        idx = jnp.nonzero(mask[0], size=capacity, fill_value=P)[0]
        pts = jnp.take(points[0], idx, axis=0, mode="clip")[None]
        dirs = (
            jnp.take(viewdirs[0], idx, axis=0, mode="clip")[None]
            if viewdirs is not None
            else None
        )
        out = model_fn(pts, dirs, coarse)  # (1, 4, capacity)
        full = jnp.zeros((4, P), out.dtype)
        # single advanced index keeps its axis position: value shape (4, cap).
        # nonzero's output is strictly increasing and unique — the hints let
        # XLA lower the scatter without the general serialized path
        return full.at[:, idx].set(
            out[0], mode="drop", unique_indices=True, indices_are_sorted=True
        )[None]

    def dense(_):
        return model_fn(points, viewdirs, coarse)

    return jax.lax.cond(n_act <= capacity, compact, dense, None)


@jax.named_scope("renderer_composite")  # nerf.py:175 cut point
def composite(
    model_fn: ModelFn,
    rays: Array,  # (SB, B, 8)
    z_samp: Array,  # (SB, B, K)
    cfg: RenderConfig,
    coarse: bool,
    rng: Optional[Array] = None,
    training: bool = False,
    use_viewdirs: bool = True,
    point_mask: Optional[Array] = None,  # (SB, B, K) bool
    noise_scale: Optional[Array] = None,  # dynamic sigma-noise multiplier
) -> Tuple[Array, Array, Array]:
    """Alpha-composite rgb/sigma along rays (reference nerf.py:163-249).

    :param point_mask: optional live-sample mask (occupancy/transmittance
        pruning, render/accel.py) — masked-out samples contribute zero weight
    :return: (weights (SB, B, K), rgb (SB, B, 3), depth (SB, B))
    """
    SB, B, K = z_samp.shape

    deltas = z_samp[..., 1:] - z_samp[..., :-1]  # (SB, B, K-1)
    delta_inf = rays[..., -1:] - z_samp[..., -1:]
    deltas = jnp.concatenate([deltas, delta_inf], axis=-1)  # (SB, B, K)

    points = (
        rays[..., None, :3] + z_samp[..., None] * rays[..., None, 3:6]
    )  # (SB, B, K, 3)
    points = points.reshape(SB, B * K, 3)

    viewdirs = None
    if use_viewdirs:
        viewdirs = jnp.broadcast_to(
            rays[..., None, 3:6], (SB, B, K, 3)
        ).reshape(SB, B * K, 3)

    if point_mask is not None and SB == 1 and not training:
        cap_frac = (
            cfg.accel_capacity
            if coarse
            else (cfg.accel_capacity_fine or cfg.accel_capacity)
        )
        capacity = max(_round_up(int(cap_frac * B * K), 512), 512)
        out = _eval_model_masked(
            model_fn,
            points,
            viewdirs,
            coarse,
            point_mask.reshape(SB, B * K),
            capacity,
        )
    else:
        chunk = cfg.eval_batch_size if not training else 0
        out = _eval_model_chunked(model_fn, points, viewdirs, coarse, chunk)
    out = out.reshape(SB, 4, B, K)  # channel-major planes

    rgbs = out[:, :3]  # (SB, 3, B, K)
    sigmas = out[:, 3]  # (SB, B, K)
    if training and cfg.noise_std > 0.0 and rng is not None:
        noise = jax.random.normal(rng, sigmas.shape) * cfg.noise_std
        if noise_scale is not None:
            # dynamic anneal multiplier (no recompile per schedule stage)
            noise = noise * noise_scale
        sigmas = sigmas + noise

    alphas = 1.0 - jnp.exp(-deltas * jax.nn.relu(sigmas))  # (SB, B, K)
    alphas_shifted = jnp.concatenate(
        [jnp.ones_like(alphas[..., :1]), 1.0 - alphas + 1e-10], axis=-1
    )  # (SB, B, K+1)
    T = jnp.cumprod(alphas_shifted, axis=-1)
    weights = alphas * T[..., :-1]  # (SB, B, K)

    # every reduction runs over K in the lane dim of a (B, K) plane — no
    # 3-wide minor dims anywhere
    rgb_final = jnp.sum(weights[:, None] * rgbs, axis=-1)  # (SB, 3, B)
    rgb_final = jnp.swapaxes(rgb_final, 1, 2)  # (SB, B, 3) — small
    depth_final = jnp.sum(weights * z_samp, axis=-1)  # (SB, B)
    if cfg.white_bkgd:
        pix_alpha = jnp.sum(weights, axis=-1)
        rgb_final = rgb_final + (1.0 - pix_alpha[..., None])
    return weights, rgb_final, depth_final


def _sample_points(rays: Array, z_samp: Array) -> Array:
    """(SB, B, K, 3) world points at the sample depths."""
    return rays[..., None, :3] + z_samp[..., None] * rays[..., None, 3:6]


@jax.named_scope("renderer_ray_compaction")
def _render_rays_ray_compacted(
    model_fn: ModelFn,
    rays: Array,  # (1, B, 8)
    rng: Array,
    cfg: RenderConfig,
    want_weights: bool,
    use_viewdirs: bool,
    accel,
    proposal: bool = False,
) -> Dict[str, Any]:
    """Ray-level occupancy pruning: rays whose EVERY coarse sample lands in
    verified-empty space render to pure background without touching the field.

    Live rays are compacted into a ``cfg.accel_capacity_rays``-sized buffer,
    rendered by the dense path, and scattered back (background fill for the
    pruned rays).  Compaction traffic is at ray granularity — per-SAMPLE
    gathers measured 25-40 ms/Mpt on this part (docs/PERFORMANCE.md), which
    eats the pruning win; per-ray gathers are ~K times smaller.  A chunk with
    more live rays than capacity renders dense via ``lax.cond`` (never wrong,
    only unpruned).  The reference has no equivalent (nerf.py:163-249).

    With ``proposal`` the inner render additionally replaces the coarse MLP
    pass by grid-lookup importance sampling (accel_mode="proposal" —
    see :func:`render_rays`); both cond branches use the same proposal
    sampling and the same empty-ray depth convention (0.0).
    """
    from .accel import probe_lookup

    _, B, _ = rays.shape
    capacity = min(max(_round_up(int(cfg.accel_capacity_rays * B), 256), 256), B)

    inner_accel = accel if proposal else None
    if capacity >= B:
        return render_rays(
            model_fn, rays, rng, cfg,
            want_weights=want_weights, use_viewdirs=use_viewdirs,
            accel=inner_accel, proposal=proposal,
        )

    # draw the coarse z with the SAME key the dense path would (split below
    # mirrors render_rays), probe occupancy at the actual sample points, and
    # hand the draw back in — the dense fallback branch is then bit-identical
    # to a plain dense render, and kept rays keep their exact coarse z
    # samples.  The compacted branch's FINE importance/depth draws use
    # capacity-shaped RNG streams (vs B-shaped dense), so kept rays' fine
    # output is stochastically equivalent, not bit-equal, to a dense render
    # (tests/test_accel.py asserts >= 40 dB agreement)
    rng_c = jax.random.split(rng, 5)[0]
    flat = rays[0]
    # proposal mode may probe a finer z ladder than n_coarse (grid lookups
    # are ~free); the "rays" parity path keeps the exact dense coarse draw
    n_draw = (
        (cfg.accel_probe_samples or cfg.n_coarse)
        if proposal
        else cfg.n_coarse
    )
    z_full = ray_sampling.sample_coarse(
        flat, n_draw, rng_c, lindisp=cfg.lindisp
    )
    # ONE fused grid gather serves the liveness test AND (compacted /
    # forwarded per-ray) the inner proposal pdf — random-access HBM gathers
    # are the proposal path's dominant non-MLP cost
    mask_full, sig_full = probe_lookup(
        accel, _sample_points(rays, z_full[None])
    )
    live = jnp.any(mask_full, axis=-1)[0]
    n_live = jnp.sum(live.astype(jnp.int32))

    bg = 1.0 if cfg.white_bkgd else 0.0
    fills = {"rgb": bg, "depth": 0.0, "weights": 0.0}

    def dense(_):
        return render_rays(
            model_fn, rays, rng, cfg,
            want_weights=want_weights, use_viewdirs=use_viewdirs,
            accel=inner_accel, proposal=proposal,
            z_coarse=z_full[None],
            probe_mask=mask_full if proposal else None,
            probe_sig=sig_full if proposal else None,
        )

    def compacted(_):
        idx = jnp.nonzero(live, size=capacity, fill_value=B)[0]
        crays = jnp.take(flat, idx, axis=0, mode="clip")[None]
        cz = jnp.take(z_full, idx, axis=0, mode="clip")[None]
        cmask = csig = None
        if proposal:
            cmask = jnp.take(mask_full[0], idx, axis=0, mode="clip")[None]
            if sig_full is not None:
                csig = jnp.take(sig_full[0], idx, axis=0, mode="clip")[None]
        out = render_rays(
            model_fn, crays, rng, cfg,
            want_weights=want_weights, use_viewdirs=use_viewdirs,
            accel=inner_accel, proposal=proposal,
            z_coarse=cz, probe_mask=cmask, probe_sig=csig,
        )

        def scatter(head):
            return {
                k: jnp.full((1, B) + v.shape[2:], fills[k], v.dtype)
                .at[0, idx]
                .set(
                    v[0],
                    mode="drop",
                    unique_indices=True,
                    indices_are_sorted=True,
                )
                for k, v in head.items()
            }

        return {k: scatter(v) for k, v in out.items()}

    return jax.lax.cond(n_live <= capacity, compacted, dense, None)


@jax.named_scope("renderer_forward")  # nerf.py:264 cut point
def render_rays(
    model_fn: ModelFn,
    rays: Array,  # (SB, B, 8)
    rng: Array,
    cfg: RenderConfig,
    want_weights: bool = False,
    training: bool = False,
    use_viewdirs: bool = True,
    accel=None,  # Optional[accel.OccupancyGrid] — eval-only sample pruning
    z_coarse: Optional[Array] = None,  # (SB, B, Kc) precomputed coarse draw
    noise_scale: Optional[Array] = None,  # dynamic sigma-noise multiplier
    proposal: bool = False,  # internal: grid-proposal coarse (accel_mode="proposal")
    probe_mask: Optional[Array] = None,  # (SB, B, Kc) forwarded probe mask
    probe_sig: Optional[Array] = None,  # (SB, B, Kc) forwarded probe sigma
) -> Dict[str, Any]:
    """Full coarse+fine render (reference nerf.py:251-303).

    :param accel: optional per-scene occupancy grid (render/accel.py): whole
        rays through verified-empty space (accel_mode="rays"/"proposal"), or
        individual samples in empty space / behind an opaque surface
        ("samples"), are pruned before the field MLP (the reference has no
        equivalent — it evaluates everything, nerf.py:163-249).  Under
        "proposal" the coarse MLP pass itself is replaced by grid lookups
        (see RenderConfig.accel_mode).
    :return: {"coarse": {rgb, depth[, weights]}, "fine": {...}} ("fine" present
        only when cfg.using_fine)
    """
    assert rays.ndim == 3
    SB, B, _ = rays.shape
    use_accel = accel is not None and not training and SB == 1
    if use_accel and not proposal and cfg.accel_mode in ("rays", "proposal"):
        return _render_rays_ray_compacted(
            model_fn, rays, rng, cfg, want_weights, use_viewdirs, accel,
            proposal=cfg.accel_mode == "proposal" and cfg.using_fine,
        )
    samples_mode = use_accel and not proposal  # accel_mode == "samples"

    rng_c, rng_noise_c, rng_f, rng_fd, rng_noise_f = jax.random.split(rng, 5)
    flat_rays = rays.reshape(SB * B, 8)

    if z_coarse is None:
        n_draw = (
            (cfg.accel_probe_samples or cfg.n_coarse)
            if proposal
            else cfg.n_coarse
        )
        z_coarse = ray_sampling.sample_coarse(
            flat_rays, n_draw, rng_c, lindisp=cfg.lindisp
        ).reshape(SB, B, n_draw)

    if proposal:
        # grid-proposal coarse: no MLP — grid lookups at the stratified probe
        # z's form the importance pdf, their weighted mean the depth estimate,
        # and the "coarse" head reports the proposal (rgb = background)
        # rather than a render.  With a sigma-carrying grid (accel.sig) the
        # pdf is the full compositing weight alpha*T of the GRID density —
        # samples concentrate at the (dilated) surface and occluded bins get
        # ~zero mass — mixed with accel_proposal_uniform of the binary-mask
        # pdf as a coverage hedge (the grid sigma is a blurred max, not the
        # field).  Grids without sig keep the plain mask pdf.
        from .accel import probe_lookup

        if probe_mask is None:
            # one fused gather (mask + sigma); the ray-compacted caller
            # forwards its probe results instead, skipping the gather here
            probe_mask, probe_sig = probe_lookup(
                accel, _sample_points(rays, z_coarse)
            )
        wmask = probe_mask.astype(jnp.float32)  # (SB, B, Kc)
        msum = jnp.sum(wmask, axis=-1)  # (SB, B)
        if probe_sig is not None:
            # gate by the liveness mask: sub-threshold sigma must contribute
            # ZERO weight, or a ray the compaction branch prunes (and scatter-
            # fills with depth 0.0) would read a nonzero depth on the dense
            # fallback branch
            sig = probe_sig * wmask  # (SB, B, Kc)
            deltas = jnp.concatenate(
                [
                    z_coarse[..., 1:] - z_coarse[..., :-1],
                    rays[..., -1:] - z_coarse[..., -1:],
                ],
                axis=-1,
            )
            alpha = 1.0 - jnp.exp(-deltas * sig)
            if 0.0 < cfg.accel_proposal_alpha_cap < 1.0:
                alpha = jnp.minimum(alpha, cfg.accel_proposal_alpha_cap)
            ashift = jnp.concatenate(
                [jnp.ones_like(alpha[..., :1]), 1.0 - alpha + 1e-10], axis=-1
            )
            w = alpha * jnp.cumprod(ashift, axis=-1)[..., :-1]
            wsum = jnp.sum(w, axis=-1)
            u = cfg.accel_proposal_uniform
            weights_c = (1.0 - u) * w / jnp.maximum(wsum, 1e-9)[
                ..., None
            ] + u * wmask / jnp.maximum(msum, 1.0)[..., None]
            depth_src, dsum = w, wsum
        else:
            weights_c = wmask / jnp.maximum(msum, 1.0)[..., None]
            depth_src, dsum = wmask, msum
        # fully-empty rays report depth 0.0 — matching both a dense composite
        # of an empty ray (weights ~ 0 => depth ~ 0) and the scatter fill of
        # the ray-compacted branch, so the proposal depth estimate is
        # identical whichever lax.cond branch the chunk takes
        depth_c = jnp.where(
            dsum > 0.0,
            jnp.sum(depth_src * z_coarse, axis=-1) / jnp.maximum(dsum, 1e-9),
            0.0,
        )
        bg = 1.0 if cfg.white_bkgd else 0.0
        rgb_c = jnp.full((SB, B, 3), bg, jnp.float32)
    else:
        mask_c = None
        if samples_mode:
            from .accel import occupancy_lookup

            mask_c = occupancy_lookup(accel, _sample_points(rays, z_coarse))

        weights_c, rgb_c, depth_c = composite(
            model_fn,
            rays,
            z_coarse,
            cfg,
            coarse=True,
            rng=rng_noise_c,
            training=training,
            use_viewdirs=use_viewdirs,
            point_mask=mask_c,
            noise_scale=noise_scale,
        )

    def pack(weights, rgb, depth):
        out = {"rgb": rgb, "depth": depth}
        if want_weights:
            out["weights"] = weights
        return out

    outputs = {"coarse": pack(weights_c, rgb_c, depth_c)}

    if cfg.using_fine:
        # proposal mode: the fine union drops the n_coarse probe z's (never
        # MLP-evaluated) and instead draws accel_proposal_samples from the
        # grid-mask pdf — total union accel_proposal_samples + depth draws
        # (accel_depth_samples, default n_fine_depth) instead of
        # n_coarse + n_fine
        all_samps = [] if proposal else [z_coarse]
        n_importance = (
            cfg.accel_proposal_samples
            if proposal
            else cfg.n_fine - cfg.n_fine_depth
        )
        n_depth = (
            cfg.accel_depth_samples
            if proposal and cfg.accel_depth_samples is not None
            else cfg.n_fine_depth
        )
        if n_importance > 0:
            Kc = z_coarse.shape[-1]  # == n_coarse unless proposal probes
            z_fine = ray_sampling.sample_fine(
                flat_rays,
                weights_c.reshape(SB * B, Kc),
                n_importance,
                Kc,
                rng_f,
                lindisp=cfg.lindisp,
                # proposal draws are stratified (low-discrepancy): a binary
                # mask pdf clumps iid draws, stratified u covers the occupied
                # support evenly at the same count.  The parity path keeps
                # the reference's iid draw (nerf.py:133).
                stratified=proposal,
            ).reshape(SB, B, -1)
            all_samps.append(z_fine)
        if n_depth > 0:
            z_depth = ray_sampling.sample_fine_depth(
                flat_rays,
                jax.lax.stop_gradient(depth_c).reshape(SB * B),
                n_depth,
                cfg.depth_std,
                rng_fd,
            ).reshape(SB, B, n_depth)
            all_samps.append(z_depth)
        z_combine = jnp.sort(jnp.concatenate(all_samps, axis=-1), axis=-1)

        mask_f = None
        if samples_mode:
            from .accel import occupancy_lookup

            # (a) empty-space test per sample
            mask_f = occupancy_lookup(accel, _sample_points(rays, z_combine))
            # (b) occlusion test: coarse-estimated transmittance at the bin
            # each union sample falls in.  T after coarse bin k is exactly
            # 1 - sum_{j<=k} w_j (the cumprod telescopes); a union sample in
            # bin k enters with T_entry = 1 - cumsum(w)[k-1] >= its true T,
            # so pruning at T_entry < eps is conservative.
            t_after = 1.0 - jnp.cumsum(weights_c, axis=-1)  # (SB, B, Kc)
            t_entry = jnp.concatenate(
                [jnp.ones_like(t_after[..., :1]), t_after[..., :-1]], axis=-1
            )
            # bin index: count of coarse z at or below each union z, minus 1
            # (dense compare-and-sum — same trick as sample_fine)
            binm1 = jnp.sum(
                (z_coarse[..., None, :] <= z_combine[..., :, None]).astype(
                    jnp.int32
                ),
                axis=-1,
            )  # (SB, B, Kf) in [0, Kc]
            bin_idx = jnp.clip(binm1 - 1, 0, cfg.n_coarse - 1)
            t_at = jnp.take_along_axis(t_entry, bin_idx, axis=-1)
            mask_f = mask_f & (t_at > cfg.accel_t_eps)

        weights_f, rgb_f, depth_f = composite(
            model_fn,
            rays,
            z_combine,
            cfg,
            coarse=False,
            rng=rng_noise_f,
            training=training,
            use_viewdirs=use_viewdirs,
            point_mask=mask_f,
            noise_scale=noise_scale,
        )
        outputs["fine"] = pack(weights_f, rgb_f, depth_f)

    return outputs


class NeRFRenderer:
    """Host-side renderer wrapper carrying the sample-count schedule state
    (the reference's iter_idx/last_sched persistent buffers, nerf.py:91-96)."""

    def __init__(self, cfg: RenderConfig):
        self.base_cfg = cfg
        self.n_coarse = cfg.n_coarse
        self.n_fine = cfg.n_fine
        self.iter_idx = 0
        self.last_sched = 0

    @classmethod
    def from_conf(cls, conf, **kwargs) -> "NeRFRenderer":
        return cls(RenderConfig.from_conf(conf, **kwargs))

    @property
    def cfg(self) -> RenderConfig:
        return dataclasses.replace(
            self.base_cfg, n_coarse=self.n_coarse, n_fine=self.n_fine
        )

    @property
    def using_fine(self) -> bool:
        return self.n_fine > 0

    def sched_step(self, steps: int = 1) -> None:
        """Advance the sampling schedule (reference nerf.py:318-338)."""
        sched = self.base_cfg.sched
        if sched is None:
            return
        self.iter_idx += steps
        while (
            self.last_sched < len(sched[0])
            and self.iter_idx >= sched[0][self.last_sched]
        ):
            self.n_coarse = sched[1][self.last_sched]
            self.n_fine = sched[2][self.last_sched]
            print(
                "INFO: NeRF sampling resolution changed on schedule ==> c",
                self.n_coarse,
                "f",
                self.n_fine,
            )
            self.last_sched += 1

    def state_dict(self) -> dict:
        return {
            "iter_idx": self.iter_idx,
            "last_sched": self.last_sched,
            "n_coarse": self.n_coarse,
            "n_fine": self.n_fine,
        }

    def load_state_dict(self, state: dict) -> None:
        self.iter_idx = int(state["iter_idx"])
        self.last_sched = int(state["last_sched"])
        self.n_coarse = int(state.get("n_coarse", self.n_coarse))
        self.n_fine = int(state.get("n_fine", self.n_fine))
