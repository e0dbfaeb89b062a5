"""RenderPipeline — the TPU replacement for renderer.bind_parallel.

The reference wraps (net, renderer) in a module and scatters each ray chunk across
GPUs with torch DataParallel on dim 1 (nerf.py:354-371): replicate module, split
rays, gather outputs on GPU0, every call.  Two TPU-first changes:

1. **One dispatch, device-side loop.**  Host-side per-chunk dispatch pays the
   host->device round-trip per chunk (measured 24.7k rays/s on a v5e); instead the
   whole ray batch is rendered by a single jitted program that ``lax.map``s over
   fixed-size ray chunks on device (53k rays/s — 2.1x).  Chunking bounds live
   activations exactly like the reference's -R / eval_batch_size two-level scheme
   (SURVEY §5.7) but without leaving the chip.
2. **SPMD sharding.**  With a mesh, the ray axis of every chunk is sharded via
   ``NamedSharding`` (latents replicated once over ICI; zero communication in the
   loop), replacing DataParallel's per-call scatter/gather.

Rays are padded to a whole number of chunks so each distinct (n_chunks, chunk)
pair compiles exactly once.  A ``max_rays_per_dispatch`` guard falls back to a
host loop only for gigantic batches (bounds output-buffer memory).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.pixelnerf import EncodedScene, PixelNeRFNet
from ..render.renderer import NeRFRenderer, RenderConfig, render_rays

Array = jnp.ndarray


def unpack_simple(pieces):
    """Fetch packed render_simple pieces -> (rgb (NR, 3), depth (NR,)) float32.

    Handles both wire formats: (NR, 4) f32 [rgb|depth] and the (NR, 5) uint8
    video-frame format [rgb u8 | depth f16 as 2 u8 lanes]."""
    packed = np.concatenate(
        [np.asarray(out)[:true_n] for out, true_n in pieces], axis=0
    )
    if packed.dtype == np.uint8:
        rgb = packed[:, :3].astype(np.float32) / 255.0
        depth = (
            np.ascontiguousarray(packed[:, 3:5])
            .view(np.float16)[:, 0]
            .astype(np.float32)
        )
        return rgb, depth
    return packed[:, :3], packed[:, 3]


def _live_point_evals(cfg, chunk: int, cap_r: float, cap_c: float,
                      cap_f: Optional[float]) -> float:
    """Estimated live field-MLP point evals per device chunk under pruning.

    Per-ray eval counts follow render_rays' mode dispatch (renderer.py):
    "proposal" (with a fine pass) replaces the coarse MLP by grid lookups, so
    only the accel_proposal_samples + n_fine_depth union is evaluated, on the
    cap_r-compacted ray buffer; "rays" (and proposal without a fine pass,
    which falls back to rays semantics) evaluates the full dense ladder on
    compacted rays; "samples" compacts per sample at cap_c/cap_f.
    """
    # the dense fine union re-evaluates the coarse z's plus n_fine draws
    # (n_fine INCLUDES the depth-centered draws: n_importance = n_fine -
    # n_fine_depth, renderer.py); proposal's union replaces all of that with
    # accel_proposal_samples grid draws + n_fine_depth depth draws
    union = cfg.n_coarse + cfg.n_fine
    if cfg.accel_mode == "samples":
        per = cfg.n_coarse * cap_c
        if cfg.using_fine:
            per += union * (cap_f if cap_f is not None else cap_c)
        return chunk * per
    if cfg.accel_mode == "proposal" and cfg.using_fine:
        n_depth = (
            cfg.accel_depth_samples
            if cfg.accel_depth_samples is not None
            else cfg.n_fine_depth
        )
        per = cfg.accel_proposal_samples + n_depth
    else:
        per = cfg.n_coarse + (union if cfg.using_fine else 0)
    return chunk * cap_r * per


@functools.partial(jax.jit, static_argnums=(3, 4))
def _capacity_probe(grid, rays, key, kc: int, n_draws: int):
    """Liveness of ``rays`` against ``grid`` under ``n_draws`` z ladders —
    draw 0 probes bin midpoints, draws 1.. probe stratified z's (the
    render's sample_coarse distribution; the caller passes a fixed key so
    the measured capacity, and therefore the compiled render shape, is
    stable across runs).

    Runs entirely on device from the (n, 8) ray array: building the
    (D, n, kc, 3) point cloud host-side cost ~100 MB of single-core numpy
    + H2D per 65536-ray chunk (measured: capacity probe 2.2 s -> 9-40 s
    when the jitter draws landed host-side); here it is a 2 MB ray upload
    and a (D, n) bool fetch.  Module-level + grid-as-argument so the
    compiled program is reused across grid builds (eval --accel rebuilds
    per object).

    :return: (ray_live (D, n) bool — any probe sample occupied,
              samp_live (D,) float32 — total live samples per draw)
    """
    from ..render.accel import occupancy_lookup

    n = rays.shape[0]
    base = (jnp.arange(kc, dtype=jnp.float32) / kc)[None, None]
    u = jnp.concatenate(
        [
            jnp.full((1, n, kc), 0.5, jnp.float32),
            jax.random.uniform(key, (n_draws - 1, n, kc)),
        ]
    )
    t = base + u / kc  # (D, n, kc)
    z = rays[None, :, 6:7] + t * (rays[None, :, 7:8] - rays[None, :, 6:7])
    pts = rays[None, :, None, :3] + z[..., None] * rays[None, :, None, 3:6]
    live = occupancy_lookup(grid, pts)
    return live.any(axis=-1), live.sum(axis=(1, 2), dtype=jnp.float32)


class RenderPipeline:
    # Live-point budget for auto-sizing the device ray chunk under pruning
    # (class attributes so capacity tests constructing via ``__new__``
    # inherit them).  Measured on a v5e (scripts/study_chunk.py): proposal
    # throughput climbs with the chunk — 252k rays/s at 8192 vs 328k at
    # 65536 (fewer lax.map steps amortize the per-chunk compaction
    # gather/scatter and sampling sort) — while the dense path is flat at
    # 16384/32768 (compute-bound) and its compile time triples by 32768.
    # The budget caps live activations: proposal at cap 0.5625 x 32
    # evals/ray stays ~1.2M points even at 65536; dense 32768 would be 5.8M.
    point_budget: int = 3_000_000
    accel_chunk_max: int = 65536
    accel_chunk: Optional[int] = None  # set by _autoselect_capacity

    def __init__(
        self,
        net: PixelNeRFNet,
        renderer: NeRFRenderer,
        mesh: Optional[Mesh] = None,
        simple_output: bool = False,
        device_chunk: int = 8192,
        max_rays_per_dispatch: int = 2_097_152,
        compute_dtype=None,
    ):
        """:param device_chunk: rays per lax.map step (bounds activation memory;
        8192 rays x 112 samples x 512ch fits v5e HBM comfortably)
        :param compute_dtype: optional jnp.bfloat16 to run the field in bf16
        """
        self.net = net
        self.renderer = renderer
        self.mesh = mesh
        self.simple_output = simple_output
        self.device_chunk = device_chunk
        self.max_rays_per_dispatch = max_rays_per_dispatch
        self.compute_dtype = compute_dtype
        self.accel = None  # per-scene OccupancyGrid (see build_accel)
        self.accel_chunk = None
        self._use_viewdirs = None
        self._jitted: Dict[Any, Any] = {}

    @property
    def n_devices(self) -> int:
        return 1 if self.mesh is None else int(np.prod(self.mesh.devices.shape))

    @property
    def use_viewdirs(self) -> bool:
        if self._use_viewdirs is None:
            self._use_viewdirs = self.net.conf.get_bool("use_viewdirs", False)
        return self._use_viewdirs

    def _pallas_mlp(self) -> bool:
        impl = getattr(self.net, "mlp_impl", "xla")
        if impl == "pallas":
            return True
        return impl == "auto" and jax.default_backend() == "tpu"

    def _maybe_cast(self, tree):
        if self.compute_dtype is None:
            return tree
        dt = self.compute_dtype
        return jax.tree.map(
            lambda x: x.astype(dt)
            if hasattr(x, "dtype") and x.dtype == jnp.float32
            else x,
            tree,
        )

    def _field_closure(self, variables, scene: EncodedScene):
        """The renderer's model_fn contract over this net/scene (shared by the
        render programs and the occupancy-grid builder)."""
        net = self.net
        use_viewdirs = self.use_viewdirs

        def field(points, viewdirs, coarse):
            if self.compute_dtype is not None:
                points = points.astype(self.compute_dtype)
                if viewdirs is not None:
                    viewdirs = viewdirs.astype(self.compute_dtype)
            out = net.apply(
                variables,
                scene,
                points,
                viewdirs=viewdirs if use_viewdirs else None,
                coarse=coarse,
                planar_out=True,
                method=PixelNeRFNet.query,
            )
            return out.astype(jnp.float32)

        return field

    def _get_render_fn(
        self,
        cfg: RenderConfig,
        want_weights: bool,
        n_chunks: int,
        chunk: int,
        packed=False,  # False | "f32" | "u8" (video-frame wire format)
    ):
        import dataclasses

        # ray chunking already bounds memory; disable the renderer's inner
        # point-chunking (it would serialize the MXU work pointlessly)
        cfg = dataclasses.replace(cfg, eval_batch_size=0)
        key = (cfg, want_weights, n_chunks, chunk, packed)
        if key in self._jitted:
            return self._jitted[key]

        use_viewdirs = self.use_viewdirs

        def fn(variables, scene: EncodedScene, rays: Array, rng: Array, accel):
            field = self._field_closure(variables, scene)

            rc = rays.reshape(n_chunks, chunk, 8)

            def one(args):
                i, r = args
                out = render_rays(
                    field,
                    r[None],
                    jax.random.fold_in(rng, i),
                    cfg,
                    want_weights=want_weights,
                    training=False,
                    use_viewdirs=use_viewdirs,
                    accel=accel,
                )
                if packed:
                    # single packed leaf: ONE host fetch per dispatch instead
                    # of four (the reference's simple_output contract,
                    # nerf.py:32-39) — the tunnel D2H fixed cost (~40 ms/fetch)
                    # otherwise dominates video generation
                    branch = out["fine"] if cfg.using_fine else out["coarse"]
                    if packed == "u8":
                        # video-frame wire format: rgb quantized to uint8 (the
                        # video writer quantizes identically, so the written
                        # frames are bit-equal) + depth as f16 bitcast into 2
                        # uint8 lanes -> (chunk, 5) u8, 16 -> 5 bytes/ray over
                        # the D2H link (measured fetch-bound; PERFORMANCE.md)
                        rgb_u8 = jnp.round(
                            jnp.clip(branch["rgb"], 0.0, 1.0) * 255.0
                        ).astype(jnp.uint8)
                        d_u8 = jax.lax.bitcast_convert_type(
                            branch["depth"].astype(jnp.float16), jnp.uint8
                        )
                        out = jnp.concatenate([rgb_u8, d_u8], axis=-1)
                    else:
                        out = jnp.concatenate(
                            [branch["rgb"], branch["depth"][..., None]],
                            axis=-1,
                        )
                return out

            if n_chunks == 1:
                out = one((jnp.zeros((), jnp.uint32), rc[0]))
                return jax.tree.map(lambda x: x[0], out)
            out = jax.lax.map(one, (jnp.arange(n_chunks, dtype=jnp.uint32), rc))
            # leaves: (n_chunks, 1, chunk, ...) -> (n_chunks*chunk, ...)
            return jax.tree.map(
                lambda x: x.reshape((n_chunks * chunk,) + x.shape[3:]), out
            )

        if self.mesh is not None and self.n_devices > 1:
            ray_axis = self.mesh.axis_names[-1]
            repl = NamedSharding(self.mesh, P())
            rays_sh = NamedSharding(self.mesh, P(ray_axis))
            jitted = jax.jit(
                fn, in_shardings=(repl, repl, rays_sh, repl, repl)
            )
        else:
            jitted = jax.jit(fn)
        self._jitted[key] = jitted
        return jitted

    def _dispatch(
        self,
        variables,
        scene: EncodedScene,
        rays: np.ndarray,
        rng: Array,
        ray_batch_size: int,
        want_weights: bool,
        packed,  # False | "f32" | "u8"
    ):
        """Launch device programs over the ray batch; yield (device_out, true_n)."""
        cfg = self.renderer.cfg
        NR = rays.shape[0]
        # under active pruning, _autoselect_capacity may have chosen a larger
        # device chunk (fewer lax.map steps; the point budget bounds live
        # work) — dense renders keep the conservative device_chunk
        dc = self.device_chunk
        if self.accel is not None and self.accel_chunk:
            dc = max(dc, self.accel_chunk)
        chunk = min(dc, ray_batch_size, NR)
        chunk = max(-(-chunk // self.n_devices) * self.n_devices, self.n_devices)

        variables = self._maybe_cast(variables) if self.compute_dtype else variables
        scene = self._maybe_cast(scene) if self.compute_dtype else scene
        if self.compute_dtype is None and self._pallas_mlp():
            # the fused kernel consumes bf16 latents anyway — storing the feature
            # maps in bf16 halves the gather read AND the sampled-latent write
            # traffic without changing the kernel's numerics contract
            scene = scene.replace(
                latents=jax.tree.map(
                    lambda x: x.astype(jnp.bfloat16), scene.latents
                )
            )

        for start in range(0, NR, self.max_rays_per_dispatch):
            part = rays[start : start + self.max_rays_per_dispatch]
            n_chunks = -(-part.shape[0] // chunk)
            pad = n_chunks * chunk - part.shape[0]
            if pad > 0:
                # callers may pass device-committed rays (upload once, reuse
                # across passes); padding works on host numpy either way
                part = np.asarray(part)
                part = np.concatenate(
                    [part, np.tile(part[-1:], (pad, 1))], axis=0
                )
            fn = self._get_render_fn(cfg, want_weights, n_chunks, chunk, packed)
            rng, step_rng = jax.random.split(rng)
            out = fn(variables, scene, jnp.asarray(part), step_rng, self.accel)
            yield out, min(NR - start, self.max_rays_per_dispatch)

    def build_accel(
        self,
        variables,
        scene: EncodedScene,
        rays: np.ndarray,
        resolution: int = 96,
        eps_alpha: float = 1e-3,
        dilate: int = 1,
        n_dir_probes: int = 4,
        ray_batch_size: Optional[int] = None,
    ):
        """Build a per-scene occupancy grid over the AABB of ``rays`` and
        enable sample pruning for subsequent renders (render/accel.py).

        Call after ``encode`` with the union of all rays that will be rendered
        (e.g. every video frame) — one grid amortizes over the whole render.
        ``PIXELNERF_ACCEL=0`` disables.  Returns the grid (or None).

        :param ray_batch_size: the ``-R`` value later renders will pass, so
            capacity windows match the effective render chunk
            (``min(device_chunk, ray_batch_size)``) even when ``-R`` is
            smaller than ``device_chunk``.
        """
        import os
        import sys
        import time

        from ..render.accel import aabb_from_rays, build_occupancy_grid

        if os.environ.get("PIXELNERF_ACCEL", "1") == "0":
            self.accel = None
            self.accel_chunk = None
            return None
        rays_np = np.asarray(rays, np.float32).reshape(-1, 8)
        lo, hi = aabb_from_rays(rays_np)
        # conservative alpha threshold at the coarse step size
        delta = float(np.mean(rays_np[:, 7] - rays_np[:, 6])) / max(
            self.renderer.cfg.n_coarse, 1
        )
        use_viewdirs = self.use_viewdirs
        use_fine = self.renderer.using_fine
        key = ("accel", resolution, dilate, n_dir_probes, use_fine)
        if key not in self._jitted:

            def build(variables, scene, lo, hi, sigma_thresh):
                field = self._field_closure(variables, scene)
                return build_occupancy_grid(
                    field,
                    lo,
                    hi,
                    resolution=resolution,
                    sigma_thresh=sigma_thresh,
                    dilate=dilate,
                    n_dir_probes=n_dir_probes,
                    use_fine=use_fine,
                    use_viewdirs=use_viewdirs,
                )

            self._jitted[key] = jax.jit(build)
        variables = self._maybe_cast(variables) if self.compute_dtype else variables
        scene = self._maybe_cast(scene) if self.compute_dtype else scene
        t0 = time.perf_counter()
        self.accel = self._jitted[key](
            variables,
            scene,
            jnp.asarray(lo),
            jnp.asarray(hi),
            jnp.float32(eps_alpha / max(delta, 1e-6)),
        )
        jax.block_until_ready(self.accel)
        t1 = time.perf_counter()
        # kept for gate_accel_mode: capacity re-selection after an operating-
        # point change must see the same ray population the build sized for
        self._build_rays_np = rays_np
        self._build_ray_batch_size = ray_batch_size
        self._autoselect_capacity(rays_np, ray_batch_size=ray_batch_size)
        print(
            f"accel: build phases - grid program {t1 - t0:.1f}s "
            f"(incl. compile on first call), capacity probe "
            f"{time.perf_counter() - t1:.1f}s",
            file=sys.stderr,
        )
        return self.accel

    def _autoselect_capacity(
        self,
        rays_np: np.ndarray,
        n_jitter_draws: int = 3,
        ray_batch_size: Optional[int] = None,
    ):
        """Size the static compaction buffers from measured live fractions of
        ``rays_np`` against the freshly built grid.

        Ray mode (default): a ray is live if ANY coarse sample is occupied.
        Since compaction runs per render chunk and frames mix object-dense
        and background-only regions, the capacity must cover the WORST chunk
        — estimated as the max live fraction over consecutive effective-
        chunk-sized ray windows (larger chunks mix object and background
        regions, so their worst-window fraction sits closer to the mean and
        the buffer can be proportionally smaller).  The render draws its z's
        STRATIFIED (rays.sample_coarse), so liveness fluctuates per pass for
        rays grazing the dilated surface; instead of a blanket relative
        margin (x1.15 through round 4 — it bought a 0.625 buffer for a 0.499
        liveness), the probe measures that fluctuation directly: the midpoint
        ladder plus ``n_jitter_draws`` deterministic stratified ladders, and
        the capacity covers the worst window over ALL draws plus one 1/64
        quantization step.  Sample mode: worst per-draw mean live-sample
        fraction; the fine union conservatively counts importance samples
        fully live.  Capacities round UP to 1/64 steps; an overflowing chunk
        still falls back to the dense path via lax.cond (never wrong, only
        unpruned — and the jittered probe makes that rare by construction).
        """
        import sys

        from ..render.accel import occupancy_fraction

        cfg = self.renderer.cfg
        # probe with the same z ladder the render will use (proposal mode may
        # probe finer than n_coarse — renderer accel_probe_samples)
        kc = max(cfg.n_coarse, 1)
        if cfg.accel_mode == "proposal" and cfg.accel_probe_samples:
            kc = cfg.accel_probe_samples
        N = rays_np.shape[0]
        D = 1 + max(int(n_jitter_draws), 0)

        # The whole probe runs ON DEVICE from the (N, 8) ray array: draw 0
        # probes bin midpoints, draws 1.. probe stratified z's (one fixed-key
        # uniform per (draw, ray, bin) — the render's sample_coarse
        # distribution; a fixed key keeps the chosen capacity, and therefore
        # the compiled render shape, stable across runs).  Building the
        # (D, n, kc, 3) point cloud host-side cost ~100 MB of single-core
        # numpy + H2D per 65536-ray chunk (measured: capacity probe 2.2 s ->
        # 9-40 s when the jitter draws landed host-side); on device it is a
        # 2 MB ray upload and a (D, n) bool fetch.
        ray_live = np.empty((D, N), bool)
        samp_live = np.zeros(D, np.float64)
        for i, s in enumerate(range(0, N, 65536)):
            sub = jnp.asarray(rays_np[s : s + 65536])
            live, counts = _capacity_probe(
                self.accel, sub,
                jax.random.fold_in(jax.random.PRNGKey(0), i), kc, D,
            )
            ray_live[:, s : s + 65536] = np.asarray(live)
            samp_live += np.asarray(counts, np.float64)
        fc_per_draw = samp_live / (N * kc)
        fc = float(fc_per_draw.max())

        def worst_window(win: int) -> float:
            # worst live fraction over consecutive win-sized ray windows,
            # maxed over the probe draws; pad to a whole window by repeating
            # the last ray's liveness — the same padding _dispatch applies
            # (tiling part[-1:]) — so the tail chunk counts toward the
            # estimate instead of being dropped (a live tail would otherwise
            # undersize cap_r and push that chunk onto the dense fallback
            # every render)
            win = min(max(win, 256), N)
            n_win = -(-N // win)
            padded = np.concatenate(
                [ray_live, np.tile(ray_live[:, -1:], n_win * win - N)],
                axis=1,
            )
            return float(
                padded.reshape(D, n_win, win).mean(axis=2).max()
            )

        def quantize(frac: float) -> float:
            q = (np.ceil(min(frac, 1.0) * 64) + 1) / 64
            return float(np.clip(q, 1 / 32, 1.0))

        cap_c = quantize(fc)
        cap_f = None
        if cfg.using_fine:
            k_union = kc + cfg.n_fine
            cap_f = quantize((kc * fc + cfg.n_fine) / k_union)

        # auto-size the device ray chunk: larger chunks amortize the
        # per-chunk compaction gather/scatter and sampling sort (measured,
        # scripts/study_chunk.py — see point_budget above), bounded by the
        # live-point budget so activations stay VMEM/HBM-friendly.  Larger
        # windows also mix object and background regions, so cap_r usually
        # SHRINKS as the chunk grows — evaluated per candidate.
        eff_chunk = self.device_chunk
        if ray_batch_size is not None:
            eff_chunk = min(eff_chunk, ray_batch_size)
        candidates = []
        c = self.accel_chunk_max
        while c > eff_chunk:
            if ray_batch_size is None or c <= ray_batch_size:
                candidates.append(c)
            c //= 2
        candidates.append(eff_chunk)
        for chunk in candidates:
            cap_r = quantize(worst_window(chunk))
            if (
                chunk == eff_chunk
                or _live_point_evals(cfg, chunk, cap_r, cap_c, cap_f)
                <= self.point_budget
            ):
                break
        self.accel_chunk = chunk if chunk > self.device_chunk else None
        fr = worst_window(chunk)
        print(
            f"accel: occupancy {occupancy_fraction(self.accel):.3f}, "
            f"ray live max/mean {fr:.3f}/{ray_live[0].mean():.3f} "
            f"({D - 1} jitter draws) -> ray capacity {cap_r}; "
            f"sample live {fc:.3f} -> "
            f"capacities {cap_c}/{cap_f}; chunk {chunk}",
            file=sys.stderr,
        )
        # The "nothing to prune" rung keys on what each mode actually saves.
        # rays/samples save ONLY by skipping dead rays/samples, so a ~full
        # capacity means compaction is pure overhead.  PROPOSAL's win is
        # structural — the coarse MLP pass is replaced by grid lookups and
        # the fine union shrinks (160 -> 32 evals/ray) even when every ray is
        # live — so its rung keys on the SAMPLE capacity: only a fog field
        # (live samples ~everywhere => near-uniform pdf ~= a lean dense
        # render that can't pass the quality gate) disables it.  Measured on
        # the sn64_multiscale bench field (ray live 0.84 -> cap_r 1.0, sample
        # live 0.47): proposal+8 holds 30.9 dB at ~600k rays/s, 5x the dense
        # rate the old ray-capacity keying forced it back to.
        key_cap = cap_r if cfg.accel_mode == "rays" else cap_c
        if key_cap >= 0.95:
            # nothing to prune — compaction would be pure overhead
            print(
                "accel: grid nearly fully occupied; disabling pruning",
                file=sys.stderr,
            )
            self.accel = None
            self.accel_chunk = None
            return
        self.renderer.base_cfg = dataclasses.replace(
            self.renderer.base_cfg,
            accel_capacity_rays=cap_r,
            accel_capacity=cap_c,
            accel_capacity_fine=cap_f,
        )

    def set_accel_mode(self, mode: str) -> None:
        """Switch the occupancy-pruning strategy for subsequent renders:
        "rays" (ray compaction; identical coarse z draw, fine draws
        stochastically re-drawn), "proposal" (ray
        compaction + grid-proposal coarse — fastest; the coarse head becomes
        a proposal, not a render), or "samples" (per-sample compaction)."""
        assert mode in ("rays", "proposal", "samples"), mode
        self.renderer.base_cfg = dataclasses.replace(
            self.renderer.base_cfg, accel_mode=mode
        )

    def gate_accel_mode(
        self,
        variables,
        scene,
        gate_rays,
        rng,
        rgb_dense=None,
        *,
        ray_batch_size: Optional[int] = None,
        pack: str = "f32",
        psnr_gate: float = 30.0,
    ):
        """Settle the pruning operating point against a dense reference.

        The quality ladder every accel consumer walks (bench.py, study_scenes,
        gen_video ``--accel_mode auto``, eval ``--accel``): render
        ``gate_rays`` pruned and compare with the dense render; on
        disagreement (< ``psnr_gate`` dB) step DOWN —

          ``proposal`` (config draw count)
          -> ``proposal+8`` (8 extra importance draws: sharp/overfit fields
             whose pdf misses fine density structure at the lean count pass
             here — measured on the sn64_multiscale bench field: 28.6 dB /
             771.7k rays/s at 16 draws vs 30.9 dB / 599.8k at 24, while
             denser probe ladders made agreement WORSE, 64 probes -> 27.8 dB)
          -> ``proposal+16`` (the same field re-trained on another day
             measured 27.0/29.2 dB at 16/24 draws — 0.8 dB under the gate at
             +8 — and was falling all the way to ray compaction's dense-rate
             floor; 32+8 draws is still 4x fewer field evals than dense)
          -> ``rays`` (compaction only; identical coarse z draw)
          -> dense (``accel = None``).

        A ladder that starts at ``rays``/``samples`` only has the dense rung
        below it.  Returns ``(label, psnrs)`` where ``label`` is the settled
        rung ("proposal", "proposal+8", "proposal+16", "rays", "samples",
        "dense") and
        ``psnrs`` maps each tried rung to its PSNR-vs-dense.  The settled
        renderer config persists (a passing ``proposal+8`` keeps the larger
        draw count for subsequent renders); on full failure the original
        config is restored and pruning is disabled.

        :param rgb_dense: dense render of ``gate_rays`` under ``pack`` — pass
            the one a caller already has, or None to render it here (pruning
            temporarily disabled, same rng/chunking).
        """
        import numpy as np

        if self.accel is None:
            return "dense", {}
        # the gate owns the proposal draw-count knob: each call starts from
        # the pristine count, so per-object gates (eval.py) can't compound a
        # previous object's +8 into +16, +24, ...
        if not hasattr(self, "_gate_pristine_samples"):
            self._gate_pristine_samples = (
                self.renderer.base_cfg.accel_proposal_samples
            )
        elif (
            self.renderer.base_cfg.accel_proposal_samples
            != self._gate_pristine_samples
        ):
            self.renderer.base_cfg = dataclasses.replace(
                self.renderer.base_cfg,
                accel_proposal_samples=self._gate_pristine_samples,
            )
        base_cfg = self.renderer.base_cfg
        if rgb_dense is None:
            grid, chunk = self.accel, self.accel_chunk
            self.accel = None
            rgb_dense, _ = self.render_simple(
                variables, scene, gate_rays, rng,
                ray_batch_size=ray_batch_size or 50000, pack=pack,
            )
            self.accel, self.accel_chunk = grid, chunk
        rgb_dense = np.asarray(rgb_dense, np.float32)

        def _denser_proposal(extra):
            def setup():
                self.renderer.base_cfg = dataclasses.replace(
                    self.renderer.base_cfg,
                    accel_proposal_samples=(
                        base_cfg.accel_proposal_samples + extra
                    ),
                )
                rays_np = getattr(self, "_build_rays_np", None)
                if rays_np is not None:
                    self._autoselect_capacity(
                        rays_np,
                        ray_batch_size=getattr(
                            self, "_build_ray_batch_size", None
                        ),
                    )

            return setup

        def _to_rays():
            self.renderer.base_cfg = base_cfg
            self.set_accel_mode("rays")
            # re-select for the rays-mode probe ladder — and let its
            # "nothing to prune" rung fire: a fully-live field (ray capacity
            # ~1.0, reachable here since proposal no longer build-disables
            # on it) would make compaction pure overhead; disabling sends
            # the ladder straight to dense instead of settling on a rung
            # that is slower than no pruning at all
            rays_np = getattr(self, "_build_rays_np", None)
            if rays_np is not None:
                self._autoselect_capacity(
                    rays_np,
                    ray_batch_size=getattr(
                        self, "_build_ray_batch_size", None
                    ),
                )

        if base_cfg.accel_mode == "proposal":
            ladder = [("proposal", None),
                      ("proposal+8", _denser_proposal(8)),
                      ("proposal+16", _denser_proposal(16)),
                      ("rays", _to_rays)]
        else:
            ladder = [(base_cfg.accel_mode, None)]

        psnrs = {}
        for label, setup in ladder:
            if setup is not None:
                setup()
            if self.accel is None:  # capacity re-selection disabled pruning
                break
            rgb_p, _ = self.render_simple(
                variables, scene, gate_rays, rng,
                ray_batch_size=ray_batch_size or 50000, pack=pack,
            )
            mse = float(
                np.mean((np.asarray(rgb_p, np.float32) - rgb_dense) ** 2)
            )
            psnrs[label] = -10.0 * float(np.log10(max(mse, 1e-12)))
            if psnrs[label] >= psnr_gate:
                return label, psnrs
        self.renderer.base_cfg = base_cfg
        self.accel = None
        self.accel_chunk = None
        return "dense", psnrs

    def render(
        self,
        variables,
        scene: EncodedScene,
        rays: np.ndarray,
        rng: Array,
        ray_batch_size: int = 50000,
        want_weights: bool = False,
    ) -> Dict[str, Any]:
        """Render an arbitrary number of rays for one scene.

        :param rays: (NR, 8) — the flattened view of gen_rays output
        :param ray_batch_size: upper bound on the device chunk (the CLI -R knob)
        :return: {"coarse": {...}[, "fine": {...}]} host numpy arrays (NR, ...)
        """
        pieces = [
            jax.tree.map(lambda x: np.asarray(x)[:true_n], out)
            for out, true_n in self._dispatch(
                variables, scene, rays, rng, ray_batch_size, want_weights, False
            )
        ]
        if len(pieces) == 1:
            return pieces[0]
        return jax.tree.map(lambda *xs: np.concatenate(xs, axis=0), *pieces)

    def render_simple(
        self,
        variables,
        scene,
        rays,
        rng,
        ray_batch_size: int = 50000,
        as_numpy: bool = True,
        pack: str = "f32",
    ):
        """(rgb, depth) from the fine pass if present, else coarse — the
        reference's simple_output contract (nerf.py:32-39).

        The device program is pruned to this output (XLA drops the unused
        coarse compositing) and the transfer is ONE packed array per dispatch:
        ``pack="f32"`` (default) sends full-precision (NR, 4) f32;
        ``pack="u8"`` sends video-frame wire format — uint8 rgb (bit-equal to
        what the video writer quantizes to) + f16 depth, 5 bytes/ray instead
        of 16 (the remote-TPU D2H link is the video loop's bottleneck,
        docs/PERFORMANCE.md) — use it when the output feeds a video/frame
        writer (gen_video, eval_real), NOT for quality metrics.  Either
        way :func:`unpack_simple` returns float32 (rgb in [0, 1]).
        With ``as_numpy=False`` the packed device arrays are returned un-fetched
        (list of (array, true_n)) — callers overlapping fetch with the next
        dispatch unpack via :func:`unpack_simple`.
        """
        assert pack in ("u8", "f32"), pack
        pieces = list(
            self._dispatch(
                variables, scene, rays, rng, ray_batch_size, False, pack
            )
        )
        if not as_numpy:
            return pieces
        return unpack_simple(pieces)
