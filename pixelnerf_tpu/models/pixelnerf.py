"""PixelNeRF network — functional encode/query on TPU.

Semantics are the upstream-faithful reference model (models.py.backup2:98-282):

  * ``encode``: ResNet feature pyramid per source view; poses inverted to
    world->camera (backup2:121-123); focal y negated (backup2:139); principal point
    defaults to image center (backup2:141-143); optional multi-scale smart fusion
    (fork models.py:67-95,196-201) and global code (backup2:62-66,152-153).
  * ``query``: world points transformed into each source view's camera space,
    z/xyz (+ optionally positionally-encoded) coordinate feature, viewdirs rotated
    per view (backup2:193-205), perspective projection ``uv = -xy/z * focal + c``
    (backup2:215-221), pixel-aligned feature indexing, ResnetFC with multi-view
    averaging at ``combine_layer``, ``sigmoid(rgb) / relu(sigma)`` outputs
    (backup2:279).

The key TPU re-design: the reference mutates module attributes at encode time
(models.py:203-208), which is jit-hostile.  Here ``encode`` *returns* an
:class:`EncodedScene` pytree that is threaded explicitly through ``query`` — the
whole render step jits as one pure function, and the scene pytree shards/replicates
cleanly over a device mesh.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp

from ..config.hocon import ConfigTree
from ..utils.geometry import invert_poses, repeat_interleave
from .code import PositionalEncoding
from .encoder import GlobalEncoder, SpatialEncoder
from .fusion import AdaptiveFeatureSampler, SmartFeatureFusion
from .mlp import ImplicitNet
from .resnetfc import ResnetFC

Array = jnp.ndarray


def _defer_code_enabled() -> bool:
    """Whether query passes the positional code as a deferred RawCode for the
    fused kernel to evaluate in-register (opt-in via PIXELNERF_DEFER_CODE=1).

    Measured OFF-by-default: on a 64px sn64 render the XLA-side posenc costs
    only ~14 ms/pass (the flat select-matmul absorbs its thin (N, 3)/(N, 6)
    inputs while emitting the wide kernel operand), whereas handing the kernel
    a narrow (N, 8) raw-coordinate operand makes XLA materialize the
    [xyz, viewdirs] concat through thin-minor-dim relayouts costing ~290
    ms/pass (118k -> 75k rays/s end to end).  The deferred path remains
    available for shapes where the trade flips (docs/PERFORMANCE.md)."""
    import os

    return os.environ.get("PIXELNERF_DEFER_CODE", "0") == "1"


class EncodedScene(flax.struct.PyTreeNode):
    """Everything ``query`` needs about the conditioned source views.

    Shapes use B = SB * NS (object superbatch x source views, flattened).
    """

    latents: Any  # (B, H_l, W_l, C) map, or tuple of per-scale maps
    poses: Array  # (B, 3, 4) world -> camera
    focal: Array  # (B, 2) [fx, -fy] in pixels
    c: Array  # (B, 2) principal point in pixels
    global_latent: Optional[Array] = None  # (B, C_g)
    image_shape: Tuple[int, int] = flax.struct.field(
        pytree_node=False, default=(0, 0)
    )  # (W, H)
    num_views_per_obj: int = flax.struct.field(pytree_node=False, default=1)


def _make_mlp(
    conf: ConfigTree, d_in: int, d_latent: int, name: str, allow_empty=False, impl="xla"
):
    """Factory mirroring reference model_util.make_mlp (model_util.py:5-15)."""
    mlp_type = conf.get_string("type", "mlp")
    if mlp_type == "mlp":
        return ImplicitNet.from_conf(conf, d_in + d_latent, name=name)
    if mlp_type == "resnet":
        return ResnetFC.from_conf(conf, d_latent=d_latent, name=name, impl=impl)
    if mlp_type == "empty" and allow_empty:
        return None
    raise NotImplementedError("Unsupported MLP type")


class PixelNeRFNet(nn.Module):
    """Conditioned NeRF field.  Construct with :func:`make_model` / ``from_conf``."""

    conf_dict: Any  # frozen dict snapshot of the `model` conf subtree
    stop_encoder_grad: bool = False
    mlp_impl: str = "xla"  # "xla" | "pallas" fused eval kernel (TPU)
    # Training-mode construction: keep every field-kernel input DENSE (no
    # deferred LatentGather / RawCode, which ride the eval-only kernel) so the
    # fused MLP stays differentiable end to end (ops.resnetfc_vjp).
    diff_mode: bool = False

    @property
    def conf(self) -> ConfigTree:
        return ConfigTree(_unfreeze(self.conf_dict))

    # ---------------- static wiring derived from conf ----------------
    def setup(self):
        conf = self.conf
        self.use_encoder = conf.get_bool("use_encoder", True)
        self.use_xyz = conf.get_bool("use_xyz", False)
        assert self.use_encoder or self.use_xyz
        self.normalize_z = conf.get_bool("normalize_z", True)
        self.use_code = conf.get_bool("use_code", False)
        self.use_code_viewdirs = conf.get_bool("use_code_viewdirs", True)
        self.use_viewdirs = conf.get_bool("use_viewdirs", False)
        self.use_global_encoder = conf.get_bool("use_global_encoder", False)
        # Density activation.  The reference is hard-coded relu
        # (models.py.backup2:279); "softplus" is a config-gated extension:
        # relu's zero gradient below 0 is the measured collapse mode on
        # scenes whose foreground occupies a tiny pixel fraction (the
        # background-dominated first steps drive pre-relu sigma negative
        # everywhere and it can never resurrect — docs/SCENES.md
        # "offcenter").  Softplus has no dead zone, and softplus(x)≈relu(x)
        # away from 0, so trained fields keep the same large-sigma surface
        # behavior.
        # "softplus_floor" adds a straight-through clip at raw = -4: forward
        # density floors at softplus(-4) ~= 0.018 (a faint training haze)
        # and the gradient w.r.t. raw never drops below sigmoid(-4) ~= 0.018
        # — the background cannot run to raw -inf, so a starved foreground
        # stays within bounded gradient distance of resurrection (the
        # offcenter failure mode, docs/SCENES.md).
        self.sigma_activation = conf.get_string("sigma_activation", "relu")
        if self.sigma_activation not in ("relu", "softplus", "softplus_floor"):
            raise NotImplementedError(
                f"Unsupported sigma_activation {self.sigma_activation!r}"
            )

        # encoder factory (reference model_util.make_encoder:18-26 + conv)
        enc_type = conf.get_string("encoder.type", "spatial")
        if enc_type == "spatial":
            self.encoder = SpatialEncoder.from_conf(conf["encoder"], name="encoder")
        elif enc_type == "conv":
            from .custom_encoder import ConvEncoder

            self.encoder = ConvEncoder.from_conf(conf["encoder"], name="encoder")
        else:
            raise NotImplementedError(f"Unsupported encoder type {enc_type!r}")

        # fusion (fork feature, models.py:67-95)
        use_smart_fusion = conf.get_bool("use_smart_fusion", False)
        self.is_multi_scale = self.encoder.use_multi_scale
        self.use_smart_fusion = use_smart_fusion and self.is_multi_scale
        self.use_adaptive_sampling = (
            conf.get_bool("use_adaptive_sampling", False) and self.is_multi_scale
        )
        ls = self.encoder.latent_size
        layer_dims = list(
            getattr(self.encoder, "latent_sizes", ls if isinstance(ls, list) else [ls])
        )
        if self.use_smart_fusion:
            self.feature_fusion = SmartFeatureFusion(
                layer_dims=tuple(layer_dims),
                output_dim=512,
                use_attention=conf.get_string("fusion_type", "attention")
                == "attention",
                dropout=conf.get_float("fusion_dropout", 0.0),
                num_heads=conf.get_int("fusion_heads", 8),
                use_cbam=conf.get_bool("use_cbam", True),
                name="feature_fusion",
            )
            latent_size = 512
        else:
            ls = self.encoder.latent_size
            latent_size = sum(ls) if isinstance(ls, (list, tuple)) else ls
        if self.use_adaptive_sampling:
            self.adaptive_sampler = AdaptiveFeatureSampler(
                feature_dim=layer_dims[-1],
                quality_threshold=conf.get_float("quality_threshold", 0.3),
                name="adaptive_sampler",
            )
        self.latent_size = latent_size

        # d_in composition rules (backup2:48-60)
        d_latent = latent_size if self.use_encoder else 0
        d_in = 3 if self.use_xyz else 1
        if self.use_viewdirs and self.use_code_viewdirs:
            d_in += 3
        if self.use_code and d_in > 0:
            self.code = PositionalEncoding.from_conf(conf["code"], d_in=d_in)
            d_in = self.code.d_out
        if self.use_viewdirs and not self.use_code_viewdirs:
            d_in += 3

        if self.use_global_encoder:
            self.global_encoder = GlobalEncoder.from_conf(
                conf["global_encoder"], name="global_encoder"
            )
            d_latent += self.global_encoder.latent_size

        self.d_in = d_in
        self.d_latent = d_latent
        self.d_out = 4

        self.mlp_coarse = _make_mlp(
            conf["mlp_coarse"], d_in, d_latent, name="mlp_coarse", impl=self.mlp_impl
        )
        self.mlp_fine = _make_mlp(
            conf["mlp_fine"],
            d_in,
            d_latent,
            name="mlp_fine",
            allow_empty=True,
            impl=self.mlp_impl,
        )

    # ---------------------------- encode ----------------------------
    def encode(
        self,
        images: Array,
        poses: Array,
        focal,
        c=None,
        train: bool = False,
    ) -> EncodedScene:
        """:param images: (SB, NS, H, W, 3) or (NS, H, W, 3), values in [-1, 1]
        :param poses: matching (..., 4, 4) camera-to-world
        :param focal: () | (2,) | (NS,) | (NS, 2) [fx, fy]
        :param c: principal point, same shape options, default image center
        :return: EncodedScene
        """
        if images.ndim == 5:
            num_views_per_obj = images.shape[1]
            images = images.reshape((-1,) + images.shape[2:])
            poses = poses.reshape(-1, 4, 4)
        else:
            num_views_per_obj = 1
        B, H, W = images.shape[0], images.shape[1], images.shape[2]

        # trace annotations mirror the reference's profiler cut points
        # (models.py:193,198 record_function tags; SURVEY §5.1)
        with jax.named_scope("encoder_forward"):
            latents = self.encoder(images, train=train)
        if self.is_multi_scale and self.use_adaptive_sampling:
            latents = self.adaptive_sampler(latents)
        if self.use_smart_fusion:
            with jax.named_scope("feature_fusion"):
                latents = self.feature_fusion(latents, train=train)
        if isinstance(latents, list):
            latents = tuple(latents)

        w2c = invert_poses(poses)  # (B, 3, 4)

        def norm_intrinsic(x):
            """() | (K,) per-obj/view scalars | (K,2) | (SB,1,2) -> (B, 2).
            K==1 broadcasts; K==SB repeat-interleaves over NS (the reference
            repeats per-object intrinsics at query time, backup2:216-221)."""
            x = jnp.asarray(x, jnp.float32)
            if x.ndim == 0:
                x = jnp.broadcast_to(x[None, None], (1, 2))
            elif x.ndim == 1:
                x = jnp.broadcast_to(x[:, None], (x.shape[0], 2))
            else:
                x = x.reshape(-1, x.shape[-1])
            if x.shape[0] == 1:
                return jnp.broadcast_to(x, (B, 2))
            if x.shape[0] != B:
                assert B % x.shape[0] == 0, (x.shape, B)
                return repeat_interleave(x, B // x.shape[0])
            return x

        focal = norm_intrinsic(focal) * jnp.array(
            [1.0, -1.0], jnp.float32
        )  # -fy (backup2:139)

        if c is None:
            c = jnp.broadcast_to(
                jnp.array([[W * 0.5, H * 0.5]], jnp.float32), (B, 2)
            )
        else:
            c = norm_intrinsic(c)

        global_latent = None
        if self.use_global_encoder:
            global_latent = self.global_encoder(images, train=train)

        return EncodedScene(
            latents=latents,
            poses=w2c,
            focal=focal,
            c=c,
            global_latent=global_latent,
            image_shape=(W, H),
            num_views_per_obj=num_views_per_obj,
        )

    # 64px-class feature maps (<=2048 rows) fit VMEM next to the MLP weights;
    # beyond that the one-hot matmul outgrows the HBM gather it replaces
    # (2*T*C one-hot FLOPs/pt/view vs a 4-tap HBM read — break-even near
    # T*NS ~ 2k on this part).
    FUSED_GATHER_MAX_ROWS = 2048

    @staticmethod
    def _fused_gather_cap() -> int:
        """Read per call so PIXELNERF_FUSED_GATHER_MAX_ROWS works regardless
        of import order (other chips have different matmul/HBM break-evens)."""
        import os

        return int(
            os.environ.get(
                "PIXELNERF_FUSED_GATHER_MAX_ROWS",
                PixelNeRFNet.FUSED_GATHER_MAX_ROWS,
            )
        )

    def _fused_gather_ok(self, latents, NS: int) -> bool:
        """Whether the pixel-aligned lookup can ride the fused Pallas kernel."""
        if self.mlp_impl not in ("pallas", "auto"):
            return False
        if self.diff_mode:  # the fused-gather kernel has no backward
            return False
        if isinstance(latents, (list, tuple)):
            # raw multi-scale pyramid (no fusion): per-scale tables of mixed
            # resolutions — dense path. With smart fusion the pyramid is
            # already fused into ONE map and qualifies like single-scale.
            return False
        if self.use_global_encoder:
            return False
        if latents.shape[0] != NS:  # requires SB == 1 (one table set in VMEM)
            return False
        if NS > 1:
            for mlp in (self.mlp_coarse, self.mlp_fine):
                if mlp is not None and not (
                    0
                    <= getattr(mlp, "combine_layer", -1)
                    < getattr(mlp, "n_blocks", 0)
                ):
                    return False
        if getattr(self.encoder, "index_interp", "bilinear") != "bilinear":
            return False
        # NS tables must fit VMEM together
        return NS * latents.shape[1] * latents.shape[2] <= self._fused_gather_cap()

    def field_backward_in_kernel(self, max_nviews: int = 1) -> bool:
        """True when train steps route the field MLP through the fused Pallas
        custom-VJP kernel (ops.resnetfc_vjp): dense inputs (diff_mode),
        supported ResnetFC envelope on BOTH heads, TPU backend for 'auto'.

        The kernel's backward recomputes its tower inside VMEM and stores only
        its own inputs, so an outer ``jax.checkpoint`` over the field would
        add a redundant forward replay (measured +16-19% step time) without
        saving memory — the Trainer uses this to default ``train.remat``.
        """
        import jax

        from ..ops import resnetfc_pallas as rp

        if not (self.diff_mode and self.mlp_impl in ("pallas", "auto")):
            return False
        if self.mlp_impl == "auto" and jax.default_backend() != "tpu":
            return False
        conf = self.conf
        for head in ("mlp_coarse", "mlp_fine"):
            if head not in conf:
                continue
            sub = conf[head]
            mlp_type = sub.get_string("type", "mlp")
            if mlp_type == "empty":
                continue
            if mlp_type != "resnet":
                return False
            if not rp.supports(
                sub.get_float("beta", 0.0),
                sub.get_bool("use_spade", False),
                sub.get_string("combine_type", "average"),
            ):
                return False
            if max_nviews > 1 and not (
                sub.get_int("combine_layer", 1000) < sub.get_int("n_blocks", 5)
            ):
                return False
        return True

    # ----------------------------- query -----------------------------
    def query(
        self,
        scene: EncodedScene,
        xyz: Array,
        viewdirs: Optional[Array] = None,
        coarse: bool = True,
        planar_out: bool = False,
        compute_dtype=None,
    ) -> Array:
        """Predict (r, g, b, sigma) at world points.

        :param xyz: (SB, B, 3) world-space points
        :param viewdirs: (SB, B, 3) if use_viewdirs
        :param planar_out: return channel-major (SB, 4, B) — the renderer's
            native layout (each channel a contiguous plane; see ResnetFC)
        :param compute_dtype: cast the MLP inputs (latent + coordinate code) to
            this dtype before the field MLP — with bf16 params this is the AMP
            compute path (geometry/projection math stays f32; output returns
            f32).  None keeps everything in the input dtype.
        :return: (SB, B, 4) with rgb in [0,1] (sigmoid) and sigma >= 0 (relu);
            (SB, 4, B) when ``planar_out``
        """
        # "model_inference" cut point (backup2:165)
        SB, B, _ = xyz.shape
        NS = scene.num_views_per_obj
        poses = scene.poses  # (SB*NS, 3, 4)

        xyz_rep = repeat_interleave(xyz, NS)  # (SB*NS, B, 3)
        xyz_rot = jnp.einsum(
            "nij,nbj->nbi", poses[:, :3, :3], xyz_rep, precision="highest"
        )
        xyz_cam = xyz_rot + poses[:, None, :3, 3]

        mlp_input = None
        if self.d_in > 0:
            defer_code = (
                self.use_code and _defer_code_enabled() and not self.diff_mode
            )
            if self.use_xyz:
                z_feature = xyz_rot if self.normalize_z else xyz_cam
            else:
                src = xyz_rot if self.normalize_z else xyz_cam
                z_feature = -src[..., 2:3]
            if self.use_code and not self.use_code_viewdirs and not defer_code:
                z_feature = self.code(z_feature)
            if self.use_viewdirs:
                assert viewdirs is not None
                vd = repeat_interleave(viewdirs, NS)  # (SB*NS, B, 3)
                vd = jnp.einsum(
                    "nij,nbj->nbi", poses[:, :3, :3], vd, precision="highest"
                )
                z_feature = jnp.concatenate([z_feature, vd], axis=-1)
            if self.use_code and self.use_code_viewdirs and not defer_code:
                z_feature = self.code(z_feature)
            if defer_code:
                # Deferred positional code: pass the RAW (~6ch) coordinate
                # features plus the flat code arrays; the fused Pallas kernel
                # evaluates the sin-code in-register (the encoded d_in-wide
                # tensor never exists in HBM), and the XLA path materializes
                # the identical math (materialize_code).  A post-code viewdir
                # tail rides the same select matrix, so the layout equals
                # [code(x), vd] (backup2:193-205).
                from ..ops.resnetfc_pallas import RawCode

                tail = (
                    3 if (self.use_viewdirs and not self.use_code_viewdirs) else 0
                )
                Wc, fcol, pcol, mcol = self.code.flat_arrays(tail=tail)
                mlp_input = RawCode(
                    x=z_feature,
                    w=jnp.asarray(Wc),
                    f=jnp.asarray(fcol),
                    p=jnp.asarray(pcol),
                    m=jnp.asarray(mcol),
                )
            else:
                mlp_input = z_feature

        latent = None
        if self.use_encoder:
            # uv = -xy/z * focal + c (backup2:215-221); the divisor is clamped
            # away from 0 (sign-preserving) so samples crossing a source
            # camera's z=0 plane can't emit inf/NaN forward or 0*inf backward
            z_cam = xyz_cam[..., 2:3]
            denom = jnp.where(
                jnp.abs(z_cam) < 1e-8,
                jnp.where(z_cam >= 0, 1e-8, -1e-8),
                z_cam,
            )
            uv = -xyz_cam[..., :2] / denom  # (SB*NS, B, 2)
            uv = uv * scene.focal[:, None] + scene.c[:, None]
            latents = scene.latents
            if isinstance(latents, tuple):
                latents = list(latents)
            if self._fused_gather_ok(latents, NS):
                # defer the bilinear lookup into the Pallas field kernel: the
                # (T, C) table stays VMEM-resident and the lookup becomes a
                # one-hot matmul — no per-point HBM feature gather at all
                from ..ops.resnetfc_pallas import LatentGather

                C = latents.shape[-1]
                if NS == 1:
                    table = latents.reshape(-1, C)  # (T, C)
                else:
                    table = latents.reshape(NS, -1, C)  # (NS, T, C)
                if self.stop_encoder_grad:
                    table = jax.lax.stop_gradient(table)
                with jax.named_scope("encoder_index"):
                    t_idx, t_w = self.encoder.index_taps(
                        latents, uv, scene.image_shape
                    )
                latent = LatentGather(table, t_idx, t_w)
            else:
                with jax.named_scope("encoder_index"):
                    latent = self.encoder.index(latents, uv, scene.image_shape)
                if self.stop_encoder_grad:
                    latent = jax.lax.stop_gradient(latent)
                # offerable residual for rematerialized training: storing the
                # sampled latent (~1 KB/point bf16) lets a save_only_these_names
                # checkpoint policy skip replaying the HBM gather in backward
                # while still rematerializing the MLP (trainer.make_step_fns)
                from jax.ad_checkpoint import checkpoint_name

                latent = checkpoint_name(latent, "pixel_latent")

        if self.use_global_encoder:
            g = scene.global_latent[:, None]  # (SB*NS, 1, C_g)
            g = jnp.broadcast_to(g, (g.shape[0], B, g.shape[-1]))
            latent = (
                g if latent is None
                else jnp.concatenate([g.astype(latent.dtype), latent], axis=-1)
            )

        # The (latent, coordinate-code) pair is passed UNconcatenated — the MLP
        # decides whether to fuse them (XLA path) or stream them separately into
        # the Pallas kernel (the latent may be bf16 straight from the gather,
        # or a LatentGather deferring the lookup into the kernel itself).
        from ..ops.resnetfc_pallas import LatentGather, RawCode

        is_gather = isinstance(latent, LatentGather)
        if mlp_input is None:
            assert not is_gather or self.d_in == 0
            mlp_input = (
                jnp.zeros(xyz_cam.shape[:-1] + (0,), jnp.float32)
                if is_gather
                else latent[..., :0]
            )  # d_in == 0: zero-width code
        if isinstance(mlp_input, RawCode):
            # NO compute_dtype cast on raw coordinates: rounding xyz to bf16
            # BEFORE the sin code is ~0.4 rad of phase error at freq 2^5*pi.
            # The code is evaluated in f32 and its bounded output cast after
            # (materialize_code / _x_feat) — matching the default AMP path,
            # which casts the encoded features, not the coordinates.
            xr = mlp_input.x.reshape(-1, mlp_input.x.shape[-1])
            flat_x = mlp_input._replace(x=xr)
            if compute_dtype is not None:
                # marker so the XLA fallback casts the bounded encoded output
                # to the AMP compute dtype even when d_latent == 0 (no z side
                # to unify with in materialize_parts)
                flat_x = flat_x._replace(
                    cd=jnp.zeros((0,), compute_dtype)
                )
        else:
            flat_x = mlp_input.reshape(-1, mlp_input.shape[-1])
            if compute_dtype is not None:
                flat_x = flat_x.astype(compute_dtype)
        if is_gather:
            table = latent.table
            if compute_dtype is not None:
                table = table.astype(compute_dtype)
            flat_z = LatentGather(
                table,
                latent.idx.reshape(-1, latent.idx.shape[-1]),
                latent.w.reshape(-1, latent.w.shape[-1]),
            )
        elif latent is not None:
            flat_z = latent.reshape(-1, latent.shape[-1])
            if compute_dtype is not None:
                flat_z = flat_z.astype(compute_dtype)
        else:
            flat_z = None
        arg = (
            (flat_z, flat_x)
            if flat_z is not None or isinstance(flat_x, RawCode)
            else flat_x
        )
        mlp = self.mlp_coarse if (coarse or self.mlp_fine is None) else self.mlp_fine
        with jax.named_scope("mlp_forward"):
            out = mlp(arg, combine_inner_dims=(NS, B), planar_out=planar_out)
        out = out.astype(jnp.float32)

        if planar_out:
            # two producer layouts: the fused kernel returns flat point-major
            # columns (1, d_out, SB*B) with column index s*B + b; the XLA MLP
            # returns (SB, d_out, B) already (combine_interleaved keeps the
            # object dim).  Only the former needs the un-flatten + swap —
            # reshaping the XLA layout as (d_out, SB, B) would scramble
            # objects across channels (regression: test_models.py planar/SB>1)
            if out.shape[0] == 1 and SB > 1:
                out = jnp.swapaxes(out.reshape(self.d_out, SB, B), 0, 1)
            else:
                out = out.reshape(SB, self.d_out, B)
            rgb = nn.sigmoid(out[:, :3])
            sigma = self._sigma_act(out[:, 3:4])
            return jnp.concatenate([rgb, sigma], axis=1)

        out = out.reshape(SB, B, self.d_out)
        rgb = nn.sigmoid(out[..., :3])
        sigma = self._sigma_act(out[..., 3:4])
        return jnp.concatenate([rgb, sigma], axis=-1)

    def _sigma_act(self, raw):
        if self.sigma_activation == "softplus":
            return nn.softplus(raw)
        if self.sigma_activation == "softplus_floor":
            clipped = jnp.maximum(raw, -4.0)
            # straight-through: forward sees the clipped value, backward
            # passes gradient 1 through the clip — then softplus' bounds the
            # total gradient below by sigmoid(-4), never zero
            raw = raw + jax.lax.stop_gradient(clipped - raw)
            return nn.softplus(raw)
        return nn.relu(raw)

    # ------------------------- init convenience -------------------------
    def __call__(
        self,
        images: Array,
        poses: Array,
        focal,
        xyz: Array,
        viewdirs: Optional[Array] = None,
        c=None,
        train: bool = False,
    ):
        """encode + query both heads; used for parameter initialization."""
        scene = self.encode(images, poses, focal, c=c, train=train)
        out_c = self.query(scene, xyz, viewdirs=viewdirs, coarse=True)
        out_f = None
        if self.mlp_fine is not None:
            out_f = self.query(scene, xyz, viewdirs=viewdirs, coarse=False)
        return out_c, out_f


def make_model(
    conf, stop_encoder_grad: bool = False, mlp_impl: str = "xla", **kwargs
) -> PixelNeRFNet:
    """Construct the model from the `model` conf subtree
    (reference model/__init__.py:7-14).

    :param mlp_impl: "pallas" selects the fused VMEM-resident ResnetFC eval
        kernel (bf16 compute, f32 accumulate) for supported configs
    """
    model_type = conf.get_string("type", "pixelnerf")
    if model_type != "pixelnerf":
        raise NotImplementedError(f"Unsupported model type {model_type!r}")
    frozen = _freeze(conf.as_dict() if isinstance(conf, ConfigTree) else dict(conf))
    return PixelNeRFNet(
        conf_dict=frozen,
        stop_encoder_grad=stop_encoder_grad,
        mlp_impl=mlp_impl,
        **kwargs,
    )


def make_encode_fn(net: PixelNeRFNet):
    """A jitted ``encode``: ``fn(variables, images, poses, focal, c=None) ->
    EncodedScene`` (eval-mode batch stats).

    Eager ``net.apply(..., method=encode)`` dispatches the encoder's several
    hundred ops one by one; through a remote-TPU link each dispatch pays the
    round trip (measured 90+ s for one multiscale encode that runs in ~1 s
    compiled).  Build the callable ONCE and reuse it across objects — per-call
    wrapping would retrace every time.  ``c=None`` and ``c=array`` compile
    separately (different pytree structure); any one caller passes a
    consistent form, so in practice each consumer compiles once.
    """

    @jax.jit
    def encode(variables, images, poses, focal, c=None):
        return net.apply(
            variables, images, poses, focal, c=c,
            method=PixelNeRFNet.encode,
        )

    return encode


_DICT_TAG = "__conf_dict__"


def _freeze(obj):
    """Recursively convert dicts/lists into hashable tuples for module fields."""
    if isinstance(obj, dict):
        return (_DICT_TAG,) + tuple(
            sorted((k, _freeze(v)) for k, v in obj.items())
        )
    if isinstance(obj, (list, tuple)):
        return tuple(_freeze(v) for v in obj)
    return obj


def _unfreeze(obj):
    if isinstance(obj, tuple):
        if len(obj) >= 1 and obj[0] == _DICT_TAG:
            return {k: _unfreeze(v) for k, v in obj[1:]}
        return [_unfreeze(v) for v in obj]
    return obj
