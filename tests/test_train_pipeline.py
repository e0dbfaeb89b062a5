"""End-to-end trainer + render-pipeline tests on the synthetic dataset, including
multi-device ray sharding over the virtual 8-CPU mesh."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pixelnerf_tpu.config import hocon
from pixelnerf_tpu.data import SyntheticDataset
from pixelnerf_tpu.data.loader import DataLoader, collate
from pixelnerf_tpu.models import PixelNeRFNet, make_model
from pixelnerf_tpu.parallel import RenderPipeline, make_ray_mesh
from pixelnerf_tpu.render import NeRFRenderer
from pixelnerf_tpu.train.trainer import (
    CheckpointManager,
    Trainer,
    prepare_ray_batch,
)
from pixelnerf_tpu.utils import geometry

TINY_CONF = """
model {
    use_encoder = True
    use_xyz = True
    use_code = True
    code { num_freqs = 4\n freq_factor = 1.5\n include_input = True }
    use_viewdirs = True
    use_code_viewdirs = False
    mlp_coarse { type = resnet\n n_blocks = 3\n d_hidden = 48\n combine_layer = 2 }
    mlp_fine { type = empty }
    encoder { backbone = resnet18\n pretrained = False\n num_layers = 2\n use_first_pool = False }
}
renderer {
    n_coarse = 12\n n_fine = 0\n n_fine_depth = 0\n white_bkgd = True\n sched = []
}
loss {
    rgb { use_l1 = False }
    rgb_fine { use_l1 = False }
    lambda_coarse = 1.0\n lambda_fine = 1.0
}
train {
    print_interval = 100\n save_interval = 1000\n vis_interval = 1000
    eval_interval = 1000\n num_epoch_repeats = 1
}
"""


class _Args:
    def __init__(self, tmp, **kw):
        self.name = "t"
        self.checkpoints_path = os.path.join(tmp, "ck")
        self.visual_path = os.path.join(tmp, "vis")
        self.logs_path = os.path.join(tmp, "logs")
        self.epochs = 10000
        self.lr = 5e-4
        self.gamma = 1.0
        self.ray_batch_size = 48
        self.nviews = "1"
        self.batch_size = 2
        self.resume = False
        self.use_amp = True
        self.grad_clip = 0.0
        self.check_gradients = False
        self.no_bbox_step = 100000
        self.__dict__.update(kw)


def _build(tmp_path, **argkw):
    conf = hocon.parse_string(TINY_CONF)
    net = make_model(conf["model"])
    ds = SyntheticDataset(n_objs=3, n_views=4, image_size=24)
    renderer = NeRFRenderer.from_conf(conf["renderer"])
    sample = ds[0]
    variables = jax.jit(net.init)(
        jax.random.PRNGKey(0),
        jnp.asarray(sample["images"][None, :1]),
        jnp.asarray(sample["poses"][None, :1]),
        jnp.asarray(np.float32(sample["focal"])),
        jnp.zeros((1, 4, 3), jnp.float32),
        jnp.zeros((1, 4, 3), jnp.float32),
    )
    args = _Args(str(tmp_path), **argkw)
    trainer = Trainer(net, variables, ds, ds, renderer, args, conf)
    return conf, net, ds, renderer, variables, args, trainer


def test_cosine_lr_policy(tmp_path):
    """train { lr_policy = cosine } builds a warmup+cosine schedule: 0 at
    step 0, peak lr after lr_warmup_steps, 10% of peak at lr_total_steps
    (the TPU-swept quick-train recipe, docs/PERFORMANCE.md)."""
    conf = hocon.parse_string(
        TINY_CONF.replace(
            "num_epoch_repeats = 1",
            "num_epoch_repeats = 1\n lr_policy = cosine\n"
            " lr_warmup_steps = 10\n lr_total_steps = 100",
        )
    )
    net = make_model(conf["model"])
    ds = SyntheticDataset(n_objs=3, n_views=4, image_size=24)
    renderer = NeRFRenderer.from_conf(conf["renderer"])
    sample = ds[0]
    variables = jax.jit(net.init)(
        jax.random.PRNGKey(0),
        jnp.asarray(sample["images"][None, :1]),
        jnp.asarray(sample["poses"][None, :1]),
        jnp.asarray(np.float32(sample["focal"])),
        jnp.zeros((1, 4, 3), jnp.float32),
        jnp.zeros((1, 4, 3), jnp.float32),
    )
    args = _Args(str(tmp_path), lr=2e-4)
    trainer = Trainer(net, variables, ds, ds, renderer, args, conf)
    sched = trainer._schedule
    assert callable(sched)
    assert float(sched(0)) == 0.0
    np.testing.assert_allclose(float(sched(10)), 2e-4, rtol=1e-6)
    np.testing.assert_allclose(float(sched(100)), 2e-5, rtol=1e-5)

    # without lr_total_steps, the unbounded --epochs sentinel (args.py
    # default 10^7) would silently hold lr at peak forever; require an
    # explicit horizon instead
    conf2 = hocon.parse_string(
        TINY_CONF.replace(
            "num_epoch_repeats = 1",
            "num_epoch_repeats = 1\n lr_policy = cosine",
        )
    )
    with pytest.raises(ValueError, match="lr_total_steps"):
        Trainer(
            net, variables, ds, ds, renderer,
            _Args(str(tmp_path), lr=2e-4, epochs=10_000_000), conf2,
        )


def test_prepare_ray_batch_shapes():
    ds = SyntheticDataset(n_objs=2, n_views=4, image_size=24)
    data = collate([ds[0], ds[1]])
    rng = np.random.default_rng(0)
    batch = prepare_ray_batch(data, 2, 32, 0.8, 1.8, True, rng)
    assert batch["src_images"].shape == (2, 2, 24, 24, 3)
    assert batch["src_poses"].shape == (2, 2, 4, 4)
    assert batch["rays"].shape == (2, 32, 8)
    assert batch["rgb_gt"].shape == (2, 32, 3)
    # bbox sampling: gt pixels come from foreground regions mostly
    np.testing.assert_allclose(
        np.linalg.norm(batch["rays"][..., 3:6], axis=-1), 1.0, atol=1e-5
    )


def test_prepare_ray_batch_fg_frac_targets_mask():
    """fg_frac draws that fraction of rays from mask-POSITIVE pixels — the
    scattered-foreground rescue (bbox warmup still drowns fragmented objects
    in background rays; mask-guided sampling cannot)."""
    ds = SyntheticDataset(n_objs=1, n_views=4, image_size=24)
    data = collate([ds[0]])
    assert "masks" in data
    rng = np.random.default_rng(0)
    R = 256
    batch = prepare_ray_batch(data, 1, R, 0.8, 1.8, False, rng, fg_frac=0.5)
    # recover which sampled pixels are foreground via the returned mask_gt
    fg = batch["mask_gt"][0] > 0.5
    # first half forced foreground; second half uniform (so >= 0.5 overall)
    assert fg[: R // 2].all()
    assert fg.mean() >= 0.5
    # fg_frac=0 must leave the uniform sampling stream untouched (the bench
    # control field depends on the exact host-rng draw sequence)
    b_off = prepare_ray_batch(
        data, 1, R, 0.8, 1.8, False, np.random.default_rng(3)
    )
    b_default = prepare_ray_batch(
        data, 1, R, 0.8, 1.8, False, np.random.default_rng(3), fg_frac=0.0
    )
    np.testing.assert_array_equal(b_off["rays"], b_default["rays"])


def test_every_batch_key_has_a_sharding():
    """Every key prepare_ray_batch can emit must be covered by the shared
    sharding table — the guard for round 3's dryrun regression, where a new
    batch key (mask_gt) existed in the Trainer's sharding dict but not in the
    driver entry's hand-built copy."""
    from pixelnerf_tpu.parallel import BATCH_KEY_KINDS, batch_shardings
    from pixelnerf_tpu.parallel import make_train_mesh

    ds = SyntheticDataset(n_objs=2, n_views=4, image_size=24)
    data = collate([ds[0], ds[1]])
    # masks present, plus an injected principal point -> the fullest batch
    # prepare_ray_batch can produce
    assert "masks" in data
    data["c"] = np.full((2, 2), 12.0, np.float32)
    batch = prepare_ray_batch(data, 1, 32, 0.8, 1.8, True,
                              np.random.default_rng(0))
    assert set(batch) <= set(BATCH_KEY_KINDS), (
        f"prepare_ray_batch emits {sorted(set(batch) - set(BATCH_KEY_KINDS))} "
        "with no sharding kind in parallel.mesh.BATCH_KEY_KINDS"
    )
    mesh = make_train_mesh(8, data_parallel=2)
    sh = batch_shardings(mesh, batch)
    assert set(sh) == set(batch)
    # unknown keys fail loudly instead of KeyError-ing inside the dryrun
    with pytest.raises(KeyError, match="BATCH_KEY_KINDS"):
        batch_shardings(mesh, {"new_key": batch["rays"]})


@pytest.mark.slow
def test_training_loss_decreases_and_resumes(tmp_path):
    conf, net, ds, renderer, variables, args, trainer = _build(tmp_path)
    data = collate([ds[0], ds[1]])
    losses = []
    for _ in range(8):
        ld = trainer.train_step(data)
        trainer.global_step += 1
        losses.append(ld["t"])
    assert np.isfinite(losses).all()
    assert min(losses[-3:]) < losses[0], losses
    assert ld["grad_norm"] > 0

    # checkpoint round-trip
    trainer.epoch = 3
    trainer.save_checkpoint()
    p0 = jax.tree.leaves(trainer.state.params)[0]

    conf2, net2, ds2, renderer2, variables2, args2, trainer2 = _build(
        tmp_path, resume=True
    )
    assert trainer2.epoch == 4  # latest stamped epoch+1
    p1 = jax.tree.leaves(trainer2.state.params)[0]
    np.testing.assert_allclose(np.asarray(p0), np.asarray(p1))
    # opt state restored too
    c0 = jax.tree.leaves(trainer.state.opt_state)
    c1 = jax.tree.leaves(trainer2.state.opt_state)
    for a, b in zip(c0, c1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_alpha_prior_epoch_gated(tmp_path):
    """loss.alpha with lambda_alpha > 0 wires the Neural-Volumes alpha prior
    (reference loss.py:4-37) into the jitted step: inactive before
    init_epoch (no 'la' term), active after (finite 'la', total includes
    it), via a one-time step rebuild when the gate flips."""
    conf = hocon.parse_string(
        TINY_CONF.replace(
            "loss {",
            "loss {\n    alpha { lambda_alpha = 0.01\n clamp_alpha = 100\n "
            "init_epoch = 2 }",
        )
    )
    net = make_model(conf["model"])
    ds = SyntheticDataset(n_objs=2, n_views=4, image_size=24)
    renderer = NeRFRenderer.from_conf(conf["renderer"])
    sample = ds[0]
    variables = jax.jit(net.init)(
        jax.random.PRNGKey(0),
        jnp.asarray(sample["images"][None, :1]),
        jnp.asarray(sample["poses"][None, :1]),
        jnp.asarray(np.float32(sample["focal"])),
        jnp.zeros((1, 4, 3), jnp.float32),
        jnp.zeros((1, 4, 3), jnp.float32),
    )
    trainer = Trainer(net, variables, ds, ds, renderer, _Args(str(tmp_path)), conf)
    assert trainer.alpha_crit is not None
    data = collate([ds[0]])

    trainer.epoch = 0
    trainer.alpha_crit.epoch = 0
    trainer._maybe_rebuild_step()
    ld0 = trainer.train_step(data)
    assert "la" not in ld0  # gate closed before init_epoch

    trainer.epoch = 2
    trainer.alpha_crit.epoch = 2
    trainer._maybe_rebuild_step()
    ld2 = trainer.train_step(data)
    assert "la" in ld2 and np.isfinite(ld2["la"])
    # total includes the prior term
    np.testing.assert_allclose(
        ld2["t"], ld2["rc"] + ld2.get("rf", 0.0) + ld2["la"], rtol=1e-5
    )


@pytest.mark.slow
def test_mask_supervised_alpha_loss(tmp_path):
    """loss.lambda_alpha_mask > 0 adds mask-supervised pixel alpha ('am'
    term) through the Trainer: prepare_ray_batch carries the sampled mask,
    the term is finite and included in the total, and its gradient pushes
    accumulated alpha toward the mask (our anti-collapse extension for
    small-foreground white-background scenes — see make_step_fns)."""
    conf = hocon.parse_string(
        TINY_CONF.replace("loss {", "loss {\n    lambda_alpha_mask = 1.0")
    )
    net = make_model(conf["model"])
    ds = SyntheticDataset(n_objs=2, n_views=4, image_size=24)
    renderer = NeRFRenderer.from_conf(conf["renderer"])
    sample = ds[0]
    variables = jax.jit(net.init)(
        jax.random.PRNGKey(0),
        jnp.asarray(sample["images"][None, :1]),
        jnp.asarray(sample["poses"][None, :1]),
        jnp.asarray(np.float32(sample["focal"])),
        jnp.zeros((1, 4, 3), jnp.float32),
        jnp.zeros((1, 4, 3), jnp.float32),
    )
    trainer = Trainer(net, variables, ds, ds, renderer, _Args(str(tmp_path)), conf)
    assert trainer.lambda_alpha_mask == 1.0
    data = collate([ds[0]])

    # the sampled-ray batch carries the per-ray mask
    batch = prepare_ray_batch(
        data, 1, 32, ds.z_near, ds.z_far, False, np.random.default_rng(0)
    )
    assert batch["mask_gt"].shape == (1, 32)
    assert set(np.unique(batch["mask_gt"])) <= {0.0, 1.0}

    ams = []
    for _ in range(6):
        ld = trainer.train_step(data)
        trainer.global_step += 1
        assert "am" in ld and np.isfinite(ld["am"])
        np.testing.assert_allclose(
            ld["t"], ld["rc"] + ld.get("rf", 0.0) + ld["am"], rtol=1e-5
        )
        ams.append(float(ld["am"]))
    assert min(ams[-2:]) < ams[0], ams  # alpha moves toward the mask


def test_eval_step_and_vis_free(tmp_path):
    conf, net, ds, renderer, variables, args, trainer = _build(tmp_path)
    data = collate([ds[0]])
    ld = trainer.eval_step(data)
    assert np.isfinite(ld["t"])


def test_checkpoint_retention(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ck"), strategy="keep_last", keep_last=2)
    for e in range(5):
        mgr.save({"epoch": e, "x": np.zeros(4)}, e)
    assert mgr.epochs_on_disk() == [3, 4]
    mgr2 = CheckpointManager(
        str(tmp_path / "ck2"), strategy="milestone", milestone_interval=2
    )
    for e in range(5):
        mgr2.save({"epoch": e, "x": np.zeros(4)}, e)
    # milestones (multiples of 2) + most recent survive
    assert mgr2.epochs_on_disk() == [0, 2, 4]


def test_render_pipeline_multidevice_matches_single():
    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    conf = hocon.parse_string(TINY_CONF)
    net = make_model(conf["model"])
    ds = SyntheticDataset(n_objs=1, n_views=2, image_size=24)
    sample = ds[0]
    variables = jax.jit(net.init)(
        jax.random.PRNGKey(0),
        jnp.asarray(sample["images"][None, :1]),
        jnp.asarray(sample["poses"][None, :1]),
        jnp.asarray(np.float32(sample["focal"])),
        jnp.zeros((1, 4, 3), jnp.float32),
        jnp.zeros((1, 4, 3), jnp.float32),
    )
    scene = net.apply(
        variables,
        jnp.asarray(sample["images"][None, :1]),
        jnp.asarray(sample["poses"][None, :1]),
        jnp.asarray(np.float32(sample["focal"])),
        method=PixelNeRFNet.encode,
    )
    rays = geometry.gen_rays_np(
        sample["poses"][1:2], 24, 24, float(sample["focal"]), 0.8, 1.8
    ).reshape(-1, 8)

    renderer = NeRFRenderer.from_conf(conf["renderer"])
    single = RenderPipeline(net, renderer, mesh=None)
    multi = RenderPipeline(net, renderer, mesh=make_ray_mesh(8))
    rng = jax.random.PRNGKey(5)
    out1 = single.render(variables, scene, rays, rng, ray_batch_size=200)
    out8 = multi.render(variables, scene, rays, rng, ray_batch_size=200)
    # same rng + same chunking -> identical sampling; sharding must not change math
    np.testing.assert_allclose(
        out1["coarse"]["rgb"], out8["coarse"]["rgb"], atol=2e-5
    )
    np.testing.assert_allclose(
        out1["coarse"]["depth"], out8["coarse"]["depth"], atol=2e-5
    )
    assert out1["coarse"]["rgb"].shape == (rays.shape[0], 3)


def test_render_simple_u8_wire_format_matches_f32():
    """pack="u8" (video-frame wire format: uint8 rgb + f16 depth, 5 B/ray
    over the D2H link) must agree with the f32 pack to quantization
    tolerance, accept device-committed ray arrays (upload-once callers), and
    produce frames bit-equal to quantizing the f32 render."""
    conf = hocon.parse_string(TINY_CONF)
    net = make_model(conf["model"])
    ds = SyntheticDataset(n_objs=1, n_views=2, image_size=24)
    sample = ds[0]
    variables = jax.jit(net.init)(
        jax.random.PRNGKey(0),
        jnp.asarray(sample["images"][None, :1]),
        jnp.asarray(sample["poses"][None, :1]),
        jnp.asarray(np.float32(sample["focal"])),
        jnp.zeros((1, 4, 3), jnp.float32),
        jnp.zeros((1, 4, 3), jnp.float32),
    )
    scene = net.apply(
        variables,
        jnp.asarray(sample["images"][None, :1]),
        jnp.asarray(sample["poses"][None, :1]),
        jnp.asarray(np.float32(sample["focal"])),
        method=PixelNeRFNet.encode,
    )
    rays = geometry.gen_rays_np(
        sample["poses"][1:2], 24, 24, float(sample["focal"]), 0.8, 1.8
    ).reshape(-1, 8)

    pipeline = RenderPipeline(net, NeRFRenderer.from_conf(conf["renderer"]))
    rng = jax.random.PRNGKey(5)
    rgb_f, d_f = pipeline.render_simple(
        variables, scene, rays, rng, ray_batch_size=200, pack="f32"
    )
    # device-committed rays exercise the upload-once path (pad == 0 slice)
    rays_dev = jax.device_put(jnp.asarray(rays[: (rays.shape[0] // 200) * 200]))
    rgb_u, d_u = pipeline.render_simple(
        variables, scene, rays_dev, rng, ray_batch_size=200, pack="u8"
    )
    n = rays_dev.shape[0]
    assert np.abs(rgb_u - rgb_f[:n]).max() <= 0.5 / 255 + 1e-6
    assert np.abs(d_u - d_f[:n]).max() <= 2e-3 * max(float(d_f.max()), 1.0)
    # the frames a video writer would emit are identical
    q = lambda x: np.round(np.clip(x, 0, 1) * 255).astype(np.uint8)
    np.testing.assert_array_equal(q(rgb_u), q(rgb_f[:n]))

    # u8 wire + ray-mesh sharding compose (gen_video --gpu_id path): same
    # chunking -> same draws -> bit-equal frames
    multi = RenderPipeline(
        net, NeRFRenderer.from_conf(conf["renderer"]), mesh=make_ray_mesh(8)
    )
    rgb_m, d_m = multi.render_simple(
        variables, scene, rays[:n], rng, ray_batch_size=200, pack="u8"
    )
    np.testing.assert_array_equal(q(rgb_m), q(rgb_u))
    np.testing.assert_allclose(d_m, d_u, atol=2e-3)


@pytest.mark.slow
def test_trainer_mesh_sharded_step(tmp_path):
    """Trainer with a ("data","rays") mesh runs sharded steps that match the
    single-device trainer numerically."""
    from pixelnerf_tpu.parallel import make_train_mesh

    conf, net, ds, renderer, variables, args, tr1 = _build(tmp_path / "a")
    mesh = make_train_mesh(8, data_parallel=2)  # (2, 4)
    conf2 = hocon.parse_string(TINY_CONF)
    args2 = _Args(str(tmp_path / "b"))
    tr2 = Trainer(net, variables, ds, ds, renderer, args2, conf2, mesh=mesh)
    data = collate([ds[0], ds[1]])

    # identical rng + identical batch -> identical loss on both trainers
    tr1.rng = np.random.default_rng(5)
    tr2.rng = np.random.default_rng(5)
    tr1.jrng = jax.random.PRNGKey(11)
    tr2.jrng = jax.random.PRNGKey(11)
    ld1 = tr1.train_step(data)
    ld2 = tr2.train_step(data)
    assert ld2 is not None and np.isfinite(ld2["t"])
    np.testing.assert_allclose(ld1["t"], ld2["t"], rtol=2e-3)
    np.testing.assert_allclose(ld1["grad_norm"], ld2["grad_norm"], rtol=2e-3)


@pytest.mark.slow
@pytest.mark.parametrize("nviews", ["1", "2"])
def test_trainer_fused_mlp_matches_xla(tmp_path, monkeypatch, nviews):
    """Training with the fused Pallas field kernel (custom-VJP backward,
    ops.resnetfc_vjp) matches the XLA MLP step numerically: identical batch +
    rng => matching losses and gradient norms over several optimizer steps.

    Runs amp=False so the interpret-mode kernel (f32) and the XLA path (f32,
    highest precision) are directly comparable; on TPU both sides run bf16
    with f32 accumulation.  Covers NS=1 and the multi-view point-major packing
    (SB=2 objects x NS=2 views) in the same step.
    """
    monkeypatch.setenv("PIXELNERF_PALLAS_INTERPRET", "1")
    conf, _, ds, renderer, variables, _, tr_x = _build(
        tmp_path / "x", use_amp=False, nviews=nviews
    )
    net_p = make_model(conf["model"], mlp_impl="pallas", diff_mode=True)
    conf2 = hocon.parse_string(TINY_CONF)
    args2 = _Args(str(tmp_path / "p"), use_amp=False, nviews=nviews)
    tr_p = Trainer(net_p, variables, ds, ds, renderer, args2, conf2)

    tr_x.rng = np.random.default_rng(7)
    tr_p.rng = np.random.default_rng(7)
    tr_x.jrng = jax.random.PRNGKey(3)
    tr_p.jrng = jax.random.PRNGKey(3)
    data = collate([ds[0], ds[1]])
    for step in range(3):
        ld_x = tr_x.train_step(data)
        ld_p = tr_p.train_step(data)
        assert np.isfinite(ld_p["t"]), ld_p
        np.testing.assert_allclose(ld_p["t"], ld_x["t"], rtol=2e-3)
        np.testing.assert_allclose(
            ld_p["grad_norm"], ld_x["grad_norm"], rtol=5e-3
        )
    # the parameters diverge only by kernel-vs-XLA rounding.  Adam normalizes
    # near-zero grads to full-lr steps, so ANY rounding difference can move a
    # few isolated elements by up to 2 x (steps x lr) — a per-element max is
    # inherently flaky.  A systematic gradient bug (e.g. view-packing
    # scramble) corrupts a large fraction of elements instead, so bound THAT.
    budget = 3 * tr_x.args.lr
    drifted = total = 0
    for a, b in zip(
        jax.tree.leaves(tr_x.state.params), jax.tree.leaves(tr_p.state.params)
    ):
        d = np.abs(np.asarray(b) - np.asarray(a))
        drifted += int(np.sum(d > 0.25 * budget))
        total += d.size
    assert drifted / total < 1e-3, (drifted, total)
