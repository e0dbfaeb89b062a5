"""Coverage for losses, metrics, checkpoint IO (incl. torch import), the LPIPS
converter, and the monitor/diagnostic utilities."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from pixelnerf_tpu.config import hocon
from pixelnerf_tpu.models import losses
from pixelnerf_tpu.utils import metrics


def test_rgb_loss_selection():
    conf = hocon.parse_string("rgb { use_l1 = True }\nrgb2 { use_l1 = False }\nrgb3 { type = l2 }")
    l1 = losses.get_rgb_loss(conf["rgb"])
    l2 = losses.get_rgb_loss(conf["rgb2"])
    l2b = losses.get_rgb_loss(conf["rgb3"])
    a = jnp.asarray([[1.0, 2.0]])
    b = jnp.asarray([[0.0, 0.0]])
    assert float(l1(a, b)) == pytest.approx(1.5)
    assert float(l2(a, b)) == pytest.approx(2.5)
    assert float(l2b(a, b)) == pytest.approx(2.5)


def test_uncertainty_loss():
    conf = hocon.parse_string("rgb { use_l1 = False\n use_uncertainty = True }")
    crit = losses.get_rgb_loss(conf["rgb"], coarse=False)
    pred = jnp.ones((4, 3))
    target = jnp.zeros((4, 3))
    betas = jnp.ones((4,))
    # mse per elem = 1 -> mean/beta = 1, log(1) = 0
    assert float(crit(pred, target, betas)) == pytest.approx(1.0)


def test_alpha_loss_epoch_gating():
    conf = hocon.parse_string(
        "alpha { lambda_alpha = 0.5\n clamp_alpha = 100\n init_epoch = 2 }"
    )
    al = losses.get_alpha_loss(conf["alpha"])
    x = jnp.full((8,), 0.5)
    assert float(al(x)) == 0.0  # epoch 0 < init_epoch
    al.sched_step(2)
    val = float(al(x))
    # 0.5 * mean(log(.5)+log(.5)) = 0.5 * 2*log(0.5)
    assert val == pytest.approx(0.5 * 2 * np.log(0.5), rel=1e-5)


def test_psnr_and_ssim_basics():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (32, 32, 3))
    assert metrics.psnr(img, img) == float("inf")
    assert metrics.ssim(img, img) == pytest.approx(1.0, abs=1e-6)
    noisy = np.clip(img + rng.normal(0, 0.1, img.shape), 0, 1)
    p = metrics.psnr(noisy, img)
    assert 15 < p < 25
    s = metrics.ssim(noisy, img)
    assert 0.2 < s < 0.95
    # more noise -> strictly worse
    noisier = np.clip(img + rng.normal(0, 0.3, img.shape), 0, 1)
    assert metrics.ssim(noisier, img) < s
    assert metrics.psnr(noisier, img) < p


def test_cmap_and_uint8():
    img = np.linspace(0, 1, 64).reshape(8, 8)
    u8 = metrics.image_float_to_uint8(img)
    assert u8.dtype == np.uint8 and u8.min() == 0 and u8.max() == 255
    cm = metrics.cmap(img)
    assert cm.shape == (8, 8, 3) and cm.dtype == np.uint8


def test_model_checkpoint_roundtrip_and_torch_detection(tmp_path):
    from pixelnerf_tpu.train import checkpoints

    variables = {
        "params": {"layer": {"kernel": np.arange(6, dtype=np.float32).reshape(2, 3)}},
        "batch_stats": {"bn": {"mean": np.zeros(3, np.float32)}},
    }
    path = str(tmp_path / "pixel_nerf_latest")
    checkpoints.save_model(path, variables)
    loaded = checkpoints.load_model(path, target_variables=variables)
    np.testing.assert_allclose(
        loaded["params"]["layer"]["kernel"], variables["params"]["layer"]["kernel"]
    )
    # overwrite creates a backup copy
    checkpoints.save_model(path, variables)
    assert os.path.exists(path + "_backup")

    # a torch-format file at the same path is detected and converted
    tpath = str(tmp_path / "torch_ckpt")
    torch.save({"mlp_coarse.lin_out.weight": torch.ones(4, 8)}, tpath)
    out = checkpoints.load_model(tpath)
    assert out["params"]["mlp_coarse"]["lin_out"]["kernel"].shape == (8, 4)


def test_partial_merge_keeps_uninitialized(tmp_path):
    from pixelnerf_tpu.train.checkpoints import _merge_variables

    base = {
        "params": {
            "a": {"kernel": np.zeros((2, 2), np.float32)},
            "b": {"kernel": np.ones((3, 3), np.float32)},
        }
    }
    update = {"params": {"a": {"kernel": np.full((2, 2), 7.0, np.float32)}}}
    merged = _merge_variables(base, update)
    np.testing.assert_allclose(merged["params"]["a"]["kernel"], 7.0)
    np.testing.assert_allclose(merged["params"]["b"]["kernel"], 1.0)
    # shape-mismatched leaves are rejected, base kept
    bad = {"params": {"b": {"kernel": np.zeros((5, 5), np.float32)}}}
    merged = _merge_variables(base, bad)
    np.testing.assert_allclose(merged["params"]["b"]["kernel"], 1.0)


@pytest.mark.slow
def test_lpips_converter_and_forward(tmp_path):
    """Build a fake torchvision-layout VGG16 state dict + lin heads, convert,
    and run LPIPS forward; identical inputs must give ~0 distance."""
    from pixelnerf_tpu.eval import lpips as L

    sd = {}
    conv_positions = []
    idx = 0
    for filters, n_convs in L._VGG_BLOCKS:
        for _ in range(n_convs):
            conv_positions.append((idx, filters))
            idx += 2
        idx += 1
    cin = 3
    g = torch.Generator().manual_seed(0)
    for pos, filters in conv_positions:
        sd[f"features.{pos}.weight"] = torch.randn(filters, cin, 3, 3, generator=g) * 0.05
        sd[f"features.{pos}.bias"] = torch.zeros(filters)
        cin = filters
    taps = [64, 128, 256, 512, 512]
    for i, ch in enumerate(taps):
        sd[f"lin{i}.model.1.weight"] = torch.rand(1, ch, 1, 1, generator=g)
    path = str(tmp_path / "lpips_vgg.pth")
    torch.save(sd, path)

    variables = L.load_torch_lpips(path)
    model = L.LPIPS()
    x = np.random.default_rng(0).uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32)
    d_same = np.asarray(model.apply(variables, jnp.asarray(x), jnp.asarray(x)))
    assert d_same.shape == (1,)
    assert abs(float(d_same)) < 1e-6
    y = np.clip(x + 0.5, -1, 1).astype(np.float32)
    d_diff = float(np.asarray(model.apply(variables, jnp.asarray(x), jnp.asarray(y))))
    assert d_diff > 1e-4


@pytest.mark.slow
def test_monitor_and_diagnostic(tmp_path, capsys):
    from pixelnerf_tpu.data import SyntheticDataset
    from pixelnerf_tpu.train.diagnostic import DiagnosticTool
    from pixelnerf_tpu.train.monitor import TrainingMonitor

    mon = TrainingMonitor(window_size=5)
    for i in range(20):
        mon.update(1.0 / (i + 1), 10 + i * 0.01)
    stats = mon.get_stats()
    assert 0 < stats["loss_mean"] < 1
    mon.print_stats(0, 10, 100)
    assert mon.check_convergence(patience=5, threshold=1.0)  # tiny improvement

    diag = DiagnosticTool(save_dir=str(tmp_path / "dbg"))
    ds = SyntheticDataset(n_objs=1, n_views=2, image_size=16)
    assert diag.check_data_range(ds, num_samples=1)

    from pixelnerf_tpu.models import make_model

    conf = hocon.parse_string(
        "model { use_encoder = True\n use_xyz = True\n use_viewdirs = False\n"
        " use_code = False\n"
        " mlp_coarse { type = resnet\n n_blocks = 2\n d_hidden = 16 }\n"
        " mlp_fine { type = empty }\n"
        " encoder { backbone = resnet18\n pretrained = False\n num_layers = 1 } }"
    )
    net = make_model(conf["model"])
    s = ds[0]
    variables = jax.jit(net.init)(
        jax.random.PRNGKey(0),
        jnp.asarray(s["images"][None, :1]),
        jnp.asarray(s["poses"][None, :1]),
        jnp.asarray(np.float32(s["focal"])),
        jnp.zeros((1, 4, 3), jnp.float32),
        None,
    )
    assert diag.check_model_architecture(net, variables)
    assert diag.check_model_output(net, variables, s)


@pytest.mark.slow
def test_conv_encoder_path():
    from pixelnerf_tpu.models import make_model
    from pixelnerf_tpu.models.pixelnerf import PixelNeRFNet

    conf = hocon.parse_string(
        "model { use_encoder = True\n use_xyz = True\n use_viewdirs = False\n"
        " use_code = False\n"
        " mlp_coarse { type = resnet\n n_blocks = 2\n d_hidden = 16 }\n"
        " mlp_fine { type = empty }\n"
        " encoder { type = conv } }"
    )
    net = make_model(conf["model"])
    rng = np.random.default_rng(0)
    images = rng.normal(size=(1, 1, 32, 32, 3)).astype(np.float32)
    poses = np.tile(np.eye(4, dtype=np.float32), (1, 1, 1, 1)).reshape(1, 1, 4, 4)
    poses[..., 2, 3] = 1.4
    xyz = (rng.normal(size=(1, 6, 3)) * 0.3).astype(np.float32)
    variables = jax.jit(net.init)(
        jax.random.PRNGKey(0), jnp.asarray(images), jnp.asarray(poses),
        jnp.asarray(np.float32(20.0)), jnp.asarray(xyz), None,
    )
    scene = net.apply(
        variables, jnp.asarray(images), jnp.asarray(poses),
        jnp.asarray(np.float32(20.0)), method=PixelNeRFNet.encode,
    )
    assert scene.latents.shape == (1, 32, 32, 128)  # full-res, 128ch
    out = net.apply(variables, scene, jnp.asarray(xyz), method=PixelNeRFNet.query)
    assert out.shape == (1, 6, 4) and np.isfinite(np.asarray(out)).all()


def test_warping_identity():
    from pixelnerf_tpu.utils import warping

    rng = np.random.default_rng(0)
    B, H, W = 1, 16, 16
    img = rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32)
    depth = np.full((B, H, W), 2.0, np.float32)
    K = np.array([[[20.0, 0, 8], [0, 20.0, 8], [0, 0, 1]]], np.float32)
    identity = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
    warped, valid = warping.warp_image(
        jnp.asarray(img), jnp.asarray(depth), jnp.asarray(K), jnp.asarray(identity)
    )
    # identity pose: image maps onto itself
    np.testing.assert_allclose(np.asarray(warped), img, atol=1e-4)
    assert float(np.asarray(valid).mean()) == pytest.approx(1.0)
    occl = warping.compute_occlusion_mask(jnp.asarray(depth), jnp.asarray(depth))
    assert float(np.asarray(occl).mean()) == 1.0
    err = warping.compute_reprojection_error(
        jnp.asarray(img), warped, valid
    )
    assert float(err) < 1e-4
    views = warping.sample_random_views(10, 3, rng, exclude=(0, 1))
    assert len(views) == 3 and all(v >= 2 for v in views)


@pytest.mark.slow
def test_lpips_golden_vs_torch_reimplementation(tmp_path):
    """Golden-value LPIPS test (VERDICT #8): synthetic torch lpips-layout
    weights -> converter -> Flax forward must EQUAL an independent torch
    reimplementation of LPIPS(net='vgg') (the reference's metric,
    calc_metrics.py:17,186): scaling layer, VGG16 taps at each block's last
    relu, per-location unit normalization, 1x1 lin heads, spatial mean, sum
    over taps."""
    import torch.nn.functional as F

    from pixelnerf_tpu.eval import lpips as L

    # --- synthetic weights in the torch lpips package layout ---
    sd = {}
    conv_positions = []
    idx = 0
    for filters, n_convs in L._VGG_BLOCKS:
        for _ in range(n_convs):
            conv_positions.append((idx, filters))
            idx += 2
        idx += 1
    cin = 3
    g = torch.Generator().manual_seed(7)
    for pos, filters in conv_positions:
        sd[f"features.{pos}.weight"] = (
            torch.randn(filters, cin, 3, 3, generator=g) * 0.08
        )
        sd[f"features.{pos}.bias"] = torch.randn(filters, generator=g) * 0.01
        cin = filters
    taps = [64, 128, 256, 512, 512]
    for i, ch in enumerate(taps):
        sd[f"lin{i}.model.1.weight"] = torch.rand(1, ch, 1, 1, generator=g)
    path = str(tmp_path / "lpips_vgg.pth")
    torch.save(sd, path)

    # --- torch twin ---
    def torch_lpips(x_np, y_np):
        shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
        scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

        def feats(t):
            t = (t - shift) / scale
            out = []
            pos = 0
            for bi, (filters, n_convs) in enumerate(L._VGG_BLOCKS):
                for _ in range(n_convs):
                    t = F.relu(
                        F.conv2d(
                            t,
                            sd[f"features.{pos}.weight"],
                            sd[f"features.{pos}.bias"],
                            padding=1,
                        )
                    )
                    pos += 2
                pos += 1
                out.append(t)
                if bi < len(L._VGG_BLOCKS) - 1:
                    t = F.max_pool2d(t, 2, 2)
            return out

        x = torch.from_numpy(np.transpose(x_np, (0, 3, 1, 2)))
        y = torch.from_numpy(np.transpose(y_np, (0, 3, 1, 2)))
        total = 0.0
        with torch.no_grad():
            for i, (a, b) in enumerate(zip(feats(x), feats(y))):
                a = a / (a.norm(dim=1, keepdim=True) + 1e-10)
                b = b / (b.norm(dim=1, keepdim=True) + 1e-10)
                d = (a - b) ** 2
                w = F.conv2d(d, sd[f"lin{i}.model.1.weight"])
                total = total + w.mean(dim=(1, 2, 3))
        return total.numpy()

    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    y = np.clip(x + rng.normal(0, 0.2, x.shape), -1, 1).astype(np.float32)

    variables = L.load_torch_lpips(path)
    model = L.LPIPS()
    with jax.default_matmul_precision("highest"):
        ours = np.asarray(model.apply(variables, jnp.asarray(x), jnp.asarray(y)))
    ref = torch_lpips(x, y)
    assert ours.shape == ref.shape == (2,)
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=1e-6)
    assert (ref > 1e-4).all()  # non-trivial distances


def test_study_scenes_case_parsing():
    """scripts/study_scenes.py STUDY_CASES grammar: scene:conf:ns[:hw[:K=V,..]]
    (the accel scene-family study's override surface, docs/SCENES.md)."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    import study_scenes

    cases = study_scenes.parse_cases(
        "sphere:dtu:3:76x100:BENCH_TRAIN_ALPHA=1.0,BENCH_TRAIN_BBOX_FRAC=0.5;"
        "multi3:sn64:1;"
        "thin:srn:2::BENCH_TRAIN_ALPHA=1.0"
    )
    assert cases == [
        ("sphere", "dtu", 3, "76x100",
         {"BENCH_TRAIN_ALPHA": "1.0", "BENCH_TRAIN_BBOX_FRAC": "0.5"}),
        ("multi3", "sn64", 1, "", {}),
        ("thin", "srn", 2, "", {"BENCH_TRAIN_ALPHA": "1.0"}),
    ]
    # the committed default table: every row (scene, conf, ns, hw, env), every
    # override key a quick_train knob that run_case resets between cases
    for row in study_scenes.DEFAULT_CASES:
        assert len(row) == 5 and isinstance(row[4], dict)
        assert set(row[4]) <= set(study_scenes._KNOBS)
    # malformed overrides fail loudly; non-knob keys (which run_case would not
    # reset between cases) are rejected; trailing empty fields are tolerated
    with pytest.raises(ValueError, match="expected K=V"):
        study_scenes.parse_cases("sphere:sn64:1:hw:BENCH_TRAIN_ALPHA")
    with pytest.raises(ValueError, match="unknown recipe knob"):
        study_scenes.parse_cases("sphere:sn64:1::BENCH_ACCEL=0")
    assert study_scenes.parse_cases("sphere:sn64:1:hw:") == [
        ("sphere", "sn64", 1, "hw", {})
    ]
    # values containing '=' split only on the first
    assert study_scenes.parse_cases(
        "sphere:sn64:1::BENCH_TRAIN_LR=1e-4"
    )[0][4] == {"BENCH_TRAIN_LR": "1e-4"}
