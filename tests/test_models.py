"""Model-layer tests: positional encoding golden values, ResNet backbone parity with
an independently-written torch ResNet34 + converted weights, ResnetFC parity and
multi-view combine semantics, and PixelNeRFNet end-to-end shape/range checks."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn

from pixelnerf_tpu.config import hocon
from pixelnerf_tpu.models import (
    PixelNeRFNet,
    PositionalEncoding,
    ResnetFC,
    SpatialEncoder,
    make_model,
)
from pixelnerf_tpu.models.resnet import ResNetFeatures
from pixelnerf_tpu.utils import torch_convert


# ---------------------------------------------------------------------------
# Positional encoding
# ---------------------------------------------------------------------------


def test_positional_encoding_layout():
    pe = PositionalEncoding(num_freqs=2, d_in=3, freq_factor=1.5, include_input=True)
    x = np.random.default_rng(0).normal(size=(5, 3)).astype(np.float32)
    out = np.asarray(pe(jnp.asarray(x)))
    assert out.shape == (5, pe.d_out) and pe.d_out == 2 * 2 * 3 + 3
    # layout: [x, sin(f0 x), cos(f0 x), sin(f1 x), cos(f1 x)]
    f0, f1 = 1.5, 3.0
    np.testing.assert_allclose(out[:, :3], x, atol=1e-6)
    np.testing.assert_allclose(out[:, 3:6], np.sin(f0 * x), atol=1e-6)
    np.testing.assert_allclose(out[:, 6:9], np.cos(f0 * x), atol=1e-6)
    np.testing.assert_allclose(out[:, 9:12], np.sin(f1 * x), atol=1e-6)
    np.testing.assert_allclose(out[:, 12:15], np.cos(f1 * x), atol=1e-6)


def test_positional_encoding_from_conf():
    conf = hocon.parse_string(
        "code { num_freqs = 6\n freq_factor = 1.5\n include_input = True }"
    )
    pe = PositionalEncoding.from_conf(conf["code"], d_in=6)
    assert pe.d_out == 6 * 2 * 6 + 6  # 78, backup2's d_in for sn64 multiview


# ---------------------------------------------------------------------------
# Torch reference ResNet34 (written independently for parity testing)
# ---------------------------------------------------------------------------


class TorchBasicBlock(tnn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout)
        if stride != 1 or cin != cout:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride, bias=False), tnn.BatchNorm2d(cout)
            )
        else:
            self.downsample = None

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = torch.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return torch.relu(y + idt)


class TorchResNet34Trunk(tnn.Module):
    """conv1..layer3, matching torchvision parameter naming."""

    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        def stage(cin, cout, n, stride):
            blocks = [TorchBasicBlock(cin, cout, stride)]
            blocks += [TorchBasicBlock(cout, cout) for _ in range(n - 1)]
            return tnn.Sequential(*blocks)
        self.layer1 = stage(64, 64, 3, 1)
        self.layer2 = stage(64, 128, 4, 2)
        self.layer3 = stage(128, 256, 6, 2)

    def forward(self, x, use_first_pool=True):
        feats = []
        x = torch.relu(self.bn1(self.conv1(x)))
        if use_first_pool:
            x = self.maxpool(x)
        feats.append(x)
        for layer in (self.layer1, self.layer2, self.layer3):
            x = layer(x)
            feats.append(x)
        return feats


def _randomize_bn_stats(model, seed=0):
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.1)
            m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) + 0.5)


@pytest.mark.slow
@pytest.mark.parametrize("use_first_pool", [True, False])
def test_resnet_backbone_parity(use_first_pool):
    torch.manual_seed(0)
    tmodel = TorchResNet34Trunk().eval()
    with torch.no_grad():
        _randomize_bn_stats(tmodel)
    sd = tmodel.state_dict()
    variables = torch_convert.convert_resnet(sd)

    x = np.random.default_rng(1).normal(size=(2, 64, 64, 3)).astype(np.float32)
    model = ResNetFeatures(
        backbone="resnet34", num_layers=4, use_first_pool=use_first_pool
    )
    # shape-check against a fresh init (catches naming/shape drift)
    init_vars = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    problems = torch_convert.tree_shapes_match(
        jax.tree.map(np.asarray, variables["params"]),
        jax.tree.map(np.asarray, init_vars["params"]),
    )
    assert not problems, problems[:5]

    with jax.default_matmul_precision("highest"):
        feats = model.apply(
            {"params": variables["params"], "batch_stats": variables["batch_stats"]},
            jnp.asarray(x),
            train=False,
        )
    with torch.no_grad():
        tfeats = tmodel(
            torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
            use_first_pool=use_first_pool,
        )
    assert len(feats) == len(tfeats) == 4
    for f, tf in zip(feats, tfeats):
        ref = tf.permute(0, 2, 3, 1).numpy()
        assert f.shape == ref.shape
        np.testing.assert_allclose(np.asarray(f), ref, atol=2e-3, rtol=1e-3)


# ---------------------------------------------------------------------------
# ResnetFC
# ---------------------------------------------------------------------------


class TorchResnetBlockFC(tnn.Module):
    def __init__(self, d):
        super().__init__()
        self.fc_0 = tnn.Linear(d, d)
        self.fc_1 = tnn.Linear(d, d)

    def forward(self, x):
        net = self.fc_0(torch.relu(x))
        dx = self.fc_1(torch.relu(net))
        return x + dx


class TorchResnetFC(tnn.Module):
    def __init__(self, d_in, d_latent, d_hidden, n_blocks, combine_layer, d_out=4):
        super().__init__()
        self.lin_in = tnn.Linear(d_in, d_hidden)
        self.lin_out = tnn.Linear(d_hidden, d_out)
        self.blocks = tnn.ModuleList(
            [TorchResnetBlockFC(d_hidden) for _ in range(n_blocks)]
        )
        n_lin_z = min(combine_layer, n_blocks)
        self.lin_z = tnn.ModuleList(
            [tnn.Linear(d_latent, d_hidden) for _ in range(n_lin_z)]
        )
        self.d_latent, self.combine_layer, self.n_blocks = (
            d_latent,
            combine_layer,
            n_blocks,
        )

    def forward(self, zx, inner_dims):
        z, x = zx[..., : self.d_latent], zx[..., self.d_latent :]
        x = self.lin_in(x)
        for i in range(self.n_blocks):
            if i == self.combine_layer:
                # matches util.combine_interleaved: (NS*B, d) -> (1, B, d)
                x = x.reshape(-1, *inner_dims, x.shape[-1]).mean(dim=1)
            if i < self.combine_layer:
                x = x + self.lin_z[i](z if i < self.combine_layer else z)
            x = self.blocks[i](x)
        return self.lin_out(torch.relu(x))


def test_resnetfc_parity_multiview():
    d_in, d_latent, d_hidden, n_blocks, combine_layer = 9, 16, 32, 5, 3
    NS, B = 2, 7
    torch.manual_seed(1)
    tm = TorchResnetFC(d_in, d_latent, d_hidden, n_blocks, combine_layer).eval()
    sd = {f"mlp_coarse.{k}": v for k, v in tm.state_dict().items()}
    conv = torch_convert.convert_pixelnerf(sd)

    zx = np.random.default_rng(2).normal(size=(NS * B, d_latent + d_in)).astype(
        np.float32
    )
    with torch.no_grad():
        # torch combine leaves (1, B, d) folded back to (B, d) inside forward
        ref = tm(torch.from_numpy(zx), (NS, B)).numpy()

    model = ResnetFC(
        d_out=4,
        n_blocks=n_blocks,
        d_latent=d_latent,
        d_hidden=d_hidden,
        combine_layer=combine_layer,
    )
    with jax.default_matmul_precision("highest"):
        out = model.apply(
            {"params": conv["params"]["mlp_coarse"]},
            jnp.asarray(zx),
            combine_inner_dims=(NS, B),
        )
    assert out.shape == (1, B, 4) and ref.shape == (1, B, 4)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=1e-4)


def test_resnetfc_combine_average_semantics():
    """Hidden states of NS views must be averaged exactly at combine_layer: for a
    latent-free net, feeding identical views == feeding one view."""
    model = ResnetFC(d_out=4, n_blocks=4, d_latent=0, d_hidden=16, combine_layer=2)
    x1 = np.random.default_rng(3).normal(size=(5, 8)).astype(np.float32)
    # view-major layout (backup2:170 + flatten): all B points of view 0, then view 1
    x2 = np.tile(x1, (2, 1))
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x1))["params"]
    out1 = model.apply({"params": params}, jnp.asarray(x1), combine_inner_dims=(1, 5))
    out2 = model.apply({"params": params}, jnp.asarray(x2), combine_inner_dims=(2, 5))
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)


# ---------------------------------------------------------------------------
# PixelNeRFNet end-to-end
# ---------------------------------------------------------------------------


SMALL_CONF = """
model {
    use_encoder = True
    use_xyz = True
    use_code = True
    code { num_freqs = 6\n freq_factor = 1.5\n include_input = True }
    use_viewdirs = True
    use_code_viewdirs = False
    mlp_coarse { type = resnet\n n_blocks = 3\n d_hidden = 64\n combine_layer = 2\n combine_type = average }
    mlp_fine { type = resnet\n n_blocks = 3\n d_hidden = 64\n combine_layer = 2\n combine_type = average }
    encoder { backbone = resnet34\n pretrained = False\n num_layers = 2\n use_first_pool = False }
}
"""


def _init_net(conf_text=SMALL_CONF, SB=2, NS=2, H=32, W=32, B=11):
    conf = hocon.parse_string(conf_text)
    net = make_model(conf["model"])
    rng = np.random.default_rng(4)
    images = rng.normal(size=(SB, NS, H, W, 3)).astype(np.float32)
    poses = np.tile(np.eye(4, dtype=np.float32), (SB, NS, 1, 1))
    poses[..., 2, 3] = 1.4  # cameras at z=+1.4 looking down -z
    xyz = rng.normal(size=(SB, B, 3)).astype(np.float32) * 0.3
    viewdirs = rng.normal(size=(SB, B, 3)).astype(np.float32)
    viewdirs /= np.linalg.norm(viewdirs, axis=-1, keepdims=True)
    focal = np.array(20.0, dtype=np.float32)
    # jitted: eager Module.init dispatches thousands of per-op CPU kernels
    # (measured 64 s cold vs 9 s jitted on this host) — the fast tier's
    # single biggest cost
    variables = jax.jit(net.init)(
        jax.random.PRNGKey(0),
        jnp.asarray(images),
        jnp.asarray(poses),
        jnp.asarray(focal),
        jnp.asarray(xyz),
        jnp.asarray(viewdirs),
    )
    return net, variables, images, poses, focal, xyz, viewdirs


def test_pixelnerf_shapes_and_ranges():
    net, variables, images, poses, focal, xyz, viewdirs = _init_net()
    scene = net.apply(
        variables,
        jnp.asarray(images),
        jnp.asarray(poses),
        jnp.asarray(focal),
        method=PixelNeRFNet.encode,
    )
    assert scene.num_views_per_obj == 2
    assert scene.poses.shape == (4, 3, 4)
    assert scene.focal.shape == (4, 2) and float(scene.focal[0, 1]) == -20.0
    assert scene.c.shape == (4, 2)

    out = net.apply(
        variables,
        scene,
        jnp.asarray(xyz),
        viewdirs=jnp.asarray(viewdirs),
        coarse=True,
        method=PixelNeRFNet.query,
    )
    assert out.shape == (2, 11, 4)
    out = np.asarray(out)
    assert (out[..., :3] >= 0).all() and (out[..., :3] <= 1).all()
    assert (out[..., 3] >= 0).all()
    assert np.isfinite(out).all()


def test_pixelnerf_sigma_activation_softplus():
    """`model.sigma_activation = softplus` (extension beyond the reference's
    hard-coded relu, backup2:279): same param tree, strictly positive sigma
    everywhere (no dead zone), and softplus(x) > relu(x) pointwise."""
    conf_sp = SMALL_CONF.replace(
        "use_encoder = True", "use_encoder = True\n    sigma_activation = softplus"
    )
    net, variables, images, poses, focal, xyz, viewdirs = _init_net()
    net_sp = make_model(hocon.parse_string(conf_sp)["model"])
    scene = net.apply(
        variables, jnp.asarray(images), jnp.asarray(poses), jnp.asarray(focal),
        method=PixelNeRFNet.encode,
    )
    q = lambda n: np.asarray(n.apply(
        variables, scene, jnp.asarray(xyz), viewdirs=jnp.asarray(viewdirs),
        method=PixelNeRFNet.query,
    ))
    out_relu, out_sp = q(net), q(net_sp)
    # rgb path untouched
    np.testing.assert_allclose(out_sp[..., :3], out_relu[..., :3], atol=1e-6)
    sig_relu, sig_sp = out_relu[..., 3], out_sp[..., 3]
    assert np.all(sig_sp > 0.0)
    assert np.all(sig_sp > sig_relu)
    # away from zero the two activations agree (softplus -> relu)
    big = sig_relu > 4.0
    if big.any():
        np.testing.assert_allclose(sig_sp[big], sig_relu[big], atol=0.02)

    # softplus_floor: same params again, sigma floored at softplus(-4) and
    # equal to plain softplus wherever raw > -4 (here raw is large positive)
    conf_fl = SMALL_CONF.replace(
        "use_encoder = True",
        "use_encoder = True\n    sigma_activation = softplus_floor",
    )
    net_fl = make_model(hocon.parse_string(conf_fl)["model"])
    out_fl = q(net_fl)
    sig_fl = out_fl[..., 3]
    assert np.all(sig_fl >= 0.018)
    np.testing.assert_allclose(out_fl[..., :3], out_relu[..., :3], atol=1e-6)
    above = sig_sp > 0.02  # raw > -4 region
    np.testing.assert_allclose(sig_fl[above], sig_sp[above], atol=1e-5)

    with pytest.raises(NotImplementedError):
        bad = SMALL_CONF.replace(
            "use_encoder = True", "use_encoder = True\n    sigma_activation = exp"
        )
        net_bad = make_model(hocon.parse_string(bad)["model"])
        net_bad.apply(
            variables, scene, jnp.asarray(xyz), viewdirs=jnp.asarray(viewdirs),
            method=PixelNeRFNet.query,
        )


def test_pixelnerf_query_jits_and_views_consistency():
    """Single view duplicated must equal NS=1 (average over identical views)."""
    net, variables, images, poses, focal, xyz, viewdirs = _init_net(NS=1, SB=1)
    enc = lambda im, po: net.apply(
        variables, jnp.asarray(im), jnp.asarray(po), jnp.asarray(focal),
        method=PixelNeRFNet.encode,
    )
    scene1 = enc(images, poses)
    out1 = net.apply(
        variables, scene1, jnp.asarray(xyz), viewdirs=jnp.asarray(viewdirs),
        method=PixelNeRFNet.query,
    )
    images2 = np.concatenate([images, images], axis=1)
    poses2 = np.concatenate([poses, poses], axis=1)
    scene2 = enc(images2, poses2)
    out2 = net.apply(
        variables, scene2, jnp.asarray(xyz), viewdirs=jnp.asarray(viewdirs),
        method=PixelNeRFNet.query,
    )
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)

    # query jits cleanly
    qfn = jax.jit(
        lambda v, s, x, d: net.apply(
            v, s, x, viewdirs=d, method=PixelNeRFNet.query
        )
    )
    out_j = qfn(variables, scene1, jnp.asarray(xyz), jnp.asarray(viewdirs))
    np.testing.assert_allclose(np.asarray(out_j), np.asarray(out1), atol=1e-5)


def test_pixelnerf_query_planar_matches_flat_superbatch():
    """planar_out must be a pure transpose of the flat output for SB>1 too.

    Regression: the planar branch used to reinterpret the XLA MLP's
    (SB, d_out, B) output as (d_out, SB, B), scrambling objects across
    channels for every SB>1 training step (the trainer renders with
    planar_out=True and -B objects)."""
    net, variables, images, poses, focal, xyz, viewdirs = _init_net(NS=1, SB=3)
    scene = net.apply(
        variables, jnp.asarray(images), jnp.asarray(poses), jnp.asarray(focal),
        method=PixelNeRFNet.encode,
    )
    flat = net.apply(
        variables, scene, jnp.asarray(xyz), viewdirs=jnp.asarray(viewdirs),
        planar_out=False, method=PixelNeRFNet.query,
    )
    planar = net.apply(
        variables, scene, jnp.asarray(xyz), viewdirs=jnp.asarray(viewdirs),
        planar_out=True, method=PixelNeRFNet.query,
    )
    assert planar.shape == (flat.shape[0], flat.shape[2], flat.shape[1])
    np.testing.assert_allclose(
        np.asarray(jnp.swapaxes(planar, 1, 2)), np.asarray(flat), atol=1e-6
    )


@pytest.mark.slow
def test_pixelnerf_multiscale_fusion_path():
    conf_text = SMALL_CONF.replace(
        "use_first_pool = False }",
        "use_first_pool = False\n use_multi_scale = True }\n"
        "    use_smart_fusion = True\n    fusion_type = attention\n"
        "    fusion_heads = 8\n    use_cbam = True",
    )
    net, variables, images, poses, focal, xyz, viewdirs = _init_net(
        conf_text, SB=1, NS=1, H=32, W=32, B=5
    )
    scene = net.apply(
        variables, jnp.asarray(images), jnp.asarray(poses), jnp.asarray(focal),
        method=PixelNeRFNet.encode,
    )
    # fused single map with 512 channels
    assert not isinstance(scene.latents, (list, tuple))
    assert scene.latents.shape[-1] == 512
    out = net.apply(
        variables, scene, jnp.asarray(xyz), viewdirs=jnp.asarray(viewdirs),
        method=PixelNeRFNet.query,
    )
    assert out.shape == (1, 5, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_spatial_encoder_latent_size():
    enc = SpatialEncoder(backbone="resnet34", num_layers=4, use_multi_scale=True)
    assert enc.latent_size == [64, 64, 128, 256]
    enc = SpatialEncoder(backbone="resnet34", num_layers=4, use_multi_scale=False)
    assert enc.latent_size == 512


def test_spatial_encoder_index_nearest_torch_oracle():
    """index_interp=nearest must match the reference encoder, which passes
    align_corners=self.align_corners (=True) for EVERY interp mode
    (reference encoder.py:181-186) — a half-pixel shift otherwise."""
    import torch.nn.functional as F

    rng = np.random.default_rng(11)
    B, H_l, W_l, C, N = 2, 9, 9, 6, 160
    W_img = H_img = 18.0
    lat = rng.normal(size=(B, H_l, W_l, C)).astype(np.float32)
    uv = rng.uniform(0.0, W_img, size=(B, N, 2)).astype(np.float32)
    # nudge off exact .5 feature-coordinate boundaries where round-half rules
    # differ between torch and jnp.round
    fx = uv[..., 0] * (W_l / W_img)
    fy = uv[..., 1] * (H_l / H_img)
    bad = (np.abs(fx - np.round(fx)) > 0.45) | (np.abs(fy - np.round(fy)) > 0.45)
    uv[bad] += 0.07

    enc = SpatialEncoder(index_interp="nearest", index_normalize="image")
    ours = np.asarray(enc.index(jnp.asarray(lat), jnp.asarray(uv), (W_img, H_img)))

    # torch oracle: upstream uv normalization (by input-image extent, uv
    # scaled to the feature grid) then grid_sample nearest align_corners=True
    gx = uv[..., 0] * (W_l / W_img) * (2.0 / (W_l - 1)) - 1.0
    gy = uv[..., 1] * (H_l / H_img) * (2.0 / (H_l - 1)) - 1.0
    grid = torch.from_numpy(np.stack([gx, gy], axis=-1)[:, None])  # (B,1,N,2)
    feat_t = torch.from_numpy(np.transpose(lat, (0, 3, 1, 2)))
    ref = (
        F.grid_sample(
            feat_t, grid, mode="nearest", padding_mode="border",
            align_corners=True,
        )
        .squeeze(2)
        .transpose(1, 2)
        .numpy()
    )
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_pixelnerf_query_deferred_code_matches_default(monkeypatch):
    """PIXELNERF_DEFER_CODE=1 (RawCode through the MLP) == default query."""
    net, variables, images, poses, focal, xyz, viewdirs = _init_net()
    scene = net.apply(
        variables,
        jnp.asarray(images),
        jnp.asarray(poses),
        jnp.asarray(focal),
        method=PixelNeRFNet.encode,
    )

    def q():
        return np.asarray(
            net.apply(
                variables,
                scene,
                jnp.asarray(xyz),
                viewdirs=jnp.asarray(viewdirs),
                coarse=True,
                method=PixelNeRFNet.query,
            )
        )

    ref = q()
    monkeypatch.setenv("PIXELNERF_DEFER_CODE", "1")
    out = q()
    np.testing.assert_allclose(out, ref, atol=2e-5)

    # AMP: raw coordinates must NOT be rounded to bf16 before the sin code
    # (phase error ~freq * eps at the top frequency); the deferred path casts
    # only the f32-encoded features, so it stays at bf16-noise level of the
    # default AMP path
    def q_amp():
        return np.asarray(
            net.apply(
                variables,
                scene,
                jnp.asarray(xyz),
                viewdirs=jnp.asarray(viewdirs),
                coarse=True,
                compute_dtype=jnp.bfloat16,
                method=PixelNeRFNet.query,
            )
        )

    out_amp = q_amp()
    monkeypatch.delenv("PIXELNERF_DEFER_CODE")
    ref_amp = q_amp()
    assert np.abs(out_amp - ref_amp).max() < 0.05
    # and the deferred-AMP result stays close to the f32 reference
    assert np.abs(out_amp - ref).max() < 0.1


def test_load_pretrained_backbones_from_file(tmp_path, monkeypatch):
    """encoder.pretrained=True + $PIXELNERF_BACKBONE_WEIGHTS initializes the
    spatial encoder's ResNet trunk from a torchvision-layout state dict."""
    tmodel = TorchResNet34Trunk().eval()
    with torch.no_grad():
        _randomize_bn_stats(tmodel, seed=5)
    wfile = tmp_path / "resnet34.pth"
    torch.save(tmodel.state_dict(), str(wfile))

    net, variables, images, poses, focal, xyz, viewdirs = _init_net()
    conf = hocon.parse_string(
        SMALL_CONF.replace("pretrained = False", "pretrained = True")
    )

    monkeypatch.setenv("PIXELNERF_BACKBONE_WEIGHTS", str(wfile))
    loaded = torch_convert.load_pretrained_backbones(variables, conf["model"])

    got = np.asarray(loaded["params"]["encoder"]["model"]["conv1"]["kernel"])
    want = np.transpose(tmodel.state_dict()["conv1.weight"].numpy(), (2, 3, 1, 0))
    np.testing.assert_allclose(got, want, atol=1e-6)
    bn_mean = np.asarray(
        loaded["batch_stats"]["encoder"]["model"]["bn1"]["mean"]
    )
    np.testing.assert_allclose(
        bn_mean, tmodel.state_dict()["bn1.running_mean"].numpy(), atol=1e-6
    )
    # untouched modules keep their init
    np.testing.assert_allclose(
        np.asarray(loaded["params"]["mlp_coarse"]["lin_in"]["kernel"]),
        np.asarray(variables["params"]["mlp_coarse"]["lin_in"]["kernel"]),
    )
    # the loaded tree still drives encode+query
    out = net.apply(
        loaded,
        net.apply(
            loaded,
            jnp.asarray(images),
            jnp.asarray(poses),
            jnp.asarray(focal),
            method=PixelNeRFNet.encode,
        ),
        jnp.asarray(xyz),
        viewdirs=jnp.asarray(viewdirs),
        method=PixelNeRFNet.query,
    )
    assert np.isfinite(np.asarray(out)).all()
    # (the offline/no-weights path is covered by
    # test_backbone_fallback_chain_raises_loudly: it now raises unless
    # PIXELNERF_ALLOW_RANDOM_BACKBONE=1)


@pytest.mark.slow
def test_pixelnerf_query_end_to_end_torch_oracle():
    """Full conditioned-query parity vs an independent torch implementation of
    the upstream semantics (backup2:98-282): pose inversion, camera-space
    coordinate feature + positional code, per-view viewdir rotation,
    uv = -xy/z * [fx,-fy] + c projection, image-extent-normalized
    border-padded bilinear feature sampling on the unified multi-layer latent
    (align_corners=True upsample + concat), per-block latent injection, view
    average at combine_layer, sigmoid/relu outputs."""
    import flax.serialization
    import torch.nn.functional as F

    conf = hocon.parse_string(
        """
model {
    use_encoder = True
    use_xyz = True
    normalize_z = True
    use_code = True
    code { num_freqs = 6\n freq_factor = 1.5\n include_input = True }
    use_viewdirs = True
    use_code_viewdirs = False
    mlp_coarse { type = resnet\n n_blocks = 3\n d_hidden = 64\n combine_layer = 2\n combine_type = average }
    mlp_fine { type = empty }
    encoder { backbone = resnet34\n pretrained = False\n num_layers = 3\n use_first_pool = False }
}
"""
    )
    net = make_model(conf["model"])
    rng = np.random.default_rng(17)
    SB, NS, H, W, B = 1, 2, 32, 32, 40
    images = rng.normal(size=(SB, NS, H, W, 3)).astype(np.float32).clip(-1, 1)
    poses = np.tile(np.eye(4, dtype=np.float32), (SB, NS, 1, 1))
    # distinct nontrivial c2w poses
    for v, th in enumerate((0.4, -0.7)):
        R = np.array(
            [
                [np.cos(th), 0, np.sin(th)],
                [0, 1, 0],
                [-np.sin(th), 0, np.cos(th)],
            ],
            np.float32,
        )
        poses[0, v, :3, :3] = R
        poses[0, v, :3, 3] = [0.1 * v, -0.05, 1.4]
    focal = np.float32(25.0)
    xyz = (rng.normal(size=(SB, B, 3)) * 0.3).astype(np.float32)
    viewdirs = rng.normal(size=(SB, B, 3)).astype(np.float32)
    viewdirs /= np.linalg.norm(viewdirs, axis=-1, keepdims=True)

    variables = jax.jit(net.init)(
        jax.random.PRNGKey(3),
        jnp.asarray(images),
        jnp.asarray(poses),
        jnp.asarray(focal),
        jnp.asarray(xyz),
        jnp.asarray(viewdirs),
    )

    # ---- share trunk weights: torch trunk -> converter -> flax variables ----
    torch.manual_seed(7)
    trunk = TorchResNet34Trunk().eval()
    with torch.no_grad():
        _randomize_bn_stats(trunk, seed=9)
    conv = torch_convert.convert_resnet(trunk.state_dict())
    state = flax.serialization.to_state_dict(variables)
    n = torch_convert._merge_overlap(state["params"]["encoder"]["model"], conv["params"])
    n += torch_convert._merge_overlap(
        state["batch_stats"]["encoder"]["model"], conv["batch_stats"]
    )
    assert n > 50
    variables = flax.serialization.from_state_dict(variables, state)

    # ---- flax reference path ----
    with jax.default_matmul_precision("highest"):
        scene = net.apply(
            variables,
            jnp.asarray(images),
            jnp.asarray(poses),
            jnp.asarray(focal),
            method=PixelNeRFNet.encode,
        )
        out = np.asarray(
            net.apply(
                variables,
                scene,
                jnp.asarray(xyz),
                viewdirs=jnp.asarray(viewdirs),
                coarse=True,
                method=PixelNeRFNet.query,
            )
        )[0]

    # ---- independent torch oracle ----
    mlp_p = jax.tree.map(np.asarray, variables["params"]["mlp_coarse"])

    def tW(leaf):  # flax (in, out) kernel -> torch (out, in)
        return torch.from_numpy(np.ascontiguousarray(leaf.T))

    with torch.no_grad():
        timgs = torch.from_numpy(
            np.transpose(images[0], (0, 3, 1, 2))
        )  # (NS,3,H,W)
        feats = trunk(timgs, use_first_pool=False)[:3]
        h0, w0 = feats[0].shape[-2:]
        unified = torch.cat(
            [
                f
                if f.shape[-2:] == (h0, w0)
                else F.interpolate(
                    f, size=(h0, w0), mode="bilinear", align_corners=True
                )
                for f in feats
            ],
            dim=1,
        )  # (NS, 256, h0, w0)

        # pose inversion (world -> camera)
        rot = torch.from_numpy(poses[0, :, :3, :3]).transpose(1, 2)  # (NS,3,3)
        trans = -torch.bmm(rot, torch.from_numpy(poses[0, :, :3, 3:]))

        txyz = torch.from_numpy(xyz[0])  # (B,3)
        tvd = torch.from_numpy(viewdirs[0])
        xyz_rot = torch.einsum("nij,bj->nbi", rot, txyz)
        xyz_cam = xyz_rot + trans[:, None, :, 0]
        vd_rot = torch.einsum("nij,bj->nbi", rot, tvd)

        # positional code on the rotation-only camera coords (normalize_z)
        fr = 1.5 * 2.0 ** np.arange(6)
        enc = [xyz_rot]
        for f in fr:
            enc += [torch.sin(f * xyz_rot), torch.cos(f * xyz_rot)]
        mlp_x = torch.cat(enc + [vd_rot], dim=-1)  # (NS,B,42)

        # projection with -fy and principal point at the image center
        uv = -xyz_cam[..., :2] / xyz_cam[..., 2:3]
        uv = uv * torch.tensor([focal, -focal]) + torch.tensor(
            [W * 0.5, H * 0.5]
        )
        # image-extent normalization to align_corners=True grid coords
        hl, wl = unified.shape[-2:]
        gx = uv[..., 0] * (wl / W) * (2.0 / (wl - 1)) - 1.0
        gy = uv[..., 1] * (hl / H) * (2.0 / (hl - 1)) - 1.0
        grid = torch.stack([gx, gy], dim=-1)[:, None]  # (NS,1,B,2)
        z_lat = (
            F.grid_sample(
                unified, grid, align_corners=True, padding_mode="border"
            )
            .squeeze(2)
            .permute(0, 2, 1)
        )  # (NS,B,256)

        # ResnetFC with per-block latent injection + view mean at combine_layer
        x = mlp_x @ tW(mlp_p["lin_in"]["kernel"]).T + torch.from_numpy(
            mlp_p["lin_in"]["bias"]
        )
        for k in range(3):
            if k == 2:  # combine_layer: average over views, no injection
                x = x.mean(dim=0, keepdim=True)
            else:
                zi = z_lat @ tW(mlp_p[f"lin_z_{k}"]["kernel"]).T + torch.from_numpy(
                    mlp_p[f"lin_z_{k}"]["bias"]
                )
                x = x + zi
            blk = mlp_p[f"blocks_{k}"]
            h = torch.relu(x) @ tW(blk["fc_0"]["kernel"]).T + torch.from_numpy(
                blk["fc_0"]["bias"]
            )
            dx = torch.relu(h) @ tW(blk["fc_1"]["kernel"]).T + torch.from_numpy(
                blk["fc_1"]["bias"]
            )
            x = x + dx
        o = torch.relu(x) @ tW(mlp_p["lin_out"]["kernel"]).T + torch.from_numpy(
            mlp_p["lin_out"]["bias"]
        )
        o = o[0]  # (B,4)
        ref = torch.cat(
            [torch.sigmoid(o[:, :3]), torch.relu(o[:, 3:4])], dim=-1
        ).numpy()

    assert out.shape == ref.shape == (B, 4)
    np.testing.assert_allclose(out, ref, atol=3e-3)
    cc = np.corrcoef(out.ravel(), ref.ravel())[0, 1]
    assert cc > 0.9999


def test_adaptive_sampler_select_matches_reference_semantics():
    """AdaptiveFeatureSampler.select must reproduce the reference's hard
    top-k/threshold selection (feature_fusion.py:182-231): descending-quality
    order, top_k cap, >= threshold, at-least-one fallback — and the soft
    gate's kept set (gate > 0) must equal the same selection."""
    from pixelnerf_tpu.models import AdaptiveFeatureSampler

    def reference_select(n, q_row, top_k, thresh):
        # independent oracle of the torch control flow (sorted descending,
        # .item() on batch element 0)
        order = sorted(range(n), key=lambda i: -q_row[i])
        out = []
        for idx in order:
            if top_k is not None and len(out) >= top_k:
                break
            if q_row[idx] >= thresh:
                out.append(idx)
        if not out:
            out.append(order[0])
        return out

    rng = np.random.default_rng(0)
    feats = [
        jnp.asarray(rng.normal(size=(2, 4, 4, c)).astype(np.float32))
        for c in (8, 16, 32)
    ]
    sampler = AdaptiveFeatureSampler(feature_dim=32, quality_threshold=0.3)
    variables = sampler.init(jax.random.PRNGKey(0), feats)
    q = np.asarray(sampler.apply(variables, feats, return_q=True))
    assert q.shape == (2, 3)

    for q_row, top_k, thresh in [
        (np.array([0.9, 0.1, 0.5]), None, 0.3),
        (np.array([0.9, 0.6, 0.5]), 2, 0.3),
        (np.array([0.1, 0.05, 0.2]), None, 0.3),  # none pass -> best kept
        (np.array([0.4, 0.8, 0.35]), 1, 0.3),
    ]:
        qq = np.stack([q_row, q_row])
        sel_feats, sel_idx = AdaptiveFeatureSampler.select(
            feats, qq, top_k=top_k, quality_threshold=thresh
        )
        expect = reference_select(3, q_row, top_k, thresh)
        assert sel_idx == expect, (sel_idx, expect)
        for f, i in zip(sel_feats, sel_idx):
            assert f is feats[i]

    # soft gate kept-set == hard selection (no top_k in the gate)
    gated = sampler.apply(variables, feats)
    kept_soft = [
        i
        for i, g in enumerate(gated)
        if float(np.abs(np.asarray(g)).max()) > 0
    ]
    sel_feats, sel_idx = AdaptiveFeatureSampler.select(
        feats, q, quality_threshold=0.3
    )
    assert sorted(sel_idx) == kept_soft, (sel_idx, kept_soft)


def test_pixelnerf_adaptive_sampling_path():
    """use_adaptive_sampling gates each multi-scale latent before fusion
    (encode path pixelnerf.py:218-219); must run end-to-end under jit."""
    conf_text = SMALL_CONF.replace(
        "use_first_pool = False }",
        "use_first_pool = False\n use_multi_scale = True }\n"
        "    use_smart_fusion = True\n    use_adaptive_sampling = True\n"
        "    quality_threshold = 0.3",
    )
    net, variables, images, poses, focal, xyz, viewdirs = _init_net(
        conf_text, SB=1, NS=1, H=32, W=32, B=5
    )
    scene = net.apply(
        variables, jnp.asarray(images), jnp.asarray(poses), jnp.asarray(focal),
        method=PixelNeRFNet.encode,
    )
    out = net.apply(
        variables, scene, jnp.asarray(xyz), viewdirs=jnp.asarray(viewdirs),
        method=PixelNeRFNet.query,
    )
    assert out.shape == (1, 5, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_backbone_fallback_chain_raises_loudly(monkeypatch):
    """pretrained=true with NO obtainable weights must raise (not warn):
    random-encoder training materially diverges from the reference
    (encoder.py:61-67).  PIXELNERF_ALLOW_RANDOM_BACKBONE=1 is the explicit
    escape hatch."""
    import warnings as W

    _, variables, *_ = _init_net()
    conf = hocon.parse_string(
        SMALL_CONF.replace("pretrained = False", "pretrained = True")
    )
    monkeypatch.delenv("PIXELNERF_BACKBONE_WEIGHTS", raising=False)
    # force the torchvision step to fail even if installed
    import pixelnerf_tpu.utils.torch_convert as tc

    orig = tc.backbone_state_dict
    monkeypatch.setattr(
        tc, "backbone_state_dict", lambda backbone, weights_path=None: None
    )
    with pytest.raises(RuntimeError, match="pretrained=true"):
        tc.load_pretrained_backbones(variables, conf["model"])

    monkeypatch.setenv("PIXELNERF_ALLOW_RANDOM_BACKBONE", "1")
    with W.catch_warnings(record=True) as rec:
        W.simplefilter("always")
        out = tc.load_pretrained_backbones(variables, conf["model"])
    assert any("RANDOM initialization" in str(r.message) for r in rec)
    # unchanged variables
    np.testing.assert_array_equal(
        np.asarray(out["params"]["encoder"]["model"]["conv1"]["kernel"]),
        np.asarray(variables["params"]["encoder"]["model"]["conv1"]["kernel"]),
    )
    monkeypatch.setattr(tc, "backbone_state_dict", orig)


def test_backbone_pretrained_path_conf_chain(tmp_path, monkeypatch):
    """encoder.pretrained_path (conf) is honored ahead of the env var."""
    import pixelnerf_tpu.utils.torch_convert as tc

    tmodel = TorchResNet34Trunk().eval()
    wfile = tmp_path / "trunk.pth"
    torch.save(tmodel.state_dict(), str(wfile))
    _, variables, *_ = _init_net()
    conf = hocon.parse_string(
        SMALL_CONF.replace(
            "pretrained = False",
            f'pretrained = True\n pretrained_path = "{wfile}"',
        )
    )
    monkeypatch.delenv("PIXELNERF_BACKBONE_WEIGHTS", raising=False)
    loaded = tc.load_pretrained_backbones(variables, conf["model"])
    got = np.asarray(loaded["params"]["encoder"]["model"]["conv1"]["kernel"])
    want = np.transpose(
        tmodel.state_dict()["conv1.weight"].numpy(), (2, 3, 1, 0)
    )
    np.testing.assert_allclose(got, want, atol=1e-6)
