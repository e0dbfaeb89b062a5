"""End-to-end checkpoint-level parity with the reference torch format.

The strongest parity evidence short of real DTU data: a reference-layout
PixelNeRF is implemented in torch (backup2 semantics — the module/state-dict
naming of /root/reference/src/model/models.py.backup2:284-332), genuinely
TRAINED for a few hundred steps on the synthetic DVR fixture, saved as a real
``pixel_nerf_latest`` torch file, loaded through utils/torch_convert via the
eval CLI (eval/eval.py), and the resulting renders + PSNR are compared against
the torch model's own volume renders of the same target views:

    torch train -> torch.save -> [converter] -> eval CLI -> PSNR
                 \\-> torch render ----------------------------^

Gates: |PSNR_jax - PSNR_torch| <= 0.1 dB (the BASELINE.md checkpoint-parity
bar) and pixelwise PSNR(jax render, torch render) >= 35 dB.
"""

import os
import runpy
import sys

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

from test_models import TorchResNet34Trunk, TorchResnetFC

from pixelnerf_tpu.data import get_split_dataset
from pixelnerf_tpu.data.synthetic import write_synthetic_dvr
from pixelnerf_tpu.utils import geometry

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))

NUM_FREQS = 6
FREQ_FACTOR = 1.5
D_HIDDEN = 64
N_BLOCKS = 3
COMBINE_LAYER = 2
NUM_LAYERS = 3  # encoder feature layers -> d_latent 64+64+128

CONF_TEXT = f"""
model {{
    use_encoder = True
    use_xyz = True
    normalize_z = True
    use_code = True
    code {{ num_freqs = {NUM_FREQS}
 freq_factor = {FREQ_FACTOR}
 include_input = True }}
    use_viewdirs = True
    use_code_viewdirs = False
    mlp_coarse {{ type = resnet
 n_blocks = {N_BLOCKS}
 d_hidden = {D_HIDDEN}
 combine_layer = {COMBINE_LAYER}
 combine_type = average }}
    mlp_fine {{ type = empty }}
    encoder {{ backbone = resnet34
 pretrained = False
 num_layers = {NUM_LAYERS}
 use_first_pool = False }}
}}
renderer {{
    n_coarse = 48
    n_fine = 0
    n_fine_depth = 0
    depth_std = 0.01
    noise_std = 0.0
    white_bkgd = True
    eval_batch_size = 16384
}}
loss {{ rgb {{ use_l1 = False }} }}
train {{ print_interval = 5 }}
info {{ name = ckpt_parity }}
"""


class TorchEncoder(tnn.Module):
    """Reference SpatialEncoder twin: truncated resnet34 trunk named
    ``model`` (state-dict keys ``encoder.model.*``), unified multi-layer
    latent via align_corners=True bilinear upsample + channel concat
    (reference encoder.py:109-136)."""

    def __init__(self):
        super().__init__()
        self.model = TorchResNet34Trunk()

    def forward(self, images):  # (NS, 3, H, W) in [-1, 1]
        feats = self.model(images, use_first_pool=False)[:NUM_LAYERS]
        h0, w0 = feats[0].shape[-2:]
        return torch.cat(
            [
                f
                if f.shape[-2:] == (h0, w0)
                else F.interpolate(
                    f, size=(h0, w0), mode="bilinear", align_corners=True
                )
                for f in feats
            ],
            dim=1,
        )


class TorchPixelNeRF(tnn.Module):
    """Trainable torch PixelNeRF with backup2 semantics and the reference's
    state-dict layout (encoder.model.*, mlp_coarse.*)."""

    def __init__(self, d_latent):
        super().__init__()
        d_code = 3 * (2 * NUM_FREQS + 1)
        self.encoder = TorchEncoder()
        self.mlp_coarse = TorchResnetFC(
            d_code + 3, d_latent, D_HIDDEN, N_BLOCKS, COMBINE_LAYER
        )
        freqs = FREQ_FACTOR * 2.0 ** torch.arange(NUM_FREQS, dtype=torch.float32)
        self.register_buffer("code_freqs", freqs, persistent=False)
        self._scene = None

    def encode(self, images, poses, focal, c, image_hw):
        """images (NS,3,H,W); poses (NS,4,4) camera-to-world."""
        latent = self.encoder(images)
        rot = poses[:, :3, :3].transpose(1, 2)  # w2c (backup2:121-123)
        trans = -torch.bmm(rot, poses[:, :3, 3:])
        self._scene = dict(
            latent=latent, rot=rot, trans=trans, focal=focal, c=c, hw=image_hw
        )

    def forward(self, xyz, viewdirs):
        """xyz (B,3) world points; viewdirs (B,3).  -> (B,4) rgb+sigma."""
        s = self._scene
        rot, trans = s["rot"], s["trans"]
        xyz_rot = torch.einsum("nij,bj->nbi", rot, xyz)
        xyz_cam = xyz_rot + trans[:, None, :, 0]
        vd_rot = torch.einsum("nij,bj->nbi", rot, viewdirs)

        # normalize_z: positional code on rotation-only camera coords
        enc = [xyz_rot]
        for f in self.code_freqs:
            enc += [torch.sin(f * xyz_rot), torch.cos(f * xyz_rot)]
        mlp_x = torch.cat(enc + [vd_rot], dim=-1)  # (NS,B,42)

        # uv = -xy/z * [fx,-fy] + c (backup2:215-221)
        H, W = s["hw"]
        uv = -xyz_cam[..., :2] / xyz_cam[..., 2:3]
        uv = uv * torch.stack([s["focal"], -s["focal"]]) + s["c"]
        lat = s["latent"]
        hl, wl = lat.shape[-2:]
        gx = uv[..., 0] * (wl / W) * (2.0 / (wl - 1)) - 1.0
        gy = uv[..., 1] * (hl / H) * (2.0 / (hl - 1)) - 1.0
        grid = torch.stack([gx, gy], dim=-1)[:, None]  # (NS,1,B,2)
        z_lat = (
            F.grid_sample(lat, grid, align_corners=True, padding_mode="border")
            .squeeze(2)
            .permute(0, 2, 1)
        )  # (NS,B,C)

        NS, B, _ = mlp_x.shape
        zx = torch.cat([z_lat, mlp_x], dim=-1).reshape(NS * B, -1)
        out = self.mlp_coarse(zx, (NS, B))[0]  # (B,4)
        return torch.cat(
            [torch.sigmoid(out[:, :3]), F.relu(out[:, 3:])], dim=-1
        )


def torch_render(model, rays, n_coarse, rng=None):
    """Coarse stratified volume render (reference nerf.py:98-118,163-249):
    white background, far-boundary delta, 1e-10 transmittance guard."""
    rays = torch.as_tensor(rays, dtype=torch.float32)
    B = rays.shape[0]
    near, far = rays[:, 6:7], rays[:, 7:8]
    step = 1.0 / n_coarse
    z_steps = torch.linspace(0, 1 - step, n_coarse).expand(B, -1)
    if rng is not None:
        z_steps = z_steps + torch.rand(B, n_coarse, generator=rng) * step
    else:
        z_steps = z_steps + 0.5 * step
    z = near + (far - near) * z_steps  # (B,K)

    pts = rays[:, None, :3] + z[..., None] * rays[:, None, 3:6]
    dirs = rays[:, None, 3:6].expand(-1, n_coarse, -1)
    out = model(pts.reshape(-1, 3), dirs.reshape(-1, 3)).reshape(B, n_coarse, 4)
    rgb, sigma = out[..., :3], out[..., 3]

    deltas = torch.cat([z[:, 1:] - z[:, :-1], far - z[:, -1:]], dim=1)
    alpha = 1.0 - torch.exp(-deltas * torch.relu(sigma))
    T = torch.cumprod(
        torch.cat([torch.ones(B, 1), 1.0 - alpha + 1e-10], dim=1), dim=1
    )[:, :-1]
    w = alpha * T
    rgb_final = (w[..., None] * rgb).sum(dim=1)
    pix_alpha = w.sum(dim=1)
    return rgb_final + 1.0 - pix_alpha[..., None]  # white background


def _psnr(a, b):
    mse = float(np.mean((a - b) ** 2))
    return -10.0 * np.log10(max(mse, 1e-12))


@pytest.mark.slow
def test_torch_checkpoint_roundtrip_render_parity(tmp_path, monkeypatch):
    torch.manual_seed(0)
    data_dir = write_synthetic_dvr(
        str(tmp_path / "data"), n_objs=2, n_views=6, image_size=32
    )
    dset = get_split_dataset("dvr", data_dir, want_split="test", training=False)
    data = dset[0]
    images = data["images"]  # (NV,H,W,3) in [-1,1]
    poses = data["poses"]
    focal = float(np.asarray(data["focal"]))
    c = data.get("c")
    NV, H, W, _ = images.shape
    c_np = (
        np.asarray(c, np.float32)
        if c is not None
        else np.array([W * 0.5, H * 0.5], np.float32)
    )
    src_views = [0, 1]
    tgt_views = [v for v in range(NV) if v not in src_views]

    d_latent = 64 + 64 + 128
    model = TorchPixelNeRF(d_latent)

    timgs = torch.from_numpy(
        np.transpose(images[src_views], (0, 3, 1, 2))
    ).float()
    tposes = torch.from_numpy(poses[src_views]).float()
    tfocal = torch.tensor(focal)
    tc = torch.from_numpy(c_np)

    # ---- genuine training on the fixture (few hundred steps) ----
    z_near, z_far = float(dset.z_near), float(dset.z_far)
    all_rays = geometry.gen_rays_np(poses, W, H, focal, z_near, z_far, c=c_np)
    all_rays = np.asarray(all_rays).reshape(NV, H * W, 8)
    gt01 = images.reshape(NV, H * W, 3) * 0.5 + 0.5

    opt = torch.optim.Adam(model.parameters(), lr=1e-3)
    host = np.random.default_rng(0)
    gen = torch.Generator().manual_seed(1)
    model.train()
    n_steps = int(os.environ.get("PARITY_TRAIN_STEPS", 300))
    for it in range(n_steps):
        vi = host.integers(0, NV)
        pix = host.integers(0, H * W, 96)
        rays = all_rays[vi, pix]
        target = torch.from_numpy(gt01[vi, pix]).float()
        model.encode(timgs, tposes, tfocal, tc, (H, W))
        pred = torch_render(model, rays, n_coarse=20, rng=gen)
        loss = F.mse_loss(pred, target)
        opt.zero_grad()
        loss.backward()
        opt.step()
    final_loss = float(loss)
    assert final_loss < 0.05, final_loss  # must have actually learned

    # ---- torch-side eval render of every target view ----
    model.eval()
    n_coarse_eval = 48
    torch_renders, torch_psnrs = [], []
    with torch.no_grad():
        model.encode(timgs, tposes, tfocal, tc, (H, W))
        for vi in tgt_views:
            chunks = [
                torch_render(
                    model, all_rays[vi, s : s + 4096], n_coarse_eval,
                    rng=torch.Generator().manual_seed(100 + vi),
                )
                for s in range(0, H * W, 4096)
            ]
            r = torch.cat(chunks).numpy().reshape(H, W, 3).clip(0, 1)
            torch_renders.append(r)
            torch_psnrs.append(_psnr(r, gt01[vi].reshape(H, W, 3)))
    psnr_torch = float(np.mean(torch_psnrs))

    # ---- save the REAL torch checkpoint in the reference layout ----
    name = "parity"
    ckpt_root = tmp_path / "checkpoints"
    ckpt_dir = ckpt_root / name
    ckpt_dir.mkdir(parents=True)
    sd = model.state_dict()
    assert any(k.startswith("encoder.model.") for k in sd)
    assert any(k.startswith("mlp_coarse.") for k in sd)
    torch.save(sd, ckpt_dir / "pixel_nerf_latest")

    # ---- replay through the converter + full eval CLI ----
    conf_path = tmp_path / "parity.conf"
    conf_path.write_text(CONF_TEXT)
    out_dir = tmp_path / "eval_out"
    argv = [
        "-n", name,
        "-c", str(conf_path),
        "-D", data_dir,
        "-F", "dvr",
        "--split", "test",
        "-P", " ".join(map(str, src_views)),
        "-O", str(out_dir),
        "-R", "8192",
        "--max_objs", "1",
        "--checkpoints_path", str(ckpt_root),
        "--visual_path", str(tmp_path / "visuals"),
        "--logs_path", str(tmp_path / "logs"),
    ]
    monkeypatch.setattr(sys, "argv", ["eval/eval.py"] + argv)
    runpy.run_path(os.path.join(REPO, "eval", "eval.py"), run_name="__main__")

    finish = (out_dir / "finish.txt").read_text().split()
    psnr_jax = float(finish[1])

    # per-view pixel comparison of the CLI's written renders vs torch's
    obj_dirs = [d for d in os.listdir(out_dir) if (out_dir / d).is_dir()]
    assert len(obj_dirs) == 1
    import imageio.v2 as imageio

    views = sorted(
        f
        for f in os.listdir(out_dir / obj_dirs[0])
        if f.endswith(".png") and "depth" not in f and "compare" not in f
    )
    assert len(views) == len(tgt_views), views
    cross = []
    for fname, tr in zip(views, torch_renders):
        jr = imageio.imread(out_dir / obj_dirs[0] / fname).astype(np.float32)
        jr = jr[..., :3] / 255.0
        cross.append(_psnr(jr, tr))
    cross_psnr = float(np.mean(cross))

    print(
        f"parity: torch {psnr_torch:.3f} dB, jax {psnr_jax:.3f} dB, "
        f"cross {cross_psnr:.1f} dB, train loss {final_loss:.4f}"
    )
    # the BASELINE.md gate: checkpoint-level quality parity within 0.1 dB
    assert abs(psnr_jax - psnr_torch) <= 0.1, (psnr_jax, psnr_torch)
    # and the renders must be the SAME images, not coincidentally-equal PSNRs
    assert cross_psnr >= 35.0, cross
