"""End-to-end smoke tests for the CLI scripts (train/, eval/) on tiny synthetic
data — the test level the reference covers only with ad-hoc root scripts
(reference test_training.py / test_memory.py; SURVEY §4).

Each test drives a script's ``main()`` in-process with a patched ``sys.argv``
against a 16px synthetic dataset and a shrunken model config, so the whole
file stays CPU-cheap.
"""

import os
import re
import runpy
import shutil
import sys

import numpy as np
import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)

from pixelnerf_tpu.data.synthetic import (  # noqa: E402
    write_synthetic_dvr,
    write_synthetic_srn,
)

TINY_OVERRIDES = """
model {
    mlp_coarse {
        n_blocks = 2
        d_hidden = 32
    }
    mlp_fine {
        n_blocks = 2
        d_hidden = 32
    }
    encoder {
        num_layers = 2
        pretrained = False
    }
}
renderer {
    n_coarse = 8
    n_fine = 4
    n_fine_depth = 2
    eval_batch_size = 8192
}
train {
    print_interval = 1
    save_interval = 1
    vis_interval = 1
    eval_interval = 1
}
"""


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    data = write_synthetic_dvr(str(root / "data"), n_objs=2, n_views=4, image_size=16)
    srn_data = write_synthetic_srn(
        str(root / "srn_data"), n_objs=2, n_views=4, image_size=16
    )
    cdir = root / "conf"
    cdir.mkdir()
    shutil.copyfile(os.path.join(REPO, "conf", "default.conf"), cdir / "default.conf")
    conf = cdir / "tiny.conf"
    conf.write_text('include required("default.conf")\n' + TINY_OVERRIDES)
    return {
        "root": root,
        "data": data,
        "srn_data": srn_data,
        "conf": str(conf),
    }


def _run(monkeypatch, script, argv):
    monkeypatch.setattr(sys, "argv", [script] + argv)
    return runpy.run_path(os.path.join(REPO, script), run_name="__main__")


def _base_argv(env, name, extra, data_key="data", fmt="dvr"):
    out = env["root"] / name
    return [
        "-n",
        name,
        "-c",
        env["conf"],
        "-D",
        env[data_key],
        "-F",
        fmt,
        "--visual_path",
        str(out / "visuals"),
        "--checkpoints_path",
        str(out / "checkpoints"),
        "--logs_path",
        str(out / "logs"),
    ] + extra


@pytest.mark.slow
def test_gen_video_cli(monkeypatch, env):
    _run(
        monkeypatch,
        "eval/gen_video.py",
        _base_argv(
            env,
            "tiny_gv",
            ["--split", "test", "-S", "0", "-P", "0", "--num_views", "2",
             "--fps", "2", "-R", "4096"],
        ),
    )
    vis = env["root"] / "tiny_gv" / "visuals" / "tiny_gv"
    written = os.listdir(vis)
    assert any(f.startswith("video") and f.endswith((".mp4", ".gif")) for f in written)
    assert any(f.endswith("_view.jpg") for f in written)


def test_eval_cli_then_calc_metrics(monkeypatch, env):
    out = str(env["root"] / "eval_out")
    _run(
        monkeypatch,
        "eval/eval.py",
        _base_argv(
            env,
            "tiny_eval",
            ["--split", "val", "-P", "0", "-O", out, "-R", "4096",
             "--max_objs", "1", "--write_depth", "--write_compare",
             "--multicat"],
        ),
    )
    assert os.path.exists(os.path.join(out, "finish.txt"))
    objs = [d for d in os.listdir(out) if os.path.isdir(os.path.join(out, d))]
    assert objs
    files = os.listdir(os.path.join(out, objs[0]))
    assert any(f.endswith(".png") and "depth" not in f for f in files)

    # resume: a second run must skip the finished object (journal, SURVEY §5.3)
    _run(
        monkeypatch,
        "eval/eval.py",
        _base_argv(
            env,
            "tiny_eval",
            ["--split", "val", "-P", "0", "-O", out, "-R", "4096",
             "--max_objs", "1", "--multicat"],
        ),
    )

    _run(
        monkeypatch,
        "eval/calc_metrics.py",
        ["-D", env["data"], "-F", "dvr", "-O", out, "-P", "0",
         "--list_name", "softras_val", "--overwrite", "--multicat"],
    )
    metrics = os.path.join(out, objs[0], "metrics.txt")
    assert os.path.exists(metrics)
    text = open(metrics).read()
    assert "psnr" in text and "ssim" in text
    assert os.path.exists(os.path.join(out, "all_metrics.txt"))


def test_calc_metrics_reduce_format(monkeypatch, tmp_path):
    """all_metrics.txt byte format is the reference's contract
    (calc_metrics.py:317-341): 12-char left-padded label column, 6-decimal
    ` name: value` cells, ` n_inst: N`, `---`-separated total row."""
    data = tmp_path / "data"
    out = tmp_path / "render"
    (data / "02691156").mkdir(parents=True)
    (data / "03001627").mkdir()
    (data / "metadata.yaml").write_text(
        "02691156:\n  name: airplane,aeroplane,plane\n"
        "03001627:\n  name: chair\n"
    )
    rows = {
        "02691156_obj1": (25.0, 0.9, 0.1),
        "02691156_obj2": (27.0, 0.92, 0.12),
        "03001627_obj3": (30.0, 0.95, 0.05),
    }
    for name, (p, s, l) in rows.items():
        d = out / name
        d.mkdir(parents=True)
        (d / "metrics.txt").write_text(f"psnr {p}\nssim {s}\nlpips {l}")
    _run(
        monkeypatch,
        "eval/calc_metrics.py",
        ["-D", str(data), "-F", "dvr", "-O", str(out), "-R", "--multicat"],
    )
    assert (out / "all_metrics.txt").read_text() == (
        "airplane     psnr: 26.000000 ssim: 0.910000 lpips: 0.110000 n_inst: 2\n"
        "chair        psnr: 30.000000 ssim: 0.950000 lpips: 0.050000 n_inst: 1\n"
        "---\n"
        "total        psnr: 27.333333 ssim: 0.923333 lpips: 0.090000"
    )


def test_eval_approx_cli(monkeypatch, env):
    _run(
        monkeypatch,
        "eval/eval_approx.py",
        _base_argv(
            env,
            "tiny_approx",
            ["--split", "val", "-P", "0", "-R", "4096", "--batch_size", "1"],
        ),
    )


def test_eval_real_cli(monkeypatch, env):
    import imageio.v2 as imageio

    inp = env["root"] / "real_in"
    outp = env["root"] / "real_out"
    inp.mkdir(exist_ok=True)
    rng = np.random.default_rng(0)
    rgba = (rng.uniform(0, 255, (16, 16, 4))).astype(np.uint8)
    rgba[..., 3] = 255
    imageio.imwrite(inp / "obj_normalize.png", rgba)
    _run(
        monkeypatch,
        "eval/eval_real.py",
        _base_argv(
            env,
            "tiny_real",
            ["-I", str(inp), "-O", str(outp), "--size", "16", "--out_size", "16",
             "--num_views", "2", "-R", "4096", "--gif"],
            data_key="srn_data",
            fmt="srn",
        ),
    )
    frame_dirs = [d for d in os.listdir(outp) if d.endswith("_frames")]
    assert frame_dirs
    assert os.listdir(outp / frame_dirs[0])


@pytest.mark.slow
def test_train_cli(monkeypatch, env):
    name = "tiny_train"
    argv = _base_argv(
        env,
        name,
        ["--epochs", "1", "-B", "2", "-R", "32", "--fixed_test", "--lr", "1e-4"],
        data_key="srn_data",
        fmt="srn",
    )
    _run(monkeypatch, "train/train.py", argv)
    ckpt_dir = env["root"] / name / "checkpoints" / name
    files = os.listdir(ckpt_dir)
    assert "latest.pth" in files or any(f.startswith("epoch_") for f in files)
    # upstream-style final weights (pixel_nerf_latest scheme)
    assert "pixel_nerf_latest" in files


@pytest.mark.slow
def test_train_cli_profile(monkeypatch, env, tmp_path):
    """--profile_dir captures a jax.profiler device trace of steps 3-5
    (TensorBoard-viewable; SURVEY §5.1 tracing subsystem)."""
    prof = tmp_path / "prof"
    argv = _base_argv(
        env,
        "tiny_train_prof",
        ["--epochs", "5", "-B", "2", "-R", "32", "--fixed_test",
         "--lr", "1e-4", "--profile_dir", str(prof)],
        data_key="srn_data",
        fmt="srn",
    )
    _run(monkeypatch, "train/train.py", argv)
    trace_files = [
        os.path.join(d, f) for d, _, fs in os.walk(prof) for f in fs
    ]
    assert trace_files, f"no trace files written under {prof}"
    # a REAL trace (not just the directory): jax.profiler writes under
    # plugins/profile/<ts>/ with .xplane.pb (and/or .trace.json.gz) files
    real = [
        p
        for p in trace_files
        if os.sep + os.path.join("plugins", "profile") + os.sep in p
        and (p.endswith(".xplane.pb") or p.endswith(".trace.json.gz"))
    ]
    assert real, f"no plugins/profile xplane/trace files among {trace_files}"


@pytest.mark.slow
def test_train_cli_multi_device(monkeypatch, env, capsys):
    """--gpu_id with N>1 entries must construct a ("data", "rays") mesh and
    train sharded through the CLI path (reference: --gpu_id '0 1 3' drives
    DataParallel, train/train.py:171) — exercised on the 8-CPU-device suite
    backend."""
    name = "tiny_train_mesh"
    argv = _base_argv(
        env,
        name,
        ["--epochs", "6", "-B", "2", "-R", "32", "--fixed_test",
         "--lr", "1e-2", "--gpu_id", "0 1 2 3 4 5 6 7"],
        data_key="srn_data",
        fmt="srn",
    )
    _run(monkeypatch, "train/train.py", argv)
    out = capsys.readouterr().out
    assert "Training mesh: data=2 x rays=4" in out
    # loss decreases through the sharded CLI path (print_interval=1 logs
    # "... t:<loss> lr:..." every step)
    losses = [
        float(m.group(1)) for m in re.finditer(r"\bt:([0-9.]+)", out)
    ]
    assert len(losses) >= 4, out
    assert min(losses[2:]) < losses[0], losses
    ckpt_dir = env["root"] / name / "checkpoints" / name
    files = os.listdir(ckpt_dir)
    assert any(f.startswith("epoch_") for f in files)
    assert "pixel_nerf_latest" in files


@pytest.mark.slow
def test_eval_cli_accel_gate(monkeypatch, env):
    """--accel proposal through the real CLI with the per-object self-gate
    (VERDICT r2 next #6): PIXELNERF_ACCEL_CPU_OK exercises the accel+gate
    path on the CPU backend.  A random-init field's grid is degenerate, so
    the outcome may be any rung of the ladder (proposal/rays/dense, or a
    build-time prune-disable) — the contract is that the run completes, the
    gate printed a decision, and renders are written either way."""
    import io
    from contextlib import redirect_stderr, redirect_stdout

    monkeypatch.setenv("PIXELNERF_ACCEL_CPU_OK", "1")
    out = str(env["root"] / "eval_accel_out")
    buf = io.StringIO()
    with redirect_stdout(buf), redirect_stderr(buf):
        _run(
            monkeypatch,
            "eval/eval.py",
            _base_argv(
                env,
                "tiny_eval_accel",
                ["--split", "val", "-P", "0", "-O", out, "-R", "4096",
                 "--max_objs", "1", "--accel", "proposal",
                 "--accel_build", "fast"],
            ),
        )
    text = buf.getvalue()
    assert "accel gate:" in text or "disabling pruning" in text, text[-2000:]
    objs = [d for d in os.listdir(out) if os.path.isdir(os.path.join(out, d))]
    assert objs
    files = os.listdir(os.path.join(out, objs[0]))
    assert any(f.endswith(".png") for f in files)
