"""Dry-run tests for scripts/render_shapenet.py (no Blender needed).

The reference script (render_shapenet.py:594-724) runs only inside bpy; here
the camera-path math, split bookkeeping, and transforms.json writer are pure
Python, exercised via RENDER_SHAPENET_DRYRUN.
"""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(__file__), "..", "scripts")
)
import render_shapenet as rs  # noqa: E402

REFERENCE_FLAGS = {
    "--out_dir", "--src_model_dir", "--object", "--model_path", "--val_frac",
    "--test_frac", "--split", "--n_views", "--start_idx", "--end_idx",
    "--n_objects", "--use_pbr", "--light_env", "--light_strength",
    "--render_alpha", "--render_depth", "--render_bg", "--res", "--n_samples",
    "--color_depth", "--use_gpu", "--gpus", "--overwrite", "--pool",
}


def _fake_models(root, n=10):
    src = root / "03001627"
    for i in range(n):
        d = src / f"inst{i:04d}" / "models"
        d.mkdir(parents=True)
        (d / "model_normalized.obj").write_text("o fake\n")
    return str(src)


def test_flag_surface_matches_reference():
    """Every flag of the reference's parser (:612-714) must exist."""
    args = rs.parse_args(
        ["--out_dir", "/tmp/x", "--src_model_dir", "/tmp/y"]
    )
    ours = {
        "--" + k for k in vars(args)
    }
    assert REFERENCE_FLAGS <= ours, REFERENCE_FLAGS - ours
    assert rs.OBJ_IDS["chair"] == "03001627"


def test_split_files_deterministic(tmp_path):
    src = _fake_models(tmp_path, n=10)
    args = rs.parse_args(
        ["--out_dir", str(tmp_path / "out"), "--src_model_dir", src]
    )
    np.random.seed(0)
    train = rs.get_split(args)
    # 10 * 0.2 = 2 val + 2 test -> 6 train; persisted as *_split_N.txt
    assert len(train) == 6
    assert os.path.isfile(os.path.join(src, "train_split_6.txt"))
    assert os.path.isfile(os.path.join(src, "val_split_2.txt"))
    assert os.path.isfile(os.path.join(src, "test_split_2.txt"))
    # second call must reuse the files (stable even with a different rng state)
    np.random.seed(123)
    assert rs.get_split(args) == train
    args2 = rs.parse_args(
        ["--out_dir", "x", "--src_model_dir", src, "--split", "val"]
    )
    val = rs.get_split(args2)
    assert len(val) == 2 and not (set(val) & set(train))


def test_camera_paths():
    rng = np.random.default_rng(9)
    tr = rs.camera_path_angles("train", 16, rng)
    te = rs.camera_path_angles("test", 16, rng)
    assert tr.shape == te.shape == (16, 3)
    # pitch within the hemisphere range
    for a in (tr, te):
        assert (a[:, 0] >= 0).all() and (a[:, 0] <= np.deg2rad(80) + 1e-6).all()
    # test spiral is deterministic and monotonically rising
    assert (np.diff(te[:, 0]) > 0).all()
    np.testing.assert_allclose(
        te, rs.camera_path_angles("test", 16, np.random.default_rng(0))
    )

    # orbit matrix: rotation orthonormal, camera looks at the target
    M = rs.orbit_camera_matrix(tr[3], (0, 4.0, 0), (0, 0, 0))
    R = M[:3, :3]
    np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-8)
    view_dir = -R[:, 2]
    to_target = -M[:3, 3] / np.linalg.norm(M[:3, 3])
    np.testing.assert_allclose(view_dir, to_target, atol=1e-8)


def test_dryrun_end_to_end(tmp_path, monkeypatch):
    """Full pipeline without bpy: per-instance view files + transforms.json
    with the reference's fields, overwrite-skip semantics, subset indices."""
    if rs.bpy is not None:
        pytest.skip("running inside Blender")
    src = _fake_models(tmp_path, n=10)
    out = tmp_path / "out"
    monkeypatch.setenv("RENDER_SHAPENET_DRYRUN", "1")
    monkeypatch.setattr(
        sys, "argv",
        ["render_shapenet.py",
         "--out_dir", str(out), "--src_model_dir", src,
         "--split", "test", "--n_views", "5",
         "--render_alpha", "--render_depth"],
    )
    np.random.seed(0)
    rs.main()

    inst_dirs = [d for d in os.listdir(out) if (out / d).is_dir()]
    assert len(inst_dirs) == 2  # test split
    for d in inst_dirs:
        files = os.listdir(out / d)
        views = [f for f in files if f.startswith("view_")]
        alphas = [f for f in files if f.startswith("alpha_")]
        depths = [f for f in files if f.startswith("depth_")]
        assert len(views) == len(alphas) == len(depths) == 5
        meta = json.load(open(out / d / "transforms.json"))
        assert set(meta) == {"frames", "model_ids", "camera_angle_x"}
        assert len(meta["frames"]) == 5
        assert meta["model_ids"] == [d]
        for fr in meta["frames"]:
            M = np.asarray(fr["transform_matrix"])
            assert M.shape == (4, 4)
            assert abs(np.linalg.det(M[:3, :3]) - 1.0) < 1e-6
            assert fr["file_path"].endswith(
                f"view_{meta['frames'].index(fr):03d}"
            )

    # overwrite-skip: a second run must not re-render (returns False)
    rng = np.random.default_rng(9)
    args = rs.parse_args(
        ["--out_dir", str(out), "--src_model_dir", src,
         "--split", "test", "--n_views", "5"]
    )
    models = rs.get_split(args)
    assert rs.render_views(args, [models[0]], rng) is False
    args.overwrite = True
    assert rs.render_views(args, [models[0]], rng) is True


def test_finalize_pass_files(tmp_path):
    """Blender's file-output nodes append a frame number; finalize strips it
    and errors on ambiguity instead of picking a stale file."""
    d = str(tmp_path)
    open(os.path.join(d, "alpha_007_0001.png"), "wb").close()
    rs._finalize_pass_files([(d, "alpha_007")])
    assert os.listdir(d) == ["alpha_007.png"]
    # ambiguity (stale frame file from an interrupted run) must raise
    open(os.path.join(d, "depth_000_0001.exr"), "wb").close()
    open(os.path.join(d, "depth_000_0002.exr"), "wb").close()
    with pytest.raises(RuntimeError, match="exactly one"):
        rs._finalize_pass_files([(d, "depth_000")])


def test_dryrun_depth_is_exr(tmp_path, monkeypatch):
    """The depth pass is raw 32-bit OPEN_EXR (reference :434-441), and the
    dry-run placeholder mirrors that extension."""
    if rs.bpy is not None:
        pytest.skip("running inside Blender")
    src = _fake_models(tmp_path, n=5)
    out = tmp_path / "out"
    monkeypatch.setenv("RENDER_SHAPENET_DRYRUN", "1")
    monkeypatch.setattr(
        sys, "argv",
        ["render_shapenet.py", "--out_dir", str(out), "--src_model_dir", src,
         "--split", "test", "--n_views", "2", "--render_depth"],
    )
    np.random.seed(0)
    rs.main()
    inst = next(d for d in os.listdir(out) if (out / d).is_dir())
    depths = [f for f in os.listdir(out / inst) if f.startswith("depth_")]
    assert depths and all(f.endswith(".exr") for f in depths)
