"""Blender ShapeNet scene renderer (parity with the reference
scripts/render_shapenet.py:1-785, flag surface :594-724).

Renders single- or two-object ShapeNet scenes: train views from noisy
hemisphere bins, val/test views on the SRN Archimedes spiral
(:492-500), writing ``view_###`` images plus NeRF-format
``transforms.json`` (:516-522) per instance — the layout the
``multi_obj`` data adapter consumes.  Supports Cycles PBR with HDRI
environment lighting, alpha / depth / background compositor passes,
GPU device selection, resumable ``--overwrite`` semantics, and a
process-pool parallel mode (:726-763).

Run inside Blender:
    blender --background --python scripts/render_shapenet.py -- \
        --out_dir out --src_model_dir /data/ShapeNet/03001627 --split train

The camera-path math, split bookkeeping, and transforms.json writer are
pure Python (no bpy) so they can be dry-run tested:
    RENDER_SHAPENET_DRYRUN=1 python scripts/render_shapenet.py --out_dir ...
writes placeholder images + real camera transforms without Blender.
"""

import argparse
import glob
import json
import math
import os
import os.path as osp
import sys
import time

import numpy as np

try:
    import bpy
    from mathutils import Vector
except ImportError:  # outside Blender
    bpy = None

OBJ_IDS = dict(
    table="04379243",
    chair="03001627",
    mug="03797390",
    bench="02828884",
    lamp="03636649",
    bowl="02880940",
)

PITCH_RANGE = (0.0, math.radians(80))


# ---------------------------------------------------------------------------
# Pure helpers (no bpy) — camera paths, splits, transforms.json
# ---------------------------------------------------------------------------


def camera_path_angles(split: str, n_views: int, rng) -> "np.ndarray":
    """Per-view (euler_x, euler_z) — train: binned hemisphere + noise; val /
    test: Archimedes spiral (reference render_views :492-503)."""
    euler_zs = 6 * np.pi * np.arange(n_views) / n_views
    if split == "train":
        euler_xs = rng.uniform(*PITCH_RANGE, size=(n_views,))
        euler_zs = euler_zs + rng.uniform(np.pi / n_views, size=(n_views,))
    else:
        euler_xs = (
            np.arange(n_views) / n_views * (PITCH_RANGE[1] - PITCH_RANGE[0])
        )
    return np.stack([euler_xs, np.zeros(n_views), euler_zs], axis=-1)


def orbit_camera_matrix(rot_euler, camera_loc, lookat):
    """World matrix of a camera parented to an empty at ``lookat`` rotated by
    ``rot_euler`` (XYZ), tracking the empty — the numpy twin of the bpy
    TrackTo rig (reference :83-110) used for the dry run."""
    ex, _, ez = rot_euler
    cx, sx = math.cos(ex), math.sin(ex)
    cz, sz = math.cos(ez), math.sin(ez)
    Rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    Rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    pos = np.asarray(lookat) + Rz @ Rx @ (
        np.asarray(camera_loc) - np.asarray(lookat)
    )
    # -Z toward lookat, Y up (Blender camera convention)
    fwd = np.asarray(lookat) - pos
    fwd = fwd / (np.linalg.norm(fwd) + 1e-12)
    up = np.array([0.0, 0.0, 1.0])
    right = np.cross(fwd, up)
    if np.linalg.norm(right) < 1e-8:
        right = np.array([1.0, 0.0, 0.0])
    right = right / np.linalg.norm(right)
    true_up = np.cross(right, fwd)
    M = np.eye(4)
    M[:3, 0] = right
    M[:3, 1] = true_up
    M[:3, 2] = -fwd
    M[:3, 3] = pos
    return M


def _load_split_txt(path):
    with open(path, "r") as f:
        return [str(s.split()[0]) for s in f.readlines() if s.strip()]


def get_split(args):
    """Deterministic train/val/test instance split, persisted as
    ``{split}_split_{n}.txt`` next to the models (reference :535-592)."""
    object_dir = args.src_model_dir
    models_all = sorted(
        subd for subd in glob.glob(f"{object_dir}/*") if osp.isdir(subd)
    )
    n_total = len(models_all)
    n_val = int(args.val_frac * n_total)
    n_test = int(args.test_frac * n_total)
    n_train = n_total - (n_val + n_test)

    paths = {
        "train": osp.join(object_dir, f"train_split_{n_train}.txt"),
        "val": osp.join(object_dir, f"val_split_{n_val}.txt"),
        "test": osp.join(object_dir, f"test_split_{n_test}.txt"),
    }
    if not all(osp.isfile(p) for p in paths.values()):
        permute = np.random.permutation(n_total)
        chunks = {
            "train": permute[:n_train],
            "val": permute[n_train : n_train + n_val],
            "test": permute[n_train + n_val :],
        }
        for split, ids in chunks.items():
            with open(paths[split], "w") as f:
                f.write("\n".join(models_all[i] for i in ids))
    if args.split not in paths:
        raise NotImplementedError(args.split)
    return _load_split_txt(paths[args.split])


def write_transforms(out_dir, frames, model_dirs, camera_angle_x):
    payload = {
        "frames": frames,
        "model_ids": [osp.basename(d) for d in model_dirs],
        "camera_angle_x": camera_angle_x,
    }
    with open(osp.join(out_dir, "transforms.json"), "w") as f:
        json.dump(payload, f, indent=1, separators=(",", ":"))


def scene_camera_setup(n_models):
    """(camera_loc, lookat) for 1- or 2-object scenes (reference :285-325)."""
    if n_models == 1:
        return np.array((0.0, 4.0, 0.0)), np.zeros(3)
    if n_models == 2:
        return np.array((0.0, 6.0, 0.0)), np.zeros(3)
    raise NotImplementedError("only 1- or 2-object scenes (reference :324)")


# ---------------------------------------------------------------------------
# bpy-dependent rendering
# ---------------------------------------------------------------------------


def _import_object(model_dir, model_path):
    before = set(bpy.data.objects)
    path = osp.join(model_dir, model_path)
    bpy.ops.wm.obj_import(filepath=path, forward_axis="NEGATIVE_Z", up_axis="Y")
    new = [o for o in bpy.data.objects if o not in before and o.type == "MESH"]
    root = new[0]
    bb = [list(v) for v in root.bound_box]
    return root, (bb[0], bb[6])


def _add_camera(camera_loc, lookat, fov_x=None):
    cam_data = bpy.data.cameras.new("cam")
    if fov_x is not None:
        cam_data.angle_x = fov_x
    cam = bpy.data.objects.new("cam", cam_data)
    bpy.context.scene.collection.objects.link(cam)
    bpy.context.scene.camera = cam
    # TrackTo rig: empty at lookat, camera parented to it (reference :83-110)
    empty = bpy.data.objects.new("track_to", None)
    empty.location = Vector(lookat)
    bpy.context.scene.collection.objects.link(empty)
    cam.parent = empty
    cam.location = Vector(np.asarray(camera_loc) - np.asarray(lookat))
    con = cam.constraints.new(type="TRACK_TO")
    con.target = empty
    con.track_axis = "TRACK_NEGATIVE_Z"
    con.up_axis = "UP_Y"
    return cam, empty


def _add_lamps():
    for loc, energy in (((2, 2, 4), 600), ((-3, 1, 3), 300), ((0, -3, 3), 300)):
        data = bpy.data.lights.new("pt", type="POINT")
        data.energy = energy
        light = bpy.data.objects.new("pt", data)
        light.location = loc
        bpy.context.scene.collection.objects.link(light)


def _add_light_env(filepath, strength):
    world = bpy.context.scene.world
    world.use_nodes = True
    nodes = world.node_tree.nodes
    links = world.node_tree.links
    env = nodes.new("ShaderNodeTexEnvironment")
    env.image = bpy.data.images.load(filepath)
    bg = nodes["Background"]
    bg.inputs["Strength"].default_value = strength
    links.new(env.outputs["Color"], bg.inputs["Color"])


def _select_devices(gpus):
    prefs = bpy.context.preferences.addons["cycles"].preferences
    prefs.compute_device_type = "CUDA"
    prefs.get_devices()
    for i, dev in enumerate(prefs.devices):
        dev.use = (
            dev.type != "CPU" and (gpus is None or i in gpus)
        ) or dev.type == "CPU"


def _set_engine(args):
    scene = bpy.context.scene
    if args.use_pbr:
        scene.render.engine = "CYCLES"
        scene.cycles.samples = args.n_samples
        if args.use_gpu:
            scene.cycles.device = "GPU"
            _select_devices(args.gpus)
        if args.light_env:
            _add_light_env(args.light_env, args.light_strength)
        else:
            _add_lamps()
    else:
        scene.render.engine = "BLENDER_EEVEE"
        _add_lamps()
    scene.render.resolution_x = args.res
    scene.render.resolution_y = args.res
    scene.render.film_transparent = True
    scene.render.image_settings.file_format = "PNG"
    scene.render.image_settings.color_mode = "RGBA"
    scene.render.image_settings.color_depth = str(args.color_depth)


def _add_output_node(scene, layer_output, name, to_gray=False, exr=False):
    """Create a NAMED file-output node; its path is re-pointed per view by
    :func:`_render_single` (reference _update_node_filepath :391-397)."""
    tree = scene.node_tree
    node = tree.nodes.new("CompositorNodeOutputFile")
    node.name = name
    if exr:
        # raw metric depth like the reference (:434-441) — a normalized PNG
        # would lose the scale consumers need
        node.format.file_format = "OPEN_EXR"
        node.format.color_depth = "32"
    elif to_gray:
        node.format.color_mode = "BW"
    tree.links.new(layer_output, node.inputs[0])
    return node


def _ensure_composite(scene):
    """``write_still`` with ``use_nodes=True`` saves the COMPOSITOR result:
    a Composite node fed by the render layers must exist (the reference
    keeps Blender's default tree alive for this, :399-410).  The factory-
    empty scene this script builds has no default nodes, so create them."""
    tree = scene.node_tree
    rl = next((n for n in tree.nodes if n.type == "R_LAYERS"), None)
    if rl is None:
        rl = tree.nodes.new("CompositorNodeRLayers")
    comp = next((n for n in tree.nodes if n.type == "COMPOSITE"), None)
    if comp is None:
        comp = tree.nodes.new("CompositorNodeComposite")
    tree.links.new(rl.outputs["Image"], comp.inputs["Image"])
    return rl


def _setup_compositing(scene, args):
    """Background / alpha / depth output passes (reference :399-463).

    The main ``view_###.png`` image is the compositor result saved by
    ``write_still`` (film-transparent RGBA object render); the optional
    passes go through named file-output nodes re-pointed per view.
    Returns the list of pass names."""
    scene.use_nodes = True
    view_layer = scene.view_layers[0]
    view_layer.use_pass_z = args.render_depth
    rl = _ensure_composite(scene)
    passes = []
    if args.render_bg:
        # separate view layer rendering only the environment pass
        # (reference _add_background_layer :444-466)
        bg_layer = scene.view_layers.new("Background Layer")
        bg_layer.use_pass_combined = False
        bg_layer.use_pass_z = False
        bg_layer.use_pass_environment = True
        bg_rl = scene.node_tree.nodes.new("CompositorNodeRLayers")
        bg_rl.layer = bg_layer.name
        _add_output_node(scene, bg_rl.outputs["Env"], "Background File Output")
        passes.append("background")
    if args.render_alpha:
        _add_output_node(
            scene, rl.outputs["Alpha"], "Alpha File Output", to_gray=True
        )
        passes.append("alpha")
    if args.render_depth:
        _add_output_node(
            scene, rl.outputs["Depth"], "Depth File Output", exr=True
        )
        passes.append("depth")
    return passes


_PASS_NODE = {
    "background": "Background File Output",
    "alpha": "Alpha File Output",
    "depth": "Depth File Output",
}


def _render_single(filepath, args, passes):
    """Render one view: re-point every pass node into the instance dir with
    a per-view prefix, then render (reference _render_single :351-374).
    Writing into the instance dir (not a shared /tmp) keeps --pool workers
    from clobbering each other's pass files."""
    scene = bpy.context.scene
    scene.render.filepath = filepath
    dirname, view = osp.dirname(filepath), osp.basename(filepath)
    idx = view.split("_", 1)[1]  # "view_007" -> "007"
    outputs = []
    for p in passes:
        node = scene.node_tree.nodes[_PASS_NODE[p]]
        node.base_path = dirname
        node.file_slots[0].path = f"{p}_{idx}_"
        outputs.append((dirname, f"{p}_{idx}"))
    bpy.ops.render.render(write_still=True)
    return outputs


def _finalize_pass_files(outputs):
    """Blender appends the frame number to file-output paths
    (``alpha_007_0001.png``); strip it (reference _move_files :377-388)."""
    for dirname, prefix in outputs:
        matching = glob.glob(osp.join(dirname, prefix + "_*"))
        if len(matching) != 1:
            raise RuntimeError(
                f"expected exactly one render output for {prefix}, got "
                f"{matching} (stale files from an interrupted run?)"
            )
        ext = osp.splitext(matching[0])[1]
        os.replace(matching[0], osp.join(dirname, prefix + ext))


def setup_scene(args, model_dirs):
    """Import 1-2 instances, place them (quadrants for 2), aim the camera
    (reference :285-331)."""
    bpy.ops.wm.read_factory_settings(use_empty=True)
    world = bpy.data.worlds.new("world")
    bpy.context.scene.world = world
    _set_engine(args)
    objs = []
    lookat = np.zeros(3)
    if len(model_dirs) == 1:
        obj, _ = _import_object(model_dirs[0], args.model_path)
        obj.location[0] = obj.location[1] = 0
        objs = [obj]
    elif len(model_dirs) == 2:
        sign = -1
        for model_dir in model_dirs:
            obj, bb = _import_object(model_dir, args.model_path)
            obj.location[0] = sign * bb[0][0]
            obj.location[1] = sign * bb[0][1]
            sign *= -1
            objs.append(obj)
    else:
        raise NotImplementedError
    camera_loc, lookat = scene_camera_setup(len(model_dirs))
    cam, track_to = _add_camera(camera_loc, lookat)
    return objs, cam, track_to, camera_loc, lookat


# ---------------------------------------------------------------------------
# Per-instance render loop (bpy or dry run)
# ---------------------------------------------------------------------------


def render_views(args, model_dirs, rng):
    out_dir = osp.join(args.out_dir, osp.basename(model_dirs[0]))
    if (
        osp.isdir(out_dir)
        and len(os.listdir(out_dir)) >= args.n_views
        and not args.overwrite
    ):
        print(f"images already written for {out_dir}")
        return False
    os.makedirs(out_dir, exist_ok=True)

    dry = bpy is None
    angles = camera_path_angles(args.split, args.n_views, rng)
    camera_loc, lookat = scene_camera_setup(len(model_dirs))
    fov_x = math.radians(51.0)

    if not dry:
        objs, cam, track_to, camera_loc, lookat = setup_scene(args, model_dirs)
        prefixes = _setup_compositing(bpy.context.scene, args)
        fov_x = cam.data.angle_x

    frames = []
    t0 = time.time()
    for i in range(args.n_views):
        filepath = osp.join(out_dir, f"view_{i:03d}")
        if dry:
            open(filepath + ".png", "wb").close()
            if args.render_alpha:
                open(osp.join(out_dir, f"alpha_{i:03d}.png"), "wb").close()
            if args.render_depth:
                # raw 32-bit depth pass (OPEN_EXR, like the reference :434)
                open(osp.join(out_dir, f"depth_{i:03d}.exr"), "wb").close()
            if args.render_bg:
                open(osp.join(out_dir, f"background_{i:03d}.png"), "wb").close()
            matrix = orbit_camera_matrix(angles[i], camera_loc, lookat)
        else:
            track_to.rotation_euler = angles[i]
            _finalize_pass_files(_render_single(filepath, args, prefixes))
            bpy.context.view_layer.update()
            # camera matrix read AFTER render: the view layer updates lazily
            matrix = np.array(bpy.context.scene.camera.matrix_world)
        frames.append(
            {"file_path": filepath, "transform_matrix": matrix.tolist()}
        )

    write_transforms(out_dir, frames, model_dirs, fov_x)
    print(f"rendering {model_dirs[0]} took {time.time() - t0:.1f} seconds")
    return True


def _main_sequential(args):
    model_dirs = get_split(args)
    end_idx = args.end_idx if args.end_idx > 0 else len(model_dirs)
    rng = np.random.default_rng(seed=9)
    for model_dir in model_dirs[args.start_idx : end_idx]:
        sel_dirs = [model_dir]
        for _ in range(args.n_objects - 1):
            sel_dirs.append(rng.choice(model_dirs))
        render_views(args, sel_dirs, rng)


def _main_parallel(args):
    from concurrent.futures import ProcessPoolExecutor

    from numpy.random import MT19937, Generator, SeedSequence

    model_dirs = get_split(args)
    end_idx = args.end_idx if args.end_idx > 0 else len(model_dirs)
    rngs = [
        Generator(MT19937(sg))
        for sg in SeedSequence(9).spawn(end_idx - args.start_idx)
    ]
    futures = []
    with ProcessPoolExecutor(max_workers=16) as executor:
        for model_dir, rng in zip(model_dirs[args.start_idx : end_idx], rngs):
            sel_dirs = [model_dir]
            for _ in range(args.n_objects - 1):
                sel_dirs.append(rng.choice(model_dirs))
            futures.append(executor.submit(render_views, args, sel_dirs, rng))
        for future in futures:
            future.result()


def parse_args(argv=None):
    if argv is None:
        argv = sys.argv
        argv = argv[argv.index("--") + 1 :] if "--" in argv else argv[1:]
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--out_dir", required=True, help="Where to write the rendered images"
    )
    parser.add_argument(
        "--src_model_dir",
        required=True,
        help="Directory where ShapeNet models are stored",
    )
    parser.add_argument(
        "--object",
        choices=OBJ_IDS.keys(),
        default="chair",
        help="Which ShapeNet class to use",
    )
    parser.add_argument(
        "--model_path",
        type=str,
        default="models/model_normalized.obj",
        help="Path to model, inside an instance of the ShapeNet class directory",
    )
    parser.add_argument(
        "--val_frac",
        type=float,
        default=0.2,
        help="Fraction of instances to use as validation",
    )
    parser.add_argument(
        "--test_frac",
        type=float,
        default=0.2,
        help="Fraction of instances to use as test",
    )
    parser.add_argument(
        "--split",
        choices=["train", "val", "test"],
        default="train",
        help="Which split to render",
    )
    parser.add_argument(
        "--n_views", type=int, default=20,
        help="Number of views to render per instance",
    )
    parser.add_argument(
        "--start_idx", type=int, default=0,
        help="If rendering a subset of the instances, starting instance to render.",
    )
    parser.add_argument(
        "--end_idx", type=int, default=-1,
        help="If rendering a subset of the instances, ending instance to render.",
    )
    parser.add_argument(
        "--n_objects", type=int, default=1, help="number of objects in scene"
    )
    parser.add_argument(
        "--use_pbr", action="store_true",
        help="Whether to render with physically based rendering (Blender Cycles) or not.",
    )
    parser.add_argument(
        "--light_env", default=None,
        help="If using PBR rendering and an HDRI light map, the path to the HDRI",
    )
    parser.add_argument(
        "--light_strength", type=float, default=3,
        help="If using HDRI light map, HDRI strength",
    )
    parser.add_argument(
        "--render_alpha", action="store_true",
        help="select to render the object masks",
    )
    parser.add_argument(
        "--render_depth", action="store_true",
        help="select to render the depth map",
    )
    parser.add_argument(
        "--render_bg", action="store_true",
        help="select to render the background layer",
    )
    parser.add_argument(
        "--res", type=int, default=128,
        help="Output resolution of images (res x res), default 128",
    )
    parser.add_argument(
        "--n_samples", type=int, default=128,
        help="Number of anti-aliasing samples, default 128",
    )
    parser.add_argument(
        "--color_depth", type=int, default=16,
        help="Color depth of images (default 16)",
    )
    parser.add_argument(
        "--use_gpu", action="store_true", default=False,
        help="Use GPU devices for Cycles rendering",
    )
    parser.add_argument(
        "--gpus", nargs="*", type=int,
        help="Indices of GPU devices to render with",
    )
    parser.add_argument(
        "--overwrite", action="store_true", default=False,
        help="Overwrite existing renders",
    )
    parser.add_argument(
        "--pool", action="store_true", default=False,
        help="Render in parallel. Improves performance.",
    )
    return parser.parse_args(argv)


def main():
    args = parse_args()
    if bpy is None and not os.environ.get("RENDER_SHAPENET_DRYRUN"):
        print(
            "This script must run inside Blender:\n"
            "  blender --background --python scripts/render_shapenet.py -- --help\n"
            "(set RENDER_SHAPENET_DRYRUN=1 for a bpy-less dry run)"
        )
        sys.exit(1)
    os.makedirs(args.out_dir, exist_ok=True)
    if args.pool:
        _main_parallel(args)
    else:
        _main_sequential(args)
    print("finished rendering")


if __name__ == "__main__":
    main()
