"""Shared CLI argument parsing.

Flag-for-flag port of the reference CLI surface (/root/reference/src/util/args.py:9-112):
``-c/--conf``, ``-r/--resume``, ``--gpu_id``, ``-n/--name``, ``-F/--dataset_format``,
``-G/--exp_group_name``, ``--logs_path``, ``--checkpoints_path``, ``--visual_path``,
``--epochs``, ``--lr``, ``--gamma``, ``-D/--datadir``, ``-R/--ray_batch_size``, plus a
per-script ``callback`` for extra flags, and expname->conf/datadir resolution through
``expconf.conf`` (args.py:87-97).

On TPU there is no per-process GPU selection; ``--gpu_id`` is kept for CLI parity and
reinterpreted as a *device count hint*: passing N space-separated ids means "shard over
(up to) N local devices" (the reference used it to drive torch DataParallel,
src/render/nerf.py:368-370).
"""

from __future__ import annotations

import argparse
import os

from . import hocon


def enable_compilation_cache() -> None:
    """Point jax at a persistent compilation cache (XLA compiles of the render
    and train programs take minutes on a remote TPU backend; cached reruns
    start in seconds).  Respects an explicit JAX_COMPILATION_CACHE_DIR;
    PIXELNERF_NO_COMPCACHE=1 disables."""
    if os.environ.get("PIXELNERF_NO_COMPCACHE") == "1":
        return
    try:
        import jax

        if jax.default_backend() == "cpu":
            # CPU compiles are fast, and reusing XLA:CPU AOT results across
            # host-feature mismatches risks SIGILL (observed loader warnings)
            return
        if jax.config.jax_compilation_cache_dir is None:
            path = os.environ.get(
                "JAX_COMPILATION_CACHE_DIR",
                os.path.join(
                    os.path.expanduser("~"), ".cache", "pixelnerf_tpu", "xla"
                ),
            )
            os.makedirs(path, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", path)
        # default threshold skips sub-second compiles; "all" additionally
        # persists the XLA-internal caches (the bulk of the TPU compile time)
        jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
    except Exception:
        pass  # older jax without the knobs — cache is an optimization only

PROJECT_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))


def parse_args(
    callback=None,
    training=False,
    default_conf="conf/default_mv.conf",
    default_expname="example",
    default_data_format="dvr",
    default_num_epochs=10000000,
    default_lr=1e-4,
    default_gamma=1.00,
    default_datadir="data",
    default_ray_batch_size=50000,
    argv=None,
):
    enable_compilation_cache()
    # (long flag, short flag | None, type, default, help) — the flag NAMES
    # and defaults are the reference CLI's contract (src/util/args.py:9-112)
    # and must not drift; everything else here is table-driven
    flag_table = [
        ("conf", "c", str, None,
         "HOCON config path (resolved via expconf.conf when omitted)"),
        ("gpu_id", None, str, "0",
         "space-separated device ids; on TPU this is only a hint for how "
         "many local chips to shard across"),
        ("name", "n", str, default_expname,
         "experiment name (keys conf/datadir lookup in expconf.conf)"),
        ("dataset_format", "F", str, None,
         "loader family: multi_obj | dvr | dvr_gen | dvr_dtu | srn"),
        ("exp_group_name", "G", str, None,
         "optional subdirectory grouping related runs under the output "
         "paths"),
        ("logs_path", None, str, "logs", "where tensorboard events go"),
        ("checkpoints_path", None, str, "checkpoints",
         "where checkpoint trees go"),
        ("visual_path", None, str, "visuals",
         "where vis_step image dumps go"),
        ("epochs", None, int, default_num_epochs,
         "training horizon in epochs (default: effectively unbounded)"),
        ("lr", None, float, default_lr, "optimizer learning rate"),
        ("gamma", None, float, default_gamma,
         "per-epoch exponential lr decay (1.0 = off)"),
        ("datadir", "D", str, None, "dataset root directory"),
        ("ray_batch_size", "R", int, default_ray_batch_size,
         "upper bound on rays per render/train dispatch"),
    ]
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--resume", "-r", action="store_true",
        help="pick up training from the newest checkpoint",
    )
    for long, short, typ, default, text in flag_table:
        names = [f"--{long}"] + ([f"-{short}"] if short else [])
        parser.add_argument(*names, type=typ, default=default, help=text)
    if callback is not None:
        parser = callback(parser)
    args = parser.parse_args(argv)

    if args.exp_group_name is not None:
        args.logs_path = os.path.join(args.logs_path, args.exp_group_name)
        args.checkpoints_path = os.path.join(
            args.checkpoints_path, args.exp_group_name
        )
        args.visual_path = os.path.join(args.visual_path, args.exp_group_name)

    os.makedirs(os.path.join(args.checkpoints_path, args.name), exist_ok=True)
    os.makedirs(os.path.join(args.visual_path, args.name), exist_ok=True)

    expconf_path = os.path.join(PROJECT_ROOT, "expconf.conf")
    if os.path.exists(expconf_path):
        expconf = hocon.parse_file(expconf_path)
    else:
        expconf = hocon.ConfigTree()

    if args.conf is None:
        args.conf = expconf.get_string("config." + args.name, default_conf)
    if args.datadir is None:
        args.datadir = expconf.get_string("datadir." + args.name, default_datadir)

    conf_path = args.conf
    if not os.path.isabs(conf_path) and not os.path.exists(conf_path):
        candidate = os.path.join(PROJECT_ROOT, conf_path)
        if os.path.exists(candidate):
            conf_path = candidate
    conf = hocon.parse_file(conf_path)

    if args.dataset_format is None:
        args.dataset_format = conf.get_string("data.format", default_data_format)

    args.gpu_id = list(map(int, args.gpu_id.split()))

    print("EXPERIMENT NAME:", args.name)
    if training:
        print("CONTINUE?", "yes" if args.resume else "no")
    print("* Config file:", args.conf)
    print("* Dataset format:", args.dataset_format)
    print("* Dataset location:", args.datadir)
    return args, conf
