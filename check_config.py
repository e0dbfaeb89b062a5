"""Validate that a HOCON experiment config parses and print its key fields
(parity with the reference check_config.py:1-49).

Usage: python check_config.py [conf/exp/sn64.conf]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pixelnerf_tpu.config import parse_file


def main():
    conf_path = sys.argv[1] if len(sys.argv) > 1 else "conf/exp/sn64.conf"
    print("Checking config:", conf_path)
    conf = parse_file(conf_path)

    print("\n[model]")
    model = conf["model"]
    for key in (
        "use_encoder",
        "use_xyz",
        "use_code",
        "use_viewdirs",
        "use_code_viewdirs",
        "use_global_encoder",
    ):
        print(f"  {key} = {model.get(key)}")
    print(f"  encoder.backbone = {model.get_string('encoder.backbone', 'resnet34')}")
    print(f"  encoder.num_layers = {model.get_int('encoder.num_layers', 4)}")
    print(
        "  encoder.use_multi_scale =",
        model.get_bool("encoder.use_multi_scale", False),
    )
    print(f"  mlp_coarse.type = {model.get_string('mlp_coarse.type', 'resnet')}")
    print(f"  mlp_coarse.n_blocks = {model.get_int('mlp_coarse.n_blocks', 5)}")
    print(f"  mlp_coarse.d_hidden = {model.get_int('mlp_coarse.d_hidden', 128)}")
    print(
        "  mlp_coarse.combine_layer =",
        model.get_int("mlp_coarse.combine_layer", 1000),
    )

    print("\n[renderer]")
    r = conf["renderer"]
    for key in ("n_coarse", "n_fine", "n_fine_depth"):
        print(f"  {key} = {r.get_int(key, 0)}")
    print(f"  white_bkgd = {r.get('white_bkgd')}")
    print(f"  sched = {r.get_list('sched', None)}")

    print("\n[data]")
    print(f"  format = {conf.get_string('data.format', '(unset)')}")

    print("\n[train]")
    t = conf.get_config("train", None)
    if t is not None:
        for key in t.keys():
            print(f"  {key} = {t.get(key)}")
    print("\nConfig OK")


if __name__ == "__main__":
    main()
