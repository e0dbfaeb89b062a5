"""Tests for the HOCON-subset parser and ConfigTree getters."""

import os
import textwrap

import pytest

from pixelnerf_tpu.config import hocon


def test_scalars_and_nesting(tmp_path):
    text = textwrap.dedent(
        """
        # comment
        model {
            use_encoder = True
            use_xyz = true   # inline comment
            n = 5
            lr = 1e-4
            name = resnet34
            quoted = "hello world"
        }
        renderer {
            sched = []
            vals = [3, 4, 5]
        }
        """
    )
    conf = hocon.parse_string(text)
    assert conf.get_bool("model.use_encoder") is True
    assert conf.get_bool("model.use_xyz") is True
    assert conf.get_int("model.n") == 5
    assert conf.get_float("model.lr") == pytest.approx(1e-4)
    assert conf.get_string("model.name") == "resnet34"
    assert conf.get_string("model.quoted") == "hello world"
    assert conf.get_list("renderer.sched") == []
    assert conf.get_list("renderer.vals") == [3, 4, 5]


def test_subtree_access_and_defaults():
    conf = hocon.parse_string("a { b { c = 1 } }")
    sub = conf["a"]
    assert sub.get_int("b.c") == 1
    assert conf.get_int("a.b.missing", 7) == 7
    with pytest.raises(KeyError):
        conf.get_int("a.b.missing")
    assert "a.b.c" in conf
    assert "a.x" not in conf


def test_include_and_override(tmp_path):
    base = tmp_path / "default.conf"
    base.write_text(
        "model {\n  n_blocks = 5\n  d_hidden = 128\n}\nrenderer { n_coarse = 128 }\n"
    )
    child = tmp_path / "child.conf"
    child.write_text(
        'include required("default.conf")\n'
        "model {\n  d_hidden = 512\n}\n"
        "data { format = srn }\n"
    )
    conf = hocon.parse_file(str(child))
    # merged: base keys survive, overrides win
    assert conf.get_int("model.n_blocks") == 5
    assert conf.get_int("model.d_hidden") == 512
    assert conf.get_int("renderer.n_coarse") == 128
    assert conf.get_string("data.format") == "srn"


def test_bool_via_get_float():
    # reference reads white_bkgd with get_float though it is a bool
    # (src/render/nerf.py:348)
    conf = hocon.parse_string("white_bkgd = True")
    assert conf.get_float("white_bkgd") == 1.0


def test_multiline_list():
    conf = hocon.parse_string("sched = [\n  0, 1,\n  2\n]\n")
    assert conf.get_list("sched") == [0, 1, 2]


def test_repo_conf_files_parse():
    root = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
    conf_dir = os.path.join(root, "conf")
    exp = os.path.join(conf_dir, "exp")
    for name in os.listdir(exp):
        conf = hocon.parse_file(os.path.join(exp, name))
        # Every experiment config must inherit the full model/renderer tree.
        assert conf.get_bool("model.use_encoder") is True
        assert conf.get_int("renderer.n_coarse") > 0
        assert conf.get_string("data.format")


def test_shipped_sn64_conf_values():
    root = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
    conf = hocon.parse_file(os.path.join(root, "conf", "exp", "sn64.conf"))
    assert conf.get_bool("model.encoder.use_first_pool") is False
    assert conf.get_int("model.mlp_coarse.combine_layer") == 3
    assert conf.get_string("model.mlp_coarse.combine_type") == "average"
    assert conf.get_int("renderer.n_fine") == 32
    assert conf.get_float("model.code.freq_factor") == pytest.approx(1.5)
    assert conf.get_string("data.format") == "dvr"
