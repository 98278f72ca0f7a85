"""Config system: presets, dotted resolution, user files, snapshots."""

import json
import os

import pytest

from uemda_tpu.config import PRESETS, load_config, snapshot_config


def test_presets_cover_all_pairs():
    base = {"2vaihingen", "2potsdam", "2urban", "2rural",
            "pRgb2vaihingen", "pRgb2potsdam"}
    # every base pair exists, plus a proca.-prefixed variant whose only
    # difference is the snapshot-dir family (reference configs/st/proca/*)
    assert set(PRESETS) == base | {f"proca.{n}" for n in base}
    for n in base:
        p, u = PRESETS[f"proca.{n}"], PRESETS[n]
        assert p.snapshot_dir == f"./log/proca/{n}"
        assert u.snapshot_dir != p.snapshot_dir
        import dataclasses

        assert dataclasses.replace(
            p, snapshot_dir=u.snapshot_dir
        ) == u
    v = PRESETS["2vaihingen"]
    assert v.class_num == 6 and v.ignore_label == -1
    assert v.stage1_steps == 4000 and v.stage2_steps == 6000
    assert v.cutoff_top == 0.8 and v.cutoff_low == 0.6
    assert v.crop == (512, 512)
    u = PRESETS["2urban"]
    assert u.class_num == 7 and u.crop == (512, 512)
    # source norm stats follow the domain (ToVaihingen.py:51-53)
    assert abs(v.source.mean[0] - 97.4603) < 1e-3
    assert abs(v.target.mean[0] - 120.8217) < 1e-3
    # ProCA RGB pairs (configs/st/proca/pRgb2vaihingen.py:26-28,38):
    # ResNet-101, RGB-Potsdam source, Vaihingen stats on both domains
    p = PRESETS["pRgb2vaihingen"]
    assert p.model == "resnet101"
    assert "Potsdam_rgb" in p.source.image_dir[0]
    assert abs(p.source.mean[0] - 120.8217) < 1e-3
    assert abs(PRESETS["pRgb2potsdam"].source.mean[0] - 123.675) < 1e-3


def test_dotted_reference_form_resolves():
    cfg = load_config("st.uemda.2vaihingen")
    assert cfg.name == "2vaihingen"
    assert "/proca/" not in cfg.snapshot_dir
    # the method component routes the snapshot-dir family
    proca = load_config("st.proca.pRgb2vaihingen")
    assert proca.snapshot_dir == "./log/proca/pRgb2vaihingen"
    assert load_config("st.uemda.pRgb2vaihingen").snapshot_dir == \
        "./log/uemda/pRgb2vaihingen"


def test_unknown_config_raises_with_choices():
    with pytest.raises(KeyError, match="2vaihingen"):
        load_config("nope")


def test_snapshot_and_postfix(tmp_path):
    cfg = load_config("2vaihingen", snapshot_postfix="/src")
    assert cfg.snapshot_dir.endswith("/src")
    snapshot_config(cfg, str(tmp_path))
    data = json.loads((tmp_path / "config.json").read_text())
    assert data["name"] == "2vaihingen"


def test_user_config_file(tmp_path):
    p = tmp_path / "mycfg.py"
    p.write_text(
        "from uemda_tpu.config import PRESETS\n"
        "import dataclasses\n"
        "CONFIG = dataclasses.replace(PRESETS['2vaihingen'], stage1_steps=7)\n"
    )
    cfg = load_config(str(p))
    assert cfg.stage1_steps == 7
