"""CLI wiring: run_pipeline --dry-run prints the exact 5-step chain; tools
parse --help without importing heavyweight state."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_run_pipeline_dry_run():
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "run_pipeline.py"),
         "--config-path", "2vaihingen", "--dry-run"],
        capture_output=True, text=True, timeout=240,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.splitlines() if l.startswith("+ ")]
    assert len(lines) == 5
    assert "train_src.py" in lines[0] and "--align-domain 1" in lines[0]
    assert "init_prototypes.py" in lines[1] and "--stage 1" in lines[1]
    assert "train_align_uem.py" in lines[2] and "--refine-label 1" in lines[2]
    assert "init_prototypes.py" in lines[3] and "--stage 2" in lines[3]
    assert "train_ssl_uem.py" in lines[4] and "--lt uvem" in lines[4]


def test_run_pipeline_dry_run_proca():
    """--method proca mirrors the reference runs/proca chain: no domain
    alignment, train_align (not _uem), plain CE self-training."""
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "run_pipeline.py"),
         "--config-path", "pRgb2vaihingen", "--method", "proca", "--dry-run"],
        capture_output=True, text=True, timeout=240,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.splitlines() if l.startswith("+ ")]
    assert len(lines) == 5
    assert "--align-domain 0" in lines[0]
    assert "train_align.py" in lines[2] and "--refine-label" not in lines[2]
    # refinement must be explicitly disabled (train_ssl_uem defaults it on)
    assert "--lt ce" in lines[4] and "--refine-label 0" in lines[4]


def test_all_tools_parse_help():
    """Every CLI parses --help (argparse wiring, imports, flag names).
    One subprocess per tool is slow on this host — batch them in one
    interpreter with patched argv."""
    code = r"""
import importlib, sys
tools = [  # train_ssl is a __main__-only delegator, exercised by e2e runs
    "train_src", "train_align", "train_align_uem", "train_ssl_uem",
    "train_ssl_mix", "train_ssl_dca", "train_ssl_uvem_abl",
    "train_adv", "init_prototypes", "eval", "infer_single", "infer_dir",
    "vis_pseudo_labels", "vis_corrected_pseudo_labels", "tsne_dataset",
    "tsne_img", "generate_superpixels", "convert_datasets", "statistic",
    "class_distribution", "port_weights", "bench_suite", "run_pipeline",
    "serving_gate", "refine_quality", "real_data_gate", "profile_summary",
    "mem_probe",
]
ok = 0
for t in tools:
    m = importlib.import_module(f"tools.{t}")
    sys.argv = [t + ".py", "--help"]
    try:
        m.main()
    except SystemExit as e:
        assert e.code in (0, None), (t, e.code)
    ok += 1
print("HELP_OK", ok)
"""
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=480, cwd=REPO,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert out.returncode == 0, out.stderr[-3000:]
    assert "HELP_OK 28" in out.stdout


def test_parse_int8_stages_flag_validation():
    """Early CLI guard (ADVICE r2): bad values fail fast, the flag is
    rejected when it would be silently ignored, good values parse."""
    import pytest

    from uemda_tpu.infer.fastpath import parse_int8_stages_flag

    assert parse_int8_stages_flag("", False, False) is None
    assert parse_int8_stages_flag("1,2,3,4", True, True) == (1, 2, 3, 4)
    assert parse_int8_stages_flag(" 3 , 4 ", True, True) == (3, 4)
    for bad_args in [("3,4", False, True),   # needs --int8
                     ("3,4", True, False),   # needs --fastpath
                     ("0,5", True, True),    # out of range
                     ("x", True, True),      # not ints
                     (",", True, True)]:     # empty list
        with pytest.raises(SystemExit):
            parse_int8_stages_flag(*bad_args)


def test_matched_accuracy_fractional_bin():
    """Coverage matching must take a FRACTION of the marginal confidence
    bin (fp16 soft labels saturate the top bin), not the whole bin."""
    import numpy as np

    from tools.refine_quality import matched_accuracy

    # all mass in the top bin: 100 mined, 60 correct; take 50 -> uniform
    # within-bin assumption gives 0.6, not 60/100-of-whole-bin at wrong N
    hm = np.zeros(8, np.int64); hc = np.zeros(8, np.int64)
    hm[7], hc[7] = 100, 60
    assert matched_accuracy(hm, hc, 50) == 0.6

    # top bin 10 mined all correct, next bin 90 mined 0 correct;
    # take 50 -> 10 correct of 50
    hm = np.zeros(8, np.int64); hc = np.zeros(8, np.int64)
    hm[7], hc[7] = 10, 10
    hm[6], hc[6] = 90, 0
    assert matched_accuracy(hm, hc, 50) == 10 / 50

    # exact full take equals the raw accuracy
    assert matched_accuracy(hm, hc, 100) == 10 / 100

    # degenerate: empty histograms
    assert matched_accuracy(np.zeros(8, np.int64), np.zeros(8, np.int64), 0) == 0.0
