"""Unit test for tools/summarize_run.py — the stage-dir → markdown record
summarizer the real-chip run records (runs/tpu_results/*.md) are built
with. Pure file parsing, no jax."""

import json

from tools.summarize_run import read_stage


def _write_stage(d, rows, best=None):
    d.mkdir(parents=True, exist_ok=True)
    with open(d / "metrics.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    if best is not None:
        (d / "best.json").write_text(json.dumps(best))


def test_read_stage(tmp_path):
    d = tmp_path / "src"
    _write_stage(
        d,
        [
            {"step": 50, "loss": 1.9},
            {"step": 200, "miou": 0.17, "iou": [0.1, 0.2]},
            {"step": 250, "loss": 1.7},
            {"step": 400, "miou": 0.21},
        ],
        best={"miou": 0.21, "step": 400},
    )
    traj, best, last_train = read_stage(str(d))
    assert traj == {200: 0.17, 400: 0.21}
    assert best == {"miou": 0.21, "step": 400}
    assert last_train == {"step": 250, "loss": 1.7}


def test_read_stage_missing_files(tmp_path):
    d = tmp_path / "empty"
    d.mkdir()
    traj, best, last_train = read_stage(str(d))
    assert traj == {} and best is None and last_train is None


def test_main_table(tmp_path, monkeypatch, capsys):
    import sys

    a, b = tmp_path / "a", tmp_path / "b"
    _write_stage(a, [{"step": 100, "miou": 0.3}], best={"miou": 0.3, "step": 100})
    _write_stage(b, [{"step": 200, "miou": 0.5}], best={"miou": 0.5, "step": 200})
    monkeypatch.setattr(
        sys, "argv", ["summarize_run.py", f"src={a}", f"ssl={b}"]
    )
    from tools.summarize_run import main

    main()
    out = capsys.readouterr().out
    assert "| iter | src | ssl |" in out
    assert "| 100 | 0.30000 | — |" in out
    assert "| 200 | — | 0.50000 |" in out
    assert "best mIoU 0.50000 @ iter 200" in out
