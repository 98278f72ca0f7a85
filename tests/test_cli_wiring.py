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
