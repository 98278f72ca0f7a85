"""Multi-host readiness tests (VERDICT round-1 item 4).

* 2-process CPU run: launches tests/multihost_worker.py twice with
  ``jax.distributed`` over a localhost coordinator; asserts both processes
  converge to the SAME loss/params and that the value equals a
  single-process numpy replay of the same global batch (so the per-process
  data sharding + cross-host gradient reduction is exact).
* local_batch_slice partition law + infinite_batches process_shard
  equivalence (the sharded streams concatenate to the global stream).
"""

import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _single_process_reference():
    """Replay the worker's math in numpy f32."""
    GB, D, C = 8, 16, 4
    rng = np.random.default_rng(0)
    X = rng.normal(size=(GB, D)).astype(np.float32)
    Y = rng.normal(size=(GB, C)).astype(np.float32)
    w = np.zeros((D, C), np.float32)
    loss = None
    for _ in range(3):
        r = X @ w - Y
        loss = np.mean(r**2)
        g = 2.0 * X.T @ r / r.size
        w = w - 0.1 * g
    return float(loss), float(np.abs(w).sum())


def test_two_process_cpu_training_matches_single_process():
    # NOTE: two workers necessarily compile concurrently (jax.distributed is
    # synchronous across processes), briefly bending the 1-core-host rule in
    # CLAUDE.md — the model is a single tiny dense layer precisely so both
    # cold compiles stay within the 540 s communicate() budget.
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # fresh XLA_FLAGS: the worker appends its own device-count flag
    env["XLA_FLAGS"] = ""
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, coord, "2", str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=REPO,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
    except subprocess.TimeoutExpired:
        # kill BOTH workers before failing — orphaned spinning processes
        # starve every later compile on this 1-core host
        for p in procs:
            if p.poll() is None:
                p.kill()
        outs = [p.communicate()[0] for p in procs]
        raise AssertionError(
            "multihost worker hung (540s); partial output:\n"
            + "\n---\n".join(o or "" for o in outs)
        )
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}"

    results = {}
    for out in outs:
        m = re.search(r"RESULT pid=(\d) loss=([\d.]+) wsum=([\d.]+)", out)
        assert m, out
        results[int(m.group(1))] = (float(m.group(2)), float(m.group(3)))
    assert set(results) == {0, 1}
    # both processes hold identical replicated results
    np.testing.assert_allclose(results[0], results[1], rtol=0, atol=0)
    # and they match the single-process replay of the same global batches
    ref = _single_process_reference()
    np.testing.assert_allclose(results[0], ref, rtol=1e-5, atol=1e-7)


def _launch_workers(argv_tails, timeout=900):
    """Start one worker subprocess per argv tail, harvest RESULT lines."""
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["XLA_FLAGS"] = ""  # worker appends its own device-count flag
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER] + [str(a) for a in tail],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=REPO,
        )
        for tail in argv_tails
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            if p.poll() is None:
                p.kill()
        outs = [p.communicate()[0] for p in procs]
        raise AssertionError(
            f"multihost worker hung ({timeout}s); partial output:\n"
            + "\n---\n".join(o or "" for o in outs)
        )
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}"
    return outs


def _run_ssl_config(root, nproc, steps_per_call):
    """Run the real-SSL-step worker at one (nproc, K); return {pid: (fp,
    miou, nevals)}. The global mesh is 2 devices in every configuration."""
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    dev_per_proc = 2 // nproc
    outs = _launch_workers([
        [coord, nproc, pid, "ssl", root, steps_per_call, dev_per_proc]
        for pid in range(nproc)
    ])
    results = {}
    for out in outs:
        m = re.search(
            r"RESULT pid=(\d) fp=([\d.]+) miou=([\d.nan]+) nevals=(\d+)", out
        )
        assert m, out
        results[int(m.group(1))] = (
            float(m.group(2)), float(m.group(3)), int(m.group(4))
        )
    assert set(results) == set(range(nproc))
    return results


@pytest.fixture(scope="module")
def ssl_data(tmp_path_factory):
    from uemda_tpu.datasets.meta import IsprsDA
    from uemda_tpu.datasets.synthetic import make_synthetic_dataset

    root = str(tmp_path_factory.mktemp("mh_ssl"))
    make_synthetic_dataset(f"{root}/src", IsprsDA, n_train=4, n_val=2,
                           hw=64, seed=0)
    make_synthetic_dataset(f"{root}/tgt", IsprsDA, n_train=4, n_val=2,
                           hw=64, seed=1, domain_shift=10.0)
    return root


@pytest.fixture(scope="module")
def ssl_ref(ssl_data):
    """Single-process reference: 1 process x 2 local devices, K=1."""
    return _run_ssl_config(ssl_data, 1, 1)[0]


def test_multihost_real_ssl_step_matches_single_process(ssl_data, ssl_ref):
    """VERDICT r2 item 4: 2 processes run the ACTUAL production trainer path
    (make_ssl_step + run_training_loop + pseudo-gen barrier + process-0-only
    eval/snapshot) over the same 2-device global mesh and land on the same
    trained parameters as the single-process run."""
    res = _run_ssl_config(ssl_data, 2, 1)
    # replicated state identical across the two processes — exact
    assert res[0][0] == res[1][0], res
    # process 0 ran both evals; process 1 none (process-0-only hook)
    assert res[0][2] == 2 and res[1][2] == 0, res
    # vs the single-process run: same global math, different XLA
    # compilation — rounding-chaos-level agreement after 6 SGD steps. The
    # parity signal is the PARAMS fingerprint; mIoU of a 6-step random-init
    # model is argmax-chaotic (1e-4-relative param drift flips enough
    # boundary pixels on a 2-image val set to move it by ~0.05), so it only
    # gets a sanity bound.
    ref_fp, ref_miou, ref_nevals = ssl_ref
    assert ref_nevals == 2
    np.testing.assert_allclose(res[0][0], ref_fp, rtol=1e-4)
    assert 0.0 <= res[0][1] <= 1.0 and 0.0 <= ref_miou <= 1.0


def test_multihost_steps_per_call_matches_single_process(ssl_data, ssl_ref):
    """VERDICT r2 item 3: --steps-per-call under --multihost (host-side
    chunk stacking before global-array assembly, no silent K=1 fallback)
    consumes the same batch/key sequence and matches the single-process
    K=1 run."""
    res = _run_ssl_config(ssl_data, 2, 2)
    assert res[0][0] == res[1][0], res
    ref_fp, ref_miou, _ = ssl_ref
    np.testing.assert_allclose(res[0][0], ref_fp, rtol=1e-4)
    assert 0.0 <= res[0][1] <= 1.0  # see note above: mIoU is argmax-chaotic


def test_local_batch_slice_partitions_the_global_batch(monkeypatch):
    import jax

    from uemda_tpu.parallel import multihost

    rows = []
    for pid in range(4):
        monkeypatch.setattr(jax, "process_count", lambda: 4)
        monkeypatch.setattr(jax, "process_index", lambda p=pid: p)
        start, size = multihost.local_batch_slice(8)
        rows.extend(range(start, start + size))
    assert rows == list(range(8))
    with pytest.raises(AssertionError):
        multihost.local_batch_slice(9)


def test_infinite_batches_process_shard_concatenates_to_global(tmp_path):
    from uemda_tpu.datasets.base import SegDataset, infinite_batches
    from uemda_tpu.datasets.meta import IsprsDA
    from uemda_tpu.datasets.synthetic import make_synthetic_dataset

    img_dir, ann_dir = make_synthetic_dataset(
        str(tmp_path), IsprsDA, n_train=6, n_val=2, hw=32, seed=0
    )
    ds = SegDataset(IsprsDA, [img_dir], ann_dir)
    full = infinite_batches(ds, 4, seed=5)
    half0 = infinite_batches(ds, 4, seed=5, process_shard=(0, 2))
    half1 = infinite_batches(ds, 4, seed=5, process_shard=(2, 2))
    for _ in range(4):
        g = next(full)
        a, b = next(half0), next(half1)
        np.testing.assert_array_equal(
            g["image"], np.concatenate([a["image"], b["image"]])
        )
        np.testing.assert_array_equal(
            g["label"], np.concatenate([a["label"], b["label"]])
        )
