"""Checkpoint-write race safety + run-dir locking (r4 incident hardening).

Two concurrent trainers on one run dir (an orphaned nohup'd driver chain
vs its restart) raced ``save_checkpoint``'s shared ``path + '.tmp'``: one
writer's os.replace moved the tmp away and the other died with
FileNotFoundError mid-training. Fixes under test: unique-per-writer tmp
names (concurrent same-path saves are atomic, last-writer-wins) and a
pid lockfile that makes the second trainer fail fast instead.
"""

import logging
import os
import subprocess
import threading

import numpy as np
import pytest

from uemda_tpu.train.checkpoints import (
    RunDirLock,
    load_checkpoint,
    save_checkpoint,
)
from uemda_tpu.train.loop import LoopHooks, run_training_loop


def test_save_checkpoint_concurrent_same_path(tmp_path):
    """8 threads hammering ONE path: no FileNotFoundError, no partial file —
    the survivor is exactly one writer's complete payload."""
    path = str(tmp_path / "ckpt.msgpack")
    payloads = [np.full((64,), t, np.float32) for t in range(8)]
    errs = []

    def writer(t):
        try:
            for _ in range(20):
                save_checkpoint(path, payloads[t])
        except BaseException as e:  # noqa: BLE001 - collected for assert
            errs.append(e)

    threads = [threading.Thread(target=writer, args=(t,)) for t in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, errs
    got = load_checkpoint(path, np.zeros((64,), np.float32))
    assert any(np.array_equal(got, p) for p in payloads)
    assert not [f for f in os.listdir(tmp_path) if ".tmp" in f]


def test_run_lock_blocks_second_acquire(tmp_path):
    lock = RunDirLock(str(tmp_path)).acquire()
    with pytest.raises(RuntimeError, match="locked by live pid"):
        RunDirLock(str(tmp_path)).acquire()
    lock.release()
    # released: reacquire succeeds (and the context-manager form works)
    with RunDirLock(str(tmp_path)):
        assert os.path.exists(tmp_path / ".run_lock")
    assert not os.path.exists(tmp_path / ".run_lock")


def test_run_lock_steals_stale_lock(tmp_path):
    """A lock whose holder pid is dead must be stolen: crashed or
    timeout-killed runs resume via --resume auto without manual cleanup."""
    proc = subprocess.Popen(["true"])  # a pid guaranteed dead once reaped
    proc.wait()
    (tmp_path / ".run_lock").write_text(str(proc.pid))
    # belt and braces: only proceed when that pid is really gone
    try:
        os.kill(proc.pid, 0)
        pytest.skip("pid unexpectedly alive (reused)")
    except ProcessLookupError:
        pass
    lock = RunDirLock(str(tmp_path)).acquire()
    assert (tmp_path / ".run_lock").read_text() == str(os.getpid())
    lock.release()


def test_run_lock_steals_garbled_lock(tmp_path):
    (tmp_path / ".run_lock").write_text("not-a-pid")
    RunDirLock(str(tmp_path)).acquire().release()


def test_training_loop_refuses_locked_run_dir(tmp_path):
    """The loop itself must fail fast when another live process holds the
    run dir (wired through run_training_loop's wrapper) — BEFORE touching
    state, iterators or the device."""
    run_dir = tmp_path / "run"
    run_dir.mkdir()
    held = RunDirLock(str(run_dir)).acquire()
    hooks = LoopHooks(state_path=str(run_dir / "state_curr.msgpack"))
    with pytest.raises(RuntimeError, match="locked by live pid"):
        run_training_loop(None, None, None, None, 1,
                          logging.getLogger("t"), hooks)
    held.release()
