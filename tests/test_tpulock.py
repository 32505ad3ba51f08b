"""Cooperative TPU lock (utils/tpulock): stale detection, acquire /
release, exact-pgid preemption of a crash-safe holder, bounded wait.

Pure-host tests — no jax import, no chip. The preemption test spawns a
real setsid'd child (its own process group, like the detached breadth
suite) and verifies only that group dies.
"""

import json
import os
import subprocess
import sys
import time
from pathlib import Path

import pytest

from sddmm_tpu.utils import tpulock


@pytest.fixture
def lockfile(tmp_path, monkeypatch):
    path = tmp_path / "tpu.lock"
    monkeypatch.setattr(tpulock, "LOCK", path)
    return path


def test_no_lockfile_means_free(lockfile):
    assert tpulock.holder() is None
    assert tpulock.wait_free(max_wait_s=0.1)


def test_stale_lock_removed(lockfile):
    # a pid that existed and is gone: spawn-and-reap
    proc = subprocess.Popen([sys.executable, "-c", "pass"])
    proc.wait()
    lockfile.write_text(json.dumps(
        {"pid": proc.pid, "pgid": proc.pid, "tag": "ghost",
         "preemptible": True}))
    assert tpulock.holder() is None
    assert not lockfile.exists()


def test_acquire_holder_release(lockfile):
    tpulock.acquire("bench")
    info = tpulock.holder()
    assert info is not None
    assert info["tag"] == "bench"
    assert info["pid"] == os.getpid()
    assert not info["preemptible"]
    tpulock.release()
    assert tpulock.holder() is None


def test_release_ignores_foreign_lock(lockfile):
    lockfile.write_text(json.dumps(
        {"pid": os.getpid() + 1, "pgid": 999999, "tag": "x"}))
    tpulock.release()  # not ours: must not unlink
    assert lockfile.exists()


def test_wait_free_times_out_on_live_holder(lockfile):
    # The holder must be a live process in a FOREIGN process group —
    # wait_free deliberately treats a holder in our own group as
    # ourselves (a bench run from inside a lock-holding queue wrapper)
    # and returns immediately, which is what the old in-process version
    # of this test tripped over.
    child = subprocess.Popen(
        [sys.executable, "-c", "import time; time.sleep(30)"],
        preexec_fn=os.setsid)
    try:
        lockfile.write_text(json.dumps(
            {"pid": child.pid, "pgid": child.pid, "tag": "bench",
             "preemptible": False}))
        assert not tpulock.wait_free(max_wait_s=0.3, poll_s=0.05,
                                     log=lambda m: None)
    finally:
        child.kill()
        child.wait()


def test_wait_free_passes_own_group_holder(lockfile):
    # a holder in our own process group is us: no self-deadlock
    tpulock.acquire("bench")
    try:
        assert tpulock.wait_free(max_wait_s=0.2, poll_s=0.05,
                                 log=lambda m: None)
    finally:
        tpulock.release()


def test_preempt_ignores_non_preemptible(lockfile):
    tpulock.acquire("bench")
    try:
        assert tpulock.preempt_preemptible(log=lambda m: None) == []
        assert tpulock.holder() is not None
    finally:
        tpulock.release()


def test_preempt_never_kills_own_group(lockfile):
    lockfile.write_text(json.dumps(
        {"pid": os.getpid(), "pgid": os.getpgrp(), "tag": "self",
         "preemptible": True}))
    assert tpulock.preempt_preemptible(log=lambda m: None) == []


def test_preempt_kills_exact_setsid_group(lockfile):
    # a detached holder in its own session, like the breadth suite
    child = subprocess.Popen(
        [sys.executable, "-c",
         "import os, json, sys, time\n"
         f"p = {json.dumps(str(lockfile))}\n"
         "open(p, 'w').write(json.dumps({'pid': os.getpid(), "
         "'pgid': os.getpgrp(), 'tag': 'suite', 'preemptible': True}))\n"
         "time.sleep(60)"],
        preexec_fn=os.setsid)
    try:
        deadline = time.time() + 10
        while time.time() < deadline and not lockfile.exists():
            time.sleep(0.05)
        assert lockfile.exists(), "child never wrote the lock"
        notes = tpulock.preempt_preemptible(log=lambda m: None,
                                            grace_s=5.0)
        assert notes and "suite" in notes[0]
        assert child.wait(timeout=10) != 0  # killed, not clean exit
        assert tpulock.holder() is None
    finally:
        if child.poll() is None:
            child.kill()
            child.wait()
