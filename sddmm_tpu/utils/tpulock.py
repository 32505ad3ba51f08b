"""Cooperative single-chip TPU lock.

The axon tunnel serializes one real chip; concurrent measurement work
inflates timings ~50% (docs/performance.md, CLAUDE.md rule 1).  The
risk is structural: the breadth-suite sweep runs for hours detached,
and the driver may start the headline ``bench.py`` at any moment.

Protocol — one JSON lockfile recording the holder:

* Low-priority, crash-safe work (the ``run_baselines.py --measure``
  sweep, which is ``--resume``-able) acquires with ``preemptible=True``
  and records its process group (it is launched via ``setsid`` so the
  group is exactly the sweep pipeline and nothing else).
* ``bench.py`` calls :func:`preempt_preemptible` before measuring: a
  live preemptible holder is terminated by its EXACT recorded pgid
  (SIGTERM, then SIGKILL after a grace period) — never by pattern —
  and the eviction is reported so the bench JSON can carry it.
* Non-preemptible holders (another bench) are waited out by
  :func:`wait_free` with a bounded poll.
* A lockfile whose pid is dead is stale and ignored/removed.

No counterpart in the reference (single-process CUDA benches own the
GPU); this is tunnel-sharing hygiene the TPU setup needs.
"""

from __future__ import annotations

import atexit
import json
import os
import signal
import sys
import time
from pathlib import Path

LOCK = Path(os.environ.get("SDDMM_TPU_LOCK", "/tmp/sddmm_tpu_tpu.lock"))


def _alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True
    return True


def holder() -> dict | None:
    """The live lock holder, or None (stale files are removed)."""
    try:
        info = json.loads(LOCK.read_text())
    except (OSError, json.JSONDecodeError):
        return None
    pid = int(info.get("pid", -1))
    if pid <= 1 or not _alive(pid):
        try:
            LOCK.unlink()
        except OSError:
            pass
        return None
    return info


def acquire(tag: str, preemptible: bool = False) -> None:
    """Record this process as the holder; released at exit.

    Best-effort advisory locking — the writers are a handful of known
    scripts, not arbitrary racers, so last-writer-wins is acceptable
    and never deadlocks.
    """
    LOCK.write_text(json.dumps({
        "pid": os.getpid(), "pgid": os.getpgrp(), "tag": tag,
        "preemptible": bool(preemptible), "ts": time.time()}))
    atexit.register(release)


def release() -> None:
    try:
        info = json.loads(LOCK.read_text())
        if int(info.get("pid", -1)) == os.getpid():
            LOCK.unlink()
    except (OSError, json.JSONDecodeError):
        pass


def _pgid_of(pid: int) -> int:
    try:
        return os.getpgid(pid)
    except (ProcessLookupError, PermissionError):
        return -1


def _ancestor_pids() -> set[int]:
    """PIDs of every ancestor of this process (via /proc ppid chain)."""
    pids: set[int] = set()
    pid = os.getpid()
    for _ in range(128):
        try:
            with open(f"/proc/{pid}/stat") as f:
                ppid = int(f.read().rsplit(")", 1)[1].split()[1])
        except (OSError, IndexError, ValueError):
            break
        if ppid <= 1:
            break
        pids.add(ppid)
        pid = ppid
    return pids


def preempt_preemptible(log=print, grace_s: float = 20.0) -> list[str]:
    """Evict a live preemptible holder by its exact recorded pgid.

    Returns human-readable notes (empty if nothing was evicted).  Only
    the recorded group is signalled, and only when it is not our own —
    the holder opted in by declaring itself preemptible + crash-safe.
    """
    notes: list[str] = []
    info = holder()
    if info is None or not info.get("preemptible"):
        return notes
    pid, pgid = int(info["pid"]), int(info.get("pgid", -1))
    tag = info.get("tag", "?")
    if pgid <= 1 or pgid == os.getpgrp():
        return notes
    # Never evict our own ancestry: a bench launched from inside a
    # lock-holding queue wrapper may sit in a DIFFERENT process group
    # (GNU `timeout` setpgid's its child), but killing the recorded
    # group would take down our own parent tree (observed: the r3b
    # queue self-evicting via its own bench run).
    anc = _ancestor_pids()
    if pid in anc or any(_pgid_of(a) == pgid for a in anc):
        return notes
    log(f"tpulock: preempting '{tag}' (pid={pid} pgid={pgid})")
    try:
        os.killpg(pgid, signal.SIGTERM)
    except (ProcessLookupError, PermissionError) as e:
        notes.append(f"tpulock: preempt of '{tag}' failed: {e}")
        return notes
    deadline = time.time() + grace_s
    while time.time() < deadline and _alive(pid):
        time.sleep(0.5)
    if _alive(pid):
        try:
            os.killpg(pgid, signal.SIGKILL)
        except (ProcessLookupError, PermissionError):
            pass
        time.sleep(1.0)
    notes.append(f"preempted background '{tag}' (pid={pid}) for "
                 "exclusive chip access; it resumes via --resume")
    try:
        LOCK.unlink()
    except OSError:
        pass
    return notes


def wait_free(max_wait_s: float = 900.0, poll_s: float = 10.0,
              log=print) -> bool:
    """Block while any live holder exists; True if the chip came free."""
    deadline = time.time() + max_wait_s
    warned = False
    while time.time() < deadline:
        info = holder()
        if info is None:
            return True
        # a holder in our own process group is us (e.g. bench.py run
        # from inside a lock-holding queue wrapper) — not contention
        if int(info.get("pgid", -1)) == os.getpgrp():
            return True
        if not warned:
            log(f"tpulock: waiting for '{info.get('tag')}' "
                f"(pid={info.get('pid')})")
            warned = True
        time.sleep(poll_s)
    return holder() is None


def main(argv=None) -> int:
    args = list(sys.argv[1:] if argv is None else argv)
    cmd = args[0] if args else "status"
    if cmd == "status":
        print(json.dumps(holder()))
        return 0
    if cmd == "wait":
        max_s = float(args[1]) if len(args) > 1 else 900.0
        return 0 if wait_free(max_s) else 1
    print(f"usage: {__name__} [status|wait [max_s]]", file=sys.stderr)
    return 2


if __name__ == "__main__":
    raise SystemExit(main())
