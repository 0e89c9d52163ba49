"""Single-chip TPU job registry: PID files + a bench-side reaper.

The box has ONE TPU chip; two processes using it concurrently silently
halve (or worse) each other's throughput, which corrupts benchmark numbers
and slows training sweeps. The reference never needed this (one GPU, one
interactive user), but this framework runs long unattended sweeps
(scripts/perf/convergence_demo.py) that can still be alive when a benchmark
starts.

Convention:
- Long-running TPU jobs call :func:`register_tpu_job` (a context manager)
  which drops ``/tmp/tss_tpu_jobs/<name>.pid`` containing the job's PID and
  removes it on exit.
- Benchmarks call :func:`reap_tpu_jobs` at startup: every *live* registered
  PID is terminated (SIGTERM, then SIGKILL after a grace period) and every
  stale file is cleaned up. Reaping is by recorded PID only — never by
  process-name pattern, which could match unrelated processes.

Opt-outs: set ``TSS_BENCH_NO_REAP=1`` to make :func:`reap_tpu_jobs` a no-op
(e.g. when intentionally measuring contention).
"""

from __future__ import annotations

import contextlib
import errno
import os
import signal
import time

REGISTRY_DIR = "/tmp/tss_tpu_jobs"


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except OSError as e:
        return e.errno == errno.EPERM  # exists but not ours
    return True


@contextlib.contextmanager
def register_tpu_job(name: str):
    """Register the current process as the named TPU job for its lifetime."""
    os.makedirs(REGISTRY_DIR, exist_ok=True)
    path = os.path.join(REGISTRY_DIR, f"{name}.{os.getpid()}.pid")
    with open(path, "w") as f:
        f.write(str(os.getpid()))
    try:
        yield path
    finally:
        try:
            os.remove(path)
        except OSError:
            pass


def reap_tpu_jobs(grace_s: float = 15.0, log=print) -> list:
    """Terminate every live registered TPU job; clean stale PID files.

    Returns the list of PIDs that were terminated. Called by bench.py /
    bench_all.py before touching the chip so a leftover training sweep can
    never share the chip with a measurement.
    """
    if os.environ.get("TSS_BENCH_NO_REAP") == "1":
        return []
    if not os.path.isdir(REGISTRY_DIR):
        return []
    killed = []
    me = os.getpid()
    for fn in sorted(os.listdir(REGISTRY_DIR)):
        if not fn.endswith(".pid"):
            continue
        path = os.path.join(REGISTRY_DIR, fn)
        try:
            pid = int(open(path).read().strip())
        except (OSError, ValueError):
            with contextlib.suppress(OSError):
                os.remove(path)
            continue
        if pid == me or not _pid_alive(pid):
            with contextlib.suppress(OSError):
                os.remove(path)
            continue
        log(f"# reaping registered TPU job {fn} (pid {pid}) before benchmarking")
        # "unkillable" must key on EPERM from the kill itself: a reaped-but-
        # unwaited child is a zombie for which kill(pid, 0) still succeeds,
        # so post-kill aliveness cannot distinguish dead from other-uid
        unkillable = False
        try:
            os.kill(pid, signal.SIGTERM)
        except PermissionError:
            unkillable = True
        except OSError:
            pass  # already gone
        if not unkillable:
            deadline = time.monotonic() + grace_s
            while time.monotonic() < deadline and _pid_alive(pid):
                time.sleep(0.5)
            if _pid_alive(pid):
                try:
                    os.kill(pid, signal.SIGKILL)
                except PermissionError:
                    unkillable = True
                except OSError:
                    pass
        if unkillable:
            # keep the registry file so a later reap can retry, and tell the
            # caller the chip is NOT free
            log(f"# WARNING: could not kill TPU job {fn} (pid {pid}) — "
                "it may still share the chip with this measurement")
            continue
        killed.append(pid)
        with contextlib.suppress(OSError):
            os.remove(path)
    return killed
