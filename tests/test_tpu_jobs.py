"""TPU job registry: PID files + bench-side reaper (utils/tpu_jobs.py)."""

import os
import subprocess
import sys
import time

import pytest

from tss_dprnn_tpu.utils import tpu_jobs


@pytest.fixture
def registry(tmp_path, monkeypatch):
    monkeypatch.setattr(tpu_jobs, "REGISTRY_DIR", str(tmp_path / "jobs"))
    return str(tmp_path / "jobs")


def test_register_creates_and_removes_pidfile(registry):
    with tpu_jobs.register_tpu_job("unit") as path:
        assert os.path.exists(path)
        assert int(open(path).read()) == os.getpid()
    assert not os.path.exists(path)


def test_reap_kills_live_registered_job(registry):
    child = subprocess.Popen([sys.executable, "-c", "import time; time.sleep(300)"])
    os.makedirs(registry, exist_ok=True)
    pidfile = os.path.join(registry, f"sweep.{child.pid}.pid")
    with open(pidfile, "w") as f:
        f.write(str(child.pid))
    try:
        killed = tpu_jobs.reap_tpu_jobs(grace_s=5.0, log=lambda m: None)
        assert killed == [child.pid]
        assert child.wait(timeout=10) != 0  # terminated by signal
        assert not os.path.exists(pidfile)
    finally:
        if child.poll() is None:
            child.kill()


def test_reap_cleans_stale_and_garbage_files(registry):
    os.makedirs(registry, exist_ok=True)
    # a PID that is certainly dead: spawn + wait a trivial child
    child = subprocess.Popen([sys.executable, "-c", "pass"])
    child.wait()
    with open(os.path.join(registry, f"dead.{child.pid}.pid"), "w") as f:
        f.write(str(child.pid))
    with open(os.path.join(registry, "garbage.pid"), "w") as f:
        f.write("not-a-pid")
    assert tpu_jobs.reap_tpu_jobs(log=lambda m: None) == []
    assert os.listdir(registry) == []


def test_reap_never_kills_self(registry):
    with tpu_jobs.register_tpu_job("self"):
        assert tpu_jobs.reap_tpu_jobs(log=lambda m: None) == []
    # and the context manager still cleaned up after itself
    assert os.listdir(registry) == []


def test_reap_opt_out(registry, monkeypatch):
    monkeypatch.setenv("TSS_BENCH_NO_REAP", "1")
    child = subprocess.Popen([sys.executable, "-c", "import time; time.sleep(60)"])
    os.makedirs(registry, exist_ok=True)
    with open(os.path.join(registry, f"keep.{child.pid}.pid"), "w") as f:
        f.write(str(child.pid))
    try:
        assert tpu_jobs.reap_tpu_jobs(log=lambda m: None) == []
        assert child.poll() is None  # untouched
    finally:
        child.kill()
        child.wait()
