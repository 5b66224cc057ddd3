"""Watchdog supervisor behaviour (scripts/watchdog.py).

Simulates the remote-TPU hang it exists for: a run that stops
updating its watch file but keeps the process alive must be killed
and relaunched; a run that exits cleanly must end supervision.
"""

import os
import pathlib
import shutil
import subprocess
import sys
import textwrap

import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]
WATCHDOG = REPO / "scripts" / "watchdog.py"


@pytest.fixture()
def workdir(request):
    """Scratch dir under the repo: in this image's sandbox, /tmp is
    per-process, so a pytest workdir would not be shared between the
    watchdog and the job subprocesses it supervises."""
    d = REPO / "tests" / f".wd_{request.node.name[:40]}"
    shutil.rmtree(d, ignore_errors=True)
    d.mkdir(parents=True)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _run(workdir, cmd, probe=False, env=None, **kw):
    args = [
        sys.executable, str(WATCHDOG),
        "--workdir", str(workdir),
        "--cmd", cmd,
        "--watch", "out.log",
        "--poll", "1",
        "--kill-grace", "5",
    ]
    if not probe:
        args.append("--no-probe")
    for k, v in kw.items():
        args += [f"--{k.replace('_', '-')}", str(v)]
    run_env = dict(os.environ, **(env or {}))
    return subprocess.run(
        args, capture_output=True, text=True, timeout=120,
        env=run_env,
    )


def test_clean_exit_ends_supervision(workdir):
    cmd = (
        f"{sys.executable} -c \"open('out.log','w').write('done')\""
    )
    res = _run(workdir, cmd, stale=5, grace=2, budget=600,
               max_restarts=2)
    assert res.returncode == 0
    assert "exited cleanly" in (workdir / "watchdog.log").read_text()


def test_hang_is_killed_and_relaunched(workdir):
    # first launch hangs after one heartbeat; relaunches find the
    # marker file and exit cleanly.  Writes are fsynced and the stale
    # threshold is generous: this image's sandbox commits a killed
    # process's un-synced writes only after a ~15s flush interval.
    script = workdir / "job.py"
    script.write_text(textwrap.dedent("""
        import os, sys, time
        def put(name, txt):
            f = open(name, "w"); f.write(txt)
            f.flush(); os.fsync(f.fileno()); f.close()
        put("out.log", "beat")
        if os.path.exists("ran_once"):
            sys.exit(0)                      # clean on relaunch
        put("ran_once", "x")
        time.sleep(3600)                     # simulated device hang
    """))
    res = _run(workdir, f"{sys.executable} {script}",
               stale=12, grace=5, budget=600, max_restarts=3)
    log = (workdir / "watchdog.log").read_text()
    assert "killing process group" in log
    assert "restarting" in log
    assert "exited cleanly" in log
    assert res.returncode == 0
    # each launch got the remaining budget via WL_QTIME
    assert os.path.exists(workdir / "run_00.log")
    assert os.path.exists(workdir / "run_01.log")


def test_degraded_backend_waits_instead_of_relaunching(workdir):
    # Round-4 production failure: 12 relaunches in one degraded-
    # backend hour, each burning a restart slot on a backend where
    # "only waiting helps" (DESIGN.md §6).  The probe gate must log a
    # wait on a degraded probe and only relaunch once a probe lands
    # in the ok band.  The fake probe is degraded on its first call
    # (no marker yet) and ok afterwards.
    script = workdir / "job.py"
    script.write_text(textwrap.dedent("""
        import os, sys
        def put(name, txt):
            f = open(name, "w"); f.write(txt)
            f.flush(); os.fsync(f.fileno()); f.close()
        put("out.log", "beat")
        if os.path.exists("ran_once"):
            sys.exit(0)                      # clean on relaunch
        put("ran_once", "x")
        sys.exit(7)                          # crash -> probe gate
    """))
    fake_probe = (
        "if [ -e probe_once ]; then echo PROBE_OP_S 0.1; "
        "else touch probe_once; echo PROBE_OP_S 99.0; fi"
    )
    res = _run(workdir, f"{sys.executable} {script}", probe=True,
               stale=60, grace=5, budget=600, max_restarts=3,
               probe_backoff=1,
               env={"LIVENESS_PROBE_CMD": fake_probe})
    assert res.returncode == 0
    log = (workdir / "watchdog.log").read_text()
    assert "backend probe degraded (op 99.0s): waited" in log
    assert "backend probe ok (op 0.1s); relaunching" in log
    assert "exited cleanly" in log


def test_budget_exhaustion_stops(workdir):
    script = workdir / "job.py"
    script.write_text(
        "import time\nopen('out.log','w').write('b')\n"
        "time.sleep(3600)\n"
    )
    res = _run(workdir, f"{sys.executable} {script}",
               stale=3600, grace=3600, budget=8, max_restarts=1)
    assert res.returncode == 0
    log = (workdir / "watchdog.log").read_text()
    assert "budget" in log


def test_budget_stop_kills_sigterm_immune_grandchild(workdir):
    # Measured round-4 failure: the shell wrapper died on the group
    # SIGTERM so proc.wait() returned, but the grandchild was parked
    # in a native device call (its SIGTERM handler could never run)
    # and outlived the supervisor.  The kill path must escalate to
    # SIGKILL on the whole group even when the direct child exits.
    wrapper = workdir / "wrapper.py"
    wrapper.write_text(textwrap.dedent(f"""
        import os, subprocess, sys, time
        def put(name, txt):
            f = open(name, "w"); f.write(txt)
            f.flush(); os.fsync(f.fileno()); f.close()
        if os.path.exists("ran_once"):
            sys.exit(0)                  # clean on relaunch
        g = subprocess.Popen([
            {sys.executable!r}, "-c",
            "import signal,time;"
            "signal.signal(signal.SIGTERM, signal.SIG_IGN);"
            "time.sleep(3600)",
        ])
        put("grandchild.pid", str(g.pid))
        put("ran_once", "x")
        put("out.log", "beat")
        time.sleep(3600)                 # goes stale; wrapper dies
                                         # on the group SIGTERM, the
                                         # grandchild ignores it
    """))
    res = _run(workdir, f"{sys.executable} {wrapper}",
               stale=12, grace=5, budget=600, max_restarts=3)
    assert res.returncode == 0
    log = (workdir / "watchdog.log").read_text()
    assert "killing process group" in log
    pid = int((workdir / "grandchild.pid").read_text())
    deadline = __import__("time").time() + 30
    alive = True
    while __import__("time").time() < deadline:
        try:
            os.kill(pid, 0)
        except ProcessLookupError:
            alive = False
            break
        __import__("time").sleep(0.5)
    assert not alive, "SIGTERM-immune grandchild survived budget stop"
