"""Liveness guard for long device-bound runs on flaky remote backends.

The reference's failure posture is cooperative (SIGTERM handler +
queue-time guard, timer.f90:105-127 / main.f90:229-239): it assumes
the machine underneath keeps working.  The remote-TPU platform this
framework runs on does not offer that guarantee: a multi-hour process
can park forever inside a device call while the chip stays healthy
(the "axon wedge").  Measured signatures (round-4 N=8064 production,
DESIGN.md §6):

* a wedged process sits at ~0 host CPU but may still trickle
  keepalive bytes on the tunnel socket — socket I/O counters are NOT
  a liveness signal;
* ``jax.devices()`` from a fresh process keeps succeeding while real
  work wedges — a claim probe is NOT a health probe;
* what IS reliable: a healthy steady-state run flushes a therm row /
  checkpoint every cycle block, and a healthy XLA compile burns host
  CPU.

So the guard watches exactly those two signals: output-file mtimes in
the run directory plus the process's own CPU clock.  If neither moves
for ``window_s``, the process exits with a distinctive code so a
supervisor (scripts/watchdog.py) can relaunch it within minutes — the
app auto-resumes from the newest dual-slot checkpoint
(io/checkpoint.py; mc_checkpoint_write, mc_moves.F90:324-501).
"""

from __future__ import annotations

import os
import subprocess
import sys
import threading
import time

#: files whose mtime counts as run progress (therm series flush every
#: cycle block; mc.log on monitor/flatness events; checkpoints on the
#: dump interval).  Each entry is (match_kind, pattern) and
#: newest_output_mtime is driven from this table, so the rules cannot
#: drift from the constant.
_OUTPUT_MARKERS = (
    ("suffix", "_therm.dat"),
    ("exact", "mc.log"),
    ("exact", "heartbeat"),
    ("prefix", "checkpoint"),
)


def _is_output(name):
    for kind, pat in _OUTPUT_MARKERS:
        if kind == "suffix" and name.endswith(pat):
            return True
        if kind == "exact" and name == pat:
            return True
        if kind == "prefix" and name.startswith(pat):
            return True
    return False


def newest_output_mtime(dirpath="."):
    """Newest mtime of any run-output file in ``dirpath`` (0.0 if
    none exist yet)."""
    t = 0.0
    try:
        names = os.listdir(dirpath)
    except OSError:
        return t
    for f in names:
        if _is_output(f):
            try:
                t = max(t, os.path.getmtime(os.path.join(dirpath, f)))
            except OSError:
                pass
    return t


def steady_output_mtime(dirpath="."):
    """Newest mtime of a STEADY-STATE output (therm rows /
    checkpoints) — files that only advance once the cycle loop is
    actually running.  mc.log is excluded on purpose: init writes
    banner lines to it minutes before the first (possibly very long)
    cold compile, and the startup->steady transition must not be
    triggered by those (measured round 5: three launches in a row
    wedge-exited mid-compile because an early mc.log line had
    tightened the window)."""
    t = 0.0
    try:
        names = os.listdir(dirpath)
    except OSError:
        return t
    for f in names:
        if f.endswith("_therm.dat") or f.startswith("checkpoint") \
                or f == "heartbeat":
            try:
                path = os.path.join(dirpath, f)
                if os.path.getsize(path) > 0:
                    t = max(t, os.path.getmtime(path))
            except OSError:
                pass
    return t


class WedgeMonitor:
    """Pure decision core of the guard (testable without threads).

    Feed it (wall time, process CPU time, newest output mtime)
    samples; ``tick`` returns the current stall age in seconds — 0.0
    while the run shows progress, and the caller should treat
    ``tick(...) > window_s`` as wedged.  Progress = a NEW output-file
    mtime (strictly newer than the last seen) or a per-tick CPU RATE
    above ``cpu_rate`` (a compile in flight).  The rate is judged on
    the CPU burned since the PREVIOUS tick, not cumulative since the
    last progress point: ``time.process_time`` sums all threads, so a
    wedged process whose tunnel keepalive threads trickle ~1% CPU
    forever must still read as stalled (it would eventually clear any
    cumulative threshold).

    ``startup_window_s`` applies until the first STEADY-STATE output
    (a therm row / checkpoint — ``steady`` argument of ``tick``) is
    ever observed: a cold large-N start can wait tens of minutes
    inside a remote XLA compile at near-zero host CPU — healthy, but
    indistinguishable from a wedge by the steady-state signals — and
    the early mc.log banner lines must NOT end the startup phase
    (measured round 5: three launches wedge-exited mid-compile
    because an mc.log init line had tightened the window).  Once the
    cycle loop has produced steady output even once, the tight
    window takes over.
    """

    def __init__(self, now, cpu, mtime, window_s=360.0,
                 cpu_rate=0.05, startup_window_s=2400.0,
                 steady=0.0):
        self.window_s = float(window_s)
        self.startup_window_s = float(startup_window_s)
        self.cpu_rate = float(cpu_rate)
        self._cpu = cpu
        self._now = now
        self._mtime = mtime
        self._steady = steady
        self._progress_at = now
        self._steady_seen = False

    def tick(self, now, cpu, mtime, steady=None):
        dt = now - self._now
        dcpu = cpu - self._cpu
        self._now = now
        self._cpu = cpu
        if steady is not None and steady > self._steady:
            self._steady = steady
            self._steady_seen = True
        busy = dt > 0.0 and (dcpu / dt) > self.cpu_rate
        if mtime > self._mtime or busy:
            self._mtime = mtime
            self._progress_at = now
            return 0.0
        return now - self._progress_at

    @property
    def wedged_after(self):
        if not self._steady_seen:
            return max(self.window_s, self.startup_window_s)
        return self.window_s


def install_wedge_guard(dirpath=".", window_s=360.0, poll_s=20.0,
                        exit_code=3, _exit=os._exit,
                        startup_window_s=2400.0):
    """Start the guard as a daemon thread; returns the thread.

    On detection it prints one line and calls ``_exit(exit_code)`` —
    a hard exit on purpose: the wedged thread is parked inside a
    device call that will never return, so cooperative shutdown is
    not available.  exit code 3 is what scripts/watchdog.py treats as
    "relaunch and auto-resume".
    """

    def run():
        mon = WedgeMonitor(time.time(), time.process_time(),
                           newest_output_mtime(dirpath),
                           window_s=window_s,
                           startup_window_s=startup_window_s,
                           steady=steady_output_mtime(dirpath))
        while True:
            time.sleep(poll_s)
            age = mon.tick(time.time(), time.process_time(),
                           newest_output_mtime(dirpath),
                           steady=steady_output_mtime(dirpath))
            if age > mon.wedged_after:
                print(f"wedge guard: no output progress and CPU rate "
                      f"<{mon.cpu_rate:.0%} for {age:.0f}s; "
                      "exiting for watchdog restart", flush=True)
                _exit(exit_code)

    t = threading.Thread(target=run, daemon=True,
                         name="wedge-guard")
    t.start()
    return t


# ---------------------------------------------------------------------------
# Degraded-backend probe + relaunch backoff (round-5; DESIGN.md §6).
#
# The backend has THREE failure states, and only one of them is cured
# by a relaunch:
#   * wedged client  — this process parked in a device call; relaunch
#     helps (the wedge guard above exits 3 for exactly this);
#   * crashed worker — the child died; relaunch helps;
#   * degraded backend — every process sees trivial ops take ~50 s
#     (measured round-4: jnp.ones((8,128)).sum() in 48 s); relaunching
#     does NOT help — each relaunch re-pays minutes of init just to
#     wedge again, burning the restart budget (12 fruitless relaunches
#     in the round-4 production log).  Only waiting helps.
# So before a relaunch the supervisor runs a cheap timed probe in a
# throwaway subprocess and, while the probe lands in the degraded
# band, sleeps with exponential backoff instead of relaunching.
# ---------------------------------------------------------------------------

#: the probe op must complete within this after imports on a healthy
#: backend (measured: <2 s incl. first-op dispatch; degraded: ~50 s)
PROBE_DEGRADED_S = 15.0

_PROBE_SRC = r"""
import time
import jax, jax.numpy as jnp
jax.devices()
t0 = time.time()
jnp.ones((8, 128)).sum().block_until_ready()
print("PROBE_OP_S %.3f" % (time.time() - t0), flush=True)
"""


def probe_device(timeout_s=240.0, _run=None):
    """Time one trivial device op in a throwaway subprocess.

    Returns ``(status, op_seconds)`` with status in {"ok", "degraded",
    "fail"}.  "fail" covers claim failure and probe timeout — both
    also count as not-relaunch-worthy for the backoff policy, since a
    backend that cannot even claim needs waiting, not a relaunch.
    ``_run`` is injectable for tests.
    """
    if _run is None:
        # LIVENESS_PROBE_CMD lets supervision tests substitute a fake
        # backend without a device claim in every relaunch
        override = os.environ.get("LIVENESS_PROBE_CMD")
        cmd = (["sh", "-c", override] if override
               else [sys.executable, "-c", _PROBE_SRC])

        def _run(timeout):
            return subprocess.run(
                cmd, capture_output=True, text=True, timeout=timeout,
            )
    try:
        res = _run(timeout_s)
    except subprocess.TimeoutExpired:
        return "fail", float(timeout_s)
    for line in (res.stdout or "").splitlines():
        if line.startswith("PROBE_OP_S"):
            op_s = float(line.split()[1])
            if op_s > PROBE_DEGRADED_S:
                return "degraded", op_s
            return "ok", op_s
    return "fail", 0.0


class BackoffPolicy:
    """Pure decision core for the relaunch-vs-wait loop (testable).

    ``decide(status)`` consumes one probe outcome and returns the
    seconds to wait before the next probe — 0.0 means "relaunch now".
    Degraded/fail outcomes wait with exponential backoff (base
    ``start_s``, doubling to ``cap_s``); an ok outcome resets the
    backoff and releases the relaunch.
    """

    def __init__(self, start_s=60.0, factor=2.0, cap_s=900.0):
        self.start_s = float(start_s)
        self.factor = float(factor)
        self.cap_s = float(cap_s)
        self._next = self.start_s

    def decide(self, status):
        if status == "ok":
            self._next = self.start_s
            return 0.0
        wait = self._next
        self._next = min(self._next * self.factor, self.cap_s)
        return wait
