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
import threading
import time

#: files whose mtime counts as run progress (therm series flush every
#: cycle block; mc.log on monitor/flatness events; checkpoints on the
#: dump interval)
_OUTPUT_MARKERS = ("_therm.dat", "mc.log", "checkpoint")


def newest_output_mtime(dirpath="."):
    """Newest mtime of any run-output file in ``dirpath`` (0.0 if
    none exist yet)."""
    t = 0.0
    try:
        names = os.listdir(dirpath)
    except OSError:
        return t
    for f in names:
        if f.endswith("_therm.dat") or f == "mc.log" or \
                f.startswith("checkpoint"):
            try:
                t = max(t, os.path.getmtime(os.path.join(dirpath, f)))
            except OSError:
                pass
    return t


class WedgeMonitor:
    """Pure decision core of the guard (testable without threads).

    Feed it (wall time, process CPU time, newest output mtime)
    samples; ``tick`` returns the current stall age in seconds — 0.0
    while the run shows progress, and the caller should treat
    ``tick(...) > window_s`` as wedged.  Progress = a NEW output-file
    mtime (strictly newer than the last seen) or more than
    ``cpu_eps_s`` of CPU burned since the last progress point (a
    compile in flight).
    """

    def __init__(self, now, cpu, mtime, window_s=360.0, cpu_eps_s=5.0):
        self.window_s = float(window_s)
        self.cpu_eps_s = float(cpu_eps_s)
        self._cpu = cpu
        self._mtime = mtime
        self._progress_at = now

    def tick(self, now, cpu, mtime):
        if mtime > self._mtime or cpu - self._cpu > self.cpu_eps_s:
            self._mtime = mtime
            self._cpu = cpu
            self._progress_at = now
            return 0.0
        return now - self._progress_at

    @property
    def wedged_after(self):
        return self.window_s


def install_wedge_guard(dirpath=".", window_s=360.0, poll_s=20.0,
                        exit_code=3, _exit=os._exit):
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
                           window_s=window_s)
        while True:
            time.sleep(poll_s)
            age = mon.tick(time.time(), time.process_time(),
                           newest_output_mtime(dirpath))
            if age > mon.wedged_after:
                print(f"wedge guard: no output progress and "
                      f"<{mon.cpu_eps_s:.0f}s CPU for {age:.0f}s; "
                      "exiting for watchdog restart", flush=True)
                _exit(exit_code)

    t = threading.Thread(target=run, daemon=True,
                         name="wedge-guard")
    t.start()
    return t
