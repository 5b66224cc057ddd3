"""Wedge-guard liveness monitor (mc_water_ls_mw_tpu/liveness.py).

The guard's decision core must flag exactly the measured axon-wedge
signature (DESIGN.md §6: no output-file progress AND ~0 process CPU)
and must NOT flag a healthy compile (CPU moving, no files yet) or a
healthy steady state (therm mtimes advancing, ~0 CPU).
"""

import os
import time

import pytest

from mc_water_ls_mw_tpu.liveness import (
    BackoffPolicy,
    WedgeMonitor,
    install_wedge_guard,
    newest_output_mtime,
    probe_device,
)


def test_monitor_flags_full_stall():
    mon = WedgeMonitor(now=0.0, cpu=0.0, mtime=100.0, window_s=360.0,
                       startup_window_s=360.0)
    # neither CPU nor files move: age accumulates past the window
    assert mon.tick(200.0, 0.5, 100.0) == 200.0
    age = mon.tick(400.0, 1.0, 100.0)
    assert age == 400.0 and age > mon.wedged_after


def test_monitor_startup_window_tolerates_remote_compile():
    # cold large-N start: remote compile, ~0 host CPU, no steady
    # output for many minutes — must NOT read as wedged inside the
    # startup window.  Crucially an mc.log banner line (generic
    # output progress, NOT steady) resets the stall age but must NOT
    # tighten the window (measured round 5: early mc.log lines
    # tightened the window and three launches died mid-compile).
    mon = WedgeMonitor(now=0.0, cpu=0.0, mtime=0.0, window_s=360.0,
                       startup_window_s=1200.0)
    assert mon.tick(60.0, 0.5, 61.0) == 0.0     # mc.log banner line
    assert mon.wedged_after == 1200.0           # still startup
    age = mon.tick(700.0, 1.0, 61.0)            # 10+ min compiling
    assert age == 640.0 < mon.wedged_after
    # first therm row = steady output: tight window from now on
    assert mon.tick(900.0, 1.5, 901.0, steady=901.0) == 0.0
    assert mon.wedged_after == 360.0
    assert mon.tick(1300.0, 1.6, 901.0, steady=901.0) \
        == 400.0 > mon.wedged_after


def test_monitor_restart_requires_new_steady_output():
    # after a restart the directory already holds old checkpoints;
    # their (old) mtimes must not count as steady progress — only a
    # NEW steady write ends the startup phase
    mon = WedgeMonitor(now=0.0, cpu=0.0, mtime=500.0, window_s=360.0,
                       startup_window_s=1200.0, steady=500.0)
    assert mon.tick(400.0, 0.1, 500.0, steady=500.0) == 400.0
    assert mon.wedged_after == 1200.0           # still startup
    assert mon.tick(600.0, 0.1, 601.0, steady=601.0) == 0.0
    assert mon.wedged_after == 360.0


def test_monitor_resets_on_file_progress():
    mon = WedgeMonitor(now=0.0, cpu=0.0, mtime=100.0, window_s=360.0,
                       startup_window_s=360.0)
    assert mon.tick(300.0, 0.5, 100.0) == 300.0
    # a therm flush lands: stall age resets even with ~0 CPU
    assert mon.tick(350.0, 0.6, 351.0) == 0.0
    assert mon.tick(700.0, 0.7, 351.0) == 350.0
    # age is measured from the last progress point, not from start
    assert mon.tick(712.0, 0.7, 351.0) == 362.0 > mon.wedged_after


def test_monitor_treats_cpu_burn_as_progress():
    # compile phase: no output files at all, but host CPU moves
    mon = WedgeMonitor(now=0.0, cpu=0.0, mtime=0.0, window_s=360.0,
                       cpu_rate=0.05)
    assert mon.tick(300.0, 20.0, 0.0) == 0.0       # compiling
    assert mon.tick(600.0, 40.0, 0.0) == 0.0       # still compiling
    assert mon.tick(900.0, 41.0, 0.0) == 300.0     # compile ended,
    assert mon.tick(990.0, 41.5, 0.0) == 390.0     # then wedged


def test_monitor_ignores_keepalive_sized_cpu():
    # the measured wedge trickles keepalives; a ~1% CPU rate must NOT
    # read as progress
    mon = WedgeMonitor(now=0.0, cpu=0.0, mtime=0.0, window_s=360.0,
                       cpu_rate=0.05, startup_window_s=360.0)
    assert mon.tick(200.0, 2.0, 0.0) == 200.0
    assert mon.tick(400.0, 4.0, 0.0) == 400.0 > mon.wedged_after


def test_monitor_sustained_trickle_never_resets_stall():
    # process_time sums ALL threads, so keepalive/gRPC threads inside
    # a wedged process trickle CPU forever; judged cumulatively that
    # trickle eventually clears any absolute threshold and the wedge
    # is never detected (round-4 advisor finding).  Judged per-window
    # as a rate, the stall age must keep growing.
    mon = WedgeMonitor(now=0.0, cpu=0.0, mtime=0.0, window_s=360.0,
                       cpu_rate=0.05, startup_window_s=360.0)
    t, cpu = 0.0, 0.0
    for _ in range(100):                 # 2000 s of 1.4% trickle
        t += 20.0
        cpu += 0.28
        age = mon.tick(t, cpu, 0.0)
    assert age == 2000.0 > mon.wedged_after


def test_newest_output_mtime_picks_run_outputs_only(tmp_path):
    old = tmp_path / "ice000_therm.dat"
    old.write_text("row\n")
    os.utime(old, (1000.0, 1000.0))
    log = tmp_path / "mc.log"
    log.write_text("#\n")
    os.utime(log, (2000.0, 2000.0))
    ck = tmp_path / "checkpoint000.npz.1"
    ck.write_bytes(b"x")
    os.utime(ck, (1500.0, 1500.0))
    # a non-output file must not count
    noise = tmp_path / "run_00.log"
    noise.write_text("chatter\n")
    os.utime(noise, (9000.0, 9000.0))
    assert newest_output_mtime(str(tmp_path)) == 2000.0
    assert newest_output_mtime(str(tmp_path / "missing")) == 0.0


class _FakeRes:
    def __init__(self, stdout):
        self.stdout = stdout


def test_probe_device_bands():
    ok, s = probe_device(_run=lambda t: _FakeRes("PROBE_OP_S 0.8\n"))
    assert ok == "ok" and s == 0.8
    deg, s = probe_device(_run=lambda t: _FakeRes("PROBE_OP_S 48.2\n"))
    assert deg == "degraded" and s == 48.2
    # claim failure / garbage output / timeout all read as fail
    assert probe_device(_run=lambda t: _FakeRes(""))[0] == "fail"

    def _timeout(t):
        import subprocess
        raise subprocess.TimeoutExpired("probe", t)

    assert probe_device(timeout_s=30, _run=_timeout) == ("fail", 30.0)


def test_backoff_policy_waits_through_degraded_stretch():
    # DESIGN.md §6: in the degraded state "relaunching does not help;
    # only waiting does" — the policy must hold off relaunch with
    # growing waits, capped, and release immediately on recovery
    p = BackoffPolicy(start_s=60.0, factor=2.0, cap_s=900.0)
    waits = [p.decide("degraded") for _ in range(6)]
    assert waits == [60.0, 120.0, 240.0, 480.0, 900.0, 900.0]
    assert p.decide("ok") == 0.0            # recovery releases
    assert p.decide("fail") == 60.0         # ...and resets the ladder


def test_install_guard_exits_via_hook(tmp_path):
    fired = {}

    def fake_exit(code):
        fired["code"] = code
        # the real guard never returns from _exit; emulate by ending
        # the thread via an exception the daemon swallows
        raise SystemExit

    t = install_wedge_guard(str(tmp_path), window_s=0.05, poll_s=0.02,
                            _exit=fake_exit, startup_window_s=0.05)
    deadline = time.time() + 5.0
    while "code" not in fired and time.time() < deadline:
        time.sleep(0.02)
    assert fired.get("code") == 3
    t.join(timeout=5.0)
