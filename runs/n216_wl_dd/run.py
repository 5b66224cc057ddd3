"""N=216 Wang-Landau weight generation, dd mode (round 3).

The production-scale mu-window domain-decomposition run the engine
comment (mcmc/engine.py window-seeding note) and VERDICT round-2 item 2
call for: the same physics as runs/n216_wl_r2 (4096 walkers, N=216,
200 K, 1 atm, mu in [-1800, 1800], 201 bins) but with the walkers
round-robined over 8 mu-windows (window_overlap=2 bins, the reference
dd example's setting: examples/ice1_gen_weights_dd/ice.input final
namelist).  Cold start (zero weights): walkers begin near mu ~= 0
(both replicas at their reference crystals) and drift outward toward
their preset-ls wells, being captured and confined by their window's
eta walls on first entry (mc_cycle:181-210 / eta_weight:915-922
analogues).  Per-window flatness halves each window's f independently;
the stitched global curve (comms_join_eta semantics) is compared
against the mw-mode curve of runs/n216_wl_r2 by
scripts/compare_dd_mw.py.

Usage: WL_QTIME=<seconds> python run.py   (from this directory)
"""
import os, subprocess, sys, time
sys.path.insert(0, "/root/repo")

# Claim-probe loop (scripts/run_n216_pipeline.sh recipe): the shared
# axon chip lease wedges; probing in short-lived subprocesses until a
# claim succeeds keeps THIS process from parking forever inside its
# first device call (the watchdog's stale timer is much coarser).
_PROBE = (
    "import jax,os,signal\n"
    "try:\n"
    "    d = jax.devices()\n"
    "except Exception as e:\n"
    "    print('CLAIM FAIL', type(e).__name__, flush=True)\n"
    "    os.kill(os.getpid(), signal.SIGKILL)\n"
    "print('DEVICE OK', d, flush=True)\n"
    "os._exit(0)\n"
)
for attempt in range(40):
    try:
        rc = subprocess.run(
            [sys.executable, "-c", _PROBE], timeout=150, check=False,
        ).returncode
    except subprocess.TimeoutExpired:
        rc = -1
    if rc == 0:
        break
    print(f"claim attempt {attempt} failed (rc={rc}); retrying",
          flush=True)
    time.sleep(60)
else:
    sys.exit("no device claim after 40 attempts")

from mc_water_ls_mw_tpu.app import run_input_file

qtime = float(os.environ.get("WL_QTIME", "11400"))
max_cycles = os.environ.get("WL_MAX_CYCLES")
run_input_file(
    "ice.input",
    overrides=dict(
        stack=(3, 3, 6),              # 4*3*3*6 = 216 molecules
        n_walkers=4096,
        n_windows=8,
        mu_min=-1800.0, mu_max=1800.0,
        nbins=201,
        # per-walker f scaled exactly as the mw-mode r2 run so the f
        # schedules are comparable (validate_wl.py derivation)
        wl_factor=0.005 * 8.0 / 4096,
        eq_mc_cycles=1000,
        mpi_sync_int=50,
        monitor_int=5000,
        flat_chk_int=2500,
        chkpt_dump_int=25000,
        wl_minhist=5,
        timer_qtime=qtime, timer_closetime=420,
        max_mc_cycles=100_000_000,
    ),
    max_cycles=int(max_cycles) if max_cycles else None,
)
print("WL dd gen stopped cleanly", flush=True)
