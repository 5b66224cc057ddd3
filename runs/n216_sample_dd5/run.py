"""N=216 SAMPLE phase in dd mode (round 3).

Unbiased-histogram production driven by the DD-GENERATED weights
(runs/n216_wl_dd retargeted onto the trimmed +-700/101 sample grid,
matching runs/n216_sample's production setup): 4096 walkers over 8
mu-windows, frozen weights, stitched unbiased histogram + deltaG
(comms_join_uhist / mc_compute_deltaG_from_hist semantics).  Closes
the full dd loop: dd WL generation -> stitched curve -> dd sample
phase -> deltaG, independently of the mw-mode round-2 production.

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

from mc_water_ls_mw_tpu.liveness import install_wedge_guard

install_wedge_guard(".", window_s=600.0)

import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from mc_water_ls_mw_tpu.app import run_input_file

qtime = float(os.environ.get("WL_QTIME", "11400"))
max_cycles = os.environ.get("WL_MAX_CYCLES")
run_input_file(
    "ice.input",
    overrides=dict(
        stack=(3, 3, 6),              # 4*3*3*6 = 216 molecules
        n_walkers=4096,
        n_windows=8,
        mu_min=-700.0, mu_max=700.0,
        nbins=101,
        samplerun=True,
        eq_mc_cycles=500,
        mpi_sync_int=50,
        monitor_int=2000,
        flat_chk_int=100_000_000,     # no flatness events in sampling
        deltaG_int=2000,
        chkpt_dump_int=10000,
        timer_qtime=qtime, timer_closetime=420,
        max_mc_cycles=100_000_000,
    ),
    max_cycles=int(max_cycles) if max_cycles else None,
)
print("dd sample run stopped cleanly", flush=True)
