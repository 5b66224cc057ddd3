"""N=8064 SAMPLE phase from the wl2 generation checkpoint (round 5).

Restart-based sample phase: the launcher copies runs/n8064_wl2's
dual checkpoint slots (and nothing else) into this directory, and
the app's gen→sample restart path (app.py round 5) keeps the seeded
chain state and per-window eta, freezes f, zeroes the
histogram/uhist accumulators, and recomputes log_unbiased_norm from
the checkpoint's stitched eta — no warm-start file, no
re-equilibration, walkers already distributed over their μ-windows.

Config mirrors runs/n8064_wl2 exactly where the state layout is
concerned (W, grid, windows, cell engine); sampling-specific knobs:
samplerun on, cell_trials=1 (σ²-mixing optimal, DESIGN.md §5b),
deltaG_int=500 so the dd jackknife gets a block every ~7 minutes
(scripts/deltag_error.py --dd differences the cumulative per-window
raw dumps uhist_windows_<cycle>.dat).

Usage: WL_QTIME=<seconds> python run.py   (from this directory)
"""
import os, subprocess, sys, time
sys.path.insert(0, "/root/repo")

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
    time.sleep(30)
else:
    sys.exit("no device claim after 40 attempts")

from mc_water_ls_mw_tpu.liveness import install_wedge_guard

install_wedge_guard(".", window_s=900.0)

import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from mc_water_ls_mw_tpu.app import run_input_file

MU_RANGE = float(os.environ.get("WL_MU_RANGE", "27000"))
qtime = float(os.environ.get("WL_QTIME", "9000"))
max_cycles = os.environ.get("WL_MAX_CYCLES")
run_input_file(
    "ice.input",
    overrides=dict(
        stack=(14, 8, 18),            # 4*14*8*18 = 8064 molecules
        n_walkers=128,
        parallel_strategy="dd",
        n_windows=16,
        window_overlap=2,
        mu_min=-MU_RANGE, mu_max=MU_RANGE,
        nbins=201,
        samplerun=True,               # frozen f, unbiased histograms
        cell_trials=1,
        mc_max_trans=0.10,
        mc_dv_max=0.2,
        mc_vol_wall=0.2,
        eq_adjust_mc=False,
        eq_mc_cycles=400,
        list_update_int=10,
        mpi_sync_int=50,
        monitor_int=500,              # mu/energy heal cadence
        flat_chk_int=500,
        deltaG_int=500,               # jackknife block cadence
        file_output_int=100, therm_walkers=8,
        traj_output_int=100_000_000,
        chkpt_dump_int=250,
        timer_qtime=qtime, timer_closetime=420,
        max_mc_cycles=100_000_000,
    ),
    max_cycles=int(max_cycles) if max_cycles else None,
    jit_chunk=20,
)
print("N=8064 sample (from wl2 checkpoint) stopped cleanly", flush=True)
