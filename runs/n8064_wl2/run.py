"""N=8064 Wang-Landau weight generation, round 5 re-parameterization.

Round-5 findings that re-shaped this run (see DESIGN.md §6 and
scripts/probe_drift_ckpt.py output, 2026-08-21):

1. **The ±90000 mu grid of runs/n8064_wl was ~10× too wide.**  The
   equilibrium basins are INTENSIVE: the n216 production's unbiased
   histograms peak at mu = ±244 = ±1.13 kT/molecule, so N=8064
   basins sit at ~±9100 — round-4's basin probe measured cold-start
   relaxation strain (±72000), not equilibrium.  This grid: ±27000
   (3× the intensive estimate, finite-size headroom), 201 bins,
   16 windows.
2. **Central mu-windows evaporate without a volume wall.**  Window
   seeding asks central windows for E1≈E2 states and the cheap
   route is gas (V ran to ~20·V0 in run 1, where mu≈0 trivially).
   `mc_vol_wall=0.2` restricts both replicas to ±20% of the
   reference lattice volume — ice polytypes fluctuate within ~±3%,
   so only the gas branch is excluded (engine._volume round-5 note).
3. Cold-start weights (run 1's curve was built partly on the gas
   valley); per-window initial-lattice seeding (state init: windows
   entirely at mu<0 start with lattice 1 active, mu>0 with
   lattice 2) puts every walker on its own side of the barrier.

Operational defences as run 1 (claim probe, wedge guard with
startup window + heartbeat, persistent compile cache, watchdog +
milestone committer).

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
        cell_trials=8,                # WL filling is paced by trials/s
        mc_max_trans=0.10,
        mc_dv_max=0.2,
        mc_vol_wall=0.2,              # exclude the evaporation branch
        eq_adjust_mc=True,
        wl_factor=0.005 * 16.0 / 128,
        eq_mc_cycles=400,
        list_update_int=10,
        mpi_sync_int=50,
        monitor_int=500,
        flat_chk_int=500,
        wl_minhist=5,
        file_output_int=100, therm_walkers=8,
        traj_output_int=100_000_000,
        chkpt_dump_int=250,
        timer_qtime=qtime, timer_closetime=420,
        max_mc_cycles=100_000_000,
    ),
    max_cycles=int(max_cycles) if max_cycles else None,
    jit_chunk=20,
)
print("N=8064 WL2 dd gen stopped cleanly", flush=True)
