"""N=8064 Wang-Landau weight generation, dd mode (round 4).

The first large-N production physics run (VERDICT r3 weak #3): the
(14,8,18) Ih/Ic stacking pair - 37x the reference's N=216 headline
system - through the parallel cell-sweep engine with the production
kernel stack (cell_pallas='apply', chain+WL kernel, cell_trials=8 per
DESIGN.md 5b's WL-filling guidance: WL is paced by mu-bin visits =
trials/s, where T=8 measured 2.5x T=1).

mu range: the basin probe (runs/n8064_probe, direct-driver variant in
scripts/probe_n8064_crash.py) measured the relaxation plateau; the
range below brackets both basins with ~25% margin.  16 mu-windows
(window_overlap=2), window seeding on, per-walker wl_factor scaled as
0.005 * n_windows / n_walkers (validate_wl.py derivation).

Runs under scripts/watchdog.py: the shared axon worker crashes /
wedges sporadically (round-4 probes: the same workload passes or
crashes by the minute), so chkpt_dump_int is small and restarts
resume from the newest valid checkpoint.

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

# Wedge guard (mc_water_ls_mw_tpu/liveness.py; signature + rationale
# in DESIGN.md §6): the tunnel can park this process inside a device
# call forever; exit(3) on 6 min of no-output-no-CPU so the watchdog
# relaunches and the app resumes from the newest checkpoint.
from mc_water_ls_mw_tpu.liveness import install_wedge_guard

install_wedge_guard(".", window_s=900.0)

# Persistent compile cache: watchdog relaunches (the wedge-recovery
# path) re-pay every XLA compile otherwise - at N=8064 that is
# 5-10 min per relaunch on this single contended core.
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from mc_water_ls_mw_tpu.app import run_input_file

MU_RANGE = float(os.environ.get("WL_MU_RANGE", "90000"))
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
        mc_max_trans=0.10,            # adapted anchored-cube width
        mc_dv_max=0.2,
        eq_adjust_mc=True,
        wl_factor=0.005 * 16.0 / 128,
        eq_mc_cycles=400,
        list_update_int=10,
        mpi_sync_int=50,
        # round 5: frequent curve dumps + flatness checks so every
        # few minutes of progress lands in SMALL TEXT artifacts that
        # scripts/milestone_commit.py commits — convergence must
        # survive backend outages and round boundaries (VERDICT r4
        # weak #1; the reference's warm-start path mc_init:736-776
        # reads exactly these files)
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
print("N=8064 WL dd gen stopped cleanly", flush=True)
