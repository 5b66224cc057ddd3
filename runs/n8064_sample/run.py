"""N=8064 SAMPLE phase, dd mode (scaffolded round 4; first chip-time
item of round 5 once the WL generation's weights have converged).

Pipeline (the N=216 production recipe of runs/n216_sample_dd scaled
to the stacking system):

1. WL generation (runs/n8064_wl) until the per-window f schedule is
   deep enough (wlf.dat); the stitched curve lands in
   eta_weights.dat.
2. Inspect the POPULATED mu range of that curve
   (scripts/n8064_status.py) and retarget onto a trimmed sample grid
   (scripts/retarget_weights.py SRC DST --src-range -R R
   --dst-range -r r --dst-bins 201) -> this directory's
   eta_weights.dat.  The sample round-trip time scales with
   (range)^2; trim to where the generation curve's mass lives.
3. Run this script under scripts/watchdog.py
   (--watch ice000_therm.dat --stale 900 --grace 1800).
4. deltaG + error bar: dd-mode compute_deltaG dumps cumulative
   per-window raw histograms (uhist_windows_<cycle>.dat);
   scripts/deltag_error.py --dd differences consecutive dumps per
   window, re-stitches every delete-one block, and reports the block
   jackknife (VALIDATION.md f2 machinery, pinned by
   tests/test_deltag_dd.py).

Mirror of the WL run's operational defences: subprocess claim-probe
loop before the first in-process device call, and the wedge guard
(no output-file mtime progress + ~0 CPU rate = axon tunnel wedge,
liveness.py / DESIGN.md section 6 -> exit(3)
so the watchdog relaunches in minutes and auto-resumes from the
newest checkpoint).

Usage: WL_QTIME=<seconds> python run.py   (from this directory)
Env: WL_MU_RANGE (sample-grid half-range; default 90000 = the
generation grid, i.e. no trim), WL_MAX_CYCLES.
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
# in DESIGN.md §6): exit(3) on 6 min of no-output-no-CPU so the
# watchdog relaunches and the app resumes from the newest checkpoint.
from mc_water_ls_mw_tpu.liveness import install_wedge_guard

install_wedge_guard(".", window_s=900.0)

# Persistent compile cache: watchdog relaunches (the wedge-recovery
# path) re-pay every XLA compile otherwise.
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
        samplerun=True,               # frozen weights, unbiased hist
        cell_trials=1,                # sigma^2-mixing optimal (5b)
        mc_max_trans=0.18,
        mc_dv_max=0.2,
        eq_adjust_mc=False,
        eq_mc_cycles=400,
        list_update_int=10,
        mpi_sync_int=50,
        # round 5: frequent deltaG dumps -> many jackknife blocks
        # (deltag_error.py --dd differences consecutive per-window
        # raw dumps); monitor heals the f32 incremental energy and
        # commits curve artifacts every block
        monitor_int=500,
        flat_chk_int=1000,
        deltaG_int=500,
        file_output_int=100, therm_walkers=8,
        traj_output_int=100_000_000,
        chkpt_dump_int=250,
        timer_qtime=qtime, timer_closetime=420,
        max_mc_cycles=100_000_000,
    ),
    max_cycles=int(max_cycles) if max_cycles else None,
    jit_chunk=20,
)
print("N=8064 dd sample stopped cleanly", flush=True)
