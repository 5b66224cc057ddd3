"""N=216 Wang-Landau weight generation, round 2 (delta-split WL).

Continues runs/n216_wl: the round-1 run stalled on the f32 histogram
saturation artifact (see ops/dsfloat.py); this relaunch runs the same
physics on the delta-split + double-single master layout, warm-started
from the round-1 eta_weights.dat (f = 9.77e-6/walker, its INITIAL
value - f never halved in round 1).

Usage: WL_QTIME=<seconds> python run.py   (from this directory)
"""
import os, sys
sys.path.insert(0, "/root/repo")
from mc_water_ls_mw_tpu.app import run_input_file

qtime = float(os.environ.get("WL_QTIME", "11400"))
run_input_file(
    "ice.input",
    overrides=dict(
        stack=(3, 3, 6),              # 4*3*3*6 = 216 molecules
        n_walkers=4096,
        mu_min=-1800.0, mu_max=1800.0,
        nbins=201,
        # per-walker f scaled so the ENSEMBLE increment rate matches
        # the example's 8-rank tuning (validate_wl.py derivation)
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
)
print("WL gen stopped cleanly", flush=True)
