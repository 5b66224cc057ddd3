"""N=216 sample run: unbiased histogram + deltaG(Ih-Ic).

Production phase of the paper pipeline (README.md:4 of the
reference; mc_compute_deltaG_from_hist, mc_moves.F90:2498-2621):
weights FROZEN at the converged eta_weights.dat from
runs/n216_wl_r2 (copy it here before launching), accumulate the
unbiased visit histogram and report deltaG every deltaG_int cycles.

Usage (weights re-targeted from the WL grid to the trimmed
sample grid - scripts/retarget_weights.py rationale):
    python ../../scripts/retarget_weights.py \
        ../n216_wl_r2/eta_weights.dat eta_weights.dat
    WL_QTIME=<seconds> python run.py
"""
import os, sys
sys.path.insert(0, "/root/repo")
from mc_water_ls_mw_tpu.app import run_input_file

qtime = float(os.environ.get("WL_QTIME", "10800"))
run_input_file(
    "ice.input",
    overrides=dict(
        stack=(3, 3, 6),              # 4*3*3*6 = 216 molecules
        n_walkers=4096,
        mu_min=-700.0, mu_max=700.0,
        nbins=101,
        samplerun=True,
        eq_mc_cycles=1000,
        mpi_sync_int=50,
        monitor_int=5000,
        flat_chk_int=100_000_000,     # no flatness events in sampling
        deltaG_int=10000,
        chkpt_dump_int=25000,
        timer_qtime=qtime, timer_closetime=420,
        max_mc_cycles=100_000_000,
    ),
)
print("sample run stopped cleanly", flush=True)
