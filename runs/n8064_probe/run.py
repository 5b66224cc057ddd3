"""N=8064 mu-basin probe (round 4, pre-production).

Short unbiased run (WL gated off by a huge eq_mc_cycles) of the
(14,8,18) Ih/Ic stacking pair: all walkers start at mu ~= 0 (both
replicas at their reference crystals) and relax into the active
lattice's basin.  The therm mu trajectory locates the basin so the
production run's [mu_min, mu_max] brackets BOTH basins with margin
(an undersized range would wall the walk short of the basin and bias
deltaG; oversized only wastes outer bins).
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
for attempt in range(20):
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
    sys.exit("no device claim")

from mc_water_ls_mw_tpu.app import run_input_file

run_input_file(
    "ice.input",
    overrides=dict(
        stack=(14, 8, 18),            # 4*14*8*18 = 8064 molecules
        n_walkers=128,
        parallel_strategy="mw",
        mu_min=-150000.0, mu_max=150000.0, nbins=201,
        eq_mc_cycles=1_000_000,       # WL off: pure relaxation
        eq_adjust_mc=True,
        mc_max_trans=0.25, mc_dv_max=0.2,       # Angstrom
        list_update_int=5,
        mpi_sync_int=100_000, latt_sync_int=100_000,
        monitor_int=100_000, flat_chk_int=100_000,
        chkpt_dump_int=1_000_000, deltaG_int=1_000_000,
        file_output_int=25, therm_walkers=8,
        traj_output_int=1_000_000,
        timer_qtime=1800.0, timer_closetime=60.0,
        max_mc_cycles=100_000,
    ),
    max_cycles=500,
)
print("mu-basin probe done", flush=True)
