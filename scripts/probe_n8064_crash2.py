"""Bisect the N=8064 app-path TPU worker crash, stage 2.

probe_n8064_crash.py: the full probe CONFIG runs fine when the engine
is driven directly - so the crash lives in the Application path.
Cases (each in a subprocess):

  0: prm from read_input(ice.input + overrides) -> engine driven
     directly (isolates namelist-built prm vs handmade prm)
  1: full Application.setup() -> app.engine.run_cycles driven
     directly (isolates setup side effects)
  2: app.run(max_cycles=2)    (isolates the run loop)
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

RUNDIR = "/root/repo/runs/n8064_probe"

OVERRIDES = dict(
    stack=(14, 8, 18),
    n_walkers=128,
    parallel_strategy="mw",
    mu_min=-150000.0, mu_max=150000.0, nbins=201,
    eq_mc_cycles=1_000_000,
    eq_adjust_mc=True,
    mc_max_trans=0.25, mc_dv_max=0.2,
    list_update_int=5,
    mpi_sync_int=100_000, latt_sync_int=100_000,
    monitor_int=100_000, flat_chk_int=100_000,
    chkpt_dump_int=1_000_000, deltaG_int=1_000_000,
    file_output_int=1, therm_walkers=8,
    traj_output_int=1_000_000,
    timer_qtime=1800.0, timer_closetime=60.0,
    max_mc_cycles=100_000,
)


def run_case(case: int):
    import numpy as np
    import jax

    from mc_water_ls_mw_tpu.io.namelist import read_input
    from mc_water_ls_mw_tpu.app import Application

    wd = "/tmp/app_probe"
    shutil.rmtree(wd, ignore_errors=True)
    os.makedirs(wd)
    shutil.copy(os.path.join(RUNDIR, "ice.input"), wd)

    os.chdir(wd)          # the app writes relative paths
    prm = read_input(os.path.join(wd, "ice.input"),
                     extra_overrides=OVERRIDES)

    if case == 0:
        import dataclasses

        import jax.numpy as jnp

        from mc_water_ls_mw_tpu.models.stacking import (
            correspondence_mismatch,
            stacking_switch_pair,
        )
        from mc_water_ls_mw_tpu.models.sw import MW
        from mc_water_ls_mw_tpu.mcmc.bins import build_bin_grid
        from mc_water_ls_mw_tpu.mcmc.cellengine import (
            CellEngine,
            init_cell_state,
        )
        from mc_water_ls_mw_tpu.ops.cells import (
            build_grid,
            cap_for_positions,
            choose_grid_shape,
        )

        r0, H0 = stacking_switch_pair(14, 8, 18)
        prm = dataclasses.replace(prm, nwater=r0.shape[1])
        mx, _ = correspondence_mismatch(r0, H0)
        shape = choose_grid_shape(H0, MW, mx)
        cap = cap_for_positions(r0, H0, shape)
        cg = build_grid(shape, cap, H0, MW, mx)
        grid = build_bin_grid(prm.nbins, prm.mu_min, prm.mu_max,
                              dtype=jnp.float32)
        st, eaux, caux = init_cell_state(prm, MW, r0, H0, grid, cg)
        eng = CellEngine(prm, MW, grid, eaux, cg, caux)
        s, _ = eng.run_cycles(st, 1)
        jax.block_until_ready(s.energy)
        s, _ = eng.run_cycles(s, 1)
        jax.block_until_ready(s.energy)
        print(f"case 0 OK mu[:2]={[float(x) for x in s.mu[:2]]}",
              flush=True)
        os._exit(0)

    app = Application(prm, workdir=wd)
    app.setup()
    if case == 1:
        s, _ = app.engine.run_cycles(app.state, 1)
        jax.block_until_ready(s.energy)
        s, _ = app.engine.run_cycles(s, 1)
        jax.block_until_ready(s.energy)
        print(f"case 1 OK mu[:2]={[float(x) for x in s.mu[:2]]}",
              flush=True)
        os._exit(0)
    app.run(max_cycles=2)
    print("case 2 OK", flush=True)
    os._exit(0)


def main():
    if len(sys.argv) > 1:
        run_case(int(sys.argv[1]))
        return
    for case in (0, 1, 2):
        t0 = time.time()
        try:
            res = subprocess.run(
                [sys.executable, os.path.abspath(__file__), str(case)],
                timeout=900, capture_output=True, text=True,
            )
            ok = res.returncode == 0
            tail = [ln for ln in
                    (res.stdout + res.stderr).strip().splitlines()
                    if "Warning" not in ln][-3:]
        except subprocess.TimeoutExpired:
            ok, tail = False, ["TIMEOUT"]
        print(f"case {case}: {'OK' if ok else 'CRASH/FAIL'} "
              f"({time.time() - t0:.0f}s) {tail}", flush=True)


if __name__ == "__main__":
    main()
