"""Large-N cell-engine benchmark / smoke run on the current device.

Builds the Ih/Ic stacking pair (models/stacking.py), initialises the
slab-layout walker ensemble, runs a few cycles, and prints phase
timings plus aggregate moves/s.  Environment knobs:

    LN_NX / LN_NY / LN_M   stacking geometry (N = 4*nx*ny*m)
    LN_WALKERS             walker count (default 64)
    LN_CYCLES              timed cycles (default 5)
    LN_CAP                 slot capacity override (default auto)
    LN_PALLAS              cell_pallas flag: auto (default)/on/off/apply
    LN_DISJOINT            1 = disjoint-stencil grid shape (CF=27,
                           enables 'apply'; fewer movers per sub-step)
    LN_TRIALS              cell_trials (anchored-window multi-trial
                           sub-step; default 1)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from mc_water_ls_mw_tpu.models.stacking import (
    correspondence_mismatch,
    stacking_switch_pair,
)
from mc_water_ls_mw_tpu.models.sw import MW
from mc_water_ls_mw_tpu.mcmc.config import RunParams
from mc_water_ls_mw_tpu.mcmc.bins import build_bin_grid
from mc_water_ls_mw_tpu.mcmc.cellengine import CellEngine, init_cell_state
from mc_water_ls_mw_tpu.ops.cells import (
    build_grid,
    cap_for_positions,
    choose_grid_shape,
)
from mc_water_ls_mw_tpu.constants import ANG_TO_BOHR, AUP_TO_ATM, HART_TO_EV


def main():
    nx = int(os.environ.get("LN_NX", "14"))
    ny = int(os.environ.get("LN_NY", "8"))
    m = int(os.environ.get("LN_M", "18"))
    W = int(os.environ.get("LN_WALKERS", "64"))
    cycles = int(os.environ.get("LN_CYCLES", "5"))

    print("devices:", jax.devices())
    t0 = time.time()
    r0, H0 = stacking_switch_pair(nx, ny, m)
    N = r0.shape[1]
    mx, _ = correspondence_mismatch(r0, H0)
    disjoint = os.environ.get("LN_DISJOINT") == "1"
    shape = choose_grid_shape(H0, MW, mx, prefer_disjoint=disjoint)
    cap_env = os.environ.get("LN_CAP")
    cap = int(cap_env) if cap_env else cap_for_positions(r0, H0, shape)
    cg = build_grid(shape, cap, H0, MW, mx)
    print(f"N={N} coarse={shape} nfine={cg.nfine} cap={cap} W={W} "
          f"K={cg.cells_per_color} CC={cg.cand_cells.shape[1]} "
          f"CF={cg.full_cells.shape[1]} build {time.time()-t0:.1f}s")

    prm = RunParams(
        nwater=N, num_lattices=2, temperature=200.0,
        pressure=1.0 / AUP_TO_ATM,
        mc_max_trans=0.25 * ANG_TO_BOHR, mc_dv_max=0.2 * ANG_TO_BOHR,
        nbins=201, mu_min=-1200.0, mu_max=1200.0,
        mc_vol_prob=1.0 / N, mc_switch_prob=0.1,
        samplerun=False, eq_mc_cycles=1, list_update_int=5,
        mpi_sync_int=10, latt_sync_int=10_000,
        n_walkers=W, dtype="float32", fused="off",
        cell_pallas=os.environ.get("LN_PALLAS", "auto"),
        cell_trials=int(os.environ.get("LN_TRIALS", "1")),
    )
    grid = build_bin_grid(prm.nbins, prm.mu_min, prm.mu_max,
                          dtype=jnp.float32)

    t0 = time.time()
    st, eaux, caux = init_cell_state(prm, MW, r0, H0, grid, cg)
    jax.block_until_ready(st.energy)
    t_init = time.time() - t0
    e = np.asarray(st.energy[:, 0]) * HART_TO_EV / N
    print(f"init {t_init:.1f}s  E/N eV: {e}")

    eng = CellEngine(prm, MW, grid, eaux, cg, caux)

    # warm-up MUST run the same executable as the timed block:
    # n_cycles is a static argument of run_cycles, so a 1-cycle
    # warm-up compiles a DIFFERENT program and the timed block then
    # pays a fresh ~20 s XLA compile (this bug inflated every
    # recorded cell-engine timing before 2026-08-18 by 3-9x)
    t0 = time.time()
    st, _ = eng.run_cycles(st, cycles)
    jax.block_until_ready(st.energy)
    print(f"compile + first {cycles} cycles: {time.time()-t0:.1f}s")

    t0 = time.time()
    st, _ = eng.run_cycles(st, cycles)
    jax.block_until_ready(st.energy)
    dt = time.time() - t0
    moves = eng.trials_per_cycle * W * cycles
    acc = np.asarray(st.acc.sum(axis=1))
    att = np.asarray(st.att.sum(axis=1))
    print(f"{cycles} cycles {dt:.2f}s -> {moves/dt:,.0f} moves/s  "
          f"acc/att trans={acc[0]}/{att[0]} vol={acc[1]}/{att[1]} "
          f"sw={acc[2]}/{att[2]}")
    print(f"E/N eV after: {np.asarray(st.energy[:, 0]) * HART_TO_EV / N}"
          f"  overflow={int(np.asarray(st.occ_overflow).max())}")

    # on-hardware incremental-exactness audit (the reference's DEBUG
    # oracle): max |tracked - recomputed| energy over all walkers
    t0 = time.time()
    _, drift = eng.audit_energy(st)
    jax.block_until_ready(drift)
    print(f"audit: max |drift| = {float(jnp.max(jnp.abs(drift))):.3e} "
          f"Ha ({time.time()-t0:.1f}s)")


if __name__ == "__main__":
    main()
