"""Bisection probe 9 (the resolution): the 'spatial 8x slowdown' is a
RECOMPILE artifact, not an execution pathology.

Every spatial region output leaves jit with NamedSharding(mesh, ...)
attached; the engine's initial state carries default single-device
shardings.  run_cycles(state0) compiles once; run_cycles(state1) -
state1 being the previous OUTPUT - sees different input shardings and
compiles AGAIN; benches that time exactly the second call measure
~pure XLA compile time (probe_spatial_cycle: spatial 'none' 16.42s
"timed" vs 16s compile).  Call 3 reuses call 2's executable.

This probe times three consecutive run_cycles calls for unsharded and
spatial D=1.  Expected: spatial call2 ~ compile-slow, call3 ~ call1.
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
from mc_water_ls_mw_tpu.mcmc.cellengine import (
    CellEngine,
    init_cell_state,
)
from mc_water_ls_mw_tpu.ops.cells import (
    build_grid,
    cap_for_positions,
    choose_grid_shape,
)
from mc_water_ls_mw_tpu.parallel.spatial import (
    SpatialCellEngine,
    make_spatial_mesh,
)
from mc_water_ls_mw_tpu.constants import ANG_TO_BOHR, AUP_TO_ATM


def main():
    W = int(os.environ.get("PB_WALKERS", "128"))
    cycles = int(os.environ.get("PB_CYCLES", "2"))

    r0, H0 = stacking_switch_pair(14, 8, 18)
    N = r0.shape[1]
    mx, _ = correspondence_mismatch(r0, H0)
    shape = choose_grid_shape(H0, MW, mx)
    cap = cap_for_positions(r0, H0, shape)
    cg = build_grid(shape, cap, H0, MW, mx)
    prm = RunParams(
        nwater=N, num_lattices=2, temperature=200.0,
        pressure=1.0 / AUP_TO_ATM,
        mc_max_trans=0.25 * ANG_TO_BOHR, mc_dv_max=0.2 * ANG_TO_BOHR,
        nbins=201, mu_min=-1200.0, mu_max=1200.0,
        mc_vol_prob=1.0 / N, mc_switch_prob=0.1,
        samplerun=False, eq_mc_cycles=1, list_update_int=5,
        mpi_sync_int=10, latt_sync_int=10_000,
        n_walkers=W, dtype="float32", fused="off",
        cell_pallas="apply", cell_trials=1,
    )
    grid = build_bin_grid(prm.nbins, prm.mu_min, prm.mu_max,
                          dtype=jnp.float32)
    st, eaux, caux = init_cell_state(prm, MW, r0, H0, grid, cg)
    jax.block_until_ready(st.energy)
    mesh = make_spatial_mesh(jax.devices()[:1])

    for tag, eng in (
        ("unsharded", CellEngine(prm, MW, grid, eaux, cg, caux)),
        ("spatial D=1", SpatialCellEngine(prm, MW, grid, eaux, cg,
                                          caux, mesh)),
    ):
        inner = getattr(eng, "inner", eng)
        moves = inner.trials_per_cycle * W * cycles
        s = st
        for call in range(1, 5):
            t0 = time.time()
            s, _ = eng.run_cycles(s, cycles)
            jax.block_until_ready(s.energy)
            dt = time.time() - t0
            print(f"{tag} call{call}: {dt:7.2f}s "
                  f"({moves / dt:>12,.0f} moves/s)", flush=True)


if __name__ == "__main__":
    main()
