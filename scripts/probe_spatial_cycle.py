"""Bisection probe 4: the spatial slowdown lives at CYCLE rank.

probe_spatial_bisect.py showed the full spatial region (the sub-step
scan under shard_map) runs at unsharded speed - so the real engine's
~6x comes from the cycle-rank phases around it (_cycle_with: rebin
cond, scheduled volume moves, delta-sync/resync conds, pack/unpack)
composing with the shard_map inside the cycle scan.  This probe runs
run_cycles for unsharded vs spatial-D=1 under configs that disable
the phases one at a time.

Env: PB_WALKERS (128), PB_CYCLES (2), PB_CONFIGS (comma list of
none,rebin,vol,sync,all; default all of them).
"""

from __future__ import annotations

import dataclasses
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
    configs = os.environ.get(
        "PB_CONFIGS", "none,rebin,vol,sync,all"
    ).split(",")

    r0, H0 = stacking_switch_pair(14, 8, 18)
    N = r0.shape[1]
    mx, _ = correspondence_mismatch(r0, H0)
    shape = choose_grid_shape(H0, MW, mx)
    cap = cap_for_positions(r0, H0, shape)
    cg = build_grid(shape, cap, H0, MW, mx)

    base = dict(
        nwater=N, num_lattices=2, temperature=200.0,
        pressure=1.0 / AUP_TO_ATM,
        mc_max_trans=0.25 * ANG_TO_BOHR, mc_dv_max=0.2 * ANG_TO_BOHR,
        nbins=201, mu_min=-1200.0, mu_max=1200.0,
        mc_switch_prob=0.1,
        samplerun=False, eq_mc_cycles=1,
        n_walkers=W, dtype="float32", fused="off",
        cell_pallas="apply", cell_trials=1,
    )
    OFF = 1_000_000

    def make_prm(mode):
        kw = dict(base)
        kw.update(
            mc_vol_prob=0.0, allow_vol=False, list_update_int=OFF,
            mpi_sync_int=OFF, latt_sync_int=OFF,
        )
        if mode in ("rebin", "all"):
            kw.update(list_update_int=5)
        if mode in ("vol", "all"):
            kw.update(mc_vol_prob=1.0 / N, allow_vol=True)
        if mode in ("sync", "all"):
            kw.update(mpi_sync_int=10)
        return RunParams(**kw)

    mesh = make_spatial_mesh(jax.devices()[:1])

    for mode in configs:
        prm = make_prm(mode)
        grid = build_bin_grid(prm.nbins, prm.mu_min, prm.mu_max,
                              dtype=jnp.float32)
        st, eaux, caux = init_cell_state(prm, MW, r0, H0, grid, cg)
        jax.block_until_ready(st.energy)
        for tag, ctor in (
            ("unsharded", lambda: CellEngine(prm, MW, grid, eaux,
                                             cg, caux)),
            ("spatial", lambda: SpatialCellEngine(
                prm, MW, grid, eaux, cg, caux, mesh)),
        ):
            eng = ctor()
            inner = getattr(eng, "inner", eng)
            t0 = time.time()
            s, _ = eng.run_cycles(st, cycles)
            jax.block_until_ready(s.energy)
            compile_s = time.time() - t0
            t0 = time.time()
            s, _ = eng.run_cycles(s, cycles)
            jax.block_until_ready(s.energy)
            dt = time.time() - t0
            moves = inner.trials_per_cycle * W * cycles
            print(f"{mode:6s} {tag:9s}: {moves / dt:>12,.0f} moves/s "
                  f"({dt:.2f}s, compile {compile_s:.0f}s)",
                  flush=True)


if __name__ == "__main__":
    main()
