"""Spatially sharded cell engine: measured throughput rows.

On the single available chip only the D=1-degenerate overhead row can
be measured (sharded-on-one-device vs unsharded, same config): it
prices the spatial machinery itself - the dummy-row localise, the
one-owner scatter + psum table assembly (degenerate collectives), the
schedule indirection - against the plain engine.  Multi-chip scaling
rows follow the same script on a real mesh.

Environment knobs: SP_NX/SP_NY/SP_M geometry (default 14/8/18 ->
N=8064), SP_WALKERS (128), SP_CYCLES (5), SP_PALLAS (off|apply|auto,
default apply), SP_TRIALS (1), SP_DISJOINT (1).
"""

from __future__ import annotations

import json
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
from mc_water_ls_mw_tpu.parallel.spatial import (
    SpatialCellEngine,
    make_spatial_mesh,
)
from mc_water_ls_mw_tpu.constants import ANG_TO_BOHR, AUP_TO_ATM


def main():
    nx = int(os.environ.get("SP_NX", "14"))
    ny = int(os.environ.get("SP_NY", "8"))
    m = int(os.environ.get("SP_M", "18"))
    W = int(os.environ.get("SP_WALKERS", "128"))
    cycles = int(os.environ.get("SP_CYCLES", "5"))
    pallas = os.environ.get("SP_PALLAS", "apply")
    T = int(os.environ.get("SP_TRIALS", "1"))
    disjoint = os.environ.get("SP_DISJOINT", "0") == "1"

    devs = jax.devices()
    print("devices:", devs)
    r0, H0 = stacking_switch_pair(nx, ny, m)
    N = r0.shape[1]
    mx, _ = correspondence_mismatch(r0, H0)
    shape = choose_grid_shape(H0, MW, mx, prefer_disjoint=disjoint)
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
        cell_pallas=pallas, cell_trials=T,
    )
    grid = build_bin_grid(prm.nbins, prm.mu_min, prm.mu_max,
                          dtype=jnp.float32)
    st, eaux, caux = init_cell_state(prm, MW, r0, H0, grid, cg)
    jax.block_until_ready(st.energy)
    print(f"N={N} coarse={shape} cap={cap} W={W} pallas={pallas} T={T}")

    rows = []

    def bench(tag, eng, st0):
        # TWO warm-up calls, the second fed the first's output: a
        # jitted entry whose output shardings differ from its input's
        # recompiles on call 2, and timing that call measures XLA
        # compile, not execution - exactly the round-3 mistake that
        # mis-read the spatial engine as 8x slow
        # (probe_resharding_recompile.py; spatial.run_cycles is now a
        # sharding fixed point, so call 2 is already steady state)
        t0 = time.time()
        s, _ = eng.run_cycles(st0, cycles)
        jax.block_until_ready(s.energy)
        compile_s = time.time() - t0
        s, _ = eng.run_cycles(s, cycles)
        jax.block_until_ready(s.energy)
        t0 = time.time()
        s, _ = eng.run_cycles(s, cycles)
        jax.block_until_ready(s.energy)
        dt = time.time() - t0
        inner = eng.inner if hasattr(eng, "inner") else eng
        moves = inner.trials_per_cycle * W * cycles
        print(f"{tag}: {moves / dt:,.0f} moves/s "
              f"({dt:.2f}s timed, compile {compile_s:.1f}s)")
        rows.append(dict(tag=tag, moves_per_s=moves / dt,
                         compile_s=compile_s))
        return s

    eng_u = CellEngine(prm, MW, grid, eaux, cg, caux)
    bench("unsharded", eng_u, st)

    for D in (1, 2, 4, 8):
        if D > len(devs) or cg.n[0] % D:
            continue
        mesh = make_spatial_mesh(devs[:D])
        eng_s = SpatialCellEngine(prm, MW, grid, eaux, cg, caux, mesh)
        bench(f"spatial D={D}", eng_s, st)

    print(json.dumps(rows))


if __name__ == "__main__":
    main()
