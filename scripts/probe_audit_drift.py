"""Bisect the N=8064 production audit drift (round 5).

First monitor audit ever run at production scale (cycle 500, dd,
f32, cell_trials=8, volume+switch on) showed stored-vs-fresh energy
drift of mean ~-10 eV / max 31 eV per ~250 cycles — five orders
above the n216 productions (~1e-4 eV) and the same order as the
round-4 PRE-fix f32 quantisation bug.  The drift is SYSTEMATIC
(stored more negative than fresh), which accumulation noise is not.

This probe reruns the cell engine at a reduced stack on CPU and
audits every ``PROBE_CYCLES`` cycles under toggled features to
locate the leak:

    A f64 all-on        (exactness floor)
    B f32 all-on        (production regime)
    C f32 no-volume
    D f32 T=1
    E f32 no-switch
    F f32 no-rebin      (list_update_int huge)

Env: PROBE_STACK (default "7,4,9" -> N=1008), PROBE_CYCLES (40),
PROBE_REPEAT (3), PROBE_WALKERS (2), PROBE_CASES (default "ABCDEF").
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from mc_water_ls_mw_tpu.constants import HART_TO_EV
from mc_water_ls_mw_tpu.models.sw import MW
from mc_water_ls_mw_tpu.models.stacking import (
    correspondence_mismatch,
    stacking_switch_pair,
)
from mc_water_ls_mw_tpu.mcmc.bins import build_bin_grid
from mc_water_ls_mw_tpu.mcmc.cellengine import CellEngine, init_cell_state
from mc_water_ls_mw_tpu.mcmc.config import RunParams
from mc_water_ls_mw_tpu.ops.cells import (
    build_grid,
    cap_for_positions,
    choose_grid_shape,
)


def run_case(tag, r0, H0, dtype, trials, vol, switch, rebin_int,
             cycles, repeat, walkers):
    N = r0.shape[1]
    mx, _ = correspondence_mismatch(r0, H0)
    shape = choose_grid_shape(H0, MW, mx)
    cg = build_grid(shape, cap_for_positions(r0, H0, shape), H0, MW,
                    mx)
    nbins = int(os.environ.get("PROBE_NBINS", "21"))
    prm = RunParams(
        nwater=N, num_lattices=2, n_walkers=walkers, dtype=dtype,
        temperature=200.0, pressure=RunParams.pressure,
        mu_min=-90000.0 * N / 8064, mu_max=90000.0 * N / 8064,
        nbins=nbins,
        cell_trials=trials,
        mc_max_trans=0.10, mc_dv_max=0.2,
        allow_vol=vol, allow_switch=switch,
        eq_mc_cycles=0, eq_adjust_mc=False,
        list_update_int=rebin_int,
        mpi_sync_int=50,
        wl_factor=0.005,
    )
    gdtype = jnp.float64 if dtype == "float64" else jnp.float32
    grid = build_bin_grid(prm.nbins, prm.mu_min, prm.mu_max,
                          dtype=gdtype)
    st, eaux, caux = init_cell_state(prm, MW, r0, H0, grid, cg)
    eng = CellEngine(prm, MW, grid, eaux, cg, caux)
    st = st._replace(cycle=jnp.asarray(1, jnp.int32))
    rows = []
    for rep in range(repeat):
        t0 = time.time()
        st, _ = eng.run_cycles(st, cycles)
        st, drift = eng._audit_energy(st)
        d = np.asarray(drift, np.float64) * HART_TO_EV   # [L,W]
        rows.append(
            (float(d.mean()), float(np.abs(d).max()),
             time.time() - t0)
        )
        print(f"  {tag} after {(rep + 1) * cycles:4d} cycles: "
              f"drift mean {d.mean():+.3e} eV  max|.| "
              f"{np.abs(d).max():.3e} eV  ({rows[-1][2]:.0f}s)",
              flush=True)
    return rows


def main():
    stack = tuple(int(x) for x in
                  os.environ.get("PROBE_STACK", "7,4,9").split(","))
    cycles = int(os.environ.get("PROBE_CYCLES", "40"))
    repeat = int(os.environ.get("PROBE_REPEAT", "3"))
    walkers = int(os.environ.get("PROBE_WALKERS", "2"))
    cases = os.environ.get("PROBE_CASES", "ABCDEF")
    r0, H0 = stacking_switch_pair(*stack)
    print(f"N = {r0.shape[1]}  stack {stack}  cycles/audit {cycles}"
          f"  walkers {walkers}", flush=True)

    spec = {
        "A": ("f64 all-on ", "float64", 8, True, True, 10),
        "B": ("f32 all-on ", "float32", 8, True, True, 10),
        "C": ("f32 no-vol ", "float32", 8, False, True, 10),
        "D": ("f32 T=1    ", "float32", 1, True, True, 10),
        "E": ("f32 no-sw  ", "float32", 8, True, False, 10),
        "F": ("f32 no-rbn ", "float32", 8, True, True, 10 ** 6),
    }
    for c in cases:
        tag, dt, T, vol, sw, rb = spec[c]
        print(f"case {c}: {tag}", flush=True)
        run_case(tag, r0, H0, dt, T, vol, sw, rb, cycles, repeat,
                 walkers)


if __name__ == "__main__":
    main()
