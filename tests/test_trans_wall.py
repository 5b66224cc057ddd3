"""Cell-engine displacement wall (cell_trans_wall, round 5).

The LS-MC coherence regularizer: every molecule stays within the
wall radius of its lattice-1 reference site (minimum image).
Measured motivation (N=8064 production, DESIGN.md §5d round 5): the
barrier mu-windows otherwise fill with lockstep-disordered states
(both replicas hot, mu still ~0) that the eta walls cannot touch —
mu constrains only the energy DIFFERENCE.  The wall folds into the
sub-step trial gate (in_cell), so all three chains (XLA T=1, XLA
multi-trial, fused chain kernel) inherit it without kernel changes.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mc_water_ls_mw_tpu.models.sw import MW
from mc_water_ls_mw_tpu.models.stacking import (
    correspondence_mismatch,
    stacking_switch_pair,
)
from mc_water_ls_mw_tpu.mcmc.bins import build_bin_grid
from mc_water_ls_mw_tpu.mcmc.cellengine import (
    CellEngine,
    init_cell_state,
)
from mc_water_ls_mw_tpu.mcmc.config import RunParams
from mc_water_ls_mw_tpu.ops.cells import (
    build_grid,
    cap_for_positions,
    choose_grid_shape,
)

from tests.test_multitrial import _run_substep


@pytest.fixture(scope="module")
def base_system():
    r0, H0 = stacking_switch_pair(12, 7, 18)
    N = r0.shape[1]
    mx, _ = correspondence_mismatch(r0, H0)
    shape = choose_grid_shape(H0, MW, mx)
    cg = build_grid(
        shape, cap_for_positions(r0, H0, shape), H0, MW, mx
    )
    prm = RunParams(
        nwater=N, num_lattices=2, n_walkers=2, dtype="float64",
        temperature=200.0, mu_min=-500.0, mu_max=500.0,
        mc_always_switch=False, allow_switch=False,
        mc_vol_prob=0.0, allow_vol=False, eq_mc_cycles=0,
        list_update_int=100000, latt_sync_int=100000,
        mpi_sync_int=100000, cell_trials=3,
        mc_max_trans=0.6,     # large steps so the wall binds fast
    )
    grid = build_bin_grid(prm.nbins, prm.mu_min, prm.mu_max,
                          dtype=jnp.float64)
    st, eaux, caux = init_cell_state(prm, MW, r0, H0, grid, cg)
    return prm, grid, st, eaux, caux, cg


def _max_disp(eng, s):
    """Max min-image displacement (Bohr) of any valid slot from its
    lattice-1 reference site."""
    mol = np.maximum(np.asarray(s.slot2mol), 0)            # [ns,W]
    fref = np.asarray(eng.cellaux.fref0)                   # [3,N]
    fref_s = fref[:, mol]                                  # [3,ns,W]
    recip0 = np.asarray(s.recip[0])                        # [3,3,W]
    r0 = np.asarray(s.r[0])                                # [3,ns,W]
    f1 = np.einsum("abw,amw->bmw", recip0, r0) / (2 * np.pi)
    fd = f1 - fref_s
    fd -= np.round(fd)
    h0 = np.asarray(s.h[0])                                # [3,3,W]
    dsp = np.einsum("abw,bmw->amw", h0, fd)
    d = np.sqrt((dsp ** 2).sum(axis=0))                    # [ns,W]
    valid = np.asarray(s.slot2mol) >= 0
    return float(np.where(valid, d, 0.0).max())


def _drive(eng, st, cg, n=6):
    s = st
    for i in range(n):
        s, _ = _run_substep(eng, s, cg, eng.prm.n_walkers,
                            table_row=i % 8, cycle=2 + i)
    return s


def test_wall_confines_displacements(base_system):
    prm, grid, st, eaux, caux, cg = base_system
    wall = 0.35
    prm_w = dataclasses.replace(prm, cell_trans_wall=wall)
    eng_w = CellEngine(prm_w, MW, grid, eaux, cg, caux)
    eng_f = CellEngine(prm, MW, grid, eaux, cg, caux)

    s_w = _drive(eng_w, st, cg)
    s_f = _drive(eng_f, st, cg)

    d_w = _max_disp(eng_w, s_w)
    d_f = _max_disp(eng_f, s_f)
    assert d_w <= wall + 1e-9, f"walled run escaped: {d_w}"
    # control: without the wall the same schedule wanders past it
    assert d_f > wall, f"control never crossed the wall ({d_f})"
    # the wall must not freeze the chain: plenty of accepted moves
    assert int(np.asarray(s_w.acc)[0].sum()) > 0


def test_wall_t1_chain(base_system):
    prm, grid, st, eaux, caux, cg = base_system
    wall = 0.35
    prm1 = dataclasses.replace(prm, cell_trials=1,
                               cell_trans_wall=wall)
    eng1 = CellEngine(prm1, MW, grid, eaux, cg, caux)
    s1 = _drive(eng1, st, cg)
    assert _max_disp(eng1, s1) <= wall + 1e-9
    assert int(np.asarray(s1.acc)[0].sum()) > 0
