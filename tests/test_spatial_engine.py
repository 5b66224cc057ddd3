"""Spatially sharded cell engine ≡ unsharded engine (fp64, 2-device
virtual CPU mesh).

The SpatialCellEngine argument (parallel/spatial.py) is exactness by
construction: redundant boundary proposals see identical inputs, the
chain runs replicated on psum-assembled one-owner tables, and the
duplicate-safe scatter-ADD apply is algebraically the unsharded apply.
The only permitted deviation is fp rounding in the own-moment update
(add of (new - current) vs a direct set), so states match to fp64
tolerances and the integer chain outcomes (histogram counts, accept
counters, slot occupancy, active lattice) must agree EXACTLY.
"""

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
from mc_water_ls_mw_tpu.mcmc.config import RunParams
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


@pytest.fixture(scope="module")
def setup():
    r0, H0 = stacking_switch_pair(14, 8, 18)     # N = 8064, Ih/Ic
    N = r0.shape[1]
    prm = RunParams(
        nwater=N, num_lattices=2, n_walkers=2, dtype="float64",
        mc_ensemble="npt", temperature=200.0,
        # exercise every cycle-rank phase inside the run: rebins,
        # volume moves, delta-sync, chain resync
        list_update_int=2, latt_sync_int=3, mpi_sync_int=2,
        eq_mc_cycles=0, mc_vol_prob=1.0 / N, allow_vol=True,
        mc_always_switch=True, allow_switch=True,
        mu_min=-1000.0, mu_max=1000.0,
    )
    grid = build_bin_grid(prm.nbins, prm.mu_min, prm.mu_max,
                          dtype=jnp.float64)
    mismatch, _ = correspondence_mismatch(r0, H0)
    shape = choose_grid_shape(H0, MW, mismatch)
    cg = build_grid(
        shape, cap_for_positions(r0, H0, shape), H0, MW, mismatch,
    )
    state, eaux, caux = init_cell_state(prm, MW, r0, H0, grid, cg)
    return prm, grid, cg, eaux, caux, state


@pytest.mark.slow
def test_sharded_equals_unsharded(setup):
    prm, grid, cg, eaux, caux, state = setup
    eng = CellEngine(prm, MW, grid, eaux, cg, caux)
    mesh = make_spatial_mesh(jax.devices()[:2])
    seng = SpatialCellEngine(prm, MW, grid, eaux, cg, caux, mesh)
    assert seng.ndev == 2

    s1, _ = eng.run_cycles(state, 2)
    s2, _ = seng.run_cycles(state, 2)
    jax.block_until_ready(s1)
    jax.block_until_ready(s2)

    # integer chain outcomes: exact
    np.testing.assert_array_equal(np.asarray(s1.ls), np.asarray(s2.ls))
    np.testing.assert_array_equal(np.asarray(s1.att),
                                  np.asarray(s2.att))
    np.testing.assert_array_equal(np.asarray(s1.acc),
                                  np.asarray(s2.acc))
    np.testing.assert_array_equal(np.asarray(s1.hist),
                                  np.asarray(s2.hist))
    np.testing.assert_array_equal(np.asarray(s1.slot2mol),
                                  np.asarray(s2.slot2mol))
    np.testing.assert_array_equal(np.asarray(s1.trans_per_mol),
                                  np.asarray(s2.trans_per_mol))

    # continuous state: fp64-tight
    for name in ("mu", "energy", "volume", "weight", "r", "h"):
        a, b = getattr(s1, name), getattr(s2, name)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0, atol=1e-9,
            err_msg=name,
        )
    # moments only deviate by the add-vs-set rounding
    for i, (a, b) in enumerate(zip(s1.moments, s2.moments)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0, atol=1e-9,
            err_msg=f"moments[{i}]",
        )


def test_sharded_runs_on_four_devices(setup):
    """Wider mesh smoke: D=4 shards one cycle and keeps the audit
    invariants (energy vs recompute) intact."""
    prm, grid, cg, eaux, caux, state = setup
    if cg.n[0] % 4:
        pytest.skip("geometry not 4-divisible")
    mesh = make_spatial_mesh(jax.devices()[:4])
    seng = SpatialCellEngine(prm, MW, grid, eaux, cg, caux, mesh)
    s, _ = seng.run_cycles(state, 1)
    jax.block_until_ready(s)
    _, drift = seng.inner.audit_energy(s)
    assert float(jnp.max(jnp.abs(drift))) < 1e-9
    assert int(s.att.sum()) > 0
