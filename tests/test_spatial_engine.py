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


@pytest.fixture(scope="module")
def setup4():
    """W=4 variant of ``setup`` for the 2-D space x walkers mesh."""
    r0, H0 = stacking_switch_pair(14, 8, 18)
    N = r0.shape[1]
    prm = RunParams(
        nwater=N, num_lattices=2, n_walkers=4, dtype="float64",
        mc_ensemble="npt", temperature=200.0,
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


def _assert_2d_matches(s1, s2):
    np.testing.assert_array_equal(np.asarray(s1.ls), np.asarray(s2.ls))
    np.testing.assert_array_equal(np.asarray(s1.att),
                                  np.asarray(s2.att))
    np.testing.assert_array_equal(np.asarray(s1.acc),
                                  np.asarray(s2.acc))
    np.testing.assert_array_equal(np.asarray(s1.hist),
                                  np.asarray(s2.hist))
    np.testing.assert_array_equal(np.asarray(s1.slot2mol),
                                  np.asarray(s2.slot2mol))
    for name in ("mu", "energy", "volume", "weight", "r", "h"):
        np.testing.assert_allclose(
            np.asarray(getattr(s1, name)),
            np.asarray(getattr(s2, name)),
            rtol=0, atol=1e-9, err_msg=name,
        )


def test_make_spatial_mesh_2d_factoring():
    devs = jax.devices()[:8]
    mesh = make_spatial_mesh(devs, walkers=4)
    assert mesh.axis_names == ("space", "walkers")
    assert dict(zip(mesh.axis_names, mesh.devices.shape)) == {
        "space": 2, "walkers": 4,
    }
    with pytest.raises(ValueError):
        make_spatial_mesh(devs[:6], walkers=4)


@pytest.mark.slow
def test_sharded_2d_space2_walkers2(setup4):
    """space=2 x walkers=2 mesh reproduces the unsharded chain
    exactly: the slab partition composes with walker sharding (the
    reference's every-MPI-rank-is-both-a-walker-and-a-window analog,
    comms_mpi.f90:244-530)."""
    prm, grid, cg, eaux, caux, state = setup4
    eng = CellEngine(prm, MW, grid, eaux, cg, caux)
    mesh = make_spatial_mesh(jax.devices()[:4], walkers=2)
    seng = SpatialCellEngine(prm, MW, grid, eaux, cg, caux, mesh)
    assert seng.ndev == 2 and seng.wdev == 2
    s1, _ = eng.run_cycles(state, 2)
    s2, _ = seng.run_cycles(state, 2)
    _assert_2d_matches(s1, s2)


@pytest.mark.slow
def test_sharded_2d_space2_walkers4(setup4):
    prm, grid, cg, eaux, caux, state = setup4
    eng = CellEngine(prm, MW, grid, eaux, cg, caux)
    mesh = make_spatial_mesh(jax.devices()[:8], walkers=4)
    seng = SpatialCellEngine(prm, MW, grid, eaux, cg, caux, mesh)
    assert seng.ndev == 2 and seng.wdev == 4
    s1, _ = eng.run_cycles(state, 2)
    s2, _ = seng.run_cycles(state, 2)
    _assert_2d_matches(s1, s2)


@pytest.mark.slow
def test_run_cycles_is_sharding_stable(setup):
    """Feeding run_cycles its own output must NOT recompile.

    The region's out_specs attach NamedShardings to some state
    leaves; before round 4 the second call therefore re-lowered with
    different input shardings and jit compiled AGAIN - benches timing
    that call recorded ~pure compile time and mis-diagnosed it as an
    '8x spatial execution slowdown' (round-3 DESIGN.md 5c;
    scripts/probe_resharding_recompile.py).  The canonical-sharding
    entry/exit (SpatialCellEngine.run_cycles/_run_cycles) makes the
    call a sharding fixed point."""
    prm, grid, cg, eaux, caux, state = setup
    mesh = make_spatial_mesh(jax.devices()[:2])
    seng = SpatialCellEngine(prm, MW, grid, eaux, cg, caux, mesh)
    s1, _ = seng.run_cycles(state, 1)
    s2, _ = seng.run_cycles(s1, 1)
    jax.block_until_ready(s2.energy)
    assert seng._jit_run_cycles._cache_size() == 1


@pytest.mark.slow
def test_sharded_runs_on_four_devices(setup):
    """Wider mesh smoke: D=4 shards one FULL cycle (every cycle-rank
    phase) and keeps the audit invariants (energy vs recompute)
    intact.  Slow-profile: the sub-step-granularity kernel tests
    below cover D=2 in the fast profile (D=4/8 slow), and the driver
    dryrun exercises full sharded cycles."""
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


# ----------------------------------------------------------------------
# substep-level exactness: Pallas kernels and multi-trial under the
# spatial mesh (interpret mode; one sub-step keeps the interpreted
# kernel grids affordable - a full cycle at N=8064 runs ~10^3 of them)
# ----------------------------------------------------------------------

def _substep_pair(prm, grid, cg, eaux, caux, state, ndev,
                  cycle=1):
    """Run ONE identical sub-step through the unsharded scan and the
    D-device sharded region; return both (state, tpm) pairs."""
    import dataclasses as dc

    eng = CellEngine(prm, MW, grid, eaux, cg, caux)
    mesh = make_spatial_mesh(jax.devices()[:ndev])
    seng = SpatialCellEngine(prm, MW, grid, eaux, cg, caux, mesh)
    K, T = eng.K, eng.T
    W = prm.n_walkers
    n_u = 7 if T == 1 else 4 + 5 * T
    s = state._replace(cycle=jnp.asarray(cycle, jnp.int32))
    codes = jnp.zeros((K * T,), jnp.int32)          # all TRANS
    sw_ok = jnp.ones((W,), dtype=bool)
    u_all = jax.vmap(
        lambda k: jax.random.uniform(
            jax.random.fold_in(k, cycle), (1, K, n_u),
            dtype=s.r.dtype,
        ),
        out_axes=3,
    )(s.key)
    a, tpa = eng._substep_scan(s, codes, u_all, sw_ok, 1)
    b, tpb = seng._sharded_scan(s, codes, u_all, sw_ok, 1)
    jax.block_until_ready(b.mu)
    return (a, tpa), (b, tpb)


def _assert_pair_equal(a, tpa, b, tpb):
    np.testing.assert_array_equal(np.asarray(a.ls), np.asarray(b.ls))
    np.testing.assert_array_equal(np.asarray(a.att), np.asarray(b.att))
    np.testing.assert_array_equal(np.asarray(a.acc), np.asarray(b.acc))
    np.testing.assert_array_equal(np.asarray(tpa), np.asarray(tpb))
    np.testing.assert_array_equal(np.asarray(a.hist),
                                  np.asarray(b.hist))
    for name in ("mu", "energy", "weight", "r"):
        np.testing.assert_allclose(
            np.asarray(getattr(a, name)),
            np.asarray(getattr(b, name)),
            rtol=0, atol=1e-9, err_msg=name,
        )
    for i, (fa, fb) in enumerate(zip(a.moments, b.moments)):
        np.testing.assert_allclose(
            np.asarray(fa), np.asarray(fb), rtol=0, atol=1e-9,
            err_msg=f"moments[{i}]",
        )
    assert int(np.asarray(a.acc)[0].sum()) > 0    # something moved


def test_sharded_substep_apply_kernel_d2(setup):
    """cell_pallas='apply' (fused energies + in-place apply kernels,
    interpret mode) under a 2-device spatial mesh == the same kernels
    unsharded: the dummy-row plan keeps every real slab row visited
    at most once, so the in-place kernel semantics survive sharding."""
    import dataclasses as dc

    prm, grid, cg, eaux, caux, state = setup
    if not bool(np.all(cg.full_mask)):
        pytest.skip("grid not unpadded")
    prm2 = dc.replace(prm, cell_pallas="apply")
    (a, tpa), (b, tpb) = _substep_pair(
        prm2, grid, cg, eaux, caux, state, ndev=2
    )
    _assert_pair_equal(a, tpa, b, tpb)


def test_sharded_substep_chain_kernel_d2(setup):
    """T=1 with BOTH the apply kernel and the fused chain+WL kernel
    (cell_chain='on', replicated on the psum-assembled point tables)
    under a 2-device mesh == unsharded."""
    import dataclasses as dc

    prm, grid, cg, eaux, caux, state = setup
    prm2 = dc.replace(prm, cell_pallas="apply", cell_chain="on")
    (a, tpa), (b, tpb) = _substep_pair(
        prm2, grid, cg, eaux, caux, state, ndev=2
    )
    _assert_pair_equal(a, tpa, b, tpb)


# >100s on this host (round-5 re-tier, VERDICT r4 weak #4)


@pytest.mark.slow


def test_sharded_substep_multitrial_d2(setup):
    """cell_trials=2 (anchored-window multi-trial: points kernel +
    chain with per-move WL + in-place apply of the final point)
    under a 2-device mesh == unsharded."""
    import dataclasses as dc

    prm, grid, cg, eaux, caux, state = setup
    prm2 = dc.replace(prm, cell_pallas="apply", cell_trials=2)
    (a, tpa), (b, tpb) = _substep_pair(
        prm2, grid, cg, eaux, caux, state, ndev=2
    )
    _assert_pair_equal(a, tpa, b, tpb)


@pytest.mark.slow
def test_sharded_substep_multitrial_chain_kernel_d4(setup):
    """The full kernel stack (points + chain+WL + apply) with T=2 on
    a 4-device mesh == unsharded - D=4 shards each coarse x-cell to
    its own device (layers_owned == halo depth, the tightest legal
    partition of this geometry)."""
    import dataclasses as dc

    prm, grid, cg, eaux, caux, state = setup
    if cg.n[0] % 4:
        pytest.skip("geometry not 4-divisible")
    prm2 = dc.replace(
        prm, cell_pallas="apply", cell_trials=2, cell_chain="on"
    )
    (a, tpa), (b, tpb) = _substep_pair(
        prm2, grid, cg, eaux, caux, state, ndev=4
    )
    _assert_pair_equal(a, tpa, b, tpb)


def test_spatial_rejects_unsupported_knobs(setup):
    """Explicitly requested unsupported modes must raise, not
    silently downgrade (round-2 advisor item)."""
    import dataclasses as dc

    prm, grid, cg, eaux, caux, state = setup
    mesh = make_spatial_mesh(jax.devices()[:2])
    with pytest.raises(ValueError, match="cell_pallas"):
        SpatialCellEngine(
            dc.replace(prm, cell_pallas="on"),
            MW, grid, eaux, cg, caux, mesh,
        )
    with pytest.raises(ValueError, match="apply"):
        # T>1 without the apply kernel (CPU 'auto' disables kernels)
        SpatialCellEngine(
            dc.replace(prm, cell_trials=2, cell_pallas="auto"),
            MW, grid, eaux, cg, caux, mesh,
        )


# ----------------------------------------------------------------------
# D=8: needs 8 coarse x-cells (layers_owned >= halo depth), i.e. a
# longer box than the 4x4x4 fixture - built once at module scope
# ----------------------------------------------------------------------

@pytest.fixture(scope="module")
def setup_wide():
    r0, H0 = stacking_switch_pair(28, 8, 18)     # N = 16128
    N = r0.shape[1]
    prm = RunParams(
        nwater=N, num_lattices=2, n_walkers=2, dtype="float64",
        mc_ensemble="npt", temperature=200.0,
        list_update_int=2, latt_sync_int=3, mpi_sync_int=2,
        eq_mc_cycles=0, mc_vol_prob=1.0 / N, allow_vol=True,
        mc_always_switch=True, allow_switch=True,
        mu_min=-1000.0, mu_max=1000.0,
    )
    grid = build_bin_grid(prm.nbins, prm.mu_min, prm.mu_max,
                          dtype=jnp.float64)
    mismatch, _ = correspondence_mismatch(r0, H0)
    shape = choose_grid_shape(H0, MW, mismatch)
    assert shape[0] % 8 == 0, shape
    cg = build_grid(
        shape, cap_for_positions(r0, H0, shape), H0, MW, mismatch,
    )
    state, eaux, caux = init_cell_state(prm, MW, r0, H0, grid, cg)
    return prm, grid, cg, eaux, caux, state


@pytest.mark.slow
def test_sharded_substep_d8(setup_wide):
    """8-device spatial mesh on the N=16128 pair: XLA sub-step path
    equality (the widest mesh the test image's virtual CPU devices
    support)."""
    prm, grid, cg, eaux, caux, state = setup_wide
    (a, tpa), (b, tpb) = _substep_pair(
        prm, grid, cg, eaux, caux, state, ndev=8
    )
    _assert_pair_equal(a, tpa, b, tpb)


@pytest.mark.slow
def test_sharded_substep_apply_kernel_d8(setup_wide):
    """8-device mesh with the in-place apply kernel stack + T=2
    multi-trial: the full production configuration at maximum test
    width."""
    import dataclasses as dc

    prm, grid, cg, eaux, caux, state = setup_wide
    prm2 = dc.replace(
        prm, cell_pallas="apply", cell_trials=2, cell_chain="on"
    )
    (a, tpa), (b, tpb) = _substep_pair(
        prm2, grid, cg, eaux, caux, state, ndev=8
    )
    _assert_pair_equal(a, tpa, b, tpb)
