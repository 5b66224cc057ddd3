"""MC engine behaviour tests (SURVEY.md §4 oracles b, c, e).

Covers: incremental-vs-full energy consistency over full sweeps,
order-parameter self-consistency, delta-sync merge semantics, chain
resynchronisation, and single-box sampling sanity.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mc_water_ls_mw_tpu.constants import ANG_TO_BOHR, AUP_TO_ATM
from mc_water_ls_mw_tpu.models.sw import MW
from mc_water_ls_mw_tpu.mcmc.bins import build_bin_grid
from mc_water_ls_mw_tpu.mcmc.config import RunParams
from mc_water_ls_mw_tpu.mcmc.engine import VOL, Engine
from mc_water_ls_mw_tpu.mcmc.state import init_state
from mc_water_ls_mw_tpu.io.xmol import read_lattices


def _two_lattice_setup(examples_dir, **over):
    r0, H0 = read_lattices(examples_dir / "ice1_sample", 2, 48)
    base = dict(
        nwater=48, num_lattices=2, temperature=200.0,
        pressure=1.0 / AUP_TO_ATM,
        mc_max_trans=1.1 * ANG_TO_BOHR, mc_dv_max=0.924 * ANG_TO_BOHR,
        nbins=101, mu_min=-400.0, mu_max=400.0,
        mc_switch_prob=0.0, mc_vol_prob=1.0 / 48,
        samplerun=True, eq_mc_cycles=1,
        list_update_int=10, mpi_sync_int=5, latt_sync_int=10_000,
        max_mc_cycles=200, n_walkers=4, dtype="float64",
    )
    base.update(over)
    prm = RunParams(**base)
    gdtype = jnp.float64 if prm.dtype == "float64" else jnp.float32
    grid = build_bin_grid(prm.nbins, prm.mu_min, prm.mu_max,
                          dtype=gdtype)
    w0 = np.loadtxt(
        examples_dir / "ice1_sample" / "eta_weights.dat", skiprows=1
    )[:, 1]
    state, aux = init_state(prm, MW, r0, H0, grid, weight0=w0)
    return prm, grid, state, aux


@pytest.fixture(scope="module")
def base_run(examples_dir):
    """One shared 10-cycle run of the default two-lattice setup: five
    oracles below assert on the same trajectory (one compile instead
    of five - the engine's jit is per-instance)."""
    prm, grid, state, aux = _two_lattice_setup(examples_dir)
    eng = Engine(prm, MW, grid, aux)
    state, _ = eng.run_cycles(state, 10)
    return prm, eng, state


def test_incremental_energy_consistency(base_run):
    """After full sweeps the incrementally tracked energy matches a
    from-scratch recompute (the reference's DEBUG oracle,
    mc_moves.F90:1094-1102)."""
    prm, eng, state = base_run
    _, drift = eng.audit_energy(state)
    assert float(jnp.abs(drift).max()) < 1e-11


def test_mu_self_consistency(base_run):
    """Stored mu equals mu recomputed from stored energies+volumes."""
    prm, eng, state = base_run
    mu_scratch = eng._mu_scratch(state.energy, state.volume)
    np.testing.assert_allclose(
        np.asarray(state.mu), np.asarray(mu_scratch), atol=1e-9
    )


def test_moves_actually_accept(base_run):
    prm, eng, state = base_run
    att = np.asarray(state.att.sum(1))
    acc = np.asarray(state.acc.sum(1))
    assert att[0] > 0 and att[2] > 0
    assert 0 < acc[0] < att[0]           # translations partly accepted
    assert acc[2] > 0                    # some switches accepted
    # all walkers attempted exactly nwater moves x cycles
    assert att[0] + att[1] == 4 * 48 * 10


def test_walkers_decorrelate(base_run):
    """Independent RNG streams: walkers must diverge."""
    prm, eng, state = base_run
    mus = np.asarray(state.mu)
    assert len(np.unique(mus)) == len(mus)


def test_delta_sync_merge_semantics(examples_dir):
    """A sync folds every walker's growth into the shared master row
    and re-zeros the per-walker deltas (the delta-allreduce contract,
    comms_mpi.f90:461-494, in the delta-split layout)."""
    from mc_water_ls_mw_tpu.ops.dsfloat import ds_value64

    prm, grid, state, aux = _two_lattice_setup(
        examples_dir, mpi_sync_int=1_000_000
    )
    eng = Engine(prm, MW, grid, aux)
    state, _ = eng.run_cycles(state, 6)       # no sync happened
    per_walker = np.asarray(state.hist).T     # [W,B], grew independently
    assert np.abs(per_walker.std(axis=0)).max() > 0
    merged = eng.sync_all(state)
    m = ds_value64(merged.master_hist)        # [1,B]
    np.testing.assert_allclose(m[0], per_walker.sum(axis=0), rtol=1e-12)
    # deltas re-zeroed: immediately re-merging changes nothing
    assert float(np.abs(np.asarray(merged.hist)).max()) == 0.0
    again = eng.sync_all(merged)
    np.testing.assert_array_equal(ds_value64(again.master_hist), m)


def test_replica_coupling_invariant(examples_dir):
    """The two replicas must keep IDENTICAL fractional displacement
    fields from their reference sites through translations AND volume
    moves (the lattice-switch coupling, mc_moves.F90:1042-1067,
    1284-1350).  Guards the TPU bf16-einsum regression: default-
    precision cell contractions inject ~4e-3 coupling noise per
    volume move and corrupt the whole mu landscape."""
    prm, grid, state, aux = _two_lattice_setup(
        examples_dir, dtype="float32", mc_vol_prob=0.2
    )
    eng = Engine(prm, MW, grid, aux)
    state, _ = eng.run_cycles(state, 10)
    assert int(state.acc[VOL].sum()) > 0     # volume moves accepted
    r = np.asarray(state.r, np.float64)
    rec = np.asarray(state.recip, np.float64)
    ref = np.asarray(state.ref_r, np.float64)
    fr = np.einsum("labw,lanw->lbnw", rec, r) / (2 * np.pi)
    frr = np.einsum("labw,lanw->lbnw", rec, ref) / (2 * np.pi)
    d = fr - frr
    d = d - np.round(d)
    assert np.abs(d[0] - d[1]).max() < 1e-5


def test_sync_rezeros_weight_baseline(examples_dir):
    """Delta-sync re-zeros the merged window minimum (generation
    mode).  Guards against the ensemble baseline amplification /
    f32 ratchet pathologies: per-walker shifts must never compound
    through the merge."""
    from mc_water_ls_mw_tpu.ops.dsfloat import ds_value64

    prm, grid, state, aux = _two_lattice_setup(
        examples_dir, samplerun=False, mpi_sync_int=2
    )
    # poison the deltas: uniform offsets differing per walker
    off = jnp.asarray(np.array([-50.0, 30.0, -120.0, 7.0]))
    state = state._replace(weight=state.weight + off[None, :])
    eng = Engine(prm, MW, grid, aux)
    state, _ = eng.run_cycles(state, 4)       # includes >= 1 sync
    w = ds_value64(state.master_eta)          # [1,B] merged curve
    # merged curve min re-zeroed at the sync, offsets absorbed
    assert abs(w.min()) < 1e-9
    assert np.isfinite(w).all()
    # deltas since the last sync stay small (no baseline in them)
    d = np.asarray(state.weight)
    assert np.isfinite(d).all()


def test_chain_resync(base_run):
    """Resync forces lattice-2 displacements to match lattice 1
    (mc_moves.F90:2276-2333) and refreshes energies/mu."""
    prm, eng, state = base_run
    aux = eng.aux
    synced = eng.resync_chains(state)
    # cell displacement from reference equal in both lattices
    hd1 = np.asarray(synced.h[0]) - np.asarray(aux.ref_h)[0][:, :, None]
    hd2 = np.asarray(synced.h[1]) - np.asarray(aux.ref_h)[1][:, :, None]
    np.testing.assert_allclose(hd1, hd2, atol=1e-12)
    # fractional displacements from reference sites match
    frac = np.einsum("labw,lanw->lbnw", np.asarray(synced.recip),
                     np.asarray(synced.r)) / (2 * np.pi)
    frac_ref = np.einsum("labw,lanw->lbnw", np.asarray(synced.recip),
                         np.asarray(synced.ref_r)) / (2 * np.pi)
    d = frac - frac_ref
    np.testing.assert_allclose(d[0], d[1], atol=1e-9)
    # energies are from-scratch after resync
    _, drift = eng.audit_energy(synced)
    assert float(jnp.abs(drift).max()) < 1e-12


def test_single_box_npt(examples_dir):
    """single_box example semantics: 1 lattice, no switching
    (io.f90:208-220)."""
    r0, H0 = read_lattices(examples_dir / "single_box", 1, 48)
    prm = RunParams(
        nwater=48, num_lattices=1, temperature=220.0,
        pressure=1.0 / AUP_TO_ATM,
        mc_max_trans=1.1 * ANG_TO_BOHR, mc_dv_max=0.924 * ANG_TO_BOHR,
        allow_switch=False, mc_always_switch=False, mc_switch_prob=0.0,
        mc_vol_prob=1.0 / 48, samplerun=False, eq_mc_cycles=1,
        list_update_int=10, n_walkers=4, dtype="float64",
    )
    grid = build_bin_grid(prm.nbins, prm.mu_min, prm.mu_max)
    state, aux = init_state(prm, MW, r0, H0, grid)
    eng = Engine(prm, MW, grid, aux)
    e0 = float(state.energy.mean())
    state, samples = eng.run_cycles(state, 15)
    att = np.asarray(state.att.sum(1))
    assert att[2] == 0                    # no switch attempts
    assert att[1] > 0                     # volume moves happened
    _, drift = eng.audit_energy(state)
    assert float(jnp.abs(drift).max()) < 1e-11
    # energy stays physical (bound crystal, finite T)
    e1 = float(state.energy.mean())
    assert e0 < e1 < 0.0                  # heated up from perfect lattice
    # volumes moved but stayed near the crystal volume
    v = np.asarray(state.volume)
    assert np.all(v > 0.5 * v.mean()) and np.all(v < 2.0 * v.mean())


def test_eq_gating_blocks_wl_updates(examples_dir):
    """No histogram/weight updates before eq_mc_cycles
    (mc_moves.F90:1615)."""
    prm, grid, state, aux = _two_lattice_setup(
        examples_dir, eq_mc_cycles=1000, samplerun=False
    )
    eng = Engine(prm, MW, grid, aux)
    state, _ = eng.run_cycles(state, 5)
    assert float(state.hist.sum()) == 0.0


def test_minu_variant_smoke(examples_dir):
    """#ifdef MINU variant (mc_moves.F90:1119-1140): moves fold a
    switch to the lower-enthalpy lattice; chain stays consistent."""
    prm, grid, state, aux = _two_lattice_setup(examples_dir, minu=True)
    eng = Engine(prm, MW, grid, aux)
    state, _ = eng.run_cycles(state, 8)
    _, drift = eng.audit_energy(state)
    assert float(jnp.abs(drift).max()) < 1e-11
    mu_scratch = eng._mu_scratch(state.energy, state.volume)
    np.testing.assert_allclose(
        np.asarray(state.mu), np.asarray(mu_scratch), atol=1e-9
    )
    # with minu the active lattice tracks the lower-enthalpy replica
    enth = np.asarray(state.energy) + float(prm.pressure) * np.asarray(
        state.volume
    )
    ls = np.asarray(state.ls)
    # not asserting all (switch acceptance also moves ls), just sanity
    assert set(np.unique(ls)) <= {0, 1}


def test_si_single_box_npt():
    """The engine is generic over the SW family: a single-box NPT run
    of Stillinger-Weber silicon (models/sw.py SI - different sigma,
    epsilon and an exactly-tetrahedral cos0) on a 64-atom diamond cell
    keeps the incremental energies exact and the crystal bound."""
    from mc_water_ls_mw_tpu.models.sw import SI
    from mc_water_ls_mw_tpu.models.lattices import ideal_ic

    r, H = ideal_ic(2, 2.35167 * ANG_TO_BOHR)   # published SW bond
    r0, H0 = r[None], H[None]
    prm = RunParams(
        nwater=r.shape[0], num_lattices=1, temperature=800.0,
        pressure=1.0 / AUP_TO_ATM,
        mc_max_trans=0.25 * ANG_TO_BOHR, mc_dv_max=0.3 * ANG_TO_BOHR,
        allow_switch=False, mc_always_switch=False, mc_switch_prob=0.0,
        mc_vol_prob=1.0 / 64, samplerun=False, eq_mc_cycles=1,
        list_update_int=10, n_walkers=4, dtype="float64",
    )
    grid = build_bin_grid(prm.nbins, prm.mu_min, prm.mu_max)
    state, aux = init_state(prm, SI, r0, H0, grid)
    eng = Engine(prm, SI, grid, aux)
    e0 = float(state.energy.mean())
    n = prm.nwater
    # perfect diamond lattice: exactly -2*epsilon per atom
    assert abs(e0 / n + 2.0 * SI.epsilon) < 1e-6
    state, _ = eng.run_cycles(state, 12)
    att = np.asarray(state.att.sum(1))
    assert att[0] > 0 and att[1] > 0 and att[2] == 0
    _, drift = eng.audit_energy(state)
    assert float(jnp.abs(drift).max()) < 1e-11
    e1 = float(state.energy.mean())
    assert e0 < e1 < 0.0                  # heated, still bound
