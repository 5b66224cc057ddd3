"""Dense moment-kernel tests: cross-validation against the
neighbour-list implementation and the numpy oracle, plus the exact
local/full consistency the moment formulation guarantees."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mc_water_ls_mw_tpu.models.sw import MW
from mc_water_ls_mw_tpu.ops.geometry import cell_shift_range, enumerate_shifts
from mc_water_ls_mw_tpu.ops.dense import (
    Moments,
    full_energy_dense,
    local_energies_dense,
)
from mc_water_ls_mw_tpu.ops.neighbours import build_neighbour_list
from mc_water_ls_mw_tpu.ops.energy import full_energy as full_energy_list
from mc_water_ls_mw_tpu.io.xmol import read_lattices

from .oracle import sw_full_energy


def _load(examples_dir):
    r, H = read_lattices(examples_dir / "ice1_sample", 2, expected_n=48)
    return jnp.asarray(r), jnp.asarray(H)


def _shifts(H):
    bounds = cell_shift_range(np.asarray(H), MW.rskin)
    return jnp.asarray(enumerate_shifts(bounds))


def test_dense_full_matches_oracle_and_list(examples_dir):
    r, H = _load(examples_dir)
    for l in range(2):
        shifts = _shifts(H[l])
        e_dense, mom = full_energy_dense(r[l], H[l], shifts, MW)
        e_np = sw_full_energy(np.asarray(r[l]), np.asarray(H[l]), MW)
        assert float(e_dense) == pytest.approx(e_np, rel=1e-12)
        nbr = build_neighbour_list(r[l], H[l], shifts, 40, MW.rskin)
        e_list = full_energy_list(r[l], H[l], nbr, MW)
        assert float(e_dense) == pytest.approx(float(e_list), rel=1e-12)
        # moments finite and the weight sums ~ coordination-sized
        for leaf in mom:
            assert np.isfinite(np.asarray(leaf)).all()
        assert np.asarray(mom.s1).min() > 0


def test_local_delta_exactly_matches_full(examples_dir):
    """The moment formulation makes local and full energies the SAME
    Hamiltonian: E_full(new) - E_full(old) == E_new - E_old exactly
    (no cos-filter discrepancy; cf. molint.F90:367)."""
    r, H = _load(examples_dir)
    key = jax.random.PRNGKey(1)
    for l in range(2):
        shifts = _shifts(H[l])
        e0, mom = full_energy_dense(r[l], H[l], shifts, MW)
        for trial in range(5):
            key, k1, k2 = jax.random.split(key, 3)
            i = int(jax.random.randint(k1, (), 0, 48))
            p_new = r[l, i] + 0.5 * jax.random.normal(k2, (3,),
                                                      dtype=r.dtype)
            e_old, e_new, _ = local_energies_dense(
                r[l], H[l], i, p_new, mom, shifts, MW
            )
            e1, _ = full_energy_dense(
                r[l].at[i].set(p_new), H[l], shifts, MW
            )
            assert float(e_new - e_old) == pytest.approx(
                float(e1 - e0), abs=5e-12
            )


def test_incremental_moments_match_fresh(examples_dir):
    """Post-accept moment state == fresh recompute at the new
    configuration (the incremental bookkeeping contract)."""
    r, H = _load(examples_dir)
    l = 0
    shifts = _shifts(H[l])
    _, mom = full_energy_dense(r[l], H[l], shifts, MW)
    i = 17
    p_new = r[l, i] + jnp.asarray([0.4, -0.3, 0.2], dtype=r.dtype)
    _, _, eff = local_energies_dense(r[l], H[l], i, p_new, mom, shifts, MW)
    _, fresh = full_energy_dense(r[l].at[i].set(p_new), H[l], shifts, MW)
    for a, b in zip(eff, fresh):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-12
        )


def test_chained_moves_stay_consistent(examples_dir):
    """Several accepted moves with incremental moments: energy
    accumulated from local deltas tracks the from-scratch energy."""
    r, H = _load(examples_dir)
    l = 1
    shifts = _shifts(H[l])
    e, mom = full_energy_dense(r[l], H[l], shifts, MW)
    e = float(e)
    rr = r[l]
    key = jax.random.PRNGKey(3)
    for step in range(10):
        key, k1, k2 = jax.random.split(key, 3)
        i = int(jax.random.randint(k1, (), 0, 48))
        p_new = rr[i] + 0.3 * jax.random.normal(k2, (3,), dtype=rr.dtype)
        e_old, e_new, eff = local_energies_dense(
            rr, H[l], i, p_new, mom, shifts, MW
        )
        rr = rr.at[i].set(p_new)
        e += float(e_new - e_old)
        mom = eff
    e_scratch, _ = full_energy_dense(rr, H[l], shifts, MW)
    assert e == pytest.approx(float(e_scratch), abs=1e-10)


def test_folded_reduced_shifts_match_general(examples_dir):
    """MIC-folded evaluation with the reduced residual shift set is
    exactly equivalent to the full image enumeration (the packaged Ic
    cell needs 3 residual shifts: its b-width < 2*cutoff)."""
    from mc_water_ls_mw_tpu.ops.dense import reduced_shift_set

    r, H = _load(examples_dir)
    red = jnp.asarray(reduced_shift_set(np.asarray(H), MW))
    assert red.shape[0] == 3          # one narrow axis on these cells
    for l in range(2):
        full = _shifts(H[l])
        e_gen, mom_gen = full_energy_dense(r[l], H[l], full, MW, False)
        e_fold, mom_fold = full_energy_dense(r[l], H[l], red, MW, True)
        assert float(e_gen) == pytest.approx(float(e_fold), rel=1e-13)
        for a, b in zip(mom_gen, mom_fold):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-13)
        # local deltas agree too
        _, mom = full_energy_dense(r[l], H[l], red, MW, True)
        i = 11
        p_new = r[l, i] + jnp.asarray([0.5, 0.2, -0.4], dtype=r.dtype)
        eo1, en1, _ = local_energies_dense(r[l], H[l], i, p_new, mom,
                                           full, MW, False)
        eo2, en2, _ = local_energies_dense(r[l], H[l], i, p_new, mom,
                                           red, MW, True)
        assert float(en1 - eo1) == pytest.approx(float(en2 - eo2),
                                                 abs=1e-13)


def test_cutoff_edge_pair_is_finite_f32():
    """Regression: a pair whose f32 r^2 sits one ulp inside rc^2 can
    round rij to EXACTLY rc, making the screening denominator +0.0 and
    the pair energy -inf (observed poisoning a 4096-walker production
    run at ~1-in-1e9 moves).  The strictly-negative denominator clamp
    (ops/dense._DENOM_CLAMP) must keep every kernel finite."""
    from mc_water_ls_mw_tpu.ops.dense import (
        full_energy_batch,
        reduced_shift_set,
    )

    H = np.eye(3) * 40.0
    x = np.float32(MW.rc)             # separation == rc in f32
    assert float(np.float32(x * x)) < MW.rc2   # yet inside the r^2 test
    r = np.zeros((4, 3), dtype=np.float32)
    r[1, 0] = x
    r[2, 1] = 20.0                    # spectators far away
    r[3, 2] = 20.0
    r3 = jnp.asarray(r.T, dtype=jnp.float32)[:, :, None]
    Hw = jnp.asarray(H, dtype=jnp.float32)[:, :, None]
    sh = reduced_shift_set(H, MW)
    for mic in (False, True):
        e, mom = full_energy_batch(r3, Hw, jnp.asarray(sh), MW, mic)
        assert np.isfinite(float(e[0]))
        assert abs(float(e[0])) < 1e-6     # the edge pair contributes 0
        for f in mom:
            assert bool(jnp.all(jnp.isfinite(f)))
