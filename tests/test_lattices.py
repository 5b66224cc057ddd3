"""Ideal lattice builders: geometry + mW energy oracles."""

import numpy as np
import jax.numpy as jnp

from mc_water_ls_mw_tpu.constants import HART_TO_EV
from mc_water_ls_mw_tpu.models.sw import MW
from mc_water_ls_mw_tpu.models.lattices import (
    MW_BOND_LENGTH,
    ideal_ic,
    ideal_ih,
    switch_pair_216,
)
from mc_water_ls_mw_tpu.ops.dense import (
    full_energy_dense,
    reduced_shift_set,
)


def _nn_distances(r, H):
    inv = np.linalg.inv(H)
    d = r[None, :, :] - r[:, None, :]
    f = np.einsum("ab,ijb->ija", inv, d)
    f -= np.round(f)
    d = np.einsum("ab,ijb->ija", H, f)
    dist = np.linalg.norm(d, axis=-1)
    np.fill_diagonal(dist, np.inf)
    return dist


def _energy_per_mol(r, H):
    sh = reduced_shift_set(H, MW)
    e, _ = full_energy_dense(
        jnp.asarray(r), jnp.asarray(H), jnp.asarray(sh), MW, True
    )
    return float(e) / len(r) * HART_TO_EV


def test_ic_geometry():
    r, H = ideal_ic(2, MW_BOND_LENGTH)
    assert r.shape == (64, 3)
    dist = _nn_distances(r, H)
    # perfect 4-coordination at the bond length
    nn = np.sort(dist, axis=1)[:, :4]
    np.testing.assert_allclose(nn, MW_BOND_LENGTH, rtol=1e-10)


def test_ih_geometry():
    r, H = ideal_ih((2, 2, 2), MW_BOND_LENGTH)
    assert r.shape == (32, 3)
    dist = _nn_distances(r, H)
    nn = np.sort(dist, axis=1)[:, :4]
    np.testing.assert_allclose(nn, MW_BOND_LENGTH, rtol=1e-10)


def test_cohesive_energy_matches_published():
    """Ideal mW ice energy: -0.5368 eV/molecule (~ -12.3 kcal/mol
    published cohesive energy of mW ice)."""
    for r, H in (ideal_ic(2, MW_BOND_LENGTH),
                 ideal_ih((2, 2, 2), MW_BOND_LENGTH)):
        e = _energy_per_mol(r, H)
        assert abs(e - (-0.536761)) < 2e-4


def test_ih_ic_degenerate_and_216():
    r0, H0 = switch_pair_216()
    assert r0.shape == (2, 216, 3)
    e_ih = _energy_per_mol(r0[0], H0[0])
    e_ic = _energy_per_mol(r0[1], H0[1])
    # first shells coincide -> ideal lattice energies degenerate
    assert abs(e_ih - e_ic) < 1e-9


def test_bond_length_is_energy_minimum():
    d = MW_BOND_LENGTH
    e0 = _energy_per_mol(*ideal_ic(2, d))
    for dd in (d * 0.99, d * 1.01):
        assert _energy_per_mol(*ideal_ic(2, dd)) > e0


def test_si_diamond_analytic_oracle():
    """SW silicon (the parent parameterisation of mW): on the ideal
    diamond lattice every angle is exactly tetrahedral and cos0 is
    exactly -1/3, so the three-body sum vanishes identically and the
    cohesive energy is EXACTLY -2*epsilon per atom at the pair-minimum
    bond length (Stillinger & Weber, PRB 31, 5262 (1985): 2.35167 A).
    An analytic, parameter-independent oracle for the energy kernels.
    """
    from mc_water_ls_mw_tpu.constants import BOHR_TO_ANG
    from mc_water_ls_mw_tpu.models.sw import SI, get_model
    from mc_water_ls_mw_tpu.models.lattices import optimal_bond_length

    assert get_model("Si") is SI
    d = optimal_bond_length(SI, lo=4.2, hi=4.7)
    assert abs(d * BOHR_TO_ANG - 2.35167) < 5e-4

    r, H = ideal_ic(2, d)
    sh = reduced_shift_set(H, SI)
    e, _ = full_energy_dense(
        jnp.asarray(r), jnp.asarray(H), jnp.asarray(sh), SI, True
    )
    n = r.shape[0]
    assert abs(float(e) / n + 2.0 * SI.epsilon) < 1e-8
