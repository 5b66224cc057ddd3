"""Energy-kernel oracle tests (SURVEY.md §4 oracles a, b).

Cross-validates the JAX neighbour-list kernels against an independent
fp64 numpy implementation on the packaged ice Ih / Ic cells, and checks
the incremental-vs-full Delta-E consistency the reference audits with
its #ifdef DEBUG oracle (mc_moves.F90:1094-1102).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mc_water_ls_mw_tpu.constants import HART_TO_EV
from mc_water_ls_mw_tpu.models.sw import MW
from mc_water_ls_mw_tpu.ops.geometry import cell_shift_range, enumerate_shifts
from mc_water_ls_mw_tpu.ops.neighbours import build_neighbour_list
from mc_water_ls_mw_tpu.ops.energy import (
    full_energy,
    local_energy,
    translation_energies,
)
from mc_water_ls_mw_tpu.io.xmol import read_lattices

from .oracle import sw_full_energy

K = 40  # neighbour capacity for tests (reference maxneigh=50)


def _load(examples_dir, name="ice1_sample", nlat=2):
    r, H = read_lattices(examples_dir / name, nlat, expected_n=48)
    return jnp.asarray(r), jnp.asarray(H)


def _nbr(r, H):
    bounds = cell_shift_range(np.asarray(H), MW.rskin)
    shifts = jnp.asarray(enumerate_shifts(bounds))
    return build_neighbour_list(r, H, shifts, K, MW.rskin)


def test_neighbour_counts(examples_dir):
    r, H = _load(examples_dir)
    for l in range(2):
        nbr = _nbr(r[l], H[l])
        counts = np.asarray(nbr.count)
        # reference expects 16-17 entries and warns below 16
        # (molint.F90:79, 552-554)
        assert counts.min() >= 16
        assert counts.max() <= K
        assert np.all(np.asarray(nbr.mask).sum(axis=1) == counts)


def test_full_energy_matches_oracle(examples_dir):
    r, H = _load(examples_dir)
    for l in range(2):
        nbr = _nbr(r[l], H[l])
        e_jax = float(full_energy(r[l], H[l], nbr, MW))
        e_np = sw_full_energy(np.asarray(r[l]), np.asarray(H[l]), MW)
        assert e_jax == pytest.approx(e_np, rel=1e-12)
        # sanity: crystalline mW ice cohesive energy is near
        # -0.45 eV/molecule at these densities
        per_mol_ev = e_jax * HART_TO_EV / 48
        assert -0.6 < per_mol_ev < -0.3


def test_ih_ic_energy_ordering(examples_dir):
    """Ih (lattice 1) and Ic (lattice 2) energies are close but not equal."""
    r, H = _load(examples_dir)
    es = []
    for l in range(2):
        nbr = _nbr(r[l], H[l])
        es.append(float(full_energy(r[l], H[l], nbr, MW)))
    assert abs(es[0] - es[1]) * HART_TO_EV < 1.0
    assert es[0] != es[1]


def test_translation_delta_consistency(examples_dir):
    """E_full(new) - E_full(old) == E_local(new) - E_local(old).

    The invariant behind the reference's incremental energy updates
    (mc_moves.F90:1016, 1087) and its DEBUG oracle.
    """
    r, H = _load(examples_dir)
    key = jax.random.PRNGKey(0)
    for l in range(2):
        nbr = _nbr(r[l], H[l])
        e0 = full_energy(r[l], H[l], nbr, MW)
        for trial in range(4):
            key, k1, k2 = jax.random.split(key, 3)
            i = int(jax.random.randint(k1, (), 0, 48))
            disp = 0.4 * jax.random.normal(k2, (3,), dtype=r.dtype)
            p_new = r[l, i] + disp
            e_old, e_new = translation_energies(r[l], H[l], nbr, i, p_new, MW)
            r_new = r[l].at[i].set(p_new)
            e1 = full_energy(r_new, H[l], nbr, MW)
            dE_full = float(e1 - e0)
            dE_local = float(e_new - e_old)
            assert dE_local == pytest.approx(dE_full, abs=1e-10)


def test_local_energy_matches_translation_old(examples_dir):
    r, H = _load(examples_dir)
    nbr = _nbr(r[0], H[0])
    for i in (0, 7, 47):
        e_i = local_energy(r[0], H[0], nbr, i, r[0, i], MW)
        e_old, _ = translation_energies(
            r[0], H[0], nbr, i, r[0, i] + 0.1, MW
        )
        assert float(e_i) == pytest.approx(float(e_old), rel=1e-14)


def test_full_energy_insensitive_to_capacity(examples_dir):
    """Padded slots and capacity must not change the energy."""
    r, H = _load(examples_dir)
    bounds = cell_shift_range(np.asarray(H[0]), MW.rskin)
    shifts = jnp.asarray(enumerate_shifts(bounds))
    e = [
        float(
            full_energy(
                r[0], H[0],
                build_neighbour_list(r[0], H[0], shifts, cap, MW.rskin),
                MW,
            )
        )
        for cap in (24, 40, 50)
    ]
    assert e[0] == pytest.approx(e[1], rel=1e-14)
    assert e[1] == pytest.approx(e[2], rel=1e-14)
