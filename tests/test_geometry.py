"""Geometry op tests (reference: util.f90)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mc_water_ls_mw_tpu.ops.geometry import (
    cell_shift_range,
    determinant3,
    enumerate_shifts,
    from_frac,
    hmatrix_to_abc,
    min_image,
    recip_matrix,
    to_frac,
)


def _random_cell(seed=0):
    rng = np.random.default_rng(seed)
    H = np.diag([20.0, 22.0, 25.0]) + rng.normal(size=(3, 3))
    return jnp.asarray(H)


def test_determinant_matches_numpy():
    H = _random_cell()
    assert float(determinant3(H)) == pytest.approx(
        float(np.linalg.det(np.asarray(H))), rel=1e-13
    )


def test_recip_matrix_is_2pi_inv_transpose():
    H = _random_cell(1)
    R = np.asarray(recip_matrix(H))
    expected = 2 * np.pi * np.linalg.inv(np.asarray(H)).T
    np.testing.assert_allclose(R, expected, rtol=1e-12)


def test_frac_roundtrip():
    H = _random_cell(2)
    R = recip_matrix(H)
    v = jnp.asarray(np.random.default_rng(3).normal(size=(5, 3)) * 10)
    s = to_frac(R, v)
    np.testing.assert_allclose(np.asarray(from_frac(H, s)), np.asarray(v),
                               rtol=1e-12)


def test_min_image_within_half_cell():
    H = jnp.asarray(np.diag([10.0, 10.0, 10.0]))
    R = recip_matrix(H)
    v = jnp.asarray([7.0, -6.0, 12.0])
    w = np.asarray(min_image(v, H, R))
    np.testing.assert_allclose(w, [-3.0, 4.0, 2.0], atol=1e-12)


def test_hmatrix_to_abc_orthorhombic():
    H = jnp.asarray(np.diag([10.0, 11.0, 12.0]))
    a, b, c, al, be, ga = hmatrix_to_abc(H)
    assert float(a) == pytest.approx(10.0)
    assert float(b) == pytest.approx(11.0)
    assert float(c) == pytest.approx(12.0)
    for ang in (al, be, ga):
        assert float(ang) == pytest.approx(90.0)


def test_shift_enumeration_counts():
    # reference: (2*im+1)*(2*jm+1)*(2*km+1) vectors, null first
    # (molint.F90:193-213)
    bounds = (1, 1, 2)
    shifts = enumerate_shifts(bounds)
    assert shifts.shape == (3 * 3 * 5, 3)
    assert (shifts[0] == 0).all()
    assert len(np.unique(shifts, axis=0)) == len(shifts)


def test_cell_shift_range_small_box():
    H = np.diag([25.0, 25.0, 25.0])
    assert cell_shift_range(H, 9.6) == (1, 1, 1)
    assert cell_shift_range(H, 26.0) == (2, 2, 2)
