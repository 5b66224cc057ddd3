"""Bin-grid oracle tests.

The packaged eta_weights.dat files carry the reference's own mid-bin mu
values in their first column (written at mc_moves.F90:1840) - a direct
golden oracle for the GP grid construction.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from mc_water_ls_mw_tpu.mcmc.bins import (
    ETA_WALL,
    build_bin_grid,
    eta_weight,
    mu_to_bin,
)


def _load_weights(examples_dir):
    data = np.loadtxt(examples_dir / "ice1_sample" / "eta_weights.dat",
                      skiprows=1)
    return data[:, 0], data[:, 1]


def test_grid_matches_reference_eta_weights(examples_dir):
    mu_ref, _ = _load_weights(examples_dir)
    grid = build_bin_grid(101, -400.0, 400.0)
    assert grid.nbins == 101
    np.testing.assert_allclose(np.asarray(grid.mu_bin), mu_ref, rtol=1e-9)


def test_grid_spans_exactly():
    grid = build_bin_grid(101, -400.0, 400.0)
    bw = np.asarray(grid.binwidth)
    mu = np.asarray(grid.mu_bin)
    # edges recovered from midpoints and widths must span [mu_min, mu_max]
    assert mu[0] - bw[0] / 2 == pytest.approx(-400.0, abs=1e-8)
    assert mu[-1] + bw[-1] / 2 == pytest.approx(400.0, abs=1e-8)
    # central bin is [-0.5, 0.5] (mc_moves.F90:635-636)
    assert mu[50] == 0.0
    assert bw[50] == 1.0
    # widths sum to the full range
    assert bw.sum() == pytest.approx(800.0, rel=1e-12)


def test_even_nbins_promoted_to_odd():
    grid = build_bin_grid(100, -400.0, 400.0)
    assert grid.nbins == 101


def test_mu_to_bin_at_midpoints():
    grid = build_bin_grid(101, -400.0, 400.0)
    mids = np.asarray(grid.mu_bin)
    ks = np.asarray(mu_to_bin(grid, jnp.asarray(mids)))
    np.testing.assert_array_equal(ks, np.arange(101))


def test_mu_to_bin_random_vs_edges():
    grid = build_bin_grid(101, -400.0, 400.0)
    bw = np.asarray(grid.binwidth)
    edges = np.concatenate([[-400.0], -400.0 + np.cumsum(bw)])
    rng = np.random.default_rng(0)
    mus = rng.uniform(-399.9, 399.9, size=500)
    ks = np.asarray(mu_to_bin(grid, jnp.asarray(mus)))
    expected = np.searchsorted(edges, mus, side="right") - 1
    # FP noise at exact edges aside, every lookup must match
    assert (ks == expected).mean() > 0.99


def test_eta_weight_interpolation(examples_dir):
    mu_ref, w_ref = _load_weights(examples_dir)
    grid = build_bin_grid(101, -400.0, 400.0)
    w = jnp.asarray(w_ref)

    def eta(mu):
        return float(
            eta_weight(grid, w, jnp.asarray(mu), -400.0, 400.0, 0, 100,
                       True, interp=True)
        )

    # at a mid-bin mu (away from ends) the interpolated weight equals
    # the stored value
    for k in (3, 50, 97):
        assert eta(mu_ref[k]) == pytest.approx(w_ref[k], rel=1e-10)
    # continuity across a bin midpoint and a bin edge
    for mu0 in (mu_ref[40], mu_ref[40] + grid.binwidth[40] / 2):
        lo, hi = eta(float(mu0) - 1e-7), eta(float(mu0) + 1e-7)
        assert abs(hi - lo) < 1e-4
    # window wall
    assert eta(401.0) == ETA_WALL
    assert eta(-401.0) == ETA_WALL
    # eta differences cancel when both ends are beyond the wall
    assert eta(401.0) - eta(405.0) == 0.0


def test_eta_weight_not_in_window_is_zero():
    grid = build_bin_grid(101, -400.0, 400.0)
    w = jnp.ones(101)
    v = eta_weight(grid, w, jnp.asarray(3.0), -400.0, 400.0, 0, 100,
                   False, interp=True)
    assert float(v) == 0.0


def test_eta_weight_flat_mode():
    grid = build_bin_grid(101, -400.0, 400.0)
    w = jnp.asarray(np.arange(101, dtype=float))
    v = eta_weight(grid, w, jnp.asarray(0.2), -400.0, 400.0, 0, 100,
                   True, interp=False)
    assert float(v) == 50.0
