"""Fused whole-cycle Pallas kernel vs scan-path equivalence.

The fused kernel (mcmc/fused.py) consumes the same pre-drawn uniforms
and move-type schedule as the scan path, so with float64 both paths
must produce the same chains up to floating-point reduction order.
Runs in Pallas interpret mode on the CPU test backend.
"""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from mc_water_ls_mw_tpu.constants import ANG_TO_BOHR, AUP_TO_ATM
from mc_water_ls_mw_tpu.models.sw import MW
from mc_water_ls_mw_tpu.mcmc.bins import build_bin_grid
from mc_water_ls_mw_tpu.mcmc.config import RunParams
from mc_water_ls_mw_tpu.mcmc.engine import Engine
from mc_water_ls_mw_tpu.mcmc.state import init_state
from mc_water_ls_mw_tpu.io.xmol import read_lattices


def _setup(examples_dir, **over):
    r0, H0 = read_lattices(examples_dir / "ice1_sample", 2, 48)
    base = dict(
        nwater=48, num_lattices=2, temperature=200.0,
        pressure=1.0 / AUP_TO_ATM,
        mc_max_trans=1.1 * ANG_TO_BOHR, mc_dv_max=0.924 * ANG_TO_BOHR,
        nbins=101, mu_min=-400.0, mu_max=400.0,
        mc_switch_prob=0.0, mc_vol_prob=1.0 / 48,
        samplerun=True, eq_mc_cycles=1,
        mpi_sync_int=1000, latt_sync_int=10_000,
        max_mc_cycles=200, n_walkers=4, dtype="float64",
    )
    base.update(over)
    prm = RunParams(**base)
    grid = build_bin_grid(prm.nbins, prm.mu_min, prm.mu_max)
    w0 = np.loadtxt(
        examples_dir / "ice1_sample" / "eta_weights.dat", skiprows=1
    )[:, 1]
    state, aux = init_state(prm, MW, r0, H0, grid, weight0=w0)
    return prm, grid, state, aux


def _compare(examples_dir, n_cycles=2, **over):
    prm, grid, state, aux = _setup(examples_dir, **over)
    eng_scan = Engine(
        dataclasses.replace(prm, fused="off"), MW, grid, aux
    )
    eng_fused = Engine(
        dataclasses.replace(prm, fused="on"), MW, grid, aux
    )
    s1, _ = eng_scan.run_cycles(state, n_cycles)
    s2, _ = eng_fused.run_cycles(state, n_cycles)

    # integer decisions identical (same uniforms, same accepts)
    np.testing.assert_array_equal(np.asarray(s1.att), np.asarray(s2.att))
    np.testing.assert_array_equal(np.asarray(s1.acc), np.asarray(s2.acc))
    np.testing.assert_array_equal(np.asarray(s1.ls), np.asarray(s2.ls))
    np.testing.assert_array_equal(
        np.asarray(s1.trans_per_mol), np.asarray(s2.trans_per_mol)
    )
    # continuous state equal to reduction-order tolerance
    np.testing.assert_allclose(
        np.asarray(s1.r), np.asarray(s2.r), atol=1e-11
    )
    np.testing.assert_allclose(
        np.asarray(s1.energy), np.asarray(s2.energy), atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(s1.mu), np.asarray(s2.mu), atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(s1.hist), np.asarray(s2.hist), atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(s1.weight), np.asarray(s2.weight), atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(s1.uhist), np.asarray(s2.uhist), rtol=1e-8, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(s1.f), np.asarray(s2.f), atol=1e-12
    )
    return s1, s2


@pytest.mark.slow
def test_fused_matches_scan_samplerun(examples_dir):
    """Sample-run mode (frozen weights, unbiased histogram)."""
    _compare(examples_dir)


@pytest.mark.slow
def test_fused_matches_scan_wl_generation(examples_dir):
    """Wang-Landau weight-generation mode."""
    _compare(examples_dir, samplerun=False)


@pytest.mark.slow
def test_fused_matches_scan_minu(examples_dir):
    """#ifdef MINU move variant."""
    _compare(examples_dir, minu=True)


def test_fused_matches_scan_single_box(examples_dir):
    """Single-lattice NPT (no switching, no WL)."""
    r0, H0 = read_lattices(examples_dir / "single_box", 1, 48)
    prm = RunParams(
        nwater=48, num_lattices=1, temperature=220.0,
        pressure=1.0 / AUP_TO_ATM,
        mc_max_trans=1.1 * ANG_TO_BOHR, mc_dv_max=0.924 * ANG_TO_BOHR,
        allow_switch=False, mc_always_switch=False, mc_switch_prob=0.0,
        mc_vol_prob=1.0 / 48, samplerun=False, eq_mc_cycles=1,
        n_walkers=4, dtype="float64",
    )
    grid = build_bin_grid(prm.nbins, prm.mu_min, prm.mu_max)
    state, aux = init_state(prm, MW, r0, H0, grid)
    eng_scan = Engine(dataclasses.replace(prm, fused="off"), MW, grid, aux)
    eng_fused = Engine(dataclasses.replace(prm, fused="on"), MW, grid, aux)
    s1, _ = eng_scan.run_cycles(state, 2)
    s2, _ = eng_fused.run_cycles(state, 2)
    np.testing.assert_array_equal(np.asarray(s1.att), np.asarray(s2.att))
    np.testing.assert_array_equal(np.asarray(s1.acc), np.asarray(s2.acc))
    np.testing.assert_allclose(
        np.asarray(s1.r), np.asarray(s2.r), atol=1e-11
    )
    np.testing.assert_allclose(
        np.asarray(s1.energy), np.asarray(s2.energy), atol=1e-9
    )
