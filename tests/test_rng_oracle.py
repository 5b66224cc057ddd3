"""Recorded-RNG-stream parity oracle (SURVEY.md §7 step 4).

One recorded uniform stream drives (a) the scan-path Engine, (b) the
fused Pallas cycle kernel, and (c) a fully independent numpy serial
chain (tests/oracle.py MCChain: full-recompute energies, python
control flow).  Move-for-move agreement of accept decisions, chain
state and WL arrays cross-validates proposal construction, Metropolis
decisions, mu bookkeeping, eta interpolation and WL updates — the
role of the missing "identical RNG streams vs the Fortran build"
oracle (BASELINE.json; reference stream: random.f90:87-102).
"""

import dataclasses

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from mc_water_ls_mw_tpu.models.sw import MW  # noqa: E402
from mc_water_ls_mw_tpu.mcmc.engine import (  # noqa: E402
    Engine,
    SWITCH,
    TRANS,
)
from mc_water_ls_mw_tpu.io.xmol import read_lattices  # noqa: E402

from .oracle import MCChain  # noqa: E402

CYCLES = 3


def _recorded_stream(n_cycles, nwater, seed=7):
    rng = np.random.default_rng(seed)
    codes = np.where(
        rng.random((n_cycles, nwater)) < 0.95, TRANS, SWITCH
    ).astype(np.int32)
    u = rng.random((n_cycles, nwater, 7))
    return codes, u


def _setup(examples_dir, **over):
    import __graft_entry__ as g

    return g._setup(
        n_walkers=1, dtype="float64", nwater=48, samplerun=False,
        eq_mc_cycles=0, mpi_sync_int=10**9, latt_sync_int=10**9,
        mc_vol_prob=0.0, **over,
    )


@pytest.fixture(scope="module")
def recorded_run(examples_dir):
    prm, eng, state = _setup(examples_dir)
    codes, u = _recorded_stream(CYCLES, prm.nwater)
    eng.set_recorded_stream(codes, u)
    s, _ = eng.run_cycles(state, CYCLES)

    r0, H0 = read_lattices(str(examples_dir / "ice1_sample"), 2, 48)
    grid = {
        "mu_bin": np.asarray(eng.grid.mu_bin, np.float64),
        "binwidth": np.asarray(eng.grid.binwidth, np.float64),
        "av_binwidth": float(eng.grid.av_binwidth),
        "r_pos": float(eng.grid.r_pos),
        "r_neg": float(eng.grid.r_neg),
    }
    chain = MCChain(
        r0, H0, MW, grid,
        beta=prm.beta, pressure=prm.pressure, nwater=prm.nwater,
        max_trans=prm.mc_max_trans, eq_mc_cycles=0,
        wl_factor=prm.wl_factor, eta_interp=prm.eta_interp,
        mu_min=prm.mu_min, mu_max=prm.mu_max,
        always_switch=prm.mc_always_switch,
    ).run(codes, u)
    return prm, eng, state, s, chain, codes, u


def test_accept_decisions_bit_identical(recorded_run):
    """Every attempt and every accept agrees with the independent
    chain — a single differing Metropolis decision would diverge the
    trajectories immediately."""
    _, _, _, s, chain, _, _ = recorded_run
    att = np.asarray(s.att)[:, 0]
    acc = np.asarray(s.acc)[:, 0]
    assert att[TRANS] == chain.att[TRANS]
    assert acc[TRANS] == chain.acc[TRANS]
    assert att[SWITCH] == chain.att[SWITCH]
    assert acc[SWITCH] == chain.acc[SWITCH]
    assert acc[TRANS] > 0 and att[SWITCH] > 0
    assert int(np.asarray(s.ls)[0]) == chain.ls


def test_trajectory_matches_numpy_chain(recorded_run):
    """Positions, energies, mu track the independent chain at fp64."""
    _, _, _, s, chain, _, _ = recorded_run
    r_eng = np.asarray(s.r)[:, :, :, 0].transpose(0, 2, 1)  # [L,N,3]
    np.testing.assert_allclose(r_eng, chain.r, atol=1e-11)
    np.testing.assert_allclose(
        np.asarray(s.energy)[:, 0], chain.E, rtol=1e-10
    )
    np.testing.assert_allclose(
        float(np.asarray(s.mu)[0]), chain.mu, atol=1e-8
    )


def test_wl_arrays_match_numpy_chain(recorded_run):
    """WL histogram and weight growth agree bin-for-bin (generation
    mode, per-move updates; no sync during the run so the per-walker
    delta IS the total)."""
    _, _, _, s, chain, _, _ = recorded_run
    np.testing.assert_allclose(
        np.asarray(s.hist)[:, 0], chain.hist, rtol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(s.weight)[:, 0], chain.weight, rtol=1e-12
    )
    assert chain.hist.sum() > 0


def test_fused_kernel_same_recorded_stream(recorded_run):
    """The fused Pallas cycle kernel consumes the identical recorded
    stream and reproduces the scan path exactly (fp64 interpret)."""
    prm, eng, state, s_scan, chain, codes, u = recorded_run
    eng_f = Engine(
        dataclasses.replace(prm, fused="on"), MW, eng.grid, eng.aux
    )
    assert eng_f.use_fused
    eng_f.set_recorded_stream(codes, u)
    s_fus, _ = eng_f.run_cycles(state, CYCLES)

    assert np.array_equal(np.asarray(s_scan.att), np.asarray(s_fus.att))
    assert np.array_equal(np.asarray(s_scan.acc), np.asarray(s_fus.acc))
    assert np.array_equal(np.asarray(s_scan.ls), np.asarray(s_fus.ls))
    np.testing.assert_allclose(
        np.asarray(s_scan.r), np.asarray(s_fus.r), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(s_scan.mu), np.asarray(s_fus.mu), atol=1e-12
    )
    # and the fused kernel's chain equals the independent numpy chain
    assert int(np.asarray(s_fus.acc)[TRANS, 0]) == chain.acc[TRANS]
