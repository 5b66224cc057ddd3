"""NPT volume wall (engine._volume, round 5).

Measured motivation: the N=8064 WL production's central mu-windows
evaporated (V ran to ~20·V0 — gas states give mu≈0 for free), so
`mc_vol_wall` restricts each replica's volume to a fractional window
around its reference lattice volume.  The wall must (a) never let an
inside walker leave, (b) ratchet an outside walker (pre-wall
checkpoint) back in, (c) leave zero-wall behaviour unchanged.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import __graft_entry__ as g


def _setup(wall, **kw):
    prm, eng, state = g._setup(
        n_walkers=4, dtype="float64", nwater=48,
        mpi_sync_int=10, mc_vol_prob=0.2, mc_switch_prob=0.0,
        mc_vol_wall=wall, samplerun=True, eq_mc_cycles=0,
        **kw,
    )
    return prm, eng, state


def _vref(eng):
    ref_h = np.asarray(eng.aux.ref_h, np.float64)
    return np.abs(np.linalg.det(ref_h.transpose(0, 2, 1)))


def test_wall_confines_volume():
    prm, eng, state = _setup(0.04)
    vref = _vref(eng)
    s, _ = eng.run_cycles(state, 40)
    v = np.asarray(s.volume, np.float64)           # [L,W]
    ratio = v / vref[:, None]
    att = float(np.asarray(s.att)[1].sum())
    assert att > 0, "no volume moves attempted"
    assert ratio.min() >= 0.96 - 1e-12
    assert ratio.max() <= 1.04 + 1e-12


def test_wall_ratchets_outside_walker_inward():
    prm, eng, state = _setup(0.04)
    vref = _vref(eng)
    # blow the box up 10% (outside the 4% wall), fixed fractional
    # coordinates — the loader-migration analogue of a pre-wall
    # checkpoint
    scale = 1.1 ** (1.0 / 3.0)
    state = state._replace(
        h=state.h * scale,
        r=state.r * scale,
        recip=state.recip / scale,
        volume=state.volume * 1.1,
    )
    state, _ = eng.audit_energy(state)
    d0 = np.abs(np.log(
        np.asarray(state.volume, np.float64) / vref[:, None]
    )).sum(0)
    s, _ = eng.run_cycles(state, 60)
    d1 = np.abs(np.log(
        np.asarray(s.volume, np.float64) / vref[:, None]
    )).sum(0)
    # strictly closer (or already inside) for every walker, and no
    # walker drifted further out
    assert (d1 <= d0 + 1e-12).all()
    assert d1.mean() < d0.mean()


def test_zero_wall_is_inert():
    prm, eng, state = _setup(0.0)
    s, _ = eng.run_cycles(state, 20)
    # volumes move freely (acceptance nonzero) — the knob off is the
    # pre-round-5 behaviour
    assert float(np.asarray(s.att)[1].sum()) > 0
