"""Anchored-window multi-trial on the DENSE fused table path
(dense_trials > 1; fused._do_translation_tbl_multi).

The proposal law and the extended-space exactness proof are the cell
engine's (cellengine._substep_multi; pinned there by the numpy chain
replay).  Here the dense implementation is pinned by:

* envelope validation (table mode + fused + two lattices + T | N);
* the DEBUG oracle: after multi-trial cycles the incrementally
  tracked energies/moments/mu agree with from-scratch recomputes
  (mc_moves.F90:1094-1102's check, run through audit_energy);
* a numpy per-move replay of one full multi-trial cycle: point
  energies from the pinned dense evaluator (local_energies_batch),
  uniforms/codes/schedule re-derived from the engine's own streams,
  the T-trial Metropolis + per-move WL + always-switch chain replayed
  with explicit loops and required to match mu / ls / energies /
  accept counters move-for-move.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mc_water_ls_mw_tpu.models.sw import MW
from mc_water_ls_mw_tpu.mcmc.engine import Engine, TRANS, SWITCH
from mc_water_ls_mw_tpu.mcmc.bins import mu_to_bin
from mc_water_ls_mw_tpu.ops.dense import local_energies_batch, Moments


def _setup(T, n_walkers=2, **over):
    import __graft_entry__ as g

    return g._setup(
        n_walkers=n_walkers, dtype="float64", nwater=216,
        dense_trials=T, fused="on", samplerun=False,
        mc_switch_prob=0.1, **over,
    )


def test_envelope_validation():
    import __graft_entry__ as g

    with pytest.raises(ValueError, match="table mode"):
        g._setup(n_walkers=2, dtype="float64", nwater=216,
                 dense_trials=2, fused="on", nbr_table="off")
    with pytest.raises(ValueError, match="fused"):
        g._setup(n_walkers=2, dtype="float64", nwater=216,
                 dense_trials=2, fused="off")
    with pytest.raises(ValueError, match="divide"):
        g._setup(n_walkers=2, dtype="float64", nwater=216,
                 dense_trials=5, fused="on")


@pytest.mark.slow
def test_multi_energy_consistency():
    """DEBUG oracle over 2 multi-trial cycles: drift-free energies,
    tracked mu == mu from scratch, trials-per-cycle stays nwater."""
    prm, eng, state = _setup(T=4)
    s, _ = eng.run_cycles(state, 2)
    s2, drift = eng.audit_energy(s)
    assert float(np.abs(np.asarray(drift)).max()) < 1e-10
    mu_scr = eng._mu_scratch(s.energy, s.volume)
    np.testing.assert_allclose(
        np.asarray(s.mu), np.asarray(mu_scr), rtol=0, atol=1e-8
    )
    att = np.asarray(s.att)
    # ~nwater trials/cycle (TRANS fraction of the shared schedule)
    assert att[0, 0] > 0 and att[0, 0] <= 2 * prm.nwater
    assert int(np.asarray(s.acc)[0].sum()) > 0
    # wall invariant: every molecule within the displacement wall
    f0 = np.asarray(eng.aux.frac0)
    r = np.asarray(s.r)
    h = np.asarray(s.h)
    for l in range(2):
        ref = np.einsum("abw,bn->anw", h[l], f0[l])
        d = r[l] - ref
        assert np.sqrt((d * d).sum(axis=0)).max() <= eng.wall + 1e-12


@pytest.mark.slow
def test_multi_numpy_chain_replay():
    """Full per-move numpy replay of one dense multi-trial cycle."""
    T = 2
    prm, eng, state = _setup(T=T, mc_vol_prob=0.0, allow_vol=False,
                             mpi_sync_int=10**6, latt_sync_int=10**6,
                             eq_mc_cycles=0)
    N, W = prm.nwater, prm.n_walkers
    n_steps = N // T
    s0 = state
    s1, _ = eng.run_cycles(state, 1)

    # ---- re-derive the engine's streams for cycle 1
    cycle = jnp.asarray(1, jnp.int32)
    ck = jax.random.fold_in(s0.shared_key, cycle)
    xi = np.asarray(jax.random.uniform(ck, (N,), dtype=jnp.float64))
    transP, volP, swP = eng.probs
    codes = np.where(xi < transP, 0,
                     np.where(xi < volP, 1, np.where(xi < swP, 2, 3)))
    mk = jax.random.fold_in(ck, 0x6d6f6c)
    sched = np.asarray(jax.random.randint(mk, (N,), 0, N,
                                          dtype=jnp.int32))[:n_steps]
    n_u = 4 + 5 * T
    u = np.asarray(jax.vmap(
        lambda k: jax.random.uniform(
            jax.random.fold_in(k, cycle), (n_steps, n_u),
            dtype=jnp.float64,
        ),
        out_axes=2,
    )(s0.key))                                   # [n_steps, n_u, W]

    # ---- replay
    r = np.asarray(s0.r).copy()                  # [L,3,N,W]
    mom = [np.asarray(f).copy() for f in s0.moments]
    energy = np.asarray(s0.energy).copy()
    mu = np.asarray(s0.mu).copy()
    ls = np.asarray(s0.ls).copy()
    weight = np.asarray(s0.weight).copy()
    hist = np.asarray(s0.hist).copy()
    f_wl = np.asarray(s0.f).copy()
    beta = prm.beta
    vol = np.asarray(s0.volume)
    n_acc = np.zeros(W, dtype=int)
    n_swacc = np.zeros(W, dtype=int)
    B = eng.grid.nbins
    bw = np.asarray(eng.grid.binwidth)
    av_bw = float(eng.grid.av_binwidth)
    f0 = np.asarray(eng.aux.frac0)               # [L,3,N]
    wall = eng.wall
    h_np = np.asarray(s0.h)
    recip = np.asarray(s0.recip)

    def eta(mu_v):
        st = s0._replace(weight=jnp.asarray(weight))
        return np.asarray(eng._eta(st, jnp.asarray(mu_v)))

    lv10 = np.log(vol[1] / vol[0])
    pterm = beta * prm.pressure * (vol[1] - vol[0])
    cmu = -pterm + prm.nwater * lv10
    sw_c = pterm - prm.nwater * lv10

    def point_energy(imol, p_t):
        """e(t) per lattice via the pinned dense evaluator."""
        out = []
        for l in range(2):
            mom_l = Moments(*(jnp.asarray(m[l]) for m in mom))
            eo, en, _ = local_energies_batch(
                jnp.asarray(r[l]), jnp.asarray(h_np[l]),
                jnp.full((W,), imol, jnp.int32),
                jnp.asarray(p_t[l]), mom_l, eng.fold_shifts, MW, True,
            )
            out.append((np.asarray(eo), np.asarray(en)))
        return out

    for step in range(n_steps):
        imol = int(sched[step])
        us = u[step]                              # [n_u, W]
        p0 = r[:, :, imol, :]                     # [L,3,W]
        anc = 2.0 * us[1:4] - 1.0                 # [3,W]
        mt = np.asarray(s0.max_trans)
        e_cur = None                              # filled by trial 1
        p_cur = p0.copy()
        accepted_any = np.zeros(W, dtype=bool)
        for t in range(T):
            code = codes[step * T + t]
            tt = code == 0
            swt = code == 2
            b_t = 2.0 * us[4 + 3 * t:7 + 3 * t] - 1.0
            v = (anc + b_t) * mt[None, :]         # [3,W] active
            # per-lattice displacement mapping
            p_t = np.empty_like(p0)
            for w in range(W):
                A = recip[ls[w], :, :, w]
                sfrac = (A.T @ v[:, w]) / (2 * np.pi)
                for l in range(2):
                    d = (v[:, w] if l == ls[w]
                         else h_np[l, :, :, w] @ sfrac)
                    p_t[l, :, w] = p0[l, :, w] + d
            pe = point_energy(imol, p_t)
            if e_cur is None:
                e_cur = np.stack([pe[l][0] for l in range(2)])
            e_t = np.stack([pe[l][1] for l in range(2)])
            # NOTE: pe[l][0] is the local energy at the CURRENT r
            # position of imol, i.e. e(point j) whenever the mover
            # has been moved to the accepted point - but the replay
            # keeps r at p0 until the end of the step, so track
            # e_cur explicitly instead
            dE = e_t - e_cur
            dmu = (dE[0] - dE[1]) * beta
            mu_new = mu + dmu
            eta_old = eta(mu)
            eta_new = eta(mu_new)
            dE_ls = dE[np.minimum(ls, 1), np.arange(W)]
            diff = beta * dE_ls + eta_new - eta_old
            ok = np.isfinite(diff) & np.isfinite(mu_new)
            # displacement wall on the candidate point
            in_wall = np.ones(W, dtype=bool)
            for l in range(2):
                ref = np.einsum("abw,b->aw", h_np[l], f0[l, :, imol])
                d = p_t[l] - ref
                in_wall &= (d * d).sum(axis=0) <= wall * wall
            accept = (tt & ok & in_wall
                      & (us[4 + 3 * T + t] < np.exp(-diff)))
            energy = np.where(accept[None], energy + dE, energy)
            mu = np.where(accept, mu_new, mu)
            n_acc += accept
            e_cur = np.where(accept[None], e_t, e_cur)
            p_cur = np.where(accept[None, None], p_t, p_cur)
            accepted_any |= accept
            # per-move WL at the post-trial mu
            kb = np.asarray(mu_to_bin(eng.grid, jnp.asarray(mu)))
            healthy = np.isfinite(energy).all(axis=0)
            upd = tt & healthy & (kb >= 0) & (kb < B)
            kc = np.clip(kb, 0, B - 1)
            for w in range(W):
                if upd[w]:
                    incr = av_bw / bw[kc[w]]
                    hist[kc[w], w] += incr
                    weight[kc[w], w] += incr * f_wl[w]
            # always-switch attempt
            sw_try = swt | (tt if prm.mc_always_switch else False)
            de10 = beta * (energy[1] - energy[0])
            dsw = np.where(ls == 0, de10 + sw_c, -(de10 + sw_c))
            sw_acc = sw_try & np.isfinite(dsw) & (
                us[4 + 4 * T + t] < np.exp(-dsw)
            )
            ls = np.where(sw_acc, 1 - ls, ls)
            mu = np.where(sw_acc, cmu - de10, mu)
            n_swacc += sw_acc
        # apply the final point; refresh moments from scratch is too
        # slow here - the replay only pins chain state, positions
        r[:, :, imol, :] = p_cur
        # keep the moment state consistent for later point_energy
        # calls: recompute the full dense moments for moved walkers
        if accepted_any.any():
            from mc_water_ls_mw_tpu.ops.dense import full_energy_dense

            for l in range(2):
                for w in range(W):
                    if accepted_any[w]:
                        _, mo = full_energy_dense(
                            jnp.asarray(r[l, :, :, w].T),
                            jnp.asarray(h_np[l, :, :, w]),
                            jnp.asarray(eng.aux.shifts), MW,
                        )
                        for fi in range(10):
                            mom[fi][l, :, w] = np.asarray(mo[fi])

    np.testing.assert_allclose(np.asarray(s1.mu), mu, atol=1e-8)
    np.testing.assert_array_equal(np.asarray(s1.ls), ls)
    np.testing.assert_allclose(
        np.asarray(s1.energy), energy, atol=1e-9
    )
    np.testing.assert_array_equal(np.asarray(s1.acc[0]), n_acc)
    np.testing.assert_array_equal(np.asarray(s1.acc[2]), n_swacc)
    np.testing.assert_allclose(
        np.asarray(s1.r), r, atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(s1.weight), weight, atol=1e-11
    )
    assert int(n_acc.sum()) > 0 and int(n_swacc.sum()) > 0
