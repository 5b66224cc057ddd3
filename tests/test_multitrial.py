"""Multi-trial cell-engine sub-step (cell_trials > 1).

The anchored-window multi-trial sub-step (CellEngine._substep_multi)
amortises one coverage-stencil fetch over T Metropolis trials by
precomputing the mover's local energy at all P = T+1 points.  Pinned
here:

* the P-point energy table is consistent with the validated
  two-point evaluation: e(t) - e(0) from mover_point_energies equals
  e_new - e_old from mover_energies for every candidate point;
* the fused MoverPointsPallas kernel reproduces the XLA table and
  own moments (fp64 interpret mode, summation-order tolerance);
* a full multi-trial sub-step keeps the incremental energy, moments
  and mu EXACTLY consistent with from-scratch recomputes;
* cell_pallas='apply' and the XLA path make identical accept
  decisions and end in identical states;
* the points kernel passes the offline TPU (Mosaic) lowering gate.

Reference anchor: the per-trial semantics are those of
mc_water_translation + mc_update_wl_bins (mc_moves.F90:966-1213,
1597-1689); only the proposal law differs (documented in
_substep_multi's docstring and VALIDATION.md).
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mc_water_ls_mw_tpu.models.stacking import (
    correspondence_mismatch,
    stacking_switch_pair,
)
from mc_water_ls_mw_tpu.models.sw import MW
from mc_water_ls_mw_tpu.mcmc.bins import build_bin_grid
from mc_water_ls_mw_tpu.mcmc.config import RunParams
from mc_water_ls_mw_tpu.mcmc.cellengine import (
    CellEngine,
    init_cell_state,
)
from mc_water_ls_mw_tpu.ops.cells import (
    PK_ROWS,
    build_grid,
    cap_for_positions,
    choose_grid_shape,
)
from mc_water_ls_mw_tpu.ops.cell_energy import (
    mover_energies,
    mover_point_energies,
)
from mc_water_ls_mw_tpu.ops.cell_pallas import MoverPointsPallas
from mc_water_ls_mw_tpu.ops.dense import Moments


def _system(nx, ny, mlay, T):
    r0, H0 = stacking_switch_pair(nx, ny, mlay)
    N = r0.shape[1]
    mx, _ = correspondence_mismatch(r0, H0)
    shape = choose_grid_shape(H0, MW, mx)
    cg = build_grid(
        shape, cap_for_positions(r0, H0, shape), H0, MW, mx
    )
    W = 2
    prm = RunParams(
        nwater=N, num_lattices=2, n_walkers=W, dtype="float64",
        temperature=200.0, mu_min=-500.0, mu_max=500.0,
        mc_always_switch=True, allow_switch=True,
        mc_vol_prob=0.0, allow_vol=False, eq_mc_cycles=0,
        list_update_int=100000, latt_sync_int=100000,
        mpi_sync_int=100000, cell_trials=T,
    )
    grid = build_bin_grid(prm.nbins, prm.mu_min, prm.mu_max,
                          dtype=jnp.float64)
    st, eaux, caux = init_cell_state(prm, MW, r0, H0, grid, cg)
    return prm, grid, st, eaux, caux, cg


@pytest.fixture(scope="module")
def system():
    """Smallest switch pair the two-level grid supports (CF=75)."""
    return _system(12, 7, 18, T=3)


@pytest.fixture(scope="module")
def system_unique():
    """Production-shaped grid (CF=27, disjoint same-colour stencils)
    - the geometry cell_pallas='apply' requires."""
    return _system(14, 8, 18, T=2)


def _pack_lattice(st, cg, l):
    nfine, cap = cg.nfine, cg.cap
    W = st.r.shape[-1]
    rows = [np.asarray(f[l]).reshape(nfine, cap, W)
            for f in st.moments]
    rows += [np.asarray(st.r[l, a]).reshape(nfine, cap, W)
             for a in range(3)]
    rows.append(
        (np.asarray(st.slot2mol) >= 0)
        .astype(rows[0].dtype).reshape(nfine, cap, W)
    )
    return jnp.asarray(np.stack(rows, axis=1))


def _mover_setup(st, cg, W, seed=0):
    rng = np.random.default_rng(seed)
    K, cap = cg.cells_per_color, cg.cap
    col, b = 3, 1
    cells_c = np.asarray(cg.color_cells[col])
    fc = cg.block_cells[cells_c][:, b]
    cand = cg.full_cells[fc]
    off = cg.full_off[fc]
    s2m = np.asarray(st.slot2mol)
    occ = (s2m.reshape(cg.nfine, cap, W) >= 0).sum(axis=1)
    rank = np.zeros((K, W), dtype=np.int32)
    for k in range(K):
        for w in range(W):
            rank[k, w] = rng.integers(0, max(occ[fc[k], w], 1))
    mover_slot = fc[:, None] * cap + rank
    return rng, fc, cand, off, rank, mover_slot


def test_point_table_matches_pairwise_evaluation(system):
    """e(t) - e(0) from the P-point table == e_new - e_old from the
    validated old/new evaluation, for every candidate point; and the
    absolute energies match too (same world convention)."""
    prm, grid, st, eaux, caux, cg = system
    W, cap = prm.n_walkers, cg.cap
    rng, fc, cand, off, rank, mover_slot = _mover_setup(st, cg, W)

    l = 0
    r_l = np.asarray(st.r[l])
    p0 = np.stack([
        r_l[a][mover_slot, np.arange(W)[None, :]] for a in range(3)
    ])
    P = 4
    pts = np.stack(
        [p0] + [p0 + rng.normal(scale=0.3, size=p0.shape)
                for _ in range(P - 1)]
    )                                                  # [P,3,K,W]

    mom_l = Moments(*(f[l] for f in st.moments))
    e, owns, cs = mover_point_energies(
        st.r[l], mom_l, st.slot2mol >= 0, st.h[l],
        jnp.asarray(cand), jnp.asarray(off), cg.full_mask, cap,
        jnp.asarray(mover_slot), jnp.asarray(pts), MW,
    )
    for t in range(1, P):
        e_old_x, e_new_x, co, cn = mover_energies(
            st.r[l], mom_l, st.slot2mol >= 0, st.h[l],
            jnp.asarray(cand), jnp.asarray(off), cg.full_mask, cap,
            jnp.asarray(mover_slot), jnp.asarray(pts[0]),
            jnp.asarray(pts[t]), MW,
        )
        np.testing.assert_allclose(
            np.asarray(e[0]), np.asarray(e_old_x), atol=1e-11
        )
        np.testing.assert_allclose(
            np.asarray(e[t]), np.asarray(e_new_x), atol=1e-11
        )
        for a, b2 in zip(owns[t], cn.own):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b2), atol=1e-11
            )


def test_points_kernel_matches_xla(system):
    prm, grid, st, eaux, caux, cg = system
    W, cap = prm.n_walkers, cg.cap
    rng, fc, cand, off, rank, mover_slot = _mover_setup(st, cg, W)

    l = 0
    r_l = np.asarray(st.r[l])
    p0 = np.stack([
        r_l[a][mover_slot, np.arange(W)[None, :]] for a in range(3)
    ])
    P = 3
    pts = np.stack(
        [p0] + [p0 + rng.normal(scale=0.3, size=p0.shape)
                for _ in range(P - 1)]
    )

    mom_l = Moments(*(f[l] for f in st.moments))
    e_x, owns_x, _ = mover_point_energies(
        st.r[l], mom_l, st.slot2mol >= 0, st.h[l],
        jnp.asarray(cand), jnp.asarray(off), cg.full_mask, cap,
        jnp.asarray(mover_slot), jnp.asarray(pts), MW,
    )

    kern = MoverPointsPallas(MW, cg, n_points=P)
    e_p, owns_p = kern(
        _pack_lattice(st, cg, l), st.h[l], cand, off, fc,
        jnp.asarray(rank),
        jnp.moveaxis(jnp.asarray(pts), 0, 1),          # [3,P,K,W]
    )
    np.testing.assert_allclose(
        np.asarray(e_p), np.asarray(e_x), atol=1e-11
    )
    for t in range(P):
        for a, b2 in zip(owns_p[t], owns_x[t]):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b2), atol=1e-11
            )


def _run_substep(eng, st, cg, W, table_row=5, cycle=2):
    s = st._replace(cycle=jnp.asarray(1, jnp.int32))
    T = eng.T
    codes_kt = jnp.zeros(eng.K * T, dtype=jnp.int32)   # all TRANS
    sw_ok = jnp.ones(W, dtype=bool)
    tpm0 = jnp.zeros((cg.nslot, W), dtype=jnp.int32)
    n_u = 4 + 5 * T
    u = jax.vmap(
        lambda k: jax.random.uniform(
            jax.random.fold_in(k, cycle), (eng.K, n_u),
            dtype=s.r.dtype,
        ),
        out_axes=2,
    )(s.key)
    return jax.jit(
        lambda stt, e=eng: e._substep_canonical(
            stt, tpm0, e.fc_stack[table_row], e.cand_stack[table_row],
            e.off_stack[table_row], u, codes_kt, sw_ok,
        )
    )(s)


def test_multitrial_substep_exact(system):
    """After a T=3 sub-step, the incrementally tracked energies,
    moments and mu agree with from-scratch recomputes (the DEBUG
    oracle of mc_moves.F90:1094-1102), and the trial bookkeeping
    counts K*T translation attempts."""
    prm, grid, st, eaux, caux, cg = system
    W = prm.n_walkers
    eng = CellEngine(prm, MW, grid, eaux, cg, caux)
    assert eng.T == 3
    s2, tpm = _run_substep(eng, st, cg, W)

    att = np.asarray(s2.att)
    assert (att[0] == eng.K * eng.T).all()
    assert int(np.asarray(s2.acc)[0].sum()) > 0    # something moved
    assert int(np.asarray(tpm).sum()) == eng.K * eng.T * W

    e_full, mom = eng._full_both(s2, s2.r, s2.h)
    np.testing.assert_allclose(
        np.asarray(s2.energy), np.asarray(e_full), rtol=0, atol=1e-9
    )
    for fa, fb in zip(s2.moments, mom):
        np.testing.assert_allclose(
            np.asarray(fa), np.asarray(fb), rtol=0, atol=1e-9
        )
    mu_scr = eng._mu_scratch(s2.energy, s2.volume)
    np.testing.assert_allclose(
        np.asarray(s2.mu), np.asarray(mu_scr), rtol=0, atol=1e-8
    )
    # WL bookkeeping: histogram grew by one in-grid entry per
    # enabled healthy trial (non-uniform bin increments, so compare
    # counts via the attempt counter bound)
    assert float(np.asarray(s2.hist).sum()) > 0


def test_multitrial_molecules_stay_in_fine_cells(system):
    """The fine-cell wall holds for every accepted multi-trial
    composite move: post-sub-step positions still resolve to their
    stored fine cells (the invariant the static coverage tables rely
    on).  This ideal-crystal fixture has a set of exact boundary-tie
    molecules whose from-scratch cell differs from the stored binning
    ALREADY AT INIT (the wall simply freezes them: in_cell(point 0)
    is False, every trial auto-rejects); the sub-step must not create
    any NEW violation."""
    from mc_water_ls_mw_tpu.ops.cells import cell_of_frac
    from mc_water_ls_mw_tpu.ops.geometry import recip_matrix

    prm, grid, st, eaux, caux, cg = system
    W = prm.n_walkers
    eng = CellEngine(prm, MW, grid, eaux, cg, caux)
    s2, _ = _run_substep(eng, st, cg, W)

    def bad_set(s):
        rec = recip_matrix(s.h[0])
        out = []
        for w in range(W):
            slot = np.asarray(s.mol2slot[:, w])
            r1 = np.asarray(s.r[0][:, slot, w])           # [3,N]
            f1 = np.einsum("ba,bn->an", np.asarray(rec[..., w]),
                           r1) / (2 * np.pi)
            dmid = 0.5 * np.asarray(eng.cellaux.dfrac0)
            fmid = jnp.asarray(f1 - dmid)
            cid = np.asarray(cell_of_frac(
                cg, fmid, s.origin, level="fine"
            ))
            out.append(np.where(cid != slot // cg.cap)[0])
        return out

    before = bad_set(st)
    after = bad_set(s2)
    moved = np.asarray(st.r != s2.r).any()
    assert bool(moved)                     # something was accepted
    for w in range(W):
        np.testing.assert_array_equal(after[w], before[w])


@pytest.mark.slow
def test_multitrial_apply_matches_xla(system_unique):
    """cell_pallas='apply' vs the XLA path on the production-shaped
    CF=27 grid: identical accept decisions and final states."""
    prm, grid, st, eaux, caux, cg = system_unique
    W = prm.n_walkers
    out = []
    for flag in ("off", "apply"):
        prm_f = dataclasses.replace(prm, cell_pallas=flag)
        eng = CellEngine(prm_f, MW, grid, eaux, cg, caux)
        assert eng.use_cell_apply == (flag == "apply")
        assert eng.T == 2
        s2, tpm = _run_substep(eng, st, cg, W, table_row=3)
        out.append((s2, tpm))
    (a, tpa), (b, tpb) = out
    assert int(np.asarray(a.acc)[0].sum()) > 0
    np.testing.assert_array_equal(np.asarray(a.acc), np.asarray(b.acc))
    np.testing.assert_array_equal(np.asarray(a.att), np.asarray(b.att))
    np.testing.assert_array_equal(np.asarray(a.ls), np.asarray(b.ls))
    np.testing.assert_array_equal(np.asarray(tpa), np.asarray(tpb))
    np.testing.assert_array_equal(np.asarray(a.r), np.asarray(b.r))
    np.testing.assert_allclose(
        np.asarray(a.mu), np.asarray(b.mu), rtol=0, atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(a.energy), np.asarray(b.energy), rtol=0, atol=1e-10
    )
    for fa, fb in zip(a.moments, b.moments):
        np.testing.assert_allclose(
            np.asarray(fa), np.asarray(fb), rtol=0, atol=1e-10
        )
    np.testing.assert_allclose(
        np.asarray(a.hist), np.asarray(b.hist), rtol=0, atol=0
    )


@pytest.mark.slow
def test_multitrial_cycles_drift_free(system_unique):
    """Full cycles through _one_cycle (scan + rebin + WL + sync)
    with cell_trials=2 stay drift-free."""
    prm, grid, st, eaux, caux, cg = system_unique
    prm = dataclasses.replace(
        prm, list_update_int=2, mpi_sync_int=2,
    )
    eng = CellEngine(prm, MW, grid, eaux, cg, caux)
    s, _ = eng.run_cycles(st, 4)
    e_full, mom = eng._full_both(s, s.r, s.h)
    np.testing.assert_allclose(
        np.asarray(s.energy), np.asarray(e_full), rtol=0, atol=1e-9
    )
    assert int(np.asarray(s.occ_overflow).max()) == 0
    att = np.asarray(s.att)
    assert (att[0] > 0).all()


def test_multitrial_chain_matches_numpy_oracle(system):
    """Independent replay of one multi-trial sub-step in plain
    python/numpy: reconstruct the anchored-window proposals, the
    point energies (via the pinned mover_point_energies table), the
    eta lookups and the K x T Metropolis/switch chain with explicit
    loops, and require the engine's final mu / ls / energies /
    accepted positions to match move-for-move.  Exercises the
    uniform-slot layout, the per-lattice displacement mapping and the
    chain-order semantics independently of the lax.scan
    implementation."""
    prm, grid, st, eaux, caux, cg = system
    W, cap = prm.n_walkers, cg.cap
    eng = CellEngine(prm, MW, grid, eaux, cg, caux)
    T = eng.T
    P = T + 1
    K = eng.K
    row = 5
    cycle = 2

    s = st._replace(cycle=jnp.asarray(1, jnp.int32))
    n_u = 4 + 5 * T
    u = jax.vmap(
        lambda k: jax.random.uniform(
            jax.random.fold_in(k, cycle), (K, n_u), dtype=s.r.dtype,
        ),
        out_axes=2,
    )(s.key)
    s2, _ = _run_substep(eng, st, cg, W, table_row=row, cycle=cycle)

    # ---- numpy replay ------------------------------------------------
    un = np.asarray(u)                               # [K,n_u,W]
    fc = np.asarray(eng.fc_stack[row])
    cand = np.asarray(eng.cand_stack[row])
    off = np.asarray(eng.off_stack[row])
    s2m = np.asarray(st.slot2mol)                    # [nslot,W]
    occ_mol = s2m.reshape(cg.nfine, cap, W)[fc]      # [K,cap,W]
    occ = (occ_mol >= 0).sum(axis=1)                 # [K,W]
    rank = np.minimum((un[:, 0, :] * occ).astype(np.int64),
                      np.maximum(occ - 1, 0))
    mover_slot = fc[:, None] * cap + rank
    mover_mol = np.take_along_axis(
        occ_mol, rank[:, None, :], axis=1
    )[:, 0]
    has_mover = (occ > 0) & (mover_mol >= 0)

    r_np = np.asarray(st.r)                          # [L,3,nslot,W]
    iw = np.arange(W)[None, :]
    p_old = np.stack([
        np.stack([r_np[l, a][mover_slot, iw] for a in range(3)])
        for l in range(2)
    ])                                               # [L,3,K,W]

    mt = np.asarray(st.max_trans)                    # [W]
    anc = np.moveaxis(2.0 * un[:, 1:4, :] - 1.0, 1, 0)      # [3,K,W]
    b_t = np.transpose(
        (2.0 * un[:, 4:4 + 3 * T, :] - 1.0).reshape(K, T, 3, W),
        (1, 2, 0, 3),
    )                                                # [T,3,K,W]
    v = (anc[None] + b_t) * mt                       # [T,3,K,W]

    recip = np.asarray(st.recip)                     # [L,3,3,W]
    h_np = np.asarray(st.h)
    ls0 = np.asarray(st.ls)                          # [W]
    pts = np.empty((P, 2, 3, K, W))
    pts[0] = p_old
    for t in range(T):
        for w in range(W):
            A = recip[ls0[w], :, :, w]               # active recip
            sfrac = (A.T @ v[t, :, :, w]) / (2 * np.pi)
            for l in range(2):
                if l == ls0[w]:
                    d = v[t, :, :, w]
                else:
                    d = h_np[l, :, :, w] @ sfrac
                pts[t + 1, l, :, :, w] = p_old[l, :, :, w] + d

    # wall per point (mid frame, lattice-0 coords)
    dfrac0 = np.asarray(eng.cellaux.dfrac0)          # [3,N]
    dmid = 0.5 * dfrac0[:, np.maximum(mover_mol, 0)]  # [3,K,W]
    from mc_water_ls_mw_tpu.ops.cells import cell_of_frac
    in_cell = np.zeros((P, K, W), dtype=bool)
    for t in range(P):
        for w in range(W):
            f = (recip[0, :, :, w].T @ pts[t, 0, :, :, w]) \
                / (2 * np.pi) - dmid[:, :, w]
            cid = np.asarray(cell_of_frac(
                cg, jnp.asarray(f), st.origin, level="fine",
            ))
            in_cell[t, :, w] = cid == fc

    # point energies via the pinned table (per lattice)
    e = np.empty((2, P, K, W))
    for l in range(2):
        mom_l = Moments(*(f[l] for f in st.moments))
        el, _, _ = mover_point_energies(
            st.r[l], mom_l, st.slot2mol >= 0, st.h[l],
            jnp.asarray(cand), jnp.asarray(off), cg.full_mask, cap,
            jnp.asarray(mover_slot), jnp.asarray(pts[:, l]), MW,
        )
        e[l] = np.asarray(el)

    # PER-MOVE WL (plain schedule, fresh zero masters): the oracle
    # carries the evolving weight/histogram and evaluates eta against
    # the CURRENT curve before every trial, exactly like the engine
    from mc_water_ls_mw_tpu.mcmc.bins import mu_to_bin

    B_bins = grid.nbins
    weight_np = np.asarray(st.weight).copy()
    hist_np = np.asarray(st.hist).copy()
    f_np = np.asarray(st.f)
    bw = np.asarray(grid.binwidth)
    av_bw = float(grid.av_binwidth)

    def eta(mu_v):
        return np.asarray(eng._eta_from_weight(
            s, jnp.asarray(weight_np), jnp.asarray(mu_v)
        ))

    beta = prm.beta
    vol = np.asarray(st.volume)
    lv10 = np.log(vol[1] / vol[0])
    pterm = beta * prm.pressure * (vol[1] - vol[0])
    cmu = -pterm + prm.nwater * lv10
    sw_c = pterm - prm.nwater * lv10
    mu = np.asarray(st.mu).copy()
    ls = ls0.copy()
    energy = np.asarray(st.energy).copy()
    j_fin = np.zeros((K, W), dtype=int)
    n_acc = np.zeros(W, dtype=int)
    n_swacc = np.zeros(W, dtype=int)
    for k in range(K):
        j = np.zeros(W, dtype=int)
        for t in range(1, P):
            ecur = np.stack([e[l, j, k, np.arange(W)]
                             for l in range(2)])
            dE = e[:, t, k, :] - ecur                # [2,W]
            dmu = (dE[0] - dE[1]) * beta
            mu_new = mu + dmu
            diff = beta * dE[np.minimum(ls, 1), np.arange(W)] \
                + eta(mu_new) - eta(mu)
            ok = np.isfinite(diff) & np.isfinite(mu_new)
            gate = (in_cell[j, k, np.arange(W)]
                    & in_cell[t, k, :] & has_mover[k])
            accept = gate & ok & (
                un[k, 4 + 3 * T + (t - 1), :] < np.exp(-diff)
            )
            energy = np.where(accept[None], energy + dE, energy)
            mu = np.where(accept, mu_new, mu)
            j = np.where(accept, t, j)
            n_acc += accept
            # per-move WL update at the post-trial mu
            kb = np.asarray(mu_to_bin(grid, jnp.asarray(mu)))
            healthy = np.isfinite(energy).all(axis=0)
            upd = (has_mover[k] & healthy
                   & (kb >= 0) & (kb < B_bins))
            kc = np.clip(kb, 0, B_bins - 1)
            for w in range(W):
                if upd[w]:
                    incr = av_bw / bw[kc[w]]
                    hist_np[kc[w], w] += incr
                    weight_np[kc[w], w] += incr * f_np[w]
            # always-switch attempt after the trial
            de10 = beta * (energy[1] - energy[0])
            dsw = np.where(ls == 0, de10 + sw_c, -(de10 + sw_c))
            sw_acc = np.isfinite(dsw) & (
                un[k, 4 + 4 * T + (t - 1), :] < np.exp(-dsw)
            )
            ls = np.where(sw_acc, 1 - ls, ls)
            mu = np.where(sw_acc, cmu - de10, mu)
            n_swacc += sw_acc
        j_fin[k] = j

    np.testing.assert_allclose(np.asarray(s2.mu), mu, atol=1e-9)
    np.testing.assert_array_equal(np.asarray(s2.ls), ls)
    np.testing.assert_allclose(
        np.asarray(s2.energy), energy, atol=1e-10
    )
    np.testing.assert_array_equal(
        np.asarray(s2.acc[0]), n_acc
    )
    np.testing.assert_array_equal(
        np.asarray(s2.acc[2]), n_swacc
    )
    np.testing.assert_allclose(
        np.asarray(s2.hist), hist_np, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(s2.weight), weight_np, atol=1e-12
    )
    # accepted movers sit at their final points
    r2 = np.asarray(s2.r)
    for k in range(K):
        for w in range(W):
            want = pts[j_fin[k, w], :, :, k, w]
            got = np.stack([
                r2[l, :, mover_slot[k, w], w] for l in range(2)
            ])
            np.testing.assert_allclose(got, want, atol=1e-12)


def _assert_states_equal(a, b, tpa=None, tpb=None):
    np.testing.assert_array_equal(np.asarray(a.acc), np.asarray(b.acc))
    np.testing.assert_array_equal(np.asarray(a.att), np.asarray(b.att))
    np.testing.assert_array_equal(np.asarray(a.ls), np.asarray(b.ls))
    if tpa is not None:
        np.testing.assert_array_equal(np.asarray(tpa), np.asarray(tpb))
    np.testing.assert_array_equal(np.asarray(a.r), np.asarray(b.r))
    np.testing.assert_allclose(
        np.asarray(a.mu), np.asarray(b.mu), rtol=0, atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(a.energy), np.asarray(b.energy), rtol=0, atol=1e-10
    )
    for fa, fb in zip(a.moments, b.moments):
        np.testing.assert_allclose(
            np.asarray(fa), np.asarray(fb), rtol=0, atol=1e-10
        )
    np.testing.assert_allclose(
        np.asarray(a.hist), np.asarray(b.hist), rtol=0, atol=1e-11
    )
    np.testing.assert_allclose(
        np.asarray(a.weight), np.asarray(b.weight), rtol=0, atol=1e-11
    )


# >100s on this host (round-5 re-tier, VERDICT r4 weak #4)


@pytest.mark.slow


def test_chain_kernel_matches_xla_chain(system):
    """The fused chain+WL kernel (mcmc/chain_pallas.py, interpret
    mode) reproduces the XLA per-move chain bit-for-bit: identical
    accept decisions, states, WL weight/histogram slabs and
    counters."""
    prm, grid, st, eaux, caux, cg = system
    W = prm.n_walkers
    out = []
    for chain in ("off", "on"):
        prm_f = dataclasses.replace(
            prm, cell_pallas="off", cell_chain=chain
        )
        eng = CellEngine(prm_f, MW, grid, eaux, cg, caux)
        assert eng.use_chain_kernel == (chain == "on")
        s2, tpm = _run_substep(eng, st, cg, W)
        out.append((s2, tpm))
    (a, tpa), (b, tpb) = out
    assert int(np.asarray(a.acc)[0].sum()) > 0
    assert float(np.asarray(a.hist).sum()) > 0
    _assert_states_equal(a, b, tpa, tpb)


@pytest.mark.slow
def test_chain_kernel_full_stack_matches(system_unique):
    """All three multi-trial configurations agree on the production
    CF=27 grid: pure XLA, apply-kernel + XLA chain, and the fully
    fused points+apply+chain kernels (cell_chain auto-on)."""
    prm, grid, st, eaux, caux, cg = system_unique
    W = prm.n_walkers
    out = []
    for pallas, chain in (("off", "off"), ("apply", "off"),
                          ("apply", "auto")):
        prm_f = dataclasses.replace(
            prm, cell_pallas=pallas, cell_chain=chain
        )
        eng = CellEngine(prm_f, MW, grid, eaux, cg, caux)
        s2, tpm = _run_substep(eng, st, cg, W, table_row=3)
        out.append((s2, tpm))
    (a, tpa) = out[0]
    assert int(np.asarray(a.acc)[0].sum()) > 0
    for (b, tpb) in out[1:]:
        _assert_states_equal(a, b, tpa, tpb)


def test_chain_kernel_lowers_for_tpu(system):
    """Offline Mosaic lowering gate for the chain+WL kernel."""
    prm, grid, st, eaux, caux, cg = system
    from mc_water_ls_mw_tpu.mcmc.chain_pallas import (
        CF_ROWS,
        CI_ROWS,
        ChainWLPallas,
    )
    import contextlib

    @contextlib.contextmanager
    def x64_off():
        jax.config.update("jax_enable_x64", False)
        try:
            yield
        finally:
            jax.config.update("jax_enable_x64", True)

    f32 = jnp.float32
    B = grid.nbins
    K = cg.cells_per_color
    with x64_off():
        import dataclasses as dc
        prm32 = dc.replace(prm, dtype="float32")
        grid32 = build_bin_grid(prm.nbins, prm.mu_min, prm.mu_max,
                                dtype=f32)
        for W, T in ((512, 4), (128, 2)):
            P = T + 1
            kern = ChainWLPallas(prm32, grid32, K, T, 0.0)
            kern.interpret = False
            args = (
                jnp.zeros((K * T,), jnp.int32),
                jnp.zeros((2,), jnp.int32),
                jnp.zeros((CF_ROWS, W), f32),
                jnp.zeros((CI_ROWS, W), jnp.int32),
                jnp.zeros((B, W), f32), jnp.zeros((B, W), f32),
                jnp.zeros((B, W), f32), jnp.zeros((B, W), f32),
                jnp.zeros((B, W), f32),
                jnp.zeros((B, 1), f32), jnp.zeros((B, 1), f32),
                jnp.zeros((2 * K * P, W), f32),
                jnp.zeros((K * P, W), f32),
                jnp.zeros((K, W), f32),
                jnp.zeros((K * T, W), f32),
                jnp.zeros((K * T, W), f32),
            )
            exp = jax.export.export(
                jax.jit(kern._invoke), platforms=["tpu"]
            )(*args)
            assert len(exp.mlir_module_serialized) > 0


def test_points_kernel_lowers_for_tpu(system):
    """Offline Mosaic lowering gate for the multi-point kernel
    (block-tiling constraints are invisible to interpret mode)."""
    prm, grid, st, eaux, caux, cg = system
    K, CF, cap = cg.cells_per_color, cg.full_cells.shape[1], cg.cap
    f32 = jnp.float32
    import contextlib

    @contextlib.contextmanager
    def x64_off():
        jax.config.update("jax_enable_x64", False)
        try:
            yield
        finally:
            jax.config.update("jax_enable_x64", True)

    with x64_off():
        for W, P in ((512, 5), (128, 3), (64, 2)):
            kern = MoverPointsPallas(MW, cg, n_points=P)
            kern.interpret = False
            args = (
                jnp.zeros((K, CF), jnp.int32),
                jnp.zeros((K,), jnp.int32),
                jnp.zeros((K, W), jnp.int32),
                jnp.zeros((K * CF, 3, W), f32),
                jnp.zeros((3, P, K, W), f32),
                jnp.zeros((cg.nfine, PK_ROWS, cap, W), f32),
            )
            exp = jax.export.export(
                jax.jit(kern._invoke), platforms=["tpu"]
            )(*args)
            assert len(exp.mlir_module_serialized) > 0


# ----------------------------------------------------------------------
# T=1 through the chain+WL kernel (per-move WL everywhere the kernels
# run; the micro-batched XLA chain _chain_t1 remains only as the
# CPU/fallback path - VALIDATION section d)
# ----------------------------------------------------------------------

@pytest.fixture(scope="module")
def system_t1():
    return _system(12, 7, 18, T=1)


def test_chain_kernel_t1_matches_numpy_oracle(system_t1):
    """Move-for-move numpy replay of one T=1 sub-step run through the
    fused chain+WL kernel: the reference's direction x uniform-radius
    proposal (mc_water_translation, mc_moves.F90:1021-1039), the
    two-endpoint fine-cell wall, PER-MOVE Wang-Landau at the
    post-trial mu (mc_update_wl_bins cadence) and the always-switch
    attempt.  Pins that routing T=1 through the kernel preserves the
    T=1 proposal law and gives it the reference's exact WL cadence."""
    prm, grid, st, eaux, caux, cg = system_t1
    W, cap = prm.n_walkers, cg.cap
    prm_k = dataclasses.replace(
        prm, cell_pallas="off", cell_chain="on"
    )
    eng = CellEngine(prm_k, MW, grid, eaux, cg, caux)
    assert eng.T == 1 and eng.use_chain_kernel
    K = eng.K
    row, cycle = 5, 2

    s = st._replace(cycle=jnp.asarray(1, jnp.int32))
    n_u = 4 + 5 * 1
    u = jax.vmap(
        lambda k: jax.random.uniform(
            jax.random.fold_in(k, cycle), (K, n_u), dtype=s.r.dtype,
        ),
        out_axes=2,
    )(s.key)
    s2, _ = _run_substep(eng, st, cg, W, table_row=row, cycle=cycle)

    # ---- numpy replay ------------------------------------------------
    un = np.asarray(u)                               # [K,n_u,W]
    fc = np.asarray(eng.fc_stack[row])
    cand = np.asarray(eng.cand_stack[row])
    off = np.asarray(eng.off_stack[row])
    s2m = np.asarray(st.slot2mol)
    occ_mol = s2m.reshape(cg.nfine, cap, W)[fc]
    occ = (occ_mol >= 0).sum(axis=1)
    rank = np.minimum((un[:, 0, :] * occ).astype(np.int64),
                      np.maximum(occ - 1, 0))
    mover_slot = fc[:, None] * cap + rank
    mover_mol = np.take_along_axis(
        occ_mol, rank[:, None, :], axis=1
    )[:, 0]
    has_mover = (occ > 0) & (mover_mol >= 0)

    r_np = np.asarray(st.r)
    iw = np.arange(W)[None, :]
    p_old = np.stack([
        np.stack([r_np[l, a][mover_slot, iw] for a in range(3)])
        for l in range(2)
    ])                                               # [L,3,K,W]

    # reference T=1 proposal: direction x U(-1,1)*max_trans
    mt = np.asarray(st.max_trans)
    d = 2.0 * un[:, 1:4, :] - 1.0                    # [K,3,W]
    d = np.moveaxis(d, 1, 0)                         # [3,K,W]
    inv_norm = 1.0 / np.sqrt(
        np.maximum((d * d).sum(axis=0), 1e-30)
    )
    rmag = (2.0 * un[:, 4, :] - 1.0) * mt * inv_norm
    v = d * rmag                                     # [3,K,W]

    recip = np.asarray(st.recip)
    h_np = np.asarray(st.h)
    ls0 = np.asarray(st.ls)
    p_new = np.empty_like(p_old)
    for w in range(W):
        A = recip[ls0[w], :, :, w]
        sfrac = (A.T @ v[:, :, w]) / (2 * np.pi)
        for l in range(2):
            dl = v[:, :, w] if l == ls0[w] else h_np[l, :, :, w] @ sfrac
            p_new[l, :, :, w] = p_old[l, :, :, w] + dl

    # two-endpoint fine-cell wall (mid frame, lattice-0 coords)
    dfrac0 = np.asarray(eng.cellaux.dfrac0)
    dmid = 0.5 * dfrac0[:, np.maximum(mover_mol, 0)]
    from mc_water_ls_mw_tpu.ops.cells import cell_of_frac
    in_cell = np.ones((K, W), dtype=bool)
    for w in range(W):
        for p in (p_old, p_new):
            f = (recip[0, :, :, w].T @ p[0, :, :, w]) \
                / (2 * np.pi) - dmid[:, :, w]
            cid = np.asarray(cell_of_frac(
                cg, jnp.asarray(f), st.origin, level="fine",
            ))
            in_cell[:, w] &= cid == fc

    # old/new energies via the pinned two-point evaluation
    e = np.empty((2, 2, K, W))                       # [L,point,K,W]
    for l in range(2):
        mom_l = Moments(*(f[l] for f in st.moments))
        eo, en_, _, _ = mover_energies(
            st.r[l], mom_l, st.slot2mol >= 0, st.h[l],
            jnp.asarray(cand), jnp.asarray(off), cg.full_mask, cap,
            jnp.asarray(mover_slot), jnp.asarray(p_old[l]),
            jnp.asarray(p_new[l]), MW,
        )
        e[l, 0] = np.asarray(eo)
        e[l, 1] = np.asarray(en_)

    from mc_water_ls_mw_tpu.mcmc.bins import mu_to_bin

    B_bins = grid.nbins
    weight_np = np.asarray(st.weight).copy()
    hist_np = np.asarray(st.hist).copy()
    f_np = np.asarray(st.f)
    bw = np.asarray(grid.binwidth)
    av_bw = float(grid.av_binwidth)

    def eta(mu_v):
        return np.asarray(eng._eta_from_weight(
            s, jnp.asarray(weight_np), jnp.asarray(mu_v)
        ))

    beta = prm.beta
    vol = np.asarray(st.volume)
    lv10 = np.log(vol[1] / vol[0])
    pterm = beta * prm.pressure * (vol[1] - vol[0])
    cmu = -pterm + prm.nwater * lv10
    sw_c = pterm - prm.nwater * lv10
    mu = np.asarray(st.mu).copy()
    ls = ls0.copy()
    energy = np.asarray(st.energy).copy()
    n_acc = np.zeros(W, dtype=int)
    n_swacc = np.zeros(W, dtype=int)
    for k in range(K):
        dE = e[:, 1, k, :] - e[:, 0, k, :]           # [2,W]
        dmu = (dE[0] - dE[1]) * beta
        mu_new = mu + dmu
        diff = beta * dE[np.minimum(ls, 1), np.arange(W)] \
            + eta(mu_new) - eta(mu)
        ok = np.isfinite(diff) & np.isfinite(mu_new)
        accept = (in_cell[k] & has_mover[k] & ok
                  & (un[k, 5, :] < np.exp(-diff)))
        energy = np.where(accept[None], energy + dE, energy)
        mu = np.where(accept, mu_new, mu)
        n_acc += accept
        # per-move WL at the post-trial mu (accept OR reject)
        kb = np.asarray(mu_to_bin(grid, jnp.asarray(mu)))
        healthy = np.isfinite(energy).all(axis=0)
        upd = has_mover[k] & healthy & (kb >= 0) & (kb < B_bins)
        kc = np.clip(kb, 0, B_bins - 1)
        for w in range(W):
            if upd[w]:
                incr = av_bw / bw[kc[w]]
                hist_np[kc[w], w] += incr
                weight_np[kc[w], w] += incr * f_np[w]
        # always-switch attempt
        de10 = beta * (energy[1] - energy[0])
        dsw = np.where(ls == 0, de10 + sw_c, -(de10 + sw_c))
        sw_acc = np.isfinite(dsw) & (un[k, 6, :] < np.exp(-dsw))
        ls = np.where(sw_acc, 1 - ls, ls)
        mu = np.where(sw_acc, cmu - de10, mu)
        n_swacc += sw_acc

    np.testing.assert_allclose(np.asarray(s2.mu), mu, atol=1e-9)
    np.testing.assert_array_equal(np.asarray(s2.ls), ls)
    np.testing.assert_allclose(
        np.asarray(s2.energy), energy, atol=1e-10
    )
    np.testing.assert_array_equal(np.asarray(s2.acc[0]), n_acc)
    np.testing.assert_array_equal(np.asarray(s2.acc[2]), n_swacc)
    np.testing.assert_allclose(
        np.asarray(s2.hist), hist_np, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(s2.weight), weight_np, atol=1e-12
    )
    assert int(n_acc.sum()) > 0


def test_chain_kernel_t1_samplerun_matches_xla(system_t1):
    """With FROZEN weights (samplerun) the micro-batched XLA T=1
    chain is exactly the serial chain, so the kernel and XLA paths
    must agree bit-for-bit - accept decisions, unbiased histogram,
    counters and final states."""
    prm, grid, st, eaux, caux, cg = system_t1
    W = prm.n_walkers
    out = []
    for chain in ("off", "on"):
        prm_f = dataclasses.replace(
            prm, cell_pallas="off", cell_chain=chain,
            samplerun=True,
        )
        eng = CellEngine(prm_f, MW, grid, eaux, cg, caux)
        assert eng.use_chain_kernel == (chain == "on")
        s2, tpm = _run_substep(eng, st, cg, W)
        out.append((s2, tpm))
    (a, tpa), (b, tpb) = out
    assert int(np.asarray(a.acc)[0].sum()) > 0
    _assert_states_equal(a, b, tpa, tpb)
    np.testing.assert_allclose(
        np.asarray(a.uhist), np.asarray(b.uhist), rtol=0, atol=1e-11
    )
