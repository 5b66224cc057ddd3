"""Fused whole-cycle Pallas TPU kernel.

The scan-based engine path (engine._one_cycle) dispatches one XLA
program per trial move; every step round-trips the full walker state
(positions, moment tensors, WL arrays - tens of MB) through HBM, and
that traffic plus per-step fixed costs dominate the cycle time.  This
module fuses ALL nwater trial moves of a cycle (translations, switch
attempts and Wang-Landau updates - mc_cycle's hot loop,
mc_moves.F90:224-250) into ONE Pallas kernel whose per-walker state
stays resident in VMEM for the whole cycle:

* grid = blocks of WB walkers; each program advances its block through
  the entire cycle with a fori_loop over the nwater steps;
* all state (positions, moments, energies, WL weight/histogram slabs,
  counters) is copied HBM->VMEM once per cycle and written back once;
* per-walker "scalars" are packed into two small [rows, W] arrays
  (wf: float rows, wi: int rows) so the kernel has a bounded operand
  list and clean (sublane, lane) tiles;
* all gathers are expressed as one-hot mask contractions (molecule
  selection, eta / binwidth lookups) - the same gather-free discipline
  as ops/dense.py, which Mosaic vectorises at full VPU rate;
* the SW energy math is the identical moment-tensor formulation as
  ops/dense.py (shared helpers), with the image-shift axis unrolled in
  Python (S = 1-3 after MIC folding).

Rare events stay outside the kernel exactly as in the scan path:
volume moves (full-cell recompute, ~1/nwater of moves), delta-syncs,
chain resync, and all host-side IO (engine._one_cycle).

Statistical semantics are IDENTICAL to the scan path - both consume
the same pre-drawn uniforms (cycle_u) and shared move-type schedule
(codes), so the two paths produce bit-comparable chains up to
floating-point reduction order (pinned by tests/test_fused.py).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.sw import SWParams
from ..ops.dense import (
    Moments,
    _e3_closed_form,
    _leg,
    _mic_fold,
    _pair,
)
from ..ops.dsfloat import ds_value
from .bins import ETA_WALL, BinGrid, mu_to_bin
from .config import RunParams

# move-type codes - must match engine.py
TRANS, VOL, SWITCH, NOOP = 0, 1, 2, 3

# wf (float per-walker rows)
WF_MU, WF_F, WF_SUMHIST, WF_MIN_DMU, WF_MAX_DMU = 0, 1, 2, 3, 4
WF_MAX_TRANS, WF_MU_MIN, WF_MU_MAX = 5, 6, 7
WF_ROWS = 8
# wi (int per-walker rows)
WI_LS = 0
WI_ATT = 1            # rows 1..3: attempted trans/vol/switch
WI_ACC = 4            # rows 4..6: accepted
WI_START, WI_END, WI_INWIN, WI_INVT = 7, 8, 9, 10
WI_ROWS = 11

# flags (scalar-prefetch int rows)
FL_WL_ACTIVE, FL_SWITCH_OK, FL_CYCLE = 0, 1, 2


def _iota_eq(n, idx):
    """One-hot bool [n, W]: row index == idx ([W] int32)."""
    rows = lax.broadcasted_iota(jnp.int32, (n, idx.shape[0]), 0)
    return rows == idx[None, :]


def eta_lookup(grid: BinGrid, interp: bool, weight, mu, my_min,
               my_max, start_bin, end_bin, in_window, binw, mub,
               seeding: bool = True):
    """eta(mu) on a walker block via one-hot lookups - the in-kernel
    form of engine._eta / bins.eta_weight (mc_moves.F90:893-964),
    shared by the fused whole-cycle kernel and the cell engine's
    chain kernel (ops/chain_pallas.py).

    weight [B, W] TOTAL weight view; binw / mub [B, 1] bin widths and
    mid-bin mu values; window args per walker [W]."""
    B = grid.nbins
    dtype = weight.dtype
    k = jnp.clip(mu_to_bin(grid, mu), 0, B - 1)
    ohk = _iota_eq(B, k).astype(dtype)
    w_k = jnp.sum(ohk * weight, axis=0)
    if not interp:
        eta = w_k
    else:
        km = jnp.clip(k - 1, 0, B - 1)
        kp = jnp.clip(k + 1, 0, B - 1)
        ohm = _iota_eq(B, km).astype(dtype)
        ohp = _iota_eq(B, kp).astype(dtype)
        w_km = jnp.sum(ohm * weight, axis=0)
        w_kp = jnp.sum(ohp * weight, axis=0)
        bw_k = jnp.sum(ohk * binw, axis=0)
        bw_km = jnp.sum(ohm * binw, axis=0)
        bw_kp = jnp.sum(ohp * binw, axis=0)
        mub_k = jnp.sum(ohk * mub, axis=0)
        mub_km = jnp.sum(ohm * mub, axis=0)
        grad_up = 2.0 * (w_kp - w_k) / (bw_k + bw_kp)
        grad_dn = 2.0 * (w_k - w_km) / (bw_k + bw_km)
        eta_first = w_k + (mu - mub_k) * grad_up
        eta_last = w_k + (mu - mub_k) * grad_dn
        eta_mid_up = w_k + (mu - mub_k) * grad_up
        eta_mid_dn = w_km + (mu - mub_km) * grad_dn
        eta = jnp.where(
            k == start_bin,
            eta_first,
            jnp.where(
                k == end_bin,
                eta_last,
                jnp.where(mu > mub_k, eta_mid_up, eta_mid_dn),
            ),
        )
    wall = (mu < my_min) | (mu > my_max)
    walled = jnp.where(wall, ETA_WALL, eta)
    # pre-window walkers sample the wall-less global curve (window
    # seeding) or, with dd_seeding=False, no bias at all - the
    # reference's eta_weight:913 semantics (see engine._eta)
    pre = eta if seeding else jnp.zeros_like(eta)
    return jnp.where(in_window, walled, pre)


def wl_move_update(prm: RunParams, grid: BinGrid, samplerun: bool,
                   log_norm: float, wgt, basew, hist, baseh, uh,
                   eta_fn, binw, mu, f, sumhist, invt_on, cyc_f,
                   active, healthy):
    """Per-move WL update on VMEM refs - the in-kernel form of
    engine._wl_update (mc_update_wl_bins, mc_moves.F90:1597-1689),
    shared by the fused whole-cycle kernel and the cell engine's
    chain kernel.

    Mutates the ``hist`` / ``uh`` / ``wgt`` refs; returns the new
    (f, sumhist) rows for the caller to store.  ``eta_fn`` evaluates
    eta(mu) against the CURRENT weight view (samplerun only);
    ``active`` = move-performed & WL-live gate, ``healthy`` = the
    finite-state gate - kept separate because the Swetnam/1/t f
    updates follow ``active`` while histogram writes also require
    ``healthy`` (engine._wl_update semantics)."""
    B = grid.nbins
    dtype = f.dtype
    k = mu_to_bin(grid, mu)
    in_grid = (k >= 0) & (k < B)
    kc = jnp.clip(k, 0, B - 1)
    upd = (in_grid & active & healthy).astype(dtype)    # [W]
    ohk = _iota_eq(B, kc).astype(dtype)
    oh = ohk * upd[None, :]
    bw_kc = jnp.sum(ohk * binw, axis=0)
    incr = grid.av_binwidth / bw_kc                     # [W]

    hist[...] = hist[...] + oh * incr[None, :]

    if samplerun:
        # unbiased histogram, frozen weights (1625-1632); mask
        # BEFORE the exp (eta wall would poison via exp(1e30)*0),
        # and GATE walled entries out entirely: an f32 switch-accept
        # mu refresh near a dd window boundary can bin a marginally
        # out-of-wall mu into the window's edge bin, where a clamped
        # exp(60) increment poisons the per-window scale (see
        # engine._wl_update)
        eta_val = eta_fn(mu)
        unwalled = eta_val < 1e29
        arg = jnp.where((upd > 0) & unwalled, eta_val - log_norm,
                        -1.0)
        u_incr = jnp.where(
            unwalled, incr * jnp.exp(jnp.minimum(arg, 60.0)), 0.0
        )
        uh[...] = uh[...] + oh * u_incr[None, :]
        return f, sumhist

    if prm.wl_swetnam:
        # Swetnam RMS-flatness f (mc_moves.F90:1636-1653), from
        # the TOTAL histogram view (delta slab + master base)
        sumhist = sumhist + upd
        h_now = hist[...] + baseh[...]
        binfrac = binw / (prm.mu_max - prm.mu_min - 1.0)
        dev = (
            h_now * binw / jnp.maximum(sumhist, 1.0)[None, :]
            - binfrac
        )
        rms = jnp.sqrt(jnp.mean(dev * dev, axis=0))
        f_new = jnp.log(jnp.maximum(rms, 1e-300)) * prm.wl_alpha * B
        f_new = jnp.minimum(f_new, prm.wl_factor)
        f = jnp.where(active & (upd > 0), f_new, f)
    elif prm.wl_useinvt:
        # 1/t schedule once active (mc_moves.F90:1655-1658)
        f_invt = jnp.minimum(f, B / (cyc_f * prm.nwater))
        f = jnp.where(invt_on & active, f_invt, f)

    # min-shift deferred to the delta-sync (see engine._wl_update:
    # per-update shifting ratchets in f32)
    wgt[...] = wgt[...] + oh * (incr * f)[None, :]
    return f, sumhist


class FusedCycle:
    """One compiled whole-cycle kernel for a fixed (prm, model, grid).

    Call signature mirrors one engine scan block:
    ``s' = fused(s, codes, cycle_u, wl_active, switch_ok)``.
    """

    def __init__(self, prm: RunParams, model: SWParams, grid: BinGrid,
                 aux, fold_shifts, mesh=None):
        self.prm = prm
        self.model = model
        self.grid = grid
        # Under a multi-device mesh a bare pallas_call is not GSPMD-
        # partitionable (it would be replicated with all-gathered
        # operands); wrap it in shard_map over the walker axis instead.
        self.mesh = mesh if (mesh is not None and mesh.size > 1) else None
        self.shifts = [tuple(int(x) for x in sh)
                       for sh in np.asarray(fold_shifts)]
        self.ref_enth = tuple(float(x)
                              for x in np.asarray(aux.ref_enthalpy))
        self.log_norm = float(aux.log_unbiased_norm)
        # interpret mode makes the kernel runnable (slowly) on CPU -
        # used by the equivalence tests
        self.interpret = jax.default_backend() == "cpu"
        self._samplerun = prm.samplerun and prm.num_lattices == 2
        # delta-split WL layout (ops/dsfloat.py): the kernel needs the
        # read-only master-total base slabs for eta lookups (always,
        # with two lattices) and for the Swetnam flatness term
        self._need_bw = prm.num_lattices == 2
        self._need_bh = (
            prm.num_lattices == 2
            and prm.wl_swetnam
            and not prm.samplerun
        )
        # candidate-reduction table mode (ops/nbrtable.py)
        self.tbl = getattr(aux, "nbr_tbl", None)
        if self.tbl is not None:
            self.tbl_M = int(np.asarray(self.tbl).shape[-1])
            self.tbl_flat = np.asarray(self.tbl, np.int32).reshape(-1)
            self.frac0 = np.asarray(aux.frac0, np.float64)
            self.wall = float(aux.wall)
        # extra zeroed pad rows on the moments scratch absorb the
        # sentinel-index writes of table mode
        self.mom_pad = 8 if self.tbl is not None else 0
        # anchored-window multi-trial (dense_trials > 1): table mode
        # + two lattices only (Engine.__init__ validates)
        self.T = max(1, int(prm.dense_trials))
        if self.T > 1:
            assert self.tbl is not None and prm.num_lattices == 2

    # ------------------------------------------------------------------
    # kernel-side physics (mirrors ops/dense.py, S-axis unrolled)
    # ------------------------------------------------------------------

    def _cand(self, rx, ry, rz, Hc, one_i, p):
        """Dense candidates of the molecule at ``p`` for one walker
        block.  Returns (pair_sum [W], legs [(w,ux,uy,uz)] per shift,
        delta Moments [N,W], own Moments [W], e3i [W]).
        Mirror of ops/dense._candidates with the shift axis unrolled.
        """
        m = self.model
        px, py, pz = p
        ex = jnp.where(one_i, px[None, :], rx)
        ey = jnp.where(one_i, py[None, :], ry)
        ez = jnp.where(one_i, pz[None, :], rz)
        fx, fy, fz = _mic_fold(
            ex - px[None, :], ey - py[None, :], ez - pz[None, :], Hc
        )

        legs = []
        acc = {}

        def add(key, val):
            acc[key] = val if key not in acc else acc[key] + val

        pair_sum = None
        for sh in self.shifts:
            if sh == (0, 0, 0):
                dx, dy, dz = fx, fy, fz
                exclude_self = True    # null image: not self-interacting
            else:
                imx = sh[0] * Hc[0][0] + sh[1] * Hc[0][1] + sh[2] * Hc[0][2]
                imy = sh[0] * Hc[1][0] + sh[1] * Hc[1][1] + sh[2] * Hc[1][2]
                imz = sh[0] * Hc[2][0] + sh[1] * Hc[2][1] + sh[2] * Hc[2][2]
                dx = fx + imx[None, :]
                dy = fy + imy[None, :]
                dz = fz + imz[None, :]
                exclude_self = False
            r2 = dx * dx + dy * dy + dz * dz
            in_rc = r2 < m.rc2
            if exclude_self:
                in_rc = in_rc & ~one_i
            r2s = jnp.where(in_rc, r2, 1.0)
            inv = lax.rsqrt(r2s)
            rij = r2s * inv
            psum = jnp.sum(_pair(r2s, rij, in_rc, m), axis=0)
            pair_sum = psum if pair_sum is None else pair_sum + psum
            w = _leg(rij, in_rc, m)
            ux, uy, uz = dx * inv, dy * inv, dz * inv
            legs.append((w, ux, uy, uz))
            wux, wuy, wuz = w * ux, w * uy, w * uz
            add("s1", w)
            add("mx", wux)
            add("my", wuy)
            add("mz", wuz)
            add("mxx", wux * ux)
            add("myy", wuy * uy)
            add("mzz", wuz * uz)
            add("mxy", wux * uy)
            add("mxz", wux * uz)
            add("myz", wuy * uz)
            add("w2", w * w)

        # per-j delta: m* sign flipped (j's view), as in dense.py
        delta = Moments(
            acc["s1"], -acc["mx"], -acc["my"], -acc["mz"],
            acc["mxx"], acc["myy"], acc["mzz"],
            acc["mxy"], acc["mxz"], acc["myz"],
        )
        own = Moments(
            acc["s1"].sum(0), acc["mx"].sum(0), acc["my"].sum(0),
            acc["mz"].sum(0), acc["mxx"].sum(0), acc["myy"].sum(0),
            acc["mzz"].sum(0), acc["mxy"].sum(0), acc["mxz"].sum(0),
            acc["myz"].sum(0),
        )
        e3i = _e3_closed_form(own, acc["w2"].sum(0), m.cos0)
        return pair_sum, legs, delta, own, e3i

    def _jcent(self, legs, mm: Moments):
        """Wing-angle sums i-j-k (ops/dense._jcentred, S unrolled)."""
        c0 = self.model.cos0
        tot = None
        for (w, ux, uy, uz) in legs:
            quad = (
                ux * ux * mm.mxx + uy * uy * mm.myy + uz * uz * mm.mzz
                + 2.0 * (ux * uy * mm.mxy + ux * uz * mm.mxz
                         + uy * uz * mm.myz)
            )
            lin = ux * mm.mx + uy * mm.my + uz * mm.mz
            per = (
                quad + 2.0 * c0 * lin + c0 * c0 * mm.s1
                - (1.0 - c0) ** 2 * w
            )
            t = jnp.sum(w * per, axis=0)
            tot = t if tot is None else tot + t
        return tot

    def _local(self, rx, ry, rz, Hc, one_i, p_old, p_new, mom_l):
        """Old/new local energies + post-accept moments for one lattice
        (mirror of ops/dense.local_energies_batch)."""
        lam_eps = self.model.lam * self.model.epsilon
        pair_o, legs_o, del_o, _own_o, e3i_o = self._cand(
            rx, ry, rz, Hc, one_i, p_old
        )
        e3j_old = self._jcent(legs_o, mom_l)
        e_old = pair_o + lam_eps * (e3i_o + e3j_old)

        pair_n, legs_n, del_n, own_n, e3i_n = self._cand(
            rx, ry, rz, Hc, one_i, p_new
        )
        eff = Moments(*(
            jnp.where(one_i, ow[None, :], st - do + dn)
            for st, do, dn, ow in zip(mom_l, del_o, del_n, own_n)
        ))
        e3j_new = self._jcent(legs_n, eff)
        e_new = pair_n + lam_eps * (e3i_n + e3j_new)
        return e_old, e_new, eff

    # ------------------------------------------------------------------
    # kernel-side sampler pieces (mirror engine.py on refs)
    # ------------------------------------------------------------------

    def _mu_scratch_rows(self, e0, e1, v0, v1):
        prm = self.prm
        mu = e0 + prm.pressure * v0 - e1 - prm.pressure * v1
        if prm.leshift:
            mu = mu - self.ref_enth[0] + self.ref_enth[1]
        return mu * prm.beta - prm.nwater * jnp.log(v0 / v1)

    def _eta(self, weight, mu, my_min, my_max, start_bin, end_bin,
             in_window, binw, mub):
        """eta(mu) on a walker block (shared eta_lookup above)."""
        return eta_lookup(
            self.grid, self.prm.eta_interp, weight, mu, my_min,
            my_max, start_bin, end_bin, in_window, binw, mub,
            seeding=self.prm.dd_seeding,
        )

    def _eta_of(self, wgt, basew, wf, wi, mu, binw, mub):
        # TOTAL weight view: per-walker delta slab + the read-only
        # master base (delta-split layout, ops/dsfloat.py / engine
        # _weight_total).  Increments land on the small delta slab;
        # the base is frozen for the whole cycle (masters only move at
        # delta-syncs, which happen outside the kernel).
        return self._eta(
            wgt[...] + basew[...], mu, wf[WF_MU_MIN], wf[WF_MU_MAX],
            wi[WI_START], wi[WI_END], wi[WI_INWIN] != 0, binw, mub,
        )

    def _wl_update(self, e, wgt, basew, hist, baseh, uh, wf, wi, binw,
                   mub, wl_active, cyc_f, enabled):
        """Per-move WL update on refs (shared wl_move_update above;
        engine._wl_update / mc_update_wl_bins, mc_moves.F90:1597-1689)."""
        prm = self.prm
        if prm.num_lattices != 2:
            return
        mu = wf[WF_MU]
        active = enabled & wl_active                    # scalar
        # health gate (engine._wl_update): poisoned walkers must not
        # write into the shared WL arrays
        healthy = jnp.isfinite(e[0]) & jnp.isfinite(e[1])
        eta_fn = lambda m: self._eta_of(                # noqa: E731
            wgt, basew, wf, wi, m, binw, mub
        )
        f, sumh = wl_move_update(
            prm, self.grid, self._samplerun, self.log_norm,
            wgt, basew, hist, baseh, uh, eta_fn, binw,
            mu, wf[WF_F], wf[WF_SUMHIST], wi[WI_INVT] != 0, cyc_f,
            active, healthy,
        )
        if not self._samplerun and (prm.wl_swetnam or prm.wl_useinvt):
            wf[WF_F, :] = f
            if prm.wl_swetnam:
                wf[WF_SUMHIST, :] = sumh

    def _trial_vectors(self, ut, wf, wi, h, recip):
        """Per-step random displacement + per-lattice trial vectors
        (mc_moves.F90:1021-1067).  Returns (Hcs, transvec)."""
        d0 = 2.0 * ut[1] - 1.0
        d1 = 2.0 * ut[2] - 1.0
        d2 = 2.0 * ut[3] - 1.0
        inv_norm = lax.rsqrt(
            jnp.maximum(d0 * d0 + d1 * d1 + d2 * d2, 1e-30)
        )
        rmag = (2.0 * ut[4] - 1.0) * wf[WF_MAX_TRANS] * inv_norm
        v = (d0 * rmag, d1 * rmag, d2 * rmag)
        return self._map_disp(v, wi, h, recip)

    def _map_disp(self, v, wi, h, recip):
        """Map an active-lattice Cartesian displacement ``v`` (3 x
        [W]) to per-lattice trial vectors: the same FRACTIONAL
        displacement in the partner lattice
        (mc_moves.F90:1042-1067)."""
        prm = self.prm
        L = prm.num_lattices
        ls = wi[WI_LS]

        Hcs = [[[h[l, a, b] for b in range(3)] for a in range(3)]
               for l in range(L)]
        Rcs = [[[recip[l, a, b] for b in range(3)] for a in range(3)]
               for l in range(L)]
        if L == 2:
            recip_ls = [[jnp.where(ls == 0, Rcs[0][a][b], Rcs[1][a][b])
                         for b in range(3)] for a in range(3)]
        else:
            recip_ls = Rcs[0]
        inv2pi = 0.5 / np.pi
        # same fractional displacement in the partner lattice
        # (mc_moves.F90:1042-1067)
        sfrac = [
            sum(v[a] * recip_ls[a][b] for a in range(3)) * inv2pi
            for b in range(3)
        ]
        transvec = []
        for l in range(L):
            tv = [sum(Hcs[l][a][b] * sfrac[b] for b in range(3))
                  for a in range(3)]
            if L == 2:
                transvec.append(
                    [jnp.where(ls == l, v[a], tv[a]) for a in range(3)]
                )
            else:
                transvec.append(list(v))
        return Hcs, transvec

    def _trans_decision(self, vol, e, wgt, basew, wf, wi, binw, mub,
                        dE, ut, enabled, extra_ok=None, u_acc=None):
        """Acceptance rule of the translation move incl. the MINU
        variant (mc_moves.F90:1113-1146); shared between the dense and
        table paths.  Returns (accept, mu_new, dmu, ls_next)."""
        prm = self.prm
        L = prm.num_lattices
        ls = wi[WI_LS]
        mu = wf[WF_MU]

        if L == 2:
            dmu = (dE[0] - dE[1]) * prm.beta
            mu_new = mu + dmu                            # (1113)
            eta_old = self._eta_of(wgt, basew, wf, wi, mu, binw, mub)
            eta_new = self._eta_of(wgt, basew, wf, wi, mu_new, binw,
                                   mub)
            dE_ls = jnp.where(ls == 0, dE[0], dE[1])
            diffkT = prm.beta * dE_ls + eta_new - eta_old  # (1116)
        else:
            dmu = jnp.zeros_like(mu)
            mu_new = mu
            diffkT = prm.beta * dE[0]

        ls_next = ls
        if prm.minu and L == 2:
            # #ifdef MINU variant (mc_moves.F90:1119-1140)
            et = [e[l] + dE[l] for l in range(2)]
            enth = list(et)
            if prm.mc_ensemble == "npt":
                enth = [enth[l] + prm.pressure * vol[l] for l in range(2)]
            if prm.leshift:
                enth = [enth[l] - self.ref_enth[l] for l in range(2)]
            lsn = jnp.where(enth[1] < enth[0], 1, 0).astype(jnp.int32)
            E_lsn = jnp.where(lsn == 0, et[0], et[1])
            E_ls_old = jnp.where(ls == 0, e[0], e[1])
            alt = prm.beta * (E_lsn - E_ls_old) + eta_new - eta_old
            if prm.mc_ensemble == "npt":
                V_lsn = jnp.where(lsn == 0, vol[0], vol[1])
                V_ls = jnp.where(ls == 0, vol[0], vol[1])
                alt = (
                    alt + prm.beta * prm.pressure * (V_lsn - V_ls)
                    - prm.nwater * jnp.log(V_lsn / V_ls)
                )
            if prm.leshift:
                rh0, rh1 = self.ref_enth
                alt = alt - prm.beta * (
                    jnp.where(lsn == 0, rh0, rh1)
                    - jnp.where(ls == 0, rh0, rh1)
                )
            diffkT = jnp.where(lsn != ls, alt, diffkT)
            ls_next = lsn

        # finite-state guard (engine._translation): never accept a
        # move carrying non-finite deltas - a poisoned walker rejects
        # everything forever while pumping WL weight at its stale bin
        ok = jnp.isfinite(diffkT)
        if L == 2:
            ok = ok & jnp.isfinite(mu_new)
        if extra_ok is not None:
            ok = ok & extra_ok
        ua = ut[5] if u_acc is None else u_acc
        accept = enabled & ok & (ua < jnp.exp(-diffkT))     # (1146)
        return accept, mu_new, dmu, ls_next

    def _trans_bookkeeping(self, e, wgt, basew, hist, baseh, uh, wf,
                           wi, binw, mub, accept, mu_new, dmu, ls_next,
                           dE, enabled, wl_active, cyc_f):
        """Post-decision scalar-row updates + WL update, shared
        between the dense and table paths (mc_moves.F90:1113,
        1156-1159)."""
        prm = self.prm
        L = prm.num_lattices
        mu = wf[WF_MU]

        for l in range(L):
            # where-based update: rejected overlap proposals can carry
            # non-finite dE (engine.py NaN-poisoning note)
            e[l, :] = jnp.where(accept, e[l] + dE[l], e[l])
        wf[WF_MU, :] = jnp.where(accept, mu_new, mu)
        if prm.minu and L == 2:
            wi[WI_LS, :] = jnp.where(accept, ls_next, wi[WI_LS])

        # acceptance bookkeeping (mc_moves.F90:1156-1159)
        en_i = jnp.where(enabled, 1, 0).astype(jnp.int32)
        wi[WI_ATT + TRANS, :] = wi[WI_ATT + TRANS] + en_i
        wi[WI_ACC + TRANS, :] = (
            wi[WI_ACC + TRANS] + accept.astype(jnp.int32)
        )
        if L == 2:
            admu = jnp.abs(dmu)
            mn, mx = wf[WF_MIN_DMU], wf[WF_MAX_DMU]
            wf[WF_MIN_DMU, :] = jnp.where(
                accept & (admu < mn), admu, mn
            )
            wf[WF_MAX_DMU, :] = jnp.where(
                accept & (admu > mx), admu, mx
            )

        self._wl_update(
            e, wgt, basew, hist, baseh, uh, wf, wi, binw, mub,
            wl_active, cyc_f, enabled,
        )

    def _do_translation(self, h, recip, vol, r, mom, e, wgt, basew,
                        hist, baseh, uh, tpm, wf, wi, binw, mub, ut,
                        enabled, wl_active, cyc_f):
        """One masked translation step on refs (engine._translation;
        mc_water_translation, mc_moves.F90:966-1213)."""
        prm = self.prm
        L, N = prm.num_lattices, prm.nwater
        dtype = wf.dtype

        imol = jnp.minimum((ut[0] * N).astype(jnp.int32), N - 1)
        one_i = _iota_eq(N, imol)                        # [N,W] bool
        one_if = one_i.astype(dtype)

        Hcs, transvec = self._trial_vectors(ut, wf, wi, h, recip)

        e_olds, e_news, effs = [], [], []
        for l in range(L):
            rx, ry, rz = r[l, 0], r[l, 1], r[l, 2]
            p_old = (
                jnp.sum(one_if * rx, axis=0),
                jnp.sum(one_if * ry, axis=0),
                jnp.sum(one_if * rz, axis=0),
            )
            p_new = (
                p_old[0] + transvec[l][0],
                p_old[1] + transvec[l][1],
                p_old[2] + transvec[l][2],
            )
            mom_l = Moments(*(mom[fi, l] for fi in range(10)))
            eo, en_, eff = self._local(
                rx, ry, rz, Hcs[l], one_i, p_old, p_new, mom_l
            )
            e_olds.append(eo)
            e_news.append(en_)
            effs.append(eff)
        dE = [e_news[l] - e_olds[l] for l in range(L)]

        accept, mu_new, dmu, ls_next = self._trans_decision(
            vol, e, wgt, basew, wf, wi, binw, mub, dE, ut, enabled
        )
        acc_i = one_i & accept[None, :]

        for l in range(L):
            for a in range(3):
                cur = r[l, a]
                r[l, a] = jnp.where(
                    acc_i, cur + transvec[l][a][None, :], cur
                )
            for fi in range(10):
                mom[fi, l] = jnp.where(
                    accept[None, :], effs[l][fi], mom[fi, l]
                )
        tpm[...] = tpm[...] + jnp.where(
            enabled, one_i.astype(jnp.int32), 0
        )

        self._trans_bookkeeping(
            e, wgt, basew, hist, baseh, uh, wf, wi, binw, mub, accept,
            mu_new, dmu, ls_next, dE, enabled, wl_active, cyc_f,
        )

    # ------------------------------------------------------------------
    # table-mode translation (ops/nbrtable.py candidate reduction):
    # per-step work scales with the ~28 static reference-lattice
    # neighbours instead of all N molecules - the cost model of the
    # reference's Verlet-list kernel (molint.F90:220-404) restored
    # ------------------------------------------------------------------

    def _cand_tbl(self, cx, cy, cz, validf, Hc, p):
        """Candidate terms over gathered rows [M,W] (single MIC
        image; table mode requires a MIC-unique box).

        ``validf``: [M,1] 0/1 multiplier for the padded table slots
        (a float, not bool - Mosaic only broadcasts minor dims of
        32-bit types).  Invalid slots gather a CLAMPED real row, so
        their terms are computed then multiplied away; the r2 floor
        guards the one case where the clamped row is the centre
        itself (r2 = 0 -> rsqrt = inf, and inf * 0 = NaN)."""
        m = self.model
        px, py, pz = p
        dx, dy, dz = _mic_fold(
            cx - px[None, :], cy - py[None, :], cz - pz[None, :], Hc
        )
        r2 = dx * dx + dy * dy + dz * dz
        in_rc = (r2 < m.rc2) & (r2 > 1e-8)
        r2s = jnp.where(in_rc, r2, 1.0)
        inv = lax.rsqrt(r2s)
        rij = r2s * inv
        pair_sum = jnp.sum(
            _pair(r2s, rij, in_rc, m) * validf, axis=0
        )
        w = _leg(rij, in_rc, m) * validf
        ux, uy, uz = dx * inv, dy * inv, dz * inv
        wux, wuy, wuz = w * ux, w * uy, w * uz
        # per-candidate delta for partner j (m* sign from j's view)
        delta = Moments(
            w, -wux, -wuy, -wuz,
            wux * ux, wuy * uy, wuz * uz,
            wux * uy, wux * uz, wuy * uz,
        )
        own = Moments(
            w.sum(0), wux.sum(0), wuy.sum(0), wuz.sum(0),
            delta.mxx.sum(0), delta.myy.sum(0), delta.mzz.sum(0),
            delta.mxy.sum(0), delta.mxz.sum(0), delta.myz.sum(0),
        )
        e3i = _e3_closed_form(own, (w * w).sum(0), m.cos0)
        return pair_sum, (w, ux, uy, uz), delta, own, e3i

    def _jcent_rows(self, leg, mm: Moments):
        """Wing-angle sums i-j-k with candidate moments mm [M,W]."""
        c0 = self.model.cos0
        w, ux, uy, uz = leg
        quad = (
            ux * ux * mm.mxx + uy * uy * mm.myy + uz * uz * mm.mzz
            + 2.0 * (ux * uy * mm.mxy + ux * uz * mm.mxz
                     + uy * uz * mm.myz)
        )
        lin = ux * mm.mx + uy * mm.my + uz * mm.mz
        per = (
            quad + 2.0 * c0 * lin + c0 * c0 * mm.s1
            - (1.0 - c0) ** 2 * w
        )
        return jnp.sum(w * per, axis=0)

    def _local_tbl(self, cand_r, validf, Hc, p_old, p_new, mm_cand):
        """Old/new local energies from gathered candidates; returns
        (e_old, e_new, updated candidate moments [M,W], centre's own
        new moments [W])."""
        lam_eps = self.model.lam * self.model.epsilon
        cx, cy, cz = cand_r
        pair_o, leg_o, del_o, _own_o, e3i_o = self._cand_tbl(
            cx, cy, cz, validf, Hc, p_old
        )
        e3j_o = self._jcent_rows(leg_o, mm_cand)
        e_old = pair_o + lam_eps * (e3i_o + e3j_o)

        pair_n, leg_n, del_n, own_n, e3i_n = self._cand_tbl(
            cx, cy, cz, validf, Hc, p_new
        )
        mm_eff = Moments(*(
            st - do + dn
            for st, do, dn in zip(mm_cand, del_o, del_n)
        ))
        e3j_n = self._jcent_rows(leg_n, mm_eff)
        e_new = pair_n + lam_eps * (e3i_n + e3j_n)
        return e_old, e_new, mm_eff, own_n

    def _do_translation_tbl(self, h, recip, vol, r, mom, e, wgt, basew,
                            hist, baseh, uh, tpm, wf, wi, binw, mub,
                            ut, enabled, wl_active, cyc_f, imol, tbl,
                            frac0):
        """Table-mode translation: the moved molecule is the SHARED
        scalar ``imol`` (sched stream), its candidates the static
        table rows, and proposals beyond the displacement wall are
        rejected (ops/nbrtable.py)."""
        prm = self.prm
        L, N, M = prm.num_lattices, prm.nwater, self.tbl_M
        dtype = wf.dtype

        Hcs, transvec = self._trial_vectors(ut, wf, wi, h, recip)

        # candidate indices for this step (SMEM scalars); sentinel N
        # points at the zeroed pad row of the moments scratch
        idx = [
            [tbl[(l * N + imol) * M + m] for m in range(M)]
            for l in range(L)
        ]

        e_olds, e_news = [], []
        effs, owns, p_olds, p_news = [], [], [], []
        idx_a, cands = [], []
        in_wall = None
        for l in range(L):
            # all index arithmetic on the raw SMEM scalars (the scalar
            # core); validity as a 0/1 float column (Mosaic handles
            # neither bool scalars in vregs nor bool minor-dim
            # broadcasts)
            validf = jnp.stack(
                [(j < N).astype(jnp.int32) for j in idx[l]]
            ).astype(dtype)[:, None]                      # [M,1]
            idx_r = [jnp.minimum(j, N - 1) for j in idx[l]]
            idx_a.append(idx[l])

            p_old = tuple(
                r[l, a, pl.ds(imol, 1), :][0] for a in range(3)
            )
            p_new = tuple(
                p_old[a] + transvec[l][a] for a in range(3)
            )
            p_olds.append(p_old)
            p_news.append(p_new)

            cand_r = tuple(
                jnp.concatenate(
                    [r[l, a, pl.ds(idx_r[m], 1), :] for m in range(M)],
                    axis=0,
                )
                for a in range(3)
            )                                             # 3 x [M,W]
            mm_cand = Moments(*(
                jnp.concatenate(
                    [mom[fi, l, pl.ds(idx[l][m], 1), :]
                     for m in range(M)],
                    axis=0,
                )
                for fi in range(10)
            ))                                            # [M,W] fields

            eo, en_, mm_eff, own_n = self._local_tbl(
                cand_r, validf, Hcs[l], p_old, p_new, mm_cand
            )
            e_olds.append(eo)
            e_news.append(en_)
            effs.append(mm_eff)
            owns.append(own_n)
            cands.append(mm_cand)

            # displacement wall: reference site = H . frac0 (SMEM
            # scalars; reference positions keep their fractional
            # coordinates through volume moves, mc_volume:1284-1350)
            f0 = [frac0[(l * 3 + a) * N + imol] for a in range(3)]
            dw2 = None
            for a in range(3):
                ref_a = sum(Hcs[l][a][b] * f0[b] for b in range(3))
                da = p_new[a] - ref_a
                dw2 = da * da if dw2 is None else dw2 + da * da
            ok_l = dw2 <= self.wall * self.wall
            in_wall = ok_l if in_wall is None else (in_wall & ok_l)

        dE = [e_news[l] - e_olds[l] for l in range(L)]

        accept, mu_new, dmu, ls_next = self._trans_decision(
            vol, e, wgt, basew, wf, wi, binw, mub, dE, ut, enabled,
            extra_ok=in_wall,
        )

        for l in range(L):
            # centre's position + own moments (single-row stores)
            for a in range(3):
                r[l, a, pl.ds(imol, 1), :] = jnp.where(
                    accept, p_news[l][a], p_olds[l][a]
                )[None, :]
            cen = Moments(*(
                mom[fi, l, pl.ds(imol, 1), :][0] for fi in range(10)
            ))
            for fi in range(10):
                mom[fi, l, pl.ds(imol, 1), :] = jnp.where(
                    accept, owns[l][fi], cen[fi]
                )[None, :]
            # candidate moment rows: updated on accept, re-stored as
            # gathered otherwise; invalid entries write their (zero)
            # pad-row values back to the pad row - harmless.  Table
            # entries are unique per (lattice, molecule), so the M
            # stores touch M distinct rows
            for m in range(M):
                upd = accept & (idx_a[l][m] < N)    # scalar-core bool
                for fi in range(10):
                    mom[fi, l, pl.ds(idx_a[l][m], 1), :] = jnp.where(
                        upd, effs[l][fi][m], cands[l][fi][m]
                    )[None, :]

        tpm_cur = tpm[pl.ds(imol, 1), :]
        en_i = jnp.where(enabled, 1, 0).astype(jnp.int32)
        tpm[pl.ds(imol, 1), :] = tpm_cur + jnp.broadcast_to(
            en_i, tpm_cur.shape
        )

        self._trans_bookkeeping(
            e, wgt, basew, hist, baseh, uh, wf, wi, binw, mub, accept,
            mu_new, dmu, ls_next, dE, enabled, wl_active, cyc_f,
        )

    def _do_translation_tbl_multi(self, h, recip, vol, r, mom, e,
                                  wgt, basew, hist, baseh, uh, tpm,
                                  wf, wi, binw, mub, ut, codes, t0,
                                  wl_active, switch_ok, cyc_f, imol,
                                  tbl, frac0):
        """T = dense_trials anchored-window trials of ONE mover per
        candidate-row fetch: the multi-trial sub-step of the cell
        engine (cellengine._substep_multi - proposal law and the
        extended-space exactness proof live there) brought to the
        dense fused table path.  The mover's ~M candidate rows are
        gathered ONCE and stored ONCE, amortising the per-move
        row-granular fetch/store machinery that is ~88% of the dense
        budget (DESIGN.md 5d) T-fold; each trial pays only one extra
        point evaluation ((T+1)/T vs 2 per trial) plus [W]/[M, W]
        vector work.

        ``ut`` [4 + 5T, W] uniform slots: [1:4] anchor, [4:4+3T]
        candidates, [4+3T:4+4T] accept, [4+4T:4+5T] switch (slot 0
        reserved - the molecule comes from the shared schedule).
        ``codes`` is the scalar-prefetch trial-code array; trial t of
        this step reads codes[t0 + t].  Per-trial semantics (wall,
        acceptance incl. MINU, per-move WL, always-switch, counters)
        are shared with the single-trial path via _trans_decision /
        _trans_bookkeeping / _do_switch."""
        prm = self.prm
        L, N, M, T = prm.num_lattices, prm.nwater, self.tbl_M, self.T
        dtype = wf.dtype
        lam_eps = self.model.lam * self.model.epsilon

        Hcs = [[[h[l, a, b] for b in range(3)] for a in range(3)]
               for l in range(L)]

        # ---- one-time per-mover gather (the amortised 88%)
        idx = [
            [tbl[(l * N + imol) * M + m] for m in range(M)]
            for l in range(L)
        ]
        validfs, p0s, cand_rs, mm_cands = [], [], [], []
        del0s, e_cur, eff_cur, own_cur, p_cur = [], [], [], [], []
        refs = []
        for l in range(L):
            validf = jnp.stack(
                [(j < N).astype(jnp.int32) for j in idx[l]]
            ).astype(dtype)[:, None]                      # [M,1]
            idx_r = [jnp.minimum(j, N - 1) for j in idx[l]]
            p0 = tuple(
                r[l, a, pl.ds(imol, 1), :][0] for a in range(3)
            )
            cand_r = tuple(
                jnp.concatenate(
                    [r[l, a, pl.ds(idx_r[m], 1), :] for m in range(M)],
                    axis=0,
                )
                for a in range(3)
            )
            mm_cand = Moments(*(
                jnp.concatenate(
                    [mom[fi, l, pl.ds(idx[l][m], 1), :]
                     for m in range(M)],
                    axis=0,
                )
                for fi in range(10)
            ))
            # point-0 evaluation (e(0) = current local energy; the
            # chain's dE(j -> t) = e(t) - e(j) runs on the table)
            pair0, leg0, del0, _own0, e3i0 = self._cand_tbl(
                cand_r[0], cand_r[1], cand_r[2], validf, Hcs[l], p0
            )
            e3j0 = self._jcent_rows(leg0, mm_cand)
            e0 = pair0 + lam_eps * (e3i0 + e3j0)

            # displacement-wall reference site (SMEM scalars)
            f0 = [frac0[(l * 3 + a) * N + imol] for a in range(3)]
            refs.append(tuple(
                sum(Hcs[l][a][b] * f0[b] for b in range(3))
                for a in range(3)
            ))

            cen = Moments(*(
                mom[fi, l, pl.ds(imol, 1), :][0] for fi in range(10)
            ))
            validfs.append(validf)
            p0s.append(p0)
            cand_rs.append(cand_r)
            mm_cands.append(mm_cand)
            del0s.append(del0)
            e_cur.append(e0)
            eff_cur.append(list(mm_cand))       # running accepted rows
            own_cur.append(list(cen))           # running centre moments
            p_cur.append(list(p0))

        do_switch = prm.num_lattices == 2 and (
            prm.mc_always_switch or prm.allow_switch
        )
        W = wf.shape[-1]
        n_en = jnp.zeros((), jnp.int32)

        anc = tuple(2.0 * ut[1 + a] - 1.0 for a in range(3))
        for t in range(T):
            code = codes[t0 + t]
            tt = code == TRANS
            swt = code == SWITCH

            # anchored-window candidate: v_t = (a + b_t) * max_trans
            b_t = tuple(
                2.0 * ut[4 + 3 * t + a] - 1.0 for a in range(3)
            )
            v = tuple(
                (anc[a] + b_t[a]) * wf[WF_MAX_TRANS] for a in range(3)
            )
            _, transvec = self._map_disp(v, wi, h, recip)

            e_t, dE, in_wall = [], [], None
            eff_ts, own_ts, p_ts = [], [], []
            for l in range(L):
                p_t = tuple(
                    p0s[l][a] + transvec[l][a] for a in range(3)
                )
                pair_t, leg_t, del_t, own_t, e3i_t = (
                    self._cand_tbl(
                        cand_rs[l][0], cand_rs[l][1], cand_rs[l][2],
                        validfs[l], Hcs[l], p_t,
                    )
                )
                eff_t = [
                    st - d0 + dt for st, d0, dt in
                    zip(mm_cands[l], del0s[l], del_t)
                ]
                e3j_t = self._jcent_rows(leg_t, Moments(*eff_t))
                et = pair_t + lam_eps * (e3i_t + e3j_t)
                e_t.append(et)
                dE.append(et - e_cur[l])
                eff_ts.append(eff_t)
                own_ts.append(list(own_t))
                p_ts.append(p_t)
                # displacement wall on the candidate point
                dw2 = None
                for a in range(3):
                    da = p_t[a] - refs[l][a]
                    dw2 = da * da if dw2 is None else dw2 + da * da
                ok_l = dw2 <= self.wall * self.wall
                in_wall = ok_l if in_wall is None else (in_wall & ok_l)

            accept, mu_new, dmu, ls_next = self._trans_decision(
                vol, e, wgt, basew, wf, wi, binw, mub, dE,
                ut, tt, extra_ok=in_wall, u_acc=ut[4 + 3 * T + t],
            )
            self._trans_bookkeeping(
                e, wgt, basew, hist, baseh, uh, wf, wi, binw, mub,
                accept, mu_new, dmu, ls_next, dE, tt, wl_active,
                cyc_f,
            )
            n_en = n_en + jnp.where(tt, 1, 0).astype(jnp.int32)

            # fold the accepted point into the running selections
            for l in range(L):
                e_cur[l] = jnp.where(accept, e_t[l], e_cur[l])
                for a in range(3):
                    p_cur[l][a] = jnp.where(
                        accept, p_ts[l][a], p_cur[l][a]
                    )
                for fi in range(10):
                    eff_cur[l][fi] = jnp.where(
                        accept[None, :], eff_ts[l][fi],
                        eff_cur[l][fi],
                    )
                    own_cur[l][fi] = jnp.where(
                        accept, own_ts[l][fi], own_cur[l][fi]
                    )

            # always-switch attempt after every trial
            # (mc_always_switch, mc_cycle:243-249)
            if do_switch:
                sw_en = swt
                if prm.mc_always_switch:
                    sw_en = sw_en | tt
                self._do_switch(
                    vol, e, wf, wi, ut[4 + 4 * T + t],
                    switch_ok & sw_en,
                )

        # ---- one store per T trials (path-independent net update)
        for l in range(L):
            for a in range(3):
                r[l, a, pl.ds(imol, 1), :] = p_cur[l][a][None, :]
            for fi in range(10):
                mom[fi, l, pl.ds(imol, 1), :] = (
                    own_cur[l][fi][None, :]
                )
            for m in range(M):
                # invalid entries re-store their (zero) pad-row values
                # to the pad row - harmless, as in the single-trial
                # path
                for fi in range(10):
                    mom[fi, l, pl.ds(idx[l][m], 1), :] = (
                        eff_cur[l][fi][m][None, :]
                    )

        tpm_cur = tpm[pl.ds(imol, 1), :]
        tpm[pl.ds(imol, 1), :] = tpm_cur + jnp.broadcast_to(
            n_en, tpm_cur.shape
        )

    def _do_switch(self, vol, e, wf, wi, zeta, enabled):
        """Masked lattice switch on refs (engine._switch;
        mc_lattice_switch, mc_moves.F90:1536-1594)."""
        prm = self.prm
        ls = wi[WI_LS]
        e0, e1 = e[0], e[1]
        v0, v1 = vol[0], vol[1]
        E_ls = jnp.where(ls == 0, e0, e1)
        E_lsn = jnp.where(ls == 0, e1, e0)
        diffkT = prm.beta * (E_lsn - E_ls)
        if prm.mc_ensemble == "npt":
            V_ls = jnp.where(ls == 0, v0, v1)
            V_lsn = jnp.where(ls == 0, v1, v0)
            diffkT = (
                diffkT
                + prm.beta * prm.pressure * (V_lsn - V_ls)
                - prm.nwater * jnp.log(V_lsn / V_ls)
            )
        if prm.leshift:
            rh0, rh1 = self.ref_enth
            diffkT = diffkT - prm.beta * (
                jnp.where(ls == 0, rh1, rh0)
                - jnp.where(ls == 0, rh0, rh1)
            )
        accept = enabled & jnp.isfinite(diffkT) & (
            zeta < jnp.exp(-diffkT)
        )
        wi[WI_LS, :] = jnp.where(accept, 1 - ls, ls)
        mu_sc = self._mu_scratch_rows(e0, e1, v0, v1)
        wf[WF_MU, :] = jnp.where(accept, mu_sc, wf[WF_MU])
        en_i = jnp.where(enabled, 1, 0).astype(jnp.int32)
        wi[WI_ATT + SWITCH, :] = wi[WI_ATT + SWITCH] + en_i
        wi[WI_ACC + SWITCH, :] = (
            wi[WI_ACC + SWITCH] + accept.astype(jnp.int32)
        )

    # ------------------------------------------------------------------
    # the kernel body
    # ------------------------------------------------------------------

    def _kernel(self, *refs):
        prm = self.prm
        N = prm.nwater
        tblmode = self.tbl is not None
        n_rw = 7 if self._samplerun else 6   # r,mom,e,wgt,hist,(uh),tpm + wf,wi
        n_rw = n_rw + 2
        n_pre = 5 if tblmode else 2
        n_ro = 6 + int(self._need_bw) + int(self._need_bh)
        head, rest = refs[:n_pre + n_ro], refs[n_pre + n_ro:]
        if tblmode:
            codes, flags, sched, tblr, frac0r = head[:5]
        else:
            codes, flags = head[:2]
            sched = tblr = frac0r = None
        ro = head[n_pre:]
        h, recip, vol, u, binw_r, mub_r = ro[:6]
        basew = ro[6] if self._need_bw else None
        baseh = ro[7] if self._need_bh else None
        ins = rest[:n_rw]
        outs = rest[n_rw:2 * n_rw]
        mom_vmem, dma_sem = rest[2 * n_rw:]
        if self._samplerun:
            (r, mom_hbm_o, e, wgt, hist, uh, tpm, wf, wi) = outs
        else:
            (r, mom_hbm_o, e, wgt, hist, tpm, wf, wi) = outs
            uh = None

        # the moment-tensor slab is the largest state component
        # (10*L*N floats per walker); it stays HBM-resident (ANY
        # memory space, no double-buffered VMEM windows) and is DMA'd
        # into a single VMEM scratch here - at N=216 the blocked
        # version overflows the 16 MB VMEM budget
        WBl = mom_vmem.shape[-1]
        woff = pl.program_id(0) * WBl
        mom_in_dma = pltpu.make_async_copy(
            ins[1].at[:, :, :, pl.ds(woff, WBl)],
            mom_vmem.at[:, :, :N, :] if self.mom_pad else mom_vmem,
            dma_sem,
        )
        mom_in_dma.start()

        for k, (dst, src) in enumerate(zip(outs, ins)):
            if k != 1:
                dst[...] = src[...]
        mom_in_dma.wait()
        mom = mom_vmem
        if self.mom_pad:
            # zero the pad rows: sentinel-index gathers read them and
            # 0 * garbage = NaN would poison the wing sums
            mom[:, :, N:, :] = jnp.zeros(
                mom.shape[:2] + (self.mom_pad, WBl), mom.dtype
            )

        binw = binw_r[...]                               # [B,1]
        mub = mub_r[...]
        wl_active = flags[FL_WL_ACTIVE] != 0
        switch_ok = flags[FL_SWITCH_OK] != 0
        cyc_f = flags[FL_CYCLE].astype(wf.dtype)

        do_switch = prm.num_lattices == 2 and (
            prm.mc_always_switch or prm.allow_switch
        )

        if self.T > 1:
            # anchored-window multi-trial steps: T trials per mover,
            # one candidate-row fetch/store each (per-trial switch
            # attempts happen INSIDE the step)
            assert tblmode, "dense_trials > 1 requires table mode"

            def step(t, carry):
                self._do_translation_tbl_multi(
                    h, recip, vol, r, mom, e, wgt, basew, hist,
                    baseh, uh, tpm, wf, wi, binw, mub, u[t], codes,
                    t * self.T, wl_active, switch_ok, cyc_f,
                    sched[t], tblr, frac0r,
                )
                return carry

            lax.fori_loop(0, N // self.T, step, 0)
        else:
            def step(t, carry):
                code = codes[t]
                ut = u[t]                                # [RNG_SLOTS, W]
                if tblmode:
                    self._do_translation_tbl(
                        h, recip, vol, r, mom, e, wgt, basew, hist,
                        baseh, uh, tpm, wf, wi, binw, mub, ut,
                        code == TRANS, wl_active, cyc_f, sched[t],
                        tblr, frac0r,
                    )
                else:
                    self._do_translation(
                        h, recip, vol, r, mom, e, wgt, basew, hist,
                        baseh, uh, tpm, wf, wi, binw, mub, ut,
                        code == TRANS, wl_active, cyc_f,
                    )
                if do_switch:
                    sw_en = code == SWITCH
                    if prm.mc_always_switch:
                        sw_en = sw_en | (code == TRANS)
                    self._do_switch(
                        vol, e, wf, wi, ut[6], switch_ok & sw_en
                    )
                return carry

            lax.fori_loop(0, N, step, 0)

        mom_out_dma = pltpu.make_async_copy(
            mom_vmem.at[:, :, :N, :] if self.mom_pad else mom_vmem,
            mom_hbm_o.at[:, :, :, pl.ds(woff, WBl)], dma_sem
        )
        mom_out_dma.start()
        mom_out_dma.wait()

    # ------------------------------------------------------------------
    # host-side wrapper
    # ------------------------------------------------------------------

    @staticmethod
    def _pick_wb(W):
        import os
        env = os.environ.get("MWLS_FUSED_WB")
        if env:
            wb = int(env)
            if W % wb == 0:
                return wb
        # measured on v5e @ W=4096: WB=128 > 256 (23.4 vs 22.0 M
        # moves/s); 512 exceeds the 16 MB VMEM budget
        for wb in (128, 256):
            if W % wb == 0:
                return wb
        return W

    def __call__(self, s, codes, cycle_u, wl_active, switch_ok,
                 sched_mol=None):
        """Run one full cycle's translation/switch/WL steps.

        s:        SamplerState
        codes:    [N] int32 shared move-type schedule
        cycle_u:  [N, 7, W] pre-drawn uniforms (same as scan path)
        wl_active, switch_ok: traced bool scalars
        sched_mol: [N] int32 shared molecule schedule (table mode)
        """
        prm, grid = self.prm, self.grid
        L, _, N, W = s.r.shape
        B = grid.nbins
        dtype = s.r.dtype

        mom = jnp.stack(list(s.moments))                 # [10,L,N,W]
        wf = jnp.stack([
            s.mu, s.f, s.sumhist, s.min_dmu, s.max_dmu,
            s.max_trans, s.my_mu_min, s.my_mu_max,
        ])
        wi = jnp.stack([
            s.ls,
            s.att[0], s.att[1], s.att[2],
            s.acc[0], s.acc[1], s.acc[2],
            s.start_bin, s.end_bin,
            s.in_window.astype(jnp.int32),
            s.invt_active.astype(jnp.int32),
        ]).astype(jnp.int32)
        flags = jnp.stack([
            jnp.asarray(wl_active, jnp.int32),
            jnp.asarray(switch_ok, jnp.int32),
            s.cycle.astype(jnp.int32),
        ])
        binw = grid.binwidth.astype(dtype)[:, None]
        mub = grid.mu_bin.astype(dtype)[:, None]

        rw_ins = [s.r, mom, s.energy, s.weight, s.hist]
        if self._samplerun:
            rw_ins.append(s.uhist)
        rw_ins += [s.trans_per_mol, wf, wi]
        ro_ins = [s.h, s.recip, s.volume, cycle_u, binw, mub]
        if self._need_bw:
            # read-only master-total base slabs, gathered per walker
            # (delta-split WL layout; engine._weight_total)
            ro_ins.append(
                ds_value(s.master_eta)[s.window_id].T.astype(dtype)
            )
        if self._need_bh:
            ro_ins.append(
                ds_value(s.master_hist)[s.window_id].T.astype(dtype)
            )
        n_ro = len(ro_ins)

        tblmode = self.tbl is not None
        if tblmode:
            assert sched_mol is not None, "table mode needs sched_mol"
            prefetch = [
                sched_mol.astype(jnp.int32),
                jnp.asarray(self.tbl_flat),
                jnp.asarray(self.frac0.reshape(-1), dtype=dtype),
            ]
        else:
            prefetch = []
        n_pf = 2 + len(prefetch)

        def invoke(codes_i, flags_i, *arrs):
            """Build + run the pallas_call from the (possibly per-shard)
            operand shapes."""
            pf, arrs = arrs[:n_pf - 2], arrs[n_pf - 2:]
            ro, rw = arrs[:n_ro], arrs[n_ro:]
            Wl = rw[0].shape[-1]
            WBl = self._pick_wb(Wl)

            def wspec(arr):
                nd = arr.ndim
                blk = tuple(arr.shape[:-1]) + (WBl,)

                def imap(i, *_):
                    return (0,) * (nd - 1) + (i,)

                return pl.BlockSpec(blk, imap, memory_space=pltpu.VMEM)

            def cspec(arr):
                nd = arr.ndim

                def imap(i, *_):
                    return (0,) * nd

                return pl.BlockSpec(
                    tuple(arr.shape), imap, memory_space=pltpu.VMEM
                )

            def rwspec(k, arr):
                # the moments slab (rw index 1) stays HBM-resident;
                # the kernel DMAs its walker slice into VMEM scratch
                if k == 1:
                    return pl.BlockSpec(memory_space=pl.ANY)
                return wspec(arr)

            in_specs = (
                [wspec(a) for a in ro[:4]]
                + [cspec(ro[4]), cspec(ro[5])]
                + [wspec(a) for a in ro[6:]]   # base slabs [B,W]
                + [rwspec(k, a) for k, a in enumerate(rw)]
            )
            mom_arr = rw[1]
            mom_scr = (
                mom_arr.shape[:2]
                + (mom_arr.shape[2] + self.mom_pad, WBl)
            )
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=n_pf,
                grid=(Wl // WBl,),
                in_specs=in_specs,
                out_specs=[rwspec(k, a) for k, a in enumerate(rw)],
                scratch_shapes=[
                    pltpu.VMEM(mom_scr, mom_arr.dtype),
                    pltpu.SemaphoreType.DMA(()),
                ],
            )
            return pl.pallas_call(
                self._kernel,
                grid_spec=grid_spec,
                out_shape=[
                    jax.ShapeDtypeStruct(a.shape, a.dtype) for a in rw
                ],
                interpret=self.interpret,
            )(codes_i, flags_i, *pf, *ro, *rw)

        if self.mesh is not None:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            ax = self.mesh.axis_names[0]
            rep = P()

            def pspec(arr):
                return P(*((None,) * (arr.ndim - 1) + (ax,)))

            invoke = shard_map(
                invoke,
                mesh=self.mesh,
                in_specs=(
                    rep, rep,
                    *(rep for _ in prefetch),
                    *(pspec(a) for a in ro_ins[:4]), rep, rep,
                    *(pspec(a) for a in ro_ins[6:]),
                    *(pspec(a) for a in rw_ins),
                ),
                out_specs=tuple(pspec(a) for a in rw_ins),
                check_vma=False,
            )

        outs = invoke(
            codes.astype(jnp.int32), flags, *prefetch, *ro_ins, *rw_ins
        )

        if self._samplerun:
            r, mom_o, energy, weight, hist, uhist, tpm, wf_o, wi_o = outs
        else:
            r, mom_o, energy, weight, hist, tpm, wf_o, wi_o = outs
            uhist = s.uhist
        return s._replace(
            r=r,
            moments=Moments(*(mom_o[fi] for fi in range(10))),
            energy=energy,
            weight=weight,
            hist=hist,
            uhist=uhist,
            trans_per_mol=tpm,
            mu=wf_o[WF_MU],
            f=wf_o[WF_F],
            sumhist=wf_o[WF_SUMHIST],
            min_dmu=wf_o[WF_MIN_DMU],
            max_dmu=wf_o[WF_MAX_DMU],
            ls=wi_o[WI_LS],
            att=wi_o[WI_ATT:WI_ATT + 3],
            acc=wi_o[WI_ACC:WI_ACC + 3],
        )
