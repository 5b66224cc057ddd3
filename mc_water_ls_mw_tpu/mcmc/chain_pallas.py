"""Fused acceptance-chain + Wang-Landau kernel for the multi-trial
cell-engine sub-step.

The multi-trial sub-step (cellengine._substep_multi) precomputes the
mover local energies at all P = T+1 points, after which the K x T
sequential Metropolis trials are pure [W]-wide arithmetic plus
[B, W]-wide eta lookups and WL updates.  Running that chain as
unrolled XLA costs ~10 tiny fusions per trial at ~1.5 us dispatch
each plus a [K*T, B, W] one-hot WL batch - measured at ~half the
sub-step wall time once the stencil kernels are fused (DESIGN.md
5b).  This kernel runs the WHOLE chain for a walker block in one
Pallas program: the WL weight/histogram slabs live in VMEM for all
K*T trials and are written back once through input/output aliases.

Because the weight slab is VMEM-resident, WL weight increments are
applied PER MOVE, exactly like the reference (mc_update_wl_bins
after every trial, mc_moves.F90:1597-1689) and the dense engine -
i.e. the chain kernel REMOVES the cell engine's documented
micro-batched-WL approximation rather than fusing it.  The XLA
multi-trial chain (cellengine._substep_multi, cell_chain='off') uses
the same per-move semantics, so the two paths are bit-comparable.

Shared in-kernel pieces: eta_lookup / wl_move_update (mcmc/fused.py
- the same code the fused whole-cycle dense kernel executes).
Reference semantics per trial: mc_water_translation acceptance
(mc_moves.F90:1113-1146), always-switch (mc_lattice_switch,
:1536-1594), WL update (:1597-1689).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.dsfloat import _two_sum
from .bins import BinGrid
from .config import RunParams
from .fused import TRANS, SWITCH, eta_lookup, wl_move_update

# cf: float per-walker rows (aliased in/out; MU..MAX_DMU mutate,
# the rest are per-sub-step constants carried for locality)
CF_MU, CF_E0, CF_E1, CF_F, CF_SUMHIST = 0, 1, 2, 3, 4
CF_MIN_DMU, CF_MAX_DMU = 5, 6
CF_MU_MIN, CF_MU_MAX, CF_CMU, CF_SWC = 7, 8, 9, 10
CF_MINUC = 11
# compensated-energy residuals (CellState.energy_err): at N ~ 10^4
# the per-move dE equals ulp(total) in f32, so the chain two-sums
# every accepted dE into (E, E_err) instead of a plain add
CF_E0E, CF_E1E = 12, 13
CF_ROWS = 14
# ci: int per-walker rows (aliased; LS mutates)
CI_LS, CI_START, CI_END, CI_INWIN, CI_INVT = 0, 1, 2, 3, 4
CI_OCCOK, CI_SWOK = 5, 6
CI_ROWS = 7
# cnt: int output rows: attempted/accepted translations, attempted/
# accepted switches, then K per-mover translation-attempt counts
CN_EN, CN_ACC, CN_SWEN, CN_SWACC = 0, 1, 2, 3
CN_FIXED = 4
# flags (scalar-prefetch int32): WL-live gate, cycle number
FL_WL_ACTIVE, FL_CYCLE = 0, 1


class ChainWLPallas:
    """One fused chain+WL pass per (colour, fine-block) sub-step.

    __call__ signature documents the tensor layouts; K, T and the
    bin count are baked per instance.  fp64 interpret mode on CPU is
    the equivalence-test path (same as the other cell kernels).
    """

    def __init__(self, prm: RunParams, grid: BinGrid, K: int, T: int,
                 log_norm: float, mesh=None):
        assert prm.num_lattices == 2, (
            "the chain kernel implements the two-replica rule; "
            "single-lattice large-N runs use the XLA chain"
        )
        self.prm = prm
        self.grid = grid
        self.K = int(K)
        self.T = int(T)
        self.P = self.T + 1
        self.log_norm = float(log_norm)
        self.samplerun = bool(prm.samplerun)
        self.mesh = mesh if (mesh is not None and mesh.size > 1) else None
        self.interpret = jax.default_backend() == "cpu"

    # ------------------------------------------------------------------

    def _kernel(self, codes_r, flags_r, cf_ref, ci_ref, wgt, hist,
                uh, basew_ref, baseh_ref, binw_ref, mub_ref, e_ref,
                inc_ref, hasm_ref, ua_ref, uz_ref,
                cfo, cio, wgto, histo, uho, joh_ref, cnt_ref):
        prm, grid = self.prm, self.grid
        K, T, P = self.K, self.T, self.P
        dtype = cf_ref.dtype
        wl_active = flags_r[FL_WL_ACTIVE] != 0
        cyc_f = flags_r[FL_CYCLE].astype(dtype)

        # registers for the chain state
        mu = cf_ref[CF_MU]
        e0 = cf_ref[CF_E0]
        e1 = cf_ref[CF_E1]
        er0 = cf_ref[CF_E0E]
        er1 = cf_ref[CF_E1E]
        f = cf_ref[CF_F]
        sumh = cf_ref[CF_SUMHIST]
        min_dmu = cf_ref[CF_MIN_DMU]
        max_dmu = cf_ref[CF_MAX_DMU]
        mu_min = cf_ref[CF_MU_MIN]
        mu_max = cf_ref[CF_MU_MAX]
        cmu = cf_ref[CF_CMU]
        sw_c = cf_ref[CF_SWC]
        minu_c = cf_ref[CF_MINUC]
        ls = ci_ref[CI_LS]
        start_b = ci_ref[CI_START]
        end_b = ci_ref[CI_END]
        inwin = ci_ref[CI_INWIN] != 0
        invt_on = ci_ref[CI_INVT] != 0
        occ_ok = ci_ref[CI_OCCOK] != 0
        sw_ok = ci_ref[CI_SWOK] != 0
        binw = binw_ref[...]
        mub = mub_ref[...]

        # the aliased WL slabs: copy-through once; all trial updates
        # hit the output refs (VMEM-resident for the whole chain)
        wgto[...] = wgt[...]
        histo[...] = hist[...]
        uho[...] = uh[...]

        def eta_of(mu_v):
            return eta_lookup(
                grid, prm.eta_interp, wgto[...] + basew_ref[...],
                mu_v, mu_min, mu_max, start_b, end_b, inwin, binw,
                mub, seeding=prm.dd_seeding,
            )

        W = mu.shape[0]
        zero = jnp.zeros((W,), dtype=dtype)
        n_en = jnp.zeros((W,), dtype=jnp.int32)
        n_acc = jnp.zeros((W,), dtype=jnp.int32)
        n_swen = jnp.zeros((W,), dtype=jnp.int32)
        n_swacc = jnp.zeros((W,), dtype=jnp.int32)

        always_sw = prm.mc_always_switch
        allow_sw = prm.allow_switch

        for k in range(K):
            has_k = hasm_ref[k] > 0.5
            # per-mover accepted-point one-hot (rows over P points)
            j_rows = [jnp.full((W,), 1.0 if p == 0 else 0.0,
                               dtype=dtype) for p in range(P)]
            kt_en = jnp.zeros((W,), dtype=jnp.int32)
            for t in range(1, P):
                i = k * T + (t - 1)
                code = codes_r[i]
                tt = code == TRANS
                swt = code == SWITCH
                sw_try = (tt | swt) if always_sw else swt

                # dE(j -> t) = e(t) - e(current) via the point table
                ec0 = sum(j_rows[p] * e_ref[k * P + p]
                          for p in range(P))
                ec1 = sum(j_rows[p] * e_ref[(K + k) * P + p]
                          for p in range(P))
                dE0 = e_ref[k * P + t] - ec0
                dE1 = e_ref[(K + k) * P + t] - ec1
                in_cur = sum(j_rows[p] * inc_ref[k * P + p]
                             for p in range(P)) > 0.5
                gate = in_cur & (inc_ref[k * P + t] > 0.5)

                dmu = (dE0 - dE1) * prm.beta
                mu_new = mu + dmu
                eta_old = eta_of(mu)
                eta_new = eta_of(mu_new)
                dE_ls = jnp.where(ls == 0, dE0, dE1)
                diffkT = prm.beta * dE_ls + eta_new - eta_old
                if prm.minu:
                    # #ifdef MINU fold-in (mc_moves.F90:1119-1140;
                    # engine._translate convention): switch to the
                    # lower-enthalpy lattice as part of the move
                    en0 = e0 + er0 + dE0
                    en1 = e1 + er1 + dE1
                    g10 = prm.beta * (en1 - en0) + minu_c
                    lsn = jnp.where(g10 < 0.0, 1, 0)
                    E_lsn = jnp.where(lsn == 0, en0, en1)
                    E_cur = jnp.where(ls == 0, e0 + er0, e1 + er1)
                    sgn_c = jnp.where(ls == 0, sw_c, -sw_c)
                    alt = (
                        prm.beta * (E_lsn - E_cur)
                        + eta_new - eta_old + sgn_c
                    )
                    diffkT = jnp.where(lsn != ls, alt, diffkT)
                ok = jnp.isfinite(diffkT) & jnp.isfinite(mu_new)
                enabled = tt & has_k
                accept = (
                    enabled & gate & ok
                    & (ua_ref[i] < jnp.exp(-diffkT))
                )
                # compensated accumulation (CF_E0E/CF_E1E note)
                s0_, r0_ = _two_sum(e0, dE0)
                h0_, l0_ = _two_sum(s0_, er0 + r0_)
                e0 = jnp.where(accept, h0_, e0)
                er0 = jnp.where(accept, l0_, er0)
                s1_, r1_ = _two_sum(e1, dE1)
                h1_, l1_ = _two_sum(s1_, er1 + r1_)
                e1 = jnp.where(accept, h1_, e1)
                er1 = jnp.where(accept, l1_, er1)
                mu = jnp.where(accept, mu_new, mu)
                if prm.minu:
                    ls = jnp.where(accept, lsn, ls)
                j_rows = [
                    jnp.where(accept,
                              jnp.full((W,), 1.0 if p == t else 0.0,
                                       dtype=dtype),
                              j_rows[p])
                    for p in range(P)
                ]
                n_en = n_en + enabled.astype(jnp.int32)
                kt_en = kt_en + enabled.astype(jnp.int32)
                n_acc = n_acc + accept.astype(jnp.int32)
                admu = jnp.abs(dmu)
                min_dmu = jnp.minimum(
                    min_dmu,
                    jnp.where(accept, admu, jnp.inf),
                )
                max_dmu = jnp.maximum(
                    max_dmu, jnp.where(accept, admu, zero)
                )

                # per-move WL update at mu after the trial
                # (mc_update_wl_bins, mc_moves.F90:1597-1689); the
                # occ-overflow gate keeps corrupt walkers out of the
                # SHARED arrays (cellengine._wl_healthy)
                healthy = (
                    jnp.isfinite(e0) & jnp.isfinite(e1) & occ_ok
                )
                f, sumh = wl_move_update(
                    prm, grid, self.samplerun, self.log_norm,
                    wgto, basew_ref, histo, baseh_ref, uho,
                    eta_of, binw, mu, f, sumh, invt_on, cyc_f,
                    enabled & wl_active, healthy,
                )

                # always-switch attempt after the trial
                # (mc_lattice_switch, mc_moves.F90:1536-1594)
                if always_sw or allow_sw:
                    sw_en = sw_ok & sw_try
                    de10 = prm.beta * ((e1 - e0) + (er1 - er0))
                    dsw = jnp.where(
                        ls == 0, de10 + sw_c, -(de10 + sw_c)
                    )
                    sw_acc = sw_en & jnp.isfinite(dsw) & (
                        uz_ref[i] < jnp.exp(-dsw)
                    )
                    ls = jnp.where(sw_acc, 1 - ls, ls)
                    mu = jnp.where(sw_acc, cmu - de10, mu)
                    n_swen = n_swen + sw_en.astype(jnp.int32)
                    n_swacc = n_swacc + sw_acc.astype(jnp.int32)

            for p in range(P):
                joh_ref[k * P + p] = j_rows[p]
            cnt_ref[CN_FIXED + k] = kt_en

        cfo[...] = cf_ref[...]
        cfo[CF_MU] = mu
        cfo[CF_E0] = e0
        cfo[CF_E1] = e1
        cfo[CF_E0E] = er0
        cfo[CF_E1E] = er1
        cfo[CF_F] = f
        cfo[CF_SUMHIST] = sumh
        cfo[CF_MIN_DMU] = min_dmu
        cfo[CF_MAX_DMU] = max_dmu
        cio[...] = ci_ref[...]
        cio[CI_LS] = ls
        cnt_ref[CN_EN] = n_en
        cnt_ref[CN_ACC] = n_acc
        cnt_ref[CN_SWEN] = n_swen
        cnt_ref[CN_SWACC] = n_swacc

    # ------------------------------------------------------------------

    def _invoke(self, codes, flags, cf, ci, wgt, hist, uh, basew,
                baseh, binw, mub, e, inc, hasm, ua, uz):
        K, T, P = self.K, self.T, self.P
        B, Wl = wgt.shape
        dtype = wgt.dtype
        # the chain is [W]-cheap and [B,W]-bound; one lane-tile block
        # keeps VMEM modest while the grid covers the walker axis
        WB = 256 if Wl % 256 == 0 else (128 if Wl % 128 == 0 else Wl)

        def rows(r):
            def imap(wb, codes_r, flags_r):
                return (0, wb)
            return pl.BlockSpec((r, WB), imap,
                                memory_space=pltpu.VMEM)

        def colvec():
            def imap(wb, codes_r, flags_r):
                return (0, 0)
            return pl.BlockSpec((B, 1), imap,
                                memory_space=pltpu.VMEM)

        in_specs = [
            rows(CF_ROWS), rows(CI_ROWS), rows(B), rows(B), rows(B),
            rows(B), rows(B), colvec(), colvec(),
            rows(2 * K * P), rows(K * P), rows(K),
            rows(K * T), rows(K * T),
        ]
        out_specs = [
            rows(CF_ROWS), rows(CI_ROWS), rows(B), rows(B), rows(B),
            rows(K * P), rows(CN_FIXED + K),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((CF_ROWS, Wl), dtype),
            jax.ShapeDtypeStruct((CI_ROWS, Wl), jnp.int32),
            jax.ShapeDtypeStruct((B, Wl), dtype),
            jax.ShapeDtypeStruct((B, Wl), dtype),
            jax.ShapeDtypeStruct((B, Wl), dtype),
            jax.ShapeDtypeStruct((K * P, Wl), dtype),
            jax.ShapeDtypeStruct((CN_FIXED + K, Wl), jnp.int32),
        ]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(Wl // WB,),
            in_specs=in_specs,
            out_specs=out_specs,
        )
        # aliased state (indices count the scalar-prefetch args):
        # cf=2, ci=3, wgt=4, hist=5, uh=6 -> outputs 0..4
        out = pl.pallas_call(
            self._kernel,
            grid_spec=grid_spec,
            out_shape=out_shape,
            input_output_aliases={2: 0, 3: 1, 4: 2, 5: 3, 6: 4},
            interpret=self.interpret,
        )(codes, flags, cf, ci, wgt, hist, uh, basew, baseh, binw,
          mub, e, inc, hasm, ua, uz)
        return out

    # ------------------------------------------------------------------

    def __call__(self, codes, flags, cf, ci, wgt, hist, uh, basew,
                 baseh, binw, mub, e, inc, hasm, ua, uz):
        """Run the K x T chain for all walkers.

        codes [K*T] int32 move-type codes (trial (k,t) at k*T+t);
        flags [2] int32 (FL_* rows); cf [CF_ROWS, W] float rows;
        ci [CI_ROWS, W] int rows; wgt/hist/uh [B, W] per-walker WL
        delta slabs (aliased); basew/baseh [B, W] frozen master-total
        bases; binw/mub [B, 1]; e [2*K*P, W] point energies (lattice-
        major, then mover, then point); inc [K*P, W] in-cell flags
        (float 0/1); hasm [K, W]; ua/uz [K*T, W] accept uniforms.

        Returns (cf', ci', wgt', hist', uh', joh [K*P, W], cnt
        [4+K, W]).
        """
        args = (codes.astype(jnp.int32), flags.astype(jnp.int32),
                cf, ci, wgt, hist, uh, basew, baseh, binw, mub, e,
                inc, hasm, ua, uz)
        invoke = self._invoke
        if self.mesh is not None:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P_

            ax = self.mesh.axis_names[0]

            def wsp(arr):
                return P_(*((None,) * (arr.ndim - 1) + (ax,)))

            # binw/mub are replicated [B,1]; everything else is
            # walker-sharded on the last axis
            in_sp = (P_(None), P_(None),
                     *(wsp(a) for a in args[2:9]),
                     P_(None, None), P_(None, None),
                     *(wsp(a) for a in args[11:]))
            out_sp = tuple(wsp(jnp.zeros((2, 2))) for _ in range(7))
            invoke = shard_map(
                invoke, mesh=self.mesh, in_specs=in_sp,
                out_specs=out_sp, check_vma=False,
            )
        return invoke(*args)
