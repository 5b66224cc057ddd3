"""Pallas mover-energies kernel for the large-N cell engine.

The XLA sub-step path (ops/cell_energy.mover_energies) gathers
[K, CF*cap, W] candidate tensors from the HBM slabs and materialises
~30 intermediates of that size per sub-step (coords x3, mask, r2,
rsqrt, legs, 3 direction components, 10 gathered moment fields, 10
delta fields, all twice for the old/new evaluation points).  At
N=8064 / cap=32 / W=128 each such array is ~3.5 MB and a cycle runs
~10^3 sub-steps - the sub-step is HBM-bandwidth-bound (ROUNDLOG r1
item 2).

This kernel fuses the whole evaluation: grid = (walker-block, mover,
candidate-cell); each step DMAs one fine cell's PACKED slab block
[PK_ROWS, cap, WB] (10 moment rows + 3 coordinate rows + a validity
row - ops/cells.py PK_* layout) straight from the HBM-resident packed
slab at scalar-prefetched table indices, computes pair + three-body
terms for BOTH evaluation points in VMEM, writes the per-candidate
moment deltas (new - old, the only per-candidate data the accept path
needs), and accumulates the mover reductions (pair sums, own moments,
wing sums) in VMEM scratch.  The packed layout exists because the
sub-step is DMA-ISSUE-bound, not bandwidth-bound: 14 separate
[cap, WB] fetches per grid step cost ~14 descriptor issues where one
[PK_ROWS, cap, WB] fetch costs one.

Math is shared with ops/cell_energy.py (imported helpers); reference
semantics: compute_local_real_energy, molint.F90:220-404.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.sw import SWParams
from .cells import CellGrid, PK_ROWS, PK_R0, PK_VALID
from .dense import Moments, _e3_closed_form, _leg, _pair

# scratch row layout: [0] pair_old [1] pair_new [2] w2_old [3] w2_new
# [4] e3j_old [5] e3j_new [6:16] own_old [16:26] own_new
_NACC = 26
# red output rows: [0] e_old [1] e_new [2:12] own_new (pad to 16)
_NRED = 16


def _pick_wb(Wl: int, cap: int, rows: int = 51) -> int:
    """Walker-block width for the (walker-block, mover, candidate)
    grids.  The sub-step is DMA-ISSUE-bound (block fetches per grid
    step), so wider blocks amortise the per-descriptor cost
    ~linearly; take the widest 128-multiple that keeps the per-step
    working set (``rows`` [cap, wb] tiles: packed block + deltas +
    double-buffer + scratch) comfortably inside the ~16 MB VMEM."""
    for wb in (512, 384, 256, 128):
        if Wl % wb == 0 and rows * cap * wb * 4 * 2 <= 12 * 2 ** 20:
            return wb
    return 128 if Wl % 128 == 0 else Wl


class MoverEnergiesPallas:
    """Batch mover old/new local energies + moment deltas, fused.

    One lattice per call: see __call__.  Requires a coverage table
    with no padding entries (cg.full_mask all True - the builder
    guarantees this for the production grids; callers must gate).
    """

    def __init__(self, model: SWParams, cg: CellGrid, mesh=None,
                 with_deltas: bool = True):
        self.model = model
        self.nfine = cg.nfine
        self.cap = cg.cap
        self.CF = cg.full_cells.shape[1]
        assert bool(np.all(cg.full_mask)), (
            "MoverEnergiesPallas requires an unpadded coverage table"
        )
        # with_deltas=False drops the [10, K*CF, cap, W] per-candidate
        # delta output (the apply-stage kernel recomputes the deltas
        # in place instead - see MoverApplyPallas)
        self.with_deltas = with_deltas
        self.mesh = mesh if (mesh is not None and mesh.size > 1) else None
        self.interpret = jax.default_backend() == "cpu"

    # ------------------------------------------------------------------

    def _kernel(self, cand_ref, fc_ref, pk_ref, shift_ref, po_ref,
                pn_ref, rank_ref, *rest):
        if self.with_deltas:
            red_ref, d_ref, acc = rest
        else:
            red_ref, acc = rest
            d_ref = None
        m = self.model
        CF = self.CF
        lam_eps = m.lam * m.epsilon
        c0 = m.cos0
        k = pl.program_id(1)
        c = pl.program_id(2)

        @pl.when(c == 0)
        def _():
            acc[...] = jnp.zeros_like(acc)

        # packed slab block of the candidate fine cell
        # ([PK_ROWS, cap, WB]: 10 moment rows, xyz rows, valid row)
        sx = shift_ref[0, 0]
        sy = shift_ref[0, 1]
        sz = shift_ref[0, 2]
        cx = pk_ref[0, PK_R0 + 0] + sx[None, :]
        cy = pk_ref[0, PK_R0 + 1] + sy[None, :]
        cz = pk_ref[0, PK_R0 + 2] + sz[None, :]
        valid = pk_ref[0, PK_VALID] > 0.5

        # self exclusion: the mover's own slot appears exactly when
        # the candidate cell IS the mover's fine cell, at lane = rank
        is_self_cell = cand_ref[k, c] == fc_ref[k]
        rank_row = rank_ref[k]                               # [WB]
        iota_cap = lax.broadcasted_iota(jnp.int32, valid.shape, 0)
        self_m = (iota_cap == rank_row[None, :]) & is_self_cell
        mask = valid & jnp.logical_not(self_m)

        def eval_point(px, py, pz):
            dx = cx - px[None, :]
            dy = cy - py[None, :]
            dz = cz - pz[None, :]
            r2 = dx * dx + dy * dy + dz * dz
            in_rc = (r2 < m.rc2) & mask
            r2s = jnp.where(in_rc, r2, 1.0)
            inv = lax.rsqrt(r2s)
            rij = r2s * inv
            pair = _pair(r2s, rij, in_rc, m)
            w = _leg(rij, in_rc, m)
            ux, uy, uz = dx * inv, dy * inv, dz * inv
            wux, wuy, wuz = w * ux, w * uy, w * uz
            # own-moment contributions (mover's view) and per-slot
            # j-view deltas (ops/cell_energy._slab_candidates signs)
            own = (w, wux, wuy, wuz,
                   wux * ux, wuy * uy, wuz * uz,
                   wux * uy, wux * uz, wuy * uz)
            dlt = (w, -wux, -wuy, -wuz,
                   own[4], own[5], own[6], own[7], own[8], own[9])
            return pair, w, (ux, uy, uz), own, dlt

        po = (po_ref[0, k], po_ref[1, k], po_ref[2, k])
        pn = (pn_ref[0, k], pn_ref[1, k], pn_ref[2, k])
        pair_o, w_o, u_o, own_o, dlt_o = eval_point(*po)
        pair_n, w_n, u_n, own_n, dlt_n = eval_point(*pn)

        # wing (j-centred) sums against the gathered moments; the new
        # evaluation sees every neighbour's moments corrected by the
        # mover's old->new leg change (cell_energy.mover_energies)
        mom = [pk_ref[0, i] for i in range(10)]

        def wing(w, u, fields):
            ux, uy, uz = u
            (s1, mx, my, mz, mxx, myy, mzz, mxy, mxz, myz) = fields
            quad = (
                ux * ux * mxx + uy * uy * myy + uz * uz * mzz
                + 2.0 * (ux * uy * mxy + ux * uz * mxz
                         + uy * uz * myz)
            )
            lin = ux * mx + uy * my + uz * mz
            per = (
                quad + 2.0 * c0 * lin + (c0 * c0) * s1
                - (1.0 - c0) ** 2 * w
            )
            return w * per

        e3j_o = wing(w_o, u_o, mom)
        eff = [mom[i] - dlt_o[i] + dlt_n[i] for i in range(10)]
        e3j_n = wing(w_n, u_n, eff)

        # per-candidate delta output ([10, cap, WB] block)
        if d_ref is not None:
            for i in range(10):
                d_ref[i, 0] = dlt_n[i] - dlt_o[i]

        # accumulate the mover reductions ([cap, WB] partials; the
        # sublane reduction happens once at the last candidate cell)
        acc[0] += pair_o
        acc[1] += pair_n
        acc[2] += w_o * w_o
        acc[3] += w_n * w_n
        acc[4] += e3j_o
        acc[5] += e3j_n
        for i in range(10):
            acc[6 + i] += own_o[i]
            acc[16 + i] += own_n[i]

        @pl.when(c == CF - 1)
        def _():
            red = lambda i: jnp.sum(acc[i], axis=0)       # noqa: E731
            own_of = Moments(*(red(6 + i) for i in range(10)))
            own_nf = Moments(*(red(16 + i) for i in range(10)))
            e3i_o = _e3_closed_form(own_of, red(2), c0)
            e3i_n = _e3_closed_form(own_nf, red(3), c0)
            red_ref[0, 0] = red(0) + lam_eps * (e3i_o + red(4))
            red_ref[0, 1] = red(1) + lam_eps * (e3i_n + red(5))
            for i in range(10):
                red_ref[0, 2 + i] = own_nf[i]

    # ------------------------------------------------------------------

    def _invoke(self, cand, fc, rank, shift, po, pn, pk):
        K, CF = cand.shape
        Wl = pk.shape[-1]
        WB = _pick_wb(Wl, self.cap)
        cap = self.cap
        dtype = pk.dtype

        def pkspec():
            # packed slab [nfine, PK_ROWS, cap, W]: one fine cell's
            # whole block at the scalar-prefetched candidate index -
            # ONE descriptor instead of 14 per grid step
            def imap(wb, k, c, cand_r, fc_r):
                return (cand_r[k, c], 0, 0, wb)
            return pl.BlockSpec((1, PK_ROWS, cap, WB), imap,
                                memory_space=pltpu.VMEM)

        def shiftspec():
            def imap(wb, k, c, cand_r, fc_r):
                return (k * CF + c, 0, wb)
            return pl.BlockSpec((1, 3, WB), imap,
                                memory_space=pltpu.VMEM)

        def pspec():
            # whole [3, K, WB] block (K is tiny); Mosaic requires the
            # second-to-last block dim be 8-divisible OR the full
            # array dim, so a (3, 1, WB) per-mover block is illegal -
            # the kernel indexes the mover with program_id instead
            def imap(wb, k, c, cand_r, fc_r):
                return (0, 0, wb)
            return pl.BlockSpec((3, K, WB), imap,
                                memory_space=pltpu.VMEM)

        def rankspec():
            def imap(wb, k, c, cand_r, fc_r):
                return (0, wb)
            return pl.BlockSpec((K, WB), imap,
                                memory_space=pltpu.VMEM)

        def redspec():
            def imap(wb, k, c, cand_r, fc_r):
                return (k, 0, wb)
            return pl.BlockSpec((1, _NRED, WB), imap,
                                memory_space=pltpu.VMEM)

        def dspec():
            def imap(wb, k, c, cand_r, fc_r):
                return (0, k * CF + c, 0, wb)
            return pl.BlockSpec((10, 1, cap, WB), imap,
                                memory_space=pltpu.VMEM)

        out_specs = [redspec()]
        out_shape = [jax.ShapeDtypeStruct((K, _NRED, Wl), dtype)]
        if self.with_deltas:
            out_specs.append(dspec())
            out_shape.append(
                jax.ShapeDtypeStruct((10, K * CF, cap, Wl), dtype)
            )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(Wl // WB, K, CF),
            in_specs=(
                [pkspec(), shiftspec(), pspec(), pspec(), rankspec()]
            ),
            out_specs=out_specs,
            scratch_shapes=[pltpu.VMEM((_NACC, cap, WB), dtype)],
        )
        out = pl.pallas_call(
            self._kernel,
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=self.interpret,
        )(cand, fc, pk, shift, po, pn, rank)
        return tuple(out)

    # ------------------------------------------------------------------

    def __call__(self, pk, H, cand_cells, cand_off, fc, rank,
                 p_old, p_new):
        """One lattice, one sub-step.

        pk [nfine, PK_ROWS, cap, W]: the packed slab (moment rows
        0:10, coordinate rows PK_R0:PK_R0+3, validity row PK_VALID -
        mcmc/cellengine pack layout); H [3,3,W]; cand_cells [K, CF] /
        cand_off [K, CF, 3] the movers' coverage-table rows; fc [K]
        mover fine cells; rank [K, W] mover slot ranks; p_old/p_new
        [3, K, W].

        Returns (e_old [K,W], e_new [K,W], own_new Moments [K,W],
        d Moments fields [K, CF, cap, W] = per-candidate j-moment
        deltas new - old) - exactly the quantities the accept path of
        CellEngine._substep consumes.
        """
        K, CF = cand_cells.shape
        W = pk.shape[-1]
        cap = self.cap
        # per-candidate-cell image shifts H @ off ([K*CF, 3, W])
        off = jnp.asarray(cand_off).astype(H.dtype)
        shift = jnp.einsum("kcb,abw->kcaw", off, H).reshape(
            K * CF, 3, W
        )

        args = (
            jnp.asarray(cand_cells, dtype=jnp.int32),
            jnp.asarray(fc, dtype=jnp.int32),
            rank.astype(jnp.int32), shift, p_old, p_new, pk,
        )
        invoke = self._invoke
        if self.mesh is not None:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            ax = self.mesh.axis_names[0]

            def wsp(arr):
                return P(*((None,) * (arr.ndim - 1) + (ax,)))

            osp = (P(None, None, ax),)
            if self.with_deltas:
                osp = osp + (P(None, None, None, ax),)
            invoke = shard_map(
                invoke,
                mesh=self.mesh,
                in_specs=(P(None, None), P(None),
                          *(wsp(a) for a in args[2:])),
                out_specs=osp,
                check_vma=False,
            )
        out = invoke(*args)
        red = out[0]
        d = out[1] if self.with_deltas else None
        e_old = red[:, 0]
        e_new = red[:, 1]
        own_new = Moments(*(red[:, 2 + i] for i in range(10)))
        dmom = None
        if d is not None:
            dmom = Moments(*(
                d[i].reshape(K, CF, cap, W) for i in range(10)
            ))
        return e_old, e_new, own_new, dmom


class MoverPointsPallas:
    """Batch mover local energies at P evaluation points, fused.

    Engine of the multi-trial sub-step (cell_trials = T = P - 1,
    CellEngine._substep_multi): point 0 is the mover's stored
    position, points 1..T the anchored-window candidates.  One pass
    over the coverage stencil prices ALL P evaluations - per
    candidate cell the packed block is DMA'd once and the
    pair/leg/wing terms of every point are computed in VMEM, so the
    HBM traffic of T trials equals that of one (the sub-step is
    bandwidth-bound, DESIGN.md 5b).  Outputs only the [K, NRED, W]
    reductions: per-point energies (rows 0:P) and per-point own
    moments (rows P + 10t + i) for the post-chain apply stage.  No
    per-candidate delta output - multi-trial pairs with the in-place
    MoverApplyPallas kernel (or the XLA oracle path).

    Same eval_point / wing math as MoverEnergiesPallas; world(t)
    corrects the gathered neighbour moments by the mover's point-0 ->
    point-t leg change (ops/cell_energy.mover_point_energies).
    """

    # scratch rows per point: pair, w^2, e3j, own moments x10
    _SROWS = 13

    def __init__(self, model: SWParams, cg: CellGrid, n_points: int,
                 mesh=None):
        assert n_points >= 2
        self.model = model
        self.nfine = cg.nfine
        self.cap = cg.cap
        self.CF = cg.full_cells.shape[1]
        self.P = int(n_points)
        # energies rows + own-moment rows, padded to a multiple of 8
        # (f32 sublane tile) for the [K, NRED, W] red output
        self.nred = -(-(11 * self.P) // 8) * 8
        assert bool(np.all(cg.full_mask)), (
            "MoverPointsPallas requires an unpadded coverage table"
        )
        self.mesh = mesh if (mesh is not None and mesh.size > 1) else None
        self.interpret = jax.default_backend() == "cpu"

    def _kernel(self, cand_ref, fc_ref, pk_ref, shift_ref, pts_ref,
                rank_ref, red_ref, acc):
        m = self.model
        P, CF = self.P, self.CF
        SR = self._SROWS
        lam_eps = m.lam * m.epsilon
        c0 = m.cos0
        k = pl.program_id(1)
        c = pl.program_id(2)

        @pl.when(c == 0)
        def _():
            acc[...] = jnp.zeros_like(acc)

        sx = shift_ref[0, 0]
        sy = shift_ref[0, 1]
        sz = shift_ref[0, 2]
        cx = pk_ref[0, PK_R0 + 0] + sx[None, :]
        cy = pk_ref[0, PK_R0 + 1] + sy[None, :]
        cz = pk_ref[0, PK_R0 + 2] + sz[None, :]
        valid = pk_ref[0, PK_VALID] > 0.5
        is_self_cell = cand_ref[k, c] == fc_ref[k]
        rank_row = rank_ref[k]
        iota_cap = lax.broadcasted_iota(jnp.int32, valid.shape, 0)
        self_m = (iota_cap == rank_row[None, :]) & is_self_cell
        mask = valid & jnp.logical_not(self_m)

        def eval_point(px, py, pz):
            dx = cx - px[None, :]
            dy = cy - py[None, :]
            dz = cz - pz[None, :]
            r2 = dx * dx + dy * dy + dz * dz
            in_rc = (r2 < m.rc2) & mask
            r2s = jnp.where(in_rc, r2, 1.0)
            inv = lax.rsqrt(r2s)
            rij = r2s * inv
            pair = _pair(r2s, rij, in_rc, m)
            w = _leg(rij, in_rc, m)
            ux, uy, uz = dx * inv, dy * inv, dz * inv
            wux, wuy, wuz = w * ux, w * uy, w * uz
            own = (w, wux, wuy, wuz,
                   wux * ux, wuy * uy, wuz * uz,
                   wux * uy, wux * uz, wuy * uz)
            dlt = (w, -wux, -wuy, -wuz,
                   own[4], own[5], own[6], own[7], own[8], own[9])
            return pair, w, (ux, uy, uz), own, dlt

        def wing(w, u, fields):
            ux, uy, uz = u
            (s1, mx, my, mz, mxx, myy, mzz, mxy, mxz, myz) = fields
            quad = (
                ux * ux * mxx + uy * uy * myy + uz * uz * mzz
                + 2.0 * (ux * uy * mxy + ux * uz * mxz
                         + uy * uz * myz)
            )
            lin = ux * mx + uy * my + uz * mz
            per = (
                quad + 2.0 * c0 * lin + (c0 * c0) * s1
                - (1.0 - c0) ** 2 * w
            )
            return w * per

        mom = [pk_ref[0, i] for i in range(10)]
        dlt0 = None
        for t in range(P):
            pair_t, w_t, u_t, own_t, dlt_t = eval_point(
                pts_ref[0, t, k], pts_ref[1, t, k], pts_ref[2, t, k]
            )
            if t == 0:
                dlt0 = dlt_t
                eff = mom
            else:
                eff = [mom[i] - dlt0[i] + dlt_t[i] for i in range(10)]
            e3j_t = wing(w_t, u_t, eff)
            base = SR * t
            acc[base + 0] += pair_t
            acc[base + 1] += w_t * w_t
            acc[base + 2] += e3j_t
            for i in range(10):
                acc[base + 3 + i] += own_t[i]

        @pl.when(c == CF - 1)
        def _():
            red = lambda i: jnp.sum(acc[i], axis=0)       # noqa: E731
            for t in range(P):
                base = SR * t
                own_t = Moments(*(red(base + 3 + i) for i in range(10)))
                e3i_t = _e3_closed_form(own_t, red(base + 1), c0)
                red_ref[0, t] = red(base + 0) + lam_eps * (
                    e3i_t + red(base + 2)
                )
                for i in range(10):
                    red_ref[0, P + 10 * t + i] = own_t[i]

    def _invoke(self, cand, fc, rank, shift, pts, pk):
        K, CF = cand.shape
        Wl = pk.shape[-1]
        P = self.P
        cap = self.cap
        WB = _pick_wb(Wl, cap, rows=self._SROWS * P + 2 * PK_ROWS)
        dtype = pk.dtype

        def pkspec():
            def imap(wb, k, c, cand_r, fc_r):
                return (cand_r[k, c], 0, 0, wb)
            return pl.BlockSpec((1, PK_ROWS, cap, WB), imap,
                                memory_space=pltpu.VMEM)

        def shiftspec():
            def imap(wb, k, c, cand_r, fc_r):
                return (k * CF + c, 0, wb)
            return pl.BlockSpec((1, 3, WB), imap,
                                memory_space=pltpu.VMEM)

        def ptsspec():
            # whole [3, P, K, WB] block (P*K is small); the kernel
            # indexes (point, mover) with loop index + program_id
            def imap(wb, k, c, cand_r, fc_r):
                return (0, 0, 0, wb)
            return pl.BlockSpec((3, P, K, WB), imap,
                                memory_space=pltpu.VMEM)

        def rankspec():
            def imap(wb, k, c, cand_r, fc_r):
                return (0, wb)
            return pl.BlockSpec((K, WB), imap,
                                memory_space=pltpu.VMEM)

        def redspec():
            def imap(wb, k, c, cand_r, fc_r):
                return (k, 0, wb)
            return pl.BlockSpec((1, self.nred, WB), imap,
                                memory_space=pltpu.VMEM)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(Wl // WB, K, CF),
            in_specs=(
                [pkspec(), shiftspec(), ptsspec(), rankspec()]
            ),
            out_specs=[redspec()],
            scratch_shapes=[
                pltpu.VMEM((self._SROWS * P, cap, WB), dtype)
            ],
        )
        out = pl.pallas_call(
            self._kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((K, self.nred, Wl), dtype)
            ],
            interpret=self.interpret,
        )(cand, fc, pk, shift, pts, rank)
        return out[0]

    def __call__(self, pk, H, cand_cells, cand_off, fc, rank, pts):
        """One lattice, one multi-trial sub-step.

        pts: [3, P, K, W] evaluation points (point 0 = stored
        position); other arguments as MoverEnergiesPallas.__call__.
        Returns (e [P, K, W], owns: list of P Moments [K, W]).
        """
        K, CF = cand_cells.shape
        W = pk.shape[-1]
        P = self.P
        off = jnp.asarray(cand_off).astype(H.dtype)
        shift = jnp.einsum("kcb,abw->kcaw", off, H).reshape(
            K * CF, 3, W
        )
        args = (
            jnp.asarray(cand_cells, dtype=jnp.int32),
            jnp.asarray(fc, dtype=jnp.int32),
            rank.astype(jnp.int32), shift, pts, pk,
        )
        invoke = self._invoke
        if self.mesh is not None:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P_

            ax = self.mesh.axis_names[0]

            def wsp(arr):
                return P_(*((None,) * (arr.ndim - 1) + (ax,)))

            invoke = shard_map(
                invoke,
                mesh=self.mesh,
                in_specs=(P_(None, None), P_(None),
                          *(wsp(a) for a in args[2:])),
                out_specs=P_(None, None, ax),
                check_vma=False,
            )
        red = invoke(*args)
        e = jnp.stack([red[:, t] for t in range(P)])        # [P,K,W]
        owns = [
            Moments(*(red[:, P + 10 * t + i] for i in range(10)))
            for t in range(P)
        ]
        return e, owns


class MoverApplyPallas:
    """Apply accepted movers' moment updates IN PLACE.

    Second stage of the fully-fused sub-step (cell_pallas='apply'):
    after the acceptance chain, this kernel recomputes each accepted
    mover's per-candidate j-moment deltas (the same eval_point math as
    MoverEnergiesPallas, pair/wing reductions skipped) and adds them
    straight into the HBM-resident packed slab via an aliased output -
    each grid step reads one coverage cell's packed block, adds the
    masked delta to the moment rows, overwrites the mover's own slot
    with its new moments, copies the coordinate/validity rows through,
    and writes the block back.  Same-colour stencils are disjoint
    (CellEngine.scatter_unique), so every block is visited at most
    once per call and unvisited blocks keep their old data through
    the input/output alias.

    The packed slab's coordinate rows may already carry the movers'
    POST-move positions when this runs: deltas depend only on
    NEIGHBOUR coordinates, each mover is self-masked in its own
    stencil and absent from every other same-colour stencil
    (disjointness), so pre- and post-move slabs give identical deltas.

    Replaces the XLA d-materialise + scatter-add path: the
    [10, K*CF, cap, W] delta tensor never exists in HBM.
    """

    def __init__(self, model: SWParams, cg: CellGrid, mesh=None):
        self.model = model
        self.nfine = cg.nfine
        self.cap = cg.cap
        self.CF = cg.full_cells.shape[1]
        assert bool(np.all(cg.full_mask))
        self.mesh = mesh if (mesh is not None and mesh.size > 1) else None
        self.interpret = jax.default_backend() == "cpu"

    def _kernel(self, cand_ref, fc_ref, pk_ref, shift_ref, po_ref,
                pn_ref, rank_ref, accm_ref, own_ref, out_ref):
        m = self.model
        k = pl.program_id(1)
        c = pl.program_id(2)

        sx = shift_ref[0, 0]
        sy = shift_ref[0, 1]
        sz = shift_ref[0, 2]
        cx = pk_ref[0, PK_R0 + 0] + sx[None, :]
        cy = pk_ref[0, PK_R0 + 1] + sy[None, :]
        cz = pk_ref[0, PK_R0 + 2] + sz[None, :]
        valid = pk_ref[0, PK_VALID] > 0.5
        is_self_cell = cand_ref[k, c] == fc_ref[k]
        rank_row = rank_ref[k]
        iota_cap = lax.broadcasted_iota(jnp.int32, valid.shape, 0)
        self_slot = iota_cap == rank_row[None, :]
        self_m = self_slot & is_self_cell
        mask = valid & jnp.logical_not(self_m)

        def deltas(px, py, pz):
            dx = cx - px[None, :]
            dy = cy - py[None, :]
            dz = cz - pz[None, :]
            r2 = dx * dx + dy * dy + dz * dz
            in_rc = (r2 < m.rc2) & mask
            r2s = jnp.where(in_rc, r2, 1.0)
            inv = lax.rsqrt(r2s)
            rij = r2s * inv
            w = _leg(rij, in_rc, m)
            ux, uy, uz = dx * inv, dy * inv, dz * inv
            wux, wuy, wuz = w * ux, w * uy, w * uz
            return (w, -wux, -wuy, -wuz,
                    wux * ux, wuy * uy, wuz * uz,
                    wux * uy, wux * uz, wuy * uz)

        dlt_o = deltas(po_ref[0, k], po_ref[1, k], po_ref[2, k])
        dlt_n = deltas(pn_ref[0, k], pn_ref[1, k], pn_ref[2, k])

        acc_row = accm_ref[k] > 0                         # [WB] bool
        upd = acc_row[None, :]
        own_mask = self_slot & is_self_cell & upd
        for i in range(10):
            blk = pk_ref[0, i] + jnp.where(
                upd, dlt_n[i] - dlt_o[i], 0.0
            )
            # the mover's own slot: delta is zero there (self-masked);
            # replace with the new own moments on accept
            blk = jnp.where(own_mask, own_ref[k, i][None, :], blk)
            out_ref[0, i] = blk
        # coordinate rows: the accepted mover's own slot moves to
        # p_new (keeping ALL packed-slab mutation inside this single
        # aliased kernel lets XLA keep the scan carry in place - an
        # XLA scatter on the carry forced a full-slab copy per
        # sub-step); everything else passes through unchanged
        for a in range(3):
            out_ref[0, PK_R0 + a] = jnp.where(
                own_mask, pn_ref[a, k][None, :],
                pk_ref[0, PK_R0 + a],
            )
        out_ref[0, PK_VALID] = pk_ref[0, PK_VALID]

    def _invoke(self, cand, fc, rank, accm, shift, po, pn, own, pk):
        K, CF = cand.shape
        Wl = pk.shape[-1]
        WB = _pick_wb(Wl, self.cap)
        cap = self.cap
        dtype = pk.dtype

        def pkspec():
            def imap(wb, k, c, cand_r, fc_r):
                return (cand_r[k, c], 0, 0, wb)
            return pl.BlockSpec((1, PK_ROWS, cap, WB), imap,
                                memory_space=pltpu.VMEM)

        def shiftspec():
            def imap(wb, k, c, cand_r, fc_r):
                return (k * CF + c, 0, wb)
            return pl.BlockSpec((1, 3, WB), imap,
                                memory_space=pltpu.VMEM)

        def pspec():
            def imap(wb, k, c, cand_r, fc_r):
                return (0, 0, wb)
            return pl.BlockSpec((3, K, WB), imap,
                                memory_space=pltpu.VMEM)

        def kwspec():
            def imap(wb, k, c, cand_r, fc_r):
                return (0, wb)
            return pl.BlockSpec((K, WB), imap,
                                memory_space=pltpu.VMEM)

        def ownspec():
            def imap(wb, k, c, cand_r, fc_r):
                return (0, 0, wb)
            return pl.BlockSpec((K, 10, WB), imap,
                                memory_space=pltpu.VMEM)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(Wl // WB, K, CF),
            in_specs=(
                [pkspec(), shiftspec(), pspec(), pspec(), kwspec(),
                 kwspec(), ownspec()]
            ),
            out_specs=[pkspec()],
        )
        # input index (counting from 0 = the first prefetch arg): the
        # packed slab sits at 2 (right after the two prefetch args);
        # it aliases output 0
        out = pl.pallas_call(
            self._kernel,
            grid_spec=grid_spec,
            out_shape=[
                # pk.shape[0], not self.nfine: the spatially sharded
                # engine passes device-LOCAL slabs (owned + halo +
                # dummy rows, parallel/spatial.py)
                jax.ShapeDtypeStruct(
                    (pk.shape[0], PK_ROWS, cap, Wl), dtype
                )
            ],
            input_output_aliases={2: 0},
            interpret=self.interpret,
        )(cand, fc, pk, shift, po, pn, rank, accm, own)
        return out[0]

    def __call__(self, pk, H, cand_cells, cand_off, fc, rank, accf,
                 p_old, p_new, own_new: Moments):
        """Returns the updated packed slab [nfine, PK_ROWS, cap, W].

        accf: [K, W] accepted mask; own_new: the movers' new own
        moments (MoverEnergiesPallas red output).  Other arguments as
        MoverEnergiesPallas.__call__.
        """
        K, CF = cand_cells.shape
        W = pk.shape[-1]
        off = jnp.asarray(cand_off).astype(H.dtype)
        shift = jnp.einsum("kcb,abw->kcaw", off, H).reshape(
            K * CF, 3, W
        )
        own = jnp.stack(list(own_new), axis=1)             # [K,10,W]
        args = (
            jnp.asarray(cand_cells, dtype=jnp.int32),
            jnp.asarray(fc, dtype=jnp.int32),
            rank.astype(jnp.int32), accf.astype(jnp.int32),
            shift, p_old, p_new, own, pk,
        )
        invoke = self._invoke
        if self.mesh is not None:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            ax = self.mesh.axis_names[0]

            def wsp(arr):
                return P(*((None,) * (arr.ndim - 1) + (ax,)))

            invoke = shard_map(
                invoke,
                mesh=self.mesh,
                in_specs=(P(None, None), P(None),
                          *(wsp(a) for a in args[2:])),
                out_specs=wsp(pk),
                check_vma=False,
            )
        return invoke(*args)
