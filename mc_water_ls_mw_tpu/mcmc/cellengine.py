"""Large-N parallel cell-sweep MC engine.

New capability beyond the reference (SURVEY.md §7 step 8,
BASELINE.json configs[4]): the reference's sampler is a strictly
serial per-rank chain with O(N^2) neighbour searches
(mc_cycle:224-250, molint.F90:501-559) and cannot reach N >= 10^4.
This engine recasts the chain for large boxes:

* Space is partitioned by the two-level mid-frame cell grid of
  ops/cells.py: 8-coloured COARSE cells (side > 2*rc + mismatch in
  the mid-replica frame) for the checkerboard, subdivided into FINE
  cells carrying the slab storage and the static candidate-coverage
  tables.  One sub-step picks ONE random molecule in every
  active-colour coarse cell and proposes translations for all of them
  AT ONCE.  Movers sit in distinct same-colour coarse cells, hence
  > 2*rc apart in both replicas, so their local energies, Delta-E's
  and moment updates are EXACTLY independent (a mover's Delta-E
  reaches at most 2*rc: rc to a neighbour j plus rc from j to a wing
  molecule k).

* The accept/reject chain stays EXACT: energies are evaluated in
  parallel, but acceptance runs in a cheap sequential scan over the
  movers because the multicanonical state (mu, eta(mu), WL weights)
  couples all moves globally.  Since the movers' energy terms are
  disjoint, evaluating Delta-E_k against the pre-sub-step
  configuration equals evaluating it mid-chain, and the scan
  reproduces the serial Markov chain move for move.

* A move that would cross the mover's stored FINE-cell boundary (in
  the mid frame) is rejected (a state-only-dependent hard wall: the
  reverse proposal faces the same wall, so detailed balance is
  preserved).  The wall sits at the fine cell because the coverage
  tables reach partners through their stored fine slots: confining
  every molecule to the fine cube it was binned into keeps the
  static tables EXACT for the whole binning epoch.  The grid origin
  is re-drawn at random + molecules re-binned every
  ``list_update_int`` cycles (the reference's Verlet-rebuild cadence,
  mc_cycle:218-222), which restores ergodicity across cells - the
  standard checkerboard construction of massively-parallel MC.

* Everything else - Wang-Landau updates, eta lookups, lattice
  switches, delta-sync, mu-window dd mode, flatness/monitor/deltaG -
  is INHERITED from the dense Engine unchanged: CellState carries the
  same multicanonical fields, and those methods never touch the
  configurational layout.

Throughput model: one cycle = ~nwater trial moves, executed as
``sweeps = nwater/(ncell*m^3)`` sweeps of 8 x m^3 (colour, fine
block) sub-steps moving ncell/8 molecules each - per-walker
parallelism that GROWS with N, on top of the walker ensemble.
Scheduling sub-steps at (colour, block) pairs keeps every mover's
FINE cell static, shrinking the candidate set to the minimal 27-cell
per-fine-cell coverage stencil (see _substep).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..models.sw import SWParams
from ..ops.cells import (
    PK_R0,
    PK_ROWS,
    PK_VALID,
    CellGrid,
    bin_molecules,
    cell_of_frac,
    gather_from_slab,
    scatter_to_slab,
)
from ..ops.cell_energy import (
    _cell_take,
    mover_energies,
    mover_point_energies,
    slab_full_energy,
)
from ..ops.dense import Moments
from ..ops.dsfloat import DS, _two_sum, ds_value, ds_zeros
from ..ops.geometry import determinant3, recip_matrix
from .bins import BinGrid, mu_to_bin
from .config import RunParams
from .engine import (
    Engine,
    NOOP,
    SWITCH,
    TRANS,
    VOL,
    _einsum,
    _stack_moments,
    _take_lat,
)
from .state import (
    EngineAux,
    assign_windows,
    compute_log_unbiased_norm,
)


class CellState(NamedTuple):
    """Sampler state in slab layout; field names deliberately shadow
    SamplerState so the inherited Engine methods (eta/WL/switch/sync)
    and the host-side wanglandau.py events work unchanged."""

    # configurational state, slab layout (nslot = ncell*cap >= N)
    r: jnp.ndarray            # [L,3,nslot,W] positions (slab slots)
    h: jnp.ndarray            # [L,3,3,W]
    recip: jnp.ndarray        # [L,3,3,W]
    volume: jnp.ndarray       # [L,W]
    energy: jnp.ndarray       # [L,W]
    # compensated-summation residual of the incremental energy
    # (double-single: true energy = energy + energy_err).  At
    # N ~ 10^4 the per-move dE (~1e-5 Ha) is the SAME SIZE as the f32
    # ulp of the total (~152 Ha * 2^-23): plain accumulation
    # quantises and drifts systematically - the round-4 N=8064
    # production measured 2.2 Ha (~890 kT in beta units) of drift in
    # 500 cycles, discovered by the offline checkpoint audit.  Every
    # chain update two-sums into (energy, energy_err); from-scratch
    # refreshes (volume accepts, resync, audits) zero the residual.
    energy_err: jnp.ndarray   # [L,W]
    mu: jnp.ndarray           # [W]
    ls: jnp.ndarray           # [W]
    moments: Moments          # fields [L,nslot,W]

    # slab bookkeeping
    slot2mol: jnp.ndarray     # [nslot,W] int32, -1 = empty
    mol2slot: jnp.ndarray     # [N,W] int32
    origin: jnp.ndarray       # [3] fractional grid origin (shared)
    occ_overflow: jnp.ndarray  # [W] int32 max(occupancy-cap) observed

    # multicanonical state (same delta-split layout as SamplerState:
    # per-walker growth since sync + double-single master totals)
    weight: jnp.ndarray
    hist: jnp.ndarray
    uhist: jnp.ndarray
    f: jnp.ndarray
    sumhist: jnp.ndarray
    invt_active: jnp.ndarray
    firstcycle: jnp.ndarray
    histogram_reset: jnp.ndarray
    master_eta: DS
    master_hist: DS
    master_uhist: DS
    window_id: jnp.ndarray
    my_mu_min: jnp.ndarray
    my_mu_max: jnp.ndarray
    start_bin: jnp.ndarray
    end_bin: jnp.ndarray
    in_window: jnp.ndarray

    # counters / step sizes (same as SamplerState)
    max_trans: jnp.ndarray
    dv_max: jnp.ndarray
    att: jnp.ndarray
    acc: jnp.ndarray
    trans_per_mol: jnp.ndarray
    avg_energy: jnp.ndarray
    min_dmu: jnp.ndarray
    max_dmu: jnp.ndarray

    cycle: jnp.ndarray
    key: jnp.ndarray
    shared_key: jnp.ndarray
    dropped: jnp.ndarray      # int32 scalar (see SamplerState)


class CellAux(NamedTuple):
    """Static large-N extras alongside EngineAux."""

    dfrac0: jnp.ndarray       # [3,N] invariant correspondence mismatch
                              # f1 - f2 per molecule (models/stacking.py)
    mismatch: float           # max Cartesian mismatch bound (Bohr)
    #: [3,N] lattice-1 reference fractional sites — the anchor of the
    #: round-5 displacement wall (cell_trans_wall): the standard
    #: LS-MC coherence regularizer |r - r_ref| <= w keeps overlap
    #: states coherent (both replicas share the u-vector set), closing
    #: the central-window disorder pathology (DESIGN.md §5d round 5)
    fref0: jnp.ndarray = None


def _slab_put(arr, idx, val, mask):
    """Per-walker scatter: arr[idx[k,w], w] = val[k,w] where mask."""
    def one(a, i, v, m):
        cur = a[i]
        return a.at[i].set(jnp.where(m, v, cur))
    return jax.vmap(one, in_axes=(1, 1, 1, 1), out_axes=1)(
        arr, idx, val, mask
    )


def _frac_of(recip_l, r_l):
    """Fractional coords: recip [3,3,W], r [3,M,W] -> [3,M,W]."""
    return _einsum("abw,amw->bmw", recip_l, r_l) * (0.5 / jnp.pi)


class CellEngine(Engine):
    """Drop-in engine for large systems; inherits all multicanonical
    machinery from Engine and replaces the configurational kernels."""

    def __init__(self, prm: RunParams, model: SWParams, grid: BinGrid,
                 aux: EngineAux, cellgrid: CellGrid, cellaux: CellAux,
                 mesh=None):
        prm = dataclasses.replace(prm, fused="off")
        super().__init__(prm, model, grid, aux, mesh=mesh)
        self.cellgrid = cellgrid
        self.cellaux = cellaux
        # volume-move geometry guard: the static coverage tables were
        # built from the initial box geometry with shrink factor
        # ``guard`` baked in; the volume move rejects any box whose
        # perpendicular widths shrink below 1/guard of the initial
        # ones (hard wall; state-only-dependent, so detailed balance
        # is preserved)
        self.w_guard = np.asarray(cellgrid.perp_w0) / cellgrid.guard

        # static per-(colour, fine-block) tables.  A sub-step is
        # scheduled at a (colour, block) pair, so every mover's FINE
        # cell is known at trace time: its candidate set is the
        # 27-cell per-fine-cell coverage stencil (cells.full_cells -
        # the same r_cov radius the fine-cell wall guarantees), a
        # 2.4x smaller gather/scatter footprint than the per-coarse
        # table, still at fully static indices.  Same-colour movers'
        # stencils are provably DISJOINT (same-colour coarse cells are
        # >= 2 coarse = 2m fine apart on some axis, and a stencil
        # reaches only +-1 fine from a fine cell inside the coarse
        # cube, leaving a >= m-2 >= 0 cell gap on that axis for
        # m >= 2), so all slab scatters below carry unique indices.
        m3 = cellgrid.m ** 3
        # unique-scatter eligibility: verified explicitly per table
        # (the geometric argument above needs stencil reach 1 and
        # m >= 2; padding entries alias cell 0, which also breaks it)
        self.scatter_unique = bool(np.all(cellgrid.full_mask))
        fc_rows, cand_rows, off_rows = [], [], []
        for col in range(8):
            cells_c = np.asarray(cellgrid.color_cells[col])
            for b in range(m3):
                fc = cellgrid.block_cells[cells_c][:, b]   # [K]
                cand = cellgrid.full_cells[fc]             # [K, CF]
                if len(np.unique(cand)) != cand.size:
                    self.scatter_unique = False
                fc_rows.append(fc)
                cand_rows.append(cand)
                off_rows.append(cellgrid.full_off[fc])     # [K, CF, 3]
        # stacked (colour, block) tables, row t = colour*m^3 + block;
        # the cycle scan indexes rows DYNAMICALLY so its body traces a
        # single sub-step (indices are shared across walkers - row-
        # granularity gathers, unlike per-walker dynamic indexing)
        self.fc_stack = jnp.asarray(np.stack(fc_rows))     # [8*m3,K]
        self.cand_stack = jnp.asarray(np.stack(cand_rows))
        self.off_stack = jnp.asarray(np.stack(off_rows))
        self.n_tables = 8 * m3
        self.K = cellgrid.cells_per_color
        # one sweep = cell_trials trials per (coarse cell, fine
        # block); trial count per cycle matches nwater to within
        # rounding at production sizes (nwater >> ncoarse*m^3)
        self.T = int(prm.cell_trials)
        if self.T < 1:
            raise ValueError("cell_trials must be >= 1")
        self.sweeps_per_cycle = max(
            1, int(round(prm.nwater / (cellgrid.ncoarse * m3 * self.T)))
        )
        self.trials_per_cycle = (
            self.sweeps_per_cycle * cellgrid.ncoarse * m3 * self.T
        )

        # fused Pallas sub-step energy kernel (ops/cell_pallas.py):
        # the XLA path materialises ~30 [K, CF*cap, W] intermediates
        # per sub-step in HBM; the kernel keeps them in VMEM.
        # 'apply' additionally replaces the post-accept XLA
        # delta-scatter with the in-place MoverApplyPallas kernel
        # (the [10, K*CF, cap, W] delta tensor never exists in HBM);
        # it requires unique same-colour stencils (scatter_unique) -
        # each moment block must be visited at most once per call.
        unpadded = bool(np.all(cellgrid.full_mask))
        if prm.cell_pallas in ("on", "apply"):
            if not unpadded:
                raise ValueError(
                    f"cell_pallas='{prm.cell_pallas}' needs an "
                    "unpadded coverage table (cells.build_grid "
                    "full_mask all True)"
                )
            if prm.cell_pallas == "apply" and not self.scatter_unique:
                raise ValueError(
                    "cell_pallas='apply' needs disjoint same-colour "
                    "coverage stencils (scatter_unique)"
                )
            self.use_cell_pallas = True
            self.use_cell_apply = prm.cell_pallas == "apply"
        elif prm.cell_pallas == "auto":
            self.use_cell_pallas = (
                unpadded and jax.default_backend() != "cpu"
            )
            # prefer the fully-fused apply kernel wherever its
            # disjoint-stencil requirement holds: ~3x the XLA scatter
            # path (DESIGN.md §5b measured journey), bit-identical
            # accept decisions
            self.use_cell_apply = (
                self.use_cell_pallas and self.scatter_unique
            )
            if int(prm.cell_trials) > 1 and not self.use_cell_apply:
                # the multi-trial sub-step pairs the points kernel
                # with the in-place apply kernel only (no
                # per-candidate delta output); fall back to the XLA
                # path on non-disjoint grids
                self.use_cell_pallas = False
        else:
            self.use_cell_pallas = False
            self.use_cell_apply = False
        if self.T > 1 and self.use_cell_pallas and not self.use_cell_apply:
            raise ValueError(
                "cell_trials > 1 supports cell_pallas in ('off', "
                "'apply', 'auto'): the multi-point kernel has no "
                "per-candidate delta output for the 'on' scatter path"
            )
        if self.use_cell_pallas:
            from ..ops.cell_pallas import (
                MoverApplyPallas,
                MoverEnergiesPallas,
                MoverPointsPallas,
            )
            if self.T > 1:
                self.points_kernel = MoverPointsPallas(
                    self.model, cellgrid, n_points=self.T + 1,
                    mesh=mesh,
                )
            else:
                self.mover_kernel = MoverEnergiesPallas(
                    self.model, cellgrid, mesh=mesh,
                    with_deltas=not self.use_cell_apply,
                )
            if self.use_cell_apply:
                self.apply_kernel = MoverApplyPallas(
                    self.model, cellgrid, mesh=mesh
                )

        # fused acceptance-chain + per-move-WL kernel for the multi-
        # trial sub-step (mcmc/chain_pallas.py).  Both multi-trial
        # chain implementations use PER-MOVE WL semantics (exactly
        # the reference's mc_update_wl_bins cadence); the kernel
        # keeps the WL slabs VMEM-resident for the whole K*T chain.
        self.use_chain_kernel = False
        if prm.cell_chain == "on":
            if prm.num_lattices != 2:
                raise ValueError(
                    "cell_chain='on' requires num_lattices = 2"
                )
            self.use_chain_kernel = True
        elif prm.cell_chain == "auto":
            # any T (the kernel loop is T-agnostic): running the T=1
            # sub-step through the chain kernel gives it PER-MOVE WL
            # semantics too, erasing the micro-batched-WL
            # approximation wherever the kernels run (the XLA
            # fallback chain _chain_t1 is the only remaining
            # micro-batched path; VALIDATION section d)
            self.use_chain_kernel = (
                prm.num_lattices == 2 and self.use_cell_pallas
            )
        elif prm.cell_chain != "off":
            raise ValueError(f"cell_chain={prm.cell_chain!r}")
        if self.use_chain_kernel:
            from .chain_pallas import ChainWLPallas

            self.chain_kernel = ChainWLPallas(
                prm, grid, self.K, self.T,
                float(aux.log_unbiased_norm), mesh=mesh,
            )

    # ------------------------------------------------------------------
    # compensated energy accumulation (see CellState.energy_err)
    # ------------------------------------------------------------------

    def _e_tot(self, s):
        return s.energy + s.energy_err

    def _post_volume_energy(self, s, accept):
        # from-scratch energy on accept: zero the residual there
        return s._replace(
            energy_err=jnp.where(accept[None, :], 0.0, s.energy_err)
        )

    # ------------------------------------------------------------------
    # full-cell energy (slab)
    # ------------------------------------------------------------------

    def _slab_valid(self, s: CellState):
        return s.slot2mol >= 0

    def _full_both(self, s: CellState, r, h):
        valid = self._slab_valid(s)
        per = [
            slab_full_energy(r[l], valid, h[l], self.cellgrid,
                             self.model)
            for l in range(r.shape[0])
        ]
        energy = jnp.stack([p[0] for p in per])
        moments = _stack_moments([p[1] for p in per])
        return energy, moments

    # ------------------------------------------------------------------
    # one colour sub-step: K parallel movers, exact sequential chain
    # ------------------------------------------------------------------

    def _pack(self, s: CellState):
        """Pack each lattice's slabs into ONE [nfine, PK_ROWS, cap, W]
        tensor (moment rows 0:10, coordinate rows PK_R0:PK_R0+3,
        validity row PK_VALID) for the sub-step scan.  The sub-step is
        DMA-issue-bound: one packed tensor costs one block descriptor
        per candidate cell where 14 per-field slabs cost 14.  Costs
        one transpose copy per cycle (~nothing against ~10^3
        sub-steps); validity is static between rebins, which only
        happen outside the scan."""
        cg = self.cellgrid
        L, _, nslot, W = s.r.shape
        nfine, cap = cg.nfine, cg.cap
        valid = (s.slot2mol >= 0).astype(s.r.dtype)
        pks = []
        for l in range(L):
            rows = [f[l].reshape(nfine, cap, W) for f in s.moments]
            rows += [s.r[l, a].reshape(nfine, cap, W)
                     for a in range(3)]
            rows.append(valid.reshape(nfine, cap, W))
            pks.append(jnp.stack(rows, axis=1))
        return pks

    def _unpack(self, s: CellState, pks) -> CellState:
        """Extract the canonical r / moments slabs back out of the
        packed scan carry (s.r / s.moments are zero-size placeholders
        inside the scan - the packed tensors are the source of truth
        there)."""
        L = len(pks)
        nfine, _, cap, W = pks[0].shape
        nslot = nfine * cap
        mom = Moments(*(
            jnp.stack([pks[l][:, i] for l in range(L)]).reshape(
                L, nslot, W
            )
            for i in range(10)
        ))
        r = jnp.stack([
            jnp.stack([pks[l][:, PK_R0 + a] for a in range(3)])
            for l in range(L)
        ]).reshape(L, 3, nslot, W)
        return s._replace(r=r, moments=mom)

    def _substep_canonical(self, s: CellState, tpm_slab, fc,
                           cand_cells_b, cand_off_b, u, codes_k,
                           switch_ok):
        """One sub-step on the canonical (unpacked) state: pack,
        sub-step, unpack.  Test/diagnostic entry point - the cycle
        scan calls _substep directly on the packed carry."""
        fn = self._substep if self.T == 1 else self._substep_multi
        small, pks, tpm = fn(
            s, self._pack(s), tpm_slab, fc, cand_cells_b, cand_off_b,
            u, codes_k, switch_ok,
        )
        return self._unpack(small, pks), tpm

    def _select_movers(self, s: CellState, pks, fc, u_sel,
                       fc_local=None):
        """Mover selection, uniform over the STATIC fine cell's
        occupants (rank-packed slots are contiguous per fine cell
        and never move between rebins, so ranks [0, occ) are exactly
        the occupied slots).  The proposal is symmetric: the wall
        keeps an accepted mover inside its fine cell, so the reverse
        move faces the same occupancy and the same 1/occ selection
        probability.  All reads/writes are whole-fine-cell [cap,W]
        block ops at the STATIC block tables (dynamic per-walker
        scalar scatter/gather serialises on TPU).

        ``fc`` are GLOBAL fine ids (occupancy lives in the global
        slot2mol array); ``fc_local`` are the rows of ``pks`` holding
        those cells (identical to ``fc`` in the unsharded engine; the
        spatially sharded engine passes its device-local row ids -
        parallel/spatial.py)."""
        cg = self.cellgrid
        cap = cg.cap
        K = fc.shape[0]
        W = s.mu.shape[-1]
        dtype = pks[0].dtype
        if fc_local is None:
            fc_local = fc
        # occupancy rows live in the same frame as the ``pks`` rows
        # (the spatially sharded engine passes a local-with-halo
        # slot2mol aligned with its local slabs; unsharded, fc_local
        # == fc and this is the global array)
        occ_mol = _cell_take(s.slot2mol, fc_local[:, None], cap)
        #                                            [K,cap,W]
        occ_sel = jnp.sum(
            occ_mol >= 0, axis=1, dtype=jnp.int32
        )                                                     # [K,W]
        rank = jnp.minimum(
            (u_sel * occ_sel.astype(dtype)).astype(jnp.int32),
            jnp.maximum(occ_sel - 1, 0),
        )                                                     # [K,W]
        mover_fc = jnp.broadcast_to(fc[:, None], (K, W))
        # slot ids in the frame of the ``pks`` rows: the energy
        # kernels self-mask the mover against candidate slot ids
        # computed from the (possibly device-local) coverage tables
        mover_slot = (
            jnp.broadcast_to(fc_local[:, None], (K, W)) * cap + rank
        )                                                     # [K,W]
        oh_sel = (
            jnp.arange(cap, dtype=jnp.int32)[None, :, None]
            == rank[:, None, :]
        )                                                     # [K,cap,W]

        blk_pk = [pk[fc_local] for pk in pks]    # L x [K,R,cap,W]
        blk_r = jnp.stack([
            jnp.moveaxis(b[:, PK_R0:PK_R0 + 3], 1, 0) for b in blk_pk
        ])                                            # [L,3,K,cap,W]
        p_old = jnp.sum(
            jnp.where(oh_sel[None, None], blk_r, 0.0), axis=3
        )                                                     # [L,3,K,W]
        mover_mol = jnp.take_along_axis(
            occ_mol, rank[:, None, :], axis=1
        )[:, 0, :]                                            # [K,W]
        # trial is only real if the scheduled fine cell is occupied
        # AND the selected rank holds a molecule (in f32, u*occ can
        # round up to exactly occ; the rank clamp keeps it in range
        # but an empty cell must never yield a phantom trial)
        has_mover = (occ_sel > 0) & (mover_mol >= 0)          # [K,W]
        return (rank, mover_fc, mover_slot, oh_sel, blk_r, p_old,
                mover_mol, has_mover)

    def _hoisted_chain_terms(self, s: CellState):
        """The volume/enthalpy algebra of the switch rule and the
        mu-from-scratch refresh, FROZEN for the whole sub-step
        (volumes only change at volume moves, which run outside the
        sub-step chain) — the chain body then costs a handful of [W]
        ops per trial instead of logs.

        Returns (two, cmu, sw_c, minu_c):
          * mu from scratch = beta*(E0 - E1) + cmu (mc_moves:856-862)
          * switch rule dsw = sgn(ls) * (beta*(E1 - E0) + sw_c)
            (mc_lattice_switch, mc_moves.F90:1558-1559)
          * MINU lattice pick (mc_moves.F90:1119-1126): lsn = 1 iff
            beta*(E'1 - E'0) + minu_c < 0 (argmin of the trial
            enthalpies, first-min-on-ties like Fortran minloc;
            engine._translate's enth convention - the PV term only
            under npt)
        """
        prm = self.prm
        two = prm.num_lattices == 2
        cmu = sw_c = minu_c = None
        vol0 = s.volume
        if two:
            rh = self.aux.ref_enthalpy
            lv10 = jnp.log(vol0[1] / vol0[0])          # [W]
            pterm = prm.beta * prm.pressure * (vol0[1] - vol0[0])
            cmu = -pterm + prm.nwater * lv10
            if prm.leshift:
                cmu = cmu + prm.beta * (rh[1] - rh[0])
            sw_c = jnp.zeros_like(lv10)
            if prm.mc_ensemble == "npt":
                sw_c = pterm - prm.nwater * lv10
            if prm.leshift:
                sw_c = sw_c - prm.beta * (rh[1] - rh[0])
            minu_c = sw_c
            if prm.mc_ensemble == "npt":
                minu_c = sw_c + prm.nwater * lv10
        return two, cmu, sw_c, minu_c

    def _substep(self, s: CellState, pks, tpm_slab, fc, cand_cells_b,
                 cand_off_b, u, codes_k, switch_ok):
        """One (colour, fine-block) sub-step.  ``pks`` [L] packed
        slabs [nfine, PK_ROWS, cap, W] (see _pack) - the
        configurational source of truth inside the cycle scan (s.r /
        s.moments are stale here).  ``fc`` [K] are the movers' fine
        cells, ``cand_cells_b`` [K, CF] their coverage stencils,
        ``cand_off_b`` [K, CF, 3] the wrap offsets - rows of the
        stacked tables; traced values are fine (indices are shared
        across walkers).  ``u`` [K, 7, W]: this sub-step's slice of
        the per-cycle uniform block (1 selection + 6 move uniforms
        per mover), pregenerated by _one_cycle - one big fused
        threefry call per cycle instead of per-walker fold-in chains
        inside every sequential sub-step."""
        (rank, oh_sel, blk_r, p_old, p_new, has_mover, in_cell, dE,
         per) = self._propose_t1(s, pks, fc, cand_cells_b, cand_off_b,
                                 u)

        trans_type = codes_k == TRANS
        if self.use_chain_kernel:
            # run the T=1 chain through the fused chain+WL kernel in
            # its point-table form (P=2: point 0 = current, point 1 =
            # the proposal): eta lookups see every earlier WL
            # increment and each update lands immediately - the
            # reference's exact per-move cadence (mc_update_wl_bins,
            # mc_moves.F90:1597-1689), not the micro-batched XLA
            # chain's sub-step-boundary lag
            e_pts = jnp.stack([
                jnp.stack([p[0], p[1]], axis=0) for p in per
            ])                                         # [L,P=2,K,W]
            # the T=1 two-endpoint wall check is already folded into
            # in_cell; point 0 is trivially "in cell"
            in_pts = jnp.stack(
                [jnp.ones_like(in_cell), in_cell]
            )                                          # [P,K,W]
            two, cmu, sw_c, minu_c = self._hoisted_chain_terms(s)
            small, j_oh_f, _en = self._chain_kernel_substep(
                s, e_pts, in_pts, has_mover, codes_k,
                u[:, 5, :], u[:, 6, :], switch_ok, cmu, sw_c, minu_c,
            )
            accepts = j_oh_f[:, 1, :]
        else:
            small, accepts, _tt = self._chain_t1(
                s, dE, in_cell, has_mover, codes_k, u[:, 5, :],
                u[:, 6, :], switch_ok,
            )

        pks, tpm_slab = self._apply_t1(
            s, pks, tpm_slab, fc, cand_cells_b, cand_off_b, rank,
            oh_sel, blk_r, p_old, p_new, per, accepts, has_mover,
            trans_type,
        )
        return small, pks, tpm_slab

    def _propose_t1(self, s: CellState, pks, fc, cand_cells_b,
                    cand_off_b, u, fc_local=None, valid=None):
        """Sub-step phase 1 (T=1): mover selection, displacement
        proposal, fine-cell wall, parallel Delta-E of the movers in
        both lattices.  Pure w.r.t. state - no chain coupling - so
        the spatially sharded engine (parallel/spatial.py) runs it
        per device shard on local tables.

        ``fc``: GLOBAL fine ids [K]; ``fc_local``: rows of ``pks``
        holding those cells (None = fc, the unsharded case);
        ``valid``: occupancy mask matching the ``pks`` rows (None =
        from the global slot2mol)."""
        prm, model, cg = self.prm, self.model, self.cellgrid
        L = s.h.shape[0]
        W = s.mu.shape[-1]
        cap = cg.cap
        if fc_local is None:
            fc_local = fc

        (rank, mover_fc, mover_slot, oh_sel, blk_r, p_old, mover_mol,
         has_mover) = self._select_movers(s, pks, fc, u[:, 0, :],
                                          fc_local)

        # displacement: random direction x U(-1,1)*max_trans in the
        # active lattice, same fractional displacement in the partner
        # (mc_water_translation, mc_moves.F90:1021-1067)
        d0 = 2.0 * u[:, 1, :] - 1.0                      # [K,W]
        d1 = 2.0 * u[:, 2, :] - 1.0
        d2 = 2.0 * u[:, 3, :] - 1.0
        inv_norm = jax.lax.rsqrt(
            jnp.maximum(d0 * d0 + d1 * d1 + d2 * d2, 1e-30)
        )
        rmag = (
            (2.0 * u[:, 4, :] - 1.0)
            * s.max_trans[None, :] * inv_norm
        )
        v = jnp.stack([d0 * rmag, d1 * rmag, d2 * rmag])      # [3,K,W]

        recip_ls = _take_lat(s.recip, s.ls)                   # [3,3,W]
        sfrac = _einsum("akw,abw->bkw", v, recip_ls) * (0.5 / jnp.pi)
        tv_all = _einsum("labw,bkw->lakw", s.h, sfrac)        # [L,3,K,W]
        lat_act = (
            jnp.arange(L)[:, None, None, None]
            == s.ls[None, None, None, :]
        )
        transvec = jnp.where(lat_act, v[None], tv_all)
        p_new = p_old + transvec

        # FINE-cell-boundary wall in the MID frame: BOTH endpoints
        # must resolve to the mover's STORED fine cell (symmetric
        # under the reverse move, preserving balance even at f32
        # rounding edges).  The wall must be at the fine cell - the
        # coverage tables reach partners through their stored fine
        # slots, so every molecule has to stay inside the fine cube
        # it was binned into or interacting partners would silently
        # drop out of Delta-E between rebins.
        dmid = 0.5 * jnp.take(
            self.cellaux.dfrac0, jnp.maximum(mover_mol, 0), axis=1
        )                                                     # [3,K,W]
        f_old = _frac_of(s.recip[0], p_old[0]) - dmid         # [3,K,W]
        f_new = _frac_of(s.recip[0], p_new[0]) - dmid
        in_cell = (
            (cell_of_frac(cg, f_old, s.origin, level="fine")
             == mover_fc)
            & (cell_of_frac(cg, f_new, s.origin, level="fine")
               == mover_fc)
        )
        if self.prm.cell_trans_wall > 0.0:
            # displacement wall (round 5): the PROPOSED endpoint must
            # stay within cell_trans_wall of the mover's lattice-1
            # reference site (minimum image).  Walling only the
            # proposal keeps detailed balance exact on the walled
            # support and ratchets any legacy out-of-wall state
            # inward (moves toward the wall interior stay legal).
            fref = jnp.take(
                self.cellaux.fref0, jnp.maximum(mover_mol, 0), axis=1
            )                                              # [3,K,W]
            fd = _frac_of(s.recip[0], p_new[0]) - fref
            fd = fd - jnp.round(fd)
            dsp = _einsum("abw,bkw->akw", s.h[0], fd)
            in_cell = in_cell & (
                jnp.sum(dsp * dsp, axis=0)
                <= self.prm.cell_trans_wall ** 2
            )

        # parallel Delta-E of all K movers in both lattices, against
        # the 27-cell per-fine-cell coverage stencil (the wall keeps
        # both endpoints inside the stored fine cell, so full_cells'
        # r_cov coverage of that cube reaches every partner)
        nslot = pks[0].shape[0] * cap
        if self.use_cell_pallas:
            per = [
                self.mover_kernel(
                    pks[l], s.h[l], cand_cells_b, cand_off_b,
                    fc_local, rank, p_old[l], p_new[l],
                )
                for l in range(L)
            ]
        else:
            if valid is None:
                valid = self._slab_valid(s)
            per = [
                mover_energies(
                    jnp.moveaxis(
                        pks[l][:, PK_R0:PK_R0 + 3], 1, 0
                    ).reshape(3, nslot, W),
                    Moments(*(
                        pks[l][:, i].reshape(nslot, W)
                        for i in range(10)
                    )),
                    valid, s.h[l], cand_cells_b, cand_off_b,
                    cg.full_mask, cap, mover_slot, p_old[l],
                    p_new[l], model,
                )
                for l in range(L)
            ]
        e_old = jnp.stack([p[0] for p in per])                # [L,K,W]
        e_new = jnp.stack([p[1] for p in per])
        dE = e_new - e_old                                    # [L,K,W]
        return (rank, oh_sel, blk_r, p_old, p_new, has_mover,
                in_cell, dE, per)

    def _chain_t1(self, s: CellState, dE, in_cell, has_mover,
                  codes_k, u_acc, u_sw, switch_ok):
        """Sub-step phase 2 (T=1): the exact sequential accept/reject
        chain over the K movers, plus the batched WL/histogram update
        and counters.  Operates on [K, W] tables only - the spatially
        sharded engine runs it REPLICATED on every device after
        all-gathering the per-mover tables into global chain order.

        The chain carries ONLY the scalar fields the acceptance rule
        couples globally (mu, ls, per-lattice energy): a carry that
        dragged the multi-MB slabs/histograms through nwater
        sequential scan steps per cycle dominated runtime on TPU.
        eta lookups use the weight array FROZEN at substep start and
        the <= K WL weight/histogram increments are applied in one
        batched scatter after the chain ("micro-batched WL": within
        one colour sub-step a walker's own weight updates become
        visible only at the sub-step boundary - the same deferred-
        visibility semantics the reference already accepts BETWEEN
        walkers via mpi_sync_int-delayed delta-allreduces,
        comms_mpi.f90:244-277.  Sample runs have frozen weights, so
        there the chain is exactly the serial one.)"""
        prm = self.prm
        W = s.mu.shape[-1]
        dtype = s.mu.dtype
        trans_type = codes_k == TRANS
        sw_type = codes_k == SWITCH
        if prm.mc_always_switch:
            sw_try = trans_type | sw_type
        else:
            sw_try = sw_type

        # micro-batched WL: eta lookups in the T=1 chain use the
        # weight curve FROZEN at sub-step start (see the class
        # docstring); the <= K increments land in one batched
        # scatter after the chain
        weight0 = self._weight_total(s)                # [B, W]
        eta_fn = lambda mu_v: self._eta_from_weight(   # noqa: E731
            s, weight0, mu_v
        )
        two, cmu, sw_c, minu_c = self._hoisted_chain_terms(s)

        def body(carry, xs):
            mu, ls, energy, e_err = carry
            dE_k, tt, swt, has_k, inc_k, ua, uz = xs
            # a trial exists whenever the cell is occupied; the cell
            # wall only vetoes ACCEPTANCE (a rejected trial still
            # counts and still updates the WL histogram at current mu,
            # exactly like any Metropolis rejection)
            enabled = tt & has_k
            ls_next = ls
            if two:
                dmu = (dE_k[0] - dE_k[1]) * prm.beta
                mu_new = mu + dmu
                eta_old = eta_fn(mu)
                eta_new = eta_fn(mu_new)
                dE_ls = _take_lat(dE_k, ls)
                diffkT = prm.beta * dE_ls + eta_new - eta_old
                if prm.minu:
                    # #ifdef MINU: fold a switch to the lower-enthalpy
                    # lattice into the move (mc_moves.F90:1119-1140;
                    # same convention as engine._translate)
                    e_new = energy + e_err + dE_k      # [L,W]
                    g10 = prm.beta * (e_new[1] - e_new[0]) + minu_c
                    lsn = jnp.where(g10 < 0, 1, 0).astype(ls.dtype)
                    E_lsn = jnp.where(lsn == 0, e_new[0], e_new[1])
                    E_cur = jnp.where(
                        ls == 0, energy[0] + e_err[0],
                        energy[1] + e_err[1],
                    )
                    sgn_c = jnp.where(ls == 0, sw_c, -sw_c)
                    alt = (
                        prm.beta * (E_lsn - E_cur)
                        + eta_new - eta_old + sgn_c
                    )
                    diffkT = jnp.where(lsn != ls, alt, diffkT)
                    ls_next = lsn
            else:
                dmu = jnp.zeros((W,), dtype=dtype)
                mu_new = mu
                diffkT = prm.beta * dE_k[0]

            ok = jnp.isfinite(diffkT)
            if two:
                ok = ok & jnp.isfinite(mu_new)
            accept = enabled & inc_k & ok & (ua < jnp.exp(-diffkT))

            # compensated accumulation: at N ~ 10^4 the per-move dE is
            # the same size as ulp(total) in f32 - a plain add
            # quantises and drifts (CellState.energy_err)
            e_hi, e_rnd = _two_sum(energy, dE_k)
            e_lo = e_err + e_rnd
            e_hi2, e_lo2 = _two_sum(e_hi, e_lo)
            energy = jnp.where(accept[None, :], e_hi2, energy)
            e_err = jnp.where(accept[None, :], e_lo2, e_err)
            mu = jnp.where(accept, mu_new, mu)
            if two and prm.minu:
                ls = jnp.where(accept, ls_next, ls)
            mu_trans = mu          # mu after the translation trial:
            healthy = jnp.all(jnp.isfinite(energy), axis=0)
            # switch attempt after the move (mc_always_switch,
            # mc_cycle:243-249), or a scheduled switch trial
            sw_acc = jnp.zeros((W,), dtype=bool)
            sw_en = jnp.zeros((W,), dtype=bool)
            if two and (prm.mc_always_switch or prm.allow_switch):
                sw_en = switch_ok & swt
                lsn = 1 - ls
                # dsw = sgn * (beta*(E1 - E0) + sw_c): the volume and
                # leshift terms are the hoisted loop invariants above
                de10 = prm.beta * (
                    (energy[1] - energy[0]) + (e_err[1] - e_err[0])
                )
                dsw = jnp.where(ls == 0, de10 + sw_c, -(de10 + sw_c))
                sw_acc = sw_en & jnp.isfinite(dsw) & (
                    uz < jnp.exp(-dsw)
                )
                ls = jnp.where(sw_acc, lsn, ls)
                # refresh mu from scratch on accept (1578-1588);
                # beta*(E0 - E1) + cmu == self._mu_scratch(energy, vol0)
                mu = jnp.where(sw_acc, cmu - de10, mu)
            out = (accept, enabled, mu_trans, healthy, dmu,
                   sw_acc, sw_en)
            return (mu, ls, energy, e_err), out

        xs = (
            jnp.moveaxis(dE, 1, 0),                    # [K,L,W]
            trans_type, sw_try, has_mover, in_cell,
            u_acc, u_sw,
        )
        # fully unrolled: the body is a handful of [W]-sized ops, and
        # per-iteration loop overhead on the remote-TPU platform is
        # ~0.3 ms (DESIGN.md §6) - an un-unrolled inner chain costs
        # nwater such iterations per cycle
        (mu_f, ls_f, energy_f, err_f), outs = jax.lax.scan(
            body, (s.mu, s.ls, s.energy, s.energy_err), xs,
            unroll=True,
        )
        (accepts, enabled_t, mu_t, healthy_t, dmu_t,
         sw_acc_t, sw_en_t) = outs                     # each [K,W]

        # ---- batched WL/histogram update for the K trials
        # (mc_update_wl_bins semantics, applied per trial in recorded
        # chain order; identical sums since the bin grid is static)
        small = s._replace(mu=mu_f, ls=ls_f, energy=energy_f,
                           energy_err=err_f)
        small = self._wl_update_batch(
            small, mu_t, enabled_t & healthy_t
        )

        # counters (mc_moves.F90:1156-1159) and dmu extrema
        en_i = jnp.sum(enabled_t, axis=0, dtype=jnp.int32)
        ac_i = jnp.sum(accepts, axis=0, dtype=jnp.int32)
        admu = jnp.abs(dmu_t)
        admu_acc = jnp.where(accepts, admu, jnp.inf)
        min_dmu = jnp.minimum(small.min_dmu, jnp.min(admu_acc, axis=0))
        admu_acc0 = jnp.where(accepts, admu, 0.0)
        max_dmu = jnp.maximum(small.max_dmu, jnp.max(admu_acc0, axis=0))
        small = small._replace(
            att=small.att.at[TRANS].add(en_i)
                .at[SWITCH].add(
                    jnp.sum(sw_en_t, axis=0, dtype=jnp.int32)
                ),
            acc=small.acc.at[TRANS].add(ac_i)
                .at[SWITCH].add(
                    jnp.sum(sw_acc_t, axis=0, dtype=jnp.int32)
                ),
            min_dmu=min_dmu, max_dmu=max_dmu,
        )
        return small, accepts, trans_type

    def _apply_t1(self, s: CellState, pks, tpm_slab, fc,
                  cand_cells_b, cand_off_b, rank, oh_sel, blk_r,
                  p_old, p_new, per, accepts, has_mover, trans_type):
        """Sub-step phase 3 (T=1): apply accepted movers to the
        packed slabs (independent, so parallel application equals the
        sequential composition).  All writes are fine-cell block
        updates at the static block/coverage tables; same-colour
        stencils are disjoint (see __init__), so every scatter below
        has UNIQUE indices.  ``fc`` here indexes the rows of ``pks``
        (device-LOCAL in the spatially sharded engine); ``accepts``,
        ``has_mover`` and ``trans_type`` must be sliced to the same
        movers."""
        cap = self.cellgrid.cap
        L = len(pks)
        W = pks[0].shape[-1]
        nslot = tpm_slab.shape[0]
        accf = accepts                                          # [K,W]
        mask_acc = accf[:, None, :] & oh_sel                # [K,cap,W]

        if self.use_cell_pallas and self.use_cell_apply:
            # in-place apply kernel: recomputes the accepted movers'
            # deltas, updates the packed moment rows AND moves the
            # accepted movers' coordinate rows to p_new, all through
            # one aliased output per lattice - the scan carry is
            # mutated ONLY by this kernel, so XLA keeps it in place
            # (an XLA scatter on the carry forced a full-slab copy
            # per sub-step).  Equivalent to the scatter path below
            # because same-colour stencils are disjoint.
            pks = [
                self.apply_kernel(
                    pks[l], s.h[l], cand_cells_b, cand_off_b,
                    fc, rank, accf, p_old[l], p_new[l], per[l][2],
                )
                for l in range(L)
            ]
        else:
            # XLA path: block set of the moved coordinates, block
            # scatter of the movers' leg deltas into their coverage
            # fine cells, then block one-hot set of the movers' own
            # moments.  The coordinate rows already hold the
            # POST-move positions when the deltas land - exact (each
            # mover is self-masked in its own stencil and absent from
            # every other same-colour stencil; see MoverApplyPallas)
            dp = p_new - p_old                          # [L,3,K,W]
            blk_new = blk_r + jnp.where(
                mask_acc[None, None], dp[:, :, :, None, :], 0.0
            )                                     # [L,3,K,cap,W]
            pks = [
                pks[l].at[fc, PK_R0:PK_R0 + 3].set(
                    jnp.moveaxis(blk_new[l], 0, 1),
                    unique_indices=True,
                )
                for l in range(L)
            ]
            pks = self._scatter_moments(
                pks, per, cand_cells_b, accf, mask_acc, fc, L, cap, W,
            )

        # per-slot trial counter (gathered to molecule order once per
        # cycle by _one_cycle)
        inc = (
            trans_type[:, None, None] & has_mover[:, None, :] & oh_sel
        ).astype(jnp.int32)
        tpm_slab = tpm_slab.reshape(-1, cap, W).at[fc].add(
            inc, unique_indices=True
        ).reshape(nslot, W)

        return pks, tpm_slab

    def _substep_multi(self, s: CellState, pks, tpm_slab, fc,
                       cand_cells_b, cand_off_b, u, codes_kt,
                       switch_ok):
        """Multi-trial (colour, fine-block) sub-step: T = cell_trials
        Metropolis trials per scheduled mover per coverage-stencil
        fetch.

        The sub-step is HBM-bandwidth-bound (DESIGN.md 5b): the
        candidate blocks fetched to evaluate one trial price T trials
        almost for free IF every evaluation point is known before any
        accept decision.  They are, under the ANCHORED-WINDOW
        proposal:

          * draw an anchor offset a ~ U(-mt, mt)^3 (mt = max_trans,
            active-lattice Cartesian) and set z = x0 + a, where x0 is
            the mover's current position;
          * draw T candidates y_t = z + U(-mt, mt)^3;
          * trial t proposes y_t from the current point
            x in {x0, y_1, .., y_(t-1)} and accepts with the plain
            Metropolis ratio min(1, exp(-[beta dE + d_eta])).

        Exactness: augment the target with the anchor,
        pi(x, z) = pi(x) u(z - x), u = the uniform cube of half-width
        mt.  Drawing a is an exact Gibbs refresh of z | x; each trial
        is Metropolis-Hastings for pi(x | z) with proposal density
        q(y) = u(y - z) INDEPENDENT of the current point, so the
        Hastings factor q(x)/q(y) = 1 whenever both points lie in the
        cube around z - and every reachable point does (x0 by the
        Gibbs draw, candidates by construction).  Each trial
        therefore preserves pi(. | z), the composite preserves the
        joint, and the x-marginal is pi.  The fine-cell wall
        multiplies pi by a state-only indicator exactly as in the
        single-trial sub-step.  cell_trials > 1 changes the PROPOSAL
        law (T=1 uses the reference's direction x uniform-radius
        draw, mc_moves.F90:1021-1039), not the stationary
        distribution.  Chain order: all T trials of mover k run
        consecutively (k ascending), each followed by its
        always-switch attempt, exactly like T=1.

        Energies at all P = T+1 points per mover come from ONE pass
        over the coverage stencil (ops/cell_pallas.MoverPointsPallas
        or ops/cell_energy.mover_point_energies): e(t) is the mover's
        local energy in the world where it sits at point t, so
        dE(j -> t) = e(t) - e(j) for ANY pair - precomputed and
        path-independent, which is what lets the accept chain run on
        a lookup table.  ``u`` slots: [0] selection, [1:4] anchor,
        [4:4+3T] candidates, [4+3T:4+4T] accept, [4+4T:4+5T] switch.
        ``codes_kt``: [K*T] move-type codes, trial (k, t) at k*T + t.
        """
        K = self.K
        T = self.T
        W = s.mu.shape[-1]

        (rank, oh_sel, blk_r, p_old, pts, in_cell, has_mover, e,
         owns, cs) = self._propose_tm(s, pks, fc, cand_cells_b,
                                      cand_off_b, u)

        two, cmu, sw_c, minu_c = self._hoisted_chain_terms(s)
        if self.use_chain_kernel:
            small, j_oh_f, en_per_mover = self._chain_kernel_substep(
                s, e, in_cell, has_mover, codes_kt,
                u[:, 4 + 3 * T:4 + 4 * T, :].reshape(K * T, W),
                u[:, 4 + 4 * T:4 + 5 * T, :].reshape(K * T, W),
                switch_ok, cmu, sw_c, minu_c,
            )
        else:
            small, j_oh_f, en_per_mover = self._chain_xla_substep(
                s, e, in_cell, has_mover, codes_kt, u, switch_ok,
                two, cmu, sw_c, minu_c,
            )

        pks = self._apply_tm(
            s, pks, fc, cand_cells_b, cand_off_b, rank, oh_sel,
            blk_r, p_old, pts, owns, cs, j_oh_f,
        )

        # per-slot trial counter: all enabled translation trials of
        # the mover land on its slot
        cap = self.cellgrid.cap
        nslot = tpm_slab.shape[0]
        inc = en_per_mover[:, None, :] * oh_sel.astype(jnp.int32)
        tpm_slab = tpm_slab.reshape(-1, cap, W).at[fc].add(
            inc, unique_indices=True
        ).reshape(nslot, W)

        return small, pks, tpm_slab

    def _propose_tm(self, s: CellState, pks, fc, cand_cells_b,
                    cand_off_b, u, fc_local=None, valid=None):
        """Multi-trial phase 1: mover selection, the anchored-window
        candidate points, per-point fine-cell wall and the P-point
        energy table in both lattices.  Pure w.r.t. state (no chain
        coupling), so the spatially sharded engine runs it per device
        shard on local tables (``fc_local``/``valid`` as in
        _propose_t1).

        Returns (rank, oh_sel, blk_r, p_old, pts [P,L,3,K,W],
        in_cell [P,K,W], has_mover [K,W], e [L,P,K,W], owns
        (per lattice: P Moments [K,W]), cs (XLA path per-candidate
        structures, None under the points kernel))."""
        prm, model, cg = self.prm, self.model, self.cellgrid
        L = s.h.shape[0]
        W = s.mu.shape[-1]
        # K here is the LOCAL mover count (fc rows): the spatially
        # sharded engine passes padded per-device schedules whose
        # K_loc differs from the canonical self.K
        K, cap = fc.shape[0], cg.cap
        T = self.T
        P = T + 1
        dtype = pks[0].dtype
        if fc_local is None:
            fc_local = fc

        (rank, mover_fc, mover_slot, oh_sel, blk_r, p_old, mover_mol,
         has_mover) = self._select_movers(s, pks, fc, u[:, 0, :],
                                          fc_local)

        # anchored-window candidate displacements from x0 in the
        # active lattice: v_t = a + b_t with a, b_t ~ U(-mt, mt)^3
        mt = s.max_trans[None, None, None, :]          # [1,1,1,W]
        anc = jnp.moveaxis(
            2.0 * u[:, 1:4, :] - 1.0, 1, 0
        )[None]                                        # [1,3,K,W]
        b_t = jnp.transpose(
            (2.0 * u[:, 4:4 + 3 * T, :] - 1.0).reshape(K, T, 3, W),
            (1, 2, 0, 3),
        )                                              # [T,3,K,W]
        v = (anc + b_t) * mt                           # [T,3,K,W]

        # same fractional displacement in the partner lattice
        # (mc_water_translation, mc_moves.F90:1042-1067); the partner
        # map is additive, so every candidate's partner position is
        # path-independent: p_partner(t) = p_partner(0) + M v_t
        recip_ls = _take_lat(s.recip, s.ls)            # [3,3,W]
        sfrac = jnp.einsum(
            "takw,abw->tbkw", v, recip_ls
        ) * (0.5 / jnp.pi)
        tv_all = jnp.einsum("labw,tbkw->tlakw", s.h, sfrac)
        lat_act = (
            jnp.arange(L)[:, None, None, None]
            == s.ls[None, None, None, :]
        )
        transvec = jnp.where(lat_act[None], v[:, None], tv_all)
        pts = jnp.concatenate(
            [p_old[None], p_old[None] + transvec], axis=0
        )                                              # [P,L,3,K,W]

        # fine-cell wall per point (see _substep); the trial gate is
        # in_cell[current] & in_cell[proposal], symmetric at f32
        # rounding edges exactly like the two-endpoint T=1 check
        dmid = 0.5 * jnp.take(
            self.cellaux.dfrac0, jnp.maximum(mover_mol, 0), axis=1
        )                                              # [3,K,W]

        def in_cell_of(p0):
            fmid = _frac_of(s.recip[0], p0) - dmid
            return (
                cell_of_frac(cg, fmid, s.origin, level="fine")
                == mover_fc
            )

        in_cell = jax.vmap(in_cell_of)(pts[:, 0])      # [P,K,W]
        if self.prm.cell_trans_wall > 0.0:
            # displacement wall on the TRIAL points (point 0 = the
            # current position is exempt: states are inside by
            # induction, and a legacy out-of-wall state must keep its
            # inward moves legal) — see the T=1 gate above
            fref = jnp.take(
                self.cellaux.fref0, jnp.maximum(mover_mol, 0), axis=1
            )                                          # [3,K,W]

            def wall_of(p0):
                fd = _frac_of(s.recip[0], p0) - fref
                fd = fd - jnp.round(fd)
                dsp = _einsum("abw,bkw->akw", s.h[0], fd)
                return (jnp.sum(dsp * dsp, axis=0)
                        <= self.prm.cell_trans_wall ** 2)

            wall = jax.vmap(wall_of)(pts[:, 0])        # [P,K,W]
            in_cell = in_cell & wall.at[0].set(True)

        # local energies of all K movers at all P points, one stencil
        # pass per lattice
        cs = None
        if self.use_cell_pallas:
            per = [
                self.points_kernel(
                    pks[l], s.h[l], cand_cells_b, cand_off_b,
                    fc_local, rank, jnp.moveaxis(pts[:, l], 0, 1),
                )
                for l in range(L)
            ]
        else:
            nslot = pks[0].shape[0] * cap
            if valid is None:
                valid = self._slab_valid(s)
            per = [
                mover_point_energies(
                    jnp.moveaxis(
                        pks[l][:, PK_R0:PK_R0 + 3], 1, 0
                    ).reshape(3, nslot, W),
                    Moments(*(
                        pks[l][:, i].reshape(nslot, W)
                        for i in range(10)
                    )),
                    valid, s.h[l], cand_cells_b, cand_off_b,
                    cg.full_mask, cap, mover_slot, pts[:, l], model,
                )
                for l in range(L)
            ]
            cs = [p[2] for p in per]
        e = jnp.stack([p[0] for p in per])             # [L,P,K,W]
        owns = [p[1] for p in per]     # per lattice: P Moments [K,W]
        return (rank, oh_sel, blk_r, p_old, pts, in_cell, has_mover,
                e, owns, cs)

    def _apply_tm(self, s: CellState, pks, fc, cand_cells_b,
                  cand_off_b, rank, oh_sel, blk_r, p_old, pts, owns,
                  cs, j_oh_f):
        """Multi-trial phase 3: apply each mover's FINAL point (one
        apply per T trials; the accepted point's net moment update
        equals the point-0 -> point-j delta, path-independently).
        ``fc`` indexes the rows of ``pks`` (device-LOCAL in the
        spatially sharded engine)."""
        cg = self.cellgrid
        cap = cg.cap
        L = len(pks)
        K = j_oh_f.shape[0]
        P = j_oh_f.shape[1]
        W = pks[0].shape[-1]
        dtype = pks[0].dtype
        jf = j_oh_f.astype(dtype)                       # [K,P,W]
        jf_p = jnp.moveaxis(jf, 1, 0)                   # [P,K,W]
        p_fin = jnp.sum(pts * jf_p[:, None, None], axis=0)
        #                                               # [L,3,K,W]
        accf = jnp.logical_not(j_oh_f[:, 0, :])         # [K,W]
        mask_acc = accf[:, None, :] & oh_sel        # [K,cap,W]

        def mix_moments(fields_p):
            # one-hot mixture of the P per-point Moments at the
            # accepted point
            return Moments(*(
                jnp.sum(
                    jnp.stack([m[i] for m in fields_p]) * jf_p,
                    axis=0,
                )
                for i in range(10)
            ))

        if self.use_cell_pallas and self.use_cell_apply:
            pks = [
                self.apply_kernel(
                    pks[l], s.h[l], cand_cells_b, cand_off_b, fc,
                    rank, accf, p_old[l], p_fin[l],
                    mix_moments(owns[l]),
                )
                for l in range(L)
            ]
        else:
            # XLA path: coordinate block set + mixture-of-point
            # deltas (delta(point 0) contributes zero to new - old)
            dp = p_fin - p_old                          # [L,3,K,W]
            blk_new = blk_r + jnp.where(
                mask_acc[None, None], dp[:, :, :, None, :], 0.0
            )
            pks = [
                pks[l].at[fc, PK_R0:PK_R0 + 3].set(
                    jnp.moveaxis(blk_new[l], 0, 1),
                    unique_indices=True,
                )
                for l in range(L)
            ]
            CF = cand_cells_b.shape[1]
            cand_flat = jnp.asarray(cand_cells_b).reshape(-1)
            acc_b = accf[:, None, None, None, :]
            new_pks = []
            for l in range(L):
                d0 = cs[l][0].delta()
                d_fields = []
                for i in range(10):
                    stack_t = jnp.stack([
                        cs[l][t].delta()[i] - d0[i]
                        for t in range(1, P)
                    ])                                  # [T,K,C,W]
                    d_fields.append(jnp.sum(
                        stack_t * jf_p[1:, :, None, :], axis=0
                    ))                                  # [K,C,W]
                d_stack = jnp.stack([
                    f.reshape(K, CF, cap, W) for f in d_fields
                ], axis=2)                          # [K,CF,10,cap,W]
                new_pks.append(self._scatter_moments_one(
                    pks[l], jnp.where(acc_b, d_stack, 0.0),
                    mix_moments(owns[l]), cand_flat, mask_acc, fc,
                    cap, W,
                ))
            pks = new_pks
        return pks

    def _chain_xla_substep(self, s: CellState, e, in_cell, has_mover,
                           codes_kt, u, switch_ok, two, cmu, sw_c,
                           minu_c=None):
        """XLA implementation of the K x T multi-trial chain with
        PER-MOVE WL - the chain kernel's equivalence oracle and the
        fallback on non-disjoint grids / CPU.  The scan carries the
        WL slabs so every trial's eta lookup and weight/histogram
        update follows the reference's per-move cadence exactly
        (engine._wl_update does the update on a patched state view).

        Returns (small, j_oh [K,P,W] bool accepted-point one-hot,
        en_per_mover [K,W] int32 translation-attempt counts)."""
        prm = self.prm
        K, T = self.K, self.T
        P = T + 1
        W = s.mu.shape[-1]
        dtype = e.dtype
        trans_kt = (codes_kt == TRANS).reshape(K, T)
        sw_kt = (codes_kt == SWITCH).reshape(K, T)
        iota_p = jnp.arange(P, dtype=jnp.int32)[:, None]    # [P,1]
        basew = None
        if two:
            basew = ds_value(s.master_eta)[s.window_id].T.astype(
                dtype
            )                                               # [B,W]
        s0 = s

        def body(carry, xs):
            mu, ls, energy, e_err, wgt, hist, uhist, f, sumh = carry
            e_k, inc_k, tt_t, swt_t, has_k, ua_t, uz_t = xs
            # e_k [L,P,W]; inc_k [P,W]; tt/swt [T]; ua/uz [T,W]
            j_oh = jnp.broadcast_to(iota_p == 0, (P, W))
            outs_t = []
            for t in range(1, P):
                tt = tt_t[t - 1]
                swt = swt_t[t - 1]
                if prm.mc_always_switch:
                    sw_try = tt | swt
                else:
                    sw_try = swt
                jf = j_oh.astype(dtype)
                e_cur = jnp.sum(e_k * jf[None], axis=1)     # [L,W]
                in_cur = jnp.any(j_oh & inc_k, axis=0)      # [W]
                dE_k = e_k[:, t] - e_cur                    # [L,W]
                enabled = tt & has_k
                inc_ok = in_cur & inc_k[t]
                ls_next = ls
                if two:
                    dmu = (dE_k[0] - dE_k[1]) * prm.beta
                    mu_new = mu + dmu
                    wtot = wgt + basew      # CURRENT weight view
                    eta_old = self._eta_from_weight(s0, wtot, mu)
                    eta_new = self._eta_from_weight(s0, wtot, mu_new)
                    dE_ls = _take_lat(dE_k, ls)
                    diffkT = prm.beta * dE_ls + eta_new - eta_old
                    if prm.minu:
                        # #ifdef MINU fold-in (mc_moves.F90:1119-1140;
                        # engine._translate convention)
                        e_new = energy + e_err + dE_k
                        g10 = (
                            prm.beta * (e_new[1] - e_new[0]) + minu_c
                        )
                        lsn = jnp.where(g10 < 0, 1, 0).astype(
                            ls.dtype
                        )
                        E_lsn = jnp.where(
                            lsn == 0, e_new[0], e_new[1]
                        )
                        E_cur = jnp.where(
                            ls == 0, energy[0] + e_err[0],
                            energy[1] + e_err[1],
                        )
                        sgn_c = jnp.where(ls == 0, sw_c, -sw_c)
                        alt = (
                            prm.beta * (E_lsn - E_cur)
                            + eta_new - eta_old + sgn_c
                        )
                        diffkT = jnp.where(lsn != ls, alt, diffkT)
                        ls_next = lsn
                else:
                    dmu = jnp.zeros((W,), dtype=dtype)
                    mu_new = mu
                    diffkT = prm.beta * dE_k[0]
                ok = jnp.isfinite(diffkT)
                if two:
                    ok = ok & jnp.isfinite(mu_new)
                accept = (
                    enabled & inc_ok & ok
                    & (ua_t[t - 1] < jnp.exp(-diffkT))
                )
                # compensated accumulation (CellState.energy_err)
                e_hi, e_rnd = _two_sum(energy, dE_k)
                e_lo = e_err + e_rnd
                e_hi2, e_lo2 = _two_sum(e_hi, e_lo)
                energy = jnp.where(accept[None, :], e_hi2, energy)
                e_err = jnp.where(accept[None, :], e_lo2, e_err)
                mu = jnp.where(accept, mu_new, mu)
                if two and prm.minu:
                    ls = jnp.where(accept, ls_next, ls)
                j_oh = jnp.where(accept[None, :], iota_p == t, j_oh)

                # per-move WL at mu after the trial (engine._wl_update
                # applies the eq/health/occ-overflow gates internally)
                st = s0._replace(
                    mu=mu, energy=energy, weight=wgt, hist=hist,
                    uhist=uhist, f=f, sumhist=sumh,
                )
                st = self._wl_update(st, enabled=enabled)
                wgt, hist, uhist, f, sumh = (
                    st.weight, st.hist, st.uhist, st.f, st.sumhist
                )

                sw_acc = jnp.zeros((W,), dtype=bool)
                sw_en = jnp.zeros((W,), dtype=bool)
                if two and (prm.mc_always_switch or prm.allow_switch):
                    sw_en = switch_ok & sw_try
                    lsn = 1 - ls
                    de10 = prm.beta * (
                        (energy[1] - energy[0])
                        + (e_err[1] - e_err[0])
                    )
                    dsw = jnp.where(
                        ls == 0, de10 + sw_c, -(de10 + sw_c)
                    )
                    sw_acc = sw_en & jnp.isfinite(dsw) & (
                        uz_t[t - 1] < jnp.exp(-dsw)
                    )
                    ls = jnp.where(sw_acc, lsn, ls)
                    mu = jnp.where(sw_acc, cmu - de10, mu)
                outs_t.append((accept, enabled, dmu, sw_acc, sw_en))
            out = tuple(jnp.stack(z) for z in zip(*outs_t))
            return ((mu, ls, energy, e_err, wgt, hist, uhist, f,
                     sumh), out + (j_oh,))

        xs = (
            jnp.moveaxis(e, 2, 0),                      # [K,L,P,W]
            jnp.moveaxis(in_cell, 1, 0),                # [K,P,W]
            trans_kt, sw_kt, has_mover,
            u[:, 4 + 3 * T:4 + 4 * T, :],               # [K,T,W]
            u[:, 4 + 4 * T:4 + 5 * T, :],
        )
        carry0 = (s.mu, s.ls, s.energy, s.energy_err, s.weight,
                  s.hist, s.uhist, s.f, s.sumhist)
        carry, outs = jax.lax.scan(body, carry0, xs, unroll=True)
        (mu_f, ls_f, energy_f, err_f, wgt_f, hist_f, uhist_f, f_f,
         sumh_f) = carry
        (accepts, enabled_t, dmu_t, sw_acc_t, sw_en_t, j_oh_f) = outs
        #                         trials [K,T,W]; j_oh [K,P,W] bool

        admu = jnp.abs(dmu_t)
        admu_acc = jnp.where(accepts, admu, jnp.inf)
        admu_acc0 = jnp.where(accepts, admu, 0.0)
        small = s._replace(
            mu=mu_f, ls=ls_f, energy=energy_f, energy_err=err_f,
            weight=wgt_f,
            hist=hist_f, uhist=uhist_f, f=f_f, sumhist=sumh_f,
            att=s.att.at[TRANS].add(
                    jnp.sum(enabled_t, axis=(0, 1), dtype=jnp.int32)
                ).at[SWITCH].add(
                    jnp.sum(sw_en_t, axis=(0, 1), dtype=jnp.int32)
                ),
            acc=s.acc.at[TRANS].add(
                    jnp.sum(accepts, axis=(0, 1), dtype=jnp.int32)
                ).at[SWITCH].add(
                    jnp.sum(sw_acc_t, axis=(0, 1), dtype=jnp.int32)
                ),
            min_dmu=jnp.minimum(
                s.min_dmu, jnp.min(admu_acc, axis=(0, 1))
            ),
            max_dmu=jnp.maximum(
                s.max_dmu, jnp.max(admu_acc0, axis=(0, 1))
            ),
        )
        en_per_mover = jnp.sum(enabled_t, axis=1, dtype=jnp.int32)
        return small, j_oh_f, en_per_mover

    def _chain_kernel_substep(self, s: CellState, e, in_cell,
                              has_mover, codes_kt, ua, uz, switch_ok,
                              cmu, sw_c, minu_c=None):
        """Fused-kernel chain (mcmc/chain_pallas.py): same semantics
        as _chain_xla_substep, with the WL slabs VMEM-resident for
        the whole K x T chain.  ``ua``/``uz`` [K*T, W] accept/switch
        uniforms (callers slice their own uniform blocks: the
        multi-trial sub-step's layout differs from T=1's).  Returns
        the same triple."""
        from .chain_pallas import (
            CF_CMU, CF_E0, CF_E0E, CF_E1, CF_E1E, CF_F, CF_MAX_DMU,
            CF_MIN_DMU, CF_MINUC, CF_MU, CF_MU_MAX, CF_MU_MIN,
            CF_ROWS, CF_SUMHIST, CF_SWC,
            CI_END, CI_INVT, CI_INWIN, CI_LS, CI_OCCOK, CI_ROWS,
            CI_START, CI_SWOK, CN_ACC, CN_EN, CN_FIXED, CN_SWACC,
            CN_SWEN, FL_CYCLE, FL_WL_ACTIVE,
        )
        prm, grid = self.prm, self.grid
        K, T = self.K, self.T
        P = T + 1
        W = s.mu.shape[-1]
        dtype = e.dtype

        cf_rows = [None] * CF_ROWS
        cf_rows[CF_MU] = s.mu
        cf_rows[CF_E0] = s.energy[0]
        cf_rows[CF_E1] = s.energy[1]
        cf_rows[CF_E0E] = s.energy_err[0]
        cf_rows[CF_E1E] = s.energy_err[1]
        cf_rows[CF_F] = s.f
        cf_rows[CF_SUMHIST] = s.sumhist
        cf_rows[CF_MIN_DMU] = s.min_dmu
        cf_rows[CF_MAX_DMU] = s.max_dmu
        cf_rows[CF_MU_MIN] = jnp.broadcast_to(
            jnp.asarray(s.my_mu_min, dtype=dtype), (W,)
        )
        cf_rows[CF_MU_MAX] = jnp.broadcast_to(
            jnp.asarray(s.my_mu_max, dtype=dtype), (W,)
        )
        cf_rows[CF_CMU] = cmu
        cf_rows[CF_SWC] = sw_c
        cf_rows[CF_MINUC] = (
            minu_c if minu_c is not None else jnp.zeros_like(cmu)
        )
        cf = jnp.stack([r.astype(dtype) for r in cf_rows])

        ci_rows = [None] * CI_ROWS
        ci_rows[CI_LS] = s.ls
        ci_rows[CI_START] = jnp.broadcast_to(
            jnp.asarray(s.start_bin), (W,)
        )
        ci_rows[CI_END] = jnp.broadcast_to(
            jnp.asarray(s.end_bin), (W,)
        )
        ci_rows[CI_INWIN] = s.in_window
        ci_rows[CI_INVT] = jnp.broadcast_to(
            jnp.asarray(s.invt_active), (W,)
        )
        ci_rows[CI_OCCOK] = s.occ_overflow == 0
        ci_rows[CI_SWOK] = switch_ok
        ci = jnp.stack([r.astype(jnp.int32) for r in ci_rows])

        flags = jnp.stack([
            (s.cycle >= prm.eq_mc_cycles).astype(jnp.int32)
            if hasattr(s.cycle, "dtype")
            else jnp.asarray(
                int(s.cycle >= prm.eq_mc_cycles), jnp.int32
            ),
            jnp.asarray(s.cycle, jnp.int32),
        ])

        basew = ds_value(s.master_eta)[s.window_id].T.astype(dtype)
        baseh = ds_value(s.master_hist)[s.window_id].T.astype(dtype)
        binw = grid.binwidth[:, None].astype(dtype)
        mub = grid.mu_bin[:, None].astype(dtype)
        e_rows = jnp.moveaxis(e, 1, 2).reshape(2 * K * P, W)
        inc_rows = jnp.moveaxis(in_cell, 0, 1).reshape(
            K * P, W
        ).astype(dtype)
        hasm = has_mover.astype(dtype)

        cf2, ci2, wgt2, hist2, uh2, joh, cnt = self.chain_kernel(
            codes_kt, flags, cf, ci, s.weight, s.hist, s.uhist,
            basew, baseh, binw, mub, e_rows, inc_rows, hasm, ua, uz,
        )

        small = s._replace(
            mu=cf2[CF_MU],
            energy=jnp.stack([cf2[CF_E0], cf2[CF_E1]]),
            energy_err=jnp.stack([cf2[CF_E0E], cf2[CF_E1E]]),
            f=cf2[CF_F], sumhist=cf2[CF_SUMHIST],
            min_dmu=cf2[CF_MIN_DMU], max_dmu=cf2[CF_MAX_DMU],
            ls=ci2[CI_LS].astype(s.ls.dtype),
            weight=wgt2, hist=hist2, uhist=uh2,
            att=s.att.at[TRANS].add(cnt[CN_EN])
                .at[SWITCH].add(cnt[CN_SWEN]),
            acc=s.acc.at[TRANS].add(cnt[CN_ACC])
                .at[SWITCH].add(cnt[CN_SWACC]),
        )
        j_oh_f = joh.reshape(K, P, W) > 0.5
        return small, j_oh_f, cnt[CN_FIXED:]

    def _scatter_moments(self, pks, per, cand_cells_b, accf, mask_acc,
                         fc, L, cap, W):
        """XLA moment update: materialised deltas + ONE block
        scatter-add of all 10 fields into the packed slab rows 0:10,
        then a one-hot block set of the movers' own moments."""
        K, CF = cand_cells_b.shape
        cand_flat = cand_cells_b.reshape(-1)            # [K*CF]
        out = []
        for l in range(L):
            if self.use_cell_pallas:
                # kernel returns the per-candidate deltas new - old
                # ([K, CF, cap, W]) and the mover's own new moments
                d_stack = jnp.stack(list(per[l][3]), axis=2)
                #                                  [K,CF,10,cap,W]
                acc_b = accf[:, None, None, None, :]
                own = per[l][2]
            else:
                _, _, co, cn = per[l]
                d_stack = jnp.stack([
                    (fn - fo).reshape(K, -1, cap, W)
                    for fo, fn in zip(co.delta(), cn.delta())
                ], axis=2)                         # [K,CF,10,cap,W]
                acc_b = accf[:, None, None, None, :]
                own = cn.own
            out.append(self._scatter_moments_one(
                pks[l], jnp.where(acc_b, d_stack, 0.0), own,
                cand_flat, mask_acc, fc, cap, W,
            ))
        return out

    def _scatter_moments_one(self, pk_l, dlt, own, cand_flat,
                             mask_acc, fc, cap, W):
        """Shared tail of the XLA moment update for ONE lattice:
        block scatter-add of the (already acceptance-masked)
        per-candidate deltas dlt [K,CF,10,cap,W], then the one-hot
        block set of the movers' own moments."""
        KCF = cand_flat.shape[0]
        upd = pk_l.at[cand_flat, 0:10].add(
            dlt.reshape(KCF, 10, cap, W),
            unique_indices=self.scatter_unique,
        )
        own_stack = jnp.stack(list(own), axis=1)        # [K,10,W]
        blk = jnp.where(
            mask_acc[:, None], own_stack[:, :, None, :],
            upd[fc, 0:10],
        )                                            # [K,10,cap,W]
        return upd.at[fc, 0:10].set(blk, unique_indices=True)

    # ------------------------------------------------------------------
    # batched Wang-Landau update for K recorded trials
    # ------------------------------------------------------------------

    def _wl_healthy(self, s) -> jnp.ndarray:
        """Volume moves run the inherited Engine._wl_update; extend
        its health gate with the slab-overflow audit so a corrupt
        walker (two molecules sharing a slot after an overflowing
        rebin) never contributes to the SHARED WL arrays before the
        block-boundary abort (see _wl_update_batch)."""
        return super()._wl_healthy(s) & (s.occ_overflow == 0)

    def _wl_update_batch(self, s: CellState, mu_t, enabled_t):
        """mc_update_wl_bins (mc_moves.F90:1597-1689) applied to the K
        trials of one colour sub-step in a single batched scatter.

        mu_t: [K, W] mu after each translation trial (chain order);
        enabled_t: [K, W] trial-performed-and-healthy mask.  Histogram
        and unbiased-histogram sums are identical to per-move updates
        (the bin grid is static); the WL weight increment uses the
        sub-step-constant f, the micro-batching documented in
        ``_substep``.
        """
        prm, grid = self.prm, self.grid
        if prm.num_lattices != 2:
            return s
        B = grid.nbins
        dtype = s.r.dtype

        # a walker whose slab overflowed capacity is corrupt (two
        # molecules share a slot): keep its trials out of the SHARED
        # WL arrays so delta-sync cannot spread the poison before the
        # block-boundary audit aborts the run
        active = (
            enabled_t
            & (s.cycle >= prm.eq_mc_cycles)
            & (s.occ_overflow == 0)
        )
        k = mu_to_bin(grid, mu_t)                          # [K,W]
        in_grid = (k >= 0) & (k < B)
        kc = jnp.clip(k, 0, B - 1)
        upd = (in_grid & active).astype(dtype)             # [K,W]
        bin_ids = jnp.arange(B)
        oh = (
            bin_ids[None, :, None] == kc[:, None, :]
        ).astype(dtype) * upd[:, None, :]                  # [K,B,W]
        incr = grid.av_binwidth / grid.binwidth[kc]        # [K,W]
        d_hist = jnp.sum(oh * incr[:, None, :], axis=0)    # [B,W]
        hist = s.hist + d_hist

        if prm.samplerun:
            # frozen weights: eta at the recorded mu's is exactly the
            # serial chain's (engine._wl_update NaN/overflow guards;
            # walled entries GATED out - see engine._wl_update's
            # dd-boundary note)
            eta_val = jax.vmap(lambda m: self._eta(s, m))(mu_t)
            unwalled = eta_val < 1e29
            arg = jnp.where(
                (upd > 0) & unwalled,
                eta_val - self.aux.log_unbiased_norm, -1.0,
            )
            u_incr = jnp.where(
                unwalled,
                incr * jnp.exp(jnp.minimum(arg, 60.0)), 0.0,
            )
            uhist = s.uhist + jnp.sum(
                oh * u_incr[:, None, :], axis=0
            )
            return s._replace(hist=hist, uhist=uhist)

        f = s.f
        sumh = s.sumhist
        any_upd = jnp.any(upd > 0, axis=0)
        if prm.wl_swetnam:
            # Swetnam RMS-flatness f recomputed once per sub-step from
            # the post-batch TOTAL histogram (delta + master base;
            # mc_moves.F90:1636-1653)
            sumh = s.sumhist + jnp.sum(upd, axis=0)
            hist_tot = self._hist_total(s, hist)
            binfrac = grid.binwidth / (prm.mu_max - prm.mu_min - 1.0)
            dev = (
                hist_tot * grid.binwidth[:, None]
                / jnp.maximum(sumh, 1.0)[None, :]
                - binfrac[:, None]
            )
            rms = jnp.sqrt(jnp.mean(dev * dev, axis=0))
            f_new = jnp.log(jnp.maximum(rms, 1e-300)) * prm.wl_alpha * B
            f_new = jnp.minimum(f_new, prm.wl_factor)
            f = jnp.where(any_upd, f_new, f)
        elif prm.wl_useinvt:
            f_invt = jnp.minimum(
                f, B / (s.cycle.astype(dtype) * prm.nwater)
            )
            f = jnp.where(s.invt_active & any_upd, f_invt, f)

        weight = s.weight + d_hist * f[None, :]
        return s._replace(hist=hist, weight=weight, f=f, sumhist=sumh)

    # ------------------------------------------------------------------
    # volume-move hooks (Engine._volume supplies the shared logic)
    # ------------------------------------------------------------------

    def _vol_rescale(self, s: CellState, h_new):
        """Slab layout: rescale slot positions at fixed fractional
        coordinates (slots and the fractional grid are untouched by
        construction; there are no stored reference positions)."""
        L = s.r.shape[0]
        frac = jnp.stack([
            _frac_of(s.recip[l], s.r[l]) for l in range(L)
        ])
        r_new = _einsum("labw,lbmw->lamw", h_new, frac)
        return r_new, {}

    def _vol_energy(self, s: CellState, r_new, h_new):
        return self._full_both(s, r_new, h_new)

    def _vol_extra_ok(self, h_new, s=None):
        # grid-validity wall: perpendicular widths must stay within
        # the coverage tables' shrink guard (state-only-dependent
        # hard wall)
        ok = self._geometry_ok(h_new)
        if self.prm.cell_trans_wall > 0.0 and s is not None:
            # a volume move rescales every displacement from the
            # reference sites (fractional coords held fixed), so an
            # accepted expansion could carry molecules beyond the
            # displacement wall — breaking detailed balance at the
            # wall exactly like the dense path's case
            # (engine._volume ref_r check).  Reject proposals whose
            # rescaled worst displacement violates the wall.
            mol = jnp.maximum(s.slot2mol, 0)           # [nslot,W]
            fref = jnp.take(self.cellaux.fref0, mol, axis=1)
            f1 = _frac_of(s.recip[0], s.r[0])          # [3,nslot,W]
            fd = f1 - fref
            fd = fd - jnp.round(fd)
            dsp = _einsum("abw,bmw->amw", h_new[0], fd)
            d2 = jnp.sum(dsp * dsp, axis=0)            # [nslot,W]
            valid = self._slab_valid(s)
            d2 = jnp.where(valid, d2, 0.0)
            ok = ok & (
                jnp.max(d2, axis=0)
                <= self.prm.cell_trans_wall ** 2
            )
        return ok

    def _geometry_ok(self, h) -> jnp.ndarray:
        """[W] bool: every perpendicular width of every lattice's box
        stays above 1/guard of its initial value (the validity domain
        of the static coverage tables, cells.build_grid)."""
        L = h.shape[0]
        ok = None
        for l in range(L):
            H = h[l]                                        # [3,3,W]
            vol = jnp.abs(determinant3(H))
            for a in range(3):
                b, c = (a + 1) % 3, (a + 2) % 3
                cx = H[1, b] * H[2, c] - H[2, b] * H[1, c]
                cy = H[2, b] * H[0, c] - H[0, b] * H[2, c]
                cz = H[0, b] * H[1, c] - H[1, b] * H[0, c]
                w = vol * jax.lax.rsqrt(cx * cx + cy * cy + cz * cz)
                cond = w > self.w_guard[l, a]
                ok = cond if ok is None else (ok & cond)
        return ok

    # ------------------------------------------------------------------
    # rebin: new random grid origin (ergodicity across cells)
    # ------------------------------------------------------------------

    def _rebin(self, s: CellState) -> CellState:
        cg = self.cellgrid
        L = s.r.shape[0]
        N = s.mol2slot.shape[0]
        dtype = s.r.dtype

        # gather slabs back to molecule order
        r_mol = jnp.stack([
            jnp.stack([gather_from_slab(s.r[l, a], s.mol2slot)
                       for a in range(3)])
            for l in range(L)
        ])                                                  # [L,3,N,W]
        mom_mol = Moments(*(
            jnp.stack([gather_from_slab(f[l], s.mol2slot)
                       for l in range(L)])
            for f in s.moments
        ))

        # new shared origin; the tag decouples this draw from the
        # move-schedule stream, which also folds (shared_key, cycle) -
        # without it the origin equals the schedule's first uniforms
        okey = jax.random.fold_in(
            jax.random.fold_in(s.shared_key, s.cycle), 0x0E161
        )
        origin = jax.random.uniform(okey, (3,), dtype=dtype)

        # wrap so that the MID fractional position lands in
        # [origin, origin+1): the grid is periodic in
        # g = f_mid - origin, and stored images must wrap at the GRID
        # boundary for the coverage tables' +-1 box shifts to be the
        # true periodic offsets; re-image lattice 2 to within the
        # (invariant) correspondence mismatch of lattice 1.  All
        # shifts are lattice vectors, leaving energies unchanged.
        dmid = 0.5 * self.cellaux.dfrac0[:, :, None]       # [3,N,1]
        f1 = _frac_of(s.recip[0], r_mol[0])
        f1 = f1 - jnp.floor(f1 - dmid - origin[:, None, None])
        r1 = _einsum("abw,bnw->anw", s.h[0], f1)
        if L == 2:
            f2 = _frac_of(s.recip[1], r_mol[1])
            dmic = f1 - f2
            dmic = dmic - jnp.round(dmic)
            r2 = _einsum("abw,bnw->anw", s.h[1], f1 - dmic)
            r_mol = jnp.stack([r1, r2])
        else:
            r_mol = r1[None]

        cid = cell_of_frac(cg, f1 - dmid, origin, level="fine")
        slot, max_occ = bin_molecules(cg, cid)
        occ_overflow = jnp.maximum(
            s.occ_overflow, max_occ - cg.cap
        ).astype(jnp.int32)

        r_slab = jnp.stack([
            jnp.stack([scatter_to_slab(r_mol[l, a], slot, cg.nslot)
                       for a in range(3)])
            for l in range(L)
        ])
        mom_slab = Moments(*(
            jnp.stack([scatter_to_slab(f[l], slot, cg.nslot)
                       for l in range(L)])
            for f in mom_mol
        ))
        mols = jnp.arange(N, dtype=jnp.int32)[:, None]
        mols = jnp.broadcast_to(mols, slot.shape)
        base = jnp.full((cg.nslot, slot.shape[1]), -1, dtype=jnp.int32)
        slot2mol = _slab_put(
            base, slot, mols, jnp.ones_like(slot, dtype=bool)
        )
        return s._replace(
            r=r_slab, moments=mom_slab, slot2mol=slot2mol,
            mol2slot=slot, origin=origin, occ_overflow=occ_overflow,
        )

    # ------------------------------------------------------------------
    # chain resynchronisation (slab variant of Engine._resync_chains)
    # ------------------------------------------------------------------

    def _resync_chains(self, s: CellState) -> CellState:
        prm, aux = self.prm, self.aux
        if prm.num_lattices != 2:
            return s
        L = s.r.shape[0]
        # lattice 2's cell displacement := lattice 1's
        # (mc_moves.F90:2276-2277)
        ref0 = aux.ref_h[0][:, :, None]
        ref1 = aux.ref_h[1][:, :, None]
        h2 = ref1 + (s.h[0] - ref0)
        h = s.h.at[1].set(h2)
        recip = jnp.stack([recip_matrix(h[l]) for l in range(L)])

        # every molecule's fractional displacement from its reference
        # := lattice 1's, i.e. f2 = f1 - dfrac0 (mc_moves.F90:2289-2333)
        f1 = _frac_of(recip[0], s.r[0])                  # [3,nslot,W]
        mol = jnp.maximum(s.slot2mol, 0)                 # [nslot,W]
        dfrac = jnp.take(self.cellaux.dfrac0, mol, axis=1)
        valid = self._slab_valid(s)
        r2 = _einsum("abw,bmw->amw", h[1], f1 - dfrac)
        r2 = jnp.where(valid[None], r2, 0.0)
        r = s.r.at[1].set(r2)

        vol = jnp.abs(jnp.stack([determinant3(h[l]) for l in range(L)]))
        s2 = s._replace(r=r, h=h, recip=recip, volume=vol)
        energy, moments = self._full_both(s2, r, h)
        mu = self._mu_scratch(energy, vol)
        return s2._replace(energy=energy, moments=moments, mu=mu,
                           energy_err=jnp.zeros_like(energy))

    # ------------------------------------------------------------------
    # audit (slab variant)
    # ------------------------------------------------------------------

    def _audit_energy(self, s: CellState):
        fresh, moments = self._full_both(s, s.r, s.h)
        drift = (s.energy + s.energy_err) - fresh
        return s._replace(
            energy=fresh, moments=moments,
            energy_err=jnp.zeros_like(fresh),
        ), drift

    # ------------------------------------------------------------------
    # cycle driver
    # ------------------------------------------------------------------

    def _one_cycle(self, s: CellState):
        return self._cycle_with(s, self._substep_scan)

    def _substep_scan(self, s: CellState, codes, u_all, switch_ok,
                      n_sub):
        """Single scan over ALL sub-steps of the cycle; the body
        traces ONE sub-step and indexes the stacked (colour, block)
        tables dynamically (row t = sid % n_tables; colours outer,
        blocks inner, repeating every sweep).  Per-slot trial counts
        accumulate in slab layout (slot assignments are fixed between
        rebins); the caller folds them into trans_per_mol."""
        W = s.r.shape[-1]
        K = self.K
        Tm = self.T
        tpm_slab0 = jnp.zeros(
            (self.cellgrid.nslot, W), dtype=jnp.int32
        )
        substep_fn = self._substep if Tm == 1 else self._substep_multi

        def substep_body(carry, xs):
            st, pks, tslab = carry
            sid, u = xs
            tbl = jnp.mod(sid, self.n_tables)
            fc = jnp.take(self.fc_stack, tbl, axis=0)
            cand = jnp.take(self.cand_stack, tbl, axis=0)
            off = jnp.take(self.off_stack, tbl, axis=0)
            codes_k = jax.lax.dynamic_slice(
                codes, (sid * K * Tm,), (K * Tm,)
            )
            st, pks, tslab = substep_fn(
                st, pks, tslab, fc, cand, off, u, codes_k, switch_ok,
            )
            return (st, pks, tslab), None

        # the scan carries the PACKED per-lattice slabs (see _pack);
        # the canonical r / moments slabs are shrunk to zero-size
        # placeholders for the scan (nothing inside reads them, and
        # carrying multi-GB stale copies through ~10^3 iterations
        # wastes HBM) and re-extracted from the packed carry after
        s_sc = s._replace(
            r=s.r[:, :, :0],
            moments=Moments(*(f[:, :0] for f in s.moments)),
        )
        (s_sc, pks, tpm_slab), _ = jax.lax.scan(
            substep_body, (s_sc, self._pack(s), tpm_slab0),
            (jnp.arange(n_sub, dtype=jnp.int32), u_all),
        )
        return self._unpack(s_sc, pks), tpm_slab

    def _cycle_with(self, s: CellState, scan_fn):
        """The cycle skeleton shared by the unsharded and spatially
        sharded engines: dd window tracking, rebin cadence, the
        move-type schedule, the sub-step scan (``scan_fn`` - the only
        part that differs), scheduled volume moves, delta-sync /
        chain-resync cadences and the therm sample.

        ``scan_fn(s, codes, u_all, switch_ok, n_sub) -> (s,
        tpm_slab)`` runs all sub-steps of the cycle."""
        prm = self.prm
        dtype = s.r.dtype
        L = s.r.shape[0]
        W = s.r.shape[-1]
        T = self.trials_per_cycle
        K = self.K
        cycle = s.cycle + 1
        s = s._replace(cycle=cycle)

        # dd-mode window tracking (mc_cycle:181-210; shared
        # Engine._dd_track_window honours dd_seeding)
        if prm.parallel_strategy == "dd" and L == 2:
            s = self._dd_track_window(s, cycle)

        # re-draw the grid origin + rebin on the reference's Verlet
        # cadence (mc_cycle:218-222)
        s = jax.lax.cond(
            cycle % prm.list_update_int == 0,
            self._rebin, lambda x: x, s,
        )

        # shared move-type schedule over this cycle's trials
        ck = jax.random.fold_in(s.shared_key, cycle)
        xi = jax.random.uniform(ck, (T,), dtype=dtype)
        transP, volP, swP = self.probs
        codes = jnp.where(
            xi < transP, TRANS,
            jnp.where(xi < volP, VOL, jnp.where(xi < swP, SWITCH, NOOP)),
        )

        if prm.parallel_strategy == "dd":
            switch_ok_scalar = cycle >= prm.eq_mc_cycles
        else:
            switch_ok_scalar = jnp.asarray(True)
        switch_ok = jnp.broadcast_to(switch_ok_scalar, (W,))

        # pregenerate the whole cycle's sub-step uniforms in ONE
        # fused threefry block [n_sub, K, n_u, W] (per-walker streams
        # keyed on (walker key, cycle)); the scan body just slices it
        n_sub = self.sweeps_per_cycle * self.n_tables
        n_u = 7 if self.T == 1 else 4 + 5 * self.T
        u_all = jax.vmap(
            lambda k: jax.random.uniform(
                jax.random.fold_in(k, cycle),
                (n_sub, K, n_u), dtype=dtype,
            ),
            out_axes=3,
        )(s.key)                                  # [n_sub,K,n_u,W]

        s, tpm_slab = scan_fn(s, codes, u_all, switch_ok, n_sub)
        s = s._replace(
            trans_per_mol=s.trans_per_mol
            + gather_from_slab(tpm_slab, s.mol2slot)
        )

        # scheduled volume moves, back-to-back (mc_volume; shared
        # Engine._scheduled_volume_moves drives the hooks above)
        if prm.mc_ensemble == "npt" and prm.allow_vol:
            s = self._scheduled_volume_moves(s, codes, cycle, switch_ok)

        avg = s.avg_energy + self._e_tot(s)
        if prm.mc_ensemble == "npt":
            avg = avg + prm.pressure * s.volume
        s = s._replace(avg_energy=avg)

        if prm.num_lattices == 2:
            s = jax.lax.cond(
                cycle % prm.mpi_sync_int == 0,
                self._sync_all, lambda x: x, s,
            )
            s = jax.lax.cond(
                cycle % prm.latt_sync_int == 0,
                self._resync_chains, lambda x: x, s,
            )

        T_w = min(prm.therm_walkers, W)
        e_ls = _take_lat(self._e_tot(s), s.ls)
        sample = {
            "cycle": cycle,
            "E_ls": e_ls[:T_w],
            "mu": s.mu[:T_w],
            "vol": s.volume[:, :T_w],
            "ls": s.ls[:T_w],
        }
        return s, sample


# ----------------------------------------------------------------------
# state initialisation
# ----------------------------------------------------------------------

def init_cell_state(
    prm: RunParams,
    model: SWParams,
    r0: np.ndarray,           # [L,N,3] Bohr
    H0: np.ndarray,           # [L,3,3] Bohr
    grid: BinGrid,
    cellgrid: CellGrid,
    weight0: np.ndarray | None = None,
    n_windows: int = 1,
) -> tuple[CellState, EngineAux, CellAux]:
    """Build the initial slab-layout walker ensemble (the large-N
    sibling of state.init_state, same init order as main.f90:98-175)."""
    dtype = jnp.float64 if prm.dtype == "float64" else jnp.float32
    W = prm.n_walkers
    L = prm.num_lattices
    N = prm.nwater
    B = grid.nbins

    r0 = np.asarray(r0, dtype=np.float64)
    H0 = np.asarray(H0, dtype=np.float64)

    # invariant correspondence mismatch (models/stacking.py)
    f1_0 = r0[0] @ np.linalg.inv(H0[0]).T
    if L == 2:
        f2_0 = r0[1] @ np.linalg.inv(H0[1]).T
        dfrac0 = f1_0 - f2_0
        dfrac0 -= np.round(dfrac0)
        mismatch = max(
            float(np.linalg.norm(dfrac0 @ H0[l].T, axis=1).max())
            for l in range(2)
        )
    else:
        dfrac0 = np.zeros_like(f1_0)
        mismatch = 0.0

    # initial binning (origin 0) by the MID fractional position
    # f_mid = f1 - dfrac0/2 on the FINE grid.  All layout work is
    # host-side numpy; device work is a SINGLE jitted call (eager
    # op-by-op dispatch at init cost minutes over remote-TPU tunnels).
    fmid0 = f1_0 - 0.5 * dfrac0
    nshift = np.floor(fmid0)
    f1 = f1_0 - nshift
    fmid = fmid0 - nshift                              # in [0,1)
    r_use = [f1 @ H0[0].T]
    if L == 2:
        r_use.append((f1 - dfrac0) @ H0[1].T)
    r_use = np.stack(r_use)                            # [L,N,3]

    n1, n2, n3 = cellgrid.nf
    c1 = np.minimum((fmid[:, 0] * n1).astype(np.int32), n1 - 1)
    c2 = np.minimum((fmid[:, 1] * n2).astype(np.int32), n2 - 1)
    c3 = np.minimum((fmid[:, 2] * n3).astype(np.int32), n3 - 1)
    cid = (c1 * n2 + c2) * n3 + c3                     # [N]
    order = np.argsort(cid, kind="stable")
    rank = np.empty(N, dtype=np.int32)
    occ_count = np.zeros(cellgrid.nfine, dtype=np.int32)
    for i in order:
        rank[i] = occ_count[cid[i]]
        occ_count[cid[i]] += 1
    max_occ = int(occ_count.max())
    if max_occ > cellgrid.cap:
        raise ValueError(
            f"cell occupancy {max_occ} exceeds capacity "
            f"{cellgrid.cap}; increase cap"
        )
    slot_np = (cid * cellgrid.cap + rank).astype(np.int32)

    r_slab0 = np.zeros((L, 3, cellgrid.nslot), dtype=np.float64)
    s2m0 = np.full(cellgrid.nslot, -1, dtype=np.int32)
    for l in range(L):
        r_slab0[l][:, slot_np] = r_use[l].T
    s2m0[slot_np] = np.arange(N, dtype=np.int32)

    # windows (identical logic to state.init_state)
    if prm.parallel_strategy == "dd" and L == 2 and n_windows > 1:
        wins = assign_windows(prm, grid, n_windows)
        wid = np.arange(W) % n_windows
        sb = np.array([wins[i][0] for i in wid], dtype=np.int32)
        eb = np.array([wins[i][1] for i in wid], dtype=np.int32)
        lo = np.array([wins[i][2] for i in wid])
        hi = np.array([wins[i][3] for i in wid])
        in_window = np.zeros(W, dtype=bool)
        ls0 = np.full(W, prm.ls - 1, dtype=np.int32)
        ls0 = np.where(hi < 0.0, 0, ls0)
        ls0 = np.where(lo > 0.0, 1, ls0)
        nwin = n_windows
    else:
        wid = np.zeros(W, dtype=np.int32)
        sb = np.zeros(W, dtype=np.int32)
        eb = np.full(W, B - 1, dtype=np.int32)
        lo = np.full(W, prm.mu_min)
        hi = np.full(W, prm.mu_max)
        in_window = np.ones(W, dtype=bool)
        ls0 = np.full(W, prm.ls - 1, dtype=np.int32)
        nwin = 1

    weight0_np = (
        np.zeros(B) if weight0 is None
        else np.asarray(weight0, dtype=np.float64)
    )
    log_norm = compute_log_unbiased_norm(prm, grid, weight0_np, W)
    ref_override = None
    if any(abs(x) > 1e-300 for x in prm.input_ref_enthalpy[:L]):
        ref_override = np.asarray(
            prm.input_ref_enthalpy[:L], dtype=np.float64
        )

    # the ENTIRE device-side construction is one jitted program:
    # eager op-by-op dispatch here cost minutes over remote-TPU
    # tunnels (every distinct small op pays a multi-second compile)
    @jax.jit
    def _device_init(r_slab0_d, H0_d):
        valid1 = jnp.asarray(s2m0 >= 0)[:, None]
        h1 = H0_d[..., None]                           # [L,3,3,1]
        e0, mom0 = [], []
        for l in range(L):
            e_l, m_l = slab_full_energy(
                r_slab0_d[l][..., None], valid1, h1[l],
                cellgrid, model,
            )
            e0.append(e_l)
            mom0.append(m_l)
        energy1 = jnp.concatenate(e0)                  # [L]
        h = jnp.broadcast_to(h1, (L, 3, 3, W))
        recip = jnp.stack([recip_matrix(h[l]) for l in range(L)])
        vol = jnp.abs(jnp.stack(
            [determinant3(h[l]) for l in range(L)]
        ))
        r = jnp.broadcast_to(
            r_slab0_d[..., None], (L, 3, cellgrid.nslot, W)
        )
        energy = jnp.broadcast_to(energy1[:, None], (L, W))
        moments = Moments(*(
            jnp.broadcast_to(
                jnp.stack([m[i] for m in mom0]),
                (L, cellgrid.nslot, W),
            )
            for i in range(10)
        ))

        vol1 = vol[:, 0]
        ref_enth = energy1
        if prm.mc_ensemble == "npt":
            ref_enth = ref_enth + prm.pressure * vol1
        if ref_override is not None:
            ref_enth = jnp.asarray(ref_override, dtype=dtype)
        if L == 2:
            mu0_s = (
                energy1[0] + prm.pressure * vol1[0]
                - energy1[1] - prm.pressure * vol1[1]
            )
            if prm.leshift:
                mu0_s = mu0_s - ref_enth[0] + ref_enth[1]
            mu0_s = (
                mu0_s * prm.beta - N * jnp.log(vol1[0] / vol1[1])
            )
            mu0 = jnp.broadcast_to(mu0_s.astype(dtype), (W,))
        else:
            mu0 = jnp.zeros((W,), dtype=dtype)

        # warm-start weights load into the master rows (full global
        # curve in every row - window seeding, see state.init_state;
        # dd_seeding=False restores the reference's per-window
        # masking, mc_init:808-814); per-walker arrays hold only
        # growth since the last sync
        w0rows = np.broadcast_to(weight0_np, (nwin, B)).copy()
        if (not prm.dd_seeding) and nwin > 1:
            binrange = np.arange(B)
            for wdx in range(nwin):
                sbx, ebx = wins[wdx][0], wins[wdx][1]
                w0rows[wdx, (binrange < sbx) | (binrange > ebx)] = 0.0
        master_eta = DS(
            jnp.asarray(w0rows, dtype=dtype),
            jnp.zeros((nwin, B), dtype=dtype),
        )

        key = jax.random.PRNGKey(prm.seed)
        shared_key, wkey = jax.random.split(key)
        walker_keys = jax.random.split(wkey, W)

        state = CellState(
            r=r, h=h, recip=recip, volume=vol, energy=energy,
            energy_err=jnp.zeros((L, W), dtype=dtype),
            mu=mu0, ls=jnp.asarray(ls0), moments=moments,
            slot2mol=jnp.broadcast_to(
                jnp.asarray(s2m0)[:, None], (cellgrid.nslot, W)
            ),
            mol2slot=jnp.broadcast_to(
                jnp.asarray(slot_np)[:, None], (N, W)
            ),
            origin=jnp.zeros(3, dtype=dtype),
            occ_overflow=jnp.zeros((W,), dtype=jnp.int32),
            weight=jnp.zeros((B, W), dtype=dtype),
            hist=jnp.zeros((B, W), dtype=dtype),
            uhist=jnp.zeros((B, W), dtype=dtype),
            f=jnp.full((W,), prm.wl_factor, dtype=dtype),
            sumhist=jnp.zeros((W,), dtype=dtype),
            invt_active=jnp.zeros((W,), dtype=bool),
            firstcycle=jnp.ones((W,), dtype=bool),
            histogram_reset=jnp.zeros((W,), dtype=bool),
            master_eta=master_eta,
            master_hist=ds_zeros((nwin, B), dtype=dtype),
            master_uhist=ds_zeros((nwin, B), dtype=dtype),
            window_id=jnp.asarray(wid),
            my_mu_min=jnp.asarray(lo, dtype=dtype),
            my_mu_max=jnp.asarray(hi, dtype=dtype),
            start_bin=jnp.asarray(sb),
            end_bin=jnp.asarray(eb),
            in_window=jnp.asarray(in_window),
            max_trans=jnp.full((W,), prm.mc_max_trans, dtype=dtype),
            dv_max=jnp.full((W,), prm.mc_dv_max, dtype=dtype),
            att=jnp.zeros((3, W), dtype=jnp.int32),
            acc=jnp.zeros((3, W), dtype=jnp.int32),
            trans_per_mol=jnp.zeros((N, W), dtype=jnp.int32),
            avg_energy=jnp.zeros((L, W), dtype=dtype),
            min_dmu=jnp.full((W,), jnp.inf, dtype=dtype),
            max_dmu=jnp.zeros((W,), dtype=dtype),
            cycle=jnp.asarray(0, dtype=jnp.int32),
            key=walker_keys,
            shared_key=shared_key,
            dropped=jnp.asarray(0, dtype=jnp.int32),
        )
        aux = EngineAux(
            # shifts unused by the cell engine (audits run on the
            # slab path); minimal placeholder for structural parity
            shifts=jnp.zeros((1, 3), dtype=jnp.int32),
            ref_h=jnp.asarray(H0, dtype=dtype),
            ref_enthalpy=ref_enth.astype(dtype),
            log_unbiased_norm=log_norm,
        )
        caux_d = CellAux(
            dfrac0=jnp.asarray(dfrac0.T, dtype=dtype),
            mismatch=mismatch,
            fref0=jnp.asarray(f1_0.T, dtype=dtype),
        )
        return state, aux, caux_d

    state, eaux, caux = _device_init(
        jnp.asarray(r_slab0, dtype=dtype),
        jnp.asarray(H0, dtype=dtype),
    )
    return state, eaux, caux
