"""Static spatial partition of the two-level cell grid across devices.

New capability beyond the reference (its neighbour machinery is
single-process, molint.F90:501-559; SURVEY.md §7 step 8b names spatial
decomposition with halo exchange as the large-N north star).  This
module is the STATIC half of the spatially sharded cell engine: it
turns a ``CellGrid`` (ops/cells.py) into per-device ownership maps,
halo-row maps, and per-(sub-step table, device) mover schedules in the
device-LOCAL row ids the phase-split sub-step API consumes
(cellengine._propose_t1 / _apply_t1 take ``fc_local``; _chain_t1 runs
replicated on all-gathered [K, W] tables).

Design (one mesh axis ``space`` of D devices):

* The fine grid is sliced along its SLOWEST-varying axis (x): fine id
  = (fx*nf2 + fy)*nf3 + fz, so device d owns the CONTIGUOUS slab rows
  of fx in [d, d+1) * nfx/D.  D must divide the coarse count n[0], so
  ownership aligns to whole coarse cells and every checkerboard mover
  has a well-defined owner.
* Sub-step coverage stencils (CellGrid.full_cells) reach at most
  ``reach`` fine layers along x (recovered from the materialised
  table, not re-derived).  A device computes every mover with at
  least one stencil cell in its OWNED rows; such movers sit within
  ``reach`` layers of the owned span, and their stencils within
  ``2*reach`` - so each device carries a halo of ``2*reach`` fine
  layers per side, refreshed from the neighbours' owned rows by a ±1
  ``ppermute`` ring shift (periodic boundaries map to the ring).
  Local row order: [owned ascending | lo halo ascending | hi halo
  ascending].
* Redundant boundary compute: a boundary mover is proposed on every
  device whose owned rows its stencil touches.  All of them see
  identical inputs (replicated per-cycle uniform block + freshly
  refreshed halos), so the proposals and the replicated acceptance
  chain agree bit-for-bit; each device then applies only the stencil
  writes that land in rows it OWNS (``own_fc`` / ``own_cand`` masks).
  Halo rows go stale at that instant and are refreshed before the
  next read.  This avoids a reverse (halo-accumulate) exchange
  entirely: forward refresh only.

The per-sub-step collective payload is tiny ([K, W] scalars for the
chain plus 4*reach fine layers of slab rows), the analog of the
reference's O(nbins) MPI messages (SURVEY.md §5.8).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

from ..ops.cells import CellGrid


def _fine_coords(cg: CellGrid, ids: np.ndarray) -> np.ndarray:
    """Decode fine ids -> [.., 3] integer fine coords."""
    _, nf2, nf3 = cg.nf
    f1, rem = np.divmod(ids, nf2 * nf3)
    f2, f3 = np.divmod(rem, nf3)
    return np.stack([f1, f2, f3], axis=-1)


def stencil_reach(cg: CellGrid) -> np.ndarray:
    """Per-axis fine-layer reach of the per-fine-cell coverage table,
    recovered from the materialised ids + wrap offsets (the unwrapped
    offset along axis a is coords[cell] + wrap_a * nf_a - coords[base];
    see ops/cells._materialise wrap convention)."""
    nf = np.asarray(cg.nf)
    base = _fine_coords(cg, np.arange(cg.nfine, dtype=np.int64))
    cells = _fine_coords(cg, cg.full_cells.astype(np.int64))
    unwrapped = cells + cg.full_off.astype(np.int64) * nf - base[:, None, :]
    unwrapped = unwrapped[:, cg.full_mask, :]
    # offsets span [-reach, reach] around the base cell (cube [0,1))
    return np.maximum(unwrapped.max(axis=(0, 1)),
                      -unwrapped.min(axis=(0, 1))).astype(np.int32)


@dataclasses.dataclass(frozen=True)
class SpatialPlan:
    """Host-side static plan for D-way spatial sharding (all arrays
    numpy; consumed as trace constants by the sharded engine)."""

    ndev: int
    reach: int              # stencil reach, fine layers
    halo_layers: int        # halo depth per side (= 2*reach layers)
    layers_owned: int       # owned fine x-layers per device
    rows_owned: int         # owned slab rows (= layers_owned*nf2*nf3)
    rows_halo: int          # halo rows per side (= halo_layers*nf2*nf3)
    K_loc: int              # padded movers per (table, device)
    dummy_row: int          # local row id of the all-invalid DUMMY
                            # row appended after owned(+halo) rows;
                            # schedule padding entries point here so
                            # in-place kernels never revisit a REAL
                            # row (writes to it are garbage by
                            # design and never read back)

    # [D, nfine] int32: local row of each global fine id, -1 if the
    # id is neither owned by nor in the halo of device d
    loc_of_global: np.ndarray
    # [D, rows_halo] global fine ids of the lo/hi halo rows, in local
    # row order (matching the neighbours' owned-row send slices)
    halo_lo_src: np.ndarray
    halo_hi_src: np.ndarray

    # per-(table row t, device d) schedules, padded with -1 to K_loc:
    # mover_idx[t, d, j] = index into the table row's K movers
    mover_idx: np.ndarray       # [T, D, K_loc] int32
    fc_local: np.ndarray        # [T, D, K_loc] int32 local mover rows
    cand_local: np.ndarray      # [T, D, K_loc, CF] int32 local rows
    own_fc: np.ndarray          # [T, D, K_loc] bool: d owns mover cell
    own_cand: np.ndarray        # [T, D, K_loc, CF] bool: d owns cell

    @property
    def rows_local(self) -> int:
        return self.rows_owned + 2 * self.rows_halo


def build_spatial_plan(cg: CellGrid, fc_stack: np.ndarray,
                       ndev: int) -> SpatialPlan:
    """Build the D-way partition of a cell grid and its stacked
    (colour, fine-block) sub-step schedule (CellEngine.fc_stack).

    Requires ndev to divide the coarse count along the sharded axis
    (whole coarse cells per device) and the owned span to cover the
    halo depth (the ±1 ring shift sources each halo from ONE
    neighbour's owned rows).
    """
    nfx, nf2, nf3 = cg.nf
    if cg.n[0] % ndev:
        raise ValueError(
            f"spatial ndev={ndev} must divide the coarse x count "
            f"{cg.n[0]} (ownership aligns to whole coarse cells)"
        )
    layers_owned = nfx // ndev
    rows_per_layer = nf2 * nf3
    reach_vec = stencil_reach(cg)
    reach = int(reach_vec[0])
    halo_layers = 2 * reach
    if ndev > 1 and layers_owned < halo_layers:
        raise ValueError(
            f"owned span {layers_owned} fine layers must cover the "
            f"halo depth {halo_layers} (2x stencil reach {reach}): "
            "use fewer devices or more coarse cells along x"
        )
    rows_owned = layers_owned * rows_per_layer
    rows_halo = halo_layers * rows_per_layer

    fid = np.arange(cg.nfine, dtype=np.int64)
    fx = fid // rows_per_layer
    owner = (fx // layers_owned).astype(np.int32)          # [nfine]

    loc_of_global = np.full((ndev, cg.nfine), -1, dtype=np.int32)
    halo_lo_src = np.empty((ndev, rows_halo), dtype=np.int32)
    halo_hi_src = np.empty((ndev, rows_halo), dtype=np.int32)
    for d in range(ndev):
        x0 = d * layers_owned
        own_ids = fid[(fx >= x0) & (fx < x0 + layers_owned)]
        loc_of_global[d, own_ids] = np.arange(rows_owned)
        lo_layers = np.arange(x0 - halo_layers, x0) % nfx
        hi_layers = np.arange(x0 + layers_owned,
                              x0 + layers_owned + halo_layers) % nfx
        lo_ids = (lo_layers[:, None] * rows_per_layer
                  + np.arange(rows_per_layer)[None, :]).ravel()
        hi_ids = (hi_layers[:, None] * rows_per_layer
                  + np.arange(rows_per_layer)[None, :]).ravel()
        # halo overwrites owned only in the degenerate ndev=1 case
        if ndev > 1:
            loc_of_global[d, lo_ids] = (
                rows_owned + np.arange(rows_halo)
            )
            loc_of_global[d, hi_ids] = (
                rows_owned + rows_halo + np.arange(rows_halo)
            )
        halo_lo_src[d] = lo_ids
        halo_hi_src[d] = hi_ids

    # ---- per-(table, device) mover schedules
    T, K = fc_stack.shape
    CF = cg.full_cells.shape[1]
    sched: list[list[np.ndarray]] = [[] for _ in range(ndev)]
    for t in range(T):
        row_fc = fc_stack[t].astype(np.int64)              # [K]
        cand = cg.full_cells[row_fc].astype(np.int64)      # [K, CF]
        cand_own = np.where(cg.full_mask[None, :], owner[cand], -1)
        for d in range(ndev):
            # a device computes every mover with at least one OWNED
            # stencil cell (movers it must apply writes for)
            take = np.any(cand_own == d, axis=1)
            idx = np.nonzero(take)[0].astype(np.int32)
            # every such mover MUST resolve fully in owned+halo rows;
            # the halo depth above guarantees it - assert, never
            # silently drop an owned write
            loc = loc_of_global[d]
            if not (np.all(loc[row_fc[idx]] >= 0)
                    and np.all(loc[cand[idx]][:, cg.full_mask] >= 0)):
                raise AssertionError(
                    "stencil of a scheduled mover escapes the halo "
                    f"(table {t}, device {d})"
                )
            sched[d].append(idx)
    K_loc = max(
        (len(s) for rows in sched for s in rows), default=0
    )

    # local slab layout: [owned | lo halo | hi halo | DUMMY] (halos
    # only materialised for ndev > 1); schedule padding entries and
    # out-of-halo masked candidates point at the dummy row, which is
    # all-invalid - its energies are zero, in-place kernel writes to
    # it are garbage by design, and it is dropped with the halos
    dummy_row = rows_owned + (2 * rows_halo if ndev > 1 else 0)
    mover_idx = np.full((T, ndev, K_loc), -1, dtype=np.int32)
    fc_local = np.full((T, ndev, K_loc), dummy_row, dtype=np.int32)
    cand_local = np.full((T, ndev, K_loc, CF), dummy_row,
                         dtype=np.int32)
    own_fc = np.zeros((T, ndev, K_loc), dtype=bool)
    own_cand = np.zeros((T, ndev, K_loc, CF), dtype=bool)
    for t in range(T):
        row_fc = fc_stack[t].astype(np.int64)
        cand = cg.full_cells[row_fc].astype(np.int64)      # [K, CF]
        for t_d in range(ndev):
            d = t_d
            idx = sched[d][t]
            k = len(idx)
            loc = loc_of_global[d]
            mover_idx[t, d, :k] = idx
            fc_local[t, d, :k] = loc[row_fc[idx]]
            cl = loc[cand[idx]]
            cand_local[t, d, :k] = np.where(cl >= 0, cl, dummy_row)
            own_fc[t, d, :k] = owner[row_fc[idx]] == d
            own_cand[t, d, :k] = (
                (owner[cand[idx]] == d) & cg.full_mask[None, :]
            )

    return SpatialPlan(
        ndev=ndev, reach=reach, halo_layers=halo_layers,
        layers_owned=layers_owned,
        rows_owned=rows_owned, rows_halo=rows_halo, K_loc=K_loc,
        dummy_row=dummy_row,
        loc_of_global=loc_of_global,
        halo_lo_src=halo_lo_src, halo_hi_src=halo_hi_src,
        mover_idx=mover_idx, fc_local=fc_local,
        cand_local=cand_local, own_fc=own_fc, own_cand=own_cand,
    )


# ----------------------------------------------------------------------
# runtime: the spatially sharded cell engine
# ----------------------------------------------------------------------

def make_spatial_mesh(devices=None, walkers: int = 1):
    """Device mesh over the ``space`` axis - optionally 2-D
    ``space x walkers`` (round-4 composition of the two scaling
    axes: the reference's every-rank-is-both analog,
    comms_mpi.f90:244-530 collectives across P1 x P2).

    ``walkers`` > 1 splits the device list into a
    (n_devices/walkers, walkers) grid: slabs shard over ``space``,
    the walker ensemble over ``walkers``; the per-sub-step psum/
    ppermute collectives ride the space axis only, while the
    cycle-rank delta-sync reductions cross the walkers axis via
    GSPMD exactly as in the dense engine's walker mesh
    (parallel/mesh.py)."""
    import jax
    from jax.sharding import Mesh

    devices = devices if devices is not None else jax.devices()
    devs = np.asarray(devices)
    if walkers <= 1:
        return Mesh(devs, ("space",))
    if devs.size % walkers:
        raise ValueError(
            f"{devs.size} devices do not factor into "
            f"(space, walkers={walkers})"
        )
    return Mesh(devs.reshape(devs.size // walkers, walkers),
                ("space", "walkers"))


class SpatialCellEngine:
    """Cell engine with the fine grid sharded across a ``space`` mesh
    axis: ONE large system's slabs are split into contiguous
    fine-layer blocks per device, halo-refreshed by ring ppermute;
    boundary movers are computed redundantly and the acceptance chain
    runs replicated on psum-assembled [K, W] tables (see the module
    docstring for the full argument).

    Scope: the translation sub-step scan is sharded; everything at
    cycle rank (rebin, scheduled volume moves, delta-sync, chain
    resync) runs on the gathered global state exactly as the
    unsharded engine - those paths are rare (list_update_int /
    mpi_sync_int cadence) and already validated.  Supported kernel
    modes match the unsharded engine minus the per-candidate-delta
    scatter: cell_pallas in ('off', 'apply', 'auto') - the Pallas
    energies/points/apply kernels are row-id agnostic and run on the
    device-LOCAL slabs and tables; cell_chain any value (the chain
    kernel runs REPLICATED on the psum-assembled global tables);
    cell_trials >= 1 (T > 1 requires the in-place apply kernel - the
    XLA multi-trial apply uses unique-index scatter SETS the padded
    spatial schedules cannot promise).

    Implemented as a wrapper that drives a plain CellEngine's
    phase-split methods (_propose_t1/_propose_tm, _chain_t1/
    _chain_*_substep, _apply_tm) plus, on the T=1 XLA path, a
    duplicate-safe scatter-ADD apply (_apply_spatial below).  With
    the in-place kernels, duplicate safety comes from the plan's
    DUMMY row instead: padding entries read/write only the
    all-invalid dummy row, so every REAL row is visited at most once
    (global same-colour disjointness + the injective local row map)
    and the kernels' in-place semantics hold unchanged."""

    def __init__(self, prm, model, grid, aux, cellgrid, cellaux,
                 mesh):
        import jax

        from ..mcmc.cellengine import CellEngine

        if prm.cell_pallas == "on":
            raise ValueError(
                "spatial sharding supports cell_pallas in ('off', "
                "'apply', 'auto'): the 'on' per-candidate-delta "
                "scatter path has no duplicate-safe spatial apply"
            )
        self.inner = CellEngine(prm, model, grid, aux, cellgrid,
                                cellaux)
        if self.inner.T > 1 and not self.inner.use_cell_apply:
            raise ValueError(
                "cell_trials > 1 under spatial sharding requires "
                "the in-place apply kernel: set cell_pallas='apply' "
                "(needs a disjoint-stencil grid; on CPU 'auto' "
                "disables kernels, so pass 'apply' explicitly)"
            )
        self.prm = self.inner.prm
        self.grid = grid
        self.aux = aux
        self.cellgrid = cellgrid
        self.smesh = mesh
        # 2-D space x walkers composition: the slab partition follows
        # the "space" axis; the walker ensemble shards over "walkers"
        self.ndev = int(dict(zip(mesh.axis_names,
                                 mesh.devices.shape))["space"])
        self.wdev = int(dict(zip(mesh.axis_names,
                                 mesh.devices.shape)).get("walkers", 1))
        if self.wdev > 1 and prm.n_walkers % self.wdev:
            raise ValueError(
                f"n_walkers={prm.n_walkers} must divide over the "
                f"walkers mesh axis ({self.wdev})"
            )
        self.plan = build_spatial_plan(
            cellgrid, np.asarray(self.inner.fc_stack), self.ndev
        )
        p = self.plan
        # [D, T, ...] device-major table stacks (device slice hoisted
        # out of the sub-step scan)
        self.t_mover_idx = jnp.asarray(p.mover_idx.transpose(1, 0, 2))
        self.t_fc_local = jnp.asarray(p.fc_local.transpose(1, 0, 2))
        self.t_cand_local = jnp.asarray(
            p.cand_local.transpose(1, 0, 2, 3)
        )
        self.t_own_fc = jnp.asarray(p.own_fc.transpose(1, 0, 2))
        self._jit_run_cycles = jax.jit(self._run_cycles,
                                       static_argnums=(1,))

    # -- sharding-stable entry -----------------------------------------
    #
    # The region's out_specs hand some state leaves back with
    # NamedShardings attached (pks/tpm are sharded over "space" at the
    # boundary and _unpack mixes them into r/moments).  Feeding that
    # output state into a second run_cycles call then presents jit
    # with DIFFERENT input shardings than the first call - and jit
    # re-lowers and re-compiles.  Round 3 measured this recompile as
    # an "8x spatial slowdown" / "11x shard_map composite pathology"
    # (DESIGN.md 5c): every bench timed exactly the second call, whose
    # wall time is ~pure XLA compile (probe_resharding_recompile.py -
    # call3 runs at full unsharded parity).  Pinning every leaf to a
    # canonical replicated NamedSharding at entry AND exit makes the
    # call a sharding fixed point: one compile, ever.

    # state fields with NO walker axis (or whose trailing axis must
    # never be mistaken for one - e.g. shared_key [2] when W == 2,
    # the window-major master DS slabs [nwin, B])
    _REPL_FIELDS = frozenset({
        "origin", "cycle", "shared_key", "dropped",
        "master_eta", "master_hist", "master_uhist",
    })

    def _wleaf_spec(self, leaf):
        """Trailing-walker-axis rule for one leaf
        (parallel/mesh.shard_state's rule); replicated over space."""
        from jax.sharding import PartitionSpec as P

        W = self.prm.n_walkers
        if self.wdev == 1 or not hasattr(leaf, "ndim") or leaf.ndim < 1:
            return P()
        if leaf.shape[-1] == W:
            return P(*((None,) * (leaf.ndim - 1) + ("walkers",)))
        return P()

    def _state_specs(self, s):
        """Field-aware PartitionSpec pytree for a CellState."""
        import jax
        from jax.sharding import PartitionSpec as P

        W = self.prm.n_walkers
        out = []
        for name, sub in zip(type(s)._fields, s):
            if self.wdev == 1 or name in self._REPL_FIELDS:
                out.append(jax.tree.map(lambda _: P(), sub))
            elif name == "key":                          # [W, 2]
                out.append(P("walkers", None))
            else:
                out.append(jax.tree.map(self._wleaf_spec, sub))
        return type(s)(*out)

    def _canon_state(self, s):
        import jax
        from jax.sharding import NamedSharding

        return jax.tree.map(
            lambda spec: NamedSharding(self.smesh, spec),
            self._state_specs(s),
            is_leaf=lambda x: isinstance(
                x, jax.sharding.PartitionSpec
            ),
        )

    def run_cycles(self, s, n_cycles: int):
        import jax

        s = jax.device_put(s, self._canon_state(s))
        return self._jit_run_cycles(s, n_cycles)

    # -- helpers -------------------------------------------------------

    def _halo(self, x_own, rows_halo):
        """[rows_owned, ...] -> [rows_owned + 2*rows_halo, ...] by the
        ±1 ring shift (lo halo = down neighbour's LAST owned rows, hi
        halo = up neighbour's FIRST; test_halo_sources...ring)."""
        import jax

        D = self.ndev
        up = [(i, (i + 1) % D) for i in range(D)]
        dn = [(i, (i - 1) % D) for i in range(D)]
        lo = jax.lax.ppermute(x_own[-rows_halo:], "space", up)
        hi = jax.lax.ppermute(x_own[:rows_halo], "space", dn)
        return jnp.concatenate([x_own, lo, hi], axis=0)

    def _apply_spatial(self, eng, pks_loc, tpm3, fc_l, cand_l,
                       oh_sel, p_old, p_new, per, accepts, has_count):
        """Duplicate-safe apply: pure scatter-ADDs of masked-to-zero
        contributions (algebraically identical to CellEngine._apply_t1
        + _scatter_moments, whose coordinate/own-moment SETs assume
        unique indices the padded spatial schedules cannot promise)."""
        cg = self.cellgrid
        cap = cg.cap
        L = len(pks_loc)
        K, CF = cand_l.shape
        W = pks_loc[0].shape[-1]
        from ..ops.cells import PK_R0

        accf = accepts                                       # [K,W]
        mask_acc = accf[:, None, :] & oh_sel             # [K,cap,W]
        dp = p_new - p_old                             # [L,3,K,W]
        cand_flat = cand_l.reshape(-1)
        out = []
        for l in range(L):
            pk = pks_loc[l]
            # coordinates: += dp at the accepted mover's slot
            dcoord = jnp.where(
                mask_acc[None], dp[l][:, :, None, :], 0.0
            )                                        # [3,K,cap,W]
            pk = pk.at[fc_l, PK_R0:PK_R0 + 3].add(
                jnp.moveaxis(dcoord, 0, 1)
            )
            # wing-moment deltas of the stencil cells
            _, _, co, cn = per[l]
            d_stack = jnp.stack([
                (fn - fo).reshape(K, -1, cap, W)
                for fo, fn in zip(co.delta(), cn.delta())
            ], axis=2)                            # [K,CF,10,cap,W]
            acc_b = accf[:, None, None, None, :]
            pk = pk.at[cand_flat, 0:10].add(
                jnp.where(acc_b, d_stack, 0.0).reshape(
                    K * CF, 10, cap, W
                )
            )
            # the mover's own moments: += (new_own - current) at its
            # one-hot slot (gather-after-add makes this the SET of
            # _scatter_moments_one, but duplicate-safe)
            own_stack = jnp.stack(list(cn.own), axis=1)   # [K,10,W]
            cur = pk[fc_l, 0:10]                      # [K,10,cap,W]
            d_own = jnp.where(
                mask_acc[:, None],
                own_stack[:, :, None, :] - cur, 0.0,
            )
            pk = pk.at[fc_l, 0:10].add(d_own)
            out.append(pk)

        inc = (has_count[:, None, :] & oh_sel).astype(jnp.int32)
        tpm3 = tpm3.at[fc_l].add(inc)
        return out, tpm3

    # -- the sharded sub-step scan --------------------------------------

    def _localise(self, x_own, fill):
        """Owned rows -> the local slab frame: [owned | lo halo | hi
        halo (ndev > 1 only) | DUMMY], the dummy row filled with
        ``fill`` (invalid occupancy / zero packed data).  Called ONCE
        per scan - inside the sub-step loop only the halo rows are
        refreshed in place (_refresh_halo); a per-sub-step concat
        would copy the whole multi-100MB slab through HBM every
        sub-step (measured 7x whole-engine slowdown)."""
        rows_halo = self.plan.rows_halo
        parts = (
            [self._halo(x_own, rows_halo)]
            if self.ndev > 1 else [x_own]
        )
        parts.append(
            jnp.full((1,) + x_own.shape[1:], fill, x_own.dtype)
        )
        return jnp.concatenate(parts, axis=0)

    def _refresh_halo(self, x_loc):
        """In-place halo refresh of a LOCAL slab [owned | lo | hi |
        dummy]: the ±1 ring shift of the neighbours' owned edge rows
        (same sources as _halo), written with static-offset dynamic
        updates so the scan carry never copies.  The dummy row needs
        no refresh: its validity row is zero forever, so stale
        garbage written to it by padded movers is never read as
        data."""
        import jax

        D = self.ndev
        rows_halo = self.plan.rows_halo
        rows_owned = self.plan.rows_owned
        up = [(i, (i + 1) % D) for i in range(D)]
        dn = [(i, (i - 1) % D) for i in range(D)]
        lo = jax.lax.ppermute(
            jax.lax.slice_in_dim(
                x_loc, rows_owned - rows_halo, rows_owned, axis=0
            ),
            "space", up,
        )
        hi = jax.lax.ppermute(
            jax.lax.slice_in_dim(x_loc, 0, rows_halo, axis=0),
            "space", dn,
        )
        x_loc = jax.lax.dynamic_update_slice_in_dim(
            x_loc, lo, rows_owned, axis=0
        )
        return jax.lax.dynamic_update_slice_in_dim(
            x_loc, hi, rows_owned + rows_halo, axis=0
        )

    def _sharded_scan(self, s, codes, u_all, switch_ok, n_sub):
        """shard_map region: per-device sub-step scan with halo
        refresh, psum-assembled chain tables, local apply."""
        import jax
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        eng = self.inner
        cg = self.cellgrid
        plan = self.plan
        cap = cg.cap
        K = eng.K
        Tm = eng.T
        D = self.ndev
        W = s.mu.shape[-1]
        rows_owned = plan.rows_owned

        pks = eng._pack(s)                    # L x [nfine,R,cap,W]
        s2m3 = s.slot2mol.reshape(cg.nfine, cap, W)
        # strip the big per-walker slabs from the replicated carry
        s_sc = s._replace(
            r=s.r[:, :, :0],
            moments=type(s.moments)(*(f[:, :0] for f in s.moments)),
            slot2mol=s.slot2mol[:0], mol2slot=s.mol2slot[:0],
        )

        def region(s_sc, pks_own, s2m_own, u_all, codes, switch_ok):
            d = jax.lax.axis_index("space")
            mv_d = jax.lax.dynamic_index_in_dim(
                self.t_mover_idx, d, 0, keepdims=False
            )                                        # [T,K_loc]
            fcl_d = jax.lax.dynamic_index_in_dim(
                self.t_fc_local, d, 0, keepdims=False
            )
            cnd_d = jax.lax.dynamic_index_in_dim(
                self.t_cand_local, d, 0, keepdims=False
            )
            own_d = jax.lax.dynamic_index_in_dim(
                self.t_own_fc, d, 0, keepdims=False
            )
            # occupancy is static inside the scan (rebins happen
            # outside): build the local-with-halo view once
            s2m_loc = self._localise(s2m_own, -1)
            # walker count INSIDE the region: W/wdev under the 2-D
            # space x walkers mesh (the outer W is the global count)
            W_loc = s_sc.mu.shape[-1]
            s2m_flat = s2m_loc.reshape(-1, W_loc)
            valid_loc = s2m_flat >= 0
            rows_slab = s2m_loc.shape[0]
            tpm3_loc0 = jnp.zeros((rows_slab, cap, W_loc), jnp.int32)
            # the scan CARRIES the localised slabs (owned + halo +
            # dummy); each sub-step only refreshes the halo rows in
            # place - re-localising per sub-step would stream the
            # whole slab through HBM every sub-step
            pks_loc0 = [self._localise(p, 0) for p in pks_own]

            def body(carry, xs):
                st, pks_loc, tpm3 = carry
                sid, u = xs                         # u [K,n_u,W]
                tbl = jnp.mod(sid, eng.n_tables)
                if D > 1:
                    pks_loc = [self._refresh_halo(p) for p in pks_loc]
                mv = jnp.take(mv_d, tbl, axis=0)      # [K_loc]
                vj = mv >= 0
                mvc = jnp.maximum(mv, 0)
                fc_l = jnp.take(fcl_d, tbl, axis=0)
                cand_l = jnp.take(cnd_d, tbl, axis=0)
                ownf = jnp.take(own_d, tbl, axis=0) & vj
                fc_row = jnp.take(eng.fc_stack, tbl, axis=0)
                off_row = jnp.take(eng.off_stack, tbl, axis=0)
                fc_g = jnp.take(fc_row, mvc, axis=0)  # global ids
                off_g = jnp.take(off_row, mvc, axis=0)
                u_loc = jnp.take(u, mvc, axis=0)   # [K_loc,n_u,W]
                codes_k = jax.lax.dynamic_slice(
                    codes, (sid * K * Tm,), (K * Tm,)
                )
                st_loc = st._replace(slot2mol=s2m_flat)

                # one-owner scatter + psum -> replicated global
                # chain tables in canonical mover order
                def to_global(x):
                    """[.., K_loc, W] -> replicated [.., K, W]: one
                    owner per mover contributes (own_fc is one-hot
                    across devices), padding rows add zero."""
                    was_bool = x.dtype == jnp.bool_
                    xi = x.astype(jnp.int32) if was_bool else x
                    xk = jnp.moveaxis(xi, -2, 0)   # [K_loc,..,W]
                    msk = ownf.reshape(
                        (ownf.shape[0],) + (1,) * (xk.ndim - 1)
                    )
                    xo = jnp.where(msk, xk, 0)
                    z = jnp.zeros(
                        (K,) + xk.shape[1:], xk.dtype
                    ).at[mvc].add(xo)
                    z = jax.lax.psum(
                        jnp.moveaxis(z, 0, -2), "space"
                    )
                    return z.astype(bool) if was_bool else z

                if Tm == 1:
                    st2, pks_new, tpm3 = self._substep_t1(
                        eng, st, st_loc, pks_loc, tpm3, fc_g, fc_l,
                        cand_l, off_g, u, u_loc, codes_k, switch_ok,
                        valid_loc, vj, mvc, ownf, to_global,
                    )
                else:
                    st2, pks_new, tpm3 = self._substep_tm(
                        eng, st, st_loc, pks_loc, tpm3, fc_g, fc_l,
                        cand_l, off_g, u, u_loc, codes_k, switch_ok,
                        valid_loc, vj, mvc, ownf, to_global,
                    )
                return (st2, pks_new, tpm3), None

            (st, pks_loc, tpm_loc), _ = jax.lax.scan(
                body, (s_sc, pks_loc0, tpm3_loc0),
                (jnp.arange(n_sub, dtype=jnp.int32), u_all),
            )
            # drop halo + dummy rows once, after the whole scan (tpm
            # halo rows stay zero: counts are owner-masked)
            return (st, [p[:rows_owned] for p in pks_loc],
                    tpm_loc[:rows_owned])

        # walker-axis composition: every [.., W] operand additionally
        # shards its trailing axis over "walkers" (degenerate when the
        # mesh has no walkers axis); the region body is elementwise in
        # W throughout, so it is oblivious to W being a shard
        wk = "walkers" if self.wdev > 1 else None
        s_spec = self._state_specs(s_sc)
        pk_spec = [P("space", None, None, wk) for _ in pks]
        s2m_spec = P("space", None, wk)
        u_spec = P(None, None, None, wk)
        swok_spec = P(wk)
        tpm_spec = P("space", None, wk)
        rep = P()
        out = shard_map(
            region, mesh=self.smesh,
            in_specs=(s_spec, pk_spec, s2m_spec, u_spec, rep,
                      swok_spec),
            out_specs=(s_spec, pk_spec, tpm_spec),
            # check_vma=True would statically verify the P() chain
            # outputs are device-invariant, but it requires explicit
            # pvary plumbing through every replicated-x-varying op in
            # the region (tried 2026-08-20: fails at trace time).
            # The replication invariant is instead checked
            # DYNAMICALLY by the full-cycle equality test: any
            # non-replicated chain state on a non-zero device would
            # contaminate the next sub-step's one-owner psum and
            # break the 10^3-sub-step bit-equality vs the unsharded
            # engine (tests/test_spatial_engine.py
            # test_sharded_equals_unsharded).
            check_vma=False,
        )(s_sc, pks, s2m3, u_all, codes, switch_ok)
        st, pks_g, tpm_g = out
        st = st._replace(slot2mol=s.slot2mol, mol2slot=s.mol2slot)
        st = eng._unpack(st, list(pks_g))
        return st, tpm_g.reshape(cg.nslot, W)

    def _substep_t1(self, eng, st, st_loc, pks_loc, tpm3, fc_g, fc_l,
                    cand_l, off_g, u, u_loc, codes_k, switch_ok,
                    valid_loc, vj, mvc, ownf, to_global):
        """T=1 sub-step inside the region: local propose, replicated
        chain (XLA micro-batched or the fused chain+WL kernel on the
        assembled point tables), local apply (in-place kernel or the
        duplicate-safe scatter-ADD path)."""
        from ..mcmc.cellengine import TRANS

        cap = self.cellgrid.cap

        (rank, oh_sel, blk_r, p_old, p_new, has_mover,
         in_cell, dE, per) = eng._propose_t1(
            st_loc, pks_loc, fc_g, cand_l, off_g, u_loc,
            fc_local=fc_l, valid=valid_loc,
        )
        has_mover = has_mover & vj[:, None]

        has_g = to_global(has_mover)
        if eng.use_chain_kernel:
            # point-table form (P=2) on one-owner-assembled ABSOLUTE
            # energies; ua/uz in canonical order from the replicated
            # uniform block (cellengine._substep kernel branch)
            e_loc = jnp.stack([
                jnp.stack([p[0], p[1]], axis=0) for p in per
            ])                                     # [L,2,K_loc,W]
            e_g = to_global(e_loc)
            in1_g = to_global(in_cell)
            in_pts = jnp.stack([jnp.ones_like(in1_g), in1_g])
            two, cmu, sw_c, minu_c = eng._hoisted_chain_terms(st)
            st2, j_oh_g, _en = eng._chain_kernel_substep(
                st, e_g, in_pts, has_g, codes_k,
                u[:, 5, :], u[:, 6, :], switch_ok, cmu, sw_c, minu_c,
            )
            accepts_g = j_oh_g[:, 1, :]
            tt_g = jnp.broadcast_to(
                (codes_k == TRANS)[:, None], accepts_g.shape
            )
        else:
            dE_g = to_global(dE)
            in_g = to_global(in_cell)
            st2, accepts_g, _tt = eng._chain_t1(
                st, dE_g, in_g, has_g, codes_k,
                u[:, 5, :], u[:, 6, :], switch_ok,
            )
            tt_g = jnp.broadcast_to(
                _tt[:, None], accepts_g.shape
            )

        acc_l = jnp.take(accepts_g, mvc, axis=0) & vj[:, None]
        tt_l = jnp.take(tt_g, mvc, axis=0) & vj[:, None]
        has_count = has_mover & ownf[:, None] & tt_l

        if eng.use_cell_pallas and eng.use_cell_apply:
            # in-place apply kernel on the LOCAL slab (owned + halo +
            # dummy): real rows are visited at most once (global
            # disjointness + injective row map; padding lands on the
            # dummy row), so the kernel's visit-once requirement
            # holds; halo/dummy writes are dropped by the caller
            pks_new = [
                eng.apply_kernel(
                    pks_loc[l], st.h[l], cand_l, off_g, fc_l, rank,
                    acc_l, p_old[l], p_new[l], per[l][2],
                )
                for l in range(len(pks_loc))
            ]
            W = acc_l.shape[-1]
            inc = (has_count[:, None, :] & oh_sel).astype(jnp.int32)
            tpm3 = tpm3.at[fc_l].add(inc)
        else:
            pks_new, tpm3 = self._apply_spatial(
                eng, pks_loc, tpm3, fc_l, cand_l, oh_sel,
                p_old, p_new, per, acc_l, has_count,
            )
        return st2, pks_new, tpm3

    def _substep_tm(self, eng, st, st_loc, pks_loc, tpm3, fc_g, fc_l,
                    cand_l, off_g, u, u_loc, codes_k, switch_ok,
                    valid_loc, vj, mvc, ownf, to_global):
        """Multi-trial sub-step inside the region: local anchored-
        window propose (P-point tables via the points kernel on the
        local slab), replicated chain on the psum-assembled
        [L, P, K, W] energy table, local in-place apply of each
        mover's final point."""
        K = eng.K
        Tm = eng.T
        P = Tm + 1
        W = st.mu.shape[-1]

        (rank, oh_sel, blk_r, p_old, pts, in_cell, has_mover, e,
         owns, cs) = eng._propose_tm(
            st_loc, pks_loc, fc_g, cand_l, off_g, u_loc,
            fc_local=fc_l, valid=valid_loc,
        )
        has_mover = has_mover & vj[:, None]

        e_g = to_global(e)                          # [L,P,K,W]
        in_g = to_global(in_cell)                   # [P,K,W]
        has_g = to_global(has_mover)

        two, cmu, sw_c, minu_c = eng._hoisted_chain_terms(st)
        if eng.use_chain_kernel:
            st2, j_oh_g, en_g = eng._chain_kernel_substep(
                st, e_g, in_g, has_g, codes_k,
                u[:, 4 + 3 * Tm:4 + 4 * Tm, :].reshape(K * Tm, W),
                u[:, 4 + 4 * Tm:4 + 5 * Tm, :].reshape(K * Tm, W),
                switch_ok, cmu, sw_c, minu_c,
            )
        else:
            st2, j_oh_g, en_g = eng._chain_xla_substep(
                st, e_g, in_g, has_g, codes_k, u, switch_ok,
                two, cmu, sw_c, minu_c,
            )

        # local slice of the accepted-point one-hot; padded movers
        # stay at point 0 (no accept, no apply)
        iota_p = jnp.arange(P, dtype=jnp.int32)[None, :, None]
        j_loc = jnp.where(
            vj[:, None, None],
            jnp.take(j_oh_g, mvc, axis=0),
            iota_p == 0,
        )                                           # [K_loc,P,W]
        pks_new = eng._apply_tm(
            st, pks_loc, fc_l, cand_l, off_g, rank, oh_sel, blk_r,
            p_old, pts, owns, cs, j_loc,
        )
        en_l = jnp.take(en_g, mvc, axis=0) * (
            ownf.astype(jnp.int32)[:, None]
        )                                           # [K_loc,W]
        inc = en_l[:, None, :] * oh_sel.astype(jnp.int32)
        tpm3 = tpm3.at[fc_l].add(inc)
        return st2, pks_new, tpm3

    # -- cycle / driver --------------------------------------------------

    def _one_cycle(self, s):
        """The shared CellEngine cycle skeleton with the sub-step
        scan replaced by the sharded region (the pre/post cycle-rank
        phases run on the global state unchanged -
        cellengine._cycle_with)."""
        return self.inner._cycle_with(s, self._sharded_scan)

    def _run_cycles(self, s, n_cycles: int):
        import jax

        def body(carry, _):
            return self._one_cycle(carry)

        s2, samples = jax.lax.scan(body, s, None, length=n_cycles)
        # exit with the same canonical (replicated) shardings the
        # entry device_put establishes - see run_cycles
        s2 = jax.lax.with_sharding_constraint(s2, self._canon_state(s2))
        return s2, samples
