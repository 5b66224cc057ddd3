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

    mover_idx = np.full((T, ndev, K_loc), -1, dtype=np.int32)
    fc_local = np.zeros((T, ndev, K_loc), dtype=np.int32)
    cand_local = np.zeros((T, ndev, K_loc, CF), dtype=np.int32)
    own_fc = np.zeros((T, ndev, K_loc), dtype=bool)
    own_cand = np.zeros((T, ndev, K_loc, CF), dtype=bool)
    for t in range(T):
        row_fc = fc_stack[t].astype(np.int64)
        cand = cg.full_cells[row_fc].astype(np.int64)      # [K, CF]
        for d in range(ndev):
            idx = sched[d][t]
            k = len(idx)
            loc = loc_of_global[d]
            mover_idx[t, d, :k] = idx
            fc_local[t, d, :k] = loc[row_fc[idx]]
            cand_local[t, d, :k] = np.maximum(loc[cand[idx]], 0)
            own_fc[t, d, :k] = owner[row_fc[idx]] == d
            own_cand[t, d, :k] = (
                (owner[cand[idx]] == d) & cg.full_mask[None, :]
            )
            # padding entries point at row 0 with all-False ownership
            # (they are also masked by mover_idx == -1)

    return SpatialPlan(
        ndev=ndev, reach=reach, halo_layers=halo_layers,
        layers_owned=layers_owned,
        rows_owned=rows_owned, rows_halo=rows_halo, K_loc=K_loc,
        loc_of_global=loc_of_global,
        halo_lo_src=halo_lo_src, halo_hi_src=halo_hi_src,
        mover_idx=mover_idx, fc_local=fc_local,
        cand_local=cand_local, own_fc=own_fc, own_cand=own_cand,
    )
