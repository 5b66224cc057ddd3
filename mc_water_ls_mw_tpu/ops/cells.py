"""Fractional cell grid for the large-N parallel-sweep engine.

New capability beyond the reference (SURVEY.md §7 step 8: the
reference's neighbour search is brute-force O(N^2), molint.F90:501-559,
single process only).  This module provides the spatial decomposition
that makes N >= 10^4 lattice-switch sampling tractable on TPU:

* The grid lives in FRACTIONAL coordinates of lattice 1.  Both coupled
  replicas share every fractional displacement (mc_moves.F90:1042-1067,
  1284-1350), so one grid serves both: with cell side
  s >= 2*rc + 2*mismatch (see models/stacking.py on the invariant
  correspondence mismatch), molecules in non-adjacent cells are
  non-interacting in BOTH lattices, and a cell's 27-neighbourhood
  contains every interaction partner of its occupants in BOTH lattices.

* Cells are 8-coloured (parity of the 3 cell indices; cell counts are
  forced even so the colouring is wrap-consistent).  One molecule per
  same-colour cell can be trial-moved concurrently: movers in distinct
  same-colour cells are separated by at least one full cell, hence
  > 2*rc apart in both lattices, so their Delta-E evaluations and
  moment updates are exactly independent (cellengine.py runs the
  accept/reject chain over the movers sequentially, which is then
  EXACTLY the serial Markov chain).

* Occupancy layout: a padded slab of ncell*cap slots; slot s holds
  molecule slot2mol[s] (or -1).  Neighbourhood topology (27 static
  neighbour cells per cell + their periodic wrap offsets) is
  precomputed host-side; all hot-path accesses are static slices of
  the slab - no per-walker gathers.

The grid origin is re-drawn at random and molecules re-binned every
``cell_update_int`` cycles (the large-N analog of the reference's
Verlet rebuild cadence, mc_cycle:218-222): moves crossing a cell
boundary are rejected within a binning epoch (a state-only-dependent
hard wall, preserving detailed balance), and the origin shift restores
ergodicity across cells - the standard checkerboard-MC construction
(massively parallel hard-particle MC literature).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class CellGrid:
    """Static cell-grid topology (host-side numpy, trace-time consts)."""

    n: tuple            # (n1, n2, n3) cells per axis, each even >= 4
    cap: int            # slot capacity per cell
    nb_cell: np.ndarray    # [ncell, 27] int32 neighbour cell ids
    nb_off: np.ndarray     # [ncell, 27, 3] int32 periodic wrap offsets
    color_cells: np.ndarray  # [8, ncell/8] int32 cell ids per colour

    @property
    def ncell(self) -> int:
        return int(np.prod(self.n))

    @property
    def nslot(self) -> int:
        return self.ncell * self.cap

    @property
    def cells_per_color(self) -> int:
        return self.ncell // 8


def perp_widths(H) -> np.ndarray:
    """Perpendicular widths of the cell H along its three axes."""
    H = np.asarray(H, dtype=np.float64)
    vol = abs(np.linalg.det(H))
    w = np.empty(3)
    for a in range(3):
        b, c = (a + 1) % 3, (a + 2) % 3
        w[a] = vol / np.linalg.norm(np.cross(H[:, b], H[:, c]))
    return w


def min_cell_side(model, mismatch: float, max_trans: float,
                  margin: float = 1.02) -> float:
    """Minimum admissible cell side: movers one cell apart must stay
    non-interacting in both lattices (> 2*rc + 2*mismatch), with a
    small margin absorbing volume-move box drift (backstopped by the
    volume-move geometry guard in cellengine)."""
    del max_trans  # movers cannot leave their cell, so no delta term
    return margin * (2.0 * model.rc + 2.0 * mismatch)


def choose_grid_shape(H_list, model, mismatch: float,
                      max_trans: float = 0.0) -> tuple:
    """Largest even cell counts (>= 4) satisfying the side bound for
    every lattice's box.  Raises if the box is too small for the
    parallel-sweep engine (use the dense engine instead)."""
    s_min = min_cell_side(model, mismatch, max_trans)
    w = np.min([perp_widths(H) for H in np.asarray(H_list)], axis=0)
    n = []
    for a in range(3):
        na = int(np.floor(w[a] / s_min))
        na -= na % 2
        if na < 4:
            raise ValueError(
                f"box axis {a}: width {w[a]:.2f} Bohr supports only "
                f"{na} cells of side >= {s_min:.2f} Bohr; the "
                "parallel cell engine needs >= 4 (use the dense "
                "engine for this system size)"
            )
        n.append(na)
    return tuple(n)


def build_grid(n: tuple, cap: int) -> CellGrid:
    """Precompute static neighbourhood topology for an (n1,n2,n3) grid."""
    n1, n2, n3 = n
    for na in n:
        if na < 4 or na % 2:
            raise ValueError(f"cell counts must be even >= 4, got {n}")
    ids = np.arange(n1 * n2 * n3, dtype=np.int32)
    c1, rem = np.divmod(ids, n2 * n3)
    c2, c3 = np.divmod(rem, n3)

    offs = np.array(
        [[i, j, k] for i in (-1, 0, 1) for j in (-1, 0, 1)
         for k in (-1, 0, 1)],
        dtype=np.int32,
    )  # [27,3]
    q1 = c1[:, None] + offs[None, :, 0]
    q2 = c2[:, None] + offs[None, :, 1]
    q3 = c3[:, None] + offs[None, :, 2]
    # wrap offset: +1 where the neighbour wraps below 0, -1 above n-1
    w1, w2, w3 = (
        np.where(q < 0, 1, np.where(q >= na, -1, 0)).astype(np.int32)
        for q, na in ((q1, n1), (q2, n2), (q3, n3))
    )
    nb_cell = (
        ((q1 % n1) * n2 + (q2 % n2)) * n3 + (q3 % n3)
    ).astype(np.int32)
    # wrap offset convention: r_candidate = r_stored - H @ w  fails;
    # define image = r_stored + H @ off with off = -w? Keep explicit:
    # a neighbour with q < 0 stores coordinates near the FAR face, so
    # its image near this cell is r_stored - H (off = -1).
    nb_off = np.stack([-w1, -w2, -w3], axis=-1)

    color = ((c1 % 2) * 4 + (c2 % 2) * 2 + (c3 % 2)).astype(np.int32)
    color_cells = np.stack(
        [ids[color == col] for col in range(8)]
    ).astype(np.int32)
    return CellGrid(
        n=tuple(int(x) for x in n), cap=int(cap),
        nb_cell=nb_cell, nb_off=nb_off, color_cells=color_cells,
    )


def cell_of_frac(grid: CellGrid, f, origin):
    """Cell id of fractional coordinates f [3, ...] with grid origin
    ``origin`` [3] (fractional).  Vectorised over trailing axes."""
    n1, n2, n3 = grid.n
    g = f - origin[:, None] if f.ndim == 2 else \
        f - origin.reshape((3,) + (1,) * (f.ndim - 1))
    g = g - jnp.floor(g)
    c1 = jnp.minimum((g[0] * n1).astype(jnp.int32), n1 - 1)
    c2 = jnp.minimum((g[1] * n2).astype(jnp.int32), n2 - 1)
    c3 = jnp.minimum((g[2] * n3).astype(jnp.int32), n3 - 1)
    return (c1 * n2 + c2) * n3 + c3


def bin_molecules(grid: CellGrid, cell_id):
    """Assign slab slots from per-molecule cell ids.

    cell_id: [N, W] int32.  Returns (slot [N, W] int32 slab slot of
    each molecule, max_occ [W] int32 worst-case cell occupancy).  The
    assignment is a per-walker stable sort by cell id - O(N log N),
    run only at rebin epochs.
    """
    N, W = cell_id.shape
    order = jnp.argsort(cell_id, axis=0, stable=True)       # [N,W]
    sorted_cells = jnp.take_along_axis(cell_id, order, axis=0)
    first = jnp.concatenate(
        [jnp.ones((1, W), dtype=bool),
         sorted_cells[1:] != sorted_cells[:-1]],
        axis=0,
    )
    pos = jnp.arange(N, dtype=jnp.int32)[:, None]
    start = jnp.where(first, pos, 0)
    start = jax.lax.cummax(start, axis=0)
    rank = pos - start                                       # [N,W]
    # clamp on overflow so slots stay in-bounds; the caller MUST check
    # max_occ <= cap (an overflowing walker is corrupt - two molecules
    # share a slot - and the engine surfaces it via occ_overflow)
    slot_sorted = sorted_cells * grid.cap + jnp.minimum(
        rank, grid.cap - 1
    )
    # scatter back to molecule order
    inv = jnp.argsort(order, axis=0)                         # [N,W]
    slot = jnp.take_along_axis(slot_sorted, inv, axis=0)
    max_occ = jnp.max(rank, axis=0) + 1
    return slot, max_occ


def scatter_to_slab(values, slot, nslot):
    """values [..., N, W] + slot [N, W] -> slab [..., nslot, W].

    Empty slots are zero.  Used only at rebin epochs (per-walker
    scatter; the hot path never scatters dynamically).
    """
    W = slot.shape[-1]
    lead = values.shape[:-2]
    out = jnp.zeros(lead + (nslot, W), dtype=values.dtype)
    slot_b = jnp.broadcast_to(slot, values.shape[:-2] + slot.shape)
    return _scatter_axis(out, slot_b, values)


def _scatter_axis(out, idx, val):
    """Scatter val into out along axis -2 using per-element idx
    (vmapped over leading axes and the walker axis)."""
    nslot, W = out.shape[-2:]
    N = idx.shape[-2]
    o2 = out.reshape((-1, nslot, W))
    i2 = idx.reshape((-1, N, W))
    v2 = val.reshape((-1, N, W))

    def per_lead(o, i, v):
        def per_walker(ocol, icol, vcol):
            return ocol.at[icol].set(vcol)
        return jax.vmap(per_walker, in_axes=(1, 1, 1), out_axes=1)(
            o, i, v
        )

    o2 = jax.vmap(per_lead)(o2, i2, v2)
    return o2.reshape(out.shape)


def gather_from_slab(slab, slot):
    """slab [..., nslot, W] + slot [N, W] -> [..., N, W]."""
    lead = slab.shape[:-2]
    slot_b = jnp.broadcast_to(slot, lead + slot.shape)
    return jnp.take_along_axis(slab, slot_b, axis=-2)
