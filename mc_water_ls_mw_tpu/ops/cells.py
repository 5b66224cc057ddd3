"""Two-level fractional cell grid for the large-N parallel-sweep engine.

New capability beyond the reference (SURVEY.md §7 step 8: the
reference's neighbour search is brute-force O(N^2), molint.F90:501-559,
single process only).  This module provides the spatial decomposition
that makes N >= 10^4 lattice-switch sampling tractable on TPU.

Geometry lives in the MID-replica fractional frame: molecules are
binned by f_mid = f1 - dfrac0/2, the average of the two replicas'
(invariantly offset) fractional coordinates.  Both replicas share
every fractional displacement (mc_moves.F90:1042-1067, 1284-1350), so
f_mid moves exactly with the molecule, and each replica's Cartesian
position sits within mismatch/2 of the mid position (models/stacking.py
on the invariant correspondence mismatch) - halving the padding the
lattice-1 frame would need.

Two levels:

* COARSE cells (side > 2*rc + mismatch): the checkerboard unit.
  Coarse cells are 8-coloured (parity of the 3 indices; counts forced
  even).  One molecule per same-colour coarse cell is trial-moved per
  sub-step; same-colour movers are >= one coarse cell apart in the
  mid frame, hence > 2*rc apart in BOTH replicas, so their Delta-E
  evaluations and moment updates are exactly independent.  A move
  that would cross the mover's stored FINE-cell boundary is rejected
  (a state-only-dependent hard wall; the reverse proposal faces the
  same wall, preserving detailed balance) - keeping every molecule
  inside the fine cube it was binned into, so the static coverage
  tables stay exact for the whole binning epoch.  The grid origin is
  re-drawn at random + molecules re-binned every ``list_update_int``
  cycles, restoring ergodicity across cells - the standard
  checkerboard construction of massively-parallel MC.

* FINE cells (coarse subdivided m x m x m): the candidate-search unit
  and the slab-storage unit (nslot = nfine*cap slots; slot s holds
  molecule slot2mol[s] or -1).  Static tables list, for every coarse
  cell, the fine cells within r_cov = rc + mismatch of ANY point of
  the coarse cube (every interaction partner of any mover in the
  cell, in both replicas) - a several-fold smaller candidate set than
  the coarse 27-neighbourhood, at identical all-static block-gather
  cost.  A second table set covers each FINE cell for the full-cell
  energy kernel.

Tables are built from the INITIAL box geometry with a shrink guard:
coverage radii are inflated by ``guard``, and the volume move rejects
any box whose perpendicular widths shrink below 1/guard of the
initial ones (cellengine), so the static tables stay valid for the
whole run.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

# packed-slab row layout ([nfine, PK_ROWS, cap, W] per lattice): the
# sub-step kernels are DMA-issue-bound, so the scan carries ONE packed
# tensor per lattice (a single block descriptor per candidate cell)
# instead of 14 per-field slabs.  Rows 0:10 = the moment fields in
# ops/dense.Moments order; PK_R0:PK_R0+3 = x, y, z; PK_VALID =
# slot-occupied flag as 1.0/0.0 (static between rebins).
PK_R0 = 10
PK_VALID = 13
PK_ROWS = 14


@dataclasses.dataclass(frozen=True)
class CellGrid:
    """Static two-level cell-grid topology (host numpy, trace consts)."""

    n: tuple              # coarse cells per axis, each even >= 4
    m: int                # fine subdivisions per coarse axis
    cap: int              # slot capacity per FINE cell
    guard: float          # shrink-guard factor baked into the tables
    perp_w0: np.ndarray   # [L,3] initial per-lattice box perp widths
    block_cells: np.ndarray   # [ncoarse, m^3] fine ids per coarse cell
    cand_cells: np.ndarray    # [ncoarse, CC] candidate fine ids
    cand_off: np.ndarray      # [ncoarse, CC, 3] periodic wrap offsets
    cand_mask: np.ndarray     # [CC] valid-entry mask (list padding)
    full_cells: np.ndarray    # [nfine, CF] per-fine-cell coverage ids
    full_off: np.ndarray      # [nfine, CF, 3]
    full_mask: np.ndarray     # [CF]
    color_cells: np.ndarray   # [8, ncoarse/8] coarse ids per colour

    @property
    def nf(self) -> tuple:
        return tuple(self.m * x for x in self.n)

    @property
    def ncoarse(self) -> int:
        return int(np.prod(self.n))

    @property
    def nfine(self) -> int:
        return int(np.prod(self.nf))

    # legacy aliases used by the engine
    @property
    def ncell(self) -> int:
        return self.ncoarse

    @property
    def nslot(self) -> int:
        return self.nfine * self.cap

    @property
    def cells_per_color(self) -> int:
        return self.ncoarse // 8


def perp_widths(H) -> np.ndarray:
    """Perpendicular widths of the cell H along its three axes."""
    H = np.asarray(H, dtype=np.float64)
    vol = abs(np.linalg.det(H))
    w = np.empty(3)
    for a in range(3):
        b, c = (a + 1) % 3, (a + 2) % 3
        w[a] = vol / np.linalg.norm(np.cross(H[:, b], H[:, c]))
    return w


def coverage_radius(model, mismatch: float) -> float:
    """Interaction-coverage radius in the mid frame: a partner within
    rc of a molecule in EITHER replica lies within rc + mismatch of
    its mid position (each replica's Cartesian position is within
    mismatch/2 of mid)."""
    return model.rc + mismatch


def min_coarse_side(model, mismatch: float, margin: float) -> float:
    """Checkerboard-independence bound in the mid frame: same-colour
    movers one coarse cell apart are > 2*rc apart in both replicas
    when the side exceeds 2*rc + mismatch."""
    return margin * (2.0 * model.rc + mismatch)


def choose_grid_shape(H_list, model, mismatch: float,
                      margin: float = 1.13,
                      prefer_disjoint: bool = False) -> tuple:
    """Largest even coarse counts (>= 4) satisfying the independence
    bound for every lattice's box.  ``margin`` must cover the volume
    shrink guard (build_grid guard default 1.08).  Raises if the box
    is too small (use the dense engine instead).

    prefer_disjoint: additionally clamp the counts so every FINE cell
    side stays >= r_cov = rc + mismatch (under the same margin) - the
    coverage stencil then collapses to the 27-cell cube and
    same-colour stencils become pairwise disjoint, enabling
    cell_pallas='apply' (in-place aliased moment updates).  Costs
    mover parallelism (fewer, larger coarse cells); raises if the
    disjoint bound cannot reach 4 cells per axis.
    """
    s_min = min_coarse_side(model, mismatch, margin)
    w = np.min([perp_widths(H) for H in np.asarray(H_list)], axis=0)
    n = []
    for a in range(3):
        na = int(np.floor(w[a] / s_min))
        if prefer_disjoint:
            # fine side = coarse/2 must stay >= margin * r_cov
            r_cov = model.rc + mismatch
            na = min(na, int(np.floor(w[a] / (2.0 * margin * r_cov))))
        na -= na % 2
        if na < 4:
            raise ValueError(
                f"box axis {a}: width {w[a]:.2f} Bohr supports only "
                f"{na} cells of side >= {s_min:.2f} Bohr"
                + (" under the disjoint-stencil bound"
                   if prefer_disjoint else "")
                + "; the parallel cell engine needs >= 4 (use the "
                "dense engine for this system size)"
            )
        n.append(na)
    return tuple(n)


def _offset_sets(n, m, w_fine, r_cov):
    """Fine-cell offset stencils (shared by every cell, by
    translational symmetry).

    Returns (block_offs [m^3,3], cand_offs [CC0,3], full_offs [CF0,3]):
    fine-cell index offsets whose cube lies within r_cov of the coarse
    cube [0,m)^3 (cand) or of the fine cube [0,1)^3 (full).

    A cell is EXCLUDED only when its max-norm per-axis gap exceeds
    r_cov: the Cartesian distance between the cubes is >= gap_a * w_a
    along EVERY axis for ANY cell matrix whose perpendicular widths
    satisfy the runtime guard - including the sheared boxes the
    anisotropic NPT volume move produces, where a per-axis Euclidean
    combination would NOT be a valid lower bound.  (Slightly larger
    tables than a Euclidean trim; rigor over corner-trimming.)
    """
    nf = [m * x for x in n]
    reach = [
        min(int(np.ceil(r_cov / w_fine[a])) + 1, nf[a] // 2)
        for a in range(3)
    ]

    def covers(off, hi):
        # per-axis Cartesian gap between fine cube [off, off+1) and
        # the base cube [0, hi)
        g = np.empty(3)
        for a in range(3):
            ga = max(0, off[a] - hi, -off[a] - 1)
            g[a] = ga * w_fine[a]
        return float(g.max()) <= r_cov

    block_offs = np.array(
        [[i, j, k] for i in range(m) for j in range(m)
         for k in range(m)],
        dtype=np.int32,
    )
    cand, full = [], []
    for i in range(-reach[0], m + reach[0]):
        for j in range(-reach[1], m + reach[1]):
            for k in range(-reach[2], m + reach[2]):
                off = (i, j, k)
                if covers(off, m):
                    cand.append(off)
                if covers(off, 1):
                    full.append(off)
    return (
        block_offs,
        np.asarray(cand, dtype=np.int32),
        np.asarray(full, dtype=np.int32),
    )


def _materialise(base_coords, offs, nf, pad_to=None):
    """Turn per-cell offset stencils into id + wrap-offset tables.

    base_coords: [M,3] fine coords of each base cell; offs: [C0,3].
    Returns (cells [M,C] int32, wrap [M,C,3] int32, mask [C] bool)
    with C = pad_to or C0 (padding uses cell 0, mask False).
    """
    n1, n2, n3 = nf
    q = base_coords[:, None, :] + offs[None, :, :]       # [M,C0,3]
    wrap = np.zeros_like(q)
    for a, na in enumerate((n1, n2, n3)):
        wrap[..., a] = np.where(
            q[..., a] < 0, 1, np.where(q[..., a] >= na, -1, 0)
        )
    cells = (
        (q[..., 0] % n1) * n2 + (q[..., 1] % n2)
    ) * n3 + (q[..., 2] % n3)
    # image convention: a neighbour stored past the far face
    # contributes at r_stored - H (see nb wrap convention notes)
    wrap = -wrap
    C0 = offs.shape[0]
    C = pad_to or C0
    mask = np.zeros(C, dtype=bool)
    mask[:C0] = True
    if C > C0:
        pad = np.zeros((cells.shape[0], C - C0), dtype=np.int32)
        cells = np.concatenate([cells.astype(np.int32), pad], axis=1)
        wrap = np.concatenate(
            [wrap, np.zeros((wrap.shape[0], C - C0, 3), wrap.dtype)],
            axis=1,
        )
    return cells.astype(np.int32), wrap.astype(np.int32), mask


def build_grid(n: tuple, cap: int, H_list, model, mismatch: float,
               m: int = 2, guard: float = 1.08) -> CellGrid:
    """Build the two-level grid + static coverage tables.

    n: coarse cell counts (even, >= 4); cap: slots per FINE cell;
    H_list: [L,3,3] initial cell matrices (columns = box vectors);
    guard: shrink-guard factor baked into the coverage radii (the
    volume move must reject boxes shrunk below 1/guard).
    """
    n = tuple(int(x) for x in n)
    for na in n:
        if na < 4 or na % 2:
            raise ValueError(f"coarse counts must be even >= 4, got {n}")
    H_arr = np.asarray(H_list, dtype=np.float64)
    if H_arr.ndim == 2:
        H_arr = H_arr[None]
    perp_w0 = np.stack([perp_widths(H) for H in H_arr])   # [L,3]
    nf = tuple(m * x for x in n)
    # worst-case (smallest) fine sides over lattices, deflated by the
    # shrink guard so tables remain valid for any admissible box
    w_fine = perp_w0.min(axis=0) / np.asarray(nf) / guard
    r_cov = coverage_radius(model, mismatch)
    block_offs, cand_offs, full_offs = _offset_sets(
        n, m, w_fine, r_cov
    )

    n1, n2, n3 = n
    ids_c = np.arange(n1 * n2 * n3, dtype=np.int32)
    c1, rem = np.divmod(ids_c, n2 * n3)
    c2, c3 = np.divmod(rem, n3)
    base_c = np.stack([c1, c2, c3], axis=1) * m          # fine coords

    block_cells, _, _ = _materialise(base_c, block_offs, nf)
    cand_cells, cand_off, cand_mask = _materialise(
        base_c, cand_offs, nf
    )

    nf1, nf2, nf3 = nf
    ids_f = np.arange(nf1 * nf2 * nf3, dtype=np.int32)
    f1c, remf = np.divmod(ids_f, nf2 * nf3)
    f2c, f3c = np.divmod(remf, nf3)
    base_f = np.stack([f1c, f2c, f3c], axis=1)
    full_cells, full_off, full_mask = _materialise(
        base_f, full_offs, nf
    )

    color = ((c1 % 2) * 4 + (c2 % 2) * 2 + (c3 % 2)).astype(np.int32)
    color_cells = np.stack(
        [ids_c[color == col] for col in range(8)]
    ).astype(np.int32)

    return CellGrid(
        n=n, m=int(m), cap=int(cap), guard=float(guard),
        perp_w0=perp_w0,
        block_cells=block_cells,
        cand_cells=cand_cells, cand_off=cand_off, cand_mask=cand_mask,
        full_cells=full_cells, full_off=full_off, full_mask=full_mask,
        color_cells=color_cells,
    )


def cap_for_positions(r0, H0, n: tuple, m: int = 2,
                      samples: int = 32, margin: float = 1.3) -> int:
    """Slot capacity from the ACTUAL initial configuration: worst
    fine-cell occupancy over sampled random grid origins (crystals
    bin far less uniformly than the mean - lattice planes align with
    cell boundaries), times a fluctuation margin, rounded up to a
    multiple of 4.  r0 [L,N,3], H0 [L,3,3]; binning uses the
    mid-replica fractional frame (f1 - dfrac0/2)."""
    r0 = np.asarray(r0, dtype=np.float64)
    H0 = np.asarray(H0, dtype=np.float64)
    if r0.ndim == 2:
        r0, H0 = r0[None], H0[None]
    f1 = r0[0] @ np.linalg.inv(H0[0]).T
    if r0.shape[0] == 2:
        f2 = r0[1] @ np.linalg.inv(H0[1]).T
        d = f1 - f2
        d -= np.round(d)
        fmid = f1 - 0.5 * d
    else:
        fmid = f1
    fmid = fmid - np.floor(fmid)
    nf = np.asarray([m * x for x in n])
    rng = np.random.default_rng(0)
    mx = 0
    for si in range(samples):
        origin = np.zeros(3) if si == 0 else rng.uniform(0, 1, 3)
        g = fmid - origin
        g -= np.floor(g)
        c = [
            np.minimum((g[:, a] * nf[a]).astype(np.int64), nf[a] - 1)
            for a in range(3)
        ]
        cid = (c[0] * nf[1] + c[1]) * nf[2] + c[2]
        mx = max(mx, int(np.bincount(
            cid, minlength=int(nf.prod())
        ).max()))
    # next multiple of 4 STRICTLY above margin*max_occ + 1: a long run
    # with thermal disorder plus an unlucky rebin origin must degrade
    # gracefully (occupancy drifts above the crystal's) rather than
    # kill a multi-day run at the overflow audit; cell_cap in the &tpu
    # namelist remains the explicit recovery knob
    need = int(np.floor(mx * margin)) + 2
    return max(4, -(-need // 4) * 4)


def cell_of_frac(grid: CellGrid, f, origin, level: str = "coarse"):
    """Cell id of mid-frame fractional coordinates f [3, ...] with
    grid origin ``origin`` [3].  level: 'coarse' or 'fine'."""
    dims = grid.n if level == "coarse" else grid.nf
    n1, n2, n3 = dims
    g = f - origin.reshape((3,) + (1,) * (f.ndim - 1))
    g = g - jnp.floor(g)
    c1 = jnp.minimum((g[0] * n1).astype(jnp.int32), n1 - 1)
    c2 = jnp.minimum((g[1] * n2).astype(jnp.int32), n2 - 1)
    c3 = jnp.minimum((g[2] * n3).astype(jnp.int32), n3 - 1)
    return (c1 * n2 + c2) * n3 + c3


def bin_molecules(grid: CellGrid, cell_id):
    """Assign slab slots from per-molecule FINE cell ids.

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
