"""Slab-based SW energy kernels for the large-N cell engine.

Large-N counterpart of ops/dense.py (same moment-tensor algebra, same
Hamiltonian - molint.F90:220-499): instead of a dense [S, N, W]
candidate set per mover (O(N) per move), candidates come from the
static coverage tables of the two-level fine grid (ops/cells.py):
for a batch of movers (one per same-colour coarse cell), the
candidate set is the per-coarse-cell list of fine cells within
r_cov = rc + mismatch of the coarse cube; for the full-cell energy,
each fine cell's own coverage list.  All slab accesses gather
whole-cell [cap, W] blocks at STATIC table indices - no per-walker
dynamic gathers on the hot path.

Periodic images: a candidate cell that wraps the box contributes its
occupants shifted by H @ off with off the static wrap offset
(cells.build_grid).  The coverage tables contain every interaction
partner in BOTH replicas, each exactly once, so no minimum-image
folding is needed at all.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..models.sw import SWParams
from .cells import CellGrid
from .dense import Moments, _e3_closed_form, _leg, _pair


def _cell_take(arr, cells, cap):
    """Gather candidate fine cells at CELL granularity.

    arr [nslot, W] viewed as [nfine, cap, W]; cells [K, C] (static
    numpy or traced, shared across walkers) -> [K, C*cap, W].
    Whole-cell blocks keep each gathered row cap*W wide (vs W-wide
    slot rows, which are tile-hostile on TPU).
    """
    W = arr.shape[-1]
    K = cells.shape[0]
    a = arr.reshape(-1, cap, W)
    return jnp.take(
        a, jnp.asarray(cells).reshape(-1), axis=0
    ).reshape(K, -1, W)


class _SlabCand:
    """Candidate data of one mover batch against its coverage set.

    All arrays [K, C, W] with C = CC*cap (or [K, W] reductions).
    """

    __slots__ = ("pair_sum", "w", "ux", "uy", "uz", "e3i", "own",
                 "d_s1", "d_mx", "d_my", "d_mz", "d_mxx", "d_myy",
                 "d_mzz", "d_mxy", "d_mxz", "d_myz")

    def __init__(self, **kw):
        for k, v in kw.items():
            setattr(self, k, v)

    def delta(self):
        return Moments(self.d_s1, self.d_mx, self.d_my, self.d_mz,
                       self.d_mxx, self.d_myy, self.d_mzz,
                       self.d_mxy, self.d_mxz, self.d_myz)


def _shift_vectors(H, off):
    """H [3,3,W] x off [K,CC,3] -> three [K,CC,W] shift components."""
    off = jnp.asarray(off).astype(H.dtype)
    comps = []
    for a in range(3):
        comps.append(
            jnp.einsum("kc,w->kcw", off[:, :, 0], H[a, 0])
            + jnp.einsum("kc,w->kcw", off[:, :, 1], H[a, 1])
            + jnp.einsum("kc,w->kcw", off[:, :, 2], H[a, 2])
        )
    return comps


def _gather_candidates(rx, ry, rz, valid, H, cand_cells, cand_off,
                       cand_mask, cap, mover_slot):
    """Shared candidate gather for the old/new mover positions.

    Returns (cx, cy, cz image-shifted coordinates [K,C,W],
    mask [K,C,W]) - identical for both evaluation points of a trial
    move, so gathered ONCE per lattice per sub-step.
    """
    take = lambda arr: _cell_take(arr, cand_cells, cap)     # noqa: E731
    cx, cy, cz = take(rx), take(ry), take(rz)
    cval = take(valid)
    mask_slots = jnp.asarray(
        np.repeat(np.asarray(cand_mask), cap)
    )                                                       # [CC*cap]
    cval = cval & mask_slots[None, :, None]

    shx, shy, shz = _shift_vectors(H, cand_off)             # [K,CC,W]
    rep = lambda s: jnp.repeat(s, cap, axis=1)              # noqa: E731
    cx = cx + rep(shx)
    cy = cy + rep(shy)
    cz = cz + rep(shz)

    K = cand_cells.shape[0]
    slot_ids = (
        jnp.asarray(cand_cells)[:, :, None] * cap
        + jnp.arange(cap, dtype=jnp.int32)
    ).reshape(K, -1)                                        # [K,C]
    not_self = slot_ids[:, :, None] != mover_slot[:, None, :]
    return cx, cy, cz, cval & not_self


def _slab_candidates(cand, p, prm: SWParams) -> _SlabCand:
    """Candidate energies/legs of movers at positions ``p``.

    cand: output of _gather_candidates; p: (px,py,pz) each [K, W].
    """
    cx, cy, cz, mask = cand
    px, py, pz = p
    dx = cx - px[:, None, :]
    dy = cy - py[:, None, :]
    dz = cz - pz[:, None, :]
    r2 = dx * dx + dy * dy + dz * dz
    in_rc = (r2 < prm.rc2) & mask
    r2s = jnp.where(in_rc, r2, 1.0)
    inv = jax.lax.rsqrt(r2s)
    rij = r2s * inv

    pair_sum = jnp.sum(_pair(r2s, rij, in_rc, prm), axis=1)   # [K,W]
    w = _leg(rij, in_rc, prm)
    ux, uy, uz = dx * inv, dy * inv, dz * inv

    wux, wuy, wuz = w * ux, w * uy, w * uz
    own = Moments(
        jnp.sum(w, axis=1),
        jnp.sum(wux, axis=1), jnp.sum(wuy, axis=1),
        jnp.sum(wuz, axis=1),
        jnp.sum(wux * ux, axis=1), jnp.sum(wuy * uy, axis=1),
        jnp.sum(wuz * uz, axis=1),
        jnp.sum(wux * uy, axis=1), jnp.sum(wux * uz, axis=1),
        jnp.sum(wuy * uz, axis=1),
    )
    sumw2 = jnp.sum(w * w, axis=1)
    e3i = _e3_closed_form(own, sumw2, prm.cos0)               # [K,W]

    # per-candidate contributions to each j's moments (from j's view,
    # the leg direction is -u; ops/dense.py delta convention)
    return _SlabCand(
        pair_sum=pair_sum, w=w, ux=ux, uy=uy, uz=uz, e3i=e3i, own=own,
        d_s1=w, d_mx=-wux, d_my=-wuy, d_mz=-wuz,
        d_mxx=wux * ux, d_myy=wuy * uy, d_mzz=wuz * uz,
        d_mxy=wux * uy, d_mxz=wux * uz, d_myz=wuy * uz,
    )


def _slab_jcentred(c: _SlabCand, m: Moments, prm: SWParams):
    """Wing-angle sums i-j-k over slab candidates -> [K, W].

    ``m``: gathered coverage-set moments, fields [K, C, W]
    (ops/dense._jcentred with the slab candidate axis)."""
    c0 = prm.cos0
    ux, uy, uz = c.ux, c.uy, c.uz
    quad = (
        ux * ux * m.mxx + uy * uy * m.myy + uz * uz * m.mzz
        + 2.0 * (ux * uy * m.mxy + ux * uz * m.mxz + uy * uz * m.myz)
    )
    lin = ux * m.mx + uy * m.my + uz * m.mz
    per = (
        quad + 2.0 * c0 * lin + (c0 * c0) * m.s1
        - (1.0 - c0) ** 2 * c.w
    )
    return jnp.sum(c.w * per, axis=1)


def mover_energies(slab_r, slab_mom: Moments, valid, H, cand_cells,
                   cand_off, cand_mask, cap, mover_slot, p_old, p_new,
                   prm: SWParams):
    """One lattice: old/new local energies of a batch of K movers.

    slab_r: [3, nslot, W]; slab_mom fields [nslot, W];
    valid: [nslot, W]; H: [3,3,W]; cand_* static coverage tables for
    the movers' coarse cells; mover_slot: [K, W]; p_old/p_new:
    [3, K, W].

    Returns (e_old [K,W], e_new [K,W], cand_old, cand_new) - the
    candidate objects carry the leg data needed for post-accept
    moment updates.  Slab counterpart of dense.local_energies_batch
    (itself 2x compute_local_real_energy, molint.F90:220-404).
    """
    lam_eps = prm.lam * prm.epsilon
    rx, ry, rz = slab_r[0], slab_r[1], slab_r[2]

    cand = _gather_candidates(rx, ry, rz, valid, H, cand_cells,
                              cand_off, cand_mask, cap, mover_slot)
    co = _slab_candidates(cand, (p_old[0], p_old[1], p_old[2]), prm)
    take = lambda arr: _cell_take(arr, cand_cells, cap)     # noqa: E731
    mom_nb = Moments(*(take(f) for f in slab_mom))
    e3j_old = _slab_jcentred(co, mom_nb, prm)
    e_old = co.pair_sum + lam_eps * (co.e3i + e3j_old)

    cn = _slab_candidates(cand, (p_new[0], p_new[1], p_new[2]), prm)
    # world with the mover at p_new: every neighbour's moments
    # corrected by the mover's old/new leg contributions
    eff = Moments(*(
        m - do + dn
        for m, do, dn in zip(mom_nb, co.delta(), cn.delta())
    ))
    e3j_new = _slab_jcentred(cn, eff, prm)
    e_new = cn.pair_sum + lam_eps * (cn.e3i + e3j_new)
    return e_old, e_new, co, cn


def mover_point_energies(slab_r, slab_mom: Moments, valid, H,
                         cand_cells, cand_off, cand_mask, cap,
                         mover_slot, pts, prm: SWParams):
    """One lattice: local energies of K movers at P evaluation points
    each (the multi-trial sub-step, cell_trials > 1).

    pts: [P, 3, K, W]; point 0 MUST be the mover's stored position -
    the slab moments carry the mover's own leg contributions from
    there, so the world with the mover at point t uses neighbour
    moments ``mom - delta(point 0) + delta(point t)``.  e(t) is the
    mover's full local energy in world(t); since the total-energy
    identity dE(0 -> t) = e(t) - e(0) holds for every t (the same
    identity the old/new pair of :func:`mover_energies` uses),
    dE(j -> t) = e(t) - e(j) for ANY pair of points - the chain can
    compose trials from one precomputed table.

    Returns (e [P, K, W], owns: list of P Moments ([K, W] fields),
    cands: list of P _SlabCand) - cands feed the XLA post-chain
    moment scatter (mixture of per-point deltas at the accepted
    point).  Candidate gather happens ONCE (point-independent).
    """
    lam_eps = prm.lam * prm.epsilon
    cand = _gather_candidates(slab_r[0], slab_r[1], slab_r[2], valid,
                              H, cand_cells, cand_off, cand_mask, cap,
                              mover_slot)
    take = lambda arr: _cell_take(arr, cand_cells, cap)     # noqa: E731
    mom_nb = Moments(*(take(f) for f in slab_mom))
    P = pts.shape[0]
    cs = [
        _slab_candidates(cand, (pts[t, 0], pts[t, 1], pts[t, 2]), prm)
        for t in range(P)
    ]
    d0 = cs[0].delta()
    es, owns = [], []
    for t in range(P):
        if t == 0:
            eff = mom_nb
        else:
            eff = Moments(*(
                m - a + b
                for m, a, b in zip(mom_nb, d0, cs[t].delta())
            ))
        e3j = _slab_jcentred(cs[t], eff, prm)
        es.append(cs[t].pair_sum + lam_eps * (cs[t].e3i + e3j))
        owns.append(cs[t].own)
    return jnp.stack(es), owns, cs


# per-intermediate element budget for the full-energy kernel: the
# [cc, cap, ng*cap, W] candidate tensors must fit comfortably in HBM
# (~10 live f32 arrays of this size under XLA buffer reuse)
_FULL_ENERGY_MAX_ELEMS = 1 << 24


def _pick_chunking(nfine: int, CF: int, cap: int, W: int,
                   max_elems: int) -> tuple:
    """(cell_chunk, ngroup): candidate-cell group size ngroup <= CF
    and centre-cell count cc | nfine keeping the candidate
    intermediate cc*cap*(ngroup*cap)*W under the element budget."""
    per_cell = cap * cap * W
    ngroup = max(1, min(CF, max_elems // max(per_cell, 1)))
    cc = 1
    for c in range(min(nfine, 64), 0, -1):
        if nfine % c == 0 and c * ngroup * per_cell <= max_elems:
            cc = c
            break
    return cc, ngroup


def slab_full_energy(slab_r, valid, H, grid: CellGrid, prm: SWParams,
                     cell_chunk: int | None = None):
    """One lattice: total energy + fresh per-slot moments.

    Slab counterpart of dense.full_energy_batch (compute_model_energy,
    molint.F90:407-499): per slot i, half the pair sum plus the
    centre-angle moment formula.  Centres are FINE cells, candidates
    their static coverage lists; chunked over centre cells with
    lax.map and over candidate-cell groups, bounding every
    intermediate regardless of cap/W.

    Returns (energy [W], Moments fields [nslot, W]).
    """
    nfine, cap = grid.nfine, grid.cap
    CF = grid.full_cells.shape[1]
    rx, ry, rz = slab_r[0], slab_r[1], slab_r[2]
    W = rx.shape[-1]
    dtype = rx.dtype
    lam_eps = prm.lam * prm.epsilon

    if cell_chunk is None:
        cell_chunk, ngroup = _pick_chunking(
            nfine, CF, cap, W, _FULL_ENERGY_MAX_ELEMS
        )
    else:
        ngroup = CF
    assert nfine % cell_chunk == 0

    # pad the candidate axis to a multiple of ngroup (mask kills pads)
    ngr = -(-CF // ngroup)
    CFp = ngr * ngroup
    fc = np.zeros((nfine, CFp), dtype=np.int32)
    fo = np.zeros((nfine, CFp, 3), dtype=np.int32)
    fm = np.zeros(CFp, dtype=bool)
    fc[:, :CF] = grid.full_cells
    fo[:, :CF] = grid.full_off
    fm[:CF] = grid.full_mask

    nchunk = nfine // cell_chunk
    cells_all = jnp.asarray(fc.reshape(nchunk, cell_chunk, CFp))
    off_all = jnp.asarray(
        fo.astype(np.float64).reshape(nchunk, cell_chunk, CFp, 3)
    )
    mask_g = fm.reshape(ngr, ngroup)

    def one_chunk(args):
        cells27, off27, cell0 = args
        B = cell_chunk * cap
        ctr = cell0 * cap + jnp.arange(B, dtype=jnp.int32)
        ctr_valid = jnp.take(valid, ctr, axis=0)              # [B,W]
        px = jnp.take(rx, ctr, axis=0)
        py = jnp.take(ry, ctr, axis=0)
        pz = jnp.take(rz, ctr, axis=0)
        rs = lambda a: a.reshape(cell_chunk, cap, W)        # noqa: E731
        pxr, pyr, pzr = rs(px), rs(py), rs(pz)
        ctr_ids = ctr.reshape(cell_chunk, cap, 1, 1)
        cvalr = rs(ctr_valid)[:, :, None, :]

        shx27, shy27, shz27 = _shift_vectors(H, off27)   # [cc,CFp,W]

        pair_half = jnp.zeros((cell_chunk, cap, W), dtype=dtype)
        acc = None
        sumw2 = jnp.zeros((cell_chunk, cap, W), dtype=dtype)

        for gi in range(ngr):
            if not mask_g[gi].any():
                continue
            g0 = gi * ngroup
            nbc = cells27[:, g0:g0 + ngroup]     # [cc, ng]
            C = ngroup * cap
            take = lambda arr: jnp.take(                    # noqa: E731
                arr.reshape(-1, cap, W), nbc.reshape(-1), axis=0
            ).reshape(cell_chunk, C, W)
            cx, cy, cz = take(rx), take(ry), take(rz)
            cval = take(valid)
            gmask = jnp.asarray(np.repeat(mask_g[gi], cap))
            cval = cval & gmask[None, :, None]
            rep = lambda s: jnp.repeat(                     # noqa: E731
                s[:, g0:g0 + ngroup], cap, axis=1
            )
            cx = cx + rep(shx27)
            cy = cy + rep(shy27)
            cz = cz + rep(shz27)

            dx = cx[:, None, :, :] - pxr[:, :, None, :]  # [cc,cap,C,W]
            dy = cy[:, None, :, :] - pyr[:, :, None, :]
            dz = cz[:, None, :, :] - pzr[:, :, None, :]

            slot_ids = (
                nbc[:, :, None] * cap
                + jnp.arange(cap, dtype=jnp.int32)
            ).reshape(cell_chunk, 1, C, 1)
            not_self = slot_ids != ctr_ids
            mask = cval[:, None, :, :] & not_self & cvalr
            r2 = dx * dx + dy * dy + dz * dz
            in_rc = (r2 < prm.rc2) & mask
            r2s = jnp.where(in_rc, r2, 1.0)
            inv = jax.lax.rsqrt(r2s)
            rij = r2s * inv

            pair_half = pair_half + 0.5 * jnp.sum(
                _pair(r2s, rij, in_rc, prm), axis=2
            )                                                # [cc,cap,W]
            w = _leg(rij, in_rc, prm)
            ux, uy, uz = dx * inv, dy * inv, dz * inv
            wux, wuy, wuz = w * ux, w * uy, w * uz
            red = lambda a: jnp.sum(a, axis=2)              # noqa: E731
            part = Moments(
                red(w), red(wux), red(wuy), red(wuz),
                red(wux * ux), red(wuy * uy), red(wuz * uz),
                red(wux * uy), red(wux * uz), red(wuy * uz),
            )
            acc = part if acc is None else Moments(*(
                a + p for a, p in zip(acc, part)
            ))
            sumw2 = sumw2 + red(w * w)

        mom = acc
        e3 = _e3_closed_form(mom, sumw2, prm.cos0)           # [cc,cap,W]
        e_chunk = jnp.sum(pair_half + lam_eps * e3, axis=(0, 1))
        return e_chunk, Moments(*(
            f.reshape(cell_chunk * cap, W) for f in mom
        ))

    cell0s = jnp.arange(0, nfine, cell_chunk, dtype=jnp.int32)
    e_chunks, mom_chunks = jax.lax.map(
        one_chunk, (cells_all, off_all, cell0s)
    )
    energy = jnp.sum(e_chunks, axis=0).astype(dtype)
    moments = Moments(*(
        f.reshape(grid.nslot, W) for f in mom_chunks
    ))
    return energy, moments
