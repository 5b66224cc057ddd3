"""Gather-free dense SW energy kernels via three-body moment tensors.

THE hot compute path of the framework - a TPU-native reformulation of
the reference's neighbour-list energy engine (molint.F90:220-499).

Why not neighbour lists on TPU: the Fortran hot kernel is a chain of
indexed gathers (partner lists jn/vn, neighbour-of-neighbour lookups,
molint.F90:302-343).  On TPU, general gathers execute orders of
magnitude below roofline; dense masked arithmetic runs at full VPU
rate.  For the system sizes of this code (N ~ 10^1-10^3) the dense
candidate set {(j, s) : j in [N], s in image shifts} is only ~30x
larger than a Verlet list, so trading 30x regular flops for zero
gathers wins by ~100x.

The key algebraic device: the Stillinger-Weber three-body sum around a
centre is quadratic in the neighbour unit vectors,

  sum_{j<k} w_j w_k (u_j.u_k - c0)^2
    = 1/2 [ ||M||_F^2 - 2 c0 |m|^2 + c0^2 s^2 - (1-c0)^2 sum_j w_j^2 ]

with moments  M = sum_j w_j u_j u_j^T,  m = sum_j w_j u_j,
s = sum_j w_j and leg weight w_j = exp(gamma*sigma/(r_j - a*sigma))
(masked to the cutoff).  All angle enumeration disappears; each
molecule carries a 3x3 symmetric moment, updated incrementally as
molecules move - the dense analog of the reference's incremental
model_energy bookkeeping (mc_moves.F90:1016,1087).

Layout: everything is coordinate-split ([N,S] scalar arrays per x/y/z
component, moments as ten scalar fields per molecule) - TPU vector
registers are (8,128) tiles, so trailing length-3 axes would pad 43x;
scalar-component arrays keep the hot loop at full lane occupancy.

Exactness note: the reference's *local* path drops three-body terms
with cos(theta) >= 0.99 (molint.F90:367) to remove the degenerate
k==i direction of its j-centred gather; its *full-cell* path does not
filter, so reference local and full energies disagree by the smooth-
cutoff-suppressed weight of genuinely near-collinear triplets.  Here
the degenerate k==i term is removed analytically ((1-c0)^2 w term), so
local and full energies agree EXACTLY: this framework samples the
unfiltered published SW Hamiltonian - a deliberate, physically
equivalent deviation (SURVEY.md §2.1).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models.sw import SWParams


class Moments(NamedTuple):
    """Per-molecule three-body moments, coordinate-split.

    Every field has the same shape [..., N]: s1 = sum of leg weights,
    (mx,my,mz) = weighted unit-vector sum, and the six independent
    components of the symmetric second moment.
    """

    s1: jnp.ndarray
    mx: jnp.ndarray
    my: jnp.ndarray
    mz: jnp.ndarray
    mxx: jnp.ndarray
    myy: jnp.ndarray
    mzz: jnp.ndarray
    mxy: jnp.ndarray
    mxz: jnp.ndarray
    myz: jnp.ndarray


class _Cand(NamedTuple):
    """Dense candidate data for one centre molecule, axes [N, S]."""

    pair_sum: jnp.ndarray     # scalar
    w: jnp.ndarray            # [N,S]
    ux: jnp.ndarray           # [N,S] unit vectors centre -> candidate
    uy: jnp.ndarray
    uz: jnp.ndarray
    e3i: jnp.ndarray          # scalar centre-angle sum
    own: Moments              # scalar fields: the centre's moments
    delta: Moments            # [N] fields: centre's contribution to
                              # each molecule j's moments (m* sign is
                              # from j's perspective, i.e. -u)


def _leg(rij, in_rc, prm: SWParams):
    denom = jnp.where(in_rc, rij - prm.rc, -1.0)
    return jnp.where(in_rc, jnp.exp(prm.gamma * prm.sigma / denom), 0.0)


def _pair(r2s, rij, in_rc, prm: SWParams):
    sig2 = prm.sigma * prm.sigma
    denom = jnp.where(in_rc, rij - prm.rc, -1.0)
    e = (
        prm.bigA * prm.epsilon
        * (prm.bigB * sig2 * sig2 / (r2s * r2s) - 1.0)
        * jnp.exp(prm.sigma / denom)
    )
    return jnp.where(in_rc, e, 0.0)


def _e3_closed_form(m: Moments, sumw2, c0):
    """1/2 [||M||^2 - 2 c0 |m|^2 + c0^2 s^2 - (1-c0)^2 sum w^2]."""
    frob = (
        m.mxx * m.mxx + m.myy * m.myy + m.mzz * m.mzz
        + 2.0 * (m.mxy * m.mxy + m.mxz * m.mxz + m.myz * m.myz)
    )
    msq = m.mx * m.mx + m.my * m.my + m.mz * m.mz
    return 0.5 * (
        frob - 2.0 * c0 * msq + c0 * c0 * m.s1 * m.s1
        - (1.0 - c0) ** 2 * sumw2
    )


def _img_components(shifts, H, dtype):
    """Image translation vectors, coordinate-split: three [S] arrays."""
    sf = shifts.astype(dtype)
    ix = sf[:, 0] * H[0, 0] + sf[:, 1] * H[0, 1] + sf[:, 2] * H[0, 2]
    iy = sf[:, 0] * H[1, 0] + sf[:, 1] * H[1, 1] + sf[:, 2] * H[1, 2]
    iz = sf[:, 0] * H[2, 0] + sf[:, 1] * H[2, 1] + sf[:, 2] * H[2, 2]
    return ix, iy, iz


def _mic_disp(dx, dy, dz, H):
    """Minimum-image displacement components (util.f90:108-156).

    Valid when every box length exceeds twice the cutoff - asserted at
    engine construction.  Inline 3x3 inverse; no trailing-3 arrays.
    """
    det = (
        H[0, 0] * (H[1, 1] * H[2, 2] - H[1, 2] * H[2, 1])
        - H[0, 1] * (H[1, 0] * H[2, 2] - H[1, 2] * H[2, 0])
        + H[0, 2] * (H[1, 0] * H[2, 1] - H[1, 1] * H[2, 0])
    )
    inv_det = 1.0 / det
    # rows of H^{-1} (cofactors transposed)
    a00 = (H[1, 1] * H[2, 2] - H[1, 2] * H[2, 1]) * inv_det
    a01 = (H[0, 2] * H[2, 1] - H[0, 1] * H[2, 2]) * inv_det
    a02 = (H[0, 1] * H[1, 2] - H[0, 2] * H[1, 1]) * inv_det
    a10 = (H[1, 2] * H[2, 0] - H[1, 0] * H[2, 2]) * inv_det
    a11 = (H[0, 0] * H[2, 2] - H[0, 2] * H[2, 0]) * inv_det
    a12 = (H[0, 2] * H[1, 0] - H[0, 0] * H[1, 2]) * inv_det
    a20 = (H[1, 0] * H[2, 1] - H[1, 1] * H[2, 0]) * inv_det
    a21 = (H[0, 1] * H[2, 0] - H[0, 0] * H[2, 1]) * inv_det
    a22 = (H[0, 0] * H[1, 1] - H[0, 1] * H[1, 0]) * inv_det
    sx = a00 * dx + a01 * dy + a02 * dz
    sy = a10 * dx + a11 * dy + a12 * dz
    sz = a20 * dx + a21 * dy + a22 * dz
    sx = sx - jnp.floor(sx + 0.5)
    sy = sy - jnp.floor(sy + 0.5)
    sz = sz - jnp.floor(sz + 0.5)
    ox = H[0, 0] * sx + H[0, 1] * sy + H[0, 2] * sz
    oy = H[1, 0] * sx + H[1, 1] * sy + H[1, 2] * sz
    oz = H[2, 0] * sx + H[2, 1] * sy + H[2, 2] * sz
    return ox, oy, oz


def _candidates(rx, ry, rz, H, i, p, shifts, prm: SWParams,
                mic: bool = False) -> _Cand:
    """Dense neighbourhood of the molecule at ``p`` (index ``i``).

    rx/ry/rz: [N] stored coordinates with molecule i's entries NOT yet
    substituted - the substitution happens here via a where, so no
    scatter is issued.  The null image of the centre itself is
    non-self-interacting (molint.F90:196-198, 532).

    mic=True: displacements are folded by minimum image FIRST and the
    (reduced) shift set is applied on top.  With per-axis residual
    shifts only where the box is narrower than 2*cutoff (see
    reduced_shift_set), this shrinks the image enumeration from 27 to
    1-3 candidates per molecule with exact results.
    """
    N = rx.shape[0]
    dtype = rx.dtype
    one_i = jnp.arange(N) == i
    ex = jnp.where(one_i, p[0], rx)
    ey = jnp.where(one_i, p[1], ry)
    ez = jnp.where(one_i, p[2], rz)

    if mic:
        fx, fy, fz = _mic_disp(ex - p[0], ey - p[1], ez - p[2], H)
    else:
        fx, fy, fz = ex - p[0], ey - p[1], ez - p[2]
    imx, imy, imz = _img_components(shifts, H, dtype)
    dx = fx[:, None] + imx[None, :]                 # [N,S]
    dy = fy[:, None] + imy[None, :]
    dz = fz[:, None] + imz[None, :]
    r2 = dx * dx + dy * dy + dz * dz
    is_null = jnp.all(shifts == 0, axis=-1)         # [S]
    in_rc = (r2 < prm.rc2) & ~(one_i[:, None] & is_null[None, :])

    r2s = jnp.where(in_rc, r2, 1.0)
    inv = jax.lax.rsqrt(r2s)
    rij = r2s * inv

    pair_sum = jnp.sum(_pair(r2s, rij, in_rc, prm))
    w = _leg(rij, in_rc, prm)
    ux, uy, uz = dx * inv, dy * inv, dz * inv

    wux, wuy, wuz = w * ux, w * uy, w * uz
    # per-j contributions (reduce images only)
    d_s1 = jnp.sum(w, axis=1)
    d_mx = -jnp.sum(wux, axis=1)                    # j's perspective
    d_my = -jnp.sum(wuy, axis=1)
    d_mz = -jnp.sum(wuz, axis=1)
    d_mxx = jnp.sum(wux * ux, axis=1)
    d_myy = jnp.sum(wuy * uy, axis=1)
    d_mzz = jnp.sum(wuz * uz, axis=1)
    d_mxy = jnp.sum(wux * uy, axis=1)
    d_mxz = jnp.sum(wux * uz, axis=1)
    d_myz = jnp.sum(wuy * uz, axis=1)
    delta = Moments(d_s1, d_mx, d_my, d_mz, d_mxx, d_myy, d_mzz,
                    d_mxy, d_mxz, d_myz)

    # the centre's own moments (note sign: from the centre, m = +sum)
    own = Moments(
        jnp.sum(d_s1), -jnp.sum(d_mx), -jnp.sum(d_my), -jnp.sum(d_mz),
        jnp.sum(d_mxx), jnp.sum(d_myy), jnp.sum(d_mzz),
        jnp.sum(d_mxy), jnp.sum(d_mxz), jnp.sum(d_myz),
    )
    sumw2 = jnp.sum(w * w)
    e3i = _e3_closed_form(own, sumw2, prm.cos0)

    return _Cand(pair_sum, w, ux, uy, uz, e3i, own, delta)


def _jcentred(c: _Cand, m: Moments, prm: SWParams):
    """Wing-angle sums i-j-k over all candidates (j, s).

    For each in-range candidate the angles at j collapse to j's
    moments (molint.F90:324-343); v = -u is the direction from j back
    to the centre (v^T M v = u^T M u, v.m = -u.m), and the degenerate
    k==centre-same-image term is removed analytically.
    """
    c0 = prm.cos0
    ux, uy, uz = c.ux, c.uy, c.uz
    quad = (
        ux * ux * m.mxx[:, None]
        + uy * uy * m.myy[:, None]
        + uz * uz * m.mzz[:, None]
        + 2.0 * (
            ux * uy * m.mxy[:, None]
            + ux * uz * m.mxz[:, None]
            + uy * uz * m.myz[:, None]
        )
    )
    lin = ux * m.mx[:, None] + uy * m.my[:, None] + uz * m.mz[:, None]
    per = (
        quad + 2.0 * c0 * lin + (c0 * c0) * m.s1[:, None]
        - (1.0 - c0) ** 2 * c.w
    )
    return jnp.sum(c.w * per)


def local_energies_dense(r, H, i, p_new, mom: Moments, shifts,
                         prm: SWParams, mic: bool = False):
    """(E_old, E_new, post-accept Moments) for a trial move of ``i``.

    One lattice; the engine vmaps over (walker, lattice).  Equivalent
    to 2x compute_local_real_energy (molint.F90:220-404) plus the
    incremental moment bookkeeping that replaces neighbour lists.
    """
    lam_eps = prm.lam * prm.epsilon
    rx, ry, rz = r[:, 0], r[:, 1], r[:, 2]
    p_old = r[i]

    co = _candidates(rx, ry, rz, H, i, p_old, shifts, prm, mic)
    e3j_old = _jcentred(co, mom, prm)
    e_old = co.pair_sum + lam_eps * (co.e3i + e3j_old)

    cn = _candidates(rx, ry, rz, H, i, p_new, shifts, prm, mic)

    # world with i at p_new: every other molecule's moments corrected
    # by i's old/new contributions; i's own moments replaced outright
    N = r.shape[0]
    one_i = jnp.arange(N) == i
    eff = Moments(*(
        jnp.where(one_i, ow, st - do + dn)
        for st, do, dn, ow in zip(mom, co.delta, cn.delta, cn.own)
    ))

    e3j_new = _jcentred(cn, eff, prm)
    e_new = cn.pair_sum + lam_eps * (cn.e3i + e3j_new)
    return e_old, e_new, eff


def full_energy_dense(r, H, shifts, prm: SWParams, mic: bool = False):
    """Whole-cell energy + fresh per-molecule moments (one lattice).

    Dense [N, N, S] equivalent of compute_model_energy
    (molint.F90:407-499): per centre i, half the pair sum plus the
    centre-angle moment formula (each angle counted once at its
    centre).
    """
    N = r.shape[0]
    dtype = r.dtype
    rx, ry, rz = r[:, 0], r[:, 1], r[:, 2]
    eye = jnp.eye(N, dtype=bool)
    if mic:
        fx, fy, fz = _mic_disp(
            rx[None, :] - rx[:, None],
            ry[None, :] - ry[:, None],
            rz[None, :] - rz[:, None],
            H,
        )
    else:
        fx = rx[None, :] - rx[:, None]
        fy = ry[None, :] - ry[:, None]
        fz = rz[None, :] - rz[:, None]
    imx, imy, imz = _img_components(shifts, H, dtype)
    dx = fx[:, :, None] + imx[None, None, :]
    dy = fy[:, :, None] + imy[None, None, :]
    dz = fz[:, :, None] + imz[None, None, :]
    r2 = dx * dx + dy * dy + dz * dz                 # [N,N,S]
    is_null = jnp.all(shifts == 0, axis=-1)
    in_rc = (r2 < prm.rc2) & ~(
        eye[:, :, None] & is_null[None, None, :]
    )
    r2s = jnp.where(in_rc, r2, 1.0)
    inv = jax.lax.rsqrt(r2s)
    rij = r2s * inv

    pair_half = 0.5 * jnp.sum(_pair(r2s, rij, in_rc, prm))
    w = _leg(rij, in_rc, prm)
    ux, uy, uz = dx * inv, dy * inv, dz * inv
    wux, wuy, wuz = w * ux, w * uy, w * uz

    red = lambda a: jnp.sum(a, axis=(1, 2))          # noqa: E731
    mom = Moments(
        red(w), red(wux), red(wuy), red(wuz),
        red(wux * ux), red(wuy * uy), red(wuz * uz),
        red(wux * uy), red(wux * uz), red(wuy * uz),
    )
    sumw2 = red(w * w)
    e3 = _e3_closed_form(mom, sumw2, prm.cos0)       # [N]
    energy = pair_half + prm.lam * prm.epsilon * jnp.sum(e3)
    return energy, mom


# batched wrappers over (walker, lattice); molecule index and trial
# position differ per walker but are shared across the two replicas
# (mc_moves.F90:1006-1018)
local_energies_dense_batched = jax.vmap(
    jax.vmap(local_energies_dense,
             in_axes=(0, 0, None, 0, 0, None, None, None)),
    in_axes=(0, 0, 0, 0, 0, None, None, None),
)

full_energy_dense_batched = jax.vmap(
    jax.vmap(full_energy_dense, in_axes=(0, 0, None, None, None)),
    in_axes=(0, 0, None, None, None),
)


def reduced_shift_set(H, prm: SWParams, margin: float = 1.02):
    """Residual image shifts needed after minimum-image folding.

    Per axis: a MIC-folded displacement has |frac| <= 0.5, so further
    in-cutoff images exist only when the perpendicular box width is
    below 2*cutoff; then shifts up to ceil(rc/width - 0.5) are needed
    (with a small margin for volume-move excursions, backstopped by
    the engine's general-path audit).  Returns an int32 [S,3] array,
    null shift first - e.g. 3 shifts instead of 27 for the packaged
    ice Ic cell whose b-width is just under 2*cutoff."""
    import math

    import numpy as np

    H = np.asarray(H, dtype=np.float64)
    if H.ndim == 2:
        H = H[None]
    need = [0, 0, 0]
    for Hl in H.reshape(-1, 3, 3):
        vol = abs(np.linalg.det(Hl))
        for a in range(3):
            b, c = (a + 1) % 3, (a + 2) % 3
            cross = np.cross(Hl[:, b], Hl[:, c])
            width = vol / np.linalg.norm(cross)
            n = max(0, math.ceil(margin * prm.rc / width - 0.5))
            need[a] = max(need[a], n)
    shifts = [(0, 0, 0)]
    import itertools

    for sh in itertools.product(*[range(-n, n + 1) for n in need]):
        if sh != (0, 0, 0):
            shifts.append(sh)
    return np.asarray(shifts, dtype=np.int32)
