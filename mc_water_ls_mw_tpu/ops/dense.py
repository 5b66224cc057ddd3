"""Gather-free dense SW energy kernels via three-body moment tensors.

THE hot compute path of the framework - a TPU-native reformulation of
the reference's neighbour-list energy engine (molint.F90:220-499).

Why not neighbour lists on TPU: the Fortran hot kernel is a chain of
indexed gathers (partner lists jn/vn, neighbour-of-neighbour lookups,
molint.F90:302-343).  On TPU, general gathers execute orders of
magnitude below roofline; dense masked arithmetic runs at full VPU
rate.  For the system sizes of this code (N ~ 10^1-10^3) the dense
candidate set {(j, s) : j in [N], s in image shifts} is only a few
times larger than a Verlet list once displacements are folded by
minimum image with a reduced residual shift set (reduced_shift_set),
so trading regular flops for zero gathers wins by ~100x.

The key algebraic device: the Stillinger-Weber three-body sum around a
centre is quadratic in the neighbour unit vectors,

  sum_{j<k} w_j w_k (u_j.u_k - c0)^2
    = 1/2 [ ||M||_F^2 - 2 c0 |m|^2 + c0^2 s^2 - (1-c0)^2 sum_j w_j^2 ]

with moments  M = sum_j w_j u_j u_j^T,  m = sum_j w_j u_j,
s = sum_j w_j and leg weight w_j = exp(gamma*sigma/(r_j - a*sigma))
(masked to the cutoff).  All angle enumeration disappears; each
molecule carries ten scalar moment fields, updated incrementally as
molecules move - the dense analog of the reference's incremental
model_energy bookkeeping (mc_moves.F90:1016,1087).

Layout: WALKER-LAST.  Batched arrays end with the walker axis W (a
multiple of the 128-lane register width) and per-molecule axes sit in
the sublane dimension; vectors are coordinate-split scalar fields.
TPU tiles are (8, 128) - walker-first layouts with small trailing axes
([W,L,N,3], [W,L,N]) pad 10-45x in HBM, and that padding dominated the
sampler's scan-carry traffic before this layout.

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

import itertools
import math
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..models.sw import SWParams


class Moments(NamedTuple):
    """Per-molecule three-body moments, coordinate-split.

    Every field has the same shape (typically [L, N, W]): s1 = sum of
    leg weights, (mx,my,mz) = weighted unit-vector sum, and the six
    independent components of the symmetric second moment.
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
    """Dense candidate data for the moved molecule, axes [S, N, W]."""

    pair_sum: jnp.ndarray     # [W]
    w: jnp.ndarray            # [S,N,W]
    ux: jnp.ndarray           # [S,N,W] unit vectors centre -> candidate
    uy: jnp.ndarray
    uz: jnp.ndarray
    e3i: jnp.ndarray          # [W] centre-angle sum
    own: Moments              # [W] fields: the centre's moments
    delta: Moments            # [N,W] fields: centre's contribution to
                              # each molecule j's moments (m* sign is
                              # from j's perspective, i.e. -u)


# The cutoff test is made on r^2 while the screening denominator uses
# the ROUNDED rij = r2s*rsqrt(r2s): for r^2 one ulp inside rc^2, f32
# rij can round to exactly rc, making rij - rc == +0.0 and
# exp(sigma/denom) = inf (observed poisoning a production run at
# ~1-in-1e9 trial moves).  Clamp the denominator strictly negative:
# at |denom| = 1e-5 Bohr the true factor is exp(-4.5e5) = 0, so the
# clamp is physically exact.
_DENOM_CLAMP = -1e-5


def _leg(rij, in_rc, prm: SWParams):
    denom = jnp.minimum(
        jnp.where(in_rc, rij - prm.rc, -1.0), _DENOM_CLAMP
    )
    return jnp.where(in_rc, jnp.exp(prm.gamma * prm.sigma / denom), 0.0)


def _pair(r2s, rij, in_rc, prm: SWParams):
    sig2 = prm.sigma * prm.sigma
    denom = jnp.minimum(
        jnp.where(in_rc, rij - prm.rc, -1.0), _DENOM_CLAMP
    )
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


def _inv3_rows(H):
    """Rows of H^{-1} for component-layout H (nested lists, each entry
    broadcastable)."""
    det = (
        H[0][0] * (H[1][1] * H[2][2] - H[1][2] * H[2][1])
        - H[0][1] * (H[1][0] * H[2][2] - H[1][2] * H[2][0])
        + H[0][2] * (H[1][0] * H[2][1] - H[1][1] * H[2][0])
    )
    inv_det = 1.0 / det
    a = [[None] * 3 for _ in range(3)]
    a[0][0] = (H[1][1] * H[2][2] - H[1][2] * H[2][1]) * inv_det
    a[0][1] = (H[0][2] * H[2][1] - H[0][1] * H[2][2]) * inv_det
    a[0][2] = (H[0][1] * H[1][2] - H[0][2] * H[1][1]) * inv_det
    a[1][0] = (H[1][2] * H[2][0] - H[1][0] * H[2][2]) * inv_det
    a[1][1] = (H[0][0] * H[2][2] - H[0][2] * H[2][0]) * inv_det
    a[1][2] = (H[0][2] * H[1][0] - H[0][0] * H[1][2]) * inv_det
    a[2][0] = (H[1][0] * H[2][1] - H[1][1] * H[2][0]) * inv_det
    a[2][1] = (H[0][1] * H[2][0] - H[0][0] * H[2][1]) * inv_det
    a[2][2] = (H[0][0] * H[1][1] - H[0][1] * H[1][0]) * inv_det
    return a


def _mic_fold(dx, dy, dz, Hc):
    """Minimum-image fold of displacement components
    (util.f90:108-156).  ``Hc`` is the nested 3x3 component list; the
    per-walker components broadcast against any leading axes of d*."""
    a = _inv3_rows(Hc)
    sx = a[0][0] * dx + a[0][1] * dy + a[0][2] * dz
    sy = a[1][0] * dx + a[1][1] * dy + a[1][2] * dz
    sz = a[2][0] * dx + a[2][1] * dy + a[2][2] * dz
    sx = sx - jnp.floor(sx + 0.5)
    sy = sy - jnp.floor(sy + 0.5)
    sz = sz - jnp.floor(sz + 0.5)
    ox = Hc[0][0] * sx + Hc[0][1] * sy + Hc[0][2] * sz
    oy = Hc[1][0] * sx + Hc[1][1] * sy + Hc[1][2] * sz
    oz = Hc[2][0] * sx + Hc[2][1] * sy + Hc[2][2] * sz
    return ox, oy, oz


def _h_components(H):
    """H [3, 3, ...] -> nested component list H[a][b]."""
    return [[H[a, b] for b in range(3)] for a in range(3)]


def _img_components(shifts, Hc):
    """Image vectors for each residual shift: three [S, ...] arrays.

    ``shifts`` is a static numpy [S,3] int array, so the per-shift
    linear combinations unroll at trace time (S is 1-3 after MIC
    folding)."""
    sf = np.asarray(shifts)

    def comp(row):
        return jnp.stack([
            float(s[0]) * Hc[row][0]
            + float(s[1]) * Hc[row][1]
            + float(s[2]) * Hc[row][2]
            for s in sf
        ])

    return comp(0), comp(1), comp(2)


def _candidates(rx, ry, rz, Hc, i, p, shifts, prm: SWParams,
                mic: bool) -> _Cand:
    """Dense candidate set of the molecule at ``p`` (index ``i``).

    rx/ry/rz: [N, W] stored coordinates; p: (px,py,pz) each [W];
    i: [W] int32; Hc: nested 3x3 component lists (each [W]).
    The null image of the centre itself is non-self-interacting
    (molint.F90:196-198, 532).  mic=True folds displacements by
    minimum image before applying the (reduced) shift set.
    """
    N = rx.shape[0]
    px, py, pz = p
    one_i = jnp.arange(N)[:, None] == i[None, :]          # [N,W]
    ex = jnp.where(one_i, px[None, :], rx)
    ey = jnp.where(one_i, py[None, :], ry)
    ez = jnp.where(one_i, pz[None, :], rz)

    if mic:
        fx, fy, fz = _mic_fold(ex - px[None, :], ey - py[None, :],
                               ez - pz[None, :], Hc)
    else:
        fx, fy, fz = ex - px[None, :], ey - py[None, :], ez - pz[None, :]

    imx, imy, imz = _img_components(shifts, Hc)            # [S,W]
    dx = fx[None, :, :] + imx[:, None, :]                  # [S,N,W]
    dy = fy[None, :, :] + imy[:, None, :]
    dz = fz[None, :, :] + imz[:, None, :]
    r2 = dx * dx + dy * dy + dz * dz

    is_null = np.all(np.asarray(shifts) == 0, axis=-1)     # [S] static
    null_mask = jnp.asarray(is_null)[:, None, None] & one_i[None, :, :]
    in_rc = (r2 < prm.rc2) & ~null_mask
    r2s = jnp.where(in_rc, r2, 1.0)
    inv = jax.lax.rsqrt(r2s)
    rij = r2s * inv

    pair_sum = jnp.sum(_pair(r2s, rij, in_rc, prm), axis=(0, 1))
    w = _leg(rij, in_rc, prm)
    ux, uy, uz = dx * inv, dy * inv, dz * inv

    wux, wuy, wuz = w * ux, w * uy, w * uz
    # per-j contributions (reduce images only) [N,W]
    d_s1 = jnp.sum(w, axis=0)
    d_mx = -jnp.sum(wux, axis=0)                           # j's view
    d_my = -jnp.sum(wuy, axis=0)
    d_mz = -jnp.sum(wuz, axis=0)
    d_mxx = jnp.sum(wux * ux, axis=0)
    d_myy = jnp.sum(wuy * uy, axis=0)
    d_mzz = jnp.sum(wuz * uz, axis=0)
    d_mxy = jnp.sum(wux * uy, axis=0)
    d_mxz = jnp.sum(wux * uz, axis=0)
    d_myz = jnp.sum(wuy * uz, axis=0)
    delta = Moments(d_s1, d_mx, d_my, d_mz, d_mxx, d_myy, d_mzz,
                    d_mxy, d_mxz, d_myz)

    own = Moments(
        jnp.sum(d_s1, axis=0), -jnp.sum(d_mx, axis=0),
        -jnp.sum(d_my, axis=0), -jnp.sum(d_mz, axis=0),
        jnp.sum(d_mxx, axis=0), jnp.sum(d_myy, axis=0),
        jnp.sum(d_mzz, axis=0), jnp.sum(d_mxy, axis=0),
        jnp.sum(d_mxz, axis=0), jnp.sum(d_myz, axis=0),
    )
    sumw2 = jnp.sum(w * w, axis=(0, 1))
    e3i = _e3_closed_form(own, sumw2, prm.cos0)

    return _Cand(pair_sum, w, ux, uy, uz, e3i, own, delta)


def _jcentred(c: _Cand, m: Moments, prm: SWParams):
    """Wing-angle sums i-j-k over all candidates (j, s) -> [W].

    For each in-range candidate the angles at j collapse to j's
    moments (molint.F90:324-343); v = -u is the direction from j back
    to the centre (v^T M v = u^T M u, v.m = -u.m), and the degenerate
    k==centre-same-image term is removed analytically.
    """
    c0 = prm.cos0
    ux, uy, uz = c.ux, c.uy, c.uz
    quad = (
        ux * ux * m.mxx[None] + uy * uy * m.myy[None]
        + uz * uz * m.mzz[None]
        + 2.0 * (
            ux * uy * m.mxy[None] + ux * uz * m.mxz[None]
            + uy * uz * m.myz[None]
        )
    )
    lin = ux * m.mx[None] + uy * m.my[None] + uz * m.mz[None]
    per = (
        quad + 2.0 * c0 * lin + (c0 * c0) * m.s1[None]
        - (1.0 - c0) ** 2 * c.w
    )
    return jnp.sum(c.w * per, axis=(0, 1))


def local_energies_batch(r3, H, i, p_new, mom: Moments, shifts,
                         prm: SWParams, mic: bool):
    """One lattice, walker-batched trial translation of molecule ``i``.

    r3:    [3, N, W] stored positions (coordinate-split)
    H:     [3, 3, W] per-walker cell matrices
    i:     [W] int32 moved molecule per walker
    p_new: [3, W] trial position
    mom:   Moments with [N, W] fields

    Returns (E_old [W], E_new [W], post-accept Moments [N, W]).
    Equivalent to 2x compute_local_real_energy (molint.F90:220-404)
    plus the incremental moment bookkeeping replacing neighbour lists.
    """
    lam_eps = prm.lam * prm.epsilon
    rx, ry, rz = r3[0], r3[1], r3[2]
    Hc = _h_components(H)
    N = rx.shape[0]

    # old position of the moved molecule: gather along the N axis
    iN = i[None, :]
    p_old = (
        jnp.take_along_axis(rx, iN, axis=0)[0],
        jnp.take_along_axis(ry, iN, axis=0)[0],
        jnp.take_along_axis(rz, iN, axis=0)[0],
    )

    co = _candidates(rx, ry, rz, Hc, i, p_old, shifts, prm, mic)
    e3j_old = _jcentred(co, mom, prm)
    e_old = co.pair_sum + lam_eps * (co.e3i + e3j_old)

    pn = (p_new[0], p_new[1], p_new[2])
    cn = _candidates(rx, ry, rz, Hc, i, pn, shifts, prm, mic)

    # world with i at p_new: every other molecule's moments corrected
    # by i's old/new contributions; i's own moments replaced outright
    one_i = jnp.arange(N)[:, None] == i[None, :]
    eff = Moments(*(
        jnp.where(one_i, ow[None, :], st - do + dn)
        for st, do, dn, ow in zip(mom, co.delta, cn.delta, cn.own)
    ))

    e3j_new = _jcentred(cn, eff, prm)
    e_new = cn.pair_sum + lam_eps * (cn.e3i + e3j_new)
    return e_old, e_new, eff


def full_energy_batch(r3, H, shifts, prm: SWParams, mic: bool):
    """One lattice, walker-batched whole-cell energy + fresh moments.

    Dense [N_i, S, N_j, W] equivalent of compute_model_energy
    (molint.F90:407-499): per centre i, half the pair sum plus the
    centre-angle moment formula (each angle counted once at its
    centre).  Returns (E [W], Moments [N, W]).
    """
    rx, ry, rz = r3[0], r3[1], r3[2]
    N = rx.shape[0]
    Hc = _h_components(H)

    fx = rx[None, :, :] - rx[:, None, :]                  # [Ni,Nj,W]
    fy = ry[None, :, :] - ry[:, None, :]
    fz = rz[None, :, :] - rz[:, None, :]
    if mic:
        fx, fy, fz = _mic_fold(fx, fy, fz, Hc)
    imx, imy, imz = _img_components(shifts, Hc)           # [S,W]
    dx = fx[:, None, :, :] + imx[None, :, None, :]        # [Ni,S,Nj,W]
    dy = fy[:, None, :, :] + imy[None, :, None, :]
    dz = fz[:, None, :, :] + imz[None, :, None, :]
    r2 = dx * dx + dy * dy + dz * dz

    is_null = np.all(np.asarray(shifts) == 0, axis=-1)
    eye = jnp.eye(N, dtype=bool)
    null_mask = (
        jnp.asarray(is_null)[None, :, None, None]
        & eye[:, None, :, None]
    )
    in_rc = (r2 < prm.rc2) & ~null_mask
    r2s = jnp.where(in_rc, r2, 1.0)
    inv = jax.lax.rsqrt(r2s)
    rij = r2s * inv

    # pair terms halved: each (i, j) visited from both ends
    # (molint.F90:464)
    pair_half = 0.5 * jnp.sum(_pair(r2s, rij, in_rc, prm), axis=(1, 2))
    w = _leg(rij, in_rc, prm)                             # [Ni,S,Nj,W]
    ux, uy, uz = dx * inv, dy * inv, dz * inv
    wux, wuy, wuz = w * ux, w * uy, w * uz

    red = lambda a: jnp.sum(a, axis=(1, 2))               # noqa: E731
    mom = Moments(
        red(w), red(wux), red(wuy), red(wuz),
        red(wux * ux), red(wuy * uy), red(wuz * uz),
        red(wux * uy), red(wux * uz), red(wuy * uz),
    )
    sumw2 = red(w * w)
    e3 = _e3_closed_form(mom, sumw2, prm.cos0)            # [N,W]
    energy = jnp.sum(pair_half, axis=0) + \
        prm.lam * prm.epsilon * jnp.sum(e3, axis=0)
    return energy, mom


# ----------------------------------------------------------------------
# single-configuration wrappers (tests / oracles / init)
# ----------------------------------------------------------------------

def local_energies_dense(r, H, i, p_new, mom: Moments, shifts,
                         prm: SWParams, mic: bool = False):
    """Single-configuration form: r [N,3], H [3,3], i scalar,
    p_new [3], Moments fields [N]."""
    r3 = r.T[:, :, None]                                  # [3,N,1]
    Hb = H[:, :, None]
    ib = jnp.atleast_1d(jnp.asarray(i, dtype=jnp.int32))
    pb = p_new[:, None]
    momb = Moments(*(f[:, None] for f in mom))
    e_old, e_new, eff = local_energies_batch(
        r3, Hb, ib, pb, momb, shifts, prm, mic
    )
    return e_old[0], e_new[0], Moments(*(f[:, 0] for f in eff))


def full_energy_dense(r, H, shifts, prm: SWParams, mic: bool = False):
    """Single-configuration form: r [N,3], H [3,3]."""
    e, mom = full_energy_batch(
        r.T[:, :, None], H[:, :, None], shifts, prm, mic
    )
    return e[0], Moments(*(f[:, 0] for f in mom))


def reduced_shift_set(H, prm: SWParams, margin: float = 1.02):
    """Residual image shifts needed after minimum-image folding.

    Per axis: a MIC-folded displacement has |frac| <= 0.5, so further
    in-cutoff images exist only when the perpendicular box width is
    below 2*cutoff; then shifts up to ceil(rc/width - 0.5) are needed
    (with a small margin for volume-move excursions, backstopped by
    the engine's general-path audit).  Returns an int32 [S,3] array,
    null shift first - e.g. 3 shifts instead of 27 for the packaged
    ice Ic cell whose b-width is just under 2*cutoff.
    """
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
    for sh in itertools.product(*[range(-n, n + 1) for n in need]):
        if sh != (0, 0, 0):
            shifts.append(sh)
    return np.asarray(shifts, dtype=np.int32)
