"""Cell-matrix geometry ops as pure jnp functions.

TPU-native equivalents of the reference utility module
(reference: util.f90:16-156).  Conventions follow the reference:
``H[:, i]`` is lattice vector i (cartesian = H @ frac), and the
reciprocal matrix is 2*pi * H^{-T} computed via explicit cofactors
(util.f90:43-77) so results agree with the Fortran to the last bit in
fp64.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..constants import PI, INV_PI


def determinant3(H):
    """Determinant of a 3x3 matrix (reference: util.f90:16-41)."""
    det = H[0, 0] * (H[1, 1] * H[2, 2] - H[1, 2] * H[2, 1])
    det = det - H[0, 1] * (H[1, 0] * H[2, 2] - H[1, 2] * H[2, 0])
    det = det + H[0, 2] * (H[1, 0] * H[2, 1] - H[1, 1] * H[2, 0])
    return det


def recip_matrix(H):
    """Matrix of reciprocal lattice vectors, 2*pi*H^{-T}.

    Cofactor construction identical to the reference
    (util.f90:43-77).  Row i of the result is reciprocal vector i in
    the same sense as the Fortran array: fractional coordinates of a
    cartesian vector v are (recip^T @ v) / (2*pi).
    """
    r00 = H[1, 1] * H[2, 2] - H[1, 2] * H[2, 1]
    r01 = H[1, 2] * H[2, 0] - H[1, 0] * H[2, 2]
    r02 = H[1, 0] * H[2, 1] - H[1, 1] * H[2, 0]

    r10 = H[0, 2] * H[2, 1] - H[0, 1] * H[2, 2]
    r11 = H[0, 0] * H[2, 2] - H[0, 2] * H[2, 0]
    r12 = H[0, 1] * H[2, 0] - H[0, 0] * H[2, 1]

    r20 = H[0, 1] * H[1, 2] - H[0, 2] * H[1, 1]
    r21 = H[0, 2] * H[1, 0] - H[0, 0] * H[1, 2]
    r22 = H[0, 0] * H[1, 1] - H[0, 1] * H[1, 0]

    recip = jnp.stack(
        [
            jnp.stack([r00, r01, r02]),
            jnp.stack([r10, r11, r12]),
            jnp.stack([r20, r21, r22]),
        ]
    )
    vol = H[0, 0] * r00 + H[0, 1] * r01 + H[0, 2] * r02
    return recip * (2.0 * PI / vol)


def to_frac(recip, v):
    """Cartesian -> fractional coordinates.

    Matches the manually inlined pattern of the reference
    (e.g. mc_moves.F90:1042-1054): s_a = sum_d recip[d, a] * v[d] / 2pi.
    ``v`` may have leading batch dims; last axis is xyz.
    """
    # full-precision contraction: TPU's default matmul multiplies in
    # bf16, far too coarse for coordinate transforms
    return jnp.matmul(
        v, recip, precision=jax.lax.Precision.HIGHEST
    ) * (0.5 * INV_PI)


def from_frac(H, s):
    """Fractional -> cartesian: v = H @ s, batched over leading dims."""
    return jnp.matmul(
        s, jnp.swapaxes(H, -1, -2), precision=jax.lax.Precision.HIGHEST
    )


def hmatrix_to_abc(H):
    """Cell lengths/angles (a,b,c,alpha,beta,gamma in degrees).

    Reference: util.f90:79-106 (including its angle convention:
    alpha = angle(a, c), beta = angle(b, c), gamma = angle(a, b)).
    """
    a = jnp.sqrt(H[:, 0] @ H[:, 0])
    b = jnp.sqrt(H[:, 1] @ H[:, 1])
    c = jnp.sqrt(H[:, 2] @ H[:, 2])
    alpha = jnp.arccos((H[:, 0] @ H[:, 2]) / (a * c)) * (180.0 / PI)
    beta = jnp.arccos((H[:, 1] @ H[:, 2]) / (b * c)) * (180.0 / PI)
    gamma = jnp.arccos((H[:, 0] @ H[:, 1]) / (a * b)) * (180.0 / PI)
    return a, b, c, alpha, beta, gamma


def min_image(v, H, recip):
    """Minimum-image convention in fractional coords (util.f90:108-156)."""
    s = to_frac(recip, v)
    s = s - jnp.floor(s + 0.5)
    return from_frac(H, s)


def cell_shift_range(H, radius):
    """Static per-axis image bounds covering ``radius``.

    Host-side helper (numpy, not traced).  The reference enumerates
    image translation vectors with per-axis bound
    floor(radius/|h_col|) + 1 (molint.F90:189-191).  We use the same
    rule at setup time to fix a *static* shift set for jit.
    """
    H = np.asarray(H, dtype=np.float64)
    lens = np.sqrt((H * H).sum(axis=0))  # |column i|
    return tuple(int(np.floor(radius / l)) + 1 for l in lens)


def enumerate_shifts(bounds):
    """All integer cell shifts within per-axis ``bounds``.

    Returns an int32 array [S, 3], with the null shift first (flagged
    non-self-interacting downstream), then the same (i, j, k) loop
    order as the reference (molint.F90:196-213).
    """
    im, jm, km = bounds
    shifts = [(0, 0, 0)]
    for i in range(-im, im + 1):
        for j in range(-jm, jm + 1):
            for k in range(-km, km + 1):
                if i == 0 and j == 0 and k == 0:
                    continue
                shifts.append((i, j, k))
    return np.asarray(shifts, dtype=np.int32)
