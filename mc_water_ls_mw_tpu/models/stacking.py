"""Ice I polytype builder: Ih/Ic as stacking sequences in ONE box.

Framework extension for the large-N domain-decomposed path (no
reference counterpart; the reference only reads packaged xmol cells,
init.f90:38-125).  Physics background: ice Ih and Ic are stacking
variants of the same puckered hexagonal bilayer - Ih stacks bilayers
ABAB..., Ic stacks ABCABC... (Quigley, JCP 141, 121101 (2014), the
paper this code computes free energies for, is exactly about this
stacking axis).  Building both polymorphs as lateral-offset sequences
of the SAME bilayer framework in the SAME orthorhombic box gives a
lattice-switch pair whose corresponding molecules differ by at most
one in-plane stacking offset:

    |r_Ih(i) - r_Ic(i)| <= a/sqrt(3)   (= 2.53 Angstrom for mW)

This bounded "correspondence mismatch" is what makes the parallel
cell-sweep engine (mcmc/cellengine.py) valid: movers separated by a
cell in lattice 1 are separated by (cell - 2*mismatch) in lattice 2,
so one fractional cell grid serves both replicas (DESIGN.md, large-N
section).  Packaged/arbitrary input pairs can have multi-Angstrom
mismatch (the 48-molecule reference pair: mean 4.9 A); see
``relabel_for_correspondence`` for the repair.

Geometry: orthorhombic cell (nx*a, ny*sqrt(3)*a, m*(4d/3)) with
a = d*sqrt(8/3); each bilayer j holds two triangular sub-layers of
2 sites per rectangular in-plane cell, at lateral offset L_j (lower,
z = j*4d/3) and L_{j+1} (upper, z = j*4d/3 + d/3), where
L in {A=(0,0), B=(0,1/3), C=(1/2,1/6)} in rectangular fractional
coordinates.  The vertical bond connects the upper sub-layer of
bilayer j to the lower sub-layer of bilayer j+1 (same lateral), so
any cyclic sequence with L_{j+1} != L_j is a valid tetrahedral ice
network.  N = 4 * nx * ny * m.
"""

from __future__ import annotations

import numpy as np

from .lattices import MW_BOND_LENGTH

# lateral stacking offsets in rectangular fractional coordinates
_LATERAL = {
    "A": np.array([0.0, 0.0]),
    "B": np.array([0.0, 1.0 / 3.0]),
    "C": np.array([0.5, 1.0 / 6.0]),
}


def stacking_cell(seq: str, nx: int, ny: int, d: float = MW_BOND_LENGTH):
    """Build one ice-I polytype from a bilayer stacking sequence.

    seq: cyclic string over {A,B,C}, one letter per bilayer; adjacent
    letters (cyclically) must differ.  'AB' -> Ih, 'ABC' -> Ic,
    'ABAC' -> 4H polytype, etc.  Returns (r [N,3], H [3,3]) in Bohr
    with H columns the box vectors; N = 4*nx*ny*len(seq).
    """
    seq = seq.upper()
    m = len(seq)
    for j in range(m):
        if seq[j] == seq[(j + 1) % m]:
            raise ValueError(
                f"stacking sequence {seq!r}: adjacent bilayers "
                f"{j},{(j + 1) % m} share lateral {seq[j]} (no bond)"
            )
        if seq[j] not in _LATERAL:
            raise ValueError(f"unknown stacking letter {seq[j]!r}")

    a = d * np.sqrt(8.0 / 3.0)
    lz = 4.0 * d / 3.0                      # bilayer period (= c/2)
    H = np.diag([nx * a, ny * np.sqrt(3.0) * a, m * lz])

    # two triangular sites per rectangular in-plane cell
    site = np.array([[0.0, 0.0], [0.5, 0.5]])
    cells = np.array(
        [[i, j] for i in range(nx) for j in range(ny)], dtype=float
    )
    inplane = (cells[:, None, :] + site[None, :, :]).reshape(-1, 2)

    fz_pucker = (d / 3.0) / (m * lz)        # upper sub-layer z offset
    frac = []
    for j in range(m):
        lo = _LATERAL[seq[j]]
        hi = _LATERAL[seq[(j + 1) % m]]
        zj = j / m
        for lat, dz in ((lo, 0.0), (hi, fz_pucker)):
            xy = (inplane + lat[None, :]) / np.array([nx, ny])
            f = np.concatenate(
                [xy, np.full((len(xy), 1), zj + dz)], axis=1
            )
            frac.append(f)
    frac = np.concatenate(frac)
    frac -= np.floor(frac)
    return frac @ H.T, H


def stacking_switch_pair(nx: int, ny: int, m: int,
                         d: float = MW_BOND_LENGTH):
    """Lattice-switch pair (Ih, Ic) in one shared orthorhombic box.

    m = number of bilayers, must be a multiple of 6 (2 for ABAB, 3 for
    ABCABC, cyclically).  Molecule i of the Ih cell corresponds to
    molecule i of the Ic cell with in-plane mismatch <= a/sqrt(3);
    both cells share H exactly, so the initial mu is 0 by symmetry.

    Returns (r0 [2,N,3], H0 [2,3,3]) ordered (Ih, Ic).
    """
    if m % 6 != 0:
        raise ValueError(f"bilayer count {m} must be a multiple of 6")
    r_ih, H = stacking_cell("AB" * (m // 2), nx, ny, d)
    r_ic, H2 = stacking_cell("ABC" * (m // 3), nx, ny, d)
    assert np.allclose(H, H2)
    return np.stack([r_ih, r_ic]), np.stack([H, H2])


def correspondence_mismatch(r0, H0):
    """Max/mean Cartesian mismatch of corresponding molecules.

    The per-molecule fractional offset Delta_i = f1_i - f2_i is
    INVARIANT under every move of the sampler (translations apply the
    same fractional displacement in both replicas,
    mc_moves.F90:1042-1067; volume moves hold fractional coordinates
    fixed, :1284-1350; chain resync enforces equality,
    :2289-2333), so this init-time bound holds for the whole run.
    Returns (max, mean) in Bohr, maximised over both lattice frames.
    """
    r0 = np.asarray(r0, dtype=np.float64)
    H0 = np.asarray(H0, dtype=np.float64)
    f1 = r0[0] @ np.linalg.inv(H0[0]).T
    f2 = r0[1] @ np.linalg.inv(H0[1]).T
    df = f1 - f2
    df -= np.round(df)
    worst_max = 0.0
    worst_mean = 0.0
    for L in range(2):
        cart = df @ H0[L].T
        dist = np.linalg.norm(cart, axis=1)
        worst_max = max(worst_max, float(dist.max()))
        worst_mean = max(worst_mean, float(dist.mean()))
    return worst_max, worst_mean


def relabel_for_correspondence(r0, H0):
    """Optimal relabeling of lattice 2 to minimise mismatch.

    Molecules are identical particles, so the i<->i pairing between
    replicas is an arbitrary convention; relabeling lattice 2 changes
    neither Hamiltonian, nor mu, nor any acceptance probability - it
    only changes which molecule's displacement is mirrored where.
    (The reference contains a commented-out 'renumber' experiment with
    the same intent, init.f90:128-397.)  Uses the Hungarian algorithm
    on minimum-image distances in the lattice-1 frame.

    Returns (r0_new, perm) with r0_new[1] = r0[1][perm].
    """
    from scipy.optimize import linear_sum_assignment

    r0 = np.asarray(r0, dtype=np.float64)
    H0 = np.asarray(H0, dtype=np.float64)
    f1 = r0[0] @ np.linalg.inv(H0[0]).T
    f2 = r0[1] @ np.linalg.inv(H0[1]).T
    df = f1[:, None, :] - f2[None, :, :]
    df -= np.round(df)
    cart = np.einsum("ab,ijb->ija", H0[0], df)
    cost = np.linalg.norm(cart, axis=-1)
    rows, cols = linear_sum_assignment(cost)
    assert np.array_equal(rows, np.arange(len(f1)))
    out = r0.copy()
    out[1] = r0[1][cols]
    return out, cols
