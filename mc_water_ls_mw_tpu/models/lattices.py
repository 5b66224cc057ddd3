"""Ideal ice Ih / Ic lattice builders (framework extension).

The reference obtains its lattices exclusively from packaged
``inputNNN.xmol`` files (read_xmol, init.f90:38-125) and ships only
48-molecule cells; the published headline system of Quigley,
J. Chem. Phys. 141, 121101 (2014) is N=216.  These builders construct
ideal mW ice cells of any size so the framework can run the paper's
system (and arbitrarily large boxes) without external files:

* ice Ic  = diamond-cubic oxygen sublattice (8 molecules / cubic cell,
  a = 4 d / sqrt(3));
* ice Ih  = lonsdaleite (hexagonal diamond; 4 molecules / hexagonal
  cell, a = d sqrt(8/3), c = 8 d / 3, ideal c/a);

with d the O-O bond length.  ``optimal_bond_length`` minimises the mW
lattice energy over d (golden-section; the minimum is
E/N = -0.5368 eV at d = 5.075 Bohr, matching the published mW ice
cohesive energy of ~ -12.3 kcal/mol).  Both networks are perfect
tetrahedral graphs whose first coordination shells coincide, so their
ideal lattice energies are degenerate - the Ih/Ic free-energy split
the sampler measures is entropic/anharmonic, exactly as in the paper.

Cell-matrix convention: columns are the lattice vectors
(x = H f for fractional f), as everywhere in ops/geometry.py.
"""

from __future__ import annotations

import numpy as np

from .sw import SWParams


def ideal_ic(n: tuple | int, d: float):
    """Diamond-cubic ice Ic: (nx*ny*nz) cubic cells of 8 molecules.

    Returns (r [N,3], H [3,3]) in Bohr.
    """
    if isinstance(n, int):
        n = (n, n, n)
    nx, ny, nz = n
    a = 4.0 * d / np.sqrt(3.0)
    basis = np.array([
        [0, 0, 0], [0, .5, .5], [.5, 0, .5], [.5, .5, 0],
    ])
    basis = np.concatenate([basis, basis + 0.25])
    cells = np.array([
        [i, j, k]
        for i in range(nx) for j in range(ny) for k in range(nz)
    ], dtype=float)
    frac = (cells[:, None, :] + basis[None, :, :]).reshape(-1, 3)
    frac = frac / np.array([nx, ny, nz], dtype=float)
    H = np.diag([a * nx, a * ny, a * nz])
    return frac @ H.T, H


def ideal_ih(n: tuple, d: float):
    """Lonsdaleite ice Ih: (nx*ny*nz) hexagonal cells of 4 molecules
    at the ideal c/a = sqrt(8/3).

    Returns (r [N,3], H [3,3]) in Bohr (H is triclinic: columns are
    the a1, a2, a3 supercell vectors).
    """
    nx, ny, nz = n
    a = d * np.sqrt(8.0 / 3.0)
    c = 8.0 * d / 3.0
    basis = np.array([
        [1 / 3, 2 / 3, 0], [1 / 3, 2 / 3, 3 / 8],
        [2 / 3, 1 / 3, 1 / 2], [2 / 3, 1 / 3, 7 / 8],
    ])
    cells = np.array([
        [i, j, k]
        for i in range(nx) for j in range(ny) for k in range(nz)
    ], dtype=float)
    frac = (cells[:, None, :] + basis[None, :, :]).reshape(-1, 3)
    frac = frac / np.array([nx, ny, nz], dtype=float)
    # columns = supercell vectors: a1 = nx*a*x; a2 = ny*a*(-1/2,
    # sqrt(3)/2, 0); a3 = nz*c*z
    H = np.array([
        [a * nx, -0.5 * a * ny, 0.0],
        [0.0, np.sqrt(3.0) / 2.0 * a * ny, 0.0],
        [0.0, 0.0, c * nz],
    ])
    return frac @ H.T, H


def optimal_bond_length(model: SWParams, lo=4.6, hi=5.6,
                        tol=1e-6) -> float:
    """O-O bond length minimising the ideal-Ic mW lattice energy
    (golden-section search, host-side fp64)."""
    import jax.numpy as jnp

    from ..ops.dense import full_energy_dense, reduced_shift_set

    def energy(d):
        r, H = ideal_ic(2, d)
        sh = reduced_shift_set(H, model)
        e, _ = full_energy_dense(
            jnp.asarray(r), jnp.asarray(H), jnp.asarray(sh), model, True
        )
        return float(e)

    invphi = (np.sqrt(5.0) - 1.0) / 2.0
    a, b = lo, hi
    c_, d_ = b - invphi * (b - a), a + invphi * (b - a)
    fc, fd = energy(c_), energy(d_)
    while abs(b - a) > tol:
        if fc < fd:
            b, d_, fd = d_, c_, fc
            c_ = b - invphi * (b - a)
            fc = energy(c_)
        else:
            a, c_, fc = c_, d_, fd
            d_ = a + invphi * (b - a)
            fd = energy(d_)
    return 0.5 * (a + b)


# golden-section result for the mW parameterisation (models/sw.py MW),
# precomputed so builders do not need a device at import time
MW_BOND_LENGTH = 5.074840  # Bohr; E/N = -0.536761 eV


def switch_pair_216(d: float = MW_BOND_LENGTH):
    """The paper's N=216 lattice-switch pair: Ih (3,3,6) lonsdaleite
    supercell + Ic (3,3,3) diamond supercell, both 216 molecules.

    Returns (r0 [2,216,3], H0 [2,3,3]) ordered (Ih, Ic) like the
    reference's input001/input002 convention (ice1_sample examples).
    """
    r_ih, H_ih = ideal_ih((3, 3, 6), d)
    r_ic, H_ic = ideal_ic(3, d)
    return np.stack([r_ih, r_ic]), np.stack([H_ih, H_ic])
