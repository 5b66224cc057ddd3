"""Independent fp64 oracle for the mW Stillinger-Weber energy.

Straightforward O(N^2 * images) numpy implementation written directly
from the published SW functional form - it shares no code with the JAX
kernels (no neighbour lists, no masks, python loops) so agreement
cross-validates both implementations.  Plays the role of the missing
Fortran build (no gfortran in this image; see BASELINE.md).
"""

import itertools

import numpy as np

from mc_water_ls_mw_tpu.models.sw import SWParams


def sw_full_energy(r, H, prm: SWParams, apply_local_cos_filter=False):
    """Whole-cell SW energy; r [N,3], H [3,3] (columns = vectors)."""
    r = np.asarray(r, dtype=np.float64)
    H = np.asarray(H, dtype=np.float64)
    N = len(r)
    rc = prm.a * prm.sigma
    lens = np.sqrt((H * H).sum(axis=0))
    bounds = [int(np.floor(rc / l)) + 1 for l in lens]
    shifts = [
        s
        for s in itertools.product(*[range(-b, b + 1) for b in bounds])
    ]

    def pair(rij):
        return (
            prm.bigA
            * prm.epsilon
            * (prm.bigB * (prm.sigma / rij) ** 4 - 1.0)
            * np.exp(prm.sigma / (rij - rc))
        )

    def leg(rij):
        return np.exp(prm.gamma * prm.sigma / (rij - rc))

    E = 0.0
    for i in range(N):
        # gather all in-cutoff neighbour images of i
        nb = []
        for j in range(N):
            for s in shifts:
                if j == i and s == (0, 0, 0):
                    continue
                d = r[j] + H @ np.array(s, dtype=np.float64) - r[i]
                d2 = d @ d
                if d2 < rc * rc:
                    nb.append((d, np.sqrt(d2)))
        for a in range(len(nb)):
            da, ra = nb[a]
            E += 0.5 * pair(ra)
            for b in range(a + 1, len(nb)):
                db, rb = nb[b]
                ct = (da @ db) / (ra * rb)
                if apply_local_cos_filter and ct >= 0.99:
                    continue
                E += (
                    prm.lam
                    * prm.epsilon
                    * (ct - prm.cos0) ** 2
                    * leg(ra)
                    * leg(rb)
                )
    return E
