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


# ---------------------------------------------------------------------
# Independent serial MC chain for the recorded-RNG-stream parity oracle
# (SURVEY.md §7 step 4; BASELINE.json north star "energies match ...
# under identical RNG streams").  Pure numpy + python control flow,
# full-recompute energies (no incremental bookkeeping, no neighbour
# lists) - it shares NOTHING with the JAX engines except the bin-grid
# arrays it is handed as plain data, so move-for-move agreement
# cross-validates the whole chain: proposal construction, Metropolis
# decisions, mu bookkeeping, eta interpolation and WL updates
# (reference counterparts: mc_water_translation mc_moves.F90:966-1213,
# mc_lattice_switch :1536-1594, mc_update_wl_bins :1597-1689,
# eta_weight :893-964).
# ---------------------------------------------------------------------

TRANS, VOL, SWITCH, NOOP = 0, 1, 2, 3


def _np_mu_to_bin(grid, mu):
    """Analytic bin inverse (mc_moves.F90:2187-2215), numpy scalar."""
    B = len(grid["mu_bin"])
    centre = B // 2
    if abs(mu) <= 0.5:
        return centre
    if mu > 0.0:
        arg = 1.0 - (mu - 0.5) * (1.0 - grid["r_pos"])
        return centre + 1 + int(
            np.log(max(arg, 1e-300)) / np.log(grid["r_pos"])
        )
    arg = 1.0 - (abs(mu) - 0.5) * (1.0 - grid["r_neg"])
    return centre - 1 - int(
        np.log(max(arg, 1e-300)) / np.log(grid["r_neg"])
    )


def _np_eta(grid, weight, mu, mu_min, mu_max, interp):
    """eta(mu), 'mw'-mode single walker (mc_moves.F90:893-964)."""
    if mu < mu_min or mu > mu_max:
        return 1.0e30
    B = len(weight)
    k = min(max(_np_mu_to_bin(grid, mu), 0), B - 1)
    if not interp:
        return weight[k]
    km, kp = max(k - 1, 0), min(k + 1, B - 1)
    bw, mub = grid["binwidth"], grid["mu_bin"]
    grad_up = 2.0 * (weight[kp] - weight[k]) / (bw[k] + bw[kp])
    grad_dn = 2.0 * (weight[k] - weight[km]) / (bw[k] + bw[km])
    if k == 0:
        return weight[k] + (mu - mub[k]) * grad_up
    if k == B - 1:
        return weight[k] + (mu - mub[k]) * grad_dn
    if mu > mub[k]:
        return weight[k] + (mu - mub[k]) * grad_up
    return weight[km] + (mu - mub[km]) * grad_dn


class MCChain:
    """Serial two-replica lattice-switch chain, recorded-stream driven.

    r0 [L,N,3] Bohr, H0 [L,3,3] (columns = lattice vectors); fixed
    cells (volume moves unsupported, as in the recorded-stream mode).
    ``grid`` is a dict of plain numpy arrays/floats: mu_bin, binwidth,
    av_binwidth, r_pos, r_neg.
    """

    def __init__(self, r0, H0, sw, grid, *, beta, pressure, nwater,
                 max_trans, eq_mc_cycles=0, wl_factor=0.005,
                 eta_interp=True, mu_min=-400.0, mu_max=400.0,
                 always_switch=True):
        self.sw, self.grid = sw, grid
        self.beta, self.pressure, self.N = beta, pressure, nwater
        self.max_trans, self.eq = max_trans, eq_mc_cycles
        self.interp = eta_interp
        self.mu_min, self.mu_max = mu_min, mu_max
        self.always_switch = always_switch
        self.r = np.asarray(r0, np.float64).copy()        # [L,N,3]
        self.H = np.asarray(H0, np.float64).copy()        # [L,3,3]
        self.recip = np.stack([
            2.0 * np.pi * np.linalg.inv(self.H[l]).T for l in range(2)
        ])
        self.vol = np.array([
            abs(np.linalg.det(self.H[l])) for l in range(2)
        ])
        self.E = np.array([
            sw_full_energy(self.r[l], self.H[l], sw) for l in range(2)
        ])
        self.ls = 0
        self.mu = self._mu_scratch()
        B = len(grid["mu_bin"])
        self.weight = np.zeros(B)
        self.hist = np.zeros(B)
        self.f = wl_factor
        self.cycle = 0
        self.att = np.zeros(4, np.int64)
        self.acc = np.zeros(4, np.int64)

    def _mu_scratch(self):
        E, P, V = self.E, self.pressure, self.vol
        return (E[0] + P * V[0] - E[1] - P * V[1]) * self.beta \
            - self.N * np.log(V[0] / V[1])

    def _eta(self, mu):
        return _np_eta(self.grid, self.weight, mu,
                       self.mu_min, self.mu_max, self.interp)

    def _wl_update(self):
        """mc_update_wl_bins, generation mode (std WL schedule)."""
        if self.cycle < self.eq:
            return
        B = len(self.weight)
        k = _np_mu_to_bin(self.grid, self.mu)
        if k < 0 or k >= B:
            return
        incr = self.grid["av_binwidth"] / self.grid["binwidth"][k]
        self.hist[k] += incr
        self.weight[k] += incr * self.f

    def _translation(self, u):
        N, sw = self.N, self.sw
        imol = min(int(u[0] * N), N - 1)
        d = 2.0 * u[1:4] - 1.0
        inv_norm = 1.0 / np.sqrt(max(d @ d, 1e-30))
        rmag = (2.0 * u[4] - 1.0) * self.max_trans * inv_norm
        v = d * rmag
        # same fractional displacement in the partner lattice
        sfrac = (v @ self.recip[self.ls]) * (0.5 / np.pi)
        dE = np.zeros(2)
        p_new = []
        for l in range(2):
            tv = v if l == self.ls else self.H[l] @ sfrac
            pn = self.r[l, imol] + tv
            r_try = self.r[l].copy()
            r_try[imol] = pn
            dE[l] = sw_full_energy(r_try, self.H[l], sw) - self.E[l]
            p_new.append(pn)
        dmu = (dE[0] - dE[1]) * self.beta
        mu_new = self.mu + dmu
        diffkT = (
            self.beta * dE[self.ls]
            + self._eta(mu_new) - self._eta(self.mu)
        )
        self.att[TRANS] += 1
        if np.isfinite(diffkT) and u[5] < np.exp(-diffkT):
            self.acc[TRANS] += 1
            for l in range(2):
                self.r[l, imol] = p_new[l]
            self.E += dE
            self.mu = mu_new
        self._wl_update()

    def _switch(self, zeta):
        lsn = 1 - self.ls
        diffkT = (
            self.beta * (self.E[lsn] - self.E[self.ls])
            + self.beta * self.pressure * (self.vol[lsn]
                                           - self.vol[self.ls])
            - self.N * np.log(self.vol[lsn] / self.vol[self.ls])
        )
        self.att[SWITCH] += 1
        if np.isfinite(diffkT) and zeta < np.exp(-diffkT):
            self.acc[SWITCH] += 1
            self.ls = lsn
            self.mu = self._mu_scratch()

    def run(self, codes, u):
        """codes [C,N] int, u [C,N,7]: the same recorded stream handed
        to Engine.set_recorded_stream."""
        C = codes.shape[0]
        for _ in range(C):
            self.cycle += 1
            ci = (self.cycle - 1) % C
            for t in range(codes.shape[1]):
                code = codes[ci, t]
                ut = u[ci, t]
                if code == TRANS:
                    self._translation(ut)
                if code == SWITCH or (
                    self.always_switch and code == TRANS
                ):
                    self._switch(ut[6])
        return self
