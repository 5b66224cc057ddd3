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


# ---------------------------------------------------------------------
# Vectorised single-lattice NPT chain with the reference's PER-MOVE
# move-type draw (mc_cycle:224-241): the A/B oracle for the engine's
# hoisted volume scheduling (Engine._one_cycle moves all volume trials
# of a cycle to a once-per-cycle block; the reference draws the move
# type before EVERY trial).  If hoisting biased the stationary
# distribution, equilibrium <E> and <V> would disagree.
# ---------------------------------------------------------------------


def _image_shifts(H, rc):
    lens = np.sqrt((np.asarray(H) ** 2).sum(axis=0))
    bounds = [int(np.floor(rc / l)) + 1 for l in lens]
    return np.array(
        list(itertools.product(*[range(-b, b + 1) for b in bounds])),
        dtype=np.float64,
    )


def np_full_energy(r, H, prm: SWParams):
    """Vectorised whole-cell SW energy (same Hamiltonian as
    sw_full_energy, cross-checked against it in the tests)."""
    r = np.asarray(r, np.float64)
    H = np.asarray(H, np.float64)
    N = len(r)
    rc = prm.a * prm.sigma
    shifts = _image_shifts(H, rc)                       # [S,3]
    img = r[None, :, :] + shifts[:, None, :] @ H.T      # [S,N,3]
    img = img.reshape(-1, 3)                            # [S*N,3]
    self_idx = np.where((shifts == 0).all(axis=1))[0][0]
    E = 0.0
    for i in range(N):
        d = img - r[i]
        r2 = (d * d).sum(axis=1)
        r2[self_idx * N + i] = 1e30                     # self
        sel = r2 < rc * rc
        dv = d[sel]
        rr = np.sqrt(r2[sel])
        E += 0.5 * np.sum(
            prm.bigA * prm.epsilon
            * (prm.bigB * (prm.sigma / rr) ** 4 - 1.0)
            * np.exp(prm.sigma / (rr - rc))
        )
        w = np.exp(prm.gamma * prm.sigma / (rr - rc))
        u = dv / rr[:, None]
        ct = u @ u.T                                    # [n,n]
        pref = (ct - prm.cos0) ** 2 * np.outer(w, w)
        iu = np.triu_indices(len(rr), k=1)
        E += prm.lam * prm.epsilon * pref[iu].sum()
    return E


class NPTChain1L:
    """Serial single-lattice NPT chain, per-move move-type draw.

    Translation Delta-E is computed locally (pair terms of the mover +
    every 3-body triplet containing it, both orientations -
    compute_local_real_energy semantics, molint.F90:220-404, without
    the near-collinear filter, matching the framework's dense
    Hamiltonian); volume moves recompute the full energy
    (mc_volume, mc_moves.F90:1216-1534).
    """

    def __init__(self, r0, H0, sw: SWParams, *, beta, pressure,
                 max_trans, dv_max, vol_prob, seed=12345):
        self.sw = sw
        self.beta, self.P = float(beta), float(pressure)
        self.max_trans, self.dv_max = float(max_trans), float(dv_max)
        self.vol_prob = float(vol_prob)
        self.r = np.asarray(r0, np.float64).copy()      # [N,3]
        self.H = np.asarray(H0, np.float64).copy()
        self.N = len(self.r)
        self.rng = np.random.default_rng(seed)
        self.E = np_full_energy(self.r, self.H, sw)
        self.vol = abs(np.linalg.det(self.H))
        self.att = np.zeros(4, np.int64)
        self.acc = np.zeros(4, np.int64)

    # -- local energy of molecule i at position ``pos`` --------------
    def _local(self, i, pos):
        sw = self.sw
        rc = sw.a * sw.sigma
        shifts = _image_shifts(self.H, rc)
        img = (self.r[None, :, :]
               + shifts[:, None, :] @ self.H.T)         # [S,N,3]
        S = len(shifts)
        self_idx = np.where((shifts == 0).all(axis=1))[0][0]
        flat = img.reshape(-1, 3)

        # neighbours of i at pos (i's own distant images excluded by
        # the cutoff; the box is > 2*rc wide)
        d = flat - pos
        r2 = (d * d).sum(axis=1)
        r2[self_idx * self.N + i] = 1e30
        r2[np.arange(S) * self.N + i] = 1e30            # all i images
        sel = np.where(r2 < rc * rc)[0]
        dv = d[sel]
        rr = np.sqrt(r2[sel])
        pair = np.sum(
            sw.bigA * sw.epsilon
            * (sw.bigB * (sw.sigma / rr) ** 4 - 1.0)
            * np.exp(sw.sigma / (rr - rc))
        )
        w = np.exp(sw.gamma * sw.sigma / (rr - rc))
        u = dv / rr[:, None]
        # angles centred at i: unordered neighbour pairs
        ct = u @ u.T
        pref = (ct - sw.cos0) ** 2 * np.outer(w, w)
        iu = np.triu_indices(len(rr), k=1)
        e3_i = pref[iu].sum()
        # angles centred at each neighbour j, with i as one wing and
        # any OTHER image k of j's neighbourhood as the second
        e3_j = 0.0
        for a, jflat in enumerate(sel):
            qj = flat[jflat]
            dj = flat - qj
            rj2 = (dj * dj).sum(axis=1)
            rj2[jflat] = 1e30                    # j itself
            # exclude every image of molecule i: with i at ``pos``, j
            # sees i only through the explicit wing term below
            rj2[np.arange(S) * self.N + i] = 1e30
            selk = rj2 < rc * rc
            dk = dj[selk]
            rk = np.sqrt(rj2[selk])
            wk = np.exp(sw.gamma * sw.sigma / (rk - rc))
            ui = (pos - qj) / rr[a]
            ctk = (dk / rk[:, None]) @ ui
            e3_j += w[a] * np.sum(
                (ctk - sw.cos0) ** 2 * wk
            )
        return pair + sw.lam * sw.epsilon * (e3_i + e3_j)

    def _translation(self):
        i = min(int(self.rng.random() * self.N), self.N - 1)
        d = 2.0 * self.rng.random(3) - 1.0
        rmag = (2.0 * self.rng.random() - 1.0) * self.max_trans \
            / np.sqrt(max(d @ d, 1e-30))
        pnew = self.r[i] + d * rmag
        dE = self._local(i, pnew) - self._local(i, self.r[i])
        self.att[TRANS] += 1
        if self.rng.random() < np.exp(-self.beta * dE):
            self.acc[TRANS] += 1
            self.r[i] = pnew
            self.E += dE

    def _volume(self):
        ii = min(int(self.rng.random() * 3), 2)
        jj = min(int(self.rng.random() * 3), 2)
        delta = (2.0 * self.rng.random() - 1.0) * self.dv_max
        H_new = self.H.copy()
        H_new[ii, jj] += delta
        if ii != jj:
            H_new[jj, ii] += delta
        vol_new = abs(np.linalg.det(H_new))
        frac = self.r @ np.linalg.inv(self.H).T
        r_new = frac @ H_new.T
        E_new = np_full_energy(r_new, H_new, self.sw)
        diffkT = (
            self.beta * (E_new - self.E)
            + self.beta * self.P * (vol_new - self.vol)
            - self.N * np.log(vol_new / self.vol)
        )
        self.att[VOL] += 1
        if vol_new > 0 and self.rng.random() < np.exp(-diffkT):
            self.acc[VOL] += 1
            self.r, self.H = r_new, H_new
            self.E, self.vol = E_new, vol_new

    def run(self, cycles, sample_every=1, burn_in=0):
        """Returns (E_samples, V_samples) taken at cycle boundaries."""
        Es, Vs = [], []
        for c in range(cycles):
            for _ in range(self.N):
                if self.rng.random() < self.vol_prob:
                    self._volume()
                else:
                    self._translation()
            if c >= burn_in and (c + 1) % sample_every == 0:
                Es.append(self.E)
                Vs.append(self.vol)
        return np.asarray(Es), np.asarray(Vs)


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
            np_full_energy(self.r[l], self.H[l], sw) for l in range(2)
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
            dE[l] = np_full_energy(r_try, self.H[l], sw) - self.E[l]
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
