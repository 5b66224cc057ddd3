"""Non-uniform mu-bin grid and multicanonical weight lookup.

TPU-native rebuild of the reference's order-parameter grid machinery:

* geometric-progression bin grid solved by fixed-point iteration at
  setup (host-side fp64 numpy; reference mc_init, mc_moves.F90:553-656);
* analytic bin lookup ``mu_to_bin`` via logs, traced on device
  (mc_moves.F90:2187-2215);
* piecewise-linear interpolated weight lookup ``eta_weight`` with the
  reference's window walls and special-cased end bins
  (mc_moves.F90:893-964).

The grid has a central bin [-0.5, +0.5] of width 1; bin widths grow
geometrically toward mu_min / mu_max with common ratios solved so that
nbins/2 bins exactly span each side.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

# Finite stand-in for the reference's huge(1.0_dp) window wall
# (mc_moves.F90:915-922).  Must stay finite so eta_new - eta_old is 0
# (not NaN) when both ends are outside the window, matching Fortran
# huge-huge == 0 semantics.
ETA_WALL = 1.0e30


class BinGrid(NamedTuple):
    """Static bin-grid description (host-built, device-resident)."""

    mu_bin: jnp.ndarray     # [B] mid-bin mu values
    binwidth: jnp.ndarray   # [B]
    av_binwidth: float
    r_pos: float            # common ratio, positive side
    r_neg: float
    a_pos: float            # first bin width each side (== 1)
    a_neg: float
    mu_min: float
    mu_max: float

    @property
    def nbins(self) -> int:
        return self.mu_bin.shape[0]


def _solve_ratio(s: float, ns: int) -> float:
    """Fixed-point solve for the GP common ratio (mc_moves.F90:584-594)."""
    a = 1.0
    r = 1.1
    for _ in range(1_000_000):
        tmpsum = a * (1.0 - r**ns) / (1.0 - r)
        r_new = r * (s / tmpsum) ** (1.0 / ns)
        if abs(r_new - r) <= 2.0 * np.finfo(np.float64).eps:
            break
        r = r_new
    return r


def build_bin_grid(nbins: int, mu_min: float, mu_max: float,
                   dtype=jnp.float64) -> BinGrid:
    """Construct the GP bin grid (mc_moves.F90:553-656).

    ``nbins`` is forced odd exactly as the reference does
    (mc_moves.F90:557).
    """
    if nbins % 2 == 0:
        nbins += 1
    s_pos = abs(mu_max) - 0.5
    s_neg = abs(mu_min) - 0.5
    ns = nbins // 2
    r_pos = _solve_ratio(s_pos, ns)
    r_neg = _solve_ratio(s_neg, ns)

    mu_bin = np.zeros(nbins)
    binwidth = np.zeros(nbins)

    # negative side, filled downward from the central bin
    # (mc_moves.F90:622-632)
    mu_u = -0.5
    k = 0
    for ibin in range(nbins // 2 - 1, -1, -1):
        mu_l = mu_u - 1.0 * r_neg**k
        mu_bin[ibin] = 0.5 * (mu_u + mu_l)
        binwidth[ibin] = mu_u - mu_l
        mu_u = mu_l
        k += 1

    # central bin (mc_moves.F90:635-636)
    mu_bin[nbins // 2] = 0.0
    binwidth[nbins // 2] = 1.0

    # positive side (mc_moves.F90:639-648)
    mu_l = 0.5
    k = 0
    for ibin in range(nbins // 2 + 1, nbins):
        mu_u = mu_l + 1.0 * r_pos**k
        mu_bin[ibin] = 0.5 * (mu_u + mu_l)
        binwidth[ibin] = mu_u - mu_l
        mu_l = mu_u
        k += 1

    av = binwidth.mean()
    return BinGrid(
        mu_bin=jnp.asarray(mu_bin, dtype=dtype),
        binwidth=jnp.asarray(binwidth, dtype=dtype),
        av_binwidth=float(av),
        r_pos=float(r_pos),
        r_neg=float(r_neg),
        a_pos=1.0,
        a_neg=1.0,
        mu_min=float(mu_min),
        mu_max=float(mu_max),
    )


def mu_to_bin(grid: BinGrid, mu):
    """0-based bin index of ``mu`` (mc_moves.F90:2187-2215).

    May return indices outside [0, B-1] for mu beyond the grid - the
    reference relies on this to skip histogram updates
    (mc_moves.F90:1619); callers must mask.
    """
    B = grid.nbins
    centre = B // 2
    # positive branch
    arg_p = 1.0 - (mu - 0.5) * (1.0 - grid.r_pos) / grid.a_pos
    k_pos = centre + 1 + jnp.int32(
        jnp.log(jnp.maximum(arg_p, 1e-300)) / np.log(grid.r_pos)
    )
    # negative branch
    arg_n = 1.0 - (jnp.abs(mu) - 0.5) * (1.0 - grid.r_neg) / grid.a_neg
    k_neg = centre - 1 - jnp.int32(
        jnp.log(jnp.maximum(arg_n, 1e-300)) / np.log(grid.r_neg)
    )
    k = jnp.where(mu > 0.0, k_pos, k_neg)
    return jnp.where(jnp.abs(mu) <= 0.5, centre, k)


def eta_weight(grid: BinGrid, weight, mu, my_mu_min, my_mu_max,
               start_bin, end_bin, in_window, interp: bool):
    """Multicanonical weight eta(mu) for one walker.

    weight:   [B] current weight estimate of this walker
    my_mu_*:  the walker's window limits (global limits in 'mw' mode)
    start/end_bin: 0-based window bin range
    in_window: False until a dd walker first reaches its window -
               no bias is applied before then (mc_moves.F90:913)
    interp:   piecewise-linear interpolation flag (eta_interp)

    Returns the finite wall ETA_WALL outside the window
    (mc_moves.F90:915-922).
    """
    B = grid.nbins
    k = jnp.clip(mu_to_bin(grid, mu), 0, B - 1)

    if not interp:
        eta = weight[k]
    else:
        km = jnp.clip(k - 1, 0, B - 1)
        kp = jnp.clip(k + 1, 0, B - 1)
        w_k, w_km, w_kp = weight[k], weight[km], weight[kp]
        bw_k = grid.binwidth[k]
        bw_km = grid.binwidth[km]
        bw_kp = grid.binwidth[kp]
        mub_k = grid.mu_bin[k]
        mub_km = grid.mu_bin[km]

        grad_up = 2.0 * (w_kp - w_k) / (bw_k + bw_kp)
        grad_dn = 2.0 * (w_k - w_km) / (bw_k + bw_km)

        eta_first = w_k + (mu - mub_k) * grad_up       # k == start_bin
        eta_last = w_k + (mu - mub_k) * grad_dn        # k == end_bin
        eta_mid_up = w_k + (mu - mub_k) * grad_up      # mu > mu_bin[k]
        eta_mid_dn = w_km + (mu - mub_km) * grad_dn    # mu <= mu_bin[k]

        eta = jnp.where(
            k == start_bin,
            eta_first,
            jnp.where(
                k == end_bin,
                eta_last,
                jnp.where(mu > mub_k, eta_mid_up, eta_mid_dn),
            ),
        )

    wall = (mu < my_mu_min) | (mu > my_mu_max)
    eta = jnp.where(wall, ETA_WALL, eta)
    # no bias at all until the walker has reached its window
    return jnp.where(in_window, eta, 0.0)
