"""mu-window stitching for the 'dd' order-parameter decomposition.

Host-side rebuild of the reference's overlap-matched window joins
(comms_join_eta, comms_mpi.f90:381-459; comms_join_uhist,
comms_mpi.f90:299-379).  Windows are consecutive ranges of the bin
grid with ``overlap`` shared bins on each side; curves from adjacent
windows are joined by matching their means over the 2*overlap+1
shared bins - additively for log-weights, multiplicatively (log-space)
for histograms.

These are tiny O(nbins) host computations run at monitor/deltaG
points, exactly as the reference funnels them through rank 0.
"""

from __future__ import annotations

import numpy as np


def join_eta(window_curves: np.ndarray, nbins: int, overlap: int):
    """Join per-window weight curves [nwin, B] -> [B].

    Additive overlap matching + re-zero at the central bin
    (comms_join_eta, comms_mpi.f90:404-450).
    """
    curves = np.asarray(window_curves, dtype=np.float64)
    nwin = curves.shape[0]
    bpw = nbins // nwin
    joined = curves[0].copy()
    for w in range(1, nwin):
        end = w * bpw - 1            # 0-based last bin rank0 owns
        sl = slice(end - overlap, end + overlap + 1)
        shift = joined[sl].mean() - curves[w][sl].mean()
        joined[end + 1:] = curves[w][end + 1:] + shift
    joined -= joined[nbins // 2]     # re-zero central bin (:447-450)
    return joined


def join_uhist(window_curves: np.ndarray, nbins: int, overlap: int):
    """Join per-window unbiased histograms [nwin, B] -> [B].

    Log-space mean matching, multiplicative shift; a NaN shift (empty
    overlap bins) falls back to no scaling (comms_join_uhist,
    comms_mpi.f90:342-369).
    """
    curves = np.asarray(window_curves, dtype=np.float64)
    nwin = curves.shape[0]
    bpw = nbins // nwin
    joined = curves[0].copy()
    with np.errstate(divide="ignore", invalid="ignore"):
        for w in range(1, nwin):
            end = w * bpw - 1
            sl = slice(end - overlap, end + overlap + 1)
            myave = np.log(joined[sl]).mean()
            nextav = np.log(curves[w][sl]).mean()
            shift = myave - nextav
            if not np.isfinite(shift):
                shift = 0.0
            joined[end + 1:] = curves[w][end + 1:] * np.exp(shift)
    return joined


def per_window_curves(values: np.ndarray, window_id: np.ndarray, nwin: int):
    """Collapse per-walker arrays [W, B] to one curve per window.

    After a delta-sync all walkers in a window hold identical arrays;
    take the first walker of each window (the reference has exactly
    one rank per window).
    """
    values = np.asarray(values)
    out = np.zeros((nwin, values.shape[1]), dtype=values.dtype)
    wid = np.asarray(window_id)
    for w in range(nwin):
        idx = np.nonzero(wid == w)[0]
        out[w] = values[idx[0]]
    return out
