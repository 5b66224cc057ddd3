"""mu-window stitching tests (SURVEY.md §4 oracle f).

Constructs per-window curves from a known global function with
per-window offsets; the joins must recover the global shape exactly
(additively for weights, multiplicatively for histograms).
"""

import numpy as np
import pytest

from mc_water_ls_mw_tpu.parallel.windows import (
    join_eta,
    join_uhist,
    per_window_curves,
)

B = 100
NWIN = 4
OVERLAP = 2


def _window_ranges():
    bpw = B // NWIN
    # reference window layout (mc_init:659-722), 0-based inclusive
    out = []
    for w in range(NWIN):
        if w == 0:
            out.append((0, bpw + OVERLAP - 1))
        elif w == NWIN - 1:
            out.append((w * bpw - OVERLAP - 1, B - 1))
        else:
            out.append((w * bpw - OVERLAP - 1, (w + 1) * bpw + OVERLAP - 1))
    return out


def test_join_eta_recovers_global_curve():
    x = np.linspace(-1, 1, B)
    truth = 5.0 * x**2 + np.sin(4 * x)       # smooth global log-weight
    rng = np.random.default_rng(1)
    curves = np.zeros((NWIN, B))
    for w, (s, e) in enumerate(_window_ranges()):
        off = rng.normal() * 10               # per-window arbitrary offset
        curves[w, s:e + 1] = truth[s:e + 1] + off
    joined = join_eta(curves, B, OVERLAP)
    expected = truth - truth[B // 2]          # re-zeroed at central bin
    np.testing.assert_allclose(joined, expected, atol=1e-10)


def test_join_uhist_recovers_global_curve():
    x = np.linspace(-1, 1, B)
    truth = np.exp(-4 * x**2) + 0.01
    rng = np.random.default_rng(2)
    curves = np.zeros((NWIN, B))
    for w, (s, e) in enumerate(_window_ranges()):
        scale = np.exp(rng.normal())
        curves[w, s:e + 1] = truth[s:e + 1] * scale
    joined = join_uhist(curves, B, OVERLAP)
    # multiplicative join recovers the shape up to the first window's
    # scale
    ratio = joined / (truth * curves[0, 0] / truth[0])
    np.testing.assert_allclose(ratio, ratio[0], rtol=1e-9)


def test_join_uhist_empty_overlap_is_safe():
    curves = np.zeros((NWIN, B))
    curves[0, :30] = 1.0
    joined = join_uhist(curves, B, OVERLAP)
    assert np.isfinite(joined).all()


def test_per_window_curves_picks_representative():
    vals = np.arange(6 * 4).reshape(6, 4).astype(float)
    wid = np.array([0, 1, 2, 0, 1, 2])
    out = per_window_curves(vals, wid, 3)
    np.testing.assert_array_equal(out[0], vals[0])
    np.testing.assert_array_equal(out[1], vals[1])
    np.testing.assert_array_equal(out[2], vals[2])
