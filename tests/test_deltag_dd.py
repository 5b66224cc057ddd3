"""dd-mode block jackknife (scripts/deltag_error.py --dd).

Synthetic per-window cumulative dumps with a known underlying P(mu):
the script must difference per window, re-stitch each delete-one
total (join_uhist) and recover the known deltaG with a small error
bar.  Pins the rule that STITCHED dumps are never differenced (the
matching constants change between dumps - the reason the dd sample
run also dumps uhist_windows_<cycle>.dat; wanglandau.compute_deltaG).
"""

import os
import subprocess
import sys

import numpy as np
import jax.numpy as jnp
import pytest

from mc_water_ls_mw_tpu.mcmc.bins import build_bin_grid
from mc_water_ls_mw_tpu.mcmc.state import assign_windows
from mc_water_ls_mw_tpu.mcmc.config import RunParams

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dd_jackknife_recovers_known_deltag(tmp_path):
    B, mu_min, mu_max = 21, -400.0, 400.0
    nwin, overlap = 2, 2
    grid = build_bin_grid(B, mu_min, mu_max, dtype=jnp.float64)
    mub = np.asarray(grid.mu_bin)
    bw = np.asarray(grid.binwidth)

    # known double-well P(mu), right well 2x the left -> deltaG = ln(1/2)
    p = (np.exp(-0.5 * ((mub + 250) / 60.0) ** 2)
         + 2.0 * np.exp(-0.5 * ((mub - 250) / 60.0) ** 2)) / bw
    prm = RunParams(nbins=B, mu_min=mu_min, mu_max=mu_max,
                    window_overlap=overlap, num_lattices=2)
    wins = assign_windows(prm, grid, nwin)

    rng = np.random.default_rng(0)
    cum = np.zeros((nwin, B))
    for i, cycle in enumerate((1000, 2000, 3000, 4000, 5000, 6000)):
        for w, (s, e, _, _) in enumerate(wins):
            mask = np.zeros(B)
            mask[s:e + 1] = 1.0
            # per-window arbitrary scale + small noise per block
            blk = (p * mask * (1.0 + 0.5 * w)
                   * rng.uniform(0.97, 1.03, B))
            cum[w] += blk
        path = tmp_path / f"uhist_windows_{cycle:010d}.dat"
        with open(path, "w") as fh:
            fh.write("# mu then per-window raw columns\n")
            for k in range(B):
                fh.write(f"  {mub[k]: .14E}" + "".join(
                    f"  {cum[w, k]: .14E}" for w in range(nwin)
                ) + "\n")

    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/deltag_error.py"),
         str(tmp_path), "--nwater", "216", "--mu-min", str(mu_min),
         "--mu-max", str(mu_max), "--dd", "--overlap", str(overlap),
         "--skip-blocks", "0"],
        capture_output=True, text=True, timeout=300,
    )
    assert res.returncode == 0, res.stderr
    line = [ln for ln in res.stdout.splitlines()
            if ln.startswith("deltaG")][0]
    rhs = line.split(" = ")[1]
    dg = float(rhs.split("+-")[0])
    se = float(rhs.split("+-")[1].split("kT")[0])
    assert abs(dg - np.log(0.5)) < 0.05
    assert 0 < se < 0.05


def test_dd_counts_recovers_known_deltag_at_huge_span(tmp_path):
    """Round-5 large-span estimator (--dd-counts): per-window visit
    COUNTS + frozen eta recombined offline in f64 log-space.  The
    synthetic weight curve spans 4000 kT — exp(eta) overflows ANY
    float if taken in-flight, which is exactly the N=8064 regime the
    mode exists for; the known double-well asymmetry must still be
    recovered."""
    B, mu_min, mu_max = 41, -400.0, 400.0
    nwin, overlap = 4, 2
    grid = build_bin_grid(B, mu_min, mu_max, dtype=jnp.float64)
    mub = np.asarray(grid.mu_bin)
    bw = np.asarray(grid.binwidth)

    # true logP: double well, right well 2x -> deltaG = ln(1/2);
    # plus a HUGE barrier (4000 kT) between them
    logp = np.logaddexp(
        -0.5 * ((mub + 250) / 60.0) ** 2,
        np.log(2.0) - 0.5 * ((mub - 250) / 60.0) ** 2,
    ) - 4000.0 * np.exp(-0.5 * (mub / 120.0) ** 2)
    # converged multicanonical eta = +logP (engine convention:
    # eta = -G/kT; biased chain flat at eta = lnP) + per-window
    # constants
    prm = RunParams(nbins=B, mu_min=mu_min, mu_max=mu_max,
                    window_overlap=overlap, num_lattices=2)
    wins = assign_windows(prm, grid, nwin)

    rng = np.random.default_rng(1)
    cum = np.zeros((nwin, B))
    eta = np.full((nwin, B), 1e30)       # walled outside the window
    for w, (s, e, _, _) in enumerate(wins):
        eta[w, s:e + 1] = logp[s:e + 1] + 7.0 * w      # + constant
    for cycle in (1000, 2000, 3000, 4000, 5000, 6000):
        for w, (s, e, _, _) in enumerate(wins):
            # flat-histogram sampling: expected counts ∝ P·exp(eta)
            # = const within the window; add block noise
            blk = np.zeros(B)
            blk[s:e + 1] = 500.0 * rng.uniform(0.95, 1.05,
                                               e + 1 - s)
            cum[w] += blk
        path = tmp_path / f"hist_windows_{cycle:010d}.dat"
        with open(path, "w") as fh:
            fh.write("# mu then counts then eta\n")
            for k in range(B):
                fh.write(f"  {mub[k]: .14E}" + "".join(
                    f"  {cum[w, k]: .14E}" for w in range(nwin)
                ) + "".join(
                    f"  {eta[w, k]: .14E}" for w in range(nwin)
                ) + "\n")

    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/deltag_error.py"),
         str(tmp_path), "--nwater", "216", "--mu-min", str(mu_min),
         "--mu-max", str(mu_max), "--dd-counts",
         "--skip-blocks", "0"],
        capture_output=True, text=True, timeout=300,
    )
    assert res.returncode == 0, res.stderr
    line = [ln for ln in res.stdout.splitlines()
            if ln.startswith("deltaG")][0]
    rhs = line.split(" = ")[1]
    dg = float(rhs.split("+-")[0])
    se = float(rhs.split("+-")[1].split("kT")[0])
    assert abs(dg - np.log(0.5)) < 0.1
    assert 0 < se < 0.1
    assert "stitch-boundary" in res.stdout
