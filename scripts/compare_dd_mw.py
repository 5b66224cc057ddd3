"""Compare the dd-mode stitched WL curve against the mw-mode curve.

Closes VERDICT round-2 item 2's statistical loop: runs/n216_wl_dd
(8 mu-windows, overlap-matched stitching - comms_join_eta semantics,
comms_mpi.f90:381-459) must reproduce runs/n216_wl_r2 (mw mode, the
round-2 production curve) up to WL noise, and the weights-direct
delta-G estimates (mc_moves.F90:2418-2496 estimator) of the two
curves must agree.

Usage:
    python scripts/compare_dd_mw.py [dd_dir] [mw_dir]
        (defaults runs/n216_wl_dd runs/n216_wl_r2)

Prints one JSON line: per-curve deltaG (kT and J/mol), curve
deviation statistics (offset-free, per window), and the per-window f
levels of the dd run (windows still at larger f carry
proportionally larger WL noise - the comparison reports deviation
per dd window so unconverged windows are visible, not averaged
away).
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from mc_water_ls_mw_tpu.constants import HART_TO_KJPM, KB
from mc_water_ls_mw_tpu.io.writers import read_eta_weights
from mc_water_ls_mw_tpu.mcmc.bins import build_bin_grid

sys.path.insert(0, os.path.dirname(__file__))
from deltag_from_weights import deltag_from_eta  # noqa: E402


def main():
    dd_dir = sys.argv[1] if len(sys.argv) > 1 else "runs/n216_wl_dd"
    mw_dir = sys.argv[2] if len(sys.argv) > 2 else "runs/n216_wl_r2"
    nbins, mu_min, mu_max = 201, -1800.0, 1800.0
    T = 200.0

    grid = build_bin_grid(nbins, mu_min, mu_max)
    bw = np.asarray(grid.binwidth, dtype=np.float64)

    f_dd, w_dd = read_eta_weights(os.path.join(dd_dir,
                                               "eta_weights.dat"))
    f_mw, w_mw = read_eta_weights(os.path.join(mw_dir,
                                               "eta_weights.dat"))
    w_dd = np.asarray(w_dd, dtype=np.float64)
    w_mw = np.asarray(w_mw, dtype=np.float64)

    dg_dd = deltag_from_eta(w_dd, bw)
    dg_mw = deltag_from_eta(w_mw, bw)
    kT_to_jpm = KB * T * HART_TO_KJPM * 1e3

    # offset-free curve deviation (weights are defined up to a
    # constant): global, and per dd window so unconverged windows
    # (larger per-window f) stay visible
    d = w_dd - w_mw
    d = d - d.mean()
    out = {
        "deltaG_dd_kT": dg_dd, "deltaG_mw_kT": dg_mw,
        "deltaG_dd_jpm": dg_dd * kT_to_jpm,
        "deltaG_mw_jpm": dg_mw * kT_to_jpm,
        "deltaG_diff_jpm": (dg_dd - dg_mw) * kT_to_jpm,
        "curve_rms_kT": float(np.sqrt(np.mean(d ** 2))),
        "curve_max_kT": float(np.abs(d).max()),
        "f_dd_final": f_dd, "f_mw_final": f_mw,
        "windows": [],
    }
    # per-window rows (window layout of the production run: 8 windows,
    # overlap 2 - state.assign_windows)
    nwin = 8
    bpw = nbins // nwin
    for w in range(nwin):
        s = 0 if w == 0 else w * bpw - 3
        e = nbins - 1 if w == nwin - 1 else (w + 1) * bpw + 1
        fw = None
        wf = os.path.join(dd_dir, f"eta_weights_{w:03d}.dat")
        if os.path.exists(wf):
            fw, _ = read_eta_weights(wf)
        dw = d[s:e + 1] - d[s:e + 1].mean()
        out["windows"].append({
            "w": w, "f": fw,
            "rms_kT": float(np.sqrt(np.mean(dw ** 2))),
            "max_kT": float(np.abs(dw).max()),
        })
    print(json.dumps(out))


if __name__ == "__main__":
    main()
