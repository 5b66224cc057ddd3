"""Summarise an N=8064 dd WL-generation run directory.

Prints per-window f values (wlf.dat archives / node log), the
stitched weight-curve extent and its shape near the walls (is the
free-energy minimum INSIDE the range?), per-walker mu coverage from
the therm files, and the cycle rate.

Usage: python scripts/n8064_status.py runs/n8064_wl
"""

from __future__ import annotations

import glob
import os
import sys

import numpy as np


def main():
    rd = sys.argv[1] if len(sys.argv) > 1 else "runs/n8064_wl"

    # therm coverage + rate
    mus = []
    for f in sorted(glob.glob(os.path.join(rd, "ice*_therm.dat"))):
        try:
            d = np.loadtxt(f, ndmin=2)
        except Exception:
            continue
        if d.size:
            mus.append(d)
    if mus:
        last_cyc = max(int(d[-1, 0]) for d in mus)
        mu_all = np.concatenate([d[:, 2] for d in mus])
        e_all = np.concatenate([d[:, 1] for d in mus])
        print(f"cycles reached : {last_cyc}")
        print(f"mu sampled     : [{mu_all.min():.0f}, "
              f"{mu_all.max():.0f}]  (|mu|max/N = "
              f"{abs(mu_all).max() / 8064:.2f})")
        print(f"E_ls range     : [{e_all.min():.1f}, "
              f"{e_all.max():.1f}] eV")

    # wlf archives (flatness events)
    wlf = os.path.join(rd, "wlf.dat")
    if os.path.exists(wlf):
        lines = open(wlf).read().strip().splitlines()
        print(f"flatness events: {len(lines)}")
        for ln in lines[-6:]:
            print("  ", ln)

    # stitched weight curve (monitor dump)
    ew = os.path.join(rd, "eta_weights.dat")
    if os.path.exists(ew):
        rows = []
        for ln in open(ew):
            if ln.startswith("#"):
                continue
            p = ln.split()
            if len(p) >= 2:
                rows.append((float(p[0]), float(p[1])))
        if rows:
            mu = np.array([r[0] for r in rows])
            w = np.array([r[1] for r in rows])
            nz = w != 0.0
            if nz.any():
                print(f"weight curve   : {nz.sum()}/{len(w)} bins "
                      f"non-zero, span {w[nz].max() - w[nz].min():.1f} "
                      "kT")
                print(f"  populated mu : [{mu[nz].min():.0f}, "
                      f"{mu[nz].max():.0f}]")
                # wall check: does eta keep growing toward the edges?
                lo = w[nz][:3]
                print(f"  leftmost bins: {np.array2string(lo, precision=1)}"
                      f"  (monotonic-up toward the wall = range too "
                      "small)")

    # per-window f from the node log monitor blocks
    log = os.path.join(rd, "node000.log")
    if os.path.exists(log):
        tail = open(log).read().splitlines()
        keep = [ln for ln in tail if ("f =" in ln or "drift" in ln
                                      or "window" in ln.lower())]
        for ln in keep[-12:]:
            print("  ", ln)


if __name__ == "__main__":
    main()
