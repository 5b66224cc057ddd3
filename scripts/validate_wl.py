"""Wang-Landau weight-generation validation (SURVEY.md §4 oracle d).

Runs the reference's ice1_gen_weights example end-to-end through the
Application (real TPU, walker ensemble) with weights started from
ZERO, then compares the converged multicanonical weight curve eta(mu)
against the author's converged weights packaged with ice1_sample
(same physics: mW N=48 Ih/Ic, 200 K, 1 atm, 101 bins over +-400 kT).

Weights are defined up to an additive constant and the comparison is
restricted to the well-sampled central region (|mu| <= MU_CMP); the
packaged curve's tails carry the least statistics.  Alignment uses
the mean over the compared region.

Usage:  python scripts/validate_wl.py [max_cycles] [walkers]
Writes wl_validation.json into the scratch run directory and prints a
summary line.
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

MU_CMP = 250.0          # compare |mu| <= this (well-sampled region)
EXAMPLE = "/root/reference/examples/ice1_gen_weights"
TARGET = "/root/reference/examples/ice1_sample/eta_weights.dat"


def main():
    max_cycles = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000
    walkers = int(sys.argv[2]) if len(sys.argv) > 2 else 4096

    run_dir = tempfile.mkdtemp(prefix="wl_validate_")
    for f in os.listdir(EXAMPLE):
        if not f.startswith("eta_weights"):
            shutil.copy(os.path.join(EXAMPLE, f), run_dir)

    from mc_water_ls_mw_tpu.app import Application
    from mc_water_ls_mw_tpu.io.namelist import read_input

    # The ensemble WL increment per move-step is walkers*f (each
    # walker adds f, merged by delta-sync - the reference's own
    # multi-rank semantics, comms_allreduce_eta).  The example's
    # f=0.005 is tuned for ~8 MPI ranks; keep the same ENSEMBLE rate
    # at 10^3 walkers by scaling the per-walker f.
    wl_factor = max(0.005 * 8.0 / walkers, 5e-6)

    overrides = dict(
        n_walkers=walkers,
        wl_factor=wl_factor,
        # the walker ensemble accumulates statistics ~walkers x faster
        # per cycle than one chain; shorten the serial-time intervals
        # accordingly (the reference tuned these for 8 MPI ranks)
        eq_mc_cycles=1_000,
        flat_chk_int=500,
        monitor_int=1_000,
        chkpt_dump_int=10_000,
        mpi_sync_int=100,
        file_output_int=1_000_000,     # no therm flood
        traj_output_int=100_000_000,
        max_mc_cycles=max_cycles,
    )
    prm = read_input(os.path.join(run_dir, "ice.input"),
                     extra_overrides=overrides)

    t0 = time.time()
    app = Application(prm, workdir=run_dir)
    app.setup()
    state = app.run()
    elapsed = time.time() - t0

    # converged curve written by the monitor
    got = np.loadtxt(os.path.join(run_dir, "eta_weights.dat"),
                     skiprows=1)
    ref = np.loadtxt(TARGET, skiprows=1)
    assert got.shape == ref.shape, (got.shape, ref.shape)
    mu = got[:, 0]
    sel = np.abs(mu) <= MU_CMP
    g = got[sel, 1] - got[sel, 1].mean()
    r = ref[sel, 1] - ref[sel, 1].mean()
    rms = float(np.sqrt(np.mean((g - r) ** 2)))
    maxdev = float(np.abs(g - r).max())
    span = float(r.max() - r.min())
    f_final = float(np.asarray(state.f).max())

    out = {
        "metric": "WL weight-generation parity vs packaged "
                  "eta_weights.dat (|mu|<=250, mean-aligned)",
        "rms_kT": round(rms, 4),
        "max_dev_kT": round(maxdev, 4),
        "curve_span_kT": round(span, 3),
        "rms_over_span": round(rms / span, 5),
        "final_wl_factor": f_final,
        "cycles": int(np.asarray(state.cycle)),
        "walkers": walkers,
        "elapsed_s": round(elapsed, 1),
        "run_dir": run_dir,
    }
    with open(os.path.join(run_dir, "wl_validation.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
