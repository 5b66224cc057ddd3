"""Measure the CPU baseline proxy (scripts/baseline_proxy.cpp).

Dumps the packaged N=48 Ih/Ic cells and the built N=216 stacking
switch pair (the paper system) in Angstrom, compiles the C++ proxy
with the reference's GNU flags (Makefile:28-30 analogue), runs it
single-core, and prints one JSON line per system.  The proxy's init
energies must match the framework's fp64 oracle (VALIDATION.md a)
— that is the check that the measured cost model computes the same
physics per move as the reference.

Usage: python scripts/run_baseline_proxy.py [cycles_n48 cycles_n216]
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def dump(path, r, H, bohr=True):
    """r [2,N,3], H [2,3,3] with ROWS as cell vectors, -> proxy text."""
    from mc_water_ls_mw_tpu.constants import BOHR_TO_ANG, HART_TO_EV
    from mc_water_ls_mw_tpu.models.sw import MW

    s = BOHR_TO_ANG if bohr else 1.0
    r = np.asarray(r, dtype=np.float64) * s
    H = np.asarray(H, dtype=np.float64) * s
    n = r.shape[1]
    with open(path, "w") as f:
        f.write(
            f"{n} {MW.sigma * BOHR_TO_ANG!r} "
            f"{MW.epsilon * HART_TO_EV!r} {MW.lam!r} {MW.bigA!r} "
            f"{MW.bigB!r} {MW.gamma!r} {MW.a!r} {MW.cos0!r}\n"
        )
        for l in range(2):
            f.write(" ".join(f"{x:.17g}" for x in H[l].ravel()) + "\n")
            for i in range(n):
                f.write(" ".join(f"{x:.17g}" for x in r[l, i]) + "\n")


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from mc_water_ls_mw_tpu.io.xmol import read_lattices
    from mc_water_ls_mw_tpu.models.stacking import stacking_switch_pair

    cyc48 = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    cyc216 = int(sys.argv[2]) if len(sys.argv) > 2 else 1000

    tmp = tempfile.mkdtemp()
    exe = os.path.join(tmp, "baseline_proxy")
    src = os.path.join(os.path.dirname(__file__), "baseline_proxy.cpp")
    subprocess.run(
        ["g++", "-O3", "-march=native", "-ffast-math",
         "-funroll-loops", "-fopenmp-simd", "-o", exe, src],
        check=True,
    )

    r48, H48 = read_lattices(
        "/root/reference/examples/ice1_sample", 2, 48
    )
    # xmol cells are already Angstrom; read_lattices returns Bohr
    f48 = os.path.join(tmp, "n48.txt")
    dump(f48, r48, H48, bohr=True)

    r216, H216 = stacking_switch_pair(3, 3, 6)
    f216 = os.path.join(tmp, "n216.txt")
    dump(f216, r216, H216, bohr=True)

    nconc = int(os.environ.get("PROXY_NPROC", "1"))

    out = {}
    for name, path, cyc in (("n48", f48, cyc48), ("n216", f216, cyc216)):
        res = subprocess.run(
            [exe, path, str(cyc)], capture_output=True, text=True,
            check=True,
        )
        sys.stderr.write(res.stdout)
        last = [l for l in res.stdout.splitlines() if l.startswith("{")]
        out[name] = json.loads(last[-1])

    if nconc > 1:
        # PROXY_NPROC concurrent ranks, the reference's 8-rank MPI
        # shape (each rank an independent chain; the O(nbins)~200-
        # double allreduce every mpi_sync_int~250 cycles is noise
        # next to the per-move work, so independent processes are a
        # faithful aggregate-throughput stand-in).  NOTE this image
        # exposes a single virtualised core (nproc == 1), so N
        # concurrent ranks timeshare it: the measured aggregate is
        # the CONTENTION floor, and the x8 single-core extrapolation
        # (assuming 8 dedicated cores, generous to the baseline)
        # remains the fair denominator - both are recorded.
        procs = [
            subprocess.Popen(
                [exe, f216, str(cyc216)], stdout=subprocess.PIPE,
                text=True,
            )
            for _ in range(nconc)
        ]
        agg = 0.0
        for pr in procs:
            so, _ = pr.communicate()
            last = [l for l in so.splitlines() if l.startswith("{")]
            agg += json.loads(last[-1])["moves_per_s"]
        out[f"n216_x{nconc}_concurrent"] = {
            "ranks": nconc,
            "aggregate_moves_per_s": agg,
            "host_cores": os.cpu_count(),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
