"""Headline benchmark: aggregate MC moves/second on real TPU hardware.

Runs the flagship workload - lattice-switch multicanonical sampling of
the packaged 48-molecule mW ice Ih/Ic cells (examples/ice1_sample
semantics: fixed converged weights, NPT, 200 K) - over a large vmapped
walker ensemble in float32, and reports aggregate Monte-Carlo moves
per second.

Baseline (vs_baseline denominator): the driver-defined target is the
8-rank MPI Fortran build (BASELINE.md).  No Fortran compiler exists in
this image, so the denominator uses the documented estimate in
BASELINE.md: 8 ranks x 0.5e6 moves/s/rank = 4.0e6 moves/s aggregate
(typical single-core throughput of the reference's local-update kernel
at N=48; see BASELINE.md for derivation).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

FORTRAN_8RANK_MOVES_PER_S = 4.0e6  # documented estimate, BASELINE.md


def main():
    walkers = int(os.environ.get("BENCH_WALKERS", "4096"))
    cycles = int(os.environ.get("BENCH_CYCLES", "20"))
    dtype = os.environ.get("BENCH_DTYPE", "float32")
    # headline system: the paper's N=216 cell pair (BASELINE.json
    # metric "mW N=216 walkers"); BENCH_NWATER=48 selects the packaged
    # reference cells instead
    nwater = int(os.environ.get("BENCH_NWATER", "216"))

    import jax

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __graft_entry__ as g

    prm, eng, state = g._setup(
        n_walkers=walkers, dtype=dtype, nwater=nwater
    )
    # realistic sync cadence for the measurement (the _setup default
    # of 1 is for the dry-run collective check)
    eng.prm = prm
    n = prm.nwater

    # compile + warm-up
    t0 = time.time()
    state, _ = eng.run_cycles(state, cycles)
    jax.block_until_ready(state)
    compile_s = time.time() - t0

    t0 = time.time()
    state, _ = eng.run_cycles(state, cycles)
    jax.block_until_ready(state)
    elapsed = time.time() - t0

    moves = walkers * n * cycles
    rate = moves / elapsed
    print(json.dumps({
        "metric": f"aggregate MC moves/sec (mW lattice-switch, N={n}, "
                  f"{walkers} walkers, {dtype})",
        "value": round(rate, 1),
        "unit": "moves/s",
        "vs_baseline": round(rate / FORTRAN_8RANK_MOVES_PER_S, 3),
        "walkers": walkers,
        "cycles_timed": cycles,
        "elapsed_s": round(elapsed, 3),
        "compile_s": round(compile_s, 1),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
