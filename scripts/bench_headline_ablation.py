"""Headline-kernel cost ablation (N=216 dense fused path).

Times the fused whole-cycle kernel under config ablations that
isolate where the per-move budget goes, WITHOUT code changes - the
measured basis for the DESIGN roofline argument on the dense path
(VERDICT round-2 item 7):

* baseline        - the bench.py configuration (samplerun, B=21,
                    eta interpolation on, WB=128);
* eta_interp=off  - removes ~2/3 of the per-eta [B, W] one-hot dots
                    (reference-supported config, eta_interp=.false.);
* nbins=201       - the PRODUCTION bin grid of the N=216 WL runs
                    (the headline's B=21 understates WL-op cost);
* nbins=11        - lower bound of the [B, W] share;
* WB=256          - walker-block width re-check (VMEM-resident row
                    count doubles; round-2 measured 128 > 256).

Usage: python scripts/bench_headline_ablation.py [walkers] [cycles]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax


def bench(tag, walkers, cycles, wb=None, **kw):
    import __graft_entry__ as g

    if wb is not None:
        os.environ["MWLS_FUSED_WB"] = str(wb)
    else:
        os.environ.pop("MWLS_FUSED_WB", None)
    prm, eng, state = g._setup(
        n_walkers=walkers, dtype="float32", nwater=216,
        mpi_sync_int=250, **kw,
    )
    t0 = time.time()
    state, _ = eng.run_cycles(state, cycles)
    jax.block_until_ready(state)
    compile_s = time.time() - t0
    t0 = time.time()
    state, _ = eng.run_cycles(state, cycles)
    jax.block_until_ready(state)
    dt = time.time() - t0
    rate = walkers * prm.nwater * cycles / dt
    print(f"{tag}: {rate:,.0f} moves/s ({dt:.2f}s, "
          f"compile {compile_s:.0f}s)", flush=True)
    return {"tag": tag, "moves_per_s": rate}


def main():
    walkers = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    cycles = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    rows = [
        bench("baseline B=21 interp WB=128", walkers, cycles),
        bench("eta_interp=False", walkers, cycles,
              eta_interp=False),
        bench("nbins=201 (production grid)", walkers, cycles,
              nbins=201),
        bench("nbins=11", walkers, cycles, nbins=11),
        # WB=256 now exceeds the 16 MB scoped-VMEM budget (fails to
        # compile; round-2 measured it slower than 128 anyway)
    ]
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
