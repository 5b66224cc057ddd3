"""Dense multi-trial A/B: trials/s at N=216 vs dense_trials.

The headline WL-generation pacing metric is mu-bin visits = trials/s
(every trial lands a histogram/weight update); dense_trials = T
amortises the per-move row fetch/store machinery (~88% of the dense
budget, DESIGN.md 5d) over T trials.  Rows measure the production
headline config (N=216, W=4096, f32, fused table path, B=201 WL
grid) at T in {1, 2, 4, 8}.

Env: DM_WALKERS (4096), DM_CYCLES (20), DM_TRIALS ("1,2,4,8"),
DM_NBINS (201).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    W = int(os.environ.get("DM_WALKERS", "4096"))
    cycles = int(os.environ.get("DM_CYCLES", "20"))
    trials = [int(x) for x in
              os.environ.get("DM_TRIALS", "1,2,4,8").split(",")]
    nbins = int(os.environ.get("DM_NBINS", "201"))

    import jax
    import numpy as np

    import __graft_entry__ as g

    rows = []
    for T in trials:
        prm, eng, state = g._setup(
            n_walkers=W, dtype="float32", nwater=216,
            mpi_sync_int=250, samplerun=False, eq_mc_cycles=1,
            nbins=nbins, mu_min=-1800.0, mu_max=1800.0,
            dense_trials=T, fused="on", mc_switch_prob=0.1,
        )
        t0 = time.time()
        s, _ = eng.run_cycles(state, cycles)
        jax.block_until_ready(s.energy)
        compile_s = time.time() - t0
        t0 = time.time()
        s, _ = eng.run_cycles(s, cycles)
        jax.block_until_ready(s.energy)
        dt = time.time() - t0
        att = np.asarray(s.att)
        acc = np.asarray(s.acc)
        # trials/cycle stays nwater by construction
        rate = W * prm.nwater * cycles / dt
        a_tr = acc[0].sum() / max(att[0].sum(), 1)
        rows.append(dict(
            T=T, trials_per_s=round(rate, 1),
            acc_trans=round(float(a_tr), 4),
            elapsed_s=round(dt, 2), compile_s=round(compile_s, 1),
        ))
        print(f"T={T}: {rate:,.0f} trials/s  acc={a_tr:.3f} "
              f"({dt:.2f}s timed, compile {compile_s:.0f}s)",
              flush=True)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
