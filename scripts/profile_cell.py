"""Device-trace profile of the large-N cell engine.

Captures a jax.profiler perfetto trace of a few steady-state cycles
at the bench_largen configuration and prints the top device ops by
total time, grouped by fusion/op name.  This is the measurement tool
behind the cell-engine throughput work (DESIGN.md §5b): the sub-step
is latency-bound, and the trace says which of gather / energy kernel
/ acceptance chain / scatter dominates.

Usage (same env knobs as bench_largen.py):
    LN_NX=14 LN_NY=8 LN_M=18 LN_WALKERS=128 LN_PALLAS=on \
        python scripts/profile_cell.py [trace_dir]
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def analyze(trace_dir: str, top: int = 40) -> None:
    """Group perfetto trace device events by op name; print top-N."""
    paths = glob.glob(
        os.path.join(trace_dir, "**", "*.trace.json.gz"),
        recursive=True,
    )
    if not paths:
        print(f"no perfetto trace under {trace_dir}")
        return
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # device track pids: names like "/device:TPU:0" / "TPU:0" contain
    # "TPU"; host python threads do not
    dev_pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            nm = e.get("args", {}).get("name", "")
            if "TPU" in nm.upper() or "device" in nm.lower():
                dev_pids.add(e["pid"])
    tot = defaultdict(float)
    cnt = defaultdict(int)
    span_lo, span_hi = float("inf"), 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        nm = e.get("name", "?")
        dur = float(e.get("dur", 0.0))
        tot[nm] += dur
        cnt[nm] += 1
        ts = float(e.get("ts", 0.0))
        span_lo = min(span_lo, ts)
        span_hi = max(span_hi, ts + dur)
    grand = sum(tot.values())
    print(f"\ntrace: {path}")
    print(f"device events: {sum(cnt.values())}, "
          f"total device-op time {grand/1e6:.3f}s, "
          f"wall span {(span_hi-span_lo)/1e6:.3f}s")
    print(f"{'total_ms':>10} {'count':>7} {'avg_us':>9}  name")
    for nm in sorted(tot, key=tot.get, reverse=True)[:top]:
        print(f"{tot[nm]/1e3:10.2f} {cnt[nm]:7d} "
              f"{tot[nm]/max(cnt[nm],1):9.1f}  {nm[:90]}")


def main() -> None:
    import numpy as np
    import jax
    import jax.numpy as jnp

    from mc_water_ls_mw_tpu.models.stacking import (
        correspondence_mismatch,
        stacking_switch_pair,
    )
    from mc_water_ls_mw_tpu.models.sw import MW
    from mc_water_ls_mw_tpu.mcmc.config import RunParams
    from mc_water_ls_mw_tpu.mcmc.bins import build_bin_grid
    from mc_water_ls_mw_tpu.mcmc.cellengine import (
        CellEngine,
        init_cell_state,
    )
    from mc_water_ls_mw_tpu.ops.cells import (
        build_grid,
        cap_for_positions,
        choose_grid_shape,
    )
    from mc_water_ls_mw_tpu.constants import ANG_TO_BOHR, AUP_TO_ATM

    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/cellprof"
    nx = int(os.environ.get("LN_NX", "14"))
    ny = int(os.environ.get("LN_NY", "8"))
    m = int(os.environ.get("LN_M", "18"))
    W = int(os.environ.get("LN_WALKERS", "128"))

    print("devices:", jax.devices())
    r0, H0 = stacking_switch_pair(nx, ny, m)
    N = r0.shape[1]
    mx, _ = correspondence_mismatch(r0, H0)
    disjoint = os.environ.get("LN_DISJOINT") == "1"
    shape = choose_grid_shape(H0, MW, mx, prefer_disjoint=disjoint)
    cap_env = os.environ.get("LN_CAP")
    cap = int(cap_env) if cap_env else cap_for_positions(r0, H0, shape)
    cg = build_grid(shape, cap, H0, MW, mx)
    print(f"N={N} coarse={shape} nfine={cg.nfine} cap={cap} W={W} "
          f"K={cg.cells_per_color}")

    prm = RunParams(
        nwater=N, num_lattices=2, temperature=200.0,
        pressure=1.0 / AUP_TO_ATM,
        mc_max_trans=0.25 * ANG_TO_BOHR, mc_dv_max=0.2 * ANG_TO_BOHR,
        nbins=201, mu_min=-1200.0, mu_max=1200.0,
        mc_vol_prob=1.0 / N, mc_switch_prob=0.1,
        samplerun=False, eq_mc_cycles=1, list_update_int=5,
        mpi_sync_int=10, latt_sync_int=10_000,
        n_walkers=W, dtype="float32", fused="off",
        cell_pallas=os.environ.get("LN_PALLAS", "auto"),
        cell_trials=int(os.environ.get("LN_TRIALS", "1")),
    )
    grid = build_bin_grid(prm.nbins, prm.mu_min, prm.mu_max,
                          dtype=jnp.float32)
    state, aux, cellaux = init_cell_state(prm, MW, r0, H0, grid, cg)
    eng = CellEngine(prm, MW, grid, aux, cg, cellaux)

    step = jax.jit(lambda st: eng._one_cycle(st)[0],
                   donate_argnums=0)
    t0 = time.time()
    state = jax.block_until_ready(step(state))
    print(f"compile+first cycle {time.time()-t0:.1f}s")
    state = jax.block_until_ready(step(state))

    n_prof = int(os.environ.get("LN_PROF_CYCLES", "2"))
    jax.profiler.start_trace(trace_dir, create_perfetto_trace=True)
    t0 = time.time()
    for _ in range(n_prof):
        state = step(state)
    jax.block_until_ready(state)
    dt = time.time() - t0
    jax.profiler.stop_trace()
    tpc = dt / n_prof
    mps = eng.trials_per_cycle * W / tpc
    print(f"{n_prof} cycles {dt:.2f}s -> {tpc:.2f}s/cycle, "
          f"{mps:,.0f} moves/s")
    analyze(trace_dir)


if __name__ == "__main__":
    main()
