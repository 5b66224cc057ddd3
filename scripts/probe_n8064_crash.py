"""Bisect the N=8064 probe-run TPU worker crash (round 4).

The app-driven mu-basin probe run crashes the TPU worker in its first
cycle while the bench config (same N/W/kernels) runs fine.  Config
deltas are toggled one at a time, each attempt in a subprocess so a
worker crash doesn't kill the sweep.

Run without args to sweep; with an integer arg to run that single
case in-process (the subprocess entry).
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

CASES = {
    0: "bench config, n_cycles=1",
    1: "+ mu range +-150000",
    2: "+ eq_mc_cycles=1e6 (WL inactive)",
    3: "+ vol_prob=1/768, eq_adjust, therm_walkers=8 (full probe)",
}


def run_case(case: int):
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

    r0, H0 = stacking_switch_pair(14, 8, 18)
    N = r0.shape[1]
    mx, _ = correspondence_mismatch(r0, H0)
    shape = choose_grid_shape(H0, MW, mx)
    cap = cap_for_positions(r0, H0, shape)
    cg = build_grid(shape, cap, H0, MW, mx)
    kw = dict(
        nwater=N, num_lattices=2, temperature=200.0,
        pressure=1.0 / AUP_TO_ATM,
        mc_max_trans=0.25 * ANG_TO_BOHR, mc_dv_max=0.2 * ANG_TO_BOHR,
        nbins=201, mu_min=-1200.0, mu_max=1200.0,
        mc_vol_prob=1.0 / N, mc_switch_prob=0.1,
        samplerun=False, eq_mc_cycles=1, list_update_int=5,
        mpi_sync_int=10, latt_sync_int=10_000,
        n_walkers=128, dtype="float32", fused="off",
        cell_pallas="apply", cell_trials=1,
    )
    if case >= 1:
        kw.update(mu_min=-150000.0, mu_max=150000.0)
    if case >= 2:
        kw.update(eq_mc_cycles=1_000_000)
    if case >= 3:
        kw.update(mc_vol_prob=1.0 / 768, eq_adjust_mc=True,
                  therm_walkers=8, mpi_sync_int=100_000)
    prm = RunParams(**kw)
    grid = build_bin_grid(prm.nbins, prm.mu_min, prm.mu_max,
                          dtype=jnp.float32)
    st, eaux, caux = init_cell_state(prm, MW, r0, H0, grid, cg)
    eng = CellEngine(prm, MW, grid, eaux, cg, caux)
    import time as _t
    n_calls = int(os.environ.get("PB_CALLS", "2"))
    s = st
    t0 = _t.time()
    for i in range(n_calls):
        s, _ = eng.run_cycles(s, 1)
        jax.block_until_ready(s.energy)
        if i % 25 == 0:
            import numpy as _np
            mu = _np.asarray(s.mu)
            print(f"  call {i} ok ({_t.time()-t0:.0f}s) mu: "
                  f"mean|mu|={_np.abs(mu).mean():.0f} "
                  f"min={mu.min():.0f} max={mu.max():.0f}", flush=True)
    print(f"case {case} OK  mu[:3] = "
          f"{[float(x) for x in s.mu[:3]]}", flush=True)
    os._exit(0)


def main():
    if len(sys.argv) > 1:
        run_case(int(sys.argv[1]))
        return
    for case, desc in CASES.items():
        t0 = time.time()
        try:
            res = subprocess.run(
                [sys.executable, os.path.abspath(__file__), str(case)],
                timeout=600, capture_output=True, text=True,
            )
            ok = res.returncode == 0
            tail = (res.stdout + res.stderr).strip().splitlines()
            tail = tail[-2:] if tail else []
        except subprocess.TimeoutExpired:
            ok, tail = False, ["TIMEOUT"]
        print(f"case {case} [{desc}]: "
              f"{'OK' if ok else 'CRASH/FAIL'} "
              f"({time.time() - t0:.0f}s) {tail}", flush=True)


if __name__ == "__main__":
    main()
