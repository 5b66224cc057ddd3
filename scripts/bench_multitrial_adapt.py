"""Multi-trial production tuning: adapt the anchored-cube width, then
measure accepted-moves/s vs cell_trials (VERDICT round-2 item 3).

For each T in MT_TRIALS (default "1,2,4,8"): run eq-style step-size
adaptation blocks (the mc_monitor_stats rule, mc_moves.F90:1729-1732:
max_trans *= acceptance/target per block) until the translation
acceptance settles at mc_target_ratio, then time a production block at
the adapted width and report trials/s AND accepted-moves/s.  The
round-2 gap this closes: the 3.2x trials/s win of the multi-trial
sub-step was benched at a FIXED step width where acceptance sat at
~11-13%, so accepted-moves/s only matched T=1 at T=16; with the width
adapted per T the accepted-rate comparison is the fair one.

Environment knobs: MT_NX/MT_NY/MT_M geometry (default 14/8/18 ->
N=8064), MT_WALKERS (128), MT_TRIALS ("1,2,4,8"), MT_PALLAS (apply),
MT_TARGET (0.5), MT_ADAPT_BLOCKS (8), MT_BLOCK (10 cycles),
MT_TIMED (5 cycles), MT_DISJOINT (1).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

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
from mc_water_ls_mw_tpu.mcmc.cellengine import CellEngine, init_cell_state
from mc_water_ls_mw_tpu.ops.cells import (
    build_grid,
    cap_for_positions,
    choose_grid_shape,
)
from mc_water_ls_mw_tpu.constants import ANG_TO_BOHR, AUP_TO_ATM, BOHR_TO_ANG


def main():
    nx = int(os.environ.get("MT_NX", "14"))
    ny = int(os.environ.get("MT_NY", "8"))
    m = int(os.environ.get("MT_M", "18"))
    W = int(os.environ.get("MT_WALKERS", "128"))
    trials_list = [int(t) for t in
                   os.environ.get("MT_TRIALS", "1,2,4,8").split(",")]
    target = float(os.environ.get("MT_TARGET", "0.5"))
    n_blocks = int(os.environ.get("MT_ADAPT_BLOCKS", "8"))
    block = int(os.environ.get("MT_BLOCK", "10"))
    timed = int(os.environ.get("MT_TIMED", "5"))
    pallas = os.environ.get("MT_PALLAS", "apply")
    disjoint = os.environ.get("MT_DISJOINT", "0") == "1"

    print("devices:", jax.devices())
    r0, H0 = stacking_switch_pair(nx, ny, m)
    N = r0.shape[1]
    mx, _ = correspondence_mismatch(r0, H0)
    shape = choose_grid_shape(H0, MW, mx, prefer_disjoint=disjoint)
    cap = cap_for_positions(r0, H0, shape)
    cg = build_grid(shape, cap, H0, MW, mx)
    print(f"N={N} coarse={shape} cap={cap} W={W} pallas={pallas}")

    rows = []
    for T in trials_list:
        prm = RunParams(
            nwater=N, num_lattices=2, temperature=200.0,
            pressure=1.0 / AUP_TO_ATM,
            mc_max_trans=0.25 * ANG_TO_BOHR,
            mc_dv_max=0.2 * ANG_TO_BOHR,
            nbins=201, mu_min=-1200.0, mu_max=1200.0,
            mc_vol_prob=1.0 / N, mc_switch_prob=0.1,
            samplerun=False, eq_mc_cycles=10 ** 9,  # stay "in eq"
            list_update_int=5, mpi_sync_int=10, latt_sync_int=10_000,
            n_walkers=W, dtype="float32", fused="off",
            cell_pallas=pallas, cell_trials=T,
            mc_target_ratio=target,
        )
        grid = build_bin_grid(prm.nbins, prm.mu_min, prm.mu_max,
                              dtype=jnp.float32)
        st, eaux, caux = init_cell_state(prm, MW, r0, H0, grid, cg)
        eng = CellEngine(prm, MW, grid, eaux, cg, caux)

        # ---- adaptation phase (mc_monitor_stats:1729-1732 rule)
        t0 = time.time()
        for b in range(n_blocks):
            att0 = np.asarray(st.att[0], dtype=np.float64)
            acc0 = np.asarray(st.acc[0], dtype=np.float64)
            st, _ = eng.run_cycles(st, block)
            jax.block_until_ready(st.energy)
            att1 = np.asarray(st.att[0], dtype=np.float64)
            acc1 = np.asarray(st.acc[0], dtype=np.float64)
            with np.errstate(invalid="ignore", divide="ignore"):
                ratio = np.nan_to_num(
                    (acc1 - acc0) / np.maximum(att1 - att0, 1.0),
                    nan=1.0,
                )
            mt = np.maximum(
                np.asarray(st.max_trans) * ratio / target, 0.1
            )
            st = st._replace(
                max_trans=jnp.asarray(mt, dtype=st.max_trans.dtype)
            )
            print(f"  T={T} block {b}: acc {ratio.mean()*100:6.2f}% "
                  f"max_trans {mt.mean()*BOHR_TO_ANG:6.3f} Ang")
        t_adapt = time.time() - t0

        # ---- timed production block at the adapted width
        st, _ = eng.run_cycles(st, timed)       # same-shape warm-up
        jax.block_until_ready(st.energy)
        att0 = float(np.asarray(st.att[0]).sum())
        acc0 = float(np.asarray(st.acc[0]).sum())
        t0 = time.time()
        st, _ = eng.run_cycles(st, timed)
        jax.block_until_ready(st.energy)
        dt = time.time() - t0
        att1 = float(np.asarray(st.att[0]).sum())
        acc1 = float(np.asarray(st.acc[0]).sum())
        trials_s = (att1 - att0) / dt
        accepted_s = (acc1 - acc0) / dt
        accpct = 100.0 * (acc1 - acc0) / max(att1 - att0, 1.0)
        mt_ang = float(np.asarray(st.max_trans).mean()) * BOHR_TO_ANG
        print(f"T={T}: adapted max_trans {mt_ang:.3f} Ang, "
              f"acc {accpct:.1f}%, {trials_s:,.0f} trials/s, "
              f"{accepted_s:,.0f} accepted-moves/s "
              f"(adapt {t_adapt:.0f}s)")
        rows.append(dict(T=T, max_trans_ang=mt_ang, acc_pct=accpct,
                         trials_per_s=trials_s,
                         accepted_per_s=accepted_s))

    import json

    print(json.dumps(rows))


if __name__ == "__main__":
    main()
