"""A/B test of the engine's hoisted volume-move scheduling.

The reference draws the move type before EVERY trial, so volume moves
interleave with translations inside a cycle (mc_cycle,
mc_moves.F90:224-241).  The engine hoists all of a cycle's scheduled
volume moves to a once-per-cycle block (Engine._scheduled_volume_moves)
and argues stationarity is unchanged: both schedules compose the same
reversible kernels, each satisfying detailed balance w.r.t. the same
NPT distribution, in a state-independent order.

This test pins that argument with data (VERDICT round-1, weak #6):
a single-lattice N=48 NPT system is sampled both ways -

* engine: hoisted scheduling, 32 independent vmapped walkers, fp64;
* oracle: tests/oracle.NPTChain1L - an independent numpy chain with
  the reference's per-move draw, local-energy translations
  (cross-checked against np_full_energy) and full-recompute volume
  moves.

Equilibrium <E> and <V> and the acceptance rates must agree within
combined statistical error.  Single-lattice NPT is the sharpest
venue: the stationary distribution is pure Boltzmann (no Wang-Landau
coupling), so any scheduling bias would show directly.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from mc_water_ls_mw_tpu.constants import ANG_TO_BOHR, AUP_TO_ATM
from mc_water_ls_mw_tpu.models.sw import MW
from mc_water_ls_mw_tpu.mcmc.bins import build_bin_grid
from mc_water_ls_mw_tpu.mcmc.config import RunParams
from mc_water_ls_mw_tpu.mcmc.engine import Engine
from mc_water_ls_mw_tpu.mcmc.state import init_state
from mc_water_ls_mw_tpu.io.xmol import read_lattices

from .oracle import NPTChain1L, TRANS, VOL

T_K = 220.0
MAX_TRANS = 0.8 * ANG_TO_BOHR
DV_MAX = 0.7 * ANG_TO_BOHR
VOL_PROB = 1.0 / 48
BURN = 300
CYCLES = 1200


@pytest.mark.slow
def test_hoisted_vs_per_move_volume_scheduling(examples_dir):
    r0, H0 = read_lattices(examples_dir / "single_box", 1, 48)
    beta = None

    # ---- engine side: hoisted scheduling, 32 walkers ----------------
    prm = RunParams(
        nwater=48, num_lattices=1, temperature=T_K,
        pressure=1.0 / AUP_TO_ATM,
        mc_max_trans=MAX_TRANS, mc_dv_max=DV_MAX,
        allow_switch=False, mc_always_switch=False, mc_switch_prob=0.0,
        mc_vol_prob=VOL_PROB, samplerun=False,
        eq_mc_cycles=0, eq_adjust_mc=False,
        list_update_int=10, n_walkers=32, dtype="float64",
    )
    beta = prm.beta
    grid = build_bin_grid(prm.nbins, prm.mu_min, prm.mu_max)
    state, aux = init_state(prm, MW, r0, H0, grid)
    eng = Engine(prm, MW, grid, aux)

    state, _ = eng.run_cycles(state, BURN)
    att0 = np.asarray(state.att.sum(1), dtype=np.float64)
    acc0 = np.asarray(state.acc.sum(1), dtype=np.float64)
    e_chunks, v_chunks = [], []
    chunk = 25
    for _ in range(CYCLES // chunk):
        state, _ = eng.run_cycles(state, chunk)
        e_chunks.append(np.asarray(state.energy[0]))     # [W]
        v_chunks.append(np.asarray(state.volume[0]))
    att1 = np.asarray(state.att.sum(1), dtype=np.float64)
    acc1 = np.asarray(state.acc.sum(1), dtype=np.float64)
    _, drift = eng.audit_energy(state)
    assert float(jnp.abs(drift).max()) < 1e-10

    e_w = np.stack(e_chunks).mean(axis=0)                # [W] per-walker
    v_w = np.stack(v_chunks).mean(axis=0)
    W = len(e_w)
    eng_E, eng_E_se = e_w.mean(), e_w.std(ddof=1) / np.sqrt(W)
    eng_V, eng_V_se = v_w.mean(), v_w.std(ddof=1) / np.sqrt(W)
    eng_acc = (acc1 - acc0) / np.maximum(att1 - att0, 1.0)

    # ---- oracle side: reference per-move draw ------------------------
    ch = NPTChain1L(
        np.asarray(r0[0]), np.asarray(H0[0]), MW,
        beta=beta, pressure=prm.pressure,
        max_trans=MAX_TRANS, dv_max=DV_MAX, vol_prob=VOL_PROB,
        seed=20260817,
    )
    ch.run(BURN)
    ch.att[:] = 0
    ch.acc[:] = 0
    Es, Vs = ch.run(CYCLES)
    nb = 12
    eb = Es.reshape(nb, -1).mean(axis=1)
    vb = Vs.reshape(nb, -1).mean(axis=1)
    orc_E, orc_E_se = eb.mean(), eb.std(ddof=1) / np.sqrt(nb)
    orc_V, orc_V_se = vb.mean(), vb.std(ddof=1) / np.sqrt(nb)
    orc_acc = ch.acc / np.maximum(ch.att, 1)

    # ---- compare ------------------------------------------------------
    dE = abs(eng_E - orc_E)
    sE = np.hypot(eng_E_se, orc_E_se)
    dV = abs(eng_V - orc_V)
    sV = np.hypot(eng_V_se, orc_V_se)
    msg = (
        f"<E>: engine {eng_E:.6f}+-{eng_E_se:.6f} "
        f"oracle {orc_E:.6f}+-{orc_E_se:.6f} Ha | "
        f"<V>: engine {eng_V:.3f}+-{eng_V_se:.3f} "
        f"oracle {orc_V:.3f}+-{orc_V_se:.3f} Bohr^3 | "
        f"acc trans {eng_acc[TRANS]:.4f}/{orc_acc[TRANS]:.4f} "
        f"vol {eng_acc[VOL]:.4f}/{orc_acc[VOL]:.4f}"
    )
    print(msg)
    assert dE < 4.0 * sE, msg
    assert dV < 4.0 * sV, msg
    # acceptance rates: binomial-scale tolerance with a generous
    # autocorrelation factor
    n_tr = max((att1 - att0)[0], ch.att[TRANS])
    se_tr = np.sqrt(orc_acc[TRANS] * (1 - orc_acc[TRANS]) / n_tr)
    assert abs(eng_acc[TRANS] - orc_acc[TRANS]) < max(10 * se_tr, 0.02), msg
    assert abs(eng_acc[VOL] - orc_acc[VOL]) < 0.1, msg
