"""A/B validation of the dd window-seeding deviation (dd_seeding).

The engine's dd equilibration deviates from the reference in three
coupled ways (engine._eta / _dd_track_window, state.init_state
warm-start): pre-window walkers sample the wall-less GLOBAL weight
curve instead of no bias (eta_weight:913), in_window is non-sticky
during equilibration instead of reach-once (mc_cycle:181-210), and a
warm-started eta is kept globally per master row instead of masked to
each window (mc_init:808-814).  ``dd_seeding=False`` restores the
reference semantics exactly; this test pins, with data, that the two
settings produce statistically indistinguishable RESULTS (VERDICT
round-2 item 5, the same standard test_volume_ab applied to the
volume-hoisting deviation):

* sample phase (where the warm-start masking and seeding actually
  differ): ice1_sample_dd from the packaged CONVERGED weights, 3
  seeds per mode, delta-G from the stitched unbiased histogram -
  modes must agree within combined seed-to-seed scatter;
* generation phase (cold start - where only the eq-window tracking
  differs): short WL refinement, both modes' stitched weight curves
  must agree to WL-noise level.

Measured values are printed by each test run and recorded in
VALIDATION.md section f3.
"""

import os

import numpy as np
import pytest

from mc_water_ls_mw_tpu.app import run_input_file


def _run_dd(tmp_path, examples_dir, name, seed, seeding, cycles,
            overrides=None):
    import shutil

    d = tmp_path / f"{name}_{seeding}_{seed}"
    d.mkdir()
    for f in (examples_dir / name).iterdir():
        shutil.copy(f, d / f.name)
    ovr = {
        # 28 walkers: NOT divisible by the 8 virtual devices, so the
        # run stays unsharded (GSPMD overhead at 4 walkers/device
        # dominates CPU wall time; mesh correctness is pinned by
        # test_mesh / test_mesh_soak, not here).  TWO windows (split
        # at mu=0): walkers drift into their half within the short
        # test equilibration under BOTH eq semantics - wider window
        # counts need the production-scale equilibration budget the
        # N=216 dd run provides (runs/n216_wl_dd, 8 windows)
        "n_walkers": 28, "n_windows": 2, "dtype": "float64",
        "dd_seeding": seeding, "seed": seed,
        "eq_mc_cycles": 300, "mpi_sync_int": 10,
        "monitor_int": cycles, "flat_chk_int": 200,
        "deltaG_int": cycles, "chkpt_dump_int": 10 * cycles,
        "file_output_int": 200, "traj_output_int": 10 * cycles,
    }
    ovr.update(overrides or {})
    cwd = os.getcwd()
    try:
        run_input_file(str(d / "ice.input"), overrides=ovr,
                       max_cycles=cycles)
    finally:
        os.chdir(cwd)
    return d


def _deltag_kt(uhist_path):
    """ln(p(mu<0) / p(mu>0)) from a stitched unbiased histogram
    (mc_compute_deltaG_from_hist integration convention,
    mc_moves.F90:2588-2615)."""
    dat = np.loadtxt(uhist_path)
    mu, h = dat[:, 0], dat[:, 1]
    lo = h[mu < 0.0].sum()
    hi = h[mu > 0.0].sum()
    assert lo > 0 and hi > 0
    return float(np.log(lo / hi))


@pytest.mark.slow
def test_window_seeding_ab_sample(tmp_path, examples_dir):
    """Sample phase from converged weights: delta-G agrees between
    seeding and reference semantics within combined scatter."""
    seeds = (11, 22, 33)
    cycles = 1500
    dg = {}
    for seeding in (True, False):
        vals = []
        for s in seeds:
            d = _run_dd(tmp_path, examples_dir, "ice1_sample_dd",
                        s, seeding, cycles)
            vals.append(_deltag_kt(d / "unbiased_histogram.dat"))
        dg[seeding] = np.asarray(vals)
    mA, mB = dg[True].mean(), dg[False].mean()
    sA = dg[True].std(ddof=1) / np.sqrt(len(seeds))
    sB = dg[False].std(ddof=1) / np.sqrt(len(seeds))
    diff, err = abs(mA - mB), float(np.hypot(sA, sB))
    msg = (f"deltaG seeding {mA:.4f}+-{sA:.4f} kT vs reference "
           f"{mB:.4f}+-{sB:.4f} kT -> diff {diff:.4f}+-{err:.4f}")
    print(msg)
    # 4-sigma + a small absolute floor against lucky tiny scatter
    assert diff <= 4.0 * err + 0.05, msg


@pytest.mark.slow
def test_window_seeding_ab_generation(tmp_path, examples_dir):
    """Cold-start WL generation: stitched weight curves of the two
    eq semantics agree to the in-mode seed-to-seed WL-noise level."""
    from mc_water_ls_mw_tpu.io.writers import read_eta_weights

    cycles = 1000
    curves = {}
    for seeding, seed in ((True, 1), (True, 2), (False, 1)):
        d = _run_dd(tmp_path, examples_dir, "ice1_gen_weights_dd",
                    seed, seeding, cycles)
        _, w = read_eta_weights(str(d / "eta_weights.dat"))
        curves[(seeding, seed)] = np.asarray(w, dtype=np.float64)

    def spread(a, b):
        # weight curves are defined up to a constant: compare after
        # removing the mean offset
        d = a - b
        return float(np.abs(d - d.mean()).max())

    noise = spread(curves[(True, 1)], curves[(True, 2)])
    cross = spread(curves[(True, 1)], curves[(False, 1)])
    cross2 = spread(curves[(True, 2)], curves[(False, 1)])
    msg = (f"in-mode WL noise {noise:.3f} kT; cross-mode "
           f"{cross:.3f} / {cross2:.3f} kT")
    print(msg)
    assert min(cross, cross2) <= 3.0 * noise + 0.5, msg
