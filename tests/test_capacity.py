"""Slab-capacity overflow resilience (cell engine).

The round-2 weak spot: a multi-day run could die on an unlucky late
rebin with "increase cell_cap".  Now a CapacityOverflow is caught by
run_input_file, cell_cap is regrown, and the run RESUMES from the
last good checkpoint through io/checkpoint.migrate_cell_cap (the
audit runs before every checkpoint write, so no corrupt state is
ever persisted).  Reference standard being matched: the dual
alternating checkpoints that survive a crash mid-write
(mc_moves.F90:336-350, SURVEY.md §5.3).
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mc_water_ls_mw_tpu.models.sw import MW
from mc_water_ls_mw_tpu.models.stacking import (
    correspondence_mismatch,
    stacking_switch_pair,
)
from mc_water_ls_mw_tpu.mcmc.bins import build_bin_grid
from mc_water_ls_mw_tpu.mcmc.config import RunParams
from mc_water_ls_mw_tpu.mcmc.cellengine import (
    CellEngine,
    init_cell_state,
)
from mc_water_ls_mw_tpu.ops.cells import (
    build_grid,
    cap_for_positions,
    choose_grid_shape,
)
from mc_water_ls_mw_tpu.io import checkpoint as ckpt


def _mk(prm, cap_extra=0):
    r0, H0 = stacking_switch_pair(12, 7, 18)
    mismatch, _ = correspondence_mismatch(r0, H0)
    shape = choose_grid_shape(H0, MW, mismatch)
    cap = cap_for_positions(r0, H0, shape) + cap_extra
    cg = build_grid(shape, cap, H0, MW, mismatch)
    grid = build_bin_grid(prm.nbins, prm.mu_min, prm.mu_max,
                          dtype=jnp.float64)
    st, eaux, caux = init_cell_state(prm, MW, r0, H0, grid, cg)
    return grid, cg, st, eaux, caux


@pytest.mark.slow
def test_cap_migration_roundtrip(tmp_path):
    """A checkpoint written at capacity c restores into a c+3 layout
    via migrate_cell_cap with every physical quantity intact:
    per-molecule positions, energies, occupancy, WL state, and a
    clean incremental-energy audit on the migrated slabs."""
    prm = RunParams(
        nwater=6048, num_lattices=2, n_walkers=2, dtype="float64",
        temperature=200.0, mu_min=-500.0, mu_max=500.0,
    )
    grid, cg, st, eaux, caux = _mk(prm)

    w = ckpt.CheckpointWriter(str(tmp_path))
    w.write(st)

    grid2, cg2, st2_tpl, eaux2, caux2 = _mk(prm, cap_extra=3)
    assert cg2.cap == cg.cap + 3

    # without migration: refused as incompatible
    with pytest.raises(RuntimeError, match="incompatible"):
        ckpt.load_checkpoint(st2_tpl, str(tmp_path))

    loaded = ckpt.load_checkpoint(
        st2_tpl, str(tmp_path), cell_migrate=(cg2.nfine, cg2.cap)
    )
    assert loaded is not None
    mig, cycle, path = loaded
    assert "migrated" in path

    # canonical per-molecule positions survive the repack
    N, W = prm.nwater, prm.n_walkers
    iw = np.arange(W)[None, :]
    for l in range(2):
        r_old = np.asarray(st.r[l])        # [3, nslot_old, W]
        r_new = np.asarray(mig.r[l])
        sl_old = np.asarray(st.mol2slot)
        sl_new = np.asarray(mig.mol2slot)
        np.testing.assert_array_equal(
            r_old[:, sl_old, iw], r_new[:, sl_new, iw]
        )
    np.testing.assert_array_equal(
        np.asarray(st.energy), np.asarray(mig.energy)
    )
    np.testing.assert_array_equal(
        np.asarray(st.hist), np.asarray(mig.hist)
    )
    # occupancy: same molecules per fine cell, ranks still packed
    s2m = np.asarray(mig.slot2mol).reshape(cg2.nfine, cg2.cap, W)
    occ = (s2m >= 0).sum(axis=1)
    s2m_o = np.asarray(st.slot2mol).reshape(cg.nfine, cg.cap, W)
    np.testing.assert_array_equal(occ, (s2m_o >= 0).sum(axis=1))
    filled = s2m >= 0
    ranks_packed = np.all(
        filled.cumsum(axis=1) * filled
        == np.arange(1, cg2.cap + 1)[None, :, None] * filled
    )
    assert ranks_packed

    # the migrated state runs: one cycle + clean audit on the new cap
    eng2 = CellEngine(prm, MW, grid2, eaux2, cg2, caux2)
    s_run, _ = eng2.run_cycles(mig, 1)
    _, drift = eng2.audit_energy(s_run)
    assert float(jnp.max(jnp.abs(drift))) < 1e-9

    # shrink direction is refused
    grid0, cg0, st0_tpl, *_ = _mk(prm, cap_extra=0)
    w2 = ckpt.CheckpointWriter(str(tmp_path))
    w2.write(mig)          # capacity c+3 now on disk (slot 2)
    with pytest.raises(RuntimeError, match="incompatible"):
        ckpt.load_checkpoint(
            st0_tpl, str(tmp_path),
            cell_migrate=(cg0.nfine, cg0.cap),
        )


@pytest.mark.slow
def test_overflow_regrows_and_completes(tmp_path, examples_dir):
    """End-to-end: a run configured with a too-tight cell_cap
    overflows on a thermal rebin, regrows the capacity and COMPLETES
    instead of dying (run_input_file auto-regrow loop)."""
    import shutil

    from mc_water_ls_mw_tpu.app import run_input_file

    for f in (examples_dir / "single_box").iterdir():
        shutil.copy(f, tmp_path / f.name)
    cwd = os.getcwd()
    try:
        run_input_file(
            str(tmp_path / "ice.input"),
            overrides={
                "n_walkers": 2, "dtype": "float64",
                "num_lattices": 1, "largen": "on",
                "stack": (10, 6, 12),
                # tight capacity: barely fits the initial crystal
                # (max initial occupancy 9-10 over origins; auto cap
                # is 20), so thermal motion + origin redraws
                # overflow quickly
                "cell_cap": 10,
                "list_update_int": 2, "chkpt_dump_int": 2,
                "monitor_int": 10, "flat_chk_int": 10,
                "traj_output_int": 1000, "file_output_int": 10,
                "eq_mc_cycles": 1, "mpi_sync_int": 5,
            },
            max_cycles=30,
        )
    finally:
        os.chdir(cwd)
    log = (tmp_path / "mc.log").read_text()
    assert "regrowing cell_cap" in log
    therm = np.atleast_2d(np.loadtxt(tmp_path / "ice000_therm.dat"))
    assert therm[-1, 0] >= 30
