"""Offline TPU-lowering gates for the production compute paths.

jax.export cross-platform lowering runs the full StableHLO + Pallas
-> Mosaic lowering for platform 'tpu' WITHOUT a device, catching
TPU-only rejections (block-tiling rules, unsupported casts, Mosaic
layout limits) that interpret-mode tests cannot see.  The real
environment has a single shared remote chip that is sometimes
unavailable for hours, so these gates are what stands between an
edit and a broken on-chip benchmark.

x64 is forced OFF inside each gate: production TPU runs are f32, and
under the suite's x64 every python-float literal becomes a weak-f64
constant that Mosaic (no f64 support) cannot cast.
"""

import contextlib
import sys

import pytest
import jax

sys.path.insert(0, "/root/repo")


@contextlib.contextmanager
def _x64_off():
    jax.config.update("jax_enable_x64", False)
    try:
        yield
    finally:
        jax.config.update("jax_enable_x64", True)


def _export_cycles(eng, state, n=2):
    exp = jax.export.export(
        jax.jit(lambda s: eng._run_cycles(s, n)[0]), platforms=["tpu"]
    )(state)
    assert len(exp.mlir_module_serialized) > 0


def test_n216_headline_path_lowers_for_tpu():
    """The exact program bench.py compiles on the chip: N=216 fused
    whole-cycle Pallas kernel + reference-lattice neighbour tables at
    production sync cadence."""
    import __graft_entry__ as g

    with _x64_off():
        prm, eng, state = g._setup(
            n_walkers=128, nwater=216, mpi_sync_int=250, fused="on"
        )
        assert eng.use_fused
        assert eng.tbl is not None          # candidate-reduction path
        eng.fused_cycle.interpret = False
        eng.pallas_full_energy.interpret = False
        _export_cycles(eng, state)


def test_n48_sample_path_lowers_for_tpu():
    """The packaged-example production path (N=48, fused kernel)."""
    import __graft_entry__ as g

    with _x64_off():
        prm, eng, state = g._setup(n_walkers=128, fused="on")
        assert eng.use_fused
        eng.fused_cycle.interpret = False
        eng.pallas_full_energy.interpret = False
        _export_cycles(eng, state)


@pytest.mark.slow
def test_cell_engine_cycle_with_kernel_lowers_for_tpu():
    """One full large-N cell-engine cycle with the fused sub-step
    kernel enabled (the bench_largen configuration)."""
    import numpy as np
    import jax.numpy as jnp

    from mc_water_ls_mw_tpu.constants import ANG_TO_BOHR, AUP_TO_ATM
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

    with _x64_off():
        r0, H0 = stacking_switch_pair(12, 7, 18)
        N = r0.shape[1]
        mx, _ = correspondence_mismatch(r0, H0)
        shape = choose_grid_shape(H0, MW, mx)
        cg = build_grid(
            shape, cap_for_positions(r0, H0, shape), H0, MW, mx
        )
        prm = RunParams(
            nwater=N, num_lattices=2, n_walkers=128, dtype="float32",
            temperature=200.0, pressure=1.0 / AUP_TO_ATM,
            mc_max_trans=0.25 * ANG_TO_BOHR,
            mc_dv_max=0.2 * ANG_TO_BOHR,
            nbins=21, mu_min=-400.0, mu_max=400.0,
            mc_vol_prob=1.0 / N, eq_mc_cycles=1, list_update_int=5,
            mpi_sync_int=10, cell_pallas="on", fused="off",
        )
        grid = build_bin_grid(prm.nbins, prm.mu_min, prm.mu_max,
                              dtype=jnp.float32)
        st, eaux, caux = init_cell_state(prm, MW, r0, H0, grid, cg)
        eng = CellEngine(prm, MW, grid, eaux, cg, caux)
        assert eng.use_cell_pallas
        eng.mover_kernel.interpret = False
        _export_cycles(eng, st, n=1)
