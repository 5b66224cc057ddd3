"""Fused Pallas sub-step kernel vs the XLA cell-engine path.

The kernel (ops/cell_pallas.py) must reproduce the XLA
mover_energies evaluation (ops/cell_energy.py) exactly: same pair +
three-body energies at both trial endpoints, same own-moment totals,
same per-candidate j-moment deltas - in fp64 interpret mode the only
difference is summation order (<= 1e-11 on Hartree-scale numbers).
A full sub-step driven through CellEngine with cell_pallas='on' must
produce the same accept decisions, positions and counters as the XLA
sub-step.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mc_water_ls_mw_tpu.models.stacking import (
    correspondence_mismatch,
    stacking_switch_pair,
)
from mc_water_ls_mw_tpu.models.sw import MW
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
from mc_water_ls_mw_tpu.ops.cell_energy import mover_energies
from mc_water_ls_mw_tpu.ops.cell_pallas import MoverEnergiesPallas
from mc_water_ls_mw_tpu.ops.cells import PK_ROWS
from mc_water_ls_mw_tpu.ops.dense import Moments


def _pack_lattice(st, cg, l):
    """Packed slab [nfine, PK_ROWS, cap, W] of lattice l (the
    CellEngine._pack layout) for direct kernel calls."""
    nfine, cap = cg.nfine, cg.cap
    W = st.r.shape[-1]
    rows = [np.asarray(f[l]).reshape(nfine, cap, W)
            for f in st.moments]
    rows += [np.asarray(st.r[l, a]).reshape(nfine, cap, W)
             for a in range(3)]
    rows.append(
        (np.asarray(st.slot2mol) >= 0)
        .astype(rows[0].dtype).reshape(nfine, cap, W)
    )
    return jnp.asarray(np.stack(rows, axis=1))


@pytest.fixture(scope="module")
def system():
    """Smallest switch pair the two-level grid supports."""
    r0, H0 = stacking_switch_pair(12, 7, 18)
    N = r0.shape[1]
    mx, _ = correspondence_mismatch(r0, H0)
    shape = choose_grid_shape(H0, MW, mx)
    cg = build_grid(
        shape, cap_for_positions(r0, H0, shape), H0, MW, mx
    )
    W = 2
    prm = RunParams(
        nwater=N, num_lattices=2, n_walkers=W, dtype="float64",
        temperature=200.0, mu_min=-500.0, mu_max=500.0,
        mc_always_switch=True, allow_switch=True,
        mc_vol_prob=0.0, allow_vol=False, eq_mc_cycles=0,
        list_update_int=100000, latt_sync_int=100000,
        mpi_sync_int=100000,
    )
    grid = build_bin_grid(prm.nbins, prm.mu_min, prm.mu_max,
                          dtype=jnp.float64)
    st, eaux, caux = init_cell_state(prm, MW, r0, H0, grid, cg)
    return prm, grid, st, eaux, caux, cg


@pytest.fixture(scope="module")
def system_unique():
    """Production-shaped grid (CF=27, disjoint same-colour stencils)
    - the geometry cell_pallas='apply' requires."""
    r0, H0 = stacking_switch_pair(14, 8, 18)
    N = r0.shape[1]
    mx, _ = correspondence_mismatch(r0, H0)
    shape = choose_grid_shape(H0, MW, mx)
    cg = build_grid(
        shape, cap_for_positions(r0, H0, shape), H0, MW, mx
    )
    W = 2
    prm = RunParams(
        nwater=N, num_lattices=2, n_walkers=W, dtype="float64",
        temperature=200.0, mu_min=-500.0, mu_max=500.0,
        mc_always_switch=True, allow_switch=True,
        mc_vol_prob=0.0, allow_vol=False, eq_mc_cycles=0,
        list_update_int=100000, latt_sync_int=100000,
        mpi_sync_int=100000,
    )
    grid = build_bin_grid(prm.nbins, prm.mu_min, prm.mu_max,
                          dtype=jnp.float64)
    st, eaux, caux = init_cell_state(prm, MW, r0, H0, grid, cg)
    return prm, grid, st, eaux, caux, cg


def test_kernel_matches_xla_mover_energies(system):
    prm, grid, st, eaux, caux, cg = system
    K, cap, W = cg.cells_per_color, cg.cap, prm.n_walkers
    rng = np.random.default_rng(0)

    col, b = 3, 1
    cells_c = np.asarray(cg.color_cells[col])
    fc = cg.block_cells[cells_c][:, b]
    cand = cg.full_cells[fc]
    off = cg.full_off[fc]

    s2m = np.asarray(st.slot2mol)
    occ = (s2m.reshape(cg.nfine, cap, W) >= 0).sum(axis=1)
    rank = np.zeros((K, W), dtype=np.int32)
    for k in range(K):
        for w in range(W):
            rank[k, w] = rng.integers(0, max(occ[fc[k], w], 1))
    mover_slot = fc[:, None] * cap + rank

    l = 0
    r_l = np.asarray(st.r[l])
    p_old = np.stack([
        r_l[a][mover_slot, np.arange(W)[None, :]] for a in range(3)
    ])
    p_new = p_old + rng.normal(scale=0.3, size=p_old.shape)

    mom_l = Moments(*(f[l] for f in st.moments))
    e_old_x, e_new_x, co, cn = mover_energies(
        st.r[l], mom_l, st.slot2mol >= 0, st.h[l],
        jnp.asarray(cand), jnp.asarray(off), cg.full_mask, cap,
        jnp.asarray(mover_slot), jnp.asarray(p_old),
        jnp.asarray(p_new), MW,
    )

    kern = MoverEnergiesPallas(MW, cg)
    e_old_p, e_new_p, own_p, d_p = kern(
        _pack_lattice(st, cg, l), st.h[l], cand, off, fc,
        jnp.asarray(rank), jnp.asarray(p_old), jnp.asarray(p_new),
    )

    np.testing.assert_allclose(
        np.asarray(e_old_p), np.asarray(e_old_x), atol=1e-11
    )
    np.testing.assert_allclose(
        np.asarray(e_new_p), np.asarray(e_new_x), atol=1e-11
    )
    CF = cand.shape[1]
    for a, b2 in zip(own_p, cn.own):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b2), atol=1e-11
        )
    for dp, do_, dn_ in zip(d_p, co.delta(), cn.delta()):
        ref = (dn_ - do_).reshape(K, CF, cap, W)
        np.testing.assert_allclose(
            np.asarray(dp), np.asarray(ref), atol=1e-11
        )


@pytest.mark.slow
def test_pallas_substep_matches_xla_substep(system):
    prm, grid, st, eaux, caux, cg = system
    W = prm.n_walkers
    out = []
    # 'apply' needs disjoint same-colour stencils, which this small
    # CF=75 grid does not have (engine raises; covered below) - the
    # apply equivalence runs on the production CF=27 grid in
    # test_apply_substep_matches_xla
    import dataclasses
    with pytest.raises(ValueError, match="disjoint"):
        CellEngine(
            dataclasses.replace(prm, cell_pallas="apply"),
            MW, grid, eaux, cg, caux,
        )
    for flag in ("off", "on"):
        prm_f = dataclasses.replace(prm, cell_pallas=flag)
        eng = CellEngine(prm_f, MW, grid, eaux, cg, caux)
        assert eng.use_cell_pallas == (flag != "off")
        assert eng.use_cell_apply == (flag == "apply")
        s = st._replace(cycle=jnp.asarray(1, jnp.int32))
        codes_k = jnp.zeros(eng.K, dtype=jnp.int32)    # all TRANS
        sw_ok = jnp.ones(W, dtype=bool)
        tpm0 = jnp.zeros((cg.nslot, W), dtype=jnp.int32)
        u = jax.vmap(
            lambda k: jax.random.uniform(
                jax.random.fold_in(k, 2), (eng.K, 7),
                dtype=s.r.dtype,
            ),
            out_axes=2,
        )(s.key)
        s2, tpm = jax.jit(
            lambda stt, e=eng: e._substep_canonical(
                stt, tpm0, e.fc_stack[5], e.cand_stack[5],
                e.off_stack[5], u, codes_k, sw_ok,
            )
        )(s)
        out.append((s2, tpm))
    (a, tpa) = out[0]
    for (b, tpb) in out[1:]:
        # identical RNG stream -> identical proposals; fp64 energies
        # agree to summation order, so accept decisions and therefore
        # discrete state must match exactly
        np.testing.assert_array_equal(
            np.asarray(a.acc), np.asarray(b.acc)
        )
        np.testing.assert_array_equal(
            np.asarray(a.att), np.asarray(b.att)
        )
        np.testing.assert_array_equal(
            np.asarray(a.ls), np.asarray(b.ls)
        )
        np.testing.assert_array_equal(np.asarray(tpa), np.asarray(tpb))
        np.testing.assert_array_equal(np.asarray(a.r), np.asarray(b.r))
        np.testing.assert_allclose(
            np.asarray(a.mu), np.asarray(b.mu), rtol=0, atol=1e-10
        )
        np.testing.assert_allclose(
            np.asarray(a.energy), np.asarray(b.energy),
            rtol=0, atol=1e-10
        )
        for fa, fb in zip(a.moments, b.moments):
            np.testing.assert_allclose(
                np.asarray(fa), np.asarray(fb), rtol=0, atol=1e-10
            )
        np.testing.assert_allclose(
            np.asarray(a.hist), np.asarray(b.hist), rtol=0, atol=0
        )


def test_kernel_lowers_for_tpu(system):
    """Cross-platform lowering gate: jax.export runs the Pallas ->
    Mosaic lowering rules (block-shape tiling constraints etc.)
    without a device, catching TPU-only rejections that interpret
    mode cannot see.  Production walker widths: 128 (one lane tile),
    64 (sub-tile) and 256 (two blocks)."""
    prm, grid, st, eaux, caux, cg = system
    K, CF, cap = cg.cells_per_color, cg.full_cells.shape[1], cg.cap
    f32 = jnp.float32
    # production TPU runs have x64 OFF (f32 ensemble mode); under the
    # suite's x64 every python-float literal becomes a weak-f64
    # constant, and Mosaic has no f64 casts at all
    import contextlib

    @contextlib.contextmanager
    def x64_off():
        jax.config.update("jax_enable_x64", False)
        try:
            yield
        finally:
            jax.config.update("jax_enable_x64", True)

    with x64_off():
        for W in (512, 128, 64):
            kern = MoverEnergiesPallas(MW, cg)
            kern.interpret = False
            args = (
                jnp.zeros((K, CF), jnp.int32),
                jnp.zeros((K,), jnp.int32),
                jnp.zeros((K, W), jnp.int32),
                jnp.zeros((K * CF, 3, W), f32),
                jnp.zeros((3, K, W), f32), jnp.zeros((3, K, W), f32),
                jnp.zeros((cg.nfine, PK_ROWS, cap, W), f32),
            )
            exp = jax.export.export(
                jax.jit(kern._invoke), platforms=["tpu"]
            )(*args)
            assert len(exp.mlir_module_serialized) > 0


@pytest.mark.slow
def test_apply_substep_matches_xla(system_unique):
    """cell_pallas='apply' (in-place aliased moment update) vs the
    XLA scatter path, on the production-shaped CF=27 grid whose
    same-colour stencils are disjoint."""
    prm, grid, st, eaux, caux, cg = system_unique
    W = prm.n_walkers
    import dataclasses

    out = []
    for flag in ("off", "apply"):
        prm_f = dataclasses.replace(prm, cell_pallas=flag)
        eng = CellEngine(prm_f, MW, grid, eaux, cg, caux)
        assert eng.use_cell_apply == (flag == "apply")
        assert eng.scatter_unique
        s = st._replace(cycle=jnp.asarray(1, jnp.int32))
        codes_k = jnp.zeros(eng.K, dtype=jnp.int32)
        sw_ok = jnp.ones(W, dtype=bool)
        tpm0 = jnp.zeros((cg.nslot, W), dtype=jnp.int32)
        u = jax.vmap(
            lambda k: jax.random.uniform(
                jax.random.fold_in(k, 2), (eng.K, 7),
                dtype=s.r.dtype,
            ),
            out_axes=2,
        )(s.key)
        s2, tpm = jax.jit(
            lambda stt, e=eng: e._substep_canonical(
                stt, tpm0, e.fc_stack[3], e.cand_stack[3],
                e.off_stack[3], u, codes_k, sw_ok,
            )
        )(s)
        out.append(s2)
    a, b = out
    assert int(a.acc[0].sum()) > 0
    np.testing.assert_array_equal(np.asarray(a.acc), np.asarray(b.acc))
    np.testing.assert_array_equal(np.asarray(a.r), np.asarray(b.r))
    np.testing.assert_allclose(
        np.asarray(a.energy), np.asarray(b.energy), rtol=0, atol=1e-10
    )
    for fa, fb in zip(a.moments, b.moments):
        np.testing.assert_allclose(
            np.asarray(fa), np.asarray(fb), rtol=0, atol=1e-10
        )


def test_apply_kernel_lowers_for_tpu(system_unique):
    """Mosaic lowering gate for the aliased apply kernel."""
    prm, grid, st, eaux, caux, cg = system_unique
    from mc_water_ls_mw_tpu.ops.cell_pallas import MoverApplyPallas

    K, CF, cap = cg.cells_per_color, cg.full_cells.shape[1], cg.cap
    f32 = jnp.float32
    import contextlib

    @contextlib.contextmanager
    def x64_off():
        jax.config.update("jax_enable_x64", False)
        try:
            yield
        finally:
            jax.config.update("jax_enable_x64", True)

    with x64_off():
        for W in (512, 128):
            kern = MoverApplyPallas(MW, cg)
            kern.interpret = False
            args = (
                jnp.zeros((K, CF), jnp.int32),
                jnp.zeros((K,), jnp.int32),
                jnp.zeros((K, W), jnp.int32),
                jnp.zeros((K, W), jnp.int32),
                jnp.zeros((K * CF, 3, W), f32),
                jnp.zeros((3, K, W), f32), jnp.zeros((3, K, W), f32),
                jnp.zeros((K, 10, W), f32),
                jnp.zeros((cg.nfine, PK_ROWS, cap, W), f32),
            )
            exp = jax.export.export(
                jax.jit(kern._invoke), platforms=["tpu"]
            )(*args)
            assert len(exp.mlir_module_serialized) > 0
