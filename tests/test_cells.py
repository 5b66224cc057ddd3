"""Tests for the large-N subsystem: stacking builder, cell grid,
slab energy kernels (models/stacking.py, ops/cells.py,
ops/cell_energy.py).

Oracles: the dense moment-tensor path (ops/dense.py), itself pinned
against the pure-numpy oracle and the reference's published physics
(tests/test_dense.py, VALIDATION.md (a))."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mc_water_ls_mw_tpu.models.sw import MW
from mc_water_ls_mw_tpu.models.stacking import (
    correspondence_mismatch,
    relabel_for_correspondence,
    stacking_cell,
    stacking_switch_pair,
)
from mc_water_ls_mw_tpu.models.lattices import MW_BOND_LENGTH
from mc_water_ls_mw_tpu.ops.dense import (
    full_energy_batch,
    full_energy_dense,
    local_energies_batch,
    reduced_shift_set,
)
from mc_water_ls_mw_tpu.ops.cells import (
    bin_molecules,
    build_grid,
    cell_of_frac,
    choose_grid_shape,
    gather_from_slab,
    perp_widths,
    scatter_to_slab,
)
from mc_water_ls_mw_tpu.ops.cell_energy import (
    mover_energies,
    nb_slot_tables,
    slab_full_energy,
)
from mc_water_ls_mw_tpu.ops.geometry import recip_matrix

EV = 27.211386245988
IDEAL_E_PER_N = -0.536761  # eV; VALIDATION.md (a)


# ----------------------------------------------------------------------
# stacking builder
# ----------------------------------------------------------------------

class TestStacking:
    @pytest.mark.parametrize("seq,nx,ny", [
        ("AB" * 3, 3, 2),        # Ih
        ("ABC" * 2, 3, 2),       # Ic
        ("ABAC" * 3, 3, 2),      # 4H polytype
    ])
    def test_polytype_cohesive_energy(self, seq, nx, ny):
        r, H = stacking_cell(seq, nx, ny)
        sh = reduced_shift_set(H, MW)
        e, _ = full_energy_dense(
            jnp.asarray(r), jnp.asarray(H), jnp.asarray(sh), MW, True
        )
        assert float(e) / len(r) * EV == pytest.approx(
            IDEAL_E_PER_N, abs=1e-5
        )

    def test_invalid_sequences_rejected(self):
        with pytest.raises(ValueError):
            stacking_cell("AA", 2, 2)
        with pytest.raises(ValueError):
            stacking_cell("ABA", 2, 2)  # cyclic A..A clash
        with pytest.raises(ValueError):
            stacking_cell("ABX", 2, 2)

    def test_switch_pair_shares_box_and_bounds_mismatch(self):
        r0, H0 = stacking_switch_pair(3, 2, 6)
        assert np.allclose(H0[0], H0[1])
        mx, mean = correspondence_mismatch(r0, H0)
        a = MW_BOND_LENGTH * np.sqrt(8.0 / 3.0)
        assert mx <= a / np.sqrt(3.0) + 1e-9
        assert 0.0 < mean <= mx
        # both members are valid ice (ideal cohesive energy)
        for L in range(2):
            sh = reduced_shift_set(H0[L], MW)
            e, _ = full_energy_dense(
                jnp.asarray(r0[L]), jnp.asarray(H0[L]),
                jnp.asarray(sh), MW, True,
            )
            assert float(e) / r0.shape[1] * EV == pytest.approx(
                IDEAL_E_PER_N, abs=1e-5
            )

    def test_relabel_reduces_packaged_pair_mismatch(self, examples_dir):
        from mc_water_ls_mw_tpu.io.xmol import read_lattices

        r0, H0 = read_lattices(str(examples_dir / "ice1_sample"), 2)
        before, _ = correspondence_mismatch(r0, H0)
        r1, perm = relabel_for_correspondence(r0, H0)
        after, _ = correspondence_mismatch(r1, H0)
        assert sorted(perm) == list(range(r0.shape[1]))
        assert after < 0.7 * before
        # relabeling must not change the lattice-2 energy
        sh = reduced_shift_set(H0[1], MW)
        e_a, _ = full_energy_dense(
            jnp.asarray(r0[1]), jnp.asarray(H0[1]), jnp.asarray(sh),
            MW, True,
        )
        e_b, _ = full_energy_dense(
            jnp.asarray(r1[1]), jnp.asarray(H0[1]), jnp.asarray(sh),
            MW, True,
        )
        assert float(e_a) == pytest.approx(float(e_b), abs=1e-10)


# ----------------------------------------------------------------------
# cell grid
# ----------------------------------------------------------------------

class TestGrid:
    def test_neighbour_reciprocity_and_distinctness(self):
        g = build_grid((4, 4, 6), cap=8)
        nb, off = g.nb_cell, g.nb_off
        for c in [0, 5, g.ncell - 1]:
            assert len(set(nb[c])) == 27
            for k in range(27):
                d, o = nb[c, k], off[c, k]
                back = [
                    k2 for k2 in range(27)
                    if nb[d, k2] == c and np.array_equal(off[d, k2], -o)
                ]
                assert len(back) == 1

    def test_same_color_cells_not_adjacent(self):
        g = build_grid((4, 4, 4), cap=4)
        for col in range(8):
            cells = set(g.color_cells[col].tolist())
            for c in g.color_cells[col]:
                # 27-neighbourhood contains no other same-colour cell
                others = set(g.nb_cell[c].tolist()) & cells
                assert others == {int(c)}

    def test_grid_shape_bounds(self):
        r0, H0 = stacking_switch_pair(3, 2, 6)  # too small
        mx, _ = correspondence_mismatch(r0, H0)
        with pytest.raises(ValueError):
            choose_grid_shape(H0, MW, mx)
        r, H = stacking_cell("AB" * 6, 10, 6)
        n = choose_grid_shape([H], MW, 0.0)
        assert all(na >= 4 and na % 2 == 0 for na in n)
        side = min(perp_widths(H) / np.asarray(n))
        assert side >= 2.0 * MW.rc

    def test_binning_roundtrip(self):
        g = build_grid((4, 4, 6), cap=24)
        key = jax.random.PRNGKey(0)
        N, W = 700, 3
        f = jax.random.uniform(key, (3, N, W), dtype=jnp.float64)
        cid = cell_of_frac(g, f, jnp.asarray([0.3, 0.1, 0.9]))
        slot, max_occ = bin_molecules(g, cid)
        assert int(jnp.max(max_occ)) <= g.cap
        assert jnp.all(slot // g.cap == cid)
        for w in range(W):
            assert len(set(np.asarray(slot[:, w]))) == N
        vals = jax.random.normal(key, (2, 3, N, W))
        slab = scatter_to_slab(vals, slot, g.nslot)
        assert jnp.allclose(gather_from_slab(slab, slot), vals)


# ----------------------------------------------------------------------
# slab energy kernels vs the dense oracle
# ----------------------------------------------------------------------

@pytest.fixture(scope="module")
def slab_system():
    r, H = stacking_cell("AB" * 6, 10, 6)
    N = len(r)
    n = choose_grid_shape([H], MW, 0.0)
    grid = build_grid(n, 64)
    W = 2
    key = jax.random.PRNGKey(1)
    rx = jnp.transpose(
        jnp.asarray(r)[None].repeat(W, 0)
        + 0.15 * jax.random.normal(key, (W, N, 3)),
        (2, 1, 0),
    )
    Hw = jnp.asarray(H)[:, :, None].repeat(W, 2)
    rec = recip_matrix(Hw)
    f = jnp.einsum("baw,bnw->anw", rec, rx) * (0.5 / jnp.pi)
    f = f - jnp.floor(f)
    rx = jnp.einsum("abw,bnw->anw", Hw, f)
    cid = cell_of_frac(grid, f, jnp.zeros(3))
    slot, max_occ = bin_molecules(grid, cid)
    assert int(jnp.max(max_occ)) <= grid.cap
    slab_r = scatter_to_slab(rx, slot, grid.nslot)
    valid = scatter_to_slab(
        jnp.ones((N, W), dtype=bool), slot, grid.nslot
    )
    return dict(r=rx, H=Hw, N=N, W=W, grid=grid, slot=slot,
                slab_r=slab_r, valid=valid,
                shifts=reduced_shift_set(np.asarray(Hw[..., 0]), MW))


def _slab_take(arr, idx):
    return jax.vmap(lambda a, i: a[i], in_axes=(1, 1), out_axes=1)(
        arr, idx
    )


class TestSlabEnergy:
    def test_full_energy_matches_dense(self, slab_system):
        s = slab_system
        e_ref, mom_ref = full_energy_batch(
            s["r"], s["H"], s["shifts"], MW, True
        )
        e_slab, mom_slab = slab_full_energy(
            s["slab_r"], s["valid"], s["H"], s["grid"], MW,
            cell_chunk=8,
        )
        np.testing.assert_allclose(
            np.asarray(e_slab), np.asarray(e_ref), rtol=0, atol=1e-9
        )
        for ms, mr in zip(mom_slab, mom_ref):
            np.testing.assert_allclose(
                np.asarray(gather_from_slab(ms, s["slot"])),
                np.asarray(mr), rtol=0, atol=1e-10,
            )

    def test_mover_energies_match_dense_local(self, slab_system):
        s = slab_system
        grid = s["grid"]
        e_ref, mom_ref = full_energy_batch(
            s["r"], s["H"], s["shifts"], MW, True
        )
        _, mom_slab = slab_full_energy(
            s["slab_r"], s["valid"], s["H"], grid, MW, cell_chunk=8
        )
        cells0 = grid.color_cells[3]
        nb_slots, nb_off = nb_slot_tables(grid, cells0)
        occ = s["valid"].reshape(grid.ncell, grid.cap, s["W"])
        sel = jnp.argmax(occ[cells0], axis=1)
        mover_slot = (
            jnp.asarray(cells0)[:, None] * grid.cap + sel
        )
        assert bool(jnp.all(
            jnp.take_along_axis(occ[cells0], sel[:, None, :], axis=1)
        ))
        p_old = jnp.stack(
            [_slab_take(s["slab_r"][a], mover_slot) for a in range(3)]
        )
        p_new = p_old + 0.3 * jax.random.normal(
            jax.random.PRNGKey(7), p_old.shape
        )
        e_old_s, e_new_s, _, _ = mover_energies(
            s["slab_r"], mom_slab, s["valid"], s["H"], nb_slots,
            nb_off, mover_slot, p_old, p_new, MW,
        )
        mol_of = scatter_to_slab(
            jnp.arange(s["N"], dtype=jnp.int32)[:, None]
            .repeat(s["W"], 1),
            s["slot"], grid.nslot,
        )
        mover_mol = _slab_take(mol_of, mover_slot)
        for k in range(len(cells0)):
            e_old_d, e_new_d, _ = local_energies_batch(
                s["r"], s["H"], mover_mol[k], p_new[:, k, :],
                mom_ref, s["shifts"], MW, True,
            )
            np.testing.assert_allclose(
                np.asarray(e_old_s[k]), np.asarray(e_old_d), atol=1e-9
            )
            np.testing.assert_allclose(
                np.asarray(e_new_s[k]), np.asarray(e_new_d), atol=1e-9
            )
