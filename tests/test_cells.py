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

def _demo_grid(n=(4, 4, 6), cap=8, side=30.0, mismatch=0.0):
    H = np.diag([n[0] * side, n[1] * side, n[2] * side])
    return build_grid(n, cap, [H], MW, mismatch), H


class TestGrid:
    def test_block_partition_and_cand_superset(self):
        g, _ = _demo_grid()
        # every fine cell appears in exactly one coarse block
        flat = np.sort(g.block_cells.reshape(-1))
        assert np.array_equal(flat, np.arange(g.nfine))
        # a coarse cell's candidate list contains its own block
        for c in [0, 5, g.ncoarse - 1]:
            cand = set(g.cand_cells[c][g.cand_mask].tolist())
            assert set(g.block_cells[c].tolist()) <= cand

    def test_coverage_tables_complete(self):
        # every fine cell NOT in the candidate list of a coarse cell
        # must have a guard-deflated per-axis gap exceeding r_cov on
        # SOME axis (the max-norm criterion is a distance lower bound
        # for arbitrary - including sheared - admissible boxes); the
        # Euclidean distance is then also > r_cov for the initial box
        from mc_water_ls_mw_tpu.ops.cells import coverage_radius

        g, H = _demo_grid(mismatch=1.5)
        r_cov = coverage_radius(MW, 1.5)
        nf = np.asarray(g.nf)
        w_f = perp_widths(H) / nf / g.guard
        m = g.m
        for c in [0, g.ncoarse - 1]:
            cc = np.array(np.unravel_index(c, g.n)) * m
            cand = set(g.cand_cells[c][g.cand_mask].tolist())
            for fid in range(g.nfine):
                fc = np.array(np.unravel_index(fid, tuple(nf)))
                # periodic per-axis gap between fine cube [fc, fc+1)
                # and coarse cube [cc, cc+m)
                gaps = np.zeros(3)
                for a in range(3):
                    best = np.inf
                    for wrap in (-nf[a], 0, nf[a]):
                        x = fc[a] + wrap
                        gap = max(0, x - (cc[a] + m), cc[a] - (x + 1))
                        best = min(best, gap)
                    gaps[a] = best * w_f[a]
                if fid not in cand:
                    assert gaps.max() > r_cov
                    assert np.sqrt((gaps ** 2).sum()) > r_cov

    def test_same_color_cells_not_adjacent(self):
        g, _ = _demo_grid(n=(4, 4, 4), cap=4)
        n = np.asarray(g.n)
        for col in range(8):
            coords = np.stack(np.unravel_index(
                g.color_cells[col], tuple(g.n)
            ), axis=1)
            for i in range(len(coords)):
                for j in range(i + 1, len(coords)):
                    d = np.abs(coords[i] - coords[j])
                    d = np.minimum(d, n - d)
                    assert d.max() >= 2   # never adjacent

    def test_same_color_block_stencils_disjoint(self):
        """Unique-index scatter eligibility (the block-scheduled
        engine's scatter_unique check, cellengine.CellEngine.__init__):
        with reach-1 stencils (CF = 27) the K movers' coverage
        stencils of every (colour, fine-block) entry are pairwise
        disjoint; geometries whose thin fine cells force reach-2
        stencils (CF > 27) overlap, and the engine must detect that
        and fall back to duplicate-safe scatters."""
        from mc_water_ls_mw_tpu.ops.cells import build_grid

        r, H = stacking_cell("AB" * 6, 10, 6)

        def tables_unique(g):
            m3 = g.m ** 3
            for col in range(8):
                cells_c = np.asarray(g.color_cells[col])
                for b in range(m3):
                    fc = g.block_cells[cells_c][:, b]
                    cand = g.full_cells[fc]          # [K, CF]
                    if len(np.unique(cand)) != cand.size:
                        return False
            return True

        # choose_grid_shape geometry (production path): reach-1
        # stencils, provably disjoint
        n_auto = choose_grid_shape([H], MW, 0.0)
        g = build_grid(n_auto, 4, [H], MW, 0.0)
        assert g.full_cells.shape[1] == 27
        assert tables_unique(g)

        # oversubdivided axis (thin fine cells): reach-2 stencils
        # overlap and MUST be detected
        n_thin = (n_auto[0], n_auto[1], 2 * n_auto[2])
        g2 = build_grid(n_thin, 4, [H], MW, 0.0)
        assert g2.full_cells.shape[1] > 27
        assert not tables_unique(g2)

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
        g, _ = _demo_grid(n=(4, 4, 6), cap=16)
        key = jax.random.PRNGKey(0)
        N, W = 700, 3
        f = jax.random.uniform(key, (3, N, W), dtype=jnp.float64)
        cid = cell_of_frac(
            g, f, jnp.asarray([0.3, 0.1, 0.9]), level="fine"
        )
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
    grid = build_grid(n, 16, [H], MW, 0.0)
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
    cid = cell_of_frac(grid, f, jnp.zeros(3), level="fine")
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
            s["slab_r"], s["valid"], s["H"], grid, MW
        )
        cells0 = grid.color_cells[3]
        cap = grid.cap
        m3 = grid.m ** 3
        blocks = grid.block_cells[cells0]           # [K, m3]
        # first occupied slot within each coarse cell's fine blocks
        occ_f = s["valid"].reshape(grid.nfine, cap, s["W"])
        occ_b = jnp.asarray(occ_f)[jnp.asarray(blocks)] \
            .reshape(len(cells0), m3 * cap, s["W"])
        sel = jnp.argmax(occ_b, axis=1)
        assert bool(jnp.all(
            jnp.take_along_axis(occ_b, sel[:, None, :], axis=1)
        ))
        blk = jnp.asarray(blocks)
        mover_fc = jnp.take_along_axis(
            jnp.broadcast_to(
                blk[:, :, None], (len(cells0), m3, s["W"])
            ),
            (sel // cap)[:, None, :], axis=1,
        )[:, 0, :]
        mover_slot = mover_fc * cap + sel % cap
        p_old = jnp.stack(
            [_slab_take(s["slab_r"][a], mover_slot) for a in range(3)]
        )
        p_new = p_old + 0.3 * jax.random.normal(
            jax.random.PRNGKey(7), p_old.shape
        )
        e_old_s, e_new_s, _, _ = mover_energies(
            s["slab_r"], mom_slab, s["valid"], s["H"],
            grid.cand_cells[cells0], grid.cand_off[cells0],
            grid.cand_mask, cap, mover_slot, p_old, p_new, MW,
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


def test_prefer_disjoint_grid_shape():
    """choose_grid_shape(prefer_disjoint=True) yields a CF=27 grid
    with pairwise-disjoint same-colour stencils at the N=24192
    flagship size (enables cell_pallas='apply' there)."""
    import numpy as np

    from mc_water_ls_mw_tpu.models.stacking import (
        correspondence_mismatch,
        stacking_switch_pair,
    )
    from mc_water_ls_mw_tpu.models.sw import MW
    from mc_water_ls_mw_tpu.ops.cells import (
        build_grid,
        cap_for_positions,
        choose_grid_shape,
    )

    r0, H0 = stacking_switch_pair(24, 14, 18)
    mx, _ = correspondence_mismatch(r0, H0)
    shape = choose_grid_shape(H0, MW, mx, prefer_disjoint=True)
    cg = build_grid(
        shape, cap_for_positions(r0, H0, shape), H0, MW, mx
    )
    assert cg.full_cells.shape[1] == 27
    assert bool(np.all(cg.full_mask))
    m3 = cg.m ** 3
    for col in range(8):
        cells_c = np.asarray(cg.color_cells[col])
        for b in range(m3):
            fc = cg.block_cells[cells_c][:, b]
            cand = cg.full_cells[fc]
            assert len(np.unique(cand)) == cand.size
