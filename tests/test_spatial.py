"""Spatial-partition plan invariants (parallel/spatial.py).

The plan is the static half of the spatially sharded cell engine:
these tests pin the properties its runtime correctness argument rests
on - exact ownership partition, halo closure of every scheduled
mover's stencil, write-mask partition (each stencil cell applied by
exactly one device), and ring-shift consistency of the halo sources.
"""

import numpy as np
import pytest

from mc_water_ls_mw_tpu.models.sw import MW
from mc_water_ls_mw_tpu.ops.cells import build_grid
from mc_water_ls_mw_tpu.parallel.spatial import (
    SpatialPlan,
    build_spatial_plan,
    stencil_reach,
)


def _grid(n=(4, 4, 4), m=2, side=75.0):
    H = np.eye(3) * side
    return build_grid(n, 4, [H, H], MW, 0.0, m=m)


def _fc_stack(cg):
    """The engine's stacked (colour, fine-block) schedule
    (cellengine.CellEngine.__init__)."""
    rows = []
    for col in range(8):
        cells_c = np.asarray(cg.color_cells[col])
        for b in range(cg.m ** 3):
            rows.append(cg.block_cells[cells_c][:, b])
    return np.stack(rows)


@pytest.fixture(scope="module")
def plan2():
    cg = _grid()
    return cg, _fc_stack(cg), build_spatial_plan(cg, _fc_stack(cg), 2)


def test_reach_matches_geometry():
    cg = _grid()
    # fine side 75/8 = 9.4 Bohr > r_cov = rc ~ 8.14 Bohr: reach 1
    assert stencil_reach(cg).tolist() == [1, 1, 1]


def test_ownership_partition(plan2):
    cg, _, plan = plan2
    assert isinstance(plan, SpatialPlan)
    rows_per_layer = cg.nf[1] * cg.nf[2]
    fx = np.arange(cg.nfine) // rows_per_layer
    owner = fx // plan.layers_owned
    for d in range(plan.ndev):
        loc = plan.loc_of_global[d]
        owned = np.nonzero((loc >= 0) & (loc < plan.rows_owned))[0]
        # exactly its contiguous x-slab, in ascending local order
        assert np.array_equal(owned, np.nonzero(owner == d)[0])
        assert np.array_equal(loc[owned], np.arange(plan.rows_owned))


def test_halo_sources_are_neighbour_owned_ring(plan2):
    cg, _, plan = plan2
    rows_per_layer = cg.nf[1] * cg.nf[2]
    fx = np.arange(cg.nfine) // rows_per_layer
    owner = fx // plan.layers_owned
    for d in range(plan.ndev):
        lo, hi = plan.halo_lo_src[d], plan.halo_hi_src[d]
        # lo halo == the DOWN neighbour's LAST halo_layers owned rows,
        # hi halo == the UP neighbour's FIRST (the ±1 ppermute slices)
        dn, up = (d - 1) % plan.ndev, (d + 1) % plan.ndev
        dn_owned = np.nonzero(owner == dn)[0]
        up_owned = np.nonzero(owner == up)[0]
        assert np.array_equal(lo, dn_owned[-plan.rows_halo:])
        assert np.array_equal(hi, up_owned[:plan.rows_halo])
        # and the local row map agrees with the halo row order
        assert np.array_equal(
            plan.loc_of_global[d][lo],
            plan.rows_owned + np.arange(plan.rows_halo),
        )
        assert np.array_equal(
            plan.loc_of_global[d][hi],
            plan.rows_owned + plan.rows_halo
            + np.arange(plan.rows_halo),
        )


def test_schedule_closure_and_local_ids(plan2):
    cg, fc_stack, plan = plan2
    T, K = fc_stack.shape
    for t in range(T):
        cand = cg.full_cells[fc_stack[t]]
        for d in range(plan.ndev):
            loc = plan.loc_of_global[d]
            for j in range(plan.K_loc):
                k = plan.mover_idx[t, d, j]
                if k < 0:
                    assert not plan.own_fc[t, d, j]
                    assert not plan.own_cand[t, d, j].any()
                    continue
                # local ids round-trip through the global map
                assert loc[fc_stack[t, k]] == plan.fc_local[t, d, j]
                cl = plan.cand_local[t, d, j]
                assert np.all(
                    cl[cg.full_mask] == loc[cand[k][cg.full_mask]]
                )
                # the whole stencil resolves locally (halo closure)
                assert np.all(loc[cand[k][cg.full_mask]] >= 0)


def test_write_masks_partition_every_stencil_cell(plan2):
    cg, fc_stack, plan = plan2
    T, K = fc_stack.shape
    CFm = int(cg.full_mask.sum())
    for t in range(T):
        # each mover's fc is own_fc on EXACTLY one device, and each
        # masked stencil cell own_cand on exactly one device
        fc_owned = np.zeros(K, dtype=int)
        cand_owned = np.zeros((K, CFm), dtype=int)
        seen = np.zeros(K, dtype=int)
        for d in range(plan.ndev):
            for j in range(plan.K_loc):
                k = plan.mover_idx[t, d, j]
                if k < 0:
                    continue
                seen[k] += 1
                fc_owned[k] += int(plan.own_fc[t, d, j])
                cand_owned[k] += plan.own_cand[t, d, j][
                    cg.full_mask
                ].astype(int)
        assert np.all(seen >= 1)           # every mover computed
        assert np.all(fc_owned == 1)       # one owner applies its row
        assert np.all(cand_owned == 1)     # one owner per stencil cell


def test_single_device_degenerates():
    cg = _grid()
    fcs = _fc_stack(cg)
    plan = build_spatial_plan(cg, fcs, 1)
    # everything owned, schedule == the unsharded table rows
    assert plan.K_loc == fcs.shape[1]
    assert np.array_equal(
        plan.loc_of_global[0], np.arange(cg.nfine)
    )
    assert np.array_equal(
        np.sort(plan.mover_idx[:, 0], axis=1),
        np.tile(np.arange(fcs.shape[1]), (fcs.shape[0], 1)),
    )
    assert plan.own_fc[:, 0].all()
    # local ids == global ids
    order = np.argsort(plan.mover_idx[0, 0])
    assert np.array_equal(
        plan.fc_local[0, 0][order], fcs[0]
    )


def test_invalid_device_counts_raise():
    cg = _grid()
    fcs = _fc_stack(cg)
    with pytest.raises(ValueError, match="must divide"):
        build_spatial_plan(cg, fcs, 3)
    # 4 devices x 1 coarse layer = 2 fine layers owned = exactly the
    # halo depth (2*reach) - allowed; verify closure still holds
    plan4 = build_spatial_plan(cg, fcs, 4)
    assert plan4.layers_owned == 2 and plan4.rows_halo > 0


def test_redundant_movers_agree_across_devices(plan2):
    """A mover scheduled on two devices refers to the SAME global
    mover (same k), so identical replicated inputs give identical
    proposals - the runtime's redundant-compute precondition."""
    cg, fc_stack, plan = plan2
    T, K = fc_stack.shape
    any_redundant = False
    for t in range(T):
        for k in range(K):
            holders = [
                d for d in range(plan.ndev)
                if (plan.mover_idx[t, d] == k).any()
            ]
            if len(holders) > 1:
                any_redundant = True
    # with reach 1 and 4 fine layers per device, boundary coarse
    # cells must appear on both devices
    assert any_redundant
