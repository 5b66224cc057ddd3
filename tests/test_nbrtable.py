"""Candidate-reduction fast path (ops/nbrtable.py): table
construction properties, scan-path exactness under the shared
schedule + displacement wall, and fused-kernel equivalence."""

import dataclasses

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from mc_water_ls_mw_tpu.models.lattices import switch_pair_216  # noqa: E402
from mc_water_ls_mw_tpu.models.sw import MW  # noqa: E402
from mc_water_ls_mw_tpu.ops.nbrtable import (  # noqa: E402
    build_nbr_tables,
    mic_unique,
    table_radius,
)


def test_table_construction_properties():
    r0, H0 = switch_pair_216()
    assert mic_unique(H0, MW)
    d_wall = 1.5
    tbl = build_nbr_tables(r0, H0, MW, d_wall)
    L, N, M = tbl.shape
    assert (L, N) == (2, 216)
    assert M % 8 == 0
    # symmetry: j in table[i] <=> i in table[j] (distance is symmetric)
    for l in range(L):
        for i in range(0, N, 17):
            for j in tbl[l, i]:
                if j < N:
                    assert i in tbl[l, j]
    # capture: every pair within the table radius is listed
    rt = table_radius(MW, d_wall)
    for l in range(L):
        Hinv = np.linalg.inv(H0[l])
        d = r0[l][:, None, :] - r0[l][None, :, :]
        f = d @ Hinv.T
        f -= np.round(f)
        d = f @ H0[l].T
        dist = np.linalg.norm(d, axis=-1)
        np.fill_diagonal(dist, np.inf)
        ii, jj = np.nonzero(dist < rt)
        for i, j in zip(ii[::29], jj[::29]):
            assert j in tbl[l, i]
    # padding sentinel
    assert tbl.max() <= N


def _setup_216(n_walkers, **over):
    import __graft_entry__ as g

    return g._setup(n_walkers=n_walkers, dtype="float64", nwater=216,
                    **over)


@pytest.mark.slow
def test_scan_path_table_mode_exact(examples_dir):
    """Shared schedule + wall on the scan path: incremental energies
    must stay exact against the from-scratch audit (the table is not
    used by the scan path, but the wall keeps its guarantee valid)."""
    prm, eng, state = _setup_216(2)
    assert eng.tbl is not None and eng.wall > 0
    s, _ = eng.run_cycles(state, 3)
    s2, drift = eng.audit_energy(s)
    assert float(np.abs(np.asarray(drift)).max()) < 1e-10
    # wall invariant: every molecule within d_wall of its reference
    # site in both replicas
    f0 = np.asarray(eng.aux.frac0)                       # [L,3,N]
    r = np.asarray(s.r)                                  # [L,3,N,W]
    h = np.asarray(s.h)                                  # [L,3,3,W]
    for l in range(2):
        ref = np.einsum("abw,bn->anw", h[l], f0[l])
        d = r[l] - ref
        assert np.sqrt((d * d).sum(axis=0)).max() <= eng.wall + 1e-12


@pytest.mark.slow
def test_fused_table_matches_scan(examples_dir):
    """The table-mode fused kernel must reproduce the scan path's
    chain exactly (fp64 interpret mode): identical accept decisions
    AND a table-completeness check (the scan path evaluates the dense
    candidate superset)."""
    from mc_water_ls_mw_tpu.mcmc.engine import Engine

    prm, eng, state = _setup_216(2)
    s_scan, _ = eng.run_cycles(state, 2)
    eng_f = Engine(
        dataclasses.replace(prm, fused="on"), MW, eng.grid, eng.aux
    )
    assert eng_f.use_fused and eng_f.fused_cycle.tbl is not None
    s_fus, _ = eng_f.run_cycles(state, 2)

    assert np.array_equal(np.asarray(s_scan.ls), np.asarray(s_fus.ls))
    assert np.array_equal(np.asarray(s_scan.att), np.asarray(s_fus.att))
    assert np.array_equal(np.asarray(s_scan.acc), np.asarray(s_fus.acc))
    assert np.array_equal(
        np.asarray(s_scan.trans_per_mol),
        np.asarray(s_fus.trans_per_mol),
    )
    np.testing.assert_allclose(
        np.asarray(s_scan.mu), np.asarray(s_fus.mu), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(s_scan.r), np.asarray(s_fus.r), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(s_scan.energy), np.asarray(s_fus.energy), atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(s_scan.weight), np.asarray(s_fus.weight), atol=1e-12
    )
