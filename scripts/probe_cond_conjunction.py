"""Bisection probe 8: which _cycle_with ingredient x sharded scan_fn
conjunction costs 12x?

probe_pack_boundary.py: scanning the REAL _sharded_scan is clean.
probe_spatial_cycle.py 'none': the real engine (whose cycle body adds
lax.conds for rebin/sync/resync, per-cycle threefry u_all generation,
codes, tpm gather, therm sampling) is 12x slower.  Toggle the
ingredients one at a time around the real _sharded_scan:

  A. bare        - _sharded_scan only                      [clean]
  B. +rebin-cond - lax.cond(False-ish, _rebin) before it
  C. +sync-conds - lax.cond delta-sync + resync after it
  D. +u_all-gen  - per-cycle threefry generation of u_all
  E. +tpm/therm  - trans_per_mol gather + avg/therm sampling
  F. all         - B+C+D+E (should reproduce ~12x)
  U. unsharded-F - all ingredients around _substep_scan    [control]

Env: PB_NSUB (128), PB_CYCLES (4), PB_WALKERS (128), PB_VARIANTS.
"""

from __future__ import annotations

import functools
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
from mc_water_ls_mw_tpu.mcmc.cellengine import (
    CellEngine,
    init_cell_state,
)
from mc_water_ls_mw_tpu.ops.cells import (
    build_grid,
    cap_for_positions,
    choose_grid_shape,
    gather_from_slab,
)
from mc_water_ls_mw_tpu.parallel.spatial import (
    SpatialCellEngine,
    make_spatial_mesh,
)
from mc_water_ls_mw_tpu.mcmc.engine import _take_lat
from mc_water_ls_mw_tpu.constants import ANG_TO_BOHR, AUP_TO_ATM


def main():
    n_sub = int(os.environ.get("PB_NSUB", "128"))
    C = int(os.environ.get("PB_CYCLES", "4"))
    W = int(os.environ.get("PB_WALKERS", "128"))
    variants = os.environ.get("PB_VARIANTS", "ABCDEFU")

    r0, H0 = stacking_switch_pair(14, 8, 18)
    N = r0.shape[1]
    mx, _ = correspondence_mismatch(r0, H0)
    shape = choose_grid_shape(H0, MW, mx)
    cap = cap_for_positions(r0, H0, shape)
    cg = build_grid(shape, cap, H0, MW, mx)
    prm = RunParams(
        nwater=N, num_lattices=2, temperature=200.0,
        pressure=1.0 / AUP_TO_ATM,
        mc_max_trans=0.25 * ANG_TO_BOHR, mc_dv_max=0.2 * ANG_TO_BOHR,
        nbins=201, mu_min=-1200.0, mu_max=1200.0,
        mc_vol_prob=0.0, allow_vol=False, mc_switch_prob=0.1,
        samplerun=False, eq_mc_cycles=1, list_update_int=1_000_000,
        mpi_sync_int=1_000_000, latt_sync_int=1_000_000,
        n_walkers=W, dtype="float32", fused="off",
        cell_pallas="apply", cell_trials=1,
    )
    grid = build_bin_grid(prm.nbins, prm.mu_min, prm.mu_max,
                          dtype=jnp.float32)
    st, eaux, caux = init_cell_state(prm, MW, r0, H0, grid, cg)
    mesh = make_spatial_mesh(jax.devices()[:1])
    seng = SpatialCellEngine(prm, MW, grid, eaux, cg, caux, mesh)
    eng = seng.inner
    jax.block_until_ready(st.energy)
    K, T = eng.K, eng.T
    print(f"N={N} K={K} cap={cap} W={W} n_sub={n_sub} C={C}",
          flush=True)

    dtype = st.r.dtype
    codes0 = jnp.zeros((n_sub * K * T,), jnp.int32)
    switch_ok = jnp.ones((W,), bool)
    key = jax.random.PRNGKey(0)
    u_all0 = jax.random.uniform(key, (n_sub, K, 7, W), dtype=dtype)

    def make_run(scan_fn, rebin_cond, sync_conds, ugen, tpm_therm):
        def cycle(s, _):
            cycle_i = s.cycle + 1
            s = s._replace(cycle=cycle_i)
            if rebin_cond:
                s = jax.lax.cond(
                    cycle_i % prm.list_update_int == 0,
                    eng._rebin, lambda x: x, s,
                )
            if ugen:
                u_all = jax.vmap(
                    lambda k: jax.random.uniform(
                        jax.random.fold_in(k, cycle_i),
                        (n_sub, K, 7), dtype=dtype,
                    ),
                    out_axes=3,
                )(s.key)
            else:
                u_all = u_all0
            s, tpm_slab = scan_fn(s, codes0, u_all, switch_ok, n_sub)
            if tpm_therm:
                s = s._replace(
                    trans_per_mol=s.trans_per_mol
                    + gather_from_slab(tpm_slab, s.mol2slot)
                )
                avg = s.avg_energy + s.energy
                avg = avg + prm.pressure * s.volume
                s = s._replace(avg_energy=avg)
            if sync_conds:
                s = jax.lax.cond(
                    cycle_i % prm.mpi_sync_int == 0,
                    eng._sync_all, lambda x: x, s,
                )
                s = jax.lax.cond(
                    cycle_i % prm.latt_sync_int == 0,
                    eng._resync_chains, lambda x: x, s,
                )
            e_ls = _take_lat(s.energy, s.ls)
            sample = {"cycle": cycle_i, "E_ls": e_ls[:4],
                      "mu": s.mu[:4]}
            return s, sample

        def run(s):
            s2, samples = jax.lax.scan(cycle, s, None, length=C)
            return s2.mu, s2.r, samples["mu"]
        return jax.jit(run)

    sf_s = seng._sharded_scan
    sf_u = eng._substep_scan

    def make_real(one_cycle):
        def run(s):
            def cyc(carry, _):
                s2, sample = one_cycle(carry)
                return s2, sample["mu"]
            s2, mus = jax.lax.scan(cyc, s, None, length=C)
            return s2.mu, s2.r, mus
        return jax.jit(run)

    fns = {
        "A": ("bare sharded", make_run(sf_s, 0, 0, 0, 0)),
        "B": ("+rebin-cond", make_run(sf_s, 1, 0, 0, 0)),
        "C": ("+sync-conds", make_run(sf_s, 0, 1, 0, 0)),
        "D": ("+u_all-gen", make_run(sf_s, 0, 0, 1, 0)),
        "E": ("+tpm/therm", make_run(sf_s, 0, 0, 0, 1)),
        "F": ("all sharded", make_run(sf_s, 1, 1, 1, 1)),
        "U": ("all unsharded", make_run(sf_u, 1, 1, 1, 1)),
        "R": ("real spatial _one_cycle", make_real(seng._one_cycle)),
        "S": ("real unsharded _one_cycle", make_real(eng._one_cycle)),
    }
    for tag in variants:
        name, fn = fns[tag]
        out = fn(st)
        jax.block_until_ready(out)
        t0 = time.time()
        out = fn(st)
        jax.block_until_ready(out)
        dt = time.time() - t0
        print(f"{tag} {name}: {dt:.3f}s "
              f"({dt / (C * n_sub) * 1e3:.2f} ms/sub-step)",
              flush=True)


if __name__ == "__main__":
    main()
