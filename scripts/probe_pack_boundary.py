"""Bisection probe 7: the per-cycle pack -> shard_map -> unpack
round-trip.

probe_spatial_bisect.py PB_OUTER=4 showed the full spatial region is
clean even inside an outer scan WHEN the packed slabs are the outer
carry.  The real engine instead carries the CANONICAL slabs
(s.r/s.moments) and round-trips them through _pack / sharded specs /
_unpack every cycle.  This probe scans the engine's real scan_fns:

  U. scan of eng._substep_scan   (unsharded; same pack/unpack, no
                                  shard_map)
  S. scan of seng._sharded_scan  (the real spatial per-cycle path)

Env: PB_NSUB (128) sub-steps per call, PB_CYCLES (4), PB_WALKERS.
"""

from __future__ import annotations

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
)
from mc_water_ls_mw_tpu.parallel.spatial import (
    SpatialCellEngine,
    make_spatial_mesh,
)
from mc_water_ls_mw_tpu.constants import ANG_TO_BOHR, AUP_TO_ATM


def main():
    n_sub = int(os.environ.get("PB_NSUB", "128"))
    C = int(os.environ.get("PB_CYCLES", "4"))
    W = int(os.environ.get("PB_WALKERS", "128"))

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
        mc_vol_prob=1.0 / N, mc_switch_prob=0.1,
        samplerun=False, eq_mc_cycles=1, list_update_int=5,
        mpi_sync_int=10, latt_sync_int=10_000,
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
    codes = jnp.zeros((n_sub * K * T,), jnp.int32)
    switch_ok = jnp.ones((W,), bool)
    key = jax.random.PRNGKey(0)
    u_all = jax.random.uniform(key, (n_sub, K, 7, W), dtype=dtype)

    def scan_of(scan_fn):
        def run(s):
            def cyc(carry, _):
                s2, _tpm = scan_fn(carry, codes, u_all, switch_ok,
                                   n_sub)
                return s2, jnp.sum(_tpm)
            s2, tpms = jax.lax.scan(run_body := cyc, s, None,
                                    length=C)
            return s2.mu, s2.r, tpms
        return jax.jit(run)

    for tag, fn in (("U unsharded scan_fn", scan_of(eng._substep_scan)),
                    ("S sharded scan_fn", scan_of(seng._sharded_scan))):
        out = fn(st)
        jax.block_until_ready(out)
        t0 = time.time()
        out = fn(st)
        jax.block_until_ready(out)
        dt = time.time() - t0
        print(f"{tag}: {dt:.3f}s "
              f"({dt / (C * n_sub) * 1e3:.2f} ms/sub-step)",
              flush=True)


if __name__ == "__main__":
    main()
