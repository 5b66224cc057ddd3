"""Bisection probe 5: shard_map INSIDE an outer lax.scan.

probe_spatial_bisect.py: the spatial region at top level (one
shard_map call, slabs passed once) runs at unsharded speed.
probe_spatial_cycle.py: the real engine - whose _sharded_scan puts a
shard_map inside the CYCLE lax.scan, slabs crossing the region
boundary every cycle - is ~12x slower even with every cycle-rank
phase disabled.  This probe isolates exactly that structural
difference with the same region body:

  A. top-level    - jit(shard_map(region(scan(n_sub))))           [clean]
  B. scan-outside - jit(scan over C cycles of shard_map(region))  [suspect]
  C. scan-inside  - jit(shard_map(region(scan over C cycles)))    [the fix]

Env: PB_NSUB (128) sub-steps per cycle, PB_CYCLES (4), PB_WALKERS.
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
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

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
from mc_water_ls_mw_tpu.ops.dense import Moments
from mc_water_ls_mw_tpu.ops.cells import (
    build_grid,
    cap_for_positions,
    choose_grid_shape,
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
    eng = CellEngine(prm, MW, grid, eaux, cg, caux)
    jax.block_until_ready(st.energy)
    K, T = eng.K, eng.T
    print(f"N={N} K={K} cap={cap} W={W} n_sub={n_sub} C={C}",
          flush=True)

    dtype = st.r.dtype
    codes = jnp.zeros((n_sub * K * T,), jnp.int32)
    switch_ok = jnp.ones((W,), bool)
    key = jax.random.PRNGKey(0)
    u_all = jax.random.uniform(key, (n_sub, K, 7, W), dtype=dtype)
    s_sc = st._replace(
        r=st.r[:, :, :0],
        moments=Moments(*(f[:, :0] for f in st.moments)),
    )
    pks0 = eng._pack(st)
    tpm0 = jnp.zeros((cg.nslot, W), jnp.int32)
    mesh = Mesh(np.asarray(jax.devices()[:1]), ("space",))

    def substeps(s_in, pk0, pk1, tpm, nsteps):
        def body(carry, xs):
            stc, pks, tslab = carry
            sid, u = xs
            tbl = jnp.mod(sid, eng.n_tables)
            fc = jnp.take(eng.fc_stack, tbl, axis=0)
            cand = jnp.take(eng.cand_stack, tbl, axis=0)
            off = jnp.take(eng.off_stack, tbl, axis=0)
            codes_k = jax.lax.dynamic_slice(
                codes, (sid * K * T,), (K * T,))
            stc, pks, tslab = eng._substep(
                stc, pks, tslab, fc, cand, off, u, codes_k,
                switch_ok,
            )
            return (stc, pks, tslab), None

        carry, _ = jax.lax.scan(
            body, (s_in, [pk0, pk1], tpm),
            (jnp.arange(nsteps, dtype=jnp.int32), u_all[:nsteps]),
        )
        stc, pks, tslab = carry
        return stc, pks[0], pks[1], tslab

    def region_once(s_in, pk0, pk1, tpm):
        stc, pk0, pk1, tslab = substeps(s_in, pk0, pk1, tpm, n_sub)
        return stc.mu, pk0, pk1, tslab

    def region_cycles(s_in, pk0, pk1, tpm):
        def cyc(carry, _):
            stc, pk0, pk1, tslab = carry
            stc, pk0, pk1, tslab = substeps(stc, pk0, pk1, tslab,
                                            n_sub)
            return (stc, pk0, pk1, tslab), None
        (stc, pk0, pk1, tslab), _ = jax.lax.scan(
            cyc, (s_in, pk0, pk1, tpm), None, length=C)
        return stc.mu, pk0, pk1, tslab

    rep = P()
    sm_once = shard_map(
        region_once, mesh=mesh,
        in_specs=(rep, rep, rep, rep),
        out_specs=(rep, rep, rep, rep), check_vma=False,
    )

    def variant_A(s_in, pk0, pk1, tpm):
        return sm_once(s_in, pk0, pk1, tpm)

    def variant_B(s_in, pk0, pk1, tpm):
        def cyc(carry, _):
            mu, pk0, pk1, tslab = carry
            mu, pk0, pk1, tslab = sm_once(s_in._replace(mu=mu), pk0,
                                          pk1, tslab)
            return (mu, pk0, pk1, tslab), None
        (mu, pk0, pk1, tslab), _ = jax.lax.scan(
            cyc, (s_in.mu, pk0, pk1, tpm), None, length=C)
        return mu, pk0, pk1, tslab

    variant_C = shard_map(
        region_cycles, mesh=mesh,
        in_specs=(rep, rep, rep, rep),
        out_specs=(rep, rep, rep, rep), check_vma=False,
    )

    nsteps = {"A": n_sub, "B": C * n_sub, "C": C * n_sub}
    for tag, fn in (("A", variant_A), ("B", variant_B),
                    ("C", variant_C)):
        jfn = jax.jit(fn)
        out = jfn(s_sc, pks0[0], pks0[1], tpm0)
        jax.block_until_ready(out)
        t0 = time.time()
        out = jfn(s_sc, pks0[0], pks0[1], tpm0)
        jax.block_until_ready(out)
        dt = time.time() - t0
        print(f"variant {tag}: {dt:.3f}s "
              f"({dt / nsteps[tag] * 1e3:.2f} ms/sub-step)",
              flush=True)


if __name__ == "__main__":
    main()
