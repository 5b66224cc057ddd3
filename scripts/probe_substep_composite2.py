"""Bisection probe 2: top-down from the REAL sub-step body.

probe_substep_composite.py showed kernels + XLA slab gather + slab
scatter all compose CLEANLY under a 1-device shard_map - so the
round-3 pathology (11x) lives in the remaining real-body pieces:
the selection/proposal/wall XLA, the chain kernel composition, or
their data flow.  This probe runs the real engine sub-step scan and
three ablations, plain vs shard_map-wrapped:

  R. real      - eng._substep (the round-3 repro).
  S. constsel  - skip selection/proposal/wall (constant rank/p_old/
                 p_new/has); REAL energies kernels -> REAL chain
                 kernel -> REAL apply kernels.
  T. nochain   - REAL _propose_t1 (selection + kernels) -> cheap XLA
                 accepts -> REAL _apply_t1 (incl. tpm).  No chain
                 kernel, no WL.

Env: PB_NSUB (128), PB_WALKERS (128), PB_VARIANTS (RST).
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
from mc_water_ls_mw_tpu.mcmc.engine import TRANS
from mc_water_ls_mw_tpu.ops.dense import Moments
from mc_water_ls_mw_tpu.ops.cells import (
    build_grid,
    cap_for_positions,
    choose_grid_shape,
)
from mc_water_ls_mw_tpu.constants import ANG_TO_BOHR, AUP_TO_ATM


def main():
    n_sub = int(os.environ.get("PB_NSUB", "128"))
    W = int(os.environ.get("PB_WALKERS", "128"))
    variants = os.environ.get("PB_VARIANTS", "RST")

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
    print(f"N={N} K={K} cap={cap} W={W} n_sub={n_sub} "
          f"chain_kernel={eng.use_chain_kernel}", flush=True)

    dtype = st.r.dtype
    rank0 = jnp.zeros((K, W), jnp.int32)
    p_old0 = jnp.zeros((3, K, W), dtype)
    p_new0 = jnp.full((3, K, W), 0.01, dtype)
    codes = jnp.zeros((n_sub * K * T,), jnp.int32)  # all TRANS
    switch_ok = jnp.ones((W,), bool)
    key = jax.random.PRNGKey(0)
    u_all = jax.random.uniform(key, (n_sub, K, 7, W), dtype=dtype)

    s_sc = st._replace(
        r=st.r[:, :, :0],
        moments=Moments(*(f[:, :0] for f in st.moments)),
    )
    pks0 = eng._pack(st)
    tpm0 = jnp.zeros((cg.nslot, W), jnp.int32)

    def tables(sid):
        tbl = jnp.mod(sid, eng.n_tables)
        return (jnp.take(eng.fc_stack, tbl, axis=0),
                jnp.take(eng.cand_stack, tbl, axis=0),
                jnp.take(eng.off_stack, tbl, axis=0))

    def body_real(carry, xs):
        stc, pks, tslab = carry
        sid, u = xs
        fc, cand, off = tables(sid)
        codes_k = jax.lax.dynamic_slice(codes, (sid * K * T,),
                                        (K * T,))
        stc, pks, tslab = eng._substep(
            stc, pks, tslab, fc, cand, off, u, codes_k, switch_ok,
        )
        return (stc, pks, tslab), None

    def body_constsel(carry, xs):
        stc, pks, tslab = carry
        sid, u = xs
        fc, cand, off = tables(sid)
        codes_k = jax.lax.dynamic_slice(codes, (sid * K * T,),
                                        (K * T,))
        per = [
            eng.mover_kernel(pks[l], stc.h[l], cand, off, fc, rank0,
                             p_old0, p_new0)
            for l in range(2)
        ]
        e_pts = jnp.stack([
            jnp.stack([p[0], p[1]], axis=0) for p in per
        ])
        ones = jnp.ones((K, W), bool)
        in_pts = jnp.stack([ones, ones])
        two, cmu, sw_c = eng._hoisted_chain_terms(stc)
        has = jnp.ones((K, W), dtype)
        stc, j_oh, _en = eng._chain_kernel_substep(
            stc, e_pts, in_pts, ones, codes_k,
            u[:, 5, :], u[:, 6, :], switch_ok, cmu, sw_c,
        )
        accf = j_oh[:, 1, :]
        pks = [
            eng.apply_kernel(pks[l], stc.h[l], cand, off, fc, rank0,
                             accf, p_old0, p_new0, per[l][2])
            for l in range(2)
        ]
        return (stc, pks, tslab), None

    def body_nochain(carry, xs):
        stc, pks, tslab = carry
        sid, u = xs
        fc, cand, off = tables(sid)
        (rank, oh_sel, blk_r, p_old, p_new, has_mover, in_cell, dE,
         per) = eng._propose_t1(stc, pks, fc, cand, off, u)
        accepts = has_mover & in_cell & (u[:, 5, :] < 0.5)
        trans_type = jnp.ones((K,), bool)
        pks, tslab = eng._apply_t1(
            stc, pks, tslab, fc, cand, off, rank, oh_sel, blk_r,
            p_old, p_new, per, accepts, has_mover, trans_type,
        )
        # thread a cheap dependence through the chain state so the
        # proposal outputs are not dead
        stc = stc._replace(mu=stc.mu + 0.0 * jnp.sum(dE, axis=(0, 1)))
        return (stc, pks, tslab), None

    bodies = {"R": body_real, "S": body_constsel, "T": body_nochain}

    def scan_fn(bodyname, s_in, pk0, pk1, tpm):
        carry, _ = jax.lax.scan(
            bodies[bodyname], (s_in, [pk0, pk1], tpm),
            (jnp.arange(n_sub, dtype=jnp.int32), u_all),
        )
        stc, pks, tslab = carry
        return stc.mu, pks[0], tslab

    mesh = Mesh(np.asarray(jax.devices()[:1]), ("space",))

    for tag in variants:
        fn_plain = jax.jit(functools.partial(scan_fn, tag))
        fn_sm = jax.jit(shard_map(
            functools.partial(scan_fn, tag), mesh=mesh,
            in_specs=(P(), P(), P(), P()), out_specs=(P(), P(), P()),
            check_vma=False,
        ))
        for name, fn in (("plain", fn_plain), ("shard_map", fn_sm)):
            out = fn(s_sc, pks0[0], pks0[1], tpm0)
            jax.block_until_ready(out)
            t0 = time.time()
            out = fn(s_sc, pks0[0], pks0[1], tpm0)
            jax.block_until_ready(out)
            dt = time.time() - t0
            print(f"variant {tag} {name}: {dt:.3f}s "
                  f"({dt / n_sub * 1e3:.2f} ms/sub-step)", flush=True)


if __name__ == "__main__":
    main()
