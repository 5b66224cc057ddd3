"""Bisection probe: which sub-step composition loses XLA buffer
forwarding inside shard_map?

Round 3 measured (DESIGN.md 5c): the FULL cell-engine sub-step scan
under a trivial 1-device shard_map runs ~11x slower than plain, while
every isolated ingredient (aliased apply kernel as scan carry, scanned
energies kernel, scalar-prefetch tables, 118MB carry) measures clean.
This probe times intermediate compositions to pin the culprit and
validate the round-4 fix design (kernels-only sub-step body):

  A. kernels: energies kernel (reads carried slab) + aliased apply
     kernel (mutates it) - NO XLA op touches the slab.
  B. A + the select_movers-style XLA block gather pk[fc].
  C. B + the tpm-style XLA block scatter on a carried tensor.

Each runs as a scan over n_sub sub-steps, plain and wrapped in a
1-device shard_map with replicated specs (the round-3 repro wrap).

Usage: python scripts/probe_substep_composite.py  (on the TPU)
Env: PB_NSUB (default 128), PB_WALKERS (128), PB_VARIANTS (ABC).
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
from mc_water_ls_mw_tpu.mcmc.cellengine import CellEngine, init_cell_state
from mc_water_ls_mw_tpu.ops.cells import (
    build_grid,
    cap_for_positions,
    choose_grid_shape,
)
from mc_water_ls_mw_tpu.constants import ANG_TO_BOHR, AUP_TO_ATM


def main():
    n_sub = int(os.environ.get("PB_NSUB", "128"))
    W = int(os.environ.get("PB_WALKERS", "128"))
    variants = os.environ.get("PB_VARIANTS", "ABC")

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
    K = eng.K
    print(f"N={N} K={K} CF={cg.full_cells.shape[1]} cap={cap} "
          f"W={W} n_sub={n_sub}", flush=True)

    pks = eng._pack(st)
    h = st.h
    dtype = pks[0].dtype
    rank0 = jnp.zeros((K, W), jnp.int32)
    p_old0 = jnp.zeros((3, K, W), dtype)
    p_new0 = jnp.full((3, K, W), 0.01, dtype)
    accf0 = jnp.ones((K, W), dtype).astype(jnp.int32)
    tpm0 = jnp.zeros((cg.nfine, cap, W), jnp.int32)

    def body(variant, carry, sid):
        pk0, pk1, tpm, acc = carry
        pks_l = [pk0, pk1]
        tbl = jnp.mod(sid, eng.n_tables)
        fc = jnp.take(eng.fc_stack, tbl, axis=0)
        cand = jnp.take(eng.cand_stack, tbl, axis=0)
        off = jnp.take(eng.off_stack, tbl, axis=0)
        for l in range(2):
            e_old, e_new, own, _ = eng.mover_kernel(
                pks_l[l], h[l], cand, off, fc, rank0, p_old0, p_new0
            )
            acc = acc + jnp.sum(e_new, axis=0)
            pks_l[l] = eng.apply_kernel(
                pks_l[l], h[l], cand, off, fc, rank0, accf0,
                p_old0, p_new0, own,
            )
        if variant >= 1:
            # select_movers-style XLA block gather from the carried
            # slab (valid row of the movers' fine cells)
            blk = pks_l[0][fc]                     # [K,R,cap,W]
            acc = acc + jnp.sum(blk[:, -1], axis=(0, 1))
        if variant >= 2:
            # tpm-style XLA block scatter on a carried tensor
            inc = jnp.ones((K, cap, W), jnp.int32)
            tpm = tpm.at[fc].add(inc, unique_indices=True)
        return (pks_l[0], pks_l[1], tpm, acc), None

    def scan_fn(variant, pk0, pk1, tpm):
        acc0 = jnp.zeros((W,), dtype)
        carry, _ = jax.lax.scan(
            functools.partial(body, variant),
            (pk0, pk1, tpm, acc0),
            jnp.arange(n_sub, dtype=jnp.int32),
        )
        return carry[0], carry[3]

    mesh = Mesh(np.asarray(jax.devices()[:1]), ("space",))

    for tag in variants:
        variant = {"A": 0, "B": 1, "C": 2}[tag]
        fn_plain = jax.jit(functools.partial(scan_fn, variant))
        fn_sm = jax.jit(shard_map(
            functools.partial(scan_fn, variant), mesh=mesh,
            in_specs=(P(), P(), P()), out_specs=(P(), P()),
            check_vma=False,
        ))
        for name, fn in (("plain", fn_plain), ("shard_map", fn_sm)):
            out = fn(pks[0], pks[1], tpm0)  # compile+warm
            jax.block_until_ready(out)
            t0 = time.time()
            out = fn(pks[0], pks[1], tpm0)
            jax.block_until_ready(out)
            dt = time.time() - t0
            print(f"variant {tag} {name}: {dt:.3f}s "
                  f"({dt / n_sub * 1e3:.2f} ms/sub-step)", flush=True)


if __name__ == "__main__":
    main()
