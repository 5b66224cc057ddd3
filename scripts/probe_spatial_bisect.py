"""Bisection probe 3: which piece of the SPATIAL region costs 6x?

probe_substep_composite{,2}.py showed the full unsharded sub-step
composes cleanly under a 1-device shard_map (round 4: the round-3
"composite pathology" no longer reproduces there), yet the real
SpatialCellEngine still runs ~6x slower than unsharded at
D=1-degenerate.  This probe re-creates the region body of
SpatialCellEngine._sharded_scan (T=1, chain-kernel path) with
toggles, all at D=1:

  V0. unsharded    - eng._substep_scan (reference speed).
  V1. region-full  - faithful copy of the spatial region body.
  V2. no-toglobal  - V1 with to_global = identity (valid at D=1).
  V3. no-local     - V2 on the RAW slabs (no localise/dummy row,
                     global tables, no schedule indirection).
  V4. no-psum      - V1 with the scatter kept but lax.psum removed.

Env: PB_NSUB (128), PB_WALKERS (128), PB_VARIANTS (01234),
PB_OUTER (0): when > 0, wrap each variant in an OUTER lax.scan of
that many iterations (the real engine's cycle-scan structure - round
4 found the pathology needs the conjunction of the spatial region
body and the outer scan).
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
from mc_water_ls_mw_tpu.parallel.spatial import (
    SpatialCellEngine,
    make_spatial_mesh,
)
from mc_water_ls_mw_tpu.constants import ANG_TO_BOHR, AUP_TO_ATM


def main():
    n_sub = int(os.environ.get("PB_NSUB", "128"))
    W = int(os.environ.get("PB_WALKERS", "128"))
    variants = os.environ.get("PB_VARIANTS", "01234")

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
    print(f"N={N} K={K} K_loc={seng.plan.K_loc} cap={cap} W={W} "
          f"n_sub={n_sub}", flush=True)

    dtype = st.r.dtype
    codes = jnp.zeros((n_sub * K * T,), jnp.int32)
    switch_ok = jnp.ones((W,), bool)
    key = jax.random.PRNGKey(0)
    u_all = jax.random.uniform(key, (n_sub, K, 7, W), dtype=dtype)

    def run_unsharded(s):
        return eng._substep_scan(s, codes, u_all, switch_ok, n_sub)

    def make_region(mode):
        # faithful copy of SpatialCellEngine._sharded_scan's region
        # (T=1 path) with the probe toggles
        plan = seng.plan
        cgK = cg.cap
        rows_owned = plan.rows_owned

        def region(s_sc, pks_own, s2m_own, u_all, codes, switch_ok):
            d = jax.lax.axis_index("space")
            mv_d = jax.lax.dynamic_index_in_dim(
                seng.t_mover_idx, d, 0, keepdims=False)
            fcl_d = jax.lax.dynamic_index_in_dim(
                seng.t_fc_local, d, 0, keepdims=False)
            cnd_d = jax.lax.dynamic_index_in_dim(
                seng.t_cand_local, d, 0, keepdims=False)
            own_d = jax.lax.dynamic_index_in_dim(
                seng.t_own_fc, d, 0, keepdims=False)
            if mode == "nolocal":
                s2m_loc = s2m_own
                pks_loc0 = list(pks_own)
            else:
                s2m_loc = seng._localise(s2m_own, -1)
                pks_loc0 = [seng._localise(p, 0) for p in pks_own]
            s2m_flat = s2m_loc.reshape(-1, W)
            valid_loc = s2m_flat >= 0
            rows_slab = s2m_loc.shape[0]
            tpm3_loc0 = jnp.zeros((rows_slab, cgK, W), jnp.int32)

            def body(carry, xs):
                st2, pks_loc, tpm3 = carry
                sid, u = xs
                tbl = jnp.mod(sid, eng.n_tables)
                if mode == "nolocal":
                    fc_g = jnp.take(eng.fc_stack, tbl, axis=0)
                    fc_l = fc_g
                    cand_l = jnp.take(eng.cand_stack, tbl, axis=0)
                    off_g = jnp.take(eng.off_stack, tbl, axis=0)
                    u_loc = u
                    vj = jnp.ones((K,), bool)
                    mvc = jnp.arange(K, dtype=jnp.int32)
                    ownf = jnp.ones((K,), bool)
                else:
                    mv = jnp.take(mv_d, tbl, axis=0)
                    vj = mv >= 0
                    mvc = jnp.maximum(mv, 0)
                    fc_l = jnp.take(fcl_d, tbl, axis=0)
                    cand_l = jnp.take(cnd_d, tbl, axis=0)
                    ownf = jnp.take(own_d, tbl, axis=0) & vj
                    fc_row = jnp.take(eng.fc_stack, tbl, axis=0)
                    off_row = jnp.take(eng.off_stack, tbl, axis=0)
                    fc_g = jnp.take(fc_row, mvc, axis=0)
                    off_g = jnp.take(off_row, mvc, axis=0)
                    u_loc = jnp.take(u, mvc, axis=0)
                codes_k = jax.lax.dynamic_slice(
                    codes, (sid * K * T,), (K * T,))
                st_loc = st2._replace(slot2mol=s2m_flat)

                def to_global(x):
                    if mode in ("notoglobal", "nolocal"):
                        return x
                    was_bool = x.dtype == jnp.bool_
                    xi = x.astype(jnp.int32) if was_bool else x
                    xk = jnp.moveaxis(xi, -2, 0)
                    msk = ownf.reshape(
                        (ownf.shape[0],) + (1,) * (xk.ndim - 1))
                    xo = jnp.where(msk, xk, 0)
                    z = jnp.zeros((K,) + xk.shape[1:],
                                  xk.dtype).at[mvc].add(xo)
                    if mode != "nopsum":
                        z = jax.lax.psum(
                            jnp.moveaxis(z, 0, -2), "space")
                    else:
                        z = jnp.moveaxis(z, 0, -2)
                    return z.astype(bool) if was_bool else z

                st3, pks_new, tpm3 = seng._substep_t1(
                    eng, st2, st_loc, pks_loc, tpm3, fc_g, fc_l,
                    cand_l, off_g, u, u_loc, codes_k, switch_ok,
                    valid_loc, vj, mvc, ownf, to_global,
                )
                return (st3, pks_new, tpm3), None

            (st2, pks_loc, tpm_loc), _ = jax.lax.scan(
                body, (s_sc, pks_loc0, tpm3_loc0),
                (jnp.arange(n_sub, dtype=jnp.int32), u_all),
            )
            if mode == "nolocal":
                return st2, pks_loc, tpm_loc
            return (st2, [p[:rows_owned] for p in pks_loc],
                    tpm_loc[:rows_owned])

        return region

    outer = int(os.environ.get("PB_OUTER", "0"))

    def run_spatial(mode, s):
        pks = eng._pack(s)
        s2m3 = s.slot2mol.reshape(cg.nfine, cap, W)
        s_sc = s._replace(
            r=s.r[:, :, :0],
            moments=Moments(*(f[:, :0] for f in s.moments)),
            slot2mol=s.slot2mol[:0], mol2slot=s.mol2slot[:0],
        )
        sh, rep = P("space"), P()
        sm = shard_map(
            make_region(mode), mesh=mesh,
            in_specs=(rep, sh, sh, rep, rep, rep),
            out_specs=(rep, sh, sh),
            check_vma=False,
        )
        if not outer:
            st2, pks_g, tpm_g = sm(s_sc, pks, s2m3, u_all, codes,
                                   switch_ok)
            return st2.mu, pks_g[0], tpm_g

        def cyc(carry, _):
            st2, pks_c = carry
            st3, pks_g, _tpm = sm(st2, pks_c, s2m3, u_all, codes,
                                  switch_ok)
            return (st3, list(pks_g)), jnp.sum(_tpm)

        (st2, pks_g), tpms = jax.lax.scan(
            cyc, (s_sc, pks), None, length=outer)
        return st2.mu, pks_g[0], tpms

    def run_unsharded_out(s):
        s2, tpm = run_unsharded(s)
        return s2.mu, None, tpm

    fns = {
        "0": ("unsharded", jax.jit(run_unsharded_out)),
        "1": ("region-full", jax.jit(
            functools.partial(run_spatial, "full"))),
        "2": ("no-toglobal", jax.jit(
            functools.partial(run_spatial, "notoglobal"))),
        "3": ("no-local", jax.jit(
            functools.partial(run_spatial, "nolocal"))),
        "4": ("no-psum", jax.jit(
            functools.partial(run_spatial, "nopsum"))),
    }

    for tag in variants:
        name, fn = fns[tag]
        out = fn(st)
        jax.block_until_ready(out)
        t0 = time.time()
        out = fn(st)
        jax.block_until_ready(out)
        dt = time.time() - t0
        print(f"V{tag} {name}: {dt:.3f}s "
              f"({dt / n_sub * 1e3:.2f} ms/sub-step)", flush=True)


if __name__ == "__main__":
    main()
