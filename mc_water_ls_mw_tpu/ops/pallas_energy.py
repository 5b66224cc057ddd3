"""Pallas full-cell SW energy + moments kernel.

The XLA dense full-cell evaluation (ops/dense.full_energy_batch)
materialises [Ni, S, Nj, W] intermediates; at N=216, W=4096 that is
~190M elements per array and the 12 reductions (10 moments + pair +
w2) force either recompute-per-reduction or a trip through HBM -
measured 57 ms/lattice on v5e.  This kernel streams centre chunks
through VMEM instead: grid = walker blocks, python loop over centre
chunks of CH rows, one pass computing all reductions at once.  Used
by the volume move and chain resync on the fused path (the energy
audit keeps the general XLA path deliberately - DESIGN.md §4).

Math is the identical moment formulation as ops/dense.py (shared
helpers); reference semantics: compute_model_energy,
molint.F90:407-499.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.sw import SWParams
from .dense import Moments, _e3_closed_form, _leg, _mic_fold, _pair


class FullEnergyPallas:
    """Whole-cell energy + per-molecule moments for one lattice,
    walker-batched: (r3 [3,N,W], H [3,3,W]) -> (E [W], mom [10,N,W])."""

    def __init__(self, model: SWParams, fold_shifts, mesh=None,
                 chunk=8):
        self.model = model
        self.shifts = [tuple(int(x) for x in sh)
                       for sh in np.asarray(fold_shifts)]
        self.mesh = mesh if (mesh is not None and mesh.size > 1) else None
        self.chunk = chunk
        self.interpret = jax.default_backend() == "cpu"

    def _kernel(self, r_ref, h_ref, e_ref, mom_ref, eacc_ref):
        m = self.model
        N = r_ref.shape[1]
        CH = self.chunk
        lam_eps = m.lam * m.epsilon
        dtype = r_ref.dtype

        rx, ry, rz = r_ref[0], r_ref[1], r_ref[2]        # [N,WB]
        Hc = [[h_ref[a, b] for b in range(3)] for a in range(3)]

        # [CH, WB] partial-sum accumulator held in a VMEM scratch ref:
        # the store/load round-trip pins a concrete layout each chunk
        # (value-carried accumulators trip Mosaic relayout bugs here -
        # sublane-broadcast chains mark the chunk sums replicated)
        WB = e_ref.shape[-1]
        first = True
        for c in range(0, N, CH):
            n = min(CH, N - c)
            cx = rx[c:c + n]                              # [n,WB]
            cy = ry[c:c + n]
            cz = rz[c:c + n]
            fx = rx[None, :, :] - cx[:, None, :]          # [n,N,WB]
            fy = ry[None, :, :] - cy[:, None, :]
            fz = rz[None, :, :] - cz[:, None, :]
            fx, fy, fz = _mic_fold(fx, fy, fz, Hc)

            # self mask of the null image: j == c+i (built 3-D:
            # Mosaic cannot insert a minor dim on an i1 vector)
            i_ids = lax.broadcasted_iota(jnp.int32, (n, N, 1), 0) + c
            j_ids = lax.broadcasted_iota(jnp.int32, (n, N, 1), 1)
            self_ij = i_ids == j_ids                      # [n,N,1]

            acc = {}

            def add(key, val):
                acc[key] = val if key not in acc else acc[key] + val

            pair_sum = None
            for sh in self.shifts:
                if sh == (0, 0, 0):
                    dx, dy, dz = fx, fy, fz
                    exclude = True
                else:
                    imx = (sh[0] * Hc[0][0] + sh[1] * Hc[0][1]
                           + sh[2] * Hc[0][2])
                    imy = (sh[0] * Hc[1][0] + sh[1] * Hc[1][1]
                           + sh[2] * Hc[1][2])
                    imz = (sh[0] * Hc[2][0] + sh[1] * Hc[2][1]
                           + sh[2] * Hc[2][2])
                    dx = fx + imx[None, None, :]
                    dy = fy + imy[None, None, :]
                    dz = fz + imz[None, None, :]
                    exclude = False
                r2 = dx * dx + dy * dy + dz * dz
                in_rc = r2 < m.rc2
                if exclude:
                    in_rc = in_rc & ~self_ij
                r2s = jnp.where(in_rc, r2, 1.0)
                inv = lax.rsqrt(r2s)
                rij = r2s * inv
                p = jnp.sum(_pair(r2s, rij, in_rc, m), axis=1)  # [n,WB]
                pair_sum = p if pair_sum is None else pair_sum + p
                w = _leg(rij, in_rc, m)
                ux, uy, uz = dx * inv, dy * inv, dz * inv
                wux, wuy, wuz = w * ux, w * uy, w * uz
                add("s1", jnp.sum(w, axis=1))
                add("mx", jnp.sum(wux, axis=1))
                add("my", jnp.sum(wuy, axis=1))
                add("mz", jnp.sum(wuz, axis=1))
                add("mxx", jnp.sum(wux * ux, axis=1))
                add("myy", jnp.sum(wuy * uy, axis=1))
                add("mzz", jnp.sum(wuz * uz, axis=1))
                add("mxy", jnp.sum(wux * uy, axis=1))
                add("mxz", jnp.sum(wux * uz, axis=1))
                add("myz", jnp.sum(wuy * uz, axis=1))
                add("w2", jnp.sum(w * w, axis=1))

            own = Moments(
                acc["s1"], acc["mx"], acc["my"], acc["mz"],
                acc["mxx"], acc["myy"], acc["mzz"],
                acc["mxy"], acc["mxz"], acc["myz"],
            )
            e3 = _e3_closed_form(own, acc["w2"], m.cos0)   # [n,WB]
            # pair terms halved: each (i, j) visited from both ends
            # (molint.F90:464)
            contrib = 0.5 * pair_sum + lam_eps * e3       # [n,WB]
            if n < CH:
                contrib = jnp.concatenate(
                    [contrib, jnp.zeros((CH - n, WB), dtype)], axis=0
                )
            if first:
                eacc_ref[...] = contrib
                first = False
            else:
                eacc_ref[...] = eacc_ref[...] + contrib
            for fi, field in enumerate(own):
                mom_ref[fi, c:c + n, :] = field

        e_ref[...] = jnp.sum(eacc_ref[...], axis=0, keepdims=True)

    def _invoke(self, r3, H):
        N, Wl = r3.shape[1], r3.shape[2]
        WBl = 128 if Wl % 128 == 0 else Wl
        dtype = r3.dtype

        def wspec(shape):
            nd = len(shape)
            blk = tuple(shape[:-1]) + (WBl,)

            def imap(i):
                return (0,) * (nd - 1) + (i,)

            return pl.BlockSpec(blk, imap, memory_space=pltpu.VMEM)

        e, mom = pl.pallas_call(
            self._kernel,
            grid=(Wl // WBl,),
            in_specs=[wspec(r3.shape), wspec(H.shape)],
            out_specs=[wspec((1, Wl)), wspec((10, N, Wl))],
            out_shape=[
                jax.ShapeDtypeStruct((1, Wl), dtype),
                jax.ShapeDtypeStruct((10, N, Wl), dtype),
            ],
            scratch_shapes=[pltpu.VMEM((self.chunk, WBl), dtype)],
            interpret=self.interpret,
        )(r3, H)
        return e[0], mom

    def __call__(self, r3, H):
        """r3 [3,N,W], H [3,3,W] -> (E [W], Moments fields [N,W])."""
        invoke = self._invoke
        if self.mesh is not None:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            ax = self.mesh.axis_names[0]
            invoke = shard_map(
                invoke,
                mesh=self.mesh,
                in_specs=(P(None, None, ax), P(None, None, ax)),
                out_specs=(P(ax), P(None, None, ax)),
                check_vma=False,
            )
        e, mom = invoke(r3, H)
        return e, Moments(*(mom[fi] for fi in range(10)))
