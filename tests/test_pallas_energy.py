"""Chunked Pallas full-cell kernel vs XLA dense oracle."""

import numpy as np
import jax.numpy as jnp

from mc_water_ls_mw_tpu.models.sw import MW
from mc_water_ls_mw_tpu.models.lattices import switch_pair_216
from mc_water_ls_mw_tpu.ops.dense import (
    full_energy_batch,
    reduced_shift_set,
)
from mc_water_ls_mw_tpu.ops.pallas_energy import FullEnergyPallas
from mc_water_ls_mw_tpu.io.xmol import read_lattices


def _check(r0, H0, W=4):
    rng = np.random.default_rng(0)
    N = r0.shape[0]
    r3 = np.broadcast_to(r0.T[:, :, None], (3, N, W)).copy()
    r3 += rng.normal(0, 0.05, size=r3.shape)       # break symmetry
    H = np.broadcast_to(H0[:, :, None], (3, 3, W))
    r3, H = jnp.asarray(r3), jnp.asarray(H)
    sh = reduced_shift_set(H0, MW)

    e_ref, mom_ref = full_energy_batch(r3, H, sh, MW, True)
    kern = FullEnergyPallas(MW, sh, chunk=8)
    e, mom = kern(r3, H)
    np.testing.assert_allclose(
        np.asarray(e), np.asarray(e_ref), rtol=1e-12
    )
    for a, b in zip(mom, mom_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-10, atol=1e-13
        )


def test_pallas_full_energy_216():
    r0, H0 = switch_pair_216()
    _check(r0[0], H0[0])          # triclinic Ih cell
    _check(r0[1], H0[1])          # cubic Ic cell


def test_pallas_full_energy_packaged(examples_dir):
    r0, H0 = read_lattices(examples_dir / "ice1_sample", 2, 48)
    _check(np.asarray(r0[0]), np.asarray(H0[0]))

    # uneven final chunk: N=48 with chunk=7
    sh = reduced_shift_set(np.asarray(H0[0]), MW)
    W = 4
    r3 = jnp.asarray(
        np.broadcast_to(np.asarray(r0[0]).T[:, :, None], (3, 48, W))
    )
    H = jnp.asarray(np.broadcast_to(np.asarray(H0[0])[:, :, None],
                                    (3, 3, W)))
    e_ref, _ = full_energy_batch(r3, H, sh, MW, True)
    e, _ = FullEnergyPallas(MW, sh, chunk=7)(r3, H)
    np.testing.assert_allclose(np.asarray(e), np.asarray(e_ref),
                               rtol=1e-12)
