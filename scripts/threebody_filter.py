"""Quantify the unfiltered near-collinear three-body deviation.

The reference's LOCAL energy path drops three-body terms with
cos(theta) >= 0.99 (molint.F90:367-371); its FULL-cell path does not
filter (molint.F90:407-499).  The dense moment-tensor path samples the
unfiltered published SW Hamiltonian (the degenerate k==i direction is
removed analytically; ops/dense.py 'Exactness note').  The deviation
between the two chains is therefore exactly the total weight of
GENUINE near-collinear triplets (j != k, both inside the cutoff,
cos(theta_jik) >= 0.99):

    dE(config) = lam*eps * sum_{i, j<k in rc, cos >= 0.99}
                    (cos - cos0)^2 * w_j * w_k

This script measures dE per lattice (a) on the ideal packaged N=48
Ih/Ic cells and the built N=216 switch pair, and (b) along a sampled
finite-temperature trajectory at the production state point (200 K,
1 atm), and reports the induced mu perturbation
|d_mu| = beta * |dE_1 - dE_2| in kT - the quantity that bounds any
shift of the Delta-G estimate (mu is the integration variable of the
estimator, mc_moves.F90:2498-2621).

Geometry argument for why dE should vanish: cos >= 0.99 needs two
neighbours within 8.1 degrees of the same ray from i; with both inside
the mW cutoff a*sigma = 4.306 Angstrom this forces a j-k separation
well below 2 Angstrom - deep into the repulsive core, ~10 kT uphill at
200 K.  The script turns that argument into a measured bound.

Usage: python scripts/threebody_filter.py [cycles] [walkers]
Prints one JSON line; run on CPU (f64) or TPU (f32 sampling is fine -
the measurement itself is evaluated in f64 on host-gathered configs).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# the image's sitecustomize forces the axon remote-TPU platform via
# env var; the config-level override is what actually wins
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from mc_water_ls_mw_tpu.models.sw import MW
from mc_water_ls_mw_tpu.ops.geometry import cell_shift_range, enumerate_shifts
from mc_water_ls_mw_tpu.ops.neighbours import build_neighbour_list
from mc_water_ls_mw_tpu.ops.energy import _leg_exp

K_CAP = 50   # reference maxneigh (molint.F90:79)


def collinear_sum(r, H, prm=MW, cos_cut=0.99):
    """Total filtered-term weight of one configuration (f64).

    r: [N, 3] positions (Bohr); H: [3, 3] cell matrix.
    Returns (dE, n_triplets): the energy the reference's local path
    would drop, and how many triplets triggered the filter.
    """
    r = jnp.asarray(r, jnp.float64)
    H = jnp.asarray(H, jnp.float64)
    bounds = cell_shift_range(np.asarray(H), prm.rskin)
    shifts = jnp.asarray(enumerate_shifts(bounds))
    nbr = build_neighbour_list(r, H, shifts, K_CAP, prm.rskin)

    img = nbr.shift.astype(r.dtype) @ H.T
    rj = r[nbr.idx] + img
    d = rj - r[:, None, :]
    r2 = jnp.sum(d * d, axis=-1)
    in_rc = nbr.mask & (r2 < prm.rc2)
    r2s = jnp.where(in_rc, r2, 1.0)
    rij = jnp.sqrt(r2s)
    u = d / rij[..., None]
    cosq = jnp.einsum("ika,ila->ikl", u, u)
    leg = _leg_exp(rij, in_rc, prm)
    K = leg.shape[-1]
    tri = jnp.triu(jnp.ones((K, K), dtype=bool), k=1)
    near = (
        tri[None]
        & in_rc[:, :, None]
        & in_rc[:, None, :]
        & (cosq >= cos_cut)
    )
    terms = (cosq - prm.cos0) ** 2 * leg[:, :, None] * leg[:, None, :]
    dE = prm.lam * prm.epsilon * jnp.sum(jnp.where(near, terms, 0.0))
    return float(dE), int(jnp.sum(near))


def measure_state(state, beta):
    """Per-walker filtered-term stats of a sampled ensemble state."""
    r = np.asarray(state.r, np.float64)      # [L,3,N,W]
    h = np.asarray(state.h, np.float64)      # [L,3,3,W]
    L, _, N, W = r.shape
    d_mu = []
    dEs = []
    n_tr = 0
    for w in range(W):
        dE_l = []
        for l in range(L):
            dE, n = collinear_sum(r[l, :, :, w].T, h[l, :, :, w])
            dE_l.append(dE)
            n_tr += n
        dEs.append(dE_l)
        d_mu.append(beta * abs(dE_l[0] - dE_l[1]))
    return np.asarray(dEs), np.asarray(d_mu), n_tr


def main():
    cycles = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    walkers = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    import __graft_entry__ as g
    from mc_water_ls_mw_tpu.constants import HART_TO_EV

    out = {"cos_cut": 0.99, "cycles": cycles, "walkers": walkers}

    for nwater in (48, 216):
        prm, eng, state = g._setup(
            n_walkers=walkers, dtype="float64", nwater=nwater,
            mpi_sync_int=10,
        )
        # ideal cells first (the packaged Ih/Ic pair)
        dE0, dmu0, ntr0 = measure_state(state, prm.beta)

        # finite-temperature trajectory: sample every other cycle
        max_dmu, max_dE, n_tr, n_cfg = 0.0, 0.0, 0, 0
        for _ in range(cycles // 2):
            state, _ = eng.run_cycles(state, 2)
            dE, dmu, ntr = measure_state(state, prm.beta)
            max_dmu = max(max_dmu, float(dmu.max()))
            max_dE = max(max_dE, float(np.abs(dE).max()))
            n_tr += ntr
            n_cfg += walkers * 2
        assert bool(np.isfinite(np.asarray(state.energy)).all())
        out[f"n{nwater}"] = {
            "ideal_dE_hartree": float(np.abs(dE0).max()),
            "ideal_triplets": ntr0,
            "traj_configs": n_cfg,
            "traj_triplets": n_tr,
            "traj_max_dE_eV": max_dE * HART_TO_EV,
            "traj_max_dmu_kT": max_dmu,
        }

    print(json.dumps(out))


if __name__ == "__main__":
    main()
