"""Stillinger-Weber (mW) energy kernels - the hot compute path.

TPU-native rebuild of the reference energy engine
(reference: molint.F90).  Two kernels:

* :func:`full_energy` - whole-cell energy, used at init, for volume
  moves and for drift audits (reference compute_model_energy,
  molint.F90:407-499).
* :func:`translation_energies` - local energy of one molecule evaluated
  at its old AND new trial position with shared neighbour gathers
  (reference compute_local_real_energy, molint.F90:220-404, which is
  called 4x per trial translation).

Instead of the Fortran's serial loops + MKL vdinvsqrt batches, every
term set is a dense masked array op so XLA fuses the whole evaluation
into a single vectorised kernel; the walker/lattice axes are added by
``jax.vmap`` so thousands of independent Markov chains evaluate
simultaneously (the architectural inversion described in SURVEY.md §7).

Reference quirks replicated deliberately:
* local (but not full-cell) three-body terms drop cos(theta) >= 0.99
  (molint.F90:367-371) - this removes the degenerate k==i direction in
  the j-centred gather and is numerically safe because the smooth
  cutoff kills genuinely near-collinear triplets;
* pair terms are halved in the full-cell sum (each pair visited twice,
  molint.F90:464) but unhalved in the local sum (molint.F90:294-297).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.sw import SWParams


def _pair_term(r2_safe, rij, in_rc, prm: SWParams):
    """A*eps*(B*(sigma/r)^4 - 1) * exp(sigma/(r - a*sigma)), masked.

    Denominator clamped strictly negative: rounded rij can hit rc
    exactly while r^2 < rc^2 (ops/dense._DENOM_CLAMP note)."""
    from .dense import _DENOM_CLAMP

    sig2 = prm.sigma * prm.sigma
    denom = jnp.minimum(
        jnp.where(in_rc, rij - prm.rc, -1.0), _DENOM_CLAMP
    )
    expf = jnp.exp(prm.sigma / denom)
    frac = sig2 * sig2 / (r2_safe * r2_safe)
    e = prm.bigA * prm.epsilon * (prm.bigB * frac - 1.0) * expf
    return jnp.where(in_rc, e, 0.0)


def _leg_exp(rij, in_rc, prm: SWParams):
    """exp(gamma*sigma/(r - a*sigma)) per three-body leg, masked to 0."""
    from .dense import _DENOM_CLAMP

    denom = jnp.minimum(
        jnp.where(in_rc, rij - prm.rc, -1.0), _DENOM_CLAMP
    )
    return jnp.where(in_rc, jnp.exp(prm.gamma * prm.sigma / denom), 0.0)


def full_energy(r, H, nbr, prm: SWParams):
    """Whole-cell SW energy of one lattice (molint.F90:407-499).

    r:   [N, 3] positions (Bohr)
    H:   [3, 3] cell matrix
    nbr: NeighbourList (padded, includes skin entries beyond the
         cutoff - in-range masks are recomputed here, as the reference
         re-tests r2 < rc^2 at every use, molint.F90:454)
    """
    img = nbr.shift.astype(r.dtype) @ H.T          # [N, K, 3]
    rj = r[nbr.idx] + img                          # [N, K, 3]
    d = rj - r[:, None, :]                         # [N, K, 3]
    r2 = jnp.sum(d * d, axis=-1)                   # [N, K]
    in_rc = nbr.mask & (r2 < prm.rc2)
    r2s = jnp.where(in_rc, r2, 1.0)
    rij = jnp.sqrt(r2s)

    # pair terms, halved: each (i, j) visited from both ends
    # (molint.F90:464)
    e_pair = 0.5 * jnp.sum(_pair_term(r2s, rij, in_rc, prm))

    # three-body terms centred on i over unordered neighbour pairs
    # (a < b), each angle counted once (molint.F90:467-487); no
    # cos-filter in the full-cell sum.
    inv_r = 1.0 / rij
    u = d * inv_r[..., None]                       # unit vectors [N, K, 3]
    cosq = jnp.einsum("ika,ila->ikl", u, u,
                      precision=jax.lax.Precision.HIGHEST)        # [N, K, K]
    leg = _leg_exp(rij, in_rc, prm)                # [N, K]
    K = leg.shape[-1]
    tri = jnp.triu(jnp.ones((K, K), dtype=bool), k=1)
    pref = (cosq - prm.cos0) ** 2
    terms = pref * leg[:, :, None] * leg[:, None, :]
    e3 = jnp.sum(jnp.where(tri[None, :, :], terms, 0.0))

    return e_pair + prm.lam * prm.epsilon * e3


def _local_terms(p, jlj, mj, klj, mk, prm: SWParams):
    """Local energy of a molecule at ``p`` given gathered neighbourhood.

    jlj: [K, 3]  absolute positions of its neighbours (image applied)
    mj:  [K]     neighbour slot validity
    klj: [K, K, 3] absolute positions of each neighbour's neighbours,
         translated into the neighbour's image frame
         (molint.F90:324-343: ivect(:,ki) + j_ivect)
    mk:  [K, K]  slot validity of the above
    """
    dij = jlj - p[None, :]
    r2ij = jnp.sum(dij * dij, axis=-1)
    in_j = mj & (r2ij < prm.rc2)
    r2s = jnp.where(in_j, r2ij, 1.0)
    rij = jnp.sqrt(r2s)
    inv_rij = 1.0 / rij

    # unhalved pair terms (molint.F90:294-297)
    e_pair = jnp.sum(_pair_term(r2s, rij, in_j, prm))

    leg_j = _leg_exp(rij, in_j, prm)               # [K]

    # i-centred angles j-i-k over unordered pairs (molint.F90:302-318),
    # with the local-path cos < 0.99 screen (molint.F90:367)
    u = dij * inv_rij[..., None]
    cos_ik = jnp.einsum("ka,la->kl", u, u,
                        precision=jax.lax.Precision.HIGHEST)
    K = leg_j.shape[0]
    tri = jnp.triu(jnp.ones((K, K), dtype=bool), k=1)
    m_i = tri & in_j[:, None] & in_j[None, :] & (cos_ik < 0.99)
    t_i = (cos_ik - prm.cos0) ** 2 * leg_j[:, None] * leg_j[None, :]
    e3_i = jnp.sum(jnp.where(m_i, t_i, 0.0))

    # j-centred angles i-j-k for each neighbour j and each of j's
    # neighbours k (molint.F90:324-343)
    djk = klj - jlj[:, None, :]
    r2jk = jnp.sum(djk * djk, axis=-1)
    in_k = mk & (r2jk < prm.rc2)
    r2ks = jnp.where(in_k, r2jk, 1.0)
    rjk = jnp.sqrt(r2ks)
    leg_k = _leg_exp(rjk, in_k, prm)               # [K, K]
    # cos(theta_ijk): angle at j between (i - j) and (k - j)
    cos_ijk = jnp.einsum("ka,kla->kl", -dij, djk,
                         precision=jax.lax.Precision.HIGHEST) * (
        inv_rij[:, None] / rjk
    )
    m_j = in_j[:, None] & in_k & (cos_ijk < 0.99)
    t_j = (cos_ijk - prm.cos0) ** 2 * leg_j[:, None] * leg_k
    e3_j = jnp.sum(jnp.where(m_j, t_j, 0.0))

    return e_pair + prm.lam * prm.epsilon * (e3_i + e3_j)


def local_energy(r, H, nbr, i, p, prm: SWParams):
    """Local SW energy of molecule ``i`` evaluated at position ``p``.

    Single-evaluation form of compute_local_real_energy
    (molint.F90:220-404).  ``r`` holds the stored positions; the
    evaluation substitutes ``p`` for molecule i everywhere it appears
    (the reference achieves this by updating ljr before the call,
    mc_moves.F90:1076-1083).
    """
    jn = nbr.idx[i]                                # [K]
    sj = nbr.shift[i]
    mj = nbr.mask[i]
    pj = jnp.where((jn == i)[:, None], p[None, :], r[jn])
    jlj = pj + sj.astype(r.dtype) @ H.T

    kn = nbr.idx[jn]                               # [K, K]
    sk = nbr.shift[jn]
    mk = nbr.mask[jn]
    pk = jnp.where((kn == i)[..., None], p[None, None, :], r[kn])
    klj = pk + (sk + sj[:, None, :]).astype(r.dtype) @ H.T

    return _local_terms(p, jlj, mj, klj, mk, prm)


def translation_energies(r, H, nbr, i, p_new, prm: SWParams):
    """(E_old, E_new) for molecule ``i`` moving to ``p_new``.

    Shares the neighbour gathers between the old- and new-position
    evaluations; the reference instead calls
    compute_local_real_energy twice per lattice
    (mc_moves.F90:1007-1018, 1076-1092).
    """
    p_old = r[i]
    jn = nbr.idx[i]
    sj = nbr.shift[i]
    mj = nbr.mask[i]
    img_j = sj.astype(r.dtype) @ H.T
    pj = r[jn]

    kn = nbr.idx[jn]
    sk = nbr.shift[jn]
    mk = nbr.mask[jn]
    img_k = (sk + sj[:, None, :]).astype(r.dtype) @ H.T
    pk = r[kn]

    self_j = (jn == i)[:, None]
    self_k = (kn == i)[..., None]

    e_old = _local_terms(
        p_old,
        jnp.where(self_j, p_old[None, :], pj) + img_j,
        mj,
        jnp.where(self_k, p_old[None, None, :], pk) + img_k,
        mk,
        prm,
    )
    e_new = _local_terms(
        p_new,
        jnp.where(self_j, p_new[None, :], pj) + img_j,
        mj,
        jnp.where(self_k, p_new[None, None, :], pk) + img_k,
        mk,
        prm,
    )
    return e_old, e_new


# Batched wrappers: leading axes (walker W, lattice L).
full_energy_batched = jax.vmap(
    jax.vmap(full_energy, in_axes=(0, 0, 0, None)),
    in_axes=(0, 0, 0, None),
)

# per walker: molecule index i is shared across the two lattices
# (the same molecule moves in both replicas, mc_moves.F90:1006-1018)
translation_energies_batched = jax.vmap(
    jax.vmap(translation_energies, in_axes=(0, 0, 0, None, 0, None)),
    in_axes=(0, 0, 0, 0, 0, None),
)

local_energy_batched = jax.vmap(
    jax.vmap(local_energy, in_axes=(0, 0, 0, None, 0, None)),
    in_axes=(0, 0, 0, 0, 0, None),
)
