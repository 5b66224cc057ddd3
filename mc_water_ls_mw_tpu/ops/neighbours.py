"""Padded fixed-capacity Verlet neighbour lists.

TPU-native equivalent of the reference neighbour machinery
(reference: molint.F90:501-559 ``compute_neighbours`` and
molint.F90:174-217 ``compute_ivects``).  Design inversion for XLA:

* Instead of a per-lattice table of image *vectors* (``ivect``) indexed
  by each neighbour entry, every neighbour slot stores its integer cell
  shift (i, j, k).  The image vector is recovered as H @ shift, which
  stays exact across volume moves just as the reference's index-into-
  rebuilt-ivect scheme does (mc_moves.F90:1353-1356), with no table to
  rebuild.
* The variable-length Fortran lists (counts ``nn``, partners ``jn``,
  images ``vn``, capacity maxneigh=50, molint.F90:79-81) become
  fixed-capacity padded arrays with a validity mask - static shapes for
  jit.
* The brute-force O(N^2 * n_images) search is a dense batched distance
  computation + stable top_k compaction; entries come out in the same
  (partner-major, image-minor) order as the reference loops
  (molint.F90:520-549).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class NeighbourList(NamedTuple):
    """Padded neighbour list for one lattice.

    idx:   [N, K] int32   partner molecule index (0 in padded slots)
    shift: [N, K, 3] int32 integer cell shift of the partner image
    mask:  [N, K] bool    slot validity
    count: [N] int32      true neighbour count (may exceed K: check!)
    """

    idx: jnp.ndarray
    shift: jnp.ndarray
    mask: jnp.ndarray
    count: jnp.ndarray


def build_neighbour_list(r, H, shifts, capacity, rskin):
    """Build the padded neighbour list of one lattice.

    r:        [N, 3] positions (Bohr)
    H:        [3, 3] cell matrix (columns = lattice vectors)
    shifts:   [S, 3] static integer cell shifts (null shift first)
    capacity: static int K (reference maxneigh=50, molint.F90:79)
    rskin:    Verlet radius = 1.18 * cutoff (molint.F90:516)

    A molecule is its own neighbour only through non-null images
    (molint.F90:532: the (k==1 .and. jmol==imol) cycle).
    """
    N = r.shape[0]
    S = shifts.shape[0]
    img = shifts.astype(r.dtype) @ H.T                       # [S, 3]
    disp = (r[None, :, None, :] + img[None, None, :, :]
            - r[:, None, None, :])                           # [N, N, S, 3]
    d2 = jnp.sum(disp * disp, axis=-1)                       # [N, N, S]

    is_null = jnp.all(shifts == 0, axis=-1)                  # [S]
    self_pair = jnp.eye(N, dtype=bool)[:, :, None] & is_null[None, None, :]
    valid = (d2 < rskin * rskin) & ~self_pair                # [N, N, S]

    flat = valid.reshape(N, N * S)
    count = jnp.sum(flat, axis=-1).astype(jnp.int32)

    # Stable top_k keeps valid entries in (j-major, image-minor) order,
    # matching the reference's loop nest (molint.F90:525-549).
    key = flat.astype(jnp.float32)
    kv, ki = jax.lax.top_k(key, capacity)                    # [N, K]
    mask = kv > 0.5
    j_idx = (ki // S).astype(jnp.int32)
    s_idx = ki % S
    shift = jnp.where(mask[..., None], shifts[s_idx], 0).astype(jnp.int32)
    idx = jnp.where(mask, j_idx, 0)
    return NeighbourList(idx=idx, shift=shift, mask=mask, count=count)


# Batched over (walker, lattice) leading axes: r [..., N, 3], H [..., 3, 3].
build_neighbour_list_batched = jax.vmap(
    jax.vmap(build_neighbour_list, in_axes=(0, 0, None, None, None)),
    in_axes=(0, 0, None, None, None),
)


def build_neighbour_list_chunked(r, H, shifts, capacity, rskin, chunk=128):
    """Walker-chunked rebuild to bound the [W,L,N,N,S] peak memory.

    Equivalent to build_neighbour_list_batched; used for large walker
    ensembles where the dense distance tensor would not fit.
    """
    W = r.shape[0]
    if W <= chunk:
        return build_neighbour_list_batched(r, H, shifts, capacity, rskin)
    if W % chunk:
        raise ValueError(f"walker count {W} not divisible by chunk {chunk}")

    def body(args):
        rc_, Hc_ = args
        return build_neighbour_list_batched(rc_, Hc_, shifts, capacity, rskin)

    rr = r.reshape(W // chunk, chunk, *r.shape[1:])
    HH = H.reshape(W // chunk, chunk, *H.shape[1:])
    out = jax.lax.map(body, (rr, HH))
    return jax.tree.map(lambda x: x.reshape(W, *x.shape[2:]), out)
