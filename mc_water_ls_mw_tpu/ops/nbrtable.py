"""Static reference-lattice neighbour tables for the fused fast path.

The reference's hot kernel touches ~17 Verlet neighbours per move
(molint.F90:79, compute_neighbours:501-559); the dense moment
formulation (ops/dense.py) instead evaluates ALL N candidates to stay
gather-free, which caps the per-chip rate at the VPU roofline of
O(N·W) work per trial move.  This module restores the reference's
O(neighbours) cost model TPU-natively:

Lattice-switch MC is a SOLID-phase method - the chain-synchronisation
step (mc_check_chain_synchronisation, mc_moves.F90:2217-2416) forces
every molecule's fractional displacement from its reference site to
match across replicas, so molecules never diffuse between sites.  The
build exploits that invariant structurally:

* a per-lattice STATIC table of candidate partners, built once from
  the reference (ideal-lattice) positions with radius
  rc + 2*d_wall (+ volume-breathing margin): if both molecules stay
  within ``d_wall`` of their reference sites, every pair that can
  possibly come within the interaction cutoff is in the table;
* a hard displacement WALL at ``d_wall``: trial translations that
  would take a molecule farther than d_wall from its reference site
  are rejected outright.  The wall depends only on the proposed
  state, so detailed balance is preserved (the sampled ensemble is
  the SW ensemble restricted to the solid basin - the same basin the
  lattice-switch construction already assumes; the truncated
  configurations carry e^{-O(100)} weight at 200 K).  The same
  pattern as the cell engine's fine-cell wall (mcmc/cellengine.py).
* a SHARED molecule schedule: all walkers move the same molecule
  index at step t (drawn fresh every cycle from the shared schedule
  stream, like the move-type codes).  Molecule choice is
  state-independent and uniform, so each chain's law is unchanged;
  walkers are correlated only through the schedule, exactly as they
  already are through the shared move-type schedule.  This is what
  makes the candidate gather a per-step scalar-indexed slice instead
  of a per-walker gather.

The scan path keeps its dense candidate evaluation (an exact superset)
while honouring the same wall and schedule, so fused-vs-scan
equivalence tests double as a table-completeness oracle.
"""

from __future__ import annotations

import numpy as np

from ..models.sw import SWParams


# NPT volume-breathing margin baked into the capture radius.  The
# dense engine ENFORCES it at runtime: volume moves that would shrink
# any perpendicular box width below 1/BREATHING of the reference
# geometry are rejected (Engine._volume), so the static tables remain
# a superset of all in-range pairs for every reachable box.
BREATHING = 1.03


def table_radius(model: SWParams, d_wall: float,
                 breathing: float = BREATHING) -> float:
    """Pair-capture radius: molecules within d_wall of their reference
    sites can only interact within rc if their reference sites are
    within rc + 2*d_wall; ``breathing`` covers NPT cell fluctuation
    (guarded at runtime, see BREATHING)."""
    return (model.rc + 2.0 * d_wall) * breathing


def build_nbr_tables(r0, H0, model: SWParams, d_wall: float,
                     pad_to: int = 8) -> np.ndarray:
    """Per-lattice static candidate tables from reference positions.

    r0 [L,N,3], H0 [L,3,3] (Bohr).  Returns int32 [L, N, M] of partner
    indices, padded with the sentinel N (callers mask ``idx < N``);
    M is the max per-lattice neighbour count rounded up to a multiple
    of ``pad_to``.

    Requires a MIC-unique geometry (every perpendicular box width
    > 2*rc); the caller checks via ``mic_unique``.
    """
    r0 = np.asarray(r0, dtype=np.float64)
    H0 = np.asarray(H0, dtype=np.float64)
    L, N, _ = r0.shape
    rt = table_radius(model, d_wall)
    adj = []
    for l in range(L):
        Hinv = np.linalg.inv(H0[l])
        d = r0[l][:, None, :] - r0[l][None, :, :]
        f = d @ Hinv.T
        f -= np.round(f)
        d = f @ H0[l].T
        dist2 = np.einsum("ijk,ijk->ij", d, d)
        np.fill_diagonal(dist2, np.inf)
        adj.append(dist2 < rt * rt)
    m_max = max(int(a.sum(axis=1).max()) for a in adj)
    M = -(-m_max // pad_to) * pad_to
    tbl = np.full((L, N, M), N, dtype=np.int32)
    for l in range(L):
        for i in range(N):
            js = np.nonzero(adj[l][i])[0]
            tbl[l, i, : len(js)] = js
    return tbl


def mic_unique(H0, model: SWParams, breathing: float = 1.03) -> bool:
    """True when every perpendicular box width exceeds twice the
    interaction cutoff (with NPT breathing margin): then at most one
    periodic image of a pair can be inside the cutoff at a time, the
    runtime MIC fold finds it, and the table needs no per-entry image
    shifts.  (Table CAPTURE is independent of this: the interacting
    image's reference separation is never below the MIC reference
    separation, so the MIC-distance test in build_nbr_tables catches
    every pair regardless of which image interacts.)"""
    H0 = np.asarray(H0, dtype=np.float64).reshape(-1, 3, 3)
    reach = model.rc * breathing
    for H in H0:
        vol = abs(np.linalg.det(H))
        for a in range(3):
            b, c = (a + 1) % 3, (a + 2) % 3
            width = vol / np.linalg.norm(np.cross(H[:, b], H[:, c]))
            if width <= 2.0 * reach:
                return False
    return True
