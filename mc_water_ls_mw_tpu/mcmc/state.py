"""Walker-ensemble sampler state and initialisation.

The reference keeps one Markov chain's state in Fortran module globals
(data_structures.f90, mc_moves.F90 module vars); the TPU rebuild keeps
a *batch* of W independent chains in one immutable pytree with leading
walker axis, so the whole ensemble advances under a single jitted
program and shards across chips along axis 0 (SURVEY.md §7).

Each walker carries BOTH coupled lattice replicas, absorbing the
reference's OpenMP-over-lattices parallelism (mc_moves.F90:1006) into
an array dimension.

Layout convention: WALKER-LAST.  Every batched array ends with the
walker axis W so that W (a multiple of 128) occupies the TPU lane
dimension and the small per-molecule/coordinate axes sit in sublanes -
walker-first layouts pad the scan carry 10-45x (see ops/dense.py).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..models.sw import SWParams
from ..ops.geometry import (
    cell_shift_range,
    determinant3,
    enumerate_shifts,
    recip_matrix,
)
from ..ops.dense import Moments
from ..ops.dsfloat import DS, ds_zeros
from .bins import BinGrid
from .config import RunParams


class SamplerState(NamedTuple):
    """Full sampler state; leading axis = walker everywhere.

    Mirrors of reference state are cited; fields without citations are
    bookkeeping the reference keeps in module saves.
    """

    # configuration state (data_structures.f90:34-53)
    r: jnp.ndarray            # [L,3,N,W] positions ('ljr'), coord-split
    ref_r: jnp.ndarray        # [L,3,N,W] reference-lattice positions
    h: jnp.ndarray            # [L,3,3,W] cell matrices
    recip: jnp.ndarray        # [L,3,3,W]
    volume: jnp.ndarray       # [L,W]
    energy: jnp.ndarray       # [L,W] incremental model energy
    mu: jnp.ndarray           # [W] lattice-switch order parameter
    ls: jnp.ndarray           # [W] int32 active lattice (0-based)

    # per-molecule three-body moment tensors - the gather-free
    # replacement for the reference's Verlet lists (ops/dense.py)
    moments: Moments          # ten fields, each [L,N,W]

    # multicanonical state (mc_moves.F90:65-71).  DELTA-SPLIT layout:
    # the per-walker [B,W] arrays hold only the GROWTH since the last
    # delta-sync (zeroed at every merge), so increments always land on
    # small, f32-resolvable accumulators; the running totals live in
    # the per-window double-single masters below.  Round 1 stored full
    # running totals here and the N=216 production run saturated at
    # the f32 ULP ceiling (see ops/dsfloat.py).
    weight: jnp.ndarray       # [B,W] WL weight growth since sync
    hist: jnp.ndarray         # [B,W] histogram growth since sync
    uhist: jnp.ndarray        # [B,W] unbiased-hist growth since sync
    f: jnp.ndarray            # [W] Wang-Landau modification factor
    sumhist: jnp.ndarray      # [W] (Swetnam accumulator)
    invt_active: jnp.ndarray  # [W] bool
    firstcycle: jnp.ndarray   # [W] bool (f never yet halved)
    histogram_reset: jnp.ndarray  # [W] bool (first-pass reset done)

    # merged MASTER totals, one row per mu-window, double-single f32
    # (~48 mantissa bits; ops/dsfloat.py) - the role of the reference's
    # f64 shared arrays + *_last_sync snapshots (comms_mpi.f90:244-530)
    # collapsed into one: the per-walker arrays ARE the deltas
    master_eta: DS            # [nwin,B] x2
    master_hist: DS           # [nwin,B] x2
    master_uhist: DS          # [nwin,B] x2

    # dd windows (mc_moves.F90:107-112); in 'mw' mode these span the
    # whole grid for every walker
    window_id: jnp.ndarray    # [W] int32
    my_mu_min: jnp.ndarray    # [W]
    my_mu_max: jnp.ndarray    # [W]
    start_bin: jnp.ndarray    # [W] int32 (0-based, inclusive)
    end_bin: jnp.ndarray      # [W] int32 (0-based, inclusive)
    in_window: jnp.ndarray    # [W] bool

    # adaptive step sizes (userparams mc_max_trans/mc_dv_max, per walker)
    max_trans: jnp.ndarray    # [W]
    dv_max: jnp.ndarray       # [W]

    # counters (mc_moves.F90:44-55)
    att: jnp.ndarray          # [3,W] attempted trans/vol/switch
    acc: jnp.ndarray          # [3,W] accepted
    trans_per_mol: jnp.ndarray  # [N,W]
    avg_energy: jnp.ndarray   # [L,W]
    min_dmu: jnp.ndarray      # [W]
    max_dmu: jnp.ndarray      # [W]

    cycle: jnp.ndarray        # int32 scalar
    key: jnp.ndarray          # [W,2] uint32 per-walker RNG
    shared_key: jnp.ndarray   # [2] uint32 (move-type schedule stream)

    # observability: total non-finite per-walker delta entries zeroed
    # by the delta-sync defence (engine._delta_merge) - should stay 0;
    # surfaced in the monitor block so silent drops are visible
    dropped: jnp.ndarray      # int32 scalar


class EngineAux(NamedTuple):
    """Init-time derived constants closed over by the engine."""

    shifts: jnp.ndarray        # [S,3] int32 static image shifts
    ref_h: jnp.ndarray         # [L,3,3] initial cells (never updated;
                               #   chain-sync anchor, model ref_hmatrix)
    ref_enthalpy: jnp.ndarray  # [L] (main.f90:146-150)
    log_unbiased_norm: float   # (mc_init:778-806)

    # candidate-reduction fast path (ops/nbrtable.py); None/0 = off
    nbr_tbl: np.ndarray | None = None  # [L,N,M] int32, sentinel N
    frac0: np.ndarray | None = None    # [L,3,N] static reference
                                       #   fractional coordinates
    wall: float = 0.0                  # displacement wall (Bohr)


def assign_windows(prm: RunParams, grid: BinGrid, n_windows: int):
    """dd-mode mu-window layout (mc_init:659-722), 0-based bins.

    Returns per-window (start_bin, end_bin inclusive, mu_min, mu_max).
    """
    B = grid.nbins
    bw = np.asarray(grid.binwidth)
    edges = np.concatenate([[prm.mu_min], prm.mu_min + np.cumsum(bw)])
    bpw = B // n_windows
    ov = prm.window_overlap
    wins = []
    for wid in range(n_windows):
        if wid == 0:
            s, e = 0, bpw + ov - 1
            lo, hi = prm.mu_min, edges[e + 1]
        elif wid == n_windows - 1:
            s, e = wid * bpw - ov - 1, B - 1
            lo, hi = edges[s], prm.mu_max
        else:
            s, e = wid * bpw - ov - 1, (wid + 1) * bpw + ov - 1
            lo, hi = edges[s], edges[e + 1]
        wins.append((s, e, lo, hi))
    return wins


def compute_log_unbiased_norm(prm: RunParams, grid: BinGrid,
                              weight0: np.ndarray, n_ranks: int) -> float:
    """Overflow-resistant log of the expected unbiased-histogram norm
    (mc_init:778-806).  ``n_ranks`` plays the role of MPI size (here:
    total walkers)."""
    hits_per_bin = (
        (prm.max_mc_cycles - prm.eq_mc_cycles)
        * float(n_ranks * prm.nwater)
        / grid.nbins
    )
    # guard short runs (max <= eq) against log of a non-positive count
    hits_per_bin = max(hits_per_bin, 1.0)
    incr = hits_per_bin * grid.av_binwidth
    logs = np.log(incr) + np.asarray(weight0, dtype=np.float64)
    return float(np.logaddexp.reduce(logs))


def init_state(
    prm: RunParams,
    model: SWParams,
    r0: np.ndarray,          # [L,N,3] Bohr
    H0: np.ndarray,          # [L,3,3] Bohr
    grid: BinGrid,
    weight0: np.ndarray | None = None,   # warm-start weights [B]
    n_windows: int = 1,
) -> tuple[SamplerState, EngineAux]:
    """Build the initial walker-ensemble state.

    Follows the reference init order: positions -> energy_init
    (ivects, neighbours, energies) -> ref_enthalpy -> mc_init windows
    -> initial mu (main.f90:98-175).
    """
    dtype = jnp.float64 if prm.dtype == "float64" else jnp.float32
    W = prm.n_walkers
    L = prm.num_lattices
    N = prm.nwater
    B = grid.nbins

    # static image shifts covering the Verlet radius for all lattices.
    # Computed from the INCOMING host arrays before any device_put: the
    # shift range is purely host-side, and a device->host round-trip
    # here is both pointless and a crash site when the shared TPU lease
    # wedges between the claim probe and first use (BENCH_r03 rc=1).
    H0_host = np.asarray(H0, dtype=np.float64)
    bounds = [cell_shift_range(H0_host[l], model.rskin)
              for l in range(L)]

    r0 = jnp.asarray(r0, dtype=dtype)
    H0 = jnp.asarray(H0, dtype=dtype)
    bmax = tuple(max(b[d] for b in bounds) for d in range(3))
    shifts = jnp.asarray(enumerate_shifts(bmax))

    # walker-last layout: [L,3,N,W] positions, [L,3,3,W] cells
    r = jnp.broadcast_to(
        jnp.transpose(r0, (0, 2, 1))[..., None], (L, 3, N, W)
    ).astype(dtype)
    h = jnp.broadcast_to(H0[..., None], (L, 3, 3, W)).astype(dtype)
    recip = jnp.stack([recip_matrix(h[l]) for l in range(L)])
    vol = jnp.abs(jnp.stack([determinant3(h[l]) for l in range(L)]))

    # all walkers start identical: compute one copy, broadcast
    from ..ops.dense import full_energy_dense

    e0, mom0 = jax.vmap(full_energy_dense, in_axes=(0, 0, None, None))(
        r0.reshape(L, N, 3), H0, shifts, model
    )
    energy = jnp.broadcast_to(e0[:, None], (L, W)).astype(dtype)
    moments = jax.tree.map(
        lambda x: jnp.broadcast_to(x[..., None], (L, N, W)).astype(dtype),
        mom0,
    )

    # reference enthalpies (main.f90:146-150)
    ref_enth = energy[:, 0]
    if prm.mc_ensemble == "npt":
        ref_enth = ref_enth + prm.pressure * vol[:, 0]
    if any(abs(x) > 1e-300 for x in prm.input_ref_enthalpy[:L]):
        ref_enth = jnp.asarray(prm.input_ref_enthalpy[:L], dtype=dtype)

    # initial order parameter (main.f90:170-175)
    if L == 2:
        mu0 = (
            energy[0] + prm.pressure * vol[0]
            - energy[1] - prm.pressure * vol[1]
        )
        if prm.leshift:
            mu0 = mu0 - ref_enth[0] + ref_enth[1]
        mu0 = mu0 * prm.beta - N * jnp.log(vol[0] / vol[1])
    else:
        mu0 = jnp.zeros((W,), dtype=dtype)

    # windows
    if prm.parallel_strategy == "dd" and L == 2 and n_windows > 1:
        wins = assign_windows(prm, grid, n_windows)
        wid = np.arange(W) % n_windows
        sb = np.array([wins[i][0] for i in wid], dtype=np.int32)
        eb = np.array([wins[i][1] for i in wid], dtype=np.int32)
        lo = np.array([wins[i][2] for i in wid])
        hi = np.array([wins[i][3] for i in wid])
        in_window = np.zeros(W, dtype=bool)
        # preset active lattice by window sign (mc_init:701-703)
        ls0 = np.full(W, prm.ls - 1, dtype=np.int32)
        ls0 = np.where(hi < 0.0, 0, ls0)
        ls0 = np.where(lo > 0.0, 1, ls0)
        nwin = n_windows
    else:
        wid = np.zeros(W, dtype=np.int32)
        sb = np.zeros(W, dtype=np.int32)
        eb = np.full(W, B - 1, dtype=np.int32)
        lo = np.full(W, prm.mu_min)
        hi = np.full(W, prm.mu_max)
        in_window = np.ones(W, dtype=bool)
        ls0 = np.full(W, prm.ls - 1, dtype=np.int32)
        nwin = 1

    if weight0 is None:
        weight0 = np.zeros(B)
    # Warm-start weights load into the MASTER rows; per-walker arrays
    # start at zero (they hold only growth since the last sync).
    # NOTE: the reference masks warm-start weights to each rank's
    # window (mc_init:808-814).  With dd_seeding (default) every
    # master row keeps the FULL global curve: WL updates only ever
    # touch in-window bins (the eta wall confines the walker), and
    # the unmasked curve is what lets pre-window walkers diffuse
    # across a flat landscape to far-tail windows during
    # equilibration (window seeding, engine._eta).  With a cold start
    # (weights zero) this is identical to the reference.
    # dd_seeding=False restores the reference's per-window masking
    # (A/B: test_window_seeding_ab).
    w0rows = np.broadcast_to(
        np.asarray(weight0, dtype=np.float64), (nwin, B)
    ).copy()
    if (not prm.dd_seeding) and nwin > 1:
        bins = np.arange(B)
        for wdx in range(nwin):
            sbx, ebx = wins[wdx][0], wins[wdx][1]
            w0rows[wdx, (bins < sbx) | (bins > ebx)] = 0.0
    master_eta = DS(
        jnp.asarray(w0rows, dtype=dtype),
        jnp.zeros((nwin, B), dtype=dtype),
    )

    log_norm = compute_log_unbiased_norm(prm, grid, weight0, W)

    key = jax.random.PRNGKey(prm.seed)
    shared_key, wkey = jax.random.split(key)
    walker_keys = jax.random.split(wkey, W)

    state = SamplerState(
        r=r,
        ref_r=r,
        h=h,
        recip=recip,
        volume=vol,
        energy=energy,
        mu=mu0.astype(dtype),
        ls=jnp.asarray(ls0),
        moments=moments,
        weight=jnp.zeros((B, W), dtype=dtype),
        hist=jnp.zeros((B, W), dtype=dtype),
        uhist=jnp.zeros((B, W), dtype=dtype),
        f=jnp.full((W,), prm.wl_factor, dtype=dtype),
        sumhist=jnp.zeros((W,), dtype=dtype),
        invt_active=jnp.zeros((W,), dtype=bool),
        firstcycle=jnp.ones((W,), dtype=bool),
        histogram_reset=jnp.zeros((W,), dtype=bool),
        master_eta=master_eta,
        master_hist=ds_zeros((nwin, B), dtype=dtype),
        master_uhist=ds_zeros((nwin, B), dtype=dtype),
        window_id=jnp.asarray(wid),
        my_mu_min=jnp.asarray(lo, dtype=dtype),
        my_mu_max=jnp.asarray(hi, dtype=dtype),
        start_bin=jnp.asarray(sb),
        end_bin=jnp.asarray(eb),
        in_window=jnp.asarray(in_window),
        max_trans=jnp.full((W,), prm.mc_max_trans, dtype=dtype),
        dv_max=jnp.full((W,), prm.mc_dv_max, dtype=dtype),
        att=jnp.zeros((3, W), dtype=jnp.int32),
        acc=jnp.zeros((3, W), dtype=jnp.int32),
        trans_per_mol=jnp.zeros((N, W), dtype=jnp.int32),
        avg_energy=jnp.zeros((L, W), dtype=dtype),
        min_dmu=jnp.full((W,), jnp.inf, dtype=dtype),
        max_dmu=jnp.zeros((W,), dtype=dtype),
        cycle=jnp.asarray(0, dtype=jnp.int32),
        key=walker_keys,
        shared_key=shared_key,
        dropped=jnp.asarray(0, dtype=jnp.int32),
    )
    # candidate-reduction fast path: static neighbour tables + wall
    # (ops/nbrtable.py), when the geometry allows it
    from ..ops.dense import reduced_shift_set
    from ..ops.nbrtable import build_nbr_tables, mic_unique

    nbr_tbl, frac0, wall = None, None, 0.0
    want_tbl = prm.nbr_table == "on" or (
        prm.nbr_table == "auto" and N >= 96
    )
    if prm.nbr_table == "on" and prm.trans_wall <= 0.0:
        raise ValueError(
            "nbr_table='on' requires trans_wall > 0 (the displacement "
            "wall is what makes the static tables exact; see "
            "ops/nbrtable.py)"
        )
    if want_tbl and prm.trans_wall > 0.0:
        r0n, H0n = np.asarray(r0, np.float64), np.asarray(H0, np.float64)
        mic_ok = mic_unique(H0n, model) and (
            len(reduced_shift_set(H0n, model)) == 1
        )
        if mic_ok:
            wall = float(prm.trans_wall)
            nbr_tbl = build_nbr_tables(r0n, H0n, model, wall)
            frac0 = np.stack([
                r0n[l] @ np.linalg.inv(H0n[l]).T for l in range(L)
            ]).transpose(0, 2, 1)                       # [L,3,N]
        elif prm.nbr_table == "on":
            raise ValueError(
                "nbr_table='on' requires a MIC-unique box (all "
                "perpendicular widths > 2*rc) with a single residual "
                "image shift; use nbr_table='auto' or 'off'"
            )

    aux = EngineAux(
        shifts=shifts,
        ref_h=H0,
        ref_enthalpy=ref_enth.astype(dtype),
        log_unbiased_norm=log_norm,
        nbr_tbl=nbr_tbl,
        frac0=frac0,
        wall=wall,
    )
    return state, aux
