"""The Monte-Carlo engine: batched moves, WL updates, cycle driver.

TPU-native rebuild of mc_moves.F90.  Design (SURVEY.md §7):

* One trial move advances ALL walkers simultaneously; a cycle is a
  ``lax.scan`` of nwater move steps (the chain is inherently
  sequential per walker, mc_cycle:224-250 - all parallelism comes from
  the walker axis, the two lattice replicas and the dense candidate
  arithmetic).
* State is WALKER-LAST: every batched array ends with the walker axis
  (a multiple of the 128-lane width), so the scan carry is tile-packed
  - walker-first layouts padded the carry 10-45x and dominated step
  time.
* Move *types* are drawn per step from a shared schedule stream, so
  every walker executes the same (masked) kernels each step: the
  choice is state-independent, preserving per-walker detailed balance
  (the reference draws types per rank, mc_cycle:226-241).  The rare
  volume moves are hoisted to a once-per-cycle conditional - in-scan
  lax.switch branching costs milliseconds per step on TPU.
* Wang-Landau weight/histogram updates are batched one-hot adds on
  [nbins, W] arrays; walkers play the role of the reference's MPI
  ranks, merged with the same delta-allreduce semantics
  (comms_mpi.f90:244-530) by summing over the (sharded) walker axis -
  XLA turns that into the ICI collective under a device mesh.
* Data-dependent per-cycle events (delta-sync, chain resync) run under
  ``lax.cond`` at cycle granularity; file-IO events
  (monitor/flatness/checkpoint) happen host-side at block boundaries
  (app layer).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

# 3-wide cell-matrix contractions MUST run at full f32: on TPU the
# default einsum/matmul precision multiplies in bf16 (~4e-3 relative),
# which injects coupling noise between the two replicas' position
# fields on every volume move and corrupts the mu landscape.
_einsum = functools.partial(
    jnp.einsum, precision=jax.lax.Precision.HIGHEST
)

from ..models.sw import SWParams
from ..ops.geometry import determinant3, recip_matrix
from ..ops.dense import (
    Moments,
    full_energy_batch,
    local_energies_batch,
    reduced_shift_set,
)
from ..ops.dsfloat import ds_add, ds_sub, ds_value, ds_where
from .bins import ETA_WALL, BinGrid, mu_to_bin
from .config import RunParams
from .state import EngineAux, SamplerState

TRANS, VOL, SWITCH, NOOP = 0, 1, 2, 3


def _take_lat(arr, ls):
    """arr [L, ..., W] selected per-walker by ls [W] -> [..., W]."""
    idx = ls.reshape((1,) + (1,) * (arr.ndim - 2) + (-1,))
    return jnp.take_along_axis(arr, idx, axis=0)[0]


def _per_lat(moments: Moments, l: int) -> Moments:
    return Moments(*(f[l] for f in moments))


def _stack_moments(per_lat) -> Moments:
    return Moments(*(jnp.stack(f) for f in zip(*per_lat)))


class Engine:
    """Jit-compiled sampler over a fixed (params, model, grid).

    All configuration is closed over as compile-time constants; the
    state pytree is the only runtime argument (so the same compiled
    program also runs sharded over a device mesh).
    """

    def __init__(self, prm: RunParams, model: SWParams, grid: BinGrid,
                 aux: EngineAux, mesh=None):
        self.prm = prm
        self.mesh = mesh
        self.model = model
        self.grid = grid
        self.aux = aux
        self.probs = prm.normalised_probs()
        # MIC-folded fast path: displacements folded by minimum image
        # with a reduced residual shift set (1-3 candidates instead of
        # the full enumeration; ops/dense.py reduced_shift_set)
        self.fold_shifts = reduced_shift_set(aux.ref_h, model)
        # candidate-reduction fast path (ops/nbrtable.py): static
        # neighbour tables + shared molecule schedule + displacement
        # wall, built by init_state when the geometry allows
        self.tbl = getattr(aux, "nbr_tbl", None)
        self.wall = float(getattr(aux, "wall", 0.0) or 0.0)
        if self.tbl is not None:
            # runtime guard for the tables' baked-in breathing margin
            # (ops/nbrtable.BREATHING): the volume move rejects boxes
            # whose perpendicular widths shrink below 1/BREATHING of
            # the reference geometry (table completeness), and any box
            # that carries a molecule beyond the displacement wall
            # (detailed balance of the wall; see _volume)
            from ..ops.cells import perp_widths
            from ..ops.nbrtable import BREATHING

            ref_h_np = np.asarray(aux.ref_h, np.float64)
            self._tbl_min_w = np.stack([
                perp_widths(ref_h_np[l])
                for l in range(ref_h_np.shape[0])
            ]) / BREATHING                                 # [L,3]
        # fused whole-cycle Pallas kernel (mcmc/fused.py): the hot
        # N-step inner loop with per-walker state resident in VMEM
        if prm.fused == "auto":
            self.use_fused = jax.default_backend() != "cpu"
        else:
            self.use_fused = prm.fused == "on"
        if self.use_fused and jax.default_backend() != "cpu":
            per_shard = prm.n_walkers // (mesh.size if mesh else 1)
            if per_shard % 128 != 0:
                # the kernel's HBM moment-slab DMA slices along the
                # walker axis, which Mosaic requires 128-lane aligned
                self.use_fused = False
                if prm.fused != "off":
                    import warnings

                    warnings.warn(
                        f"fused cycle kernel disabled: {per_shard} "
                        "walkers per device shard is not a multiple "
                        "of 128 (the scan path is ~7x slower; pick "
                        "n_walkers so W/devices % 128 == 0)",
                        stacklevel=2,
                    )
        # anchored-window multi-trial on the dense path
        # (fused._do_translation_tbl_multi): validate the envelope
        self.dT = max(1, int(prm.dense_trials))
        if self.dT > 1:
            if prm.num_lattices != 2:
                raise ValueError(
                    "dense_trials > 1 requires num_lattices = 2"
                )
            if self.tbl is None:
                raise ValueError(
                    "dense_trials > 1 requires the candidate-"
                    "reduction table mode (nbr_table; MIC-unique box)"
                )
            if not self.use_fused:
                raise ValueError(
                    "dense_trials > 1 runs only through the fused "
                    "cycle kernel: set fused='on' (interpret mode on "
                    "CPU)"
                )
            if prm.nwater % self.dT:
                raise ValueError(
                    f"dense_trials={self.dT} must divide nwater="
                    f"{prm.nwater} (trials per cycle stay nwater)"
                )
        if self.use_fused:
            from .fused import FusedCycle
            from ..ops.pallas_energy import FullEnergyPallas
            self.fused_cycle = FusedCycle(
                prm, model, grid, aux, self.fold_shifts, mesh=mesh
            )
            # chunked Pallas full-cell kernel for the volume move /
            # chain resync (the XLA dense evaluation materialises
            # [N,S,N,W] intermediates - 57 ms/lattice at N=216 W=4096)
            self.pallas_full_energy = FullEnergyPallas(
                model, self.fold_shifts, mesh=mesh
            )
        # injectable RNG stream (None = production threefry); see
        # set_recorded_stream
        self.rec = None
        # jitted entry points.  NOTE: run_cycles deliberately does NOT
        # donate the state: donation made the fused dense-path cycle
        # kernel fail with a backend InvalidArgument on TPU (aliased
        # pallas outputs + donated inputs), measured no real gain on
        # the cell engine (its carry aliases in place without it), and
        # CPU oracle tests legitimately reuse input states.
        self.run_cycles = jax.jit(self._run_cycles, static_argnums=1)
        self.sync_all = jax.jit(self._sync_all)
        self.resync_chains = jax.jit(self._resync_chains)
        self.audit_energy = jax.jit(self._audit_energy)

    # ------------------------------------------------------------------
    # helpers
    # ------------------------------------------------------------------

    def set_recorded_stream(self, codes, u):
        """Drive the chain from a RECORDED uniform stream instead of
        threefry - the cross-implementation parity oracle mode
        (SURVEY.md §7 step 4; BASELINE.json north star 'energies match
        ... under identical RNG streams'; the stream being replayed
        mimics the role of the reference's random_uniform_random,
        random.f90:87-102).

        codes: [C, N] int32 per-cycle move-type codes (TRANS/SWITCH/
               NOOP; recorded VOL moves are not supported - volume
               moves draw extra shape uniforms internally)
        u:     [C, N, 7] per-move uniforms
               (imol, dir x3, magnitude, accept, switch)

        Every walker consumes the same stream, so this mode is meant
        for W=1 chains replayed against an independent implementation
        (tests/oracle.py mc_chain).  Cycles beyond C wrap around.
        Call before the first run_cycles (the flag is a compile-time
        constant).
        """
        codes = jnp.asarray(codes, jnp.int32)
        u = jnp.asarray(u)
        assert codes.ndim == 2 and u.ndim == 3 and u.shape[2] == 7
        assert codes.shape == u.shape[:2]
        assert not bool((codes == VOL).any()), \
            "recorded VOL moves unsupported"
        self.rec = (codes, u)

    def _dtype(self, s: SamplerState):
        return s.r.dtype

    def _full_energy_mic(self, r_l, h_l):
        """MIC-folded full-cell energy+moments of one lattice;
        Pallas-chunked on the fused path, XLA dense otherwise."""
        if self.use_fused:
            return self.pallas_full_energy(r_l, h_l)
        return full_energy_batch(
            r_l, h_l, self.fold_shifts, self.model, True
        )

    def _mu_scratch(self, energy, volume):
        """Order parameter from scratch (mc_moves.F90:856-862).

        energy/volume: [L, W] -> [W]."""
        prm = self.prm
        mu = (
            energy[0] + prm.pressure * volume[0]
            - energy[1] - prm.pressure * volume[1]
        )
        if prm.leshift:
            mu = mu - self.aux.ref_enthalpy[0] + self.aux.ref_enthalpy[1]
        return mu * prm.beta - prm.nwater * jnp.log(volume[0] / volume[1])

    def _weight_total(self, s: SamplerState):
        """Per-walker view of the CURRENT weight curve: merged master
        (per-window double-single rows, ops/dsfloat.py) + this
        walker's growth since the last sync.  [B, W]."""
        base = ds_value(s.master_eta)                  # [nwin, B]
        return s.weight + base[s.window_id].T

    def _hist_total(self, s: SamplerState, hist=None):
        """Same view for the visits histogram (Swetnam f).  ``hist``
        overrides the per-walker delta (the WL update paths pass the
        freshly incremented one)."""
        base = ds_value(s.master_hist)
        h = s.hist if hist is None else hist
        return h + base[s.window_id].T

    def _dd_track_window(self, s: SamplerState, cycle):
        """dd-mode in_window tracking (mc_cycle:181-210).

        dd_seeding=True (default): non-sticky during equilibration -
        the flag mirrors the CURRENT position each cycle, frozen at
        the eq boundary, all-True after (confinement then comes from
        the eta wall pulling strays into their windows).
        dd_seeding=False: the reference's reach-once semantics - the
        flag LATCHES on first entry and the eta wall confines the
        walker from that moment on."""
        prm = self.prm
        now_in = (s.mu > s.my_mu_min) & (s.mu < s.my_mu_max)
        ones = jnp.ones_like(s.in_window)
        if prm.dd_seeding:
            in_window = jnp.where(
                cycle < prm.eq_mc_cycles,
                now_in,
                jnp.where(cycle == prm.eq_mc_cycles, s.in_window,
                          ones),
            )
        else:
            in_window = jnp.where(
                cycle <= prm.eq_mc_cycles, s.in_window | now_in, ones
            )
        return s._replace(in_window=in_window)

    def _eta(self, s: SamplerState, mu):
        """Multicanonical weight eta(mu) per walker (batched form of
        bins.eta_weight; reference mc_moves.F90:893-964)."""
        return self._eta_from_weight(s, self._weight_total(s), mu)

    def _eta_from_weight(self, s: SamplerState, weight, mu):
        """eta(mu) against an explicit weight view [B, W] — callers
        evaluating eta repeatedly against a FROZEN curve (the cell
        engine's per-sub-step acceptance chain) hoist the
        `_weight_total` build out of their loop."""
        prm, grid = self.prm, self.grid
        B = grid.nbins
        k = jnp.clip(mu_to_bin(grid, mu), 0, B - 1)    # [W]

        if not prm.eta_interp:
            eta = jnp.take_along_axis(weight, k[None, :], axis=0)[0]
        else:
            km = jnp.clip(k - 1, 0, B - 1)
            kp = jnp.clip(k + 1, 0, B - 1)
            w_k = jnp.take_along_axis(weight, k[None, :], axis=0)[0]
            w_km = jnp.take_along_axis(weight, km[None, :], axis=0)[0]
            w_kp = jnp.take_along_axis(weight, kp[None, :], axis=0)[0]
            bw = grid.binwidth
            bw_k, bw_km, bw_kp = bw[k], bw[km], bw[kp]
            mub_k, mub_km = grid.mu_bin[k], grid.mu_bin[km]

            grad_up = 2.0 * (w_kp - w_k) / (bw_k + bw_kp)
            grad_dn = 2.0 * (w_k - w_km) / (bw_k + bw_km)
            eta_first = w_k + (mu - mub_k) * grad_up
            eta_last = w_k + (mu - mub_k) * grad_dn
            eta_mid_up = w_k + (mu - mub_k) * grad_up
            eta_mid_dn = w_km + (mu - mub_km) * grad_dn
            eta = jnp.where(
                k == s.start_bin,
                eta_first,
                jnp.where(
                    k == s.end_bin,
                    eta_last,
                    jnp.where(mu > mub_k, eta_mid_up, eta_mid_dn),
                ),
            )

        wall = (mu < s.my_mu_min) | (mu > s.my_mu_max)
        walled = jnp.where(wall, ETA_WALL, eta)
        # before a walker has reached its dd window it samples under
        # the WALL-LESS global curve: with zero (cold-start) weights
        # this is the reference's unbiased approach (mc_moves.F90:913);
        # with a warm-started global curve the landscape is flat, so
        # walkers diffuse to far-tail windows the unbiased walk could
        # never climb to (window seeding - see runs/n216_wl_dd).
        # dd_seeding=False restores the reference's strictly unbiased
        # pre-window sampling (A/B: test_window_seeding_ab)
        pre = eta if self.prm.dd_seeding else jnp.zeros_like(eta)
        return jnp.where(s.in_window, walled, pre)

    # ------------------------------------------------------------------
    # Wang-Landau per-move update (mc_update_wl_bins, mc_moves.F90:1597-1689)
    # ------------------------------------------------------------------

    def _wl_healthy(self, s) -> jnp.ndarray:
        """[W] bool gate for writes into the SHARED WL arrays; engine
        layouts extend it (the cell engine adds its slab-overflow
        audit so corrupt walkers never reach the merged masters)."""
        return jnp.all(jnp.isfinite(s.energy), axis=0)

    def _wl_update(self, s: SamplerState, enabled=True) -> SamplerState:
        prm, grid = self.prm, self.grid
        if prm.num_lattices != 2:
            return s
        B = grid.nbins
        dtype = self._dtype(s)

        # ``enabled`` gates steps whose scheduled move type performs no
        # WL update (switch-only steps, mc_cycle:228-241)
        active = enabled & (s.cycle >= prm.eq_mc_cycles)   # (1615)
        # health gate: a walker with non-finite energies must not
        # write into the SHARED WL arrays (it would pump weight at its
        # stale mu bin until the merge poisons every walker)
        healthy = self._wl_healthy(s)
        k = mu_to_bin(grid, s.mu)
        in_grid = (k >= 0) & (k < B)                       # (1619)
        kc = jnp.clip(k, 0, B - 1)
        upd = (in_grid & active & healthy).astype(dtype)   # [W]
        bin_ids = jnp.arange(B)
        oh = (bin_ids[:, None] == kc[None, :]).astype(dtype) \
            * upd[None, :]                                 # [B, W]
        incr = self.grid.av_binwidth / grid.binwidth[kc]   # [W]

        hist = s.hist + oh * incr[None, :]

        if prm.samplerun:
            # unbiased histogram with frozen weights (1625-1632).
            # Mask BEFORE the exp: out-of-window walkers carry the
            # eta wall (1e30) and exp(wall) * 0 would poison the
            # histogram with NaN.  The wall must also GATE the
            # increment entirely: in f32 a switch-accept refreshes mu
            # from scratch, and near a dd window boundary the
            # refreshed mu can land marginally outside the continuous
            # wall while still binning INTO the window's edge bin -
            # an exp(60)-clamped walled increment there poisons the
            # per-window histogram scale (found by the round-3
            # runs/n216_sample_dd production; mw mode has no walls
            # and is unaffected)
            eta_val = self._eta(s, s.mu)
            unwalled = eta_val < 1e29
            arg = jnp.where(
                (upd > 0) & unwalled,
                eta_val - self.aux.log_unbiased_norm, -1.0,
            )
            u_incr = jnp.where(
                unwalled, incr * jnp.exp(jnp.minimum(arg, 60.0)), 0.0
            )
            uhist = s.uhist + oh * u_incr[None, :]
            return s._replace(hist=hist, uhist=uhist)

        f = s.f
        sumh = s.sumhist
        if prm.wl_swetnam:
            # Swetnam RMS-flatness f (mc_moves.F90:1636-1653), from
            # the TOTAL histogram view (master + own delta)
            sumh = s.sumhist + upd
            hist_tot = self._hist_total(s, hist)
            binfrac = grid.binwidth / (prm.mu_max - prm.mu_min - 1.0)
            dev = (
                hist_tot * grid.binwidth[:, None]
                / jnp.maximum(sumh, 1.0)[None, :]
                - binfrac[:, None]
            )
            rms = jnp.sqrt(jnp.mean(dev * dev, axis=0))
            f_new = jnp.log(jnp.maximum(rms, 1e-300)) * prm.wl_alpha * B
            f_new = jnp.minimum(f_new, prm.wl_factor)
            f = jnp.where(active & (upd > 0), f_new, f)
        elif prm.wl_useinvt:
            # 1/t schedule once active (mc_moves.F90:1655-1658)
            f_invt = jnp.minimum(
                f, B / (s.cycle.astype(dtype) * prm.nwater)
            )
            f = jnp.where(s.invt_active & active, f_invt, f)

        weight = s.weight + oh * (incr * f)[None, :]

        # NOTE: the reference shifts the window minimum to zero after
        # every update (mc_moves.F90:1680-1685).  A uniform in-window
        # shift never enters any acceptance or histogram, so it is
        # deferred to the delta-sync (engine._sync_all): doing it per
        # update ratchets in f32 - the tiny shift subtractions round
        # away at large weight values but not at small ones, inflating
        # the curve span without bound.
        return s._replace(hist=hist, weight=weight, f=f, sumhist=sumh)

    # ------------------------------------------------------------------
    # moves
    # ------------------------------------------------------------------

    def _translation(self, s: SamplerState, u,
                     enabled=True, imol_shared=None) -> SamplerState:
        """Single-molecule translation in both replicas
        (mc_water_translation, mc_moves.F90:966-1213).

        ``u``: [>=6, W] pre-drawn uniforms for this step (the whole
        cycle's randoms are generated in one batched threefry call -
        per-step small RNG kernels are dispatch-bound on TPU).
        ``enabled`` (scalar or [W]) masks the whole move: the scan body
        runs it every step and masks out non-translation steps -
        branch-free stepping is far cheaper on TPU than lax.switch.
        """
        prm, model = self.prm, self.model
        L = s.r.shape[0]
        N = s.r.shape[2]
        W = s.r.shape[3]
        dtype = self._dtype(s)

        if imol_shared is not None:
            # shared molecule schedule (table mode, ops/nbrtable.py):
            # all walkers move the same molecule this step
            imol = jnp.broadcast_to(
                jnp.asarray(imol_shared, jnp.int32), (W,)
            )
        else:
            imol = jnp.minimum((u[0] * N).astype(jnp.int32), N - 1)

        # random direction x magnitude (mc_moves.F90:1021-1039)
        d0 = 2.0 * u[1] - 1.0
        d1 = 2.0 * u[2] - 1.0
        d2 = 2.0 * u[3] - 1.0
        # guard the (astronomically rare in f32, but possible) zero
        # direction vector against rsqrt(0) = inf
        inv_norm = jax.lax.rsqrt(
            jnp.maximum(d0 * d0 + d1 * d1 + d2 * d2, 1e-30)
        )
        rmag = (2.0 * u[4] - 1.0) * s.max_trans * inv_norm
        v = jnp.stack([d0 * rmag, d1 * rmag, d2 * rmag])     # [3,W]

        # same fractional displacement in the partner lattice
        # (mc_moves.F90:1042-1067)
        recip_ls = _take_lat(s.recip, s.ls)                  # [3,3,W]
        sfrac = _einsum("aw,abw->bw", v, recip_ls) * (0.5 / jnp.pi)
        tv_all = _einsum("labw,bw->law", s.h, sfrac)      # [L,3,W]
        lat_act = (jnp.arange(L)[:, None] == s.ls[None, :])  # [L,W]
        transvec = jnp.where(lat_act[:, None, :], v[None], tv_all)

        p_old = jnp.take_along_axis(
            s.r, imol[None, None, None, :], axis=2
        )[:, :, 0]                                           # [L,3,W]
        p_new = p_old + transvec

        per = [
            local_energies_batch(
                s.r[l], s.h[l], imol, p_new[l],
                _per_lat(s.moments, l), self.fold_shifts, model, True,
            )
            for l in range(L)
        ]
        e_old = jnp.stack([p[0] for p in per])               # [L,W]
        e_new = jnp.stack([p[1] for p in per])
        eff_mom = _stack_moments([p[2] for p in per])        # [L,N,W]
        dE = e_new - e_old

        if prm.num_lattices == 2:
            dmu = (dE[0] - dE[1]) * prm.beta
            mu_new = s.mu + dmu                              # (1113)
            eta_old = self._eta(s, s.mu)
            eta_new = self._eta(s, mu_new)
            dE_ls = _take_lat(dE, s.ls)
            diffkT = prm.beta * dE_ls + eta_new - eta_old    # (1116)
        else:
            mu_new = s.mu
            dmu = jnp.zeros((W,), dtype=dtype)
            diffkT = prm.beta * dE[0]

        ls_next = s.ls
        if prm.minu and prm.num_lattices == 2:
            # #ifdef MINU variant: fold a switch to the lower-enthalpy
            # lattice into the move (mc_moves.F90:1119-1140)
            enth = energy_trial = s.energy + dE
            if prm.mc_ensemble == "npt":
                enth = enth + prm.pressure * s.volume
            if prm.leshift:
                enth = enth - self.aux.ref_enthalpy[:, None]
            lsn = jnp.argmin(enth, axis=0).astype(jnp.int32)
            E_lsn = _take_lat(energy_trial, lsn)
            E_ls_old = _take_lat(s.energy, s.ls)
            alt = prm.beta * (E_lsn - E_ls_old) + eta_new - eta_old
            if prm.mc_ensemble == "npt":
                V_lsn = _take_lat(s.volume, lsn)
                V_ls = _take_lat(s.volume, s.ls)
                alt = (
                    alt + prm.beta * prm.pressure * (V_lsn - V_ls)
                    - prm.nwater * jnp.log(V_lsn / V_ls)
                )
            if prm.leshift:
                rh = self.aux.ref_enthalpy
                alt = alt - prm.beta * (rh[lsn] - rh[s.ls])
            diffkT = jnp.where(lsn != s.ls, alt, diffkT)
            ls_next = lsn

        # finite-state guard: an accepted move with non-finite energy
        # deltas (f32 overflow on a catastrophic overlap) would poison
        # the walker permanently - it then rejects every later move
        # while still pumping WL weight at its stale mu bin
        ok = jnp.isfinite(diffkT)
        if prm.num_lattices == 2:
            ok = ok & jnp.isfinite(mu_new)
        if self.wall > 0.0:
            # displacement-from-reference hard wall (table mode,
            # ops/nbrtable.py): reject any proposal taking a molecule
            # farther than `wall` from its reference site in EITHER
            # replica.  Reference site = H(t) . frac0 (reference
            # positions hold their fractional coordinates through
            # volume moves, mc_volume:1284-1350)
            f0 = jnp.asarray(self.aux.frac0, dtype)          # [L,3,N]
            f0_i = jnp.take(f0, imol, axis=2)                # [L,3,W]
            ref_i = _einsum("labw,lbw->law", s.h, f0_i)
            dwall = p_new - ref_i                            # [L,3,W]
            ok = ok & jnp.all(
                jnp.sum(dwall * dwall, axis=1) <= self.wall ** 2,
                axis=0,
            )
        accept = enabled & ok & (u[5] < jnp.exp(-diffkT))    # (1146)
        accf = accept.astype(dtype)

        onehot = (jnp.arange(N)[:, None] == imol[None, :])   # [N,W]
        r = s.r + (
            accf[None, None, None, :]
            * onehot.astype(dtype)[None, None, :, :]
            * transvec[:, :, None, :]
        )
        # where-based (not multiply-masked) update: a rejected overlap
        # proposal can carry non-finite dE, and 0 * inf = NaN would
        # poison the accumulator
        energy = jnp.where(accept[None, :], s.energy + dE, s.energy)
        mu = jnp.where(accept, mu_new, s.mu)
        ls = jnp.where(accept, ls_next, s.ls) if prm.minu else s.ls
        a2 = accept[None, None, :]
        moments = jax.tree.map(
            lambda e, o: jnp.where(a2, e, o), eff_mom, s.moments
        )

        # acceptance bookkeeping (mc_moves.F90:1156-1159)
        en_i = jnp.broadcast_to(enabled, accept.shape).astype(jnp.int32)
        att = s.att.at[TRANS].add(en_i)
        acc = s.acc.at[TRANS].add(accept.astype(jnp.int32))
        tpm = s.trans_per_mol + onehot.astype(jnp.int32) * en_i[None, :]
        admu = jnp.abs(dmu)
        min_dmu = jnp.where(accept & (admu < s.min_dmu), admu, s.min_dmu)
        max_dmu = jnp.where(accept & (admu > s.max_dmu), admu, s.max_dmu)

        s = s._replace(
            r=r, energy=energy, mu=mu, ls=ls, moments=moments, att=att,
            acc=acc, trans_per_mol=tpm, min_dmu=min_dmu,
            max_dmu=max_dmu,
        )
        return self._wl_update(s, enabled)

    def _e_tot(self, s):
        """The accurate total energy view.  The dense engine's plain
        accumulator is exact enough (per-move dE >> ulp(total) at
        N <= ~10^3); the cell engine overrides with its compensated
        (energy + energy_err) pair - see CellState.energy_err."""
        return s.energy

    def _post_volume_energy(self, s, accept):
        """Hook after a volume move's from-scratch energy set (the
        cell engine zeroes its compensation residual on accept)."""
        return s

    def _volume(self, s: SamplerState, keys) -> SamplerState:
        """Anisotropic cell move, same strain in both replicas
        (mc_volume, mc_moves.F90:1216-1534)."""
        prm, model = self.prm, self.model
        L = s.r.shape[0]
        W = s.r.shape[3]
        dtype = self._dtype(s)

        u = jax.vmap(lambda k: jax.random.uniform(k, (4,), dtype=dtype))(
            keys
        )
        idim = jnp.minimum((u[:, 0] * 3).astype(jnp.int32), 2)
        jdim = jnp.minimum((u[:, 1] * 3).astype(jnp.int32), 2)
        delta = (2.0 * u[:, 2] - 1.0) * s.dv_max

        # symmetric perturbation of one (i,j) element (1276-1282)
        ei = (jnp.arange(3)[:, None] == idim[None, :]).astype(dtype)
        ej = (jnp.arange(3)[:, None] == jdim[None, :]).astype(dtype)
        outer = ei[:, None, :] * ej[None, :, :]              # [3,3,W]
        sym = outer + jnp.swapaxes(outer, 0, 1) \
            - outer * jnp.swapaxes(outer, 0, 1)
        dh = sym * delta[None, None, :]

        h_new = s.h + dh[None]                               # [L,3,3,W]
        # rescale positions holding fractional coordinates fixed
        # (mc_moves.F90:1284-1350); engine-specific layouts hook in
        # via _vol_rescale/_vol_energy/_vol_extra_ok
        r_new, extras = self._vol_rescale(s, h_new)

        recip_new = jnp.stack([recip_matrix(h_new[l]) for l in range(L)])
        vol_new = jnp.abs(
            jnp.stack([determinant3(h_new[l]) for l in range(L)])
        )

        e_new, mom_new = self._vol_energy(s, r_new, h_new)
        e_tot = self._e_tot(s)
        dE = e_new - e_tot

        vol_ls_old = _take_lat(s.volume, s.ls)
        vol_ls_new = _take_lat(vol_new, s.ls)
        dE_ls = _take_lat(dE, s.ls)

        if prm.num_lattices == 2:
            mu_new = self._mu_scratch(e_new, vol_new)        # (1366-75)
            eta_old = self._eta(s, s.mu)
            eta_new = self._eta(s, mu_new)
            deta = eta_new - eta_old
            mu_reject = self._mu_scratch(e_tot, s.volume)    # (1524-28)
        else:
            mu_new = s.mu
            deta = jnp.zeros((W,), dtype=dtype)
            mu_reject = s.mu

        # NPT acceptance (mc_moves.F90:1380-1381)
        diffkT = (
            prm.beta * dE_ls
            + deta
            + prm.beta * prm.pressure * (vol_ls_new - vol_ls_old)
            - prm.nwater * jnp.log(vol_ls_new / vol_ls_old)
        )
        # finite-state guard (see _translation) + cell-collapse guard:
        # a near-singular cell blows up the rescaled positions
        ok = jnp.isfinite(diffkT) & (jnp.min(vol_new, axis=0) > 0.0)
        extra_ok = self._vol_extra_ok(h_new, s)
        if extra_ok is not None:
            ok = ok & extra_ok
        if self.wall > 0.0 and "ref_r" in extras:
            # displacement wall on the RESCALED state: a volume move
            # scales Cartesian displacements from the reference sites
            # (d = H (f - f0)), so without this check an accepted
            # expansion could carry a molecule beyond the translation
            # wall — breaking both detailed balance at the wall (the
            # reverse translation would be rejected while the forward
            # one was not) and the tables' capture guarantee.  Volume
            # moves are ~1/nwater of trials, so the O(L N W) check is
            # cheap.
            dsp = r_new - extras["ref_r"]               # [L,3,N,W]
            d2 = jnp.sum(dsp * dsp, axis=1)             # [L,N,W]
            ok = ok & (jnp.max(d2, axis=(0, 1)) <= self.wall ** 2)
        if prm.mc_vol_wall > 0.0:
            # NPT volume wall (round 5): restrict each replica's
            # volume to ±mc_vol_wall (fractional) of its reference
            # lattice volume.  Motivation (measured, N=8064 WL
            # production): central mu-windows ask for E1≈E2 states
            # and the entropically cheap way there is EVAPORATION —
            # walkers ran away to V≈20·V0 (gas, E1=E2≈0, mu≈0),
            # wasting the windows on states irrelevant to the
            # solid-solid dG.  Ice polytypes at 200 K fluctuate
            # within ~±3% of Vref, so a generous wall excludes only
            # the gas branch.  A hard wall on the PROPOSED state
            # preserves detailed balance; the inward clause only
            # engages for walkers already outside (restart from a
            # pre-wall checkpoint) and ratchets them back in.
            ref_h = self.aux.ref_h
            vref = jnp.abs(jnp.stack([
                determinant3(
                    jnp.asarray(ref_h[l], dtype=dtype)[:, :, None]
                )[0]
                for l in range(L)
            ]))                                          # [L]
            ratio_new = vol_new / vref[:, None]          # [L,W]
            inside = jnp.all(
                (ratio_new >= 1.0 - prm.mc_vol_wall)
                & (ratio_new <= 1.0 + prm.mc_vol_wall), axis=0
            )
            dist_new = jnp.sum(
                jnp.abs(jnp.log(ratio_new)), axis=0
            )
            dist_old = jnp.sum(
                jnp.abs(jnp.log(s.volume / vref[:, None])), axis=0
            )
            ok = ok & (inside | (dist_new < dist_old))
        if prm.num_lattices == 2:
            ok = ok & jnp.isfinite(mu_new)
        accept = ok & (u[:, 3] < jnp.exp(-diffkT))

        if prm.num_lattices == 2:
            admu = jnp.abs(mu_new - s.mu)
            min_dmu = jnp.where(
                accept & (admu < s.min_dmu), admu, s.min_dmu
            )
            max_dmu = jnp.where(
                accept & (admu > s.max_dmu), admu, s.max_dmu
            )
            mu = jnp.where(accept, mu_new, mu_reject)
        else:
            min_dmu, max_dmu = s.min_dmu, s.max_dmu
            mu = s.mu

        a4 = accept[None, None, None, :]
        a2 = accept[None, None, :]
        moments = jax.tree.map(
            lambda e, o: jnp.where(a2, e, o), mom_new, s.moments
        )
        s = s._replace(
            r=jnp.where(a4, r_new, s.r),
            h=jnp.where(a4, h_new, s.h),
            recip=jnp.where(a4, recip_new, s.recip),
            volume=jnp.where(accept[None, :], vol_new, s.volume),
            energy=jnp.where(accept[None, :], e_new, s.energy),
            mu=mu,
            moments=moments,
            att=s.att.at[VOL].add(1),
            acc=s.acc.at[VOL].add(accept.astype(jnp.int32)),
            min_dmu=min_dmu,
            max_dmu=max_dmu,
            **{
                k: jnp.where(a4, v, getattr(s, k))
                for k, v in extras.items()
            },
        )
        s = self._post_volume_energy(s, accept)
        return self._wl_update(s)

    def _vol_rescale(self, s: SamplerState, h_new):
        """(r_new, extras): positions rescaled at fixed fractional
        coordinates; extras maps extra state fields to their rescaled
        values, applied on accept (the dense layout also rescales the
        reference positions, mc_moves.F90:1310-1350)."""
        inv2pi = 0.5 / jnp.pi
        frac_r = _einsum("labw,lanw->lbnw", s.recip, s.r) * inv2pi
        r_new = _einsum("labw,lbnw->lanw", h_new, frac_r)
        frac_ref = _einsum("labw,lanw->lbnw", s.recip, s.ref_r) \
            * inv2pi
        ref_new = _einsum("labw,lbnw->lanw", h_new, frac_ref)
        return r_new, {"ref_r": ref_new}

    def _vol_energy(self, s: SamplerState, r_new, h_new):
        L = s.r.shape[0]
        per = [
            self._full_energy_mic(r_new[l], h_new[l]) for l in range(L)
        ]
        return jnp.stack([p[0] for p in per]), _stack_moments(
            [p[1] for p in per]
        )

    def _vol_extra_ok(self, h_new, s=None):
        """Optional extra [W] acceptance wall (None = no constraint).

        With the static neighbour tables active, boxes whose
        perpendicular widths shrink below 1/BREATHING of the reference
        geometry are rejected — beyond that the tables would silently
        miss in-range pairs (ops/nbrtable.table_radius).  A hard wall
        that depends only on the proposed state preserves detailed
        balance.  (The cell engine overrides this with its own
        grid-validity guard.)"""
        if self.tbl is None:
            return None
        L = h_new.shape[0]
        ok = None
        for l in range(L):
            H = h_new[l]                                   # [3,3,W]
            vol = jnp.abs(determinant3(H))
            for a in range(3):
                b, c = (a + 1) % 3, (a + 2) % 3
                cx = H[1, b] * H[2, c] - H[2, b] * H[1, c]
                cy = H[2, b] * H[0, c] - H[0, b] * H[2, c]
                cz = H[0, b] * H[1, c] - H[1, b] * H[0, c]
                w = vol * jax.lax.rsqrt(cx * cx + cy * cy + cz * cz)
                cond = w > self._tbl_min_w[l, a]
                ok = cond if ok is None else (ok & cond)
        return ok

    def _scheduled_volume_moves(self, s, codes, cycle, switch_ok):
        """Run this cycle's scheduled volume moves back-to-back
        (mc_volume; hoisted out of the hot per-move loop - the
        kernel-reordering note in _one_cycle)."""
        prm = self.prm
        dtype = self._dtype(s)
        nvol = jnp.sum(codes == VOL)

        def vol_body(k, st):
            keys = jax.vmap(
                lambda kk: jax.random.fold_in(
                    jax.random.fold_in(kk, cycle), 100_003 + k
                )
            )(st.key)
            st = self._volume(st, keys)
            if prm.num_lattices == 2 and prm.mc_always_switch:
                zeta2 = jax.vmap(
                    lambda kk: jax.random.uniform(kk, (), dtype=dtype)
                )(jax.vmap(
                    lambda kk: jax.random.fold_in(kk, 104729)
                )(keys))
                st = self._switch(st, zeta2, switch_ok)
            return st

        return jax.lax.cond(
            nvol > 0,
            lambda st: jax.lax.fori_loop(0, nvol, vol_body, st),
            lambda st: st,
            s,
        )

    def _switch(self, s: SamplerState, zeta, enabled) -> SamplerState:
        """Lattice switch (mc_lattice_switch, mc_moves.F90:1536-1594).

        ``enabled`` gates dd-mode pre-equilibration suppression
        (mc_cycle:237-249) and the move-schedule mask.
        """
        prm = self.prm
        if prm.num_lattices != 2:
            return s
        lsn = 1 - s.ls
        e_tot = self._e_tot(s)
        E_ls = _take_lat(e_tot, s.ls)
        E_lsn = _take_lat(e_tot, lsn)
        diffkT = prm.beta * (E_lsn - E_ls)
        if prm.mc_ensemble == "npt":
            V_ls = _take_lat(s.volume, s.ls)
            V_lsn = _take_lat(s.volume, lsn)
            diffkT = (
                diffkT
                + prm.beta * prm.pressure * (V_lsn - V_ls)
                - prm.nwater * jnp.log(V_lsn / V_ls)
            )
        if prm.leshift:
            rh = self.aux.ref_enthalpy
            diffkT = diffkT - prm.beta * (rh[lsn] - rh[s.ls])
        # eta(mu) cancels: mu is unchanged by a switch (1558-1559)
        accept = enabled & jnp.isfinite(diffkT) & (
            zeta < jnp.exp(-diffkT)
        )
        ls = jnp.where(accept, lsn, s.ls)
        mu = jnp.where(
            accept, self._mu_scratch(e_tot, s.volume), s.mu
        )
        en_i = jnp.broadcast_to(enabled, accept.shape).astype(jnp.int32)
        return s._replace(
            ls=ls,
            mu=mu,
            att=s.att.at[SWITCH].add(en_i),
            acc=s.acc.at[SWITCH].add(accept.astype(jnp.int32)),
        )

    # ------------------------------------------------------------------
    # delta-sync collectives (comms_mpi.f90:244-530)
    # ------------------------------------------------------------------

    def _delta_merge(self, delta, master, window_id, nwin):
        """Delta-allreduce over walkers sharing a mu-window.

        delta: [B, W] per-walker growth since the last sync (the
        per-walker array IS the delta in the delta-split layout);
        master: DS [nwin, B] double-single running totals
        (ops/dsfloat.py).  The sum over the sharded walker axis becomes
        a cross-chip collective under a mesh (comms_allreduce_eta,
        comms_mpi.f90:256-270).
        """
        d = delta.T                                          # [W, B]
        # defense in depth: a single poisoned walker must never
        # poison the SHARED arrays - its non-finite growth is dropped
        # (per-move health gates should prevent this ever firing; see
        # the f32 cutoff-edge incident in ops/dense._DENOM_CLAMP).
        # Drops are COUNTED so regression of the upstream gates is
        # observable in the monitor block instead of silently masked.
        finite = jnp.isfinite(d)
        n_bad = jnp.sum(~finite, dtype=jnp.int32)
        d = jnp.where(finite, d, 0.0)
        tot = jax.ops.segment_sum(d, window_id, num_segments=nwin)
        return ds_add(master, tot), n_bad

    def _window_mask(self, s: SamplerState):
        """Static [nwin, B] in-window bin mask, derived from the
        per-walker window bounds (all walkers of a window share them)."""
        nwin = s.master_eta.hi.shape[0]
        B = self.grid.nbins
        sbw = jax.ops.segment_min(
            s.start_bin, s.window_id, num_segments=nwin
        )
        ebw = jax.ops.segment_max(
            s.end_bin, s.window_id, num_segments=nwin
        )
        bin_ids = jnp.arange(B)[None, :]
        return (bin_ids >= sbw[:, None]) & (bin_ids <= ebw[:, None])

    def _sync_all(self, s: SamplerState) -> SamplerState:
        """Synchronise weights + histograms across walkers
        (mc_cycle:258-278): fold every walker's growth into the
        double-single master rows, re-zero the per-walker deltas."""
        prm = self.prm
        if prm.num_lattices != 2:
            return s
        nwin = s.master_eta.hi.shape[0]
        m_eta, bad_w = self._delta_merge(
            s.weight, s.master_eta, s.window_id, nwin
        )
        if not prm.samplerun:
            # Re-zero the merged window minimum (uniform in-window
            # shift: statistically neutral, eta differences unchanged;
            # mc_moves.F90:1680-1685 deferred to syncs - see the
            # _wl_update note).  Exact in double-single; out-of-window
            # bins (the warm-start seeding curve) stay untouched.
            winmask = self._window_mask(s)               # [nwin, B]
            val = ds_value(m_eta)
            minv = jnp.min(
                jnp.where(winmask, val, jnp.inf), axis=1, keepdims=True
            )
            minv = jnp.where(jnp.isfinite(minv), minv, 0.0)
            m_eta = ds_where(winmask, ds_sub(m_eta, minv), m_eta)
        m_hist, bad_h = self._delta_merge(
            s.hist, s.master_hist, s.window_id, nwin
        )
        s = s._replace(
            weight=jnp.zeros_like(s.weight),
            hist=jnp.zeros_like(s.hist),
            master_eta=m_eta, master_hist=m_hist,
            dropped=s.dropped + bad_w + bad_h,
        )
        if prm.samplerun:
            m_uhist, bad_u = self._delta_merge(
                s.uhist, s.master_uhist, s.window_id, nwin
            )
            s = s._replace(uhist=jnp.zeros_like(s.uhist),
                           master_uhist=m_uhist,
                           dropped=s.dropped + bad_u)
        return s

    # ------------------------------------------------------------------
    # chain synchronisation (mc_check_chain_synchronisation,
    # mc_moves.F90:2217-2416)
    # ------------------------------------------------------------------

    def _resync_chains(self, s: SamplerState) -> SamplerState:
        prm, model, aux = self.prm, self.model, self.aux
        if prm.num_lattices != 2:
            return s
        L = s.r.shape[0]
        # correct lattice 2's cell displacement to match lattice 1
        # (mc_moves.F90:2276-2277); aux.ref_h is [L,3,3] (shared)
        ref0 = aux.ref_h[0][:, :, None]
        ref1 = aux.ref_h[1][:, :, None]
        h2 = ref1 + (s.h[0] - ref0)
        h = s.h.at[1].set(h2)
        recip = jnp.stack([recip_matrix(h[l]) for l in range(L)])

        # force every molecule's fractional displacement from its
        # reference site in lattice 2 to equal lattice 1's
        # (mc_moves.F90:2289-2333)
        inv2pi = 0.5 / jnp.pi
        frac = _einsum("labw,lanw->lbnw", recip, s.r) * inv2pi
        frac_ref = _einsum("labw,lanw->lbnw", recip, s.ref_r) * inv2pi
        sdiff1 = frac[0] - frac_ref[0]                       # [3,N,W]
        s2 = frac_ref[1] + sdiff1
        r2 = _einsum("abw,bnw->anw", h[1], s2)
        r = s.r.at[1].set(r2)

        vol = jnp.abs(jnp.stack([determinant3(h[l]) for l in range(L)]))
        per = [self._full_energy_mic(r[l], h[l]) for l in range(L)]
        energy = jnp.stack([p[0] for p in per])
        moments = _stack_moments([p[1] for p in per])
        mu = self._mu_scratch(energy, vol)
        return s._replace(
            r=r, h=h, recip=recip, volume=vol, energy=energy, mu=mu,
            moments=moments,
        )

    # ------------------------------------------------------------------
    # maintenance
    # ------------------------------------------------------------------

    def _audit_energy(self, s: SamplerState):
        """Recompute energies + moments from scratch; returns
        (state, drift [L,W]).

        The reference's monitor both reports the drift AND heals it by
        overwriting the stored energies (mc_monitor_stats:1781-1792).
        The audit deliberately uses the general image-enumeration path
        (no MIC folding): if a volume move ever shrank a box below the
        MIC-validity bound, the drift report exposes it.
        """
        L = s.r.shape[0]
        per = [
            full_energy_batch(s.r[l], s.h[l], self.aux.shifts,
                              self.model, False)
            for l in range(L)
        ]
        fresh = jnp.stack([p[0] for p in per])
        moments = _stack_moments([p[1] for p in per])
        drift = s.energy - fresh
        return s._replace(energy=fresh, moments=moments), drift

    # ------------------------------------------------------------------
    # cycle driver
    # ------------------------------------------------------------------

    def _one_cycle(self, s: SamplerState):
        prm = self.prm
        dtype = self._dtype(s)
        L, _, N, W = s.r.shape
        cycle = s.cycle + 1
        s = s._replace(cycle=cycle)

        # dd-mode window tracking (mc_cycle:181-210)
        if prm.parallel_strategy == "dd" and L == 2:
            s = self._dd_track_window(s, cycle)

        # (no Verlet rebuild: the dense moment formulation evaluates
        # exact current neighbourhoods every move - the reference's
        # list_update_int cadence, mc_cycle:218-222, is obsolete here)

        # move-type schedule for this cycle: shared stream
        ck = jax.random.fold_in(s.shared_key, cycle)
        if self.rec is not None:
            # injectable recorded stream (set_recorded_stream): the
            # per-cycle schedule comes from the recorded codes array,
            # indexed by the (traced) cycle counter
            rec_codes, rec_u = self.rec
            ci = jnp.mod(cycle - 1, rec_codes.shape[0])
            codes = jnp.take(rec_codes, ci, axis=0)          # [N]
        else:
            xi = jax.random.uniform(ck, (N,), dtype=dtype)
            transP, volP, swP = self.probs
            codes = jnp.where(
                xi < transP, TRANS,
                jnp.where(xi < volP, VOL,
                          jnp.where(xi < swP, SWITCH, NOOP)),
            )
        # shared molecule schedule (table mode): the per-step molecule
        # index, common to all walkers, from its own shared substream
        if self.tbl is not None:
            if self.rec is not None:
                # recorded mode: the molecule pick comes from the
                # recorded imol slot so the scan path (imol_shared) and
                # a replaying oracle agree move-for-move
                sched_mol = jnp.minimum(
                    (jnp.take(rec_u, ci, axis=0)[:, 0] * N).astype(
                        jnp.int32
                    ),
                    N - 1,
                )
            else:
                mk = jax.random.fold_in(ck, 0x6d6f6c)
                sched_mol = jax.random.randint(
                    mk, (N,), 0, N, dtype=jnp.int32
                )
        else:
            sched_mol = None

        if prm.parallel_strategy == "dd":
            switch_ok_scalar = cycle >= prm.eq_mc_cycles
        else:
            switch_ok_scalar = jnp.asarray(True)
        switch_ok = jnp.broadcast_to(switch_ok_scalar, (W,))

        # Branch-free inner scan: every step executes a MASKED
        # translation (+ masked switch attempt); conditionals inside
        # the hot scan cost milliseconds per step on TPU, while a
        # masked no-op translation wastes only the ~0.5% of steps whose
        # scheduled type is not 'translation'.  The rare volume moves
        # (prob ~1/nwater per move, io.f90:172) are hoisted to a
        # once-per-cycle conditional after the scan - a kernel
        # reordering that preserves stationarity (each kernel obeys
        # detailed balance; the mixture schedule is state-independent).
        # the whole cycle's per-walker uniforms in one threefry call:
        # [N, 7, W] (slots: imol, direction x3, magnitude, accept,
        # switch); per-step small RNG kernels are dispatch-bound
        # multi-trial steps consume 4 + 5T slots per mover and run
        # N/T steps per cycle (trials per cycle stay N)
        dT = self.dT if self.use_fused else 1
        n_steps = N // dT if dT > 1 else N
        n_u = 4 + 5 * dT if dT > 1 else 7
        if self.rec is not None:
            # recorded stream: every walker consumes the SAME per-move
            # uniforms (the parity-oracle mode is meant for W=1;
            # BASELINE.json 'identical RNG streams')
            assert dT == 1, "recorded streams require dense_trials=1"
            cycle_u = jnp.broadcast_to(
                jnp.take(rec_u, ci, axis=0).astype(dtype)[:, :, None],
                (N, 7, W),
            )
        else:
            cycle_u = jax.vmap(
                lambda k: jax.random.uniform(
                    jax.random.fold_in(k, cycle), (n_steps, n_u),
                    dtype=dtype,
                ),
                out_axes=2,
            )(s.key)                                 # [n_steps,n_u,W]

        if self.use_fused:
            # the whole N-step hot loop in one Pallas kernel with the
            # walker block resident in VMEM (mcmc/fused.py); consumes
            # the same codes/cycle_u streams as the scan path below
            s = self.fused_cycle(
                s, codes, cycle_u,
                wl_active=cycle >= prm.eq_mc_cycles,
                switch_ok=switch_ok_scalar,
                sched_mol=(
                    sched_mol[:n_steps] if sched_mol is not None
                    else None
                ),
            )
        else:
            def step(carry, t):
                st = carry
                code = codes[t]
                u = cycle_u[t]                           # [7,W]
                st = self._translation(
                    st, u, enabled=(code == TRANS),
                    imol_shared=(
                        None if sched_mol is None else sched_mol[t]
                    ),
                )
                if prm.num_lattices == 2 and (
                    prm.mc_always_switch or prm.allow_switch
                ):
                    sw_en = code == SWITCH
                    if prm.mc_always_switch:
                        sw_en = sw_en | (code == TRANS)
                    st = self._switch(st, u[6], switch_ok & sw_en)
                return st, None

            # unroll amortises the ~0.2-0.4 ms per-iteration while-loop
            # overhead of the device over several physical steps
            s, _ = jax.lax.scan(step, s, jnp.arange(N), unroll=8)

        # volume moves scheduled this cycle, executed back-to-back
        # (mc_volume, mc_moves.F90:1216-1534)
        if prm.mc_ensemble == "npt" and prm.allow_vol:
            s = self._scheduled_volume_moves(s, codes, cycle, switch_ok)

        # block-average energy accumulation (mc_cycle:252-255)
        avg = s.avg_energy + s.energy
        if prm.mc_ensemble == "npt":
            avg = avg + prm.pressure * s.volume
        s = s._replace(avg_energy=avg)

        # delta-sync of WL arrays (mc_cycle:258-278)
        if prm.num_lattices == 2:
            s = jax.lax.cond(
                cycle % prm.mpi_sync_int == 0,
                self._sync_all,
                lambda x: x,
                s,
            )
            # enforced chain synchronisation (mc_cycle:297-300)
            s = jax.lax.cond(
                cycle % prm.latt_sync_int == 0,
                self._resync_chains,
                lambda x: x,
                s,
            )

        # therm-style per-cycle sample of the first therm_walkers
        # walkers (main.f90:200-223; host filters by file_output_int)
        T = min(prm.therm_walkers, W)
        e_ls = _take_lat(s.energy, s.ls)
        sample = {
            "cycle": cycle,
            "E_ls": e_ls[:T],
            "mu": s.mu[:T],
            "vol": s.volume[:, :T],
            "ls": s.ls[:T],
        }
        return s, sample

    def _run_cycles(self, s: SamplerState, n_cycles: int):
        def body(carry, _):
            return self._one_cycle(carry)

        s, samples = jax.lax.scan(body, s, None, length=n_cycles)
        return s, samples

    # ------------------------------------------------------------------
    # host-side helpers (not jitted; called at block boundaries)
    # ------------------------------------------------------------------

    def merged_histogram(self, s: SamplerState):
        """Fully merged histogram view without advancing snapshots."""
        return self._sync_all(s)
