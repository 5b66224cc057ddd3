"""Host-side Wang-Landau events: monitoring, flatness, delta-G.

These are the reference's interval-driven bookkeeping routines
(mc_monitor_stats, mc_check_flatness, mc_compute_deltaG_from_hist -
mc_moves.F90:1691-2621), run at block boundaries on the host: they
involve file IO and O(nbins) scalar work, while all hot compute stays
in the jitted engine.  Walkers play the role of MPI ranks; the merges
the reference does with allreduce happen through the engine's
delta-sync, and dd-mode window curves are stitched with the overlap
matching of comms_join_eta/uhist.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

from ..constants import BOHR_TO_ANG, HART_TO_EV, HART_TO_KJPM, KB
from ..ops.dsfloat import ds_from64, ds_value64
from ..parallel.windows import join_eta, join_uhist
from ..io import writers
from .bins import BinGrid
from .config import RunParams
from .engine import Engine, SWITCH, TRANS, VOL
from .state import SamplerState


def _nwin(state: SamplerState) -> int:
    return state.master_eta.hi.shape[0]


def _window_bounds(state: SamplerState, nwin: int):
    """Per-window (start_bin, end_bin) from the first walker of each
    window (all walkers of a window share them)."""
    wid = np.asarray(state.window_id)
    sb = np.asarray(state.start_bin)
    eb = np.asarray(state.end_bin)
    first = np.array([np.nonzero(wid == w)[0][0] for w in range(nwin)])
    return sb[first], eb[first]


def monitor_stats(eng: Engine, state: SamplerState, logs, aux,
                  write_files=True) -> SamplerState:
    """Acceptance reporting, step-size adaptation, drift audit, curve
    dumps (mc_monitor_stats, mc_moves.F90:1691-1934)."""
    prm, grid = eng.prm, eng.grid
    cycle = int(state.cycle)
    att = np.asarray(state.att, dtype=np.float64)   # [3,W]
    acc = np.asarray(state.acc, dtype=np.float64)
    with np.errstate(invalid="ignore", divide="ignore"):
        ratios = acc / att                      # [3,W], NaN where untried

    # step-size adaptation toward the target acceptance ratio
    # (mc_monitor_stats:1729-1732), per walker
    if prm.eq_adjust_mc and cycle < prm.eq_mc_cycles:
        atr = np.nan_to_num(ratios[TRANS], nan=1.0)
        avr = np.nan_to_num(ratios[VOL], nan=1.0)
        max_trans = np.maximum(
            np.asarray(state.max_trans) * atr / prm.mc_target_ratio, 0.1
        )
        dv_max = np.maximum(
            np.asarray(state.dv_max) * avr / prm.mc_target_ratio, 0.0001
        )
        state = state._replace(
            max_trans=jnp.asarray(max_trans, dtype=state.max_trans.dtype),
            dv_max=jnp.asarray(dv_max, dtype=state.dv_max.dtype),
        )

    # ensemble-mean statistics block (per-rank block of the reference)
    def pct(i):
        with np.errstate(invalid="ignore", divide="ignore"):
            return 100.0 * np.nansum(acc[i]) / max(np.nansum(att[i]), 1)

    logs.my("#")
    logs.my(f"# Monte-Carlo statistics at cycle {cycle:10d}")
    logs.my("# " + "-" * 60)
    if prm.allow_trans:
        logs.my(f"# Accepted {pct(TRANS):8.2f} % of "
                f"{int(att[TRANS].sum()):10d} translation moves")
        tpm = np.asarray(state.trans_per_mol)
        logs.my(f"# Translations per molecule: avg "
                f"{tpm.mean():10.1f} min {tpm.min():6d} max {tpm.max():6d}")
    if prm.mc_ensemble == "npt":
        logs.my(f"# Accepted {pct(VOL):8.2f} % of "
                f"{int(att[VOL].sum()):10d} box moves")
    if prm.allow_switch or prm.mc_always_switch:
        logs.my(f"# Accepted {pct(SWITCH):8.2f} % of "
                f"{int(att[SWITCH].sum()):10d} lattice switches")
    if prm.eq_adjust_mc and cycle < prm.eq_mc_cycles:
        logs.my(f"# Max molecule translation: "
                f"{np.asarray(state.max_trans).mean() * BOHR_TO_ANG:12.6f} Ang")
        logs.my(f"# Max cell displacement  : "
                f"{np.asarray(state.dv_max).mean() * BOHR_TO_ANG:12.6f} Ang")

    # average excitation energy per degree of freedom
    # (mc_monitor_stats:1766-1772)
    avg_e = np.asarray(state.avg_energy) / prm.monitor_int   # [L,W]
    ref_h = np.asarray(aux.ref_enthalpy)
    for l in range(prm.num_lattices):
        exc = (avg_e[l].mean() - ref_h[l]) / (
            KB * prm.temperature * 3 * prm.nwater
        )
        logs.my(f"# lattice {l + 1} = {exc:15.6f} kT per D.O.F.")

    # overlap bins spanned per move (mc_monitor_stats:1776-1777)
    if prm.num_lattices == 2:
        B = grid.nbins
        span = B / (prm.mu_max - prm.mu_min)
        mn = np.asarray(state.min_dmu)
        mx = np.asarray(state.max_dmu)
        mn = mn[np.isfinite(mn)]
        if mn.size:
            logs.my(f"# Overlap bins spanned per move: min "
                    f"{mn.min() * span:12.6f} max {mx.max() * span:12.6f}")

    # delta-sync health: entries zeroed by the non-finite guard
    # (engine._delta_merge) indicate a poisoned walker upstream
    n_drop = int(np.asarray(state.dropped))
    if n_drop > 0:
        logs.my(f"# WARNING: delta-sync dropped {n_drop} non-finite "
                "weight/histogram entries (poisoned walker?)")

    # energy drift audit + heal (mc_monitor_stats:1781-1792)
    state, drift = eng.audit_energy(state)
    drift = np.asarray(drift) * HART_TO_EV                   # [L,W]
    e_now = np.asarray(state.energy) * HART_TO_EV
    for l in range(prm.num_lattices):
        logs.my(f"#  latt {l + 1}  stored {e_now[l].mean() + drift[l].mean():12.6f} eV"
                f"  computed {e_now[l].mean():12.6f} eV"
                f"  max drift {np.abs(drift[l]).max():12.3e} eV")

    # mu drift audit + heal (round 5).  The reference rebuilds mu
    # only at latt_sync_int (10k cycles; mc_moves.F90:297) — but mu
    # is the BINNING variable, so between resyncs any differential
    # incremental-energy error walks the histogram bin assignment.
    # Common-mode energy drift cancels in mu (beta*(E0-E1) form);
    # what survives is the differential part, reported here in BIN
    # units so estimator impact is directly readable.  Healing at
    # monitor cadence bounds it at monitor_int cycles.
    if prm.num_lattices == 2:
        import jax.numpy as _jnp

        mu_fresh = np.asarray(
            eng._mu_scratch(state.energy, state.volume)
        )
        dmu = np.asarray(state.mu, dtype=np.float64) - mu_fresh
        binw = float(np.asarray(grid.mu_bin)[1]
                     - np.asarray(grid.mu_bin)[0])
        logs.my(f"#  mu   drift {np.abs(dmu).max():12.3e} kT max "
                f"({np.abs(dmu).max() / binw:8.4f} bins); healed")
        state = state._replace(
            mu=_jnp.asarray(mu_fresh, dtype=state.mu.dtype)
        )

    # per-window statistics (dd): the per-rank nodeNNN.log blocks of
    # the reference (io.f90:1105-1144, mc_monitor_stats:1734-1794)
    # collapse to per-window rows here, so a stuck or poisoned
    # walker surfaces in its window's row instead of vanishing into
    # ensemble means
    if prm.parallel_strategy == "dd" and _nwin(state) > 1:
        wid = np.asarray(state.window_id)
        inw = np.asarray(state.in_window)
        mu_w = np.asarray(state.mu, dtype=np.float64)
        f_all = np.asarray(state.f, dtype=np.float64)
        logs.my("# window  walkers in-win acc-tr%  acc-sw%"
                "            f  max|drift|eV           mu range")
        for w in range(_nwin(state)):
            m = wid == w
            if not m.any():
                continue
            at_n = max(att[TRANS][m].sum(), 1.0)
            sw_n = max(att[SWITCH][m].sum(), 1.0)
            at = 100.0 * acc[TRANS][m].sum() / at_n
            asw = 100.0 * acc[SWITCH][m].sum() / sw_n
            dmax = float(np.abs(drift[:, m]).max())
            logs.my(
                f"# win{w:4d} {int(m.sum()):8d} {int(inw[m].sum()):6d}"
                f" {at:7.2f} {asw:8.2f} {f_all[m].max():12.3e}"
                f" {dmax:13.3e}"
                f" [{mu_w[m].min():9.1f},{mu_w[m].max():9.1f}]"
            )

    # reset accumulators (mc_monitor_stats:1797-1810)
    state = state._replace(
        att=jnp.zeros_like(state.att),
        acc=jnp.zeros_like(state.acc),
        trans_per_mol=jnp.zeros_like(state.trans_per_mol),
        avg_energy=jnp.zeros_like(state.avg_energy),
        min_dmu=jnp.full_like(state.min_dmu, jnp.inf),
        max_dmu=jnp.zeros_like(state.max_dmu),
    )

    # curve dumps (mc_monitor_stats:1813-1929).  After sync_all the
    # per-walker deltas are zero and the double-single master rows
    # hold the exact per-window totals (one row per mu-window), so
    # they ARE the reference's per-rank curves.
    if prm.num_lattices == 2 and write_files:
        state = eng.sync_all(state)
        mu_bin = np.asarray(grid.mu_bin)
        f_all = np.asarray(state.f)
        w_cur = ds_value64(state.master_eta)       # [nwin, B]
        h_cur = ds_value64(state.master_hist)
        u_cur = ds_value64(state.master_uhist)
        if prm.parallel_strategy == "mw" or _nwin(state) == 1:
            wl_f = float(f_all.max())
            if not prm.samplerun:
                writers.write_curve("eta_weights.dat", mu_bin,
                                    w_cur[0], wl_f)
            writers.write_curve("histogram.dat", mu_bin, h_cur[0], wl_f)
            writers.write_curve("unbiased_histogram.dat", mu_bin,
                                u_cur[0], wl_f)
        else:
            nwin = _nwin(state)
            wid = np.asarray(state.window_id)
            sbw, ebw = _window_bounds(state, nwin)
            for w in range(nwin):
                s, e = sbw[w], ebw[w] + 1
                fv = float(f_all[wid == w].max())
                writers.write_curve(f"eta_weights_{w:03d}.dat",
                                    mu_bin[s:e], w_cur[w][s:e], fv)
                writers.write_curve(f"histogram_{w:03d}.dat",
                                    mu_bin[s:e], h_cur[w][s:e], fv)
                writers.write_curve(f"unbiased_histogram_{w:03d}.dat",
                                    mu_bin[s:e], u_cur[w][s:e], fv)
            # stitched global weight curve with the max f over windows
            # (mc_monitor_stats:1881-1900)
            joined = join_eta(w_cur, grid.nbins, prm.window_overlap)
            writers.write_curve("eta_weights.dat", mu_bin, joined,
                                float(f_all.max()))
            if prm.samplerun:
                ju = join_uhist(u_cur, grid.nbins, prm.window_overlap)
                writers.write_curve("unbiased_histogram.dat", mu_bin,
                                    ju, 0.0)
    return state


def check_flatness(eng: Engine, state: SamplerState, logs) -> SamplerState:
    """Histogram flatness check + f schedule (mc_check_flatness,
    mc_moves.F90:1936-2185).

    Delta-split layout: all growth is first folded into the
    double-single master rows (one per mu-window), then the flatness
    decision is made per WINDOW on the exact float64 view of those
    rows - the role of the reference's merged rank-0 histogram.  All
    walkers of a window share the merged totals, so window decisions
    broadcast to their walkers (f halving, firstcycle)."""
    prm, grid = eng.prm, eng.grid
    B = grid.nbins
    cycle = int(state.cycle)
    if prm.samplerun:
        return state

    state = eng.sync_all(state)          # (mc_check_flatness:1965-1967)
    nwin = _nwin(state)
    hist_w = ds_value64(state.master_hist)      # [nwin, B] exact f64
    weight_w = ds_value64(state.master_eta)
    if hist_w.sum() < 1e-300:
        return state

    wid = np.asarray(state.window_id)
    f = np.asarray(state.f, dtype=np.float64)
    firstcycle = np.asarray(state.firstcycle).copy()
    hreset = np.asarray(state.histogram_reset).copy()
    invt = np.asarray(state.invt_active).copy()
    sbw, ebw = _window_bounds(state, nwin)
    first = np.array([np.nonzero(wid == w)[0][0] for w in range(nwin)])

    bin_ids = np.arange(B)
    winmask = (bin_ids[None, :] >= sbw[:, None]) & (
        bin_ids[None, :] <= ebw[:, None]
    )  # [nwin, B]

    reset_w = np.zeros(nwin, dtype=bool)
    halve = np.zeros(len(wid), dtype=bool)
    touched_eta = False

    hw = np.where(winmask, hist_w, np.nan)
    mini = np.nanmin(hw, axis=1)                # [nwin]
    av = np.nanmean(hw, axis=1)

    # first-pass histogram reset once every bin has wl_minhist visits
    # (mc_check_flatness:1969-1980); flags are window-uniform
    fp = (
        firstcycle[first] & ~hreset[first]
        & (np.rint(mini) > prm.wl_minhist)
    )  # [nwin]
    if fp.any():
        reset_w |= fp
        hreset |= fp[wid]

    maxi = np.nanmax(hw, axis=1)
    logs.g(f"# Checking flatness of histogram at cycle {cycle:10d}")
    with np.errstate(invalid="ignore", divide="ignore"):
        logs.g(f"# Most  populated bin = {np.nanmean(100 * maxi / av):10.4f} % of mean")
        logs.g(f"# Least populated bin = {np.nanmean(100 * mini / av):10.4f} % of mean")

    std_wl = ~(invt[first] | prm.wl_swetnam)    # [nwin]
    if std_wl.any():
        # flatness criteria by schedule (mc_check_flatness:2024-2052)
        if prm.wl_schedule == 0:
            flat = np.nanmax(np.abs(hw - av[:, None]) / av[:, None],
                             axis=1) <= prm.wl_flattol
        elif prm.wl_schedule == 1:
            flat = np.rint(mini) >= prm.wl_minhist
        elif prm.wl_schedule == 2:
            flat = mini >= (1 - prm.wl_flattol) * av
        else:
            raise ValueError("unknown wl_schedule value")
        flat &= std_wl & ~fp                     # [nwin]

        for w in np.nonzero(flat)[0]:
            sel = wid == w
            if prm.parallel_strategy == "mw" or nwin == 1:
                # shift weights down by the central-bin value
                # (mc_check_flatness:2062-2066)
                weight_w[w] -= weight_w[w, B // 2]
                touched_eta = True
                fv = float(f[sel].max())
                writers.append_wlf("wlf.dat", cycle, fv, 0.5 * fv)
                tag = f"{fv:.12f}"
                writers.write_curve(f"eta_weights.dat_{tag}",
                                    np.asarray(grid.mu_bin),
                                    weight_w[w], fv)
                writers.write_curve(f"histogram.dat_{tag}",
                                    np.asarray(grid.mu_bin),
                                    hist_w[w], fv)
                logs.g("# Flatness criterion satisfied - updating wl_factor")
            else:
                logs.my(f"# window {w}: flatness satisfied - halving f")
            reset_w[w] = True
            halve |= sel
            firstcycle[sel] = False

        if flat.any() and not (prm.parallel_strategy == "mw"
                               or nwin == 1):
            # dd f-history: the reference's rank-0 wlf.dat records
            # comms_get_max(f) across ranks (mc_check_flatness:
            # 2068-2082 with :279-297); here max over windows, before
            # and after this event's halvings
            fmax_pre = float(f.max())
            f_post = np.where(halve, 0.5 * f, f)
            writers.append_wlf("wlf.dat", cycle, fmax_pre,
                               float(f_post.max()))

    f = np.where(halve, 0.5 * f, f)
    if reset_w.any():
        # (comms_set_histogram, mc_check_flatness:1977, 2106)
        hist_w[reset_w] = 0.0

    # switch to 1/t (mc_check_flatness:2135-2143)
    if prm.wl_useinvt:
        wl_invt = B / (cycle * prm.nwater)
        trigger = (f < wl_invt) & (f > 1e-300) & ~invt
        if trigger.any():
            logs.g("# Switching to 1/t method")
            invt |= trigger
            f = np.where(trigger, wl_invt, f)

    # invt/swetnam curve dumps (mc_check_flatness:2149-2179)
    if (invt.any() or prm.wl_swetnam) and cycle % prm.invt_dump_int == 0:
        tag = f"{cycle:020d}"
        writers.append_wlf("wlf.dat", cycle, float(f.max()))
        writers.write_curve(f"eta_weights.dat_{tag}",
                            np.asarray(grid.mu_bin), weight_w[wid[0]],
                            float(f.max()))
        writers.write_curve(f"histogram.dat_{tag}",
                            np.asarray(grid.mu_bin), hist_w[wid[0]],
                            float(f.max()))

    dsdtype = state.master_hist.hi.dtype
    state = state._replace(
        f=jnp.asarray(f, dtype=state.f.dtype),
        firstcycle=jnp.asarray(firstcycle),
        histogram_reset=jnp.asarray(hreset),
        invt_active=jnp.asarray(invt),
    )
    if reset_w.any():
        state = state._replace(
            master_hist=ds_from64(hist_w, dtype=dsdtype)
        )
    if touched_eta:
        state = state._replace(
            master_eta=ds_from64(weight_w, dtype=dsdtype)
        )
    return state


def compute_deltaG(eng: Engine, state: SamplerState, logs,
                   aux) -> SamplerState:
    """Free-energy estimate from the unbiased histogram
    (mc_compute_deltaG_from_hist, mc_moves.F90:2498-2621)."""
    prm, grid = eng.prm, eng.grid
    B = grid.nbins
    cycle = int(state.cycle)
    state = eng.sync_all(state)
    u_cur = ds_value64(state.master_uhist)           # [nwin, B]
    if prm.parallel_strategy == "mw" or _nwin(state) == 1:
        joined = u_cur[0]
    else:
        joined = join_uhist(u_cur, B, prm.window_overlap)

    bw = np.asarray(grid.binwidth)
    norm = (joined * bw).sum()
    if norm <= 0:
        logs.g(f"# deltaG at cycle {cycle}: histogram empty, skipped")
        return state
    normP = joined / norm
    pA = (normP[: B // 2] * bw[: B // 2]).sum()
    pB = (normP[B // 2:] * bw[B // 2:]).sum()
    deltaG = np.log(pA / pB)
    beta = prm.beta
    if prm.leshift:
        rh = np.asarray(aux.ref_enthalpy)
        deltaG = deltaG + beta * rh[1] - beta * rh[0]

    kT = KB * prm.temperature
    per_mol = deltaG / prm.nwater
    logs.g(f"# Estimate of delta G from histogram at cycle {cycle:10d}")
    logs.g(f"# G(lattice2) - G(lattice1) = {per_mol:15.8f} kT/molecule")
    logs.g(f"# G(lattice2) - G(lattice1) = "
           f"{kT * HART_TO_KJPM * 1000.0 * per_mol:15.8f} J/mole")
    logs.g(f"# G(lattice2) - G(lattice1) = "
           f"{kT * HART_TO_EV * 1000.0 * per_mol:15.8f} meV/molecule")
    # cycle-tagged dump carries a third RAW (unnormalised, cumulative)
    # column so post-processing can difference consecutive dumps into
    # independent time blocks for the deltaG error bar
    # (scripts/deltag_error.py); the monitor's plain
    # unbiased_histogram.dat keeps the reference's 2-column format
    path = f"unbiased_histogram_{cycle:010d}.dat"
    mub = np.asarray(grid.mu_bin)
    with open(path, "w") as fh:
        fh.write("#Current energy increment =  0.000000000000E+00\n")
        for m, v, rw in zip(mub, normP, joined):
            fh.write(f"  {m: .14E}  {v: .14E}  {rw: .14E}\n")
    if prm.parallel_strategy == "dd" and _nwin(state) > 1:
        # dd: the stitched raw column above is NOT block-differencable
        # (the per-window matching constants of join_uhist change as
        # the histograms grow), so ALSO dump the cumulative PER-WINDOW
        # raw histograms - deltag_error.py --dd differences these per
        # window and re-stitches each delete-one-block total
        wpath = f"uhist_windows_{cycle:010d}.dat"
        with open(wpath, "w") as fh:
            fh.write(f"# mu then {u_cur.shape[0]} per-window raw "
                     "cumulative unbiased-histogram columns "
                     f"(window_overlap={prm.window_overlap})\n")
            for k in range(B):
                fh.write(f"  {mub[k]: .14E}" + "".join(
                    f"  {u_cur[w, k]: .14E}"
                    for w in range(u_cur.shape[0])
                ) + "\n")
        # round 5: ALSO dump cumulative per-window visit COUNTS and
        # the frozen per-window eta rows.  At large N the in-flight
        # exp(eta - log_norm) increment spans more dynamic range than
        # f32 holds (weight curves of 10^3-10^4 kT), so the robust
        # estimator recombines counts x exp(-eta) OFFLINE in f64
        # log-space (deltag_error.py --dd-counts); counts have no
        # range problem and eta is frozen in a samplerun.
        h_cur = ds_value64(state.master_hist)
        e_cur = ds_value64(state.master_eta)
        cpath = f"hist_windows_{cycle:010d}.dat"
        with open(cpath, "w") as fh:
            fh.write(f"# mu then {h_cur.shape[0]} per-window "
                     "cumulative visit-count columns then "
                     f"{e_cur.shape[0]} frozen eta columns "
                     f"(window_overlap={prm.window_overlap})\n")
            for k in range(B):
                fh.write(f"  {mub[k]: .14E}" + "".join(
                    f"  {h_cur[w, k]: .14E}"
                    for w in range(h_cur.shape[0])
                ) + "".join(
                    f"  {e_cur[w, k]: .14E}"
                    for w in range(e_cur.shape[0])
                ) + "\n")
    return state
