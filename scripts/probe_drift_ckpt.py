"""Audit a production checkpoint's stored-vs-fresh energy per walker
and correlate the drift with volume deviation / mu (round 5).

The N=8064 WL production's monitor rows show incremental-energy
drift GROWING with |mu| (window 13/14: ~45 eV; window 15, nearest
the basin: 413 eV).  Candidate mechanisms with distinct signatures:

* f32 accumulation noise — unsigned, grows ~sqrt(moves), NO
  correlation with volume or mu;
* stencil-coverage breakdown at volume-changed boxes (the fine-cell
  coverage tables are built once from H0; a volume move rescales the
  box) — drift correlates with |V - V_init|;
* strained-replica pathology (cutoff-edge clamp, wing corrections)
  — drift correlates with |mu| but not volume.

Loads the newest checkpoint slot from the run dir, rebuilds the
exact engine the app would, audits from scratch, and prints the
per-walker regression.  CPU by default (only the full-energy program
compiles, not the cycle kernel); no chip contention.

Usage: python scripts/probe_drift_ckpt.py runs/n8064_wl
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

if os.environ.get("PROBE_PLATFORM", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from mc_water_ls_mw_tpu.constants import HART_TO_EV


def main():
    rd = sys.argv[1] if len(sys.argv) > 1 else "runs/n8064_wl"
    rd = os.path.abspath(rd)   # Application chdir's into the run dir

    # rebuild the app's engine + state exactly (reads ice.input and
    # the run.py override set is mirrored via the namelist file plus
    # the overrides below, which must match runs/<rd>/run.py)
    from mc_water_ls_mw_tpu.io.namelist import read_input
    from mc_water_ls_mw_tpu.app import Application

    overrides = dict(
        stack=(14, 8, 18), n_walkers=128,
        parallel_strategy="dd", n_windows=16, window_overlap=2,
        mu_min=-90000.0, mu_max=90000.0, nbins=201,
        cell_trials=8, mc_max_trans=0.10, mc_dv_max=0.2,
        eq_adjust_mc=True, wl_factor=0.005 * 16.0 / 128,
        eq_mc_cycles=400, list_update_int=10, mpi_sync_int=50,
        monitor_int=500, flat_chk_int=500, wl_minhist=5,
        file_output_int=100, therm_walkers=8,
        traj_output_int=100_000_000, chkpt_dump_int=250,
        timer_qtime=10 ** 9, timer_closetime=420,
        max_mc_cycles=100_000_000,
    )
    prm = read_input(os.path.join(rd, "ice.input"),
                     extra_overrides=overrides)
    app = Application(prm, workdir=rd, use_mesh=False)
    if not app.restart:
        sys.exit("no checkpoint in " + rd)

    # setup() restores the newest checkpoint, resyncs chains and
    # AUDITS (healing) — so to see the drift we must intercept:
    # load the raw state, then audit manually before any heal.
    from mc_water_ls_mw_tpu.io import checkpoint as ckpt

    # build engine + fresh template state via setup minus restart:
    app.restart = False
    app.setup()
    tmpl = app.state
    migrate = None
    if app.cellgrid is not None:
        migrate = (app.cellgrid.nfine, app.cellgrid.cap)
    loaded = ckpt.load_checkpoint(tmpl, rd, cell_migrate=migrate)
    if loaded is None:
        # diff the fingerprints so the refusal is actionable
        import json

        want = json.loads(ckpt.state_fingerprint(tmpl))
        z = np.load(ckpt.checkpoint_paths(rd)[0])
        got = json.loads(bytes(z["__fingerprint__"]).decode())
        for (wn, wl), (gn, gl) in zip(want["fields"],
                                      got["fields"]):
            if (wn, wl) != (gn, gl):
                print(f"fingerprint diff: template {wn}={wl} "
                      f"stored {gn}={gl}")
        sys.exit("checkpoint unreadable (fingerprint)")
    st, cycle, path = loaded
    print(f"checkpoint {path} at cycle {cycle}")

    eng = app.engine
    import jax.numpy as jnp

    stored = np.asarray(st.energy, np.float64) + np.asarray(
        getattr(st, "energy_err", np.zeros_like(st.energy)),
        np.float64)
    healed, drift = eng.audit_energy(st)
    d = np.asarray(drift, np.float64) * HART_TO_EV        # [L,W]
    mu_tracked = np.asarray(st.mu, np.float64)
    mu_fresh = np.asarray(
        eng._mu_scratch(healed.energy, healed.volume), np.float64
    )
    dmu = mu_tracked - mu_fresh
    vol = np.asarray(st.volume, np.float64)               # [L,W]
    v0 = np.asarray(tmpl.volume, np.float64)[:, :1]       # init vols
    dv = (vol - v0) / v0                                  # rel [L,W]
    wid = np.asarray(st.window_id)

    print(f"energy drift eV: mean {d.mean():+.3e} "
          f"max|.| {np.abs(d).max():.3e}")
    print(f"mu drift kT   : mean {dmu.mean():+.3e} "
          f"max|.| {np.abs(dmu).max():.3e}")
    for l in range(d.shape[0]):
        c_v = np.corrcoef(np.abs(d[l]), np.abs(dv[l]))[0, 1]
        c_m = np.corrcoef(np.abs(d[l]), np.abs(mu_fresh))[0, 1]
        print(f"latt {l}: corr(|drift|, |dV/V0|) = {c_v:+.3f}   "
              f"corr(|drift|, |mu|) = {c_m:+.3f}   "
              f"dV/V0 range [{dv[l].min():+.4f}, {dv[l].max():+.4f}]")
    print("per-window: wid  max|dE|eV  max|dmu|  max|dV/V0|  "
          "max|mu_fresh|")
    for w in range(int(wid.max()) + 1):
        m = wid == w
        print(f"  {w:3d}  {np.abs(d[:, m]).max():10.3e}  "
              f"{np.abs(dmu[m]).max():10.3e}  "
              f"{np.abs(dv[:, m]).max():8.4f}  "
              f"{np.abs(mu_fresh[m]).max():10.1f}")


if __name__ == "__main__":
    main()
