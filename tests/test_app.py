"""End-to-end application tests: the packaged reference examples run
through the full driver (config -> xmol -> engine -> outputs ->
checkpoint -> restart), SURVEY.md §4 oracle g."""

import os

import numpy as np
import pytest

from mc_water_ls_mw_tpu.app import run_input_file


def _stage(tmp_path, examples_dir, name):
    import shutil

    for f in (examples_dir / name).iterdir():
        shutil.copy(f, tmp_path / f.name)
    return str(tmp_path / "ice.input")


OVR = {"n_walkers": 4, "dtype": "float64", "monitor_int": 50,
       "chkpt_dump_int": 50, "flat_chk_int": 50, "deltaG_int": 50,
       "mpi_sync_int": 10, "file_output_int": 10, "eq_mc_cycles": 10}


def test_single_box_end_to_end(tmp_path, examples_dir):
    inp = _stage(tmp_path, examples_dir, "single_box")
    cwd = os.getcwd()
    try:
        run_input_file(inp, overrides={**OVR}, max_cycles=50)
    finally:
        os.chdir(cwd)
    assert (tmp_path / "mc.log").exists()
    assert (tmp_path / "node000.log").exists()
    therm = np.loadtxt(tmp_path / "ice000_therm.dat")
    assert therm.shape[0] == 5           # cycles 10..50 step 10
    assert (tmp_path / "checkpoint000.npz.1").exists()
    log = (tmp_path / "node000.log").read_text()
    assert "Computed energies" in log
    assert "-25.55" in log               # Ih lattice energy oracle (eV)


@pytest.mark.slow
def test_profile_dir_writes_trace(tmp_path, examples_dir):
    """Framework extension beyond reference parity (SURVEY.md §5.1):
    --profile-dir captures a device trace of one steady-state block."""
    inp = _stage(tmp_path, examples_dir, "single_box")
    cwd = os.getcwd()
    prof = tmp_path / "prof"
    try:
        run_input_file(
            inp,
            overrides={**OVR, "n_walkers": 2, "monitor_int": 10,
                       "chkpt_dump_int": 10, "flat_chk_int": 10,
                       "traj_output_int": 10, "eq_mc_cycles": 1},
            max_cycles=30, profile_dir=str(prof),
        )
    finally:
        os.chdir(cwd)
    traces = list(prof.rglob("*.trace.json.gz"))
    assert traces, "no profiler trace written"
    log = (tmp_path / "mc.log").read_text()
    assert "profiler trace" in log


@pytest.mark.slow
def test_sample_run_end_to_end_with_restart(tmp_path, examples_dir):
    inp = _stage(tmp_path, examples_dir, "ice1_sample")
    cwd = os.getcwd()
    try:
        run_input_file(inp, overrides={**OVR}, max_cycles=50)
        t1 = np.loadtxt(tmp_path / "ice000_therm.dat")
        # second invocation must auto-restart and continue
        run_input_file(inp, overrides={**OVR}, max_cycles=50)
        t2 = np.loadtxt(tmp_path / "ice000_therm.dat")
    finally:
        os.chdir(cwd)
    assert t1[-1, 0] == 50
    assert t2[-1, 0] == 100              # continued, appended
    assert t2.shape[0] == 2 * t1.shape[0]
    # monitor dumped merged curves + deltaG output
    assert (tmp_path / "histogram.dat").exists()
    assert (tmp_path / "unbiased_histogram.dat").exists()
    assert (tmp_path / "unbiased_histogram_0000000050.dat").exists()
    log = (tmp_path / "mc.log").read_text()
    assert "delta G" in log


@pytest.mark.slow
def test_largen_cell_engine_end_to_end(tmp_path, examples_dir):
    """The large-N cell engine through the full driver: &tpu
    largen='on' + the stacking builder select CellEngine inside
    Application.setup; cycles, therm output and the audit's
    drift-free energies all flow through the slab path."""
    inp = _stage(tmp_path, examples_dir, "single_box")
    cwd = os.getcwd()
    try:
        run_input_file(
            inp,
            overrides={"n_walkers": 2, "dtype": "float64",
                       "num_lattices": 1, "largen": "on",
                       "stack": (10, 6, 12), "monitor_int": 2,
                       "chkpt_dump_int": 2, "flat_chk_int": 2,
                       "traj_output_int": 10, "file_output_int": 2,
                       "eq_mc_cycles": 1, "mpi_sync_int": 2,
                       "list_update_int": 2},
            max_cycles=4,
        )
    finally:
        os.chdir(cwd)
    log = (tmp_path / "mc.log").read_text()
    assert "Built stacking pair" in log or "stacking" in log.lower()
    nlog = (tmp_path / "node000.log").read_text()
    assert "cell" in nlog.lower() or "cell" in log.lower()
    therm = np.loadtxt(tmp_path / "ice000_therm.dat")
    assert therm.shape[0] >= 1
    # the monitor's drift table ran on the slab audit path
    assert "drift" in nlog.lower() or "Energy" in nlog


@pytest.mark.slow
def test_sample_dd_end_to_end(tmp_path, examples_dir):
    """ice1_sample_dd through the full driver: dd mu-window
    decomposition on the dense engine, stitched curve output
    (comms_join_eta / comms_join_uhist semantics,
    examples/ice1_sample_dd/ice.input final namelist)."""
    inp = _stage(tmp_path, examples_dir, "ice1_sample_dd")
    cwd = os.getcwd()
    try:
        run_input_file(
            inp,
            overrides={**OVR, "n_walkers": 8, "n_windows": 4},
            max_cycles=50,
        )
    finally:
        os.chdir(cwd)
    # stitched full-grid unbiased histogram: every bin present, finite
    uh = np.loadtxt(tmp_path / "unbiased_histogram.dat")
    assert uh.shape[0] == 101
    assert np.isfinite(uh).all()
    # per-window histogram curves (reference writes per-rank windows)
    for w in range(4):
        assert (tmp_path / f"histogram_{w:03d}.dat").exists()
    log = (tmp_path / "mc.log").read_text()
    assert "delta G" in log
    # per-window monitor rows (the reference's per-rank nodeNNN.log
    # statistics, io.f90:1105-1144, collapsed to one row per window)
    nlog = (tmp_path / "node000.log").read_text()
    for w in range(4):
        assert f"# win{w:4d}" in nlog


def test_samplerun_from_generation_checkpoint(tmp_path, examples_dir):
    """Round-5 pipeline step: restarting a GENERATION checkpoint
    (f > 0) with samplerun=True must keep the chain state + eta but
    freeze f, zero the histogram/uhist accumulators, and recompute
    log_unbiased_norm from the checkpoint's stitched eta (else the
    exp(eta - log_norm) clamp distorts the estimator)."""
    inp = _stage(tmp_path, examples_dir, "ice1_gen_weights_dd")
    ovr = {**OVR, "n_walkers": 8, "n_windows": 4}
    cwd = os.getcwd()
    try:
        run_input_file(inp, overrides=ovr, max_cycles=30)
        s = run_input_file(
            inp, overrides={**ovr, "samplerun": True}, max_cycles=30
        )
    finally:
        os.chdir(cwd)
    assert float(np.asarray(s.f).max()) == 0.0
    # eta carried over from generation (nonzero somewhere)
    from mc_water_ls_mw_tpu.ops.dsfloat import ds_value64

    assert np.abs(ds_value64(s.master_eta)).max() > 0
    nlog = (tmp_path / "node000.log").read_text()
    assert "Sample phase from a generation checkpoint" in nlog
    assert "Recomputed log_unbiased_norm" in nlog
    # uhist accumulated fresh during the sample segment only: finite
    uh = ds_value64(s.master_uhist)
    assert np.isfinite(uh).all()


@pytest.mark.slow
def test_gen_weights_dd_end_to_end(tmp_path, examples_dir):
    """ice1_gen_weights_dd: WL weight refinement with per-window
    flatness + overlap-matched stitching of the merged eta curve."""
    inp = _stage(tmp_path, examples_dir, "ice1_gen_weights_dd")
    cwd = os.getcwd()
    try:
        run_input_file(
            inp,
            overrides={**OVR, "n_walkers": 8, "n_windows": 4},
            max_cycles=50,
        )
    finally:
        os.chdir(cwd)
    from mc_water_ls_mw_tpu.io.writers import read_eta_weights

    f, w = read_eta_weights(str(tmp_path / "eta_weights.dat"))
    w = np.asarray(w)
    assert len(w) == 101
    assert np.isfinite(w).all()
    assert w.max() > 0                    # weights grew in-window


@pytest.mark.slow
def test_checkpoint_fingerprint_mismatch(tmp_path, examples_dir):
    """A checkpoint from an incompatible configuration must be
    REFUSED with a clear error, not positionally mis-loaded
    (io/checkpoint.py fingerprint)."""
    inp = _stage(tmp_path, examples_dir, "ice1_sample")
    cwd = os.getcwd()
    try:
        run_input_file(inp, overrides={**OVR}, max_cycles=20)
        # restart with a different walker count -> layout mismatch
        with pytest.raises(RuntimeError, match="incompatible"):
            run_input_file(
                inp, overrides={**OVR, "n_walkers": 8}, max_cycles=20
            )
    finally:
        os.chdir(cwd)


@pytest.mark.slow
def test_gen_weights_run(tmp_path, examples_dir):
    inp = _stage(tmp_path, examples_dir, "ice1_gen_weights")
    cwd = os.getcwd()
    try:
        run_input_file(inp, overrides={**OVR}, max_cycles=50)
    finally:
        os.chdir(cwd)
    # WL mode refines weights and dumps them at monitor points
    f, w = __import__(
        "mc_water_ls_mw_tpu.io.writers", fromlist=["read_eta_weights"]
    ).read_eta_weights(str(tmp_path / "eta_weights.dat"))
    assert len(w) == 101
    assert np.asarray(w).max() > 0        # weights grew


@pytest.mark.slow
def test_full_wl_to_deltag_pipeline(tmp_path, examples_dir):
    """The production workflow end-to-end at toy scale: Wang-Landau
    weight GENERATION until f halves (flatness events, wlf.dat,
    eta_weights.dat), then a fresh SAMPLE run in the same directory
    that warm-starts from those weights, accumulates the unbiased
    histogram and reports deltaG (the two-phase protocol of the
    reference's ice1_gen_weights -> ice1_sample examples)."""
    inp = _stage(tmp_path, examples_dir, "ice1_gen_weights")
    os.remove(tmp_path / "eta_weights.dat") \
        if (tmp_path / "eta_weights.dat").exists() else None
    gen = {
        "n_walkers": 8, "dtype": "float64",
        "nbins": 11, "mu_min": -20.0, "mu_max": 20.0,
        "wl_factor": 0.2, "wl_minhist": 2, "wl_flattol": 0.4,
        "eq_mc_cycles": 5, "mpi_sync_int": 5, "flat_chk_int": 25,
        "monitor_int": 100, "chkpt_dump_int": 10_000,
        "deltaG_int": 10_000, "file_output_int": 100,
    }
    cwd = os.getcwd()
    try:
        run_input_file(inp, overrides=dict(gen), max_cycles=800)
    finally:
        os.chdir(cwd)
    wlf = (tmp_path / "wlf.dat").read_text().strip().splitlines()
    assert len(wlf) >= 1, "no flatness event in 800 cycles"
    from mc_water_ls_mw_tpu.io.writers import read_eta_weights

    f_gen, w_gen = read_eta_weights(str(tmp_path / "eta_weights.dat"))
    assert f_gen < 0.2                    # halved at least once
    assert np.asarray(w_gen).max() > 0

    # phase 2: sample with the generated weights (fresh chain - drop
    # the generation checkpoints, keep eta_weights.dat)
    for slot in ("checkpoint000.npz.1", "checkpoint000.npz.2"):
        p = tmp_path / slot
        if p.exists():
            os.remove(p)
    sample = dict(gen, samplerun=True, deltaG_int=100,
                  flat_chk_int=10_000)
    try:
        run_input_file(inp, overrides=sample, max_cycles=400)
    finally:
        os.chdir(cwd)
    log = (tmp_path / "mc.log").read_text()
    assert "Estimate of delta G from histogram" in log
    dumps = sorted(tmp_path.glob("unbiased_histogram_*.dat"))
    assert dumps, "no cycle-tagged unbiased histogram dumps"
    arr = np.loadtxt(dumps[-1])
    assert arr.shape[1] == 3              # raw column present
    assert np.isfinite(arr).all() and arr[:, 2].sum() > 0
