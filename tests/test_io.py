"""IO-layer tests: namelist parsing of the packaged inputs, curve
round-trips, DCD record structure, checkpoint dual-slot semantics."""

import struct

import numpy as np
import pytest

from mc_water_ls_mw_tpu.constants import ANG_TO_BOHR, AUP_TO_ATM
from mc_water_ls_mw_tpu.io.namelist import read_input
from mc_water_ls_mw_tpu.io import writers


def test_parse_ice1_sample(examples_dir):
    prm = read_input(str(examples_dir / "ice1_sample" / "ice.input"))
    assert prm.model_type == "mW"
    assert prm.temperature == 200.0
    assert prm.pressure == pytest.approx(1.0 / AUP_TO_ATM)
    assert prm.mc_ensemble == "npt"
    assert prm.mc_max_trans == pytest.approx(1.1 * ANG_TO_BOHR)
    assert prm.mc_dv_max == pytest.approx(0.924 * ANG_TO_BOHR)
    assert prm.nbins == 101
    assert prm.mu_max == 400 and prm.mu_min == -400
    assert prm.mc_always_switch is True
    assert prm.eta_interp is True
    assert prm.samplerun is True
    assert prm.nwater == 48
    assert prm.ls == 1
    assert prm.list_update_int == 10
    assert prm.file_output_int == 50
    assert prm.max_mc_cycles == 20_000_000
    assert prm.eq_mc_cycles == 10_000
    assert prm.eq_adjust_mc is True
    assert prm.timer_qtime == 172800
    assert prm.seedname == "ice"
    # pre-read override quirk: vol prob = 1/768 (io.f90:172 with the
    # compile-time default nwater, since config is read later)
    assert prm.mc_vol_prob == pytest.approx(1.0 / 768)
    assert prm.mc_switch_prob == pytest.approx(0.1)
    assert prm.parallel_strategy == "mw"


def test_parse_single_box(examples_dir):
    prm = read_input(str(examples_dir / "single_box" / "ice.input"))
    assert prm.num_lattices == 1
    # single-box overrides (io.f90:208-220)
    assert prm.allow_switch is False
    assert prm.mc_switch_prob == 0.0
    assert prm.mc_always_switch is False
    assert prm.ls == 1
    assert prm.temperature == 220.0
    assert prm.samplerun is False


def test_parse_dd_variants(examples_dir):
    for name in ("ice1_sample_dd", "ice1_gen_weights_dd"):
        prm = read_input(str(examples_dir / name / "ice.input"))
        assert prm.parallel_strategy == "dd"
        assert prm.window_overlap == 2


def test_parse_gen_weights(examples_dir):
    prm = read_input(str(examples_dir / "ice1_gen_weights" / "ice.input"))
    assert prm.samplerun is False
    assert prm.wl_factor == pytest.approx(0.005)
    assert prm.wl_flattol == pytest.approx(0.05)


def test_tpu_namelist_extension(tmp_path, examples_dir):
    src = (examples_dir / "ice1_sample" / "ice.input").read_text()
    src += "\n&tpu\nn_walkers = 128\ndtype = 'float32'\nseed = 7\n/\n"
    p = tmp_path / "x.input"
    p.write_text(src)
    prm = read_input(str(p))
    assert prm.n_walkers == 128
    assert prm.dtype == "float32"
    assert prm.seed == 7


def test_read_reference_eta_weights(examples_dir):
    f, w = writers.read_eta_weights(
        str(examples_dir / "ice1_sample" / "eta_weights.dat")
    )
    assert f == pytest.approx(0.0500000007451)
    assert len(w) == 101


def test_curve_roundtrip(tmp_path):
    mu = np.linspace(-5, 5, 11)
    v = np.sin(mu)
    path = tmp_path / "c.dat"
    writers.write_curve(path, mu, v, 0.025)
    f, w = writers.read_eta_weights(str(path))
    assert f == pytest.approx(0.025)
    np.testing.assert_allclose(w, v, rtol=1e-12)


def test_dcd_binary_records(tmp_path):
    path = str(tmp_path / "t.dcd")
    writers.write_dcd_header(path, 96)
    r = np.random.default_rng(0).normal(size=(96, 3))
    H = np.diag([20.0, 20.0, 20.0])
    writers.append_dcd_snapshot(path, r[:48], r[48:], H)
    raw = open(path, "rb").read()
    # first record: 'CORD' + 20 ints, Fortran length prefix 84
    n = struct.unpack("<i", raw[:4])[0]
    assert n == 84
    assert raw[4:8] == b"CORD"
    icntrl = struct.unpack("<20i", raw[8:88])
    assert icntrl[7] == 96        # natoms
    assert icntrl[19] == 24       # CHARMM version
    assert struct.unpack("<i", raw[88:92])[0] == 84  # suffix length


def test_checkpoint_dual_slot(tmp_path, examples_dir):
    import jax.numpy as jnp

    from mc_water_ls_mw_tpu.io import checkpoint as ck
    from mc_water_ls_mw_tpu.models.sw import MW
    from mc_water_ls_mw_tpu.mcmc.bins import build_bin_grid
    from mc_water_ls_mw_tpu.mcmc.config import RunParams
    from mc_water_ls_mw_tpu.mcmc.state import init_state
    from mc_water_ls_mw_tpu.io.xmol import read_lattices

    r0, H0 = read_lattices(examples_dir / "ice1_sample", 2, 48)
    prm = RunParams(nwater=48, num_lattices=2, n_walkers=2,
                    dtype="float64", nbins=11, mu_min=-40, mu_max=40)
    grid = build_bin_grid(prm.nbins, prm.mu_min, prm.mu_max)
    state, _ = init_state(prm, MW, r0, H0, grid)

    assert not ck.restart_available(tmp_path)
    w = ck.CheckpointWriter(str(tmp_path))
    w.write(state)
    s1 = state._replace(cycle=jnp.asarray(5, dtype=jnp.int32))
    w.write(s1)
    assert ck.restart_available(tmp_path)
    # loader picks the newer slot (cycle 5)
    loaded, cycle, path = ck.load_checkpoint(state, str(tmp_path))
    assert cycle == 5
    np.testing.assert_allclose(
        np.asarray(loaded.r), np.asarray(state.r)
    )
    # corrupt the newer slot: loader falls back to the older one
    open(path, "wb").write(b"garbage")
    loaded2, cycle2, _ = ck.load_checkpoint(state, str(tmp_path))
    assert cycle2 == 0


def test_checkpoint_background_writer(tmp_path, examples_dir):
    """Background mode overlaps the savez with the cycle loop; the
    dual-slot/load semantics must be identical, a queued write must
    be joinable via wait(), and a failed disk write must re-raise
    instead of passing silently."""
    import jax.numpy as jnp

    from mc_water_ls_mw_tpu.io import checkpoint as ck
    from mc_water_ls_mw_tpu.models.sw import MW
    from mc_water_ls_mw_tpu.mcmc.bins import build_bin_grid
    from mc_water_ls_mw_tpu.mcmc.config import RunParams
    from mc_water_ls_mw_tpu.mcmc.state import init_state
    from mc_water_ls_mw_tpu.io.xmol import read_lattices

    r0, H0 = read_lattices(examples_dir / "ice1_sample", 2, 48)
    prm = RunParams(nwater=48, num_lattices=2, n_walkers=2,
                    dtype="float64", nbins=11, mu_min=-40, mu_max=40)
    grid = build_bin_grid(prm.nbins, prm.mu_min, prm.mu_max)
    state, _ = init_state(prm, MW, r0, H0, grid)

    w = ck.CheckpointWriter(str(tmp_path), background=True)
    w.write(state)
    s1 = state._replace(cycle=jnp.asarray(7, dtype=jnp.int32))
    w.write(s1)          # joins the first write before slot 2
    w.wait()
    loaded, cycle, _ = ck.load_checkpoint(state, str(tmp_path))
    assert cycle == 7
    np.testing.assert_allclose(
        np.asarray(loaded.r), np.asarray(state.r)
    )
    # wait=True forces a synchronous final write
    s2 = state._replace(cycle=jnp.asarray(9, dtype=jnp.int32))
    w.write(s2, wait=True)
    _, cycle2, _ = ck.load_checkpoint(state, str(tmp_path))
    assert cycle2 == 9

    # a background write into a removed directory must surface
    import shutil

    bad = tmp_path / "gone"
    bad.mkdir()
    wb = ck.CheckpointWriter(str(bad), background=True)
    shutil.rmtree(bad)
    wb.write(state)
    with pytest.raises(OSError):
        wb.wait()


def test_tile_cell(examples_dir):
    import jax.numpy as jnp

    from mc_water_ls_mw_tpu.io.xmol import read_lattices, tile_cell
    from mc_water_ls_mw_tpu.models.sw import MW
    from mc_water_ls_mw_tpu.ops.dense import (
        full_energy_dense, reduced_shift_set,
    )

    r, H = read_lattices(examples_dir / "ice1_sample", 2, 48)
    r2, H2 = tile_cell(r[0], H[0], (2, 2, 2))
    assert r2.shape == (384, 3)
    # energy per molecule is invariant under exact tiling
    sh1 = jnp.asarray(reduced_shift_set(H[0], MW))
    sh2 = jnp.asarray(reduced_shift_set(H2, MW))
    e1, _ = full_energy_dense(jnp.asarray(r[0]), jnp.asarray(H[0]),
                              sh1, MW, True)
    e2, _ = full_energy_dense(jnp.asarray(r2), jnp.asarray(H2),
                              sh2, MW, True)
    assert float(e2) / 8 == pytest.approx(float(e1), rel=1e-12)
