"""Double-single accumulator exactness (ops/dsfloat.py) - the fix for
the f32 histogram-saturation artifact found in runs/n216_wl."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from mc_water_ls_mw_tpu.ops.dsfloat import (  # noqa: E402
    DS,
    ds_add,
    ds_from,
    ds_from64,
    ds_sub,
    ds_value64,
    ds_zeros,
)


def _f32_loop(fn, d, xs):
    for x in xs:
        d = fn(d, x)
    return d


def test_no_saturation_at_f32_ceiling():
    """The failure mode that stalled the N=216 WL run: adding 0.25 to
    a plain f32 accumulator stops changing it at 0.25 * 2**24; the DS
    accumulator keeps counting exactly."""
    incr = np.float32(0.25)
    start = np.float32(incr * 2**24)           # saturated plain-f32
    d = ds_from(jnp.asarray(start))
    # jit the repeated accumulation like the per-sync path does
    step = jax.jit(
        lambda c, _: ((c[0] + incr, ds_add(c[1], incr)), None)
    )
    (plain, d), _ = jax.lax.scan(
        step, (jnp.asarray(start), d), None, length=1000
    )
    assert float(plain) == float(start)        # plain f32: frozen
    got = ds_value64(d)
    want = float(start) + 0.25 * 1000
    assert got == want


def test_random_accumulation_matches_f64():
    rng = np.random.default_rng(7)
    xs = rng.uniform(0.0, 20.0, size=4096).astype(np.float32)
    d = ds_zeros(())
    d = _f32_loop(lambda c, x: ds_add(c, jnp.asarray(x)), d, xs)
    want = np.sum(xs.astype(np.float64))
    got = ds_value64(d)
    assert abs(got - want) <= 1e-6 * abs(want)


def test_subtract_shift_is_exact():
    """The per-window min-shift must not ratchet: adding then removing
    the same shift returns the exact value."""
    d = ds_from(jnp.asarray(np.float32(1.7e8)))
    d1 = ds_add(d, np.float32(0.3))
    d2 = ds_sub(ds_add(d1, np.float32(123.456)), np.float32(123.456))
    # double-single is exact to ~2**-48 relative per operation
    assert abs(ds_value64(d2) - ds_value64(d1)) <= 2**-46 * 1.7e8


def test_from64_roundtrip():
    x = np.array([1.0 + 2**-30, 38.25, 4260933.0, 0.0])
    d = ds_from64(x)
    np.testing.assert_array_equal(ds_value64(d), x)


def test_elementwise_shapes():
    d = ds_zeros((3, 5))
    d = ds_add(d, jnp.ones((3, 5), jnp.float32))
    assert isinstance(d, DS)
    assert ds_value64(d).shape == (3, 5)
    np.testing.assert_array_equal(ds_value64(d), np.ones((3, 5)))
