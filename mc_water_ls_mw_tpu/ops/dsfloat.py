"""Double-single (two-float32) accumulators for shared WL arrays.

Why this exists: the WL weight/histogram arrays are unbounded running
sums of tiny increments.  Round 1 accumulated them directly in the
per-walker float32 state and the N=216 production run exposed the
failure mode: once a histogram bin's value exceeds ``incr * 2**24``,
adding ``incr`` no longer changes the float32 value at all, so every
bin SATURATES at a ceiling proportional to 1/binwidth.  The measured
curve (runs/n216_wl/histogram.dat) shows exactly that - bins frozen at
power-of-two plateaus (4.2% / 8.3% / ... / 524% of mean, least bin =
``0.25 * 2**24`` = 4.26e6) - which is why the flatness fraction
asymptoted at 4.16% forever: a pure quantisation artifact, not
sampling.

The reference never sees this because its accumulators are float64
(constants.f90:16).  On TPU, float64 is emulated and would poison the
hot path, and flipping jax_enable_x64 process-wide risks silent
promotions in the float32 kernels.  Instead the merged MASTER arrays
(one row per mu-window, updated only at delta-sync boundaries) carry a
double-single representation: an unevaluated sum hi + lo of two
float32 with |lo| <= ulp(hi)/2, giving ~48 mantissa bits - enough for
>1e12 counts at 0.25 resolution.  Per-walker arrays hold only the
GROWTH since the last sync, which starts at zero every window and
therefore always resolves its own increments in plain float32.

The algorithms are the classic error-free transformations (Knuth
TwoSum, Dekker Fast2Sum) used by double-double arithmetic; they rely
only on IEEE round-to-nearest addition, which the TPU VPU provides for
float32.  All functions are elementwise, jit- and shard-safe.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class DS(NamedTuple):
    """Unevaluated float32 sum: value = hi + lo, |lo| <= ulp(hi)/2."""

    hi: jnp.ndarray
    lo: jnp.ndarray


def ds_zeros(shape, dtype=jnp.float32) -> DS:
    return DS(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


def ds_from(x) -> DS:
    """Promote a plain array to DS (lo = 0)."""
    x = jnp.asarray(x)
    return DS(x, jnp.zeros_like(x))


def _two_sum(a, b):
    """Knuth TwoSum: s + e == a + b exactly (no magnitude ordering)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def ds_add(d: DS, x) -> DS:
    """d + x (x a plain array/scalar), renormalised."""
    s, e = _two_sum(d.hi, jnp.asarray(x, d.hi.dtype))
    lo = d.lo + e
    hi2, e2 = _two_sum(s, lo)
    return DS(hi2, e2)


def ds_sub(d: DS, x) -> DS:
    return ds_add(d, -jnp.asarray(x, d.hi.dtype))


def ds_value(d: DS):
    """Single-float32 view (for device-side consumers: eta lookups)."""
    return d.hi + d.lo


def ds_value64(d: DS) -> np.ndarray:
    """Exact float64 view (host-side consumers: flatness, stitching,
    curve dumps, the deltaG integral)."""
    return np.asarray(d.hi, np.float64) + np.asarray(d.lo, np.float64)


def ds_where(cond, a: DS, b: DS) -> DS:
    return DS(jnp.where(cond, a.hi, b.hi), jnp.where(cond, a.lo, b.lo))


def ds_from64(x, dtype=jnp.float32) -> DS:
    """Split a float64 host array into an exact DS pair (hi = round to
    f32, lo = residual) - the checkpoint/restore and host-edit path."""
    x = np.asarray(x, np.float64)
    hi = x.astype(np.float32)
    lo = (x - hi.astype(np.float64)).astype(np.float32)
    return DS(jnp.asarray(hi, dtype), jnp.asarray(lo, dtype))
