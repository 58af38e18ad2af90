"""Two-float ("double-single") compensated arithmetic.

The reference accumulates node masses/centers with fp32 atomicAdd
(nbody_v5.cu:191-194) — nondeterministic and as lossy as naive summation.
Here node sums come from *prefix sums* over the Morton-sorted particle
arrays, and a naive fp32 cumsum over 10^6 bodies would lose ~5 digits in
the small-node differences.  Each prefix is therefore carried as an
unevaluated (hi, lo) float32 pair (Knuth TwoSum / Dekker renormalization),
giving ~2^-45 relative accuracy on fp32 hardware — effectively fp64
prefix sums without enabling jax x64.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def two_sum(a: jax.Array, b: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Knuth TwoSum: s + e == a + b exactly, |e| <= ulp(s)/2."""
    s = a + b
    v = s - a
    e = (a - (s - v)) + (b - v)
    return s, e


def fast_two_sum(a: jax.Array, b: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Dekker FastTwoSum — requires |a| >= |b| (true after renorm)."""
    s = a + b
    e = b - (s - a)
    return s, e


def df_add(x: Tuple[jax.Array, jax.Array], y: Tuple[jax.Array, jax.Array]):
    """Add two (hi, lo) pairs, renormalized."""
    xh, xl = x
    yh, yl = y
    s, e = two_sum(xh, yh)
    lo = xl + yl + e
    return fast_two_sum(s, lo)


def df_neg(x):
    return (-x[0], -x[1])


def df_to_f32(x) -> jax.Array:
    return x[0] + x[1]


def compensated_cumsum(x: jax.Array, axis: int = 0):
    """Inclusive cumsum of `x` along `axis` in two-float precision.

    Returns (hi, lo) arrays of x.shape.  Uses lax.associative_scan with the
    df_add combiner — O(log N) depth, deterministic.
    """

    def combine(a, b):
        return df_add(a, b)

    hi, lo = jax.lax.associative_scan(
        combine, (x, jnp.zeros_like(x)), axis=axis
    )
    return hi, lo


def prefix_sums(x: jax.Array):
    """Exclusive-style prefix table: P[k] = sum(x[:k]), k in [0, N].

    Returns (hi, lo) arrays of length N+1 so that the sum over the
    inclusive range [f, l] is P[l+1] - P[f].
    """
    hi, lo = compensated_cumsum(x)
    z = jnp.zeros((1,) + x.shape[1:], x.dtype)
    return jnp.concatenate([z, hi]), jnp.concatenate([z, lo])


def range_sum(p_hi: jax.Array, p_lo: jax.Array, first: jax.Array, last: jax.Array) -> jax.Array:
    """Sum over inclusive index range [first, last] from a prefix table,
    evaluated in two-float and collapsed to float32."""
    a = (p_hi[last + 1], p_lo[last + 1])
    b = (p_hi[first], p_lo[first])
    return df_to_f32(df_add(a, df_neg(b)))
