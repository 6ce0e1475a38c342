"""Two-float ("double-float") compensated accumulation.

The reference computes log-likelihoods in f64 (the whole program is C
doubles) and stops EM when successive logL values differ by less than
``abs_error = 1e-4`` (em_alg.c:163-182).  On TPU the fast path is f32, whose
ulp at |logL| ~ 1e6 is ~0.06 - far above the tolerance.  Rather than fall
back to (TPU-emulated, pathologically slow) f64, outer reductions accumulate
in an unevaluated sum of two f32 values, the classic Dekker/Knuth double-float
representation, giving ~2^-48 relative precision for the accumulated value.

Elementwise terms are still rounded to f32, so the overall logL carries an
irreducible noise floor ~eps32 * sum|terms|; convergence checks account for
that separately (opt/em.py).  On CPU with x64 enabled these utilities operate
on f64 pairs and the floor is ~2^-105, i.e. exact reference semantics.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

Array = jnp.ndarray
DF = Tuple[Array, Array]  # (hi, lo), value = hi + lo


def two_sum(a: Array, b: Array) -> DF:
    """Error-free transformation: a + b = s + err exactly (Knuth)."""
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def quick_two_sum(a: Array, b: Array) -> DF:
    """Error-free a + b assuming |a| >= |b| (Dekker)."""
    s = a + b
    err = b - (s - a)
    return s, err


def df_add(x: DF, y: DF) -> DF:
    """Add two double-float numbers."""
    s, e = two_sum(x[0], y[0])
    e = e + x[1] + y[1]
    return quick_two_sum(s, e)


def df_neg(x: DF) -> DF:
    return -x[0], -x[1]


def df_sub(x: DF, y: DF) -> DF:
    return df_add(x, df_neg(y))


def df_from(x: Array) -> DF:
    return x, jnp.zeros_like(x)


def df_value(x: DF) -> Array:
    return x[0] + x[1]


def df_sum(x: Array) -> DF:
    """Compensated sum of all elements of ``x`` via a pairwise df64 tree.

    Fully vectorized: log2(n) rounds of halving df_add.  Each round is an
    elementwise VPU op over the surviving half, so total work is ~2n flops
    with no sequential scan.
    """
    x = x.reshape(-1)
    hi, lo = x, jnp.zeros_like(x)
    n = hi.shape[0]
    while n > 1:
        half = (n + 1) // 2
        pad = half * 2 - n
        if pad:
            hi = jnp.concatenate([hi, jnp.zeros((pad,), hi.dtype)])
            lo = jnp.concatenate([lo, jnp.zeros((pad,), lo.dtype)])
        hi, lo = df_add((hi[:half], lo[:half]), (hi[half:], lo[half:]))
        n = half
    return hi[0], lo[0]


def df_sum_rows(x: Array) -> DF:
    """Compensated sum along the last axis; returns df64 per row."""
    hi, lo = x, jnp.zeros_like(x)
    n = hi.shape[-1]
    while n > 1:
        half = (n + 1) // 2
        pad = half * 2 - n
        if pad:
            zshape = hi.shape[:-1] + (pad,)
            hi = jnp.concatenate([hi, jnp.zeros(zshape, hi.dtype)], axis=-1)
            lo = jnp.concatenate([lo, jnp.zeros(zshape, lo.dtype)], axis=-1)
        hi, lo = df_add((hi[..., :half], lo[..., :half]),
                        (hi[..., half:], lo[..., half:]))
        n = half
    return hi[..., 0], lo[..., 0]
