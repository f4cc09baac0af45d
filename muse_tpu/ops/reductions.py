"""Numerically-stable reductions for large-field score sums.

The MUSE score is a difference of O(N)-term log-likelihood gradients whose
*mean* dwarfs their *fluctuations* (the statistically meaningful part).
At N = 10⁶ terms in float32, plain tree-summation rounding scatter can
exceed the true per-sim score scatter and silently inflate J — measured
on the 1024² GRF at σ_noise = 0.01: per-sim f32 score error std ≈ 160 vs
true scatter std ≈ 73, inflating var(g) ~4×.

``stable_sum`` is a two-pass centered summation: a first pass estimates
the mean, the second accumulates the (small) deviations, and the total is
reassembled as N·mean + Σdev.  The deviation accumulator stays near the
fluctuation scale, so rounding error drops by ~|mean|/std — orders of
magnitude here — at the cost of one extra pass over the data (cheap and
fully fused by XLA; no f64, so it runs at full TPU rate).

Use it for any O(N)-term reduction that feeds the score: analytic
``grad_theta_log_like`` implementations and hand-written ``log_like``
sums on large fields.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["stable_sum", "stable_dot"]


def stable_sum(x: jnp.ndarray, axis=None) -> jnp.ndarray:
    """Two-pass centered summation (see module docstring)."""
    n = x.size if axis is None else x.shape[axis]
    m = jnp.mean(x, axis=axis, keepdims=axis is not None)
    dev = jnp.sum(x - m, axis=axis)
    return n * jnp.squeeze(m, axis=axis if axis is not None else None) + dev \
        if axis is not None else n * m + dev


def stable_dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Σ aᵢbᵢ with two-pass centered accumulation over all elements."""
    return stable_sum(a * b)
