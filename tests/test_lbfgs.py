"""Unit tests for the batched L-BFGS kernel (muse_tpu/ops/lbfgs.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from muse_tpu.ops.lbfgs import batched_lbfgs


def test_batched_quadratic_converges():
    B, N = 8, 64
    c = jax.random.normal(jax.random.PRNGKey(0), (B, N))
    diag = jnp.linspace(0.5, 20.0, N)

    def fn(z):
        d = z - c
        return 0.5 * jnp.sum(diag * d * d, -1), diag * d

    res = batched_lbfgs(fn, jnp.zeros((B, N)), g_atol=1e-5)
    assert bool(res.converged.all())
    assert not bool(res.failed.any())
    np.testing.assert_allclose(np.asarray(res.z), np.asarray(c), atol=1e-4)


def test_rosenbrock():
    def fn(z):
        x, y = z[:, 0], z[:, 1]
        f = (1 - x) ** 2 + 100 * (y - x ** 2) ** 2
        g = jnp.stack([-2 * (1 - x) - 400 * x * (y - x ** 2),
                       200 * (y - x ** 2)], -1)
        return f, g

    z0 = jnp.array([[-1.2, 1.0], [0.0, 0.0], [2.0, 2.0], [-2.0, -1.0]])
    res = batched_lbfgs(fn, z0, g_atol=1e-6, max_iters=2000)
    assert bool(res.converged.all())
    np.testing.assert_allclose(np.asarray(res.z),
                               np.ones((4, 2)), atol=1e-4)


def test_per_lane_convergence_masks():
    """Lanes converging at different rates must all end converged, and
    easy lanes must not be perturbed by hard lanes continuing."""
    B, N = 4, 16
    # per-lane conditioning ranging from trivial to stiff
    scales = jnp.array([1.0, 10.0, 100.0, 1000.0])[:, None]
    diag = jnp.linspace(1.0, 5.0, N)[None, :] * scales
    c = jnp.ones((B, N))

    def fn(z):
        d = z - c
        return 0.5 * jnp.sum(diag * d * d, -1), diag * d

    res = batched_lbfgs(fn, jnp.zeros((B, N)), g_atol=1e-6, max_iters=1000)
    assert bool(res.converged.all())
    assert bool((res.iterations[0] <= res.iterations[-1]))
    np.testing.assert_allclose(np.asarray(res.z), np.ones((B, N)), atol=1e-5)


def test_nan_lane_frozen_not_propagated():
    """A lane whose objective is NaN is flagged failed; others solve."""
    B, N = 3, 8
    c = jnp.ones((B, N))
    poison = jnp.array([0.0, jnp.nan, 0.0])  # lane 1 always NaN

    def fn(z):
        d = z - c
        return 0.5 * jnp.sum(d * d, -1) + poison, d

    res = batched_lbfgs(fn, jnp.zeros((B, N)), g_atol=1e-6)
    assert bool(res.failed[1])
    assert bool(res.converged[0]) and bool(res.converged[2])
    np.testing.assert_allclose(np.asarray(res.z[0]), np.ones(N), atol=1e-5)


def test_warm_start_is_fast():
    B, N = 4, 32
    c = jax.random.normal(jax.random.PRNGKey(1), (B, N))

    def fn(z):
        d = z - c
        return 0.5 * jnp.sum(d * d, -1), d

    cold = batched_lbfgs(fn, jnp.zeros((B, N)), g_atol=1e-6)
    warm = batched_lbfgs(fn, cold.z, g_atol=1e-6)
    assert int(warm.iterations.max()) == 0


def test_gradient_tolerance_semantics():
    """Convergence is sup-norm of gradient < g_atol (Optim g_tol parity)."""
    B, N = 2, 8
    c = jnp.ones((B, N))

    def fn(z):
        d = z - c
        return 0.5 * jnp.sum(d * d, -1), d

    res = batched_lbfgs(fn, jnp.zeros((B, N)), g_atol=1e-3)
    assert bool((res.g_norm < 1e-3).all())
