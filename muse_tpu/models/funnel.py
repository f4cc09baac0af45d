"""Noisy-funnel model family — the reference's canonical test problem.

θ ~ N(0, 3²),  z ~ N(0, e^θ I_D),  x ~ N(z, I_D)   (test/runtests.jl:14-18,
docstring example src/simple.jl:56-77).  Scalar-θ and vector-θ variants;
the latter gives each of K blocks its own log-variance θ_k (the vector-θ
benchmark config in BASELINE.md).

These models have closed forms used by the tests as a *stronger* oracle
than the reference's z-score bound:
  ẑ(x, θ) = x·a/(1+a) with a = e^θ            (Wiener filter)
  s(θ₀; x) = ½(|ẑ|²/a₀ − D_block)             (per-block MAP score)
  H(θ₀)    = ½ D e^θ₀ a₀/(1+a₀)²·diag          (d E[s]/dθ_sim)
  J(θ₀)    = Var[s] — analytic at θ_sim=θ₀:
             per-block  ½ D a₀² (2+a₀(2+a₀)) / (1+a₀)⁴ … computed
             numerically in tests instead.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..adapters.simple import SimpleMuseProblem

__all__ = ["funnel_problem", "vector_funnel_problem", "funnel_analytic_H"]


def funnel_problem(dim: int = 512, *, x_obs=None, theta_true: float = 0.0,
                   data_key=None, prior_std: float = 3.0) -> SimpleMuseProblem:
    """Scalar-θ noisy funnel (reference src/simple.jl:56-77)."""

    # CRN white split (problem.py): only the exp(θ/2) scale re-runs per
    # muse iteration; the normals are hoisted out of the loop
    def sample_white(key):
        k1, k2 = jax.random.split(key)
        return (jax.random.normal(k1, (dim,)),
                jax.random.normal(k2, (dim,)))

    def x_of_white(W, theta):
        w1, w2 = W
        z = jnp.exp(theta / 2) * w1
        return z + w2, z

    def sample_x_z(key, theta):
        return x_of_white(sample_white(key), theta)

    def log_like(x, z, theta):
        return -0.5 * (jnp.sum((x - z) ** 2)
                       + jnp.sum(z ** 2) / jnp.exp(theta) + dim * theta)

    def log_prior(theta):
        return -theta ** 2 / (2 * prior_std ** 2)

    if x_obs is None:
        data_key = jax.random.PRNGKey(42) if data_key is None else data_key
        x_obs, _ = sample_x_z(data_key, theta_true)

    return SimpleMuseProblem(x_obs, sample_x_z, log_like, log_prior,
                             sample_white=sample_white,
                             x_of_white=x_of_white)


def vector_funnel_problem(dim: int = 256, blocks: int = 4, *, x_obs=None,
                          theta_true=None, data_key=None,
                          prior_std: float = 3.0) -> SimpleMuseProblem:
    """Vector-θ funnel: K blocks of size dim//K, each with its own θ_k.

    The BASELINE.md config-2 analog ("vector-θ funnel: full muse + get_J +
    get_H pipeline, σθ from the J/H covariance")."""
    assert dim % blocks == 0
    bs = dim // blocks

    def block_scales(theta):
        return jnp.repeat(jnp.exp(theta / 2), bs)

    def sample_white(key):
        k1, k2 = jax.random.split(key)
        return (jax.random.normal(k1, (dim,)),
                jax.random.normal(k2, (dim,)))

    def x_of_white(W, theta):
        w1, w2 = W
        z = block_scales(theta) * w1
        return z + w2, z

    def sample_x_z(key, theta):
        return x_of_white(sample_white(key), theta)

    def log_like(x, z, theta):
        inv_var = jnp.repeat(jnp.exp(-theta), bs)
        return -0.5 * (jnp.sum((x - z) ** 2)
                       + jnp.sum(z ** 2 * inv_var)
                       + bs * jnp.sum(theta))

    def log_prior(theta):
        return -jnp.sum(theta ** 2) / (2 * prior_std ** 2)

    if theta_true is None:
        theta_true = jnp.zeros((blocks,))
    if x_obs is None:
        data_key = jax.random.PRNGKey(42) if data_key is None else data_key
        x_obs, _ = sample_x_z(data_key, jnp.asarray(theta_true))

    return SimpleMuseProblem(x_obs, sample_x_z, log_like, log_prior,
                             sample_white=sample_white,
                             x_of_white=x_of_white)


def funnel_analytic_H(theta0: float, dim: int) -> float:
    """d E_θ[s(θ₀)]/dθ at θ=θ₀ for the scalar funnel (see module doc)."""
    a = np.exp(theta0)
    return 0.5 * dim * a * a / (1 + a) ** 2
