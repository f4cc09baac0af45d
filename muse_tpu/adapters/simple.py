"""SimpleMuseProblem — define a MUSE problem from raw closures.

Port of the reference's ``SimpleMuseProblem`` (``src/simple.jl:79-95``): the
user supplies ``x``, ``sample_x_z(key, θ)``, ``log_like(x, z, θ)`` and an
optional ``log_prior(θ)``; θ-gradients and (value, ∇z) pairs are derived
automatically — here by ``jax.grad`` / ``jax.value_and_grad`` instead of an
AD-backend registry (there is exactly one AD in JAX, so the reference's
``autodiff`` kwarg has no analog).

Example (the reference docstring's 512-dim noisy funnel,
src/simple.jl:56-77)::

    import jax, jax.numpy as jnp
    from muse_tpu import SimpleMuseProblem, muse

    def sample_x_z(key, theta):
        k1, k2 = jax.random.split(key)
        z = jnp.exp(theta / 2) * jax.random.normal(k1, (512,))
        x = z + jax.random.normal(k2, (512,))
        return x, z

    def log_like(x, z, theta):
        return -0.5 * (jnp.sum((x - z) ** 2)
                       + jnp.sum(z ** 2) / jnp.exp(theta) + 512 * theta)

    prob = SimpleMuseProblem(
        x_obs, sample_x_z, log_like,
        log_prior=lambda th: -th ** 2 / (2 * 3 ** 2))
    result = muse(prob, 1.0)
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax.numpy as jnp

from ..problem import MuseProblem

__all__ = ["SimpleMuseProblem"]


class SimpleMuseProblem(MuseProblem):

    def __init__(self,
                 x: Any,
                 sample_x_z: Callable,
                 log_like: Callable,
                 log_prior: Optional[Callable] = None,
                 theta_bijector=None,
                 volume_factor: bool = True,
                 zhat_guess_from_truth: Optional[Callable] = None,
                 custom_zhat=None,
                 grad_theta_log_like: Optional[Callable] = None,
                 sample_white: Optional[Callable] = None,
                 x_of_white: Optional[Callable] = None):
        self.x = x
        self._sample_x_z = sample_x_z
        self._log_like = log_like
        self._log_prior = log_prior
        self.theta_bijector = theta_bijector
        self.volume_factor = volume_factor
        self._zhat_guess = zhat_guess_from_truth
        self.custom_zhat = custom_zhat
        # optional analytic ∂θ log_like (∇θ_logLike override analog,
        # src/interface.jl:56-58); None ⇒ derived via jax.grad
        self.grad_theta_log_like = grad_theta_log_like
        # optional CRN white-noise split of the sampler (problem.py:
        # sample_x_z(key, θ) ≡ x_of_white(sample_white(key), θ)) — lets
        # the muse loop hoist the RNG out of the outer iteration
        self.sample_white = sample_white
        self.x_of_white = x_of_white

    def sample_x_z(self, key, theta):
        return self._sample_x_z(key, theta)

    def log_like(self, x, z, theta):
        return self._log_like(x, z, theta)

    def log_prior(self, theta):
        if self._log_prior is None:
            return jnp.zeros(())
        return self._log_prior(theta)

    def zhat_guess_from_truth(self, x, z, theta):
        if self._zhat_guess is None:
            return super().zhat_guess_from_truth(x, z, theta)
        return self._zhat_guess(x, z, theta)
