"""Covariance assembly — ``finalize_result!`` (reference src/muse.jl:535-549).

Σ⁻¹ = Hᵀ J⁻¹ H + H_prior, with H_prior = −∇²logPriorθ at θ̂ in the
untransformed space; Σ = inv(Σ⁻¹); plus the convenience Gaussian ``dist``
(Normal for scalar θ, MvNormal otherwise).  All of it is tiny dense θ-space
linalg, done host-side in float64.
"""

from __future__ import annotations

import numpy as np

from ..distributions import MvNormal, Normal
from ..result import MuseResult

__all__ = ["finalize_result"]


def finalize_result(result: MuseResult, comp) -> MuseResult:
    import jax.numpy as jnp

    if result.H is None or result.J is None or result.theta is None:
        return result

    H = np.atleast_2d(np.asarray(result.H, np.float64))
    J = np.atleast_2d(np.asarray(result.J, np.float64))
    th = np.atleast_1d(np.asarray(result.theta, np.float64))

    H_prior = -np.atleast_2d(np.asarray(
        comp.prior_hess_u(jnp.asarray(th, comp.dtype)), np.float64))

    # Sanity: for a well-specified model at θ̂, J ≈ H ≈ Fisher.  A large
    # mismatch usually means per-sim MAP-solution error is leaking into
    # the score variance (tighten grad_z_atol) or the model is badly
    # misspecified.  (Diagnosed on the 1024² GRF: loose CG tolerance
    # inflated J 40× over H and silently shrank the Newton steps.)
    ratio = np.diag(J) / np.maximum(np.abs(np.diag(H)), 1e-30)
    if (ratio > 25.0).any() or (ratio < 0.04).any():
        import warnings
        warnings.warn(
            f"J/H diagonal ratio is {ratio} — expected O(1) at θ̂. "
            "Suspect MAP solutions too loose (tighten grad_z_atol), "
            "model misspecification, or a weak-information regime "
            "(the data barely constrain this θ component: J ≫ H is then "
            "genuine and σθ is honestly conservative — measured 3-4× "
            "over-coverage on the 256² lensing flagship, see "
            "MuseResult.sigma and BENCHMARKS.md); σθ may be unreliable.")

    result.Sigma_inv = H.T @ np.linalg.inv(J) @ H + H_prior
    result.Sigma = np.linalg.inv(result.Sigma_inv)

    if th.size == 1:
        result.dist = Normal(float(th[0]), float(np.sqrt(result.Sigma[0, 0])))
    else:
        result.dist = MvNormal(th, 0.5 * (result.Sigma + result.Sigma.T))
    return result
