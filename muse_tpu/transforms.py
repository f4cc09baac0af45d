"""θ-space bijectors (transformed ↔ untransformed hyper-parameter space).

The reference dispatches on ``Transformedθ()`` / ``UnTransformedθ()`` tags
(``src/interface.jl:8-11``) with ``transform_θ`` / ``inv_transform_θ``
defaulting to identity (``src/interface.jl:20,28``).  The Turing adapter
derives transforms from variable supports and *includes* the change-of-
variables volume factor in transformed-space densities
(``src/turing.jl:171-186``); the Soss adapter reparameterizes *without* the
volume factor.  Both conventions are supported here via the problem-level
``volume_factor`` flag; the bijectors themselves expose
``log_det_jacobian`` so either convention is computable.

Convention: ``forward`` maps the *constrained* (untransformed, model) space
to the *unconstrained* (transformed) space where the outer quasi-Newton
iteration runs.  ``log_det_jacobian(θ)`` is log|det ∂forward/∂θ| at a
constrained point, so a transformed-space density with volume factor is
``log p(θ) − log_det_jacobian(θ)``.

All maps are elementwise over the flat θ vector (θ is tiny; no Pallas
needed — XLA fuses these into surrounding ops).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Sequence

import jax
import jax.numpy as jnp

__all__ = [
    "Bijector", "Identity", "Log", "Softplus", "Logit", "Affine",
    "Blockwise", "from_support",
]


@dataclasses.dataclass(frozen=True)
class Bijector:
    """An elementwise bijector given by forward/inverse/logdet closures."""

    forward: Callable[[jnp.ndarray], jnp.ndarray]
    inverse: Callable[[jnp.ndarray], jnp.ndarray]
    # log|det d forward / dθ| evaluated at a constrained θ, summed over dims.
    log_det_jacobian: Callable[[jnp.ndarray], jnp.ndarray]
    name: str = "bijector"

    def __repr__(self):
        return f"Bijector({self.name})"


def Identity() -> Bijector:
    return Bijector(lambda x: x, lambda y: y,
                    lambda x: jnp.zeros(()), "identity")


def Log() -> Bijector:
    """θ ∈ (0,∞) → y = log θ.  d y/dθ = 1/θ."""
    return Bijector(jnp.log, jnp.exp,
                    lambda x: -jnp.sum(jnp.log(x)), "log")


def Softplus() -> Bijector:
    """θ ∈ (0,∞) → y = softplus⁻¹(θ) = log(exp(θ)−1)."""
    def fwd(x):
        return jnp.log(-jnp.expm1(-x)) + x

    def inv(y):
        return jax.nn.softplus(y)

    def ldj(x):
        # dy/dx = 1/(1 − exp(−x))
        return -jnp.sum(jnp.log(-jnp.expm1(-x)))

    return Bijector(fwd, inv, ldj, "softplus_inv")


def Logit(lo: float = 0.0, hi: float = 1.0) -> Bijector:
    """θ ∈ (lo,hi) → y = logit((θ−lo)/(hi−lo))."""
    width = hi - lo

    def fwd(x):
        u = (x - lo) / width
        return jnp.log(u) - jnp.log1p(-u)

    def inv(y):
        return lo + width * jax.nn.sigmoid(y)

    def ldj(x):
        u = (x - lo) / width
        return jnp.sum(-jnp.log(u) - jnp.log1p(-u) - jnp.log(width))

    return Bijector(fwd, inv, ldj, f"logit({lo},{hi})")


def Affine(scale: float, shift: float = 0.0) -> Bijector:
    def ldj(x):
        return jnp.sum(jnp.log(jnp.abs(scale)) * jnp.ones_like(x))
    return Bijector(lambda x: x * scale + shift,
                    lambda y: (y - shift) / scale, ldj, "affine")


@dataclasses.dataclass(frozen=True)
class Blockwise:
    """Applies per-block bijectors over contiguous slices of a flat θ.

    The analog of the Turing adapter linking each variable through its own
    support transform (``src/turing.jl:142-153``).  ``sizes[i]`` coordinates
    get ``bijectors[i]``.
    """

    bijectors: Sequence[Bijector]
    sizes: Sequence[int]
    name: str = "blockwise"

    def _split(self, x):
        out, i = [], 0
        for s in self.sizes:
            out.append(jax.lax.dynamic_slice_in_dim(x, i, s))
            i += s
        return out

    def forward(self, x):
        return jnp.concatenate(
            [jnp.atleast_1d(b.forward(p))
             for b, p in zip(self.bijectors, self._split(x))])

    def inverse(self, y):
        return jnp.concatenate(
            [jnp.atleast_1d(b.inverse(p))
             for b, p in zip(self.bijectors, self._split(y))])

    def log_det_jacobian(self, x):
        return sum(b.log_det_jacobian(p)
                   for b, p in zip(self.bijectors, self._split(x)))


_SUPPORT_REGISTRY = {
    "real": Identity,
    "positive": Log,
    "unit_interval": Logit,
}


def from_support(support: str, **kwargs) -> Bijector:
    """Look up the standard bijector for a distribution support tag."""
    if support not in _SUPPORT_REGISTRY:
        raise KeyError(f"no bijector registered for support {support!r}")
    return _SUPPORT_REGISTRY[support](**kwargs)
