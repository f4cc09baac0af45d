"""Batched conjugate gradients — masked lockstep over lanes.

Role in the framework (mirrors IterativeSolvers.cg in the reference):
  * implicit-diff get_H applies A⁻¹ to jacobian columns
    (src/muse.jl:380-384) — there via jax.scipy CG per column; this batched
    variant solves many lanes at once for problem-level custom solvers;
  * linear-Gaussian latent conditionals (GRF models) use CG as the MAP
    solver (``custom_zhat``), replacing L-BFGS entirely: for quadratic
    log-likelihoods CG is the optimal Krylov method and needs no line
    search or history buffers — a large memory and wall-clock win at
    1024² latent sizes.

Same lockstep/masking discipline as ops/lbfgs.py: one ``lax.while_loop``
advances all lanes; converged lanes freeze.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["BatchedCgResult", "batched_cg"]


class BatchedCgResult(NamedTuple):
    x: jnp.ndarray            # (B, N) solutions
    r_norm: jnp.ndarray       # (B,)  final residual norms
    converged: jnp.ndarray    # (B,)  bool
    iterations: jnp.ndarray   # (B,)  int32


@partial(jax.jit, static_argnames=("matvec", "precond", "maxiter"))
def batched_cg(
    matvec: Callable[[jnp.ndarray], jnp.ndarray],
    b: jnp.ndarray = None,
    x0: jnp.ndarray = None,
    *,
    tol=1e-6,
    maxiter: int = 500,
    precond: Callable[[jnp.ndarray], jnp.ndarray] = None,
    r0: jnp.ndarray = None,
    z0: jnp.ndarray = None,
    b_norm: jnp.ndarray = None,
) -> BatchedCgResult:
    """Solve SPD systems ``A x = b`` for a batch of lanes in lockstep.

    Args:
      matvec: batched SPD operator, ``(B, N) -> (B, N)``.
      b: ``(B, N)`` right-hand sides.  May be omitted when the caller
        supplies the precomputed initial state instead (below).
      x0: optional warm starts.
      tol: relative residual tolerance ‖r‖/‖b‖ (scalar or ``(B,)``).
      precond: optional SPD preconditioner M⁻¹ (the ``Pl`` analog of the
        reference's IterativeSolvers CG kwargs, src/muse.jl:312).  A good
        M⁻¹ ≈ A⁻¹ collapses the iteration count — e.g. the GRF models use
        their exact Fourier-diagonal inverse and converge in ~1 step.
      r0 / z0 / b_norm: optional precomputed initial residual ``b − A x0``,
        preconditioned residual ``M⁻¹r0``, and ‖b‖ per lane.  Models whose
        operator is structured (e.g. Fourier-diagonal) can build all three
        far cheaper than the generic ``b − matvec(x0)`` + ``Minv`` path —
        the GRF solver fuses them into one spectral round-trip.  When
        ``r0`` is given, ``b`` is unused and ``b_norm`` is required.
    """
    if r0 is None:
        assert b is not None, "batched_cg: need b (or precomputed r0)"
        r0 = b - matvec(jnp.zeros_like(b) if x0 is None else x0)
    if b_norm is None:
        assert b is not None, "batched_cg: need b_norm when r0 is given"
        b_norm = jnp.linalg.norm(b, axis=-1)
    B, N = r0.shape
    x0 = jnp.zeros_like(r0) if x0 is None else x0
    tol = jnp.broadcast_to(jnp.asarray(tol, r0.dtype), (B,))
    Minv = (lambda v: v) if precond is None else precond
    if z0 is None:
        z0 = Minv(r0)
    thresh = tol * jnp.maximum(b_norm, 1e-30)

    def norm(v):
        return jnp.linalg.norm(v, axis=-1)

    init = (x0, r0, z0, jnp.sum(r0 * z0, -1),
            norm(r0) < thresh, jnp.zeros((B,), jnp.int32),
            jnp.zeros((), jnp.int32))

    def cond(state):
        _, _, _, _, done, _, k = state
        return (k < maxiter) & ~jnp.all(done)

    def body(state):
        x, r, p, rz, done, iters, k = state
        Ap = matvec(p)
        pAp = jnp.sum(p * Ap, -1)
        alpha = rz / jnp.where(pAp > 0, pAp, 1.0)
        alpha = jnp.where(done | (pAp <= 0), 0.0, alpha)
        x1 = x + alpha[:, None] * p
        r1 = r - alpha[:, None] * Ap
        z1 = Minv(r1)
        rz1 = jnp.sum(r1 * z1, -1)
        beta = jnp.where(done, 0.0, rz1 / jnp.where(rz == 0, 1.0, rz))
        p1 = jnp.where(done[:, None], p, z1 + beta[:, None] * p)
        done1 = done | (norm(r1) < thresh) | ~jnp.isfinite(rz1)
        return (x1, r1, p1, rz1, done1,
                iters + (~done).astype(jnp.int32), k + 1)

    x, r, _, _, done, iters, _ = lax.while_loop(cond, body, init)
    return BatchedCgResult(x=x, r_norm=norm(r), converged=done,
                           iterations=iters)
