"""Common-random-number PRNG key discipline.

The reference's ``split_rng`` derives N child RNGs *without advancing the
parent* (``src/util.jl:87-92``) and is re-called with the same rng every
outer iteration (``src/muse.jl:169``) — so each simulation re-uses the same
seed at every θ.  That makes the Monte-Carlo score s(θ) deterministic in θ,
which is what lets a quasi-Newton root-finder converge (SURVEY §3.1).

The JAX equivalent is trivially functional: ``jax.random.split`` of a fixed
master key produces a fixed ``(nsims,)`` key array, created once and stored
in the result for reproducible resume (``result.rng``, ``src/muse.jl:134``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["as_key", "sim_keys"]


def as_key(seed_or_key):
    """Accept an int seed or a PRNG key; return a PRNG key."""
    if isinstance(seed_or_key, int):
        return jax.random.PRNGKey(seed_or_key)
    arr = jnp.asarray(seed_or_key)
    if jnp.issubdtype(arr.dtype, jnp.integer) and arr.ndim == 0:
        return jax.random.PRNGKey(int(arr))
    return seed_or_key


def sim_keys(key, nsims: int, salt: int = 0):
    """Deterministic per-sim key array; does not consume ``key``.

    Calling with the same ``key`` always yields the same keys (common random
    numbers), and a larger ``nsims`` yields a superset-prefix of the smaller
    call — which is what makes ``get_J!``-style incremental resume
    (``src/muse.jl:499-506``) reproduce the original sims exactly.
    """
    k = jax.random.fold_in(as_key(key), salt)
    return jax.vmap(lambda i: jax.random.fold_in(k, i))(jnp.arange(nsims))
