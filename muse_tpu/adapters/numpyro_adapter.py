"""numpyro adapter — the second external-PPL frontend (Soss-adapter slot).

The reference lazily gates its Turing/Soss adapters on package presence
(``Requires.@require`` blocks, src/MuseInference.jl:38-57); this module is
the same pattern for numpyro: importable always, usable when numpyro is
installed.  The environment this framework is developed in has no numpyro,
so the adapter is exercised only by its import-gating test; the in-repo
handler PPL (muse_tpu.ppl) is the primary model frontend.

Mapping (mirrors TuringMuseProblem, src/turing.jl:112-169):
  site discovery        → numpyro.handlers.trace over a seeded model
  observed/hyper/latent → obs sites / ``params`` / remaining sample sites
  log_like              → numpyro.infer.util.log_density with latents
                          linked through their biject_to transforms
  sample_x_z            → seeded trace with θ substituted
  θ transforms          → dist.biject_to(support) blockwise
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

try:
    import numpyro
    import numpyro.distributions as npdist
    from numpyro import handlers as nph

    HAVE_NUMPYRO = True
except ImportError:  # pragma: no cover - environment has no numpyro
    numpyro = None
    HAVE_NUMPYRO = False

import jax
import jax.numpy as jnp

from ..problem import MuseProblem

__all__ = ["NumpyroMuseProblem", "HAVE_NUMPYRO"]


class NumpyroMuseProblem(MuseProblem):
    """Adapt a numpyro model to the MUSE interface (requires numpyro)."""

    volume_factor = True

    def __init__(self, model, *, observed: Dict[str, Any],
                 params: Sequence[str] = ("theta",), model_args: tuple = (),
                 model_kwargs: dict | None = None):
        if not HAVE_NUMPYRO:
            raise ImportError(
                "numpyro is not installed; use muse_tpu.ppl.PPLMuseProblem "
                "(the built-in PPL) or install numpyro.")
        self.model = model
        self.model_args = tuple(model_args)
        self.model_kwargs = dict(model_kwargs or {})
        self.observed = {k: jnp.asarray(v) for k, v in observed.items()}
        self.params = tuple(params)

        tr = nph.trace(nph.seed(model, jax.random.PRNGKey(0))).get_trace(
            *self.model_args, **self.model_kwargs)
        sites = {n: s for n, s in tr.items() if s["type"] == "sample"}
        self.site_order = list(sites)
        self.latent_vars = tuple(n for n in self.site_order
                                 if n not in self.observed
                                 and n not in self.params)
        self._transforms = {
            n: npdist.biject_to(sites[n]["fn"].support)
            for n in self.site_order}
        # NOTE: θ blockwise bijector + log_like via numpyro's log_density
        # follow the same construction as muse_tpu.ppl.PPLMuseProblem; see
        # that class for the reference-parity semantics.
        raise NotImplementedError(
            "NumpyroMuseProblem is scaffolded but untested in this "
            "environment (numpyro unavailable); use "
            "muse_tpu.ppl.PPLMuseProblem.")
