"""numpyro adapter — the second external-PPL frontend (Soss-adapter slot).

The reference lazily gates its Turing/Soss adapters on package presence
(``Requires.@require`` blocks, src/MuseInference.jl:38-57); this module is
the same pattern for numpyro: importable always, usable when numpyro is
installed.  The environment this framework is developed in has **no
numpyro**, so this adapter is complete but exercised only by its
import-gating test there; the in-repo handler PPL (muse_tpu.ppl) is the
primary, fully-tested model frontend with identical semantics.

Mapping (mirrors TuringMuseProblem, src/turing.jl:112-169):
  site discovery        → numpyro.handlers.trace over a seeded model
  observed/hyper/latent → ``observed`` keys / ``params`` / remaining sites
  sample_x_z            → seeded trace with θ substituted; latents linked
                          to unconstrained space via biject_to transforms
  log_like              → Σ site log-probs with latent volume factors
                          (linked logjoint, src/turing.jl:192-196)
  log_prior             → θ sites' densities alone (src/turing.jl:198-202)
  θ transforms          → blockwise biject_to over the flat θ vector
  numpyro.factor sites  → Unit-fn sample sites: excluded from the
                          latent/hyper/observed split, included in the
                          log-joint; pure-θ factors also enter log_prior
                          (Turing's @addlogprob! flows into logjoint the
                          same way, src/turing.jl:192-196)
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

try:
    import numpyro
    import numpyro.distributions as npdist
    from numpyro import handlers as nph

    HAVE_NUMPYRO = True
except ImportError:  # pragma: no cover - environment has no numpyro
    numpyro = npdist = nph = None
    HAVE_NUMPYRO = False

import jax
import jax.numpy as jnp
import numpy as np

from ..problem import MuseProblem

__all__ = ["NumpyroMuseProblem", "HAVE_NUMPYRO"]


class NumpyroMuseProblem(MuseProblem):
    """Adapt a numpyro model to the MUSE interface (requires numpyro)."""

    volume_factor = True

    def __init__(self, model, *, observed: Dict[str, Any],
                 params: Sequence[str] = ("theta",), model_args: tuple = (),
                 model_kwargs: dict = None):
        if not HAVE_NUMPYRO:
            raise ImportError(
                "numpyro is not installed; use muse_tpu.ppl.PPLMuseProblem "
                "(the built-in PPL) or install numpyro.")
        self.model = model
        self.model_args = tuple(model_args)
        self.model_kwargs = dict(model_kwargs or {})
        self.observed = {k: jnp.asarray(v) for k, v in observed.items()}

        tr = nph.trace(nph.seed(model, jax.random.PRNGKey(0))).get_trace(
            *self.model_args, **self.model_kwargs)
        sites = {n: s for n, s in tr.items() if s["type"] == "sample"}
        self.site_order = list(sites)
        # numpyro.factor sites: sample sites whose fn is dist.Unit — an
        # arbitrary log-density term (Turing's @addlogprob! analog).
        # They stay in site_order (log_like sums fn.log_prob, which for
        # Unit IS the recomputed log_factor) but are excluded from
        # latent/hyper/observed classification: they carry density, not
        # randomness.
        _unit = getattr(npdist, "Unit", None)
        self.factor_sites = tuple(
            n for n, s in sites.items()
            if _unit is not None and isinstance(s["fn"], _unit))
        if params is None:
            # graph-root default (src/soss.jl:91-94 analog; see
            # muse_tpu.ppl._infer_root_sites): re-trace with every
            # site's value perturbed; unchanged dists have no random
            # parents and are the hypers
            from ..ppl import _infer_root_sites
            cand = [n for n in self.site_order
                    if n not in self.factor_sites]
            base = {n: jnp.asarray(sites[n]["value"]) for n in cand}
            pert = {n: base[n] * 1.173 + 0.31891 for n in cand}
            tr2 = nph.trace(nph.seed(
                nph.substitute(model, data=pert),
                jax.random.PRNGKey(0))).get_trace(
                    *self.model_args, **self.model_kwargs)
            params = _infer_root_sites(
                cand, self.observed,
                {n: sites[n]["fn"] for n in cand},
                {n: tr2[n]["fn"] for n in cand}, base)
        self.params = tuple(params)
        missing = [p for p in self.params if p not in self.site_order]
        if missing:
            raise ValueError(f"params {missing} are not sites of the model")
        bad_obs = [o for o in self.observed if o not in self.site_order]
        if bad_obs:
            raise ValueError(f"observed {bad_obs} are not model sites")
        # Broadcast observed values to each site's full traced shape
        # (numpyro obs-broadcast semantics; same rationale as
        # ppl.PPLMuseProblem — keeps the data lane shape-identical to sim
        # lanes in the lockstep solver and rejects extra leading dims
        # that would silently multiply density terms).
        for k in self.observed:
            full = tuple(jnp.shape(sites[k]["value"]))
            try:
                self.observed[k] = jnp.broadcast_to(self.observed[k], full)
            except ValueError:
                raise ValueError(
                    f"observed[{k!r}] has shape "
                    f"{tuple(jnp.shape(self.observed[k]))}, which does not "
                    f"broadcast to site {k!r}'s shape {full} (its plate/"
                    "batch + event shape). MUSE compares the data against "
                    "same-shaped simulations, so extra leading dims are "
                    "not meaningful here — reshape the data or add a "
                    "plate to the model.") from None
        clash = set(self.factor_sites) & (set(self.params)
                                          | set(self.observed))
        if clash:
            raise ValueError(f"{sorted(clash)} are numpyro.factor sites "
                             "— they cannot be observed or hyper "
                             "parameters")
        self.latent_vars = tuple(n for n in self.site_order
                                 if n not in self.observed
                                 and n not in self.params
                                 and n not in self.factor_sites)
        if not self.latent_vars:
            raise ValueError("model has no latent sites")

        # Pure-θ factors additionally enter log_prior (see
        # ppl.PPLMuseProblem: in the likelihood score a θ-only term
        # cancels between data and sims; the prior is where it tilts the
        # posterior).  Probe: re-trace with every non-θ site perturbed
        # and θ pinned — an unmoved log_factor has no (z, x) parents.
        self._prior_factors: tuple = ()
        if self.factor_sites:
            probe = {n: (jnp.asarray(sites[n]["value"])
                         if n in self.params
                         else jnp.asarray(sites[n]["value"]) * 1.173
                         + 0.31891)
                     for n in self.site_order
                     if n not in self.factor_sites}
            tr3 = nph.trace(nph.seed(
                nph.substitute(model, data=probe),
                jax.random.PRNGKey(0))).get_trace(
                    *self.model_args, **self.model_kwargs)
            self._prior_factors = tuple(
                n for n in self.factor_sites
                if np.array_equal(
                    np.asarray(sites[n]["fn"].log_prob(sites[n]["value"])),
                    np.asarray(tr3[n]["fn"].log_prob(tr3[n]["value"])),
                    equal_nan=True))

        # biject_to(support): constrained -> unconstrained is .inv;
        # our Bijector.forward = to-unconstrained, so wrap accordingly.
        self._site_tf = {n: npdist.biject_to(sites[n]["fn"].support)
                         for n in self.site_order
                         if n not in self.factor_sites}
        self._discovery = {n: sites[n]["value"] for n in self.site_order}

        hyper_sorted = sorted(self.params)
        self._hyper_sorted = hyper_sorted
        self._hyper_sizes = [
            max(1, int(np.prod(np.shape(sites[n]["value"]))))
            for n in hyper_sorted]
        if all(isinstance(self._site_tf[n], npdist.transforms.IdentityTransform)
               for n in hyper_sorted):
            self.theta_bijector = None
        else:
            self.theta_bijector = _BlockwiseBiject(
                [self._site_tf[n] for n in hyper_sorted],
                self._hyper_sizes,
                [np.shape(sites[n]["value"]) for n in hyper_sorted])

        self.x = {k: self.observed[k] for k in sorted(self.observed)}

    # ------------------------------------------------------------- #

    def _theta_dict(self, theta):
        if isinstance(theta, dict):
            extra = set(theta) - set(self.params)
            if extra:
                raise ValueError(f"unknown θ entries {sorted(extra)}")
            return {k: jnp.asarray(v) for k, v in theta.items()}
        if len(self.params) == 1:
            return {self.params[0]: jnp.asarray(theta)}
        raise ValueError(f"θ must be a dict naming each of {self.params}")

    def sample_x_z(self, key, theta):
        sub = nph.substitute(self.model, data=self._theta_dict(theta))
        tr = nph.trace(nph.seed(sub, key)).get_trace(
            *self.model_args, **self.model_kwargs)
        x = {n: tr[n]["value"] for n in sorted(self.observed)}
        z = {n: self._site_tf[n].inv(tr[n]["value"])
             for n in sorted(self.latent_vars)}
        return x, z

    def log_like(self, x, z, theta):
        values = dict(self._theta_dict(theta))
        ldj = jnp.zeros(())
        for n in sorted(self.latent_vars):
            tf = self._site_tf[n]
            zc = tf(jnp.asarray(z[n]))   # unconstrained -> constrained
            values[n] = zc
            # linked density in unconstrained space:
            #   log p_u(u) = log p_c(c) + log|det dc/du|
            # (ppl.py:249 convention; numpyro's potential_energy likewise
            # adds the forward-direction jacobian).
            ldj = ldj + jnp.sum(tf.log_abs_det_jacobian(z[n], zc))
        for n in sorted(self.observed):
            values[n] = jnp.asarray(x[n])
        sub = nph.substitute(self.model, data=values)
        tr = nph.trace(nph.seed(sub, jax.random.PRNGKey(0))).get_trace(
            *self.model_args, **self.model_kwargs)
        lp = sum(jnp.sum(tr[n]["fn"].log_prob(tr[n]["value"]))
                 for n in self.site_order)
        return lp + ldj

    def log_prior(self, theta):
        values = dict(self._theta_dict(theta))
        for n in self.site_order:
            if n not in values:
                values[n] = self._discovery[n]
        sub = nph.substitute(self.model, data=values)
        tr = nph.trace(nph.seed(sub, jax.random.PRNGKey(0))).get_trace(
            *self.model_args, **self.model_kwargs)
        return sum(jnp.sum(tr[n]["fn"].log_prob(tr[n]["value"]))
                   for n in (*self.params, *self._prior_factors))


class _BlockwiseBiject:
    """Blockwise numpyro-transform bijector over the flat θ vector,
    exposing the muse_tpu.transforms.Bijector protocol (forward = to
    unconstrained space)."""

    def __init__(self, tfs, sizes, shapes):
        self.tfs = tfs
        self.sizes = sizes
        self.shapes = shapes

    def _split(self, v):
        out, i = [], 0
        for s in self.sizes:
            out.append(jax.lax.dynamic_slice_in_dim(v, i, s))
            i += s
        return out

    def forward(self, theta_flat):
        parts = []
        for tf, p, shp in zip(self.tfs, self._split(theta_flat),
                              self.shapes):
            parts.append(jnp.ravel(tf.inv(p.reshape(shp or ()))))
        return jnp.concatenate(parts)

    def inverse(self, theta_t_flat):
        parts = []
        for tf, p, shp in zip(self.tfs, self._split(theta_t_flat),
                              self.shapes):
            parts.append(jnp.ravel(tf(p.reshape(shp or ()))))
        return jnp.concatenate(parts)

    def log_det_jacobian(self, theta_flat):
        total = jnp.zeros(())
        for tf, p, shp in zip(self.tfs, self._split(theta_flat),
                              self.shapes):
            c = p.reshape(shp or ())
            total = total + jnp.sum(tf.inv.log_abs_det_jacobian(c, tf.inv(c)))
        return total
