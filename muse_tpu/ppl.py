"""A minimal effect-handler PPL — the model-ingestion layer.

The reference ingests PPL-defined models through Turing.jl and Soss.jl
adapters (``src/turing.jl``, ``src/soss.jl``).  numpyro is unavailable in
this environment, so the framework ships its own JAX-native PPL in the
numpyro/Turing style: models are plain Python functions calling
``sample(name, dist)``; effect handlers reinterpret those calls to trace,
seed, or substitute values.  Everything is jit/vmap/grad-safe (handlers
only run at trace time; the resulting computation is pure JAX).

Example (the reference test's funnel, test/runtests.jl:14-18)::

    import jax.numpy as jnp
    from muse_tpu import ppl
    from muse_tpu.distributions import Normal

    def funnel():
        theta = ppl.sample("theta", Normal(0.0, 3.0))
        z = ppl.sample("z", Normal(0.0, jnp.exp(theta / 2)).expand((512,)))
        x = ppl.sample("x", Normal(z, 1.0))

    prob = ppl.PPLMuseProblem(funnel, observed={"x": x_obs},
                              params=("theta",))
    result = muse(prob, {"theta": 1.0})

Site classification mirrors ``TuringMuseProblem`` (src/turing.jl:137-140):
conditioned (``observed``) sites are the data, ``params`` are the hyper
parameters θ, and every remaining sample site is latent space z.  Latents
live in *unconstrained* space inside the solver (positive/interval
supports are linked through their bijectors with the density volume
factor, matching DynamicPPL's linked ``logjoint``), and θ gets a blockwise
support bijector with the Turing volume-factor convention
(src/turing.jl:171-186).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

from . import transforms as tf
from .distributions import Distribution
from .problem import MuseProblem

__all__ = ["sample", "deterministic", "factor", "plate", "trace", "seed",
           "substitute", "PPLMuseProblem", "model_problem"]

_HANDLER_STACK: list = []
_PLATE_STACK: list = []


class Messenger:
    """Base effect handler: a context manager on the handler stack."""

    def __enter__(self):
        _HANDLER_STACK.append(self)
        return self

    def __exit__(self, *exc):
        assert _HANDLER_STACK.pop() is self

    def process(self, site: dict):
        pass

    def postprocess(self, site: dict):
        pass


class seed(Messenger):
    """Provides PRNG keys to sample sites (deterministic per site order)."""

    def __init__(self, key):
        self.key = key
        self._count = 0

    def __enter__(self):
        self._count = 0
        return super().__enter__()

    def process(self, site):
        if site["type"] == "sample" and site["key"] is None:
            site["key"] = jax.random.fold_in(self.key, self._count)
        self._count += 1


class substitute(Messenger):
    """Fixes named site values (conditioning / parameter injection)."""

    def __init__(self, values: Dict[str, Any]):
        self.values = dict(values)

    def process(self, site):
        # factor sites carry a COMPUTED log-density term as their value;
        # substituting it would silently replace the model's math
        if site["type"] != "factor" and site["name"] in self.values:
            site["value"] = self.values[site["name"]]


class trace(Messenger):
    """Records every site: name → {dist, value, type}."""

    def __init__(self):
        self.sites: Dict[str, dict] = {}

    def postprocess(self, site):
        self.sites[site["name"]] = dict(site)


class plate(Messenger):
    """Declare an independence dimension — ``numpyro.plate`` semantics
    (the ``with`` form; virtually every real hierarchical numpyro model
    uses it, which is why the Turing adapter's arbitrary-model ingestion
    at src/turing.jl:137-144 needs this analog).

    Inside ``with plate(name, size, dim=None)``, every sample site's
    distribution is expanded so its batch shape carries ``size`` along
    ``dim`` (negative, counted from the right).  ``dim=None``
    auto-allocates the next free dim to the LEFT of every enclosing
    plate's — numpyro's allocation rule — so nested plates stack::

        with plate("groups", G):               # dim -1
            mu = sample("mu", Normal(0., 3.))          # shape (G,)
            with plate("items", N):            # dim -2
                x = sample("x", Normal(mu, 1.))        # shape (N, G)

    Plate dims are elementwise-independent, so site log-densities SUM
    over them (``_site_logpdf``), and a scalar value observed or
    substituted under a plate is counted ``size`` times — both exactly
    numpyro's accounting.  The subsampling/iteration forms
    (``plate(..., subsample_size=...)``, ``for i in plate(...)``) are
    not implemented: MUSE needs full-data densities (minibatch scaling
    would silently bias the score).
    """

    def __init__(self, name: str, size: int, dim=None):
        self.name = name
        self.size = int(size)
        if dim is not None and dim >= 0:
            raise ValueError("plate dim must be negative (from the right)")
        self.dim = dim

    def __enter__(self):
        if self.dim is None:
            used = [p.dim for p in _PLATE_STACK]
            self.dim = (min(used) - 1) if used else -1
        elif any(p.dim == self.dim for p in _PLATE_STACK):
            raise ValueError(
                f"plate dim {self.dim} is already used by an enclosing "
                "plate — pass distinct dims or let them auto-allocate")
        _PLATE_STACK.append(self)
        return super().__enter__()

    def __exit__(self, *exc):
        assert _PLATE_STACK.pop() is self
        return super().__exit__(*exc)

    def process(self, site):
        if site["type"] != "sample":
            return
        pshape = (self.size,) + (1,) * (-self.dim - 1)
        site["dist"] = site["dist"].expand(
            jnp.broadcast_shapes(tuple(site["dist"].shape), pshape))


def sample(name: str, dist: Distribution, obs=None):
    """Declare a random variable.  Returns its (sampled/substituted) value."""
    site = {"type": "sample", "name": name, "dist": dist, "value": obs,
            "key": None}
    for h in reversed(_HANDLER_STACK):
        h.process(site)
    if site["value"] is None:
        if site["key"] is None:
            raise RuntimeError(
                f"site {name!r} has no value and no seed handler is active")
        # site["dist"], not the argument: plates expand it in process()
        site["value"] = site["dist"].sample(site["key"])
    site["value"] = jnp.asarray(site["value"])
    for h in _HANDLER_STACK:
        h.postprocess(site)
    return site["value"]


def factor(name: str, log_factor):
    """Add an arbitrary term to the model's log-joint — the
    ``numpyro.factor`` / Turing ``@addlogprob!`` analog (the reference
    ingests such terms implicitly because its densities come from
    ``DynPPL.logjoint``, src/turing.jl:192-196).

    The (summed) value enters ``log_like``, the full linked log-joint.  A
    factor that depends only on θ is *additionally* routed to
    ``log_prior`` — detected at construction by re-tracing with every
    non-θ site perturbed — so pure prior tilts flow into the MUSE
    posterior through g_prior/H_prior (inside the likelihood score a
    θ-only term cancels exactly between data and sims, src/muse.jl:183).

    Factors never affect sampling: ``sample_x_z`` draws from the sites'
    own distributions (standard PPL-factor semantics).  MUSE requires
    sims to be exact draws from the model's generative law, so a factor
    that reweights z or x makes the problem a *different* model than the
    sampler simulates — express data/latent density terms through site
    distributions; reserve ``factor`` for θ-tilts and for terms that are
    genuinely part of the likelihood given (x, z).

    Not supported inside ``plate`` (numpyro would multiply-count the
    term by the plate size there; compute the summed term and call
    ``factor`` outside the plate)."""
    if _PLATE_STACK:
        raise NotImplementedError(
            "factor() inside a plate is not supported — sum the term "
            "over the plate yourself and call factor() outside it")
    site = {"type": "factor", "name": name,
            "value": jnp.asarray(log_factor), "dist": None, "key": None}
    for h in reversed(_HANDLER_STACK):
        h.process(site)
    for h in _HANDLER_STACK:
        h.postprocess(site)
    return None


def deterministic(name: str, value):
    """Record a derived quantity in traces."""
    site = {"type": "deterministic", "name": name, "value": value,
            "dist": None, "key": None}
    for h in reversed(_HANDLER_STACK):
        h.process(site)
    for h in _HANDLER_STACK:
        h.postprocess(site)
    return value


# --------------------------------------------------------------------- #
# MUSE problem adapter
# --------------------------------------------------------------------- #

def _bij_for(dist: Distribution):
    # the distribution's own bijector carries support *bounds* (e.g. a
    # Uniform(2, 5) latent links through Logit(2, 5), not Logit(0, 1))
    return dist.bijector()


def _site_logpdf(site) -> jnp.ndarray:
    return jnp.sum(site["dist"].log_prob(site["value"]))


def _infer_root_sites(site_order, observed, dists1, dists2, values):
    """Default hyper sites when ``params`` is omitted: the model-graph
    ROOT sites — non-observed sample sites whose distribution parameters
    are trace-time constants.  The analog of the Soss adapter's
    graph-leaf default (src/soss.jl:91-94: variables all of whose
    parents are model arguments).  Detected semantically rather than
    syntactically: the model is re-traced with every site's value
    perturbed (``dists2``); a site whose density at a fixed evaluation
    point changes had a random parent and is NOT a root.  Heuristic by
    construction (a parent whose influence exactly cancels at the probe
    point would be missed) — pass ``params`` explicitly for full
    control."""
    import numpy as np
    roots = []
    for n in site_order:
        if n in observed:
            continue
        p1 = np.asarray(jnp.sum(dists1[n].log_prob(values[n])))
        p2 = np.asarray(jnp.sum(dists2[n].log_prob(values[n])))
        if np.array_equal(p1, p2, equal_nan=True):
            roots.append(n)
    if not roots:
        raise ValueError(
            "could not infer hyper sites: every non-observed site's "
            "distribution depends on another site — pass params= "
            "explicitly (the src/soss.jl:91-94 graph-leaf default only "
            "covers root sites)")
    return tuple(roots)


class PPLMuseProblem(MuseProblem):
    """Adapt a handler-PPL model to the MUSE interface.

    Args:
      model: the model function (calls ``ppl.sample``; extra ``*args``
        forwarded — the Soss ``model(σ)`` parameterization analog).
      observed: dict of conditioned site values — the data x
        (``model | (;x)`` analog).
      params: names of the hyper-parameter sites θ.  ``"theta"`` (the
        default) matches the Turing-adapter default ``params=(:θ,)``;
        ``None`` infers the model-graph root sites — non-observed sites
        whose distribution parameters are trace-time constants — the
        Soss adapter's graph-leaf default (src/soss.jl:91-94).
      model_args: extra positional arguments for ``model``.
      volume_factor: whether transformed-θ densities include the
        change-of-variables term.  True = Turing convention
        (src/turing.jl:171-186, reference tests pass
        ``has_volume_factor=true``); False = Soss convention
        (src/soss.jl:111-118, plain reparameterization).
    """

    def __init__(self, model: Callable, *, observed: Dict[str, Any],
                 params: Sequence[str] = ("theta",), model_args: tuple = (),
                 volume_factor: bool = True):
        self.volume_factor = volume_factor
        self.model = model
        self.model_args = tuple(model_args)
        self.observed = {k: jnp.asarray(v) for k, v in observed.items()}

        # --- site discovery (src/turing.jl:137-140) ------------------- #
        with trace() as tr, seed(jax.random.PRNGKey(0)):
            model(*self.model_args)
        self.site_order = [n for n, s in tr.sites.items()
                           if s["type"] == "sample"]
        self.factor_sites = tuple(n for n, s in tr.sites.items()
                                  if s["type"] == "factor")
        if params is None:
            # graph-root default (src/soss.jl:91-94 analog): re-trace
            # with every site's value perturbed; sites whose dist stayed
            # put have no random parents and are the hypers
            base = {n: jnp.asarray(tr.sites[n]["value"])
                    for n in self.site_order}
            pert = {n: base[n] * 1.173 + 0.31891 for n in self.site_order}
            with trace() as tr2, substitute(pert):
                model(*self.model_args)
            params = _infer_root_sites(
                self.site_order, self.observed,
                {n: tr.sites[n]["dist"] for n in self.site_order},
                {n: tr2.sites[n]["dist"] for n in self.site_order}, base)
        self.params = tuple(params)
        missing = [p for p in self.params if p not in self.site_order]
        if missing:
            bad = [p for p in missing if p in self.factor_sites]
            if bad:
                raise ValueError(f"{bad} are factor sites — they carry a "
                                 "density term, not a random variable, so "
                                 "they cannot be hyper parameters")
            raise ValueError(f"params {missing} are not sites of the model")
        bad_obs = [o for o in self.observed if o not in self.site_order]
        if bad_obs:
            bad = [o for o in bad_obs if o in self.factor_sites]
            if bad:
                raise ValueError(f"{bad} are factor sites — they carry a "
                                 "density term, not a random variable, so "
                                 "they cannot be observed")
            raise ValueError(f"observed {bad_obs} are not model sites")
        # Normalize observed values to each site's FULL traced shape
        # (numpyro obs-broadcasting semantics: a scalar observed under a
        # plate is that value observed at every plate index).  Doing the
        # broadcast here — not at density time — keeps the data lane
        # shape-identical to sim lanes in the lockstep solver
        # (solver/compiled.py muse_step's lane-0 mix), and turns an
        # over-shaped observed value (extra leading dims, which numpyro's
        # log_prob would silently broadcast into EXTRA density terms)
        # into an immediate error.
        for k in self.observed:
            full = tuple(jnp.shape(tr.sites[k]["value"]))
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
        self.latent_vars = tuple(
            n for n in self.site_order
            if n not in self.observed and n not in self.params)
        if not self.latent_vars:
            raise ValueError("model has no latent sites")

        # --- factor sites (ppl.factor) -------------------------------- #
        # All factors enter log_like (the full log-joint).  Factors that
        # depend ONLY on θ additionally enter log_prior: re-trace with
        # every non-θ sample site perturbed and θ pinned — a factor whose
        # value did not move has no (z, x) parents.  Same probe-point
        # heuristic as _infer_root_sites (an influence that exactly
        # cancels at the probe point would be missed).
        self._prior_factors: tuple = ()
        if self.factor_sites:
            import numpy as _np
            base = {n: jnp.asarray(tr.sites[n]["value"])
                    for n in self.site_order}
            probe = {n: (base[n] if n in self.params
                         else base[n] * 1.173 + 0.31891)
                     for n in self.site_order}
            with trace() as trf, substitute(probe):
                model(*self.model_args)
            self._prior_factors = tuple(
                n for n in self.factor_sites
                if _np.array_equal(_np.asarray(tr.sites[n]["value"]),
                                   _np.asarray(trf.sites[n]["value"]),
                                   equal_nan=True))

        # per-site support bijectors (from the discovery trace's dists;
        # supports must be θ-independent, as in Turing's link machinery)
        self._site_bij = {n: _bij_for(tr.sites[n]["dist"])
                          for n in self.site_order}
        self._discovery = tr.sites

        # θ blockwise bijector over the *flat* θ vector.  Flattening order
        # must match ThetaSpec (jax dict pytrees sort keys), so sites are
        # ordered by sorted name.
        import numpy as np
        hyper_sorted = sorted(self.params)
        sizes = [max(1, int(np.prod(tr.sites[n]["value"].shape)))
                 for n in hyper_sorted]
        bijs = [self._site_bij[n] for n in hyper_sorted]
        if all(b.name == "identity" for b in bijs):
            self.theta_bijector = None
        else:
            self.theta_bijector = tf.Blockwise(bijs, sizes)

        self.x = {k: self.observed[k] for k in sorted(self.observed)}

    # ----------------------------------------------------------------- #

    def _theta_dict(self, theta) -> Dict[str, Any]:
        if isinstance(theta, dict):
            extra = set(theta) - set(self.params)
            if extra:
                raise ValueError(f"unknown θ entries {sorted(extra)}; "
                                 f"params are {self.params}")
            return {k: jnp.asarray(v) for k, v in theta.items()}
        if len(self.params) == 1:
            return {self.params[0]: jnp.asarray(theta)}
        raise ValueError("θ must be a dict naming each of "
                         f"{self.params}")

    def sample_x_z(self, key, theta) -> Tuple[Dict, Dict]:
        """Forward-sample (x, z) | θ; z returned in unconstrained space."""
        with trace() as tr, seed(key), substitute(self._theta_dict(theta)):
            self.model(*self.model_args)
        x = {n: tr.sites[n]["value"] for n in sorted(self.observed)}
        z = {n: self._site_bij[n].forward(tr.sites[n]["value"])
             for n in sorted(self.latent_vars)}
        return x, z

    def log_like(self, x, z, theta) -> jnp.ndarray:
        """Linked log-joint: all sites' densities with z's unconstrained-
        space volume factors — ``DynPPL.logjoint`` on a SimpleVarInfo with
        z linked (src/turing.jl:192-196).  Includes the θ-prior term; it
        cancels in the MUSE score's data−sims subtraction and shifts
        neither J nor H (constant in x)."""
        values = dict(self._theta_dict(theta))
        ldj = jnp.zeros(())
        for n in sorted(self.latent_vars):
            b = self._site_bij[n]
            zc = b.inverse(jnp.asarray(z[n]))
            values[n] = zc
            # linked density: log p_c(z_c) − log|det ∂b/∂z_c|
            ldj = ldj - b.log_det_jacobian(zc)
        for n in sorted(self.observed):
            values[n] = jnp.asarray(x[n])
        with trace() as tr, substitute(values):
            self.model(*self.model_args)
        lp = sum(_site_logpdf(tr.sites[n]) for n in self.site_order)
        lp = lp + sum(jnp.sum(tr.sites[n]["value"])
                      for n in self.factor_sites)
        return lp + ldj

    def log_prior(self, theta) -> jnp.ndarray:
        """θ-prior alone (``model_for_prior`` analog, src/turing.jl:198-202):
        θ sites' densities with every other site fixed to its discovery
        value (so θ-dependent downstream dists don't contribute)."""
        values = dict(self._theta_dict(theta))
        for n in self.site_order:
            if n not in values:
                values[n] = self._discovery[n]["value"]
        with trace() as tr, substitute(values):
            self.model(*self.model_args)
        return (sum(_site_logpdf(tr.sites[n]) for n in self.params)
                + sum(jnp.sum(tr.sites[n]["value"])
                      for n in self._prior_factors))


def model_problem(model: Callable, theta0, observed: Dict[str, Any],
                  **kwargs) -> PPLMuseProblem:
    """Convenience: infer ``params`` from the keys of θ₀ — the
    ``muse(model, (σ=0.5, θ=0))`` direct-on-model overload analog
    (src/turing.jl:245-256).  A key-less (scalar/array) θ₀ falls back to
    graph-root inference (``params=None``, the src/soss.jl:91-94
    graph-leaf default), so a single-hyper model works whatever its
    hyper site is named."""
    params = tuple(theta0.keys()) if isinstance(theta0, dict) else None
    return PPLMuseProblem(model, observed=observed, params=params, **kwargs)
