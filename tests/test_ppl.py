"""PPL adapter tests — the Turing/Soss-adapter test surface
(test/runtests.jl structure: self-consistency + end-to-end funnel), plus
handler-level unit tests the reference gets for free from DynamicPPL."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from muse_tpu import check_self_consistency, muse
from muse_tpu import ppl
from muse_tpu.distributions import LogNormal, Normal, Uniform

D = 64


def funnel():
    theta = ppl.sample("theta", Normal(0.0, 3.0))
    z = ppl.sample("z", Normal(0.0, jnp.exp(theta / 2)).expand((D,)))
    ppl.sample("x", Normal(z, 1.0))


@pytest.fixture(scope="module")
def x_obs():
    k1, k2 = jax.random.split(jax.random.PRNGKey(42))
    z = jax.random.normal(k1, (D,))
    return z + jax.random.normal(k2, (D,))


@pytest.fixture(scope="module")
def prob(x_obs):
    return ppl.PPLMuseProblem(funnel, observed={"x": x_obs},
                              params=("theta",))


class TestHandlers:
    def test_trace_records_sites(self):
        with ppl.trace() as tr, ppl.seed(jax.random.PRNGKey(0)):
            funnel()
        assert list(tr.sites) == ["theta", "z", "x"]
        assert tr.sites["z"]["value"].shape == (D,)

    def test_seed_deterministic(self):
        vals = []
        for _ in range(2):
            with ppl.trace() as tr, ppl.seed(jax.random.PRNGKey(7)):
                funnel()
            vals.append(tr.sites["z"]["value"])
        np.testing.assert_array_equal(np.asarray(vals[0]),
                                      np.asarray(vals[1]))

    def test_substitute_overrides(self):
        with ppl.trace() as tr, ppl.seed(jax.random.PRNGKey(0)), \
                ppl.substitute({"theta": 2.5}):
            funnel()
        assert float(tr.sites["theta"]["value"]) == 2.5

    def test_sample_without_seed_raises(self):
        with pytest.raises(RuntimeError):
            funnel()

    def test_deterministic_site(self):
        def m():
            a = ppl.sample("a", Normal(0.0, 1.0))
            ppl.deterministic("b", a * 2)
        with ppl.trace() as tr, ppl.seed(jax.random.PRNGKey(0)):
            m()
        assert "b" in tr.sites
        assert float(tr.sites["b"]["value"]) == pytest.approx(
            2 * float(tr.sites["a"]["value"]))


class TestProblemConstruction:
    def test_site_classification(self, prob):
        assert prob.latent_vars == ("z",)
        assert prob.params == ("theta",)

    def test_unknown_param_raises(self, x_obs):
        with pytest.raises(ValueError):
            ppl.PPLMuseProblem(funnel, observed={"x": x_obs},
                               params=("nope",))

    def test_unknown_observed_raises(self):
        with pytest.raises(ValueError):
            ppl.PPLMuseProblem(funnel, observed={"q": jnp.zeros(3)})

    def test_theta_key_validation(self, prob):
        with pytest.raises(ValueError):
            prob._theta_dict({"wrong": 1.0})


def test_self_consistency(prob):
    assert check_self_consistency(prob, {"theta": 1.0})


def test_self_consistency_transformed_theta(x_obs):
    """Positive-support hyper → log bijector → volume-factor math
    (the has_volume_factor=true Turing case, test/runtests.jl:29)."""
    def amp_model():
        amp = ppl.sample("amp", LogNormal(0.0, 1.0))
        z = ppl.sample("z", Normal(0.0, amp).expand((D,)))
        ppl.sample("x", Normal(z, 1.0))

    p = ppl.PPLMuseProblem(amp_model, observed={"x": x_obs},
                           params=("amp",))
    assert p.theta_bijector is not None
    assert check_self_consistency(p, {"amp": 1.3})


def test_end_to_end_funnel(prob):
    """The reference's oracle: full pipeline, θ̂/σ < 2."""
    res = muse(prob, {"theta": 1.0}, nsims=30, maxsteps=20,
               get_covariance=True, key=jax.random.PRNGKey(1))
    assert abs(float(res.theta[0])) / float(res.sigma[0]) < 2
    assert isinstance(res.theta_user, dict)


def test_hierarchical_two_hypers_two_latents():
    """Toy hierarchical chain (TuringMuseProblem docstring example,
    src/turing.jl:63-79) with mixed θ supports."""
    def toy():
        sigma = ppl.sample("sigma", Uniform(0.1, 1.0))
        theta = ppl.sample("theta", Normal(0.0, 3.0))
        z = ppl.sample("z", Normal(theta, jnp.exp(sigma)).expand((32,)))
        w = ppl.sample("w", Normal(z, 1.0))
        ppl.sample("x", Normal(w, 1.0))

    with ppl.trace() as tr, ppl.seed(jax.random.PRNGKey(3)), \
            ppl.substitute({"sigma": 0.5, "theta": 0.2}):
        toy()
    p = ppl.PPLMuseProblem(toy, observed={"x": tr.sites["x"]["value"]},
                           params=("sigma", "theta"))
    assert p.latent_vars == ("z", "w")
    assert check_self_consistency(p, {"sigma": 0.5, "theta": 0.0})
    res = muse(p, {"sigma": 0.4, "theta": 0.0}, nsims=20, maxsteps=15,
               get_covariance=True, key=jax.random.PRNGKey(4))
    zscores = np.abs(res.theta - np.array([0.5, 0.2])) / res.sigma
    assert (zscores < 3).all()


def test_degenerate_hyper_raises():
    """A hyper that doesn't touch the data must fail loudly, not NaN."""
    def degen():
        ppl.sample("theta", Normal(0.0, 3.0))
        z = ppl.sample("z", Normal(0.0, 1.0).expand((16,)))
        ppl.sample("x", Normal(z, 1.0))

    p = ppl.PPLMuseProblem(degen, observed={"x": np.zeros(16)},
                           params=("theta",))
    with pytest.raises(RuntimeError, match="zero/non-finite score"):
        muse(p, {"theta": 1.0}, nsims=5, maxsteps=3)


def test_model_problem_infers_params(x_obs):
    p = ppl.model_problem(funnel, {"theta": 0.0}, observed={"x": x_obs})
    assert p.params == ("theta",)


def test_model_problem_exported():
    import muse_tpu
    assert "model_problem" in muse_tpu.__all__
    assert "model_problem" in ppl.__all__
    assert muse_tpu.model_problem is ppl.model_problem


def test_muse_direct_on_model(x_obs):
    """muse(model_fn, θ₀, observed=...) — the muse!(result, model, θ₀)
    direct-on-model overload analog (src/turing.jl:248-256)."""
    res = muse(funnel, {"theta": 1.0}, observed={"x": x_obs},
               nsims=10, maxsteps=3, key=jax.random.PRNGKey(5))
    assert np.isfinite(res.theta).all()
    with pytest.raises(ValueError, match="observed"):
        muse(funnel, {"theta": 1.0}, nsims=2)
    with pytest.raises(ValueError, match="model function"):
        p = ppl.PPLMuseProblem(funnel, observed={"x": x_obs})
        muse(p, {"theta": 1.0}, observed={"x": x_obs}, nsims=2)


def test_non_unit_uniform_latent():
    """Regression (ADVICE r1): a Uniform(2,5) latent used to link through
    Logit(0,1) → NaN in sample_x_z / log_like.  It must link through
    Logit(2,5) and stay finite + self-consistent."""
    def m():
        theta = ppl.sample("theta", Normal(0.0, 3.0))
        w = ppl.sample("w", Uniform(2.0, 5.0))
        ppl.sample("x", Normal(theta + w, 1.0).expand((16,)))

    p = ppl.PPLMuseProblem(m, observed={"x": 3.0 * np.ones(16)},
                           params=("theta",))
    x, z = p.sample_x_z(jax.random.PRNGKey(0), {"theta": 0.5})
    assert np.isfinite(np.asarray(z["w"])).all()
    ll = float(p.log_like(x, z, {"theta": 0.5}))
    assert np.isfinite(ll)
    assert check_self_consistency(p, {"theta": 0.5})


def test_non_unit_uniform_hyper():
    """A Uniform(2,5) hyper gets a Logit(2,5) θ-bijector with a finite
    volume factor at θ inside the bounds."""
    def m():
        s = ppl.sample("s", Uniform(2.0, 5.0))
        z = ppl.sample("z", Normal(0.0, s).expand((16,)))
        ppl.sample("x", Normal(z, 1.0))

    p = ppl.PPLMuseProblem(m, observed={"x": np.zeros(16)}, params=("s",))
    assert p.theta_bijector is not None
    th = jnp.array([3.0])
    y = p.theta_bijector.forward(th)
    assert np.isfinite(np.asarray(y)).all()
    np.testing.assert_allclose(np.asarray(p.theta_bijector.inverse(y)),
                               np.asarray(th), rtol=1e-6)
    assert check_self_consistency(p, {"s": 3.0})


def test_soss_convention_volume_factor(x_obs):
    """volume_factor=False (Soss convention, has_volume_factor=false in
    the reference tests) must also pass self-consistency."""
    def amp_model():
        amp = ppl.sample("amp", LogNormal(0.0, 1.0))
        z = ppl.sample("z", Normal(0.0, amp).expand((D,)))
        ppl.sample("x", Normal(z, 1.0))

    p = ppl.PPLMuseProblem(amp_model, observed={"x": x_obs},
                           params=("amp",), volume_factor=False)
    assert not p.volume_factor
    assert check_self_consistency(p, {"amp": 1.3})


# ------------------------------------------------------------------ #
# plate (VERDICT r3 missing #1: numpyro.plate semantics in the PPL)
# ------------------------------------------------------------------ #

def test_plate_shapes_and_dim_allocation():
    """Nested plates auto-allocate dims right-to-left (outer -1, inner
    -2), numpyro's rule — samples stack as (inner, ..., outer)."""
    def m():
        th = ppl.sample("theta", Normal(0.0, 3.0))
        with ppl.plate("groups", 4):
            z = ppl.sample("z", Normal(th, 0.7))
            with ppl.plate("items", 8):
                ppl.sample("x", Normal(z, 0.5))

    with ppl.trace() as tr, ppl.seed(jax.random.PRNGKey(0)):
        m()
    assert tr.sites["theta"]["value"].shape == ()
    assert tr.sites["z"]["value"].shape == (4,)
    assert tr.sites["x"]["value"].shape == (8, 4)


def test_plate_explicit_dim():
    def m():
        with ppl.plate("a", 3, dim=-2):
            ppl.sample("u", Normal(0.0, 1.0))

    with ppl.trace() as tr, ppl.seed(jax.random.PRNGKey(0)):
        m()
    assert tr.sites["u"]["value"].shape == (3, 1)


def test_plate_dim_errors():
    with pytest.raises(ValueError, match="negative"):
        ppl.plate("a", 3, dim=0)

    def m():
        with ppl.plate("a", 3, dim=-1), ppl.plate("b", 4, dim=-1):
            ppl.sample("u", Normal(0.0, 1.0))

    with pytest.raises(ValueError, match="already used"):
        with ppl.trace(), ppl.seed(jax.random.PRNGKey(0)):
            m()


def test_plate_counts_scalar_value_per_element():
    """A scalar value substituted under a plate contributes size× its
    density — numpyro's independence accounting."""
    import scipy.stats as st

    def m():
        with ppl.plate("g", 5):
            ppl.sample("z", Normal(0.2, 0.7))

    with ppl.trace() as tr, ppl.substitute({"z": 0.3}):
        m()
    lp = float(jnp.sum(tr.sites["z"]["dist"].log_prob(
        tr.sites["z"]["value"])))
    assert lp == pytest.approx(5 * st.norm(0.2, 0.7).logpdf(0.3), rel=1e-5)


def test_plate_broadcasts_group_params():
    """A dist whose params already carry the plate shape is left at the
    broadcast shape (no double expansion)."""
    def m():
        with ppl.plate("g", 4):
            mu = ppl.sample("mu", Normal(0.0, 3.0))          # (4,)
            with ppl.plate("n", 6):
                ppl.sample("x", Normal(mu, 1.0))             # (6, 4)

    with ppl.trace() as tr, ppl.seed(jax.random.PRNGKey(1)):
        m()
    assert tr.sites["mu"]["value"].shape == (4,)
    assert tr.sites["x"]["value"].shape == (6, 4)


def test_plated_hierarchical_end_to_end():
    """Plated hierarchical Gaussian through the full MUSE pipeline vs
    the conjugate closed form (MUSE exact for linear-Gaussian models)."""
    G, N, tau, sig = 4, 8, 0.7, 0.5

    def m():
        th = ppl.sample("theta", Normal(0.0, 3.0))
        with ppl.plate("groups", G):
            z = ppl.sample("z", Normal(th, tau))
            with ppl.plate("items", N):
                ppl.sample("x", Normal(z, sig))

    tmp = ppl.PPLMuseProblem(m, observed={"x": jnp.zeros((N, G))})
    x_obs, _ = tmp.sample_x_z(jax.random.PRNGKey(5), {"theta": 0.4})
    p = ppl.PPLMuseProblem(m, observed=x_obs)
    assert check_self_consistency(p, {"theta": 0.4})
    r = muse(p, {"theta": 1.0}, nsims=200, maxsteps=30, theta_rtol=1e-4,
             get_covariance=True, key=jax.random.PRNGKey(0))
    xbar = float(np.mean(np.asarray(x_obs["x"])))
    prec_like = G / (tau ** 2 + sig ** 2 / N)
    prec = prec_like + 1.0 / 9.0
    theta_post = prec_like * xbar / prec
    sigma_post = prec ** -0.5
    mc = 3 * sigma_post / np.sqrt(200)
    assert abs(float(r.theta[0]) - theta_post) < 3 * mc + 1e-3
    assert float(r.sigma[0]) == pytest.approx(sigma_post, rel=0.3)


def test_params_inference_graph_roots():
    """params=None infers the model-graph ROOT sites — the Soss
    adapter's graph-leaf default (src/soss.jl:91-94): sites whose
    distribution parameters are trace-time constants.  A key-less θ₀
    through model_problem/muse takes the same path, so a single-hyper
    model works whatever its hyper site is named."""
    from muse_tpu.distributions import LogNormal

    def m():
        amp = ppl.sample("amp", Normal(0.0, 3.0))
        z = ppl.sample("z", Normal(0.0, jnp.exp(amp / 2)).expand((32,)))
        ppl.sample("x", Normal(z, 1.0))

    tmp = ppl.PPLMuseProblem(m, observed={"x": jnp.zeros(32)},
                             params=("amp",))
    x_obs, _ = tmp.sample_x_z(jax.random.PRNGKey(3), {"amp": 0.2})

    p = ppl.PPLMuseProblem(m, observed=x_obs, params=None)
    assert p.params == ("amp",)
    assert p.latent_vars == ("z",)

    # direct-on-model with a key-less scalar θ₀: the hyper site is
    # found even though it is not named "theta"
    r = muse(m, 0.5, observed=x_obs, nsims=8, maxsteps=3,
             key=jax.random.PRNGKey(0))
    assert np.isfinite(r.theta).all()

    # two roots (theta scale-free, sigma a root too) are both inferred
    def m2():
        th = ppl.sample("theta", Normal(0.0, 3.0))
        sg = ppl.sample("sigma", LogNormal(0.0, 0.5))
        z = ppl.sample("z", Normal(th, 1.0).expand((16,)))
        ppl.sample("x", Normal(z, sg))

    p2 = ppl.PPLMuseProblem(m2, observed={"x": jnp.zeros(16)}, params=None)
    assert p2.params == ("theta", "sigma")
    assert p2.latent_vars == ("z",)

    # no root at all (every non-observed site has a random parent once
    # the only root is observed) → a clear error asking for params=
    def m3():
        z = ppl.sample("z", Normal(0.0, 1.0).expand((8,)))
        w = ppl.sample("w", Normal(z, 1.0))
        ppl.sample("x", Normal(w, 1.0))

    with pytest.raises(ValueError, match="could not infer"):
        ppl.PPLMuseProblem(m3, observed={"x": jnp.zeros(8), "z": jnp.zeros(8)},
                           params=None)


def test_observed_value_broadcasting():
    """Observed-value broadcasting edge cases (numpyro obs semantics,
    the last thin spot of the Soss-adapter slot named in VERDICT r4
    missing #1): a scalar observed under a plate is that value observed
    at EVERY plate index — the constructor broadcasts it to the site's
    full traced shape (so the data lane is shape-identical to sim lanes
    in the lockstep solver) and its density counts ``size`` times; an
    over-shaped observed value (extra leading dims, which numpyro's
    log_prob would silently broadcast into extra density terms) raises
    immediately instead."""
    import scipy.stats as st
    N, tau, sig = 6, 0.7, 0.5

    def m():
        th = ppl.sample("theta", Normal(0.0, 3.0))
        z = ppl.sample("z", Normal(th, tau))
        with ppl.plate("items", N):
            ppl.sample("x", Normal(z, sig))

    p = ppl.PPLMuseProblem(m, observed={"x": 2.0})
    assert p.x["x"].shape == (N,)
    np.testing.assert_array_equal(np.asarray(p.x["x"]), 2.0)

    th, zv = 0.25, 0.6
    want = (st.norm(0.0, 3.0).logpdf(th) + st.norm(th, tau).logpdf(zv)
            + N * st.norm(zv, sig).logpdf(2.0))
    got = float(p.log_like(p.x, {"z": jnp.asarray(zv)}, {"theta": th}))
    assert got == pytest.approx(want, rel=1e-5)
    assert check_self_consistency(p, {"theta": 0.4})

    # a (1,)-shaped observed broadcasts the same way
    p1 = ppl.PPLMuseProblem(m, observed={"x": jnp.full((1,), 2.0)})
    assert p1.x["x"].shape == (N,)

    # end-to-end through the compiled solver (lane-0 mix must see the
    # broadcast data): conjugate oracle with x̄ = 2.0 exactly
    r = muse(p, {"theta": 1.0}, nsims=200, maxsteps=30, theta_rtol=1e-4,
             get_covariance=True, key=jax.random.PRNGKey(0))
    prec_like = 1.0 / (tau ** 2 + sig ** 2 / N)
    prec = prec_like + 1.0 / 9.0
    theta_post = prec_like * 2.0 / prec
    sigma_post = prec ** -0.5
    mc = 3 * sigma_post / np.sqrt(200)
    assert abs(float(r.theta[0]) - theta_post) < 3 * mc + 1e-3

    # over-shaped / wrong-length observed: clear constructor error
    with pytest.raises(ValueError, match="does not broadcast"):
        ppl.PPLMuseProblem(m, observed={"x": jnp.zeros((2, N))})
    with pytest.raises(ValueError, match="does not broadcast"):
        ppl.PPLMuseProblem(m, observed={"x": jnp.zeros((N + 1,))})


# ------------------------------------------------------------------ #
# factor sites — ppl.factor (numpyro.factor / Turing @addlogprob!
# analog; the reference ingests such terms through DynPPL.logjoint,
# src/turing.jl:192-196)
# ------------------------------------------------------------------ #

def test_factor_enters_log_like_with_gradient():
    W2 = 4.0
    D8 = 8

    def with_factor():
        theta = ppl.sample("theta", Normal(0.0, 3.0))
        z = ppl.sample("z", Normal(0.0, jnp.exp(theta / 2)).expand((D8,)))
        ppl.sample("x", Normal(z, 1.0))
        # placed LAST so the twin's sample sites keep the same seed
        # indices (factor sites advance the per-site key counter)
        ppl.factor("soft", -0.5 * jnp.sum(z ** 2) / W2)

    def without():
        theta = ppl.sample("theta", Normal(0.0, 3.0))
        z = ppl.sample("z", Normal(0.0, jnp.exp(theta / 2)).expand((D8,)))
        ppl.sample("x", Normal(z, 1.0))

    x = jnp.linspace(-1.0, 1.0, D8)
    pa = ppl.PPLMuseProblem(with_factor, observed={"x": x})
    pb = ppl.PPLMuseProblem(without, observed={"x": x})
    assert pa.factor_sites == ("soft",)
    assert pa._prior_factors == ()          # depends on z → likelihood
    assert pa.latent_vars == pb.latent_vars == ("z",)

    zv = jnp.linspace(0.1, 0.9, D8)
    th = 0.3
    la = float(pa.log_like({"x": x}, {"z": zv}, th))
    lb = float(pb.log_like({"x": x}, {"z": zv}, th))
    assert la == pytest.approx(lb - 0.5 * float(jnp.sum(zv ** 2)) / W2,
                               rel=1e-6)
    ga = jax.grad(lambda z: pa.log_like({"x": x}, {"z": z}, th))(zv)
    gb = jax.grad(lambda z: pb.log_like({"x": x}, {"z": z}, th))(zv)
    np.testing.assert_allclose(np.asarray(ga - gb), -np.asarray(zv) / W2,
                               rtol=1e-5, atol=1e-7)

    # sampling ignores factors: bit-identical draws vs the twin
    ka = jax.random.PRNGKey(3)
    xa, za = pa.sample_x_z(ka, 0.3)
    xb, zb = pb.sample_x_z(ka, 0.3)
    np.testing.assert_array_equal(np.asarray(xa["x"]), np.asarray(xb["x"]))
    np.testing.assert_array_equal(np.asarray(za["z"]), np.asarray(zb["z"]))


def test_pure_theta_factor_routes_to_prior():
    A = 0.125

    def tilted():
        theta = ppl.sample("theta", Normal(0.0, 3.0))
        z = ppl.sample("z", Normal(0.0, jnp.exp(theta / 2)).expand((8,)))
        ppl.sample("x", Normal(z, 1.0))
        ppl.factor("tilt", -A * theta ** 2)

    p = ppl.PPLMuseProblem(tilted, observed={"x": jnp.zeros((8,))})
    assert p._prior_factors == ("tilt",)
    th = 0.7
    want = float(Normal(0.0, 3.0).log_prob(th)) - A * th ** 2
    assert float(p.log_prior(th)) == pytest.approx(want, rel=1e-6)
    # prior curvature sees the tilt: d²/dθ² = −1/9 − 2A
    h = float(jax.hessian(lambda t: p.log_prior(t))(jnp.asarray(th)))
    assert h == pytest.approx(-(1.0 / 9.0 + 2 * A), rel=1e-5)


def test_theta_factor_end_to_end_matches_explicit_prior():
    """A θ-tilt via factor must give the SAME posterior as folding the
    tilt into the prior site: N(0,3) + exp(−Aθ²) ≡ N(0, σc) with
    1/σc² = 1/9 + 2A (up to a θ-independent constant, which MUSE's
    score/prior derivatives never see)."""
    A = 0.125
    Dz = 32
    sc = (1.0 / 9.0 + 2 * A) ** -0.5

    def via_factor():
        theta = ppl.sample("theta", Normal(0.0, 3.0))
        z = ppl.sample("z", Normal(0.0, jnp.exp(theta / 2)).expand((Dz,)))
        ppl.sample("x", Normal(z, 1.0))
        ppl.factor("tilt", -A * theta ** 2)

    def explicit():
        theta = ppl.sample("theta", Normal(0.0, sc))
        z = ppl.sample("z", Normal(0.0, jnp.exp(theta / 2)).expand((Dz,)))
        ppl.sample("x", Normal(z, 1.0))

    x = np.asarray(jax.random.normal(jax.random.PRNGKey(9), (Dz,))) * 1.2
    kw = dict(nsims=16, maxsteps=20, theta_rtol=1e-3,
              get_covariance=True, key=jax.random.PRNGKey(4))
    ra = muse(ppl.PPLMuseProblem(via_factor, observed={"x": x}),
              {"theta": 0.5}, **kw)
    rb = muse(ppl.PPLMuseProblem(explicit, observed={"x": x}),
              {"theta": 0.5}, **kw)
    assert float(ra.theta[0]) == pytest.approx(float(rb.theta[0]),
                                               abs=1e-4)
    assert float(ra.sigma[0]) == pytest.approx(float(rb.sigma[0]),
                                               rel=1e-3)


def test_factor_guards():
    def m():
        theta = ppl.sample("theta", Normal(0.0, 3.0))
        z = ppl.sample("z", Normal(theta, 1.0))
        ppl.sample("x", Normal(z, 1.0))
        ppl.factor("pen", -z ** 2)

    # factor names cannot be conditioned or hyper
    with pytest.raises(ValueError, match="factor sites"):
        ppl.PPLMuseProblem(m, observed={"x": 0.0, "pen": 1.0})
    with pytest.raises(ValueError, match="factor sites"):
        ppl.PPLMuseProblem(m, observed={"x": 0.0},
                           params=("theta", "pen"))

    # factor inside a plate: numpyro would multiply-count it — refuse
    def plated():
        theta = ppl.sample("theta", Normal(0.0, 3.0))
        with ppl.plate("i", 4):
            z = ppl.sample("z", Normal(theta, 1.0))
            ppl.factor("pen", -jnp.sum(z ** 2))
        ppl.sample("x", Normal(jnp.sum(z), 1.0))

    with pytest.raises(NotImplementedError, match="plate"):
        ppl.PPLMuseProblem(plated, observed={"x": 0.0})


def test_factor_self_consistency_with_transformed_theta(x_obs):
    """A θ-only factor on a positive-support hyper must keep the
    volume-factor relations intact (check #2 sees the factor through
    log_prior, check #3 through log_like; the bijector chain rule must
    hold with BOTH contributions present)."""
    def amp_model():
        amp = ppl.sample("amp", LogNormal(0.0, 1.0))
        z = ppl.sample("z", Normal(0.0, amp).expand((D,)))
        ppl.sample("x", Normal(z, 1.0))
        ppl.factor("tilt", -0.2 * (amp - 1.0) ** 2)

    p = ppl.PPLMuseProblem(amp_model, observed={"x": x_obs},
                           params=("amp",))
    assert p.theta_bijector is not None
    assert p._prior_factors == ("tilt",)
    assert check_self_consistency(p, {"amp": 1.3})
