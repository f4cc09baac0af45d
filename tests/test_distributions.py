"""Tests for the minimal distribution library (distributions.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats as st

from muse_tpu import distributions as dist


KEY = jax.random.PRNGKey(0)


@pytest.mark.parametrize("d,sp", [
    (dist.Normal(0.5, 2.0), st.norm(0.5, 2.0)),
    (dist.LogNormal(0.1, 0.7), st.lognorm(0.7, scale=np.exp(0.1))),
    (dist.Uniform(-1.0, 3.0), st.uniform(-1.0, 4.0)),
    (dist.Exponential(1.7), st.expon(scale=1 / 1.7)),
    (dist.HalfNormal(1.5), st.halfnorm(scale=1.5)),
    (dist.Gamma(2.5, 1.3), st.gamma(2.5, scale=1 / 1.3)),
    (dist.Beta(2.0, 3.5), st.beta(2.0, 3.5)),
    (dist.StudentT(4.0, 0.5, 1.2), st.t(4.0, loc=0.5, scale=1.2)),
])
def test_log_prob_matches_scipy(d, sp):
    x = np.asarray(d.sample(KEY, (100,)))
    np.testing.assert_allclose(np.asarray(d.log_prob(jnp.asarray(x))),
                               sp.logpdf(x), rtol=1e-3, atol=1e-4)


def test_sample_moments():
    d = dist.Normal(1.0, 2.0)
    x = np.asarray(d.sample(KEY, (200_000,)))
    assert x.mean() == pytest.approx(1.0, abs=0.02)
    assert x.std() == pytest.approx(2.0, abs=0.02)


def test_expand():
    d = dist.Normal(0.0, 1.0).expand((16,))
    assert d.shape == (16,)
    assert d.sample(KEY).shape == (16,)
    assert d.log_prob(jnp.zeros(16)).shape == (16,)


def test_mvnormal_diag_log_prob_sums_event():
    d = dist.MvNormalDiag(jnp.zeros(4), jnp.ones(4) * 2.0)
    x = jnp.ones(4)
    expected = st.multivariate_normal(np.zeros(4), 4 * np.eye(4)).logpdf(
        np.ones(4))
    assert float(d.log_prob(x)) == pytest.approx(expected, rel=1e-5)


def test_mvnormal_full():
    cov = np.array([[2.0, 0.5], [0.5, 1.0]])
    loc = np.array([1.0, -1.0])
    d = dist.MvNormal(jnp.asarray(loc), jnp.asarray(cov))
    x = np.array([0.3, 0.7])
    expected = st.multivariate_normal(loc, cov).logpdf(x)
    assert float(d.log_prob(jnp.asarray(x))) == pytest.approx(expected,
                                                              rel=1e-4)
    s = np.asarray(d.sample(KEY, (100_000, 2)))
    np.testing.assert_allclose(np.cov(s, rowvar=False), cov, atol=0.03)
    np.testing.assert_allclose(np.asarray(d.stddev),
                               np.sqrt(np.diag(cov)), rtol=1e-5)
