"""Pallas GRF kernel tests (interpret mode on CPU) + the non-whitened
field model that exercises them inside a full MUSE run."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from muse_tpu import check_self_consistency, muse
from muse_tpu.models import grf_field_problem, grf_problem
from muse_tpu.ops.pallas_grf import (pack_rfft2, pack_weights,
                                     spectrum_quadform,
                                     spectrum_quadform_and_grad,
                                     spectrum_quadform_reference)


@pytest.fixture(scope="module")
def data():
    B, n, m2 = 3, 16, 18
    z = jax.random.normal(jax.random.PRNGKey(0), (B, n, m2))
    ic = jax.random.uniform(jax.random.PRNGKey(1), (n, m2)) + 0.5
    return z, ic


def test_forward_matches_reference(data):
    z, ic = data
    np.testing.assert_allclose(np.asarray(spectrum_quadform(z, ic)),
                               np.asarray(spectrum_quadform_reference(z, ic)),
                               rtol=1e-5)


def test_fused_value_and_grad(data):
    z, ic = data
    q, hg = spectrum_quadform_and_grad(z, ic)
    qr = spectrum_quadform_reference(z, ic)
    gr = jax.grad(lambda zz: jnp.sum(spectrum_quadform_reference(zz, ic)))(z)
    np.testing.assert_allclose(np.asarray(q), np.asarray(qr), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(2 * hg), np.asarray(gr),
                               rtol=1e-5, atol=1e-6)


def test_custom_vjp_both_cotangents(data):
    z, ic = data
    w = jnp.arange(1.0, z.shape[0] + 1)
    f = lambda zz, cc: jnp.sum(spectrum_quadform(zz, cc) * w)
    fr = lambda zz, cc: jnp.sum(spectrum_quadform_reference(zz, cc) * w)
    gz, gc = jax.grad(f, argnums=(0, 1))(z, ic)
    gzr, gcr = jax.grad(fr, argnums=(0, 1))(z, ic)
    np.testing.assert_allclose(np.asarray(gz), np.asarray(gzr),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gc), np.asarray(gcr),
                               rtol=1e-5, atol=1e-5)


def test_pack_helpers_parseval():
    n = 16
    z = jax.random.normal(jax.random.PRNGKey(2), (n, n))
    from muse_tpu.models.grf import GrfConfig
    cfg = GrfConfig(n=n)
    zri = pack_rfft2(z)
    w2 = pack_weights(cfg.herm_weight)
    # Parseval: Σ z² = (1/n²) Σ w |ẑ|²
    quad = spectrum_quadform(zri[None], w2)[0] / n ** 2
    assert float(quad) == pytest.approx(float(jnp.sum(z * z)), rel=1e-4)


def test_field_model_self_consistency():
    p = grf_field_problem(n=32, data_key=jax.random.PRNGKey(42))
    assert check_self_consistency(p, 0.5)


def test_parameterization_invariance():
    """Whitened and non-whitened latents define the same marginal model;
    MUSE θ̂ must agree (both exact for this Gaussian problem)."""
    pw = grf_problem(n=32, solver="cg", data_key=jax.random.PRNGKey(42))
    pf = grf_field_problem(n=32, x_obs=pw.x)
    rw = muse(pw, 0.5, nsims=40, maxsteps=20, theta_rtol=1e-3,
              key=jax.random.PRNGKey(1))
    rf = muse(pf, 0.5, nsims=40, maxsteps=20, theta_rtol=1e-3,
              key=jax.random.PRNGKey(1))
    assert abs(float(rw.theta[0]) - float(rf.theta[0])) < 0.08
