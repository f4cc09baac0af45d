"""Bandpower GRF tests — many-component vector θ against exact oracles.

The config that exercises the reference's nθ ≫ 1 regime (vector θ through
ComponentArrays + the pmap_over=:jac FD-Jacobian axis, src/muse.jl:277-333)
on a model with closed forms: disjoint bands ⇒ the marginal MLE decouples
and the Fisher matrix is exactly diagonal, pinning θ̂, the σ vector, AND
the vanishing off-diagonals of Σ.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from muse_tpu import check_self_consistency, get_H, get_J, muse
from muse_tpu.models.bandpower import (band_edges, bandpower_mle,
                                       bandpower_problem)
from muse_tpu.result import MuseResult

N, NB, SIGMA = 32, 5, 0.05


@pytest.fixture(scope="module")
def prob():
    return bandpower_problem(n=N, nbands=NB, sigma_noise=SIGMA,
                             data_key=jax.random.PRNGKey(7))


def test_band_edges_cover_all_modes():
    edges = band_edges(N, NB)
    ky = np.fft.fftfreq(N) * N
    kx = np.fft.rfftfreq(N) * N
    k = np.hypot(ky[:, None], kx[None, :])
    band = np.searchsorted(edges, k, side="right")
    counts = np.bincount(band.ravel(), minlength=NB)
    assert (counts > 0).all()
    assert band.min() == 0 and band.max() == NB - 1


def test_band_edges_too_many_bands_raises():
    with pytest.raises(ValueError, match="too few distinct"):
        band_edges(4, 8)


def test_self_consistency(prob):
    assert check_self_consistency(prob, jnp.zeros(NB))


def test_grad_theta_matches_ad_at_map(prob):
    """The all-positive packed score equals AD's ∂θ log_like AT the MAP
    (that is its validity domain — grf.grad_theta rationale)."""
    th = jnp.asarray(np.linspace(-0.2, 0.3, NB), jnp.float32)
    x, _ = jax.jit(prob.sample_x_z)(jax.random.PRNGKey(3), th)
    zhat, aux = prob.custom_zhat(x[None], jnp.zeros_like(x)[None],
                                 th, 1e-8)
    assert bool(aux["converged"].all())
    g_analytic = prob.grad_theta_log_like(x, zhat[0], th)
    g_ad = jax.grad(lambda t: prob.log_like(x, zhat[0], t))(th)
    np.testing.assert_allclose(np.asarray(g_analytic), np.asarray(g_ad),
                               rtol=2e-3, atol=2e-3)


def test_solver_paths_agree(prob):
    """CG and closed-form Wiener MAPs must coincide (diagonal operator)."""
    th = jnp.full((NB,), 0.1, jnp.float32)
    x, _ = jax.jit(prob.sample_x_z)(jax.random.PRNGKey(5), th)
    z_cg, aux = prob.custom_zhat(x[None], jnp.zeros_like(x)[None], th, 1e-6)
    p_direct = bandpower_problem(n=N, nbands=NB, sigma_noise=SIGMA,
                                 solver="direct", x_obs=prob.x)
    z_dir, _ = p_direct.custom_zhat(x[None], jnp.zeros_like(x)[None],
                                    th, 1e-6)
    assert bool(aux["converged"].all())
    np.testing.assert_allclose(np.asarray(z_cg), np.asarray(z_dir),
                               rtol=1e-4, atol=1e-5)


def test_muse_matches_decoupled_mle_and_fisher(prob):
    """Full pipeline vs the exact closed forms: θ̂ within MC error of the
    per-band MLE, σ within MC error of the (diagonal) Fisher widths, and
    the Σ off-diagonal correlations consistent with ZERO."""
    mle, Sig_f = bandpower_mle(prob.x_real, N, NB, sigma_noise=SIGMA)
    sig_f = np.sqrt(np.diag(Sig_f))
    res = muse(prob, jnp.zeros(NB), nsims=30, maxsteps=30,
               theta_rtol=1e-3, get_covariance=True,
               key=jax.random.PRNGKey(1))
    z = (np.asarray(res.theta) - mle) / sig_f
    assert np.max(np.abs(z)) < 3 / np.sqrt(30) + 0.05, z
    ratio = np.asarray(res.sigma) / sig_f
    assert np.max(np.abs(ratio - 1.0)) < 0.5, ratio
    S = np.asarray(res.Sigma)
    corr = S / np.sqrt(np.outer(np.diag(S), np.diag(S)))
    assert np.max(np.abs(corr - np.eye(NB))) < 0.6, corr


def test_implicit_H_matches_fd_at_many_columns(prob):
    """get_H over NB=5 θ-columns: the exact-preconditioner implicit-diff
    estimator and the FD stencil must agree (the nθ>2 column machinery —
    the reference's pmap_over=:jac axis, src/muse.jl:326-333)."""
    th = jnp.zeros(NB)
    kw = dict(key=jax.random.PRNGKey(2), nsims=4, grad_z_atol=1e-6)
    H_fd = np.asarray(get_H(MuseResult(), prob, th, step=1e-3, **kw).H)
    H_im = np.asarray(get_H(
        MuseResult(), prob, th, implicit_diff=True,
        implicit_fit_atol=1e-6,
        implicit_diff_precond=prob.suggested_h_precond, **kw).H)
    assert H_fd.shape == (NB, NB) and H_im.shape == (NB, NB)
    scale = np.max(np.abs(H_fd))
    np.testing.assert_allclose(H_im, H_fd, atol=3e-2 * scale)


def test_get_J_vector_theta(prob):
    res = get_J(MuseResult(), prob, jnp.zeros(NB), nsims=8,
                key=jax.random.PRNGKey(4))
    J = np.asarray(res.J)
    assert J.shape == (NB, NB)
    assert np.all(np.linalg.eigvalsh(J) > 0)       # covariance: PSD
