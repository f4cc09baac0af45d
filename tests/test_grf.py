"""GRF model tests: MUSE vs the exact marginal MLE (a closed-form oracle
this Gaussian problem admits — MUSE is exact here, arXiv:2112.09354 §2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from muse_tpu import check_self_consistency, muse
from muse_tpu.models.grf import GrfConfig, grf_marginal_mle, grf_problem
from muse_tpu.ops.cg import batched_cg


def test_batched_cg_solves_spd():
    B, N = 4, 32
    key = jax.random.PRNGKey(0)
    M = jax.random.normal(key, (N, N))
    A = M @ M.T + N * jnp.eye(N)
    b = jax.random.normal(jax.random.PRNGKey(1), (B, N))
    res = batched_cg(lambda X: X @ A.T, b, tol=1e-8)
    assert bool(res.converged.all())
    np.testing.assert_allclose(np.asarray(res.x @ A.T), np.asarray(b),
                               rtol=1e-4, atol=1e-4)


@pytest.fixture(scope="module")
def prob():
    return grf_problem(n=32, solver="cg", data_key=jax.random.PRNGKey(42))


def test_grf_self_consistency(prob):
    assert check_self_consistency(prob, 0.5)


def test_spectrum_sampling_statistics():
    """Sampled fields must realize the requested power spectrum."""
    cfg = GrfConfig(n=32, gamma=2.0)
    keys = jax.random.split(jax.random.PRNGKey(3), 200)

    def spec_of(key):
        u = jax.random.normal(key, (32, 32))
        z = cfg.apply_sqrtC(u, 0.0)
        return jnp.abs(jnp.fft.rfft2(z)) ** 2 / 32 ** 2

    mean_p = np.asarray(jax.vmap(spec_of)(keys).mean(0))
    C = np.asarray(cfg.spectrum(0.0))
    mask = np.asarray(cfg.k) > 2  # skip the handful of large-scale modes
    ratio = mean_p[mask] / C[mask]
    assert abs(ratio.mean() - 1.0) < 0.05


def test_muse_matches_marginal_mle(prob):
    """θ̂ parity against the exact marginal MLE (BASELINE 1e-3-class
    target, here within the nsims MC error)."""
    mle, sigma = grf_marginal_mle(prob.x, prob.grf_config)
    res = muse(prob, 0.5, nsims=50, maxsteps=30, theta_rtol=1e-3,
               get_covariance=True, key=jax.random.PRNGKey(1))
    mc_err = 3 * sigma / np.sqrt(50) + 0.02
    assert abs(float(res.theta[0]) - mle) < mc_err
    assert abs(float(res.sigma[0]) - sigma) < 0.5 * sigma


def test_solver_paths_agree(prob):
    res_cg = muse(prob, 0.5, nsims=20, maxsteps=10, theta_rtol=1e-3,
                  grad_z_atol=1e-3, key=jax.random.PRNGKey(1))
    for sv in ("direct", "lbfgs"):
        p = grf_problem(n=32, solver=sv, x_obs=prob.x)
        r = muse(p, 0.5, nsims=20, maxsteps=10, theta_rtol=1e-3,
                 grad_z_atol=1e-3, key=jax.random.PRNGKey(1))
        assert abs(float(r.theta[0]) - float(res_cg.theta[0])) < 0.05, sv


def test_grf_tilt_vector_theta():
    prob = grf_problem(n=32, infer_tilt=True, solver="cg",
                       data_key=jax.random.PRNGKey(5))
    res = muse(prob, jnp.array([0.3, 0.1]), nsims=20, maxsteps=10,
               key=jax.random.PRNGKey(6))
    assert res.theta.shape == (2,)
    assert np.isfinite(res.theta).all()


def test_grf_tilt_matches_2d_mle_and_fisher():
    """Vector-θ exactness oracle: on the (log-amplitude, tilt) GRF the
    marginal likelihood is closed-form, so MUSE's full pipeline must land
    on the exact 2D MLE within Monte-Carlo tolerance AND its Σ must match
    the inverse Fisher matrix — including the strong (+0.94) off-diagonal
    correlation between the two spectrum parameters.  This pins the
    vector covariance assembly Σ⁻¹ = HᵀJ⁻¹H + H_prior
    (src/muse.jl:535-549) against a closed form; the funnel vector test
    only checks shapes/z-scores."""
    prob = grf_problem(n=32, sigma_noise=0.3, infer_tilt=True,
                       theta_true=jnp.array([0.2, -0.1]),
                       data_key=jax.random.PRNGKey(5))
    th_mle, Sig_f = grf_marginal_mle(np.asarray(prob.x), prob.grf_config,
                                     theta0=np.zeros(2))
    sd_f = np.sqrt(np.diag(Sig_f))
    res = muse(prob, jnp.array([0.5, 0.0]), nsims=60, maxsteps=30,
               theta_rtol=1e-4, get_covariance=True,
               key=jax.random.PRNGKey(1))
    th = np.asarray(res.theta)
    # θ̂ per component within MC error of the exact MLE
    np.testing.assert_array_less(np.abs(th - th_mle),
                                 3 * sd_f / np.sqrt(60) + 0.03)
    # Σ: diagonal widths within J's MC error band, correlation pinned
    sd = np.asarray(res.sigma)
    assert np.all(sd / sd_f > 0.6) and np.all(sd / sd_f < 1.6), (sd, sd_f)
    corr = float(res.Sigma[0, 1] / (sd[0] * sd[1]))
    corr_f = float(Sig_f[0, 1] / (sd_f[0] * sd_f[1]))
    assert abs(corr - corr_f) < 0.15, (corr, corr_f)


def test_spectral_tilt_parity_with_pixel():
    """Vector-θ through the packed-spectral representation: same data,
    same keys ⇒ same θ̂ trajectory as the pixel representation (isometry),
    now with the 2-component (amplitude, tilt) score."""
    from muse_tpu.models.grf import grf_spectral_problem

    pix = grf_problem(n=32, sigma_noise=0.3, infer_tilt=True,
                      theta_true=jnp.array([0.2, -0.1]),
                      data_key=jax.random.PRNGKey(7))
    spec = grf_spectral_problem(n=32, sigma_noise=0.3, infer_tilt=True,
                                noise="fft", x_obs=np.asarray(pix.x))
    r_p = muse(pix, jnp.array([0.5, 0.0]), nsims=20, maxsteps=8,
               theta_rtol=1e-4, key=jax.random.PRNGKey(1))
    r_s = muse(spec, jnp.array([0.5, 0.0]), nsims=20, maxsteps=8,
               theta_rtol=1e-4, key=jax.random.PRNGKey(1))
    np.testing.assert_allclose(np.asarray(r_s.theta),
                               np.asarray(r_p.theta), atol=1e-4)


def test_analytic_theta_gradient_matches_ad():
    """The ∇θ_logLike override (src/interface.jl:56-58 analog) must match
    jax.grad of log_like at the MAP (its closed form is exact-MAP)."""
    for tilt in (False, True):
        p = grf_problem(n=32, infer_tilt=tilt,
                        data_key=jax.random.PRNGKey(42))
        cfg = p.grf_config
        th = jnp.array([0.3, 0.1]) if tilt else 0.3
        x, _ = p.sample_x_z(jax.random.PRNGKey(7), th)
        # exact Wiener MAP for this x at th
        C = cfg.spectrum(th)
        uf = jnp.sqrt(C) * jnp.fft.rfft2(x) / (cfg.sigma_noise ** 2 + C)
        u = jnp.fft.irfft2(uf, s=(32, 32))
        ga = np.asarray(p.grad_theta_log_like(x, u, th))
        gad = np.asarray(jax.grad(lambda t: p.log_like(x, u, t))(th))
        np.testing.assert_allclose(ga, gad, rtol=1e-3, atol=1e-4)


def test_preconditioned_cg_matches_plain():
    """Jacobi PCG on an ill-conditioned diagonal-dominant system: same
    solution, far fewer iterations."""
    B, N = 3, 24
    d = jnp.linspace(1.0, 1000.0, N)
    M = 0.1 * jax.random.normal(jax.random.PRNGKey(2), (N, N))
    A = jnp.diag(d) + M @ M.T
    b = jax.random.normal(jax.random.PRNGKey(3), (B, N))
    diag_inv = 1.0 / jnp.diag(A)
    plain = batched_cg(lambda X: X @ A.T, b, tol=1e-6, maxiter=2000)
    pcg = batched_cg(lambda X: X @ A.T, b, tol=1e-6, maxiter=2000,
                     precond=lambda R: R * diag_inv)
    np.testing.assert_allclose(np.asarray(pcg.x), np.asarray(plain.x),
                               rtol=1e-3, atol=1e-4)
    assert int(pcg.iterations.max()) < int(plain.iterations.max())


def test_high_snr_parity_with_mle():
    """Informative config (σ_noise=0.01): MUSE θ̂ and σθ must track the
    exact marginal MLE — the regression test for the CG absolute-vs-
    relative tolerance bug (σθ was 5× off before the fix)."""
    p = grf_problem(n=64, sigma_noise=0.01, solver="cg",
                    data_key=jax.random.PRNGKey(42))
    mle, sig = grf_marginal_mle(p.x, p.grf_config)
    res = muse(p, 0.2, nsims=60, maxsteps=40, theta_rtol=1e-4,
               key=jax.random.PRNGKey(1), get_covariance=True)
    assert abs(float(res.theta[0]) - mle) < 3 * sig
    assert 0.5 < float(res.sigma[0]) / sig < 2.0


def test_custom_solver_map_iterations_shape():
    """Regression (ADVICE r1): solvers reporting no per-lane 'iterations'
    (grf solver="direct") must still yield history['map_iterations'] of
    length nsims+1, not one entry per chunk."""
    p = grf_problem(n=16, solver="direct", data_key=jax.random.PRNGKey(42))
    res = muse(p, 0.5, nsims=5, maxsteps=2, key=jax.random.PRNGKey(3),
               max_batch=3)
    it = np.asarray(res.history[0]["map_iterations"])
    assert it.shape == (6,)


def test_cg_solver_matches_direct_wiener():
    """The fused spectral CG initialization (ops/cg.py r0/z0/b_norm fast
    path) must land on the same MAP as the closed-form Wiener solve."""
    import jax.numpy as jnp
    from muse_tpu.solver.compiled import CompiledProblem
    from muse_tpu.theta import ThetaSpec

    spec = ThetaSpec.from_example(0.0)
    th0 = spec.flatten(0.2)
    comps = {}
    for sv in ("cg", "direct"):
        p = grf_problem(n=32, solver=sv, data_key=jax.random.PRNGKey(3))
        comps[sv] = CompiledProblem(p, spec, th0)
    th = jnp.asarray(th0, jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(11), 5)
    xs, _ = jax.jit(comps["cg"]._sample_batch)(keys, th)
    Z0 = jnp.zeros((5, comps["cg"].nz), jnp.float32)
    atol = jnp.asarray(1e-3, jnp.float32)
    Zc, auxc = jax.jit(comps["cg"]._solve_maps)(xs, Z0, th, atol)
    Zd, _ = jax.jit(comps["direct"]._solve_maps)(xs, Z0, th, atol)
    assert bool(auxc["converged"].all())
    np.testing.assert_allclose(np.asarray(Zc), np.asarray(Zd),
                               atol=2e-3)


def test_grf_suggested_h_precond_is_exact_inverse():
    """The whitened-GRF z-Hessian is exactly I + C/σ² (Fourier-diagonal),
    so the model's suggested_h_precond must leave implicit-diff get_H
    unchanged while collapsing the per-column CG residuals to roundoff
    (the Pl hook, src/muse.jl:312)."""
    from muse_tpu import MuseResult, get_H

    prob = grf_problem(n=16, data_key=jax.random.PRNGKey(3))
    key = jax.random.PRNGKey(5)
    r1, r2 = MuseResult(), MuseResult()
    get_H(r1, prob, 0.2, key=key, nsims=4, implicit_diff=True)
    get_H(r2, prob, 0.2, key=key, nsims=4, implicit_diff=True,
          implicit_diff_precond=prob.suggested_h_precond)
    np.testing.assert_allclose(r2.H, r1.H, rtol=1e-3)
    resid = np.max(np.asarray(r2.metadata["implicit_diff_cg_resid"]))
    assert resid < 1e-4


def test_shared_config_not_mutated_by_fft_mode_resolution():
    """grf_problem must not switch a caller-shared GrfConfig's transform
    implementation out from under an earlier problem built from it (the
    closures capture the config object)."""
    cfg = GrfConfig(n=16)
    p1 = grf_problem(cfg)                       # resolves to "fft"
    assert cfg.fft_mode == "fft"
    p2 = grf_problem(cfg, fft_mode="matmul")    # must copy, not mutate
    assert cfg.fft_mode == "fft" and cfg._dft_plan is None
    # both problems sample identically (einsum DFT == backend fft)
    x1, _ = jax.jit(p1.sample_x_z)(jax.random.PRNGKey(0), 0.3)
    x2, _ = jax.jit(p2.sample_x_z)(jax.random.PRNGKey(0), 0.3)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), atol=1e-4)


# ------------------------------------------------------------------ #
# packed-spectral representation (grf_spectral_problem)
# ------------------------------------------------------------------ #

def test_spectral_representation_matches_pixel_end_to_end():
    """grf_spectral_problem carries x and z in packed-Fourier coordinates
    (an isometry), so the FULL muse pipeline must land on the pixel
    representation's θ̂ ± σ — same data, same keys, different basis.  The
    observed agreement is ~1e-8 (the two programs differ only by one f32
    FFT round-trip in the sampler)."""
    from muse_tpu.models.grf import grf_spectral_problem

    pix = grf_problem(n=32, sigma_noise=0.3, data_key=jax.random.PRNGKey(7))
    spec = grf_spectral_problem(n=32, sigma_noise=0.3, noise="fft",
                                x_obs=np.asarray(pix.x))
    np.testing.assert_allclose(spec.x_real, np.asarray(pix.x), atol=1e-5)
    r_p = muse(pix, 0.5, nsims=30, get_covariance=True, theta_rtol=1e-4,
               key=jax.random.PRNGKey(1))
    r_s = muse(spec, 0.5, nsims=30, get_covariance=True, theta_rtol=1e-4,
               key=jax.random.PRNGKey(1))
    np.testing.assert_allclose(np.atleast_1d(r_s.theta),
                               np.atleast_1d(r_p.theta), atol=1e-5)
    np.testing.assert_allclose(np.atleast_1d(r_s.sigma),
                               np.atleast_1d(r_p.sigma), rtol=1e-3)


def test_spectral_sampling_and_density_equivalence():
    """The spectral sampler is the pixel sampler seen through the packing
    (same keys ⇒ same draw up to one FFT round-trip), and log_like is
    Parseval-exact on converted (x, z) pairs."""
    from muse_tpu.models.grf import grf_spectral_problem

    pix = grf_problem(n=32, sigma_noise=0.3)
    spec = grf_spectral_problem(n=32, sigma_noise=0.3, noise="fft",
                                x_obs=np.asarray(pix.x))
    key = jax.random.PRNGKey(3)
    x_pix, u_pix = jax.jit(pix.sample_x_z)(key, 0.2)
    x_s, u_s = jax.jit(spec.sample_x_z)(key, 0.2)
    scale = float(jnp.abs(x_s).max())
    np.testing.assert_allclose(np.asarray(x_s),
                               np.asarray(spec.pack_field(x_pix)),
                               atol=3e-6 * scale)
    np.testing.assert_allclose(np.asarray(u_s),
                               np.asarray(spec.pack_field(u_pix)),
                               atol=3e-6)
    ll_p = float(pix.log_like(x_pix, u_pix, 0.2))
    ll_s = float(spec.log_like(spec.pack_field(x_pix),
                               spec.pack_field(u_pix), 0.2))
    assert abs(ll_p - ll_s) / abs(ll_p) < 1e-5


def test_spectral_self_consistency_and_analytic_grad():
    from muse_tpu.models.grf import grf_spectral_problem

    spec = grf_spectral_problem(n=16, sigma_noise=0.5,
                                data_key=jax.random.PRNGKey(5))
    assert check_self_consistency(spec, 0.3)
    # analytic packed score vs AD at the exact MAP (solver="direct" form)
    x = spec.x
    C2 = jnp.tile(spec.grf_config.spectrum(0.3).reshape(-1), 2)
    u_map = jnp.sqrt(C2) * x / (spec.grf_config.sigma_noise ** 2 + C2)
    g_an = spec.grad_theta_log_like(x, u_map, 0.3)
    g_ad = jax.grad(lambda t: spec.log_like(x, u_map, t))(0.3)
    np.testing.assert_allclose(np.atleast_1d(g_an), np.atleast_1d(g_ad),
                               rtol=2e-4)


@pytest.mark.parametrize("noise,nfft", [("marginal", 0), ("direct", 0),
                                        ("fft", 2)])
def test_spectral_muse_step_fft_count(noise, nfft):
    """The raison d'être: the compiled muse step in the spectral
    representation contains exactly 0 fft ops with the indexed hermitian
    noise (default) and exactly 2 with the FFT-CRN sampler — solve,
    score, and state are elementwise (vs 5 fft ops for the pixel
    representation, 9 in round 2)."""
    import re
    from muse_tpu.models.grf import grf_spectral_problem
    from muse_tpu.solver.compiled import CompiledProblem
    from muse_tpu.theta import ThetaSpec

    prob = grf_spectral_problem(n=16, sigma_noise=0.1, noise=noise)
    spec = ThetaSpec.from_example(0.0)
    comp = CompiledProblem(prob, spec, spec.flatten(0.0))
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    th = jnp.asarray(spec.flatten(0.0), jnp.float32)
    Z = jnp.zeros((3, comp.nz), jnp.float32)
    hlo = comp.muse_step.lower(th, th, keys, Z, jnp.arange(3),
                               jnp.float32(1e-3)).compile().as_text()
    assert len(re.findall(r"fft_type=", hlo)) == nfft


@pytest.mark.parametrize("n", [16, 17])
def test_spectral_direct_noise_is_hermitian_consistent(n):
    """The indexed hermitian noise must land EXACTLY on the consistent
    subspace: unpack (irfft2, which drops any inconsistent component)
    followed by re-packing must reproduce the draw bit-near-exactly, for
    even and odd n (different self-conjugate mode sets)."""
    from muse_tpu.models.grf import grf_spectral_problem

    prob = grf_spectral_problem(n=n, sigma_noise=0.5, noise="direct",
                                data_key=jax.random.PRNGKey(1))
    xt, ut = jax.jit(prob.sample_x_z)(jax.random.PRNGKey(9), 0.2)
    for vt in (xt, ut):
        rt = prob.pack_field(jnp.asarray(prob.unpack_field(vt),
                                         jnp.float32))
        np.testing.assert_allclose(np.asarray(rt), np.asarray(vt),
                                   atol=5e-6 * float(jnp.abs(vt).max()))


def test_spectral_direct_noise_is_white():
    """Unpacked to pixels, the indexed noise must be iid N(0,1): unit
    variance, zero mean, and no spatial autocorrelation — the same field
    statistics rfft2-based sampling produces."""
    from muse_tpu.models.grf import grf_spectral_problem

    n = 16
    prob = grf_spectral_problem(n=n, sigma_noise=1.0, noise="direct",
                                data_key=jax.random.PRNGKey(1))
    keys = jax.random.split(jax.random.PRNGKey(3), 400)
    _, uts = jax.vmap(lambda k: prob.sample_x_z(k, 0.0))(keys)
    U = np.stack([prob.unpack_field(ut) for ut in np.asarray(uts)])
    assert abs(U.mean()) < 0.01
    np.testing.assert_allclose(U.var(), 1.0, rtol=0.02)
    # per-pixel variance uniform (the masks must not over/under-weight
    # any mode family)
    np.testing.assert_allclose(U.var(axis=0).mean(axis=0),
                               np.ones(n), rtol=0.15)
    # no spatial autocorrelation at lag 1 (both axes)
    assert abs((U * np.roll(U, 1, axis=1)).mean()) < 0.02
    assert abs((U * np.roll(U, 1, axis=2)).mean()) < 0.02


def test_spectral_direct_noise_end_to_end():
    """Full pipeline with the FFT-free sampler: θ̂ must agree with the
    exact marginal MLE of ITS data within Monte-Carlo tolerance, and σ
    with the Fisher width."""
    from muse_tpu.models.grf import grf_spectral_problem

    prob = grf_spectral_problem(n=32, sigma_noise=0.3, noise="direct",
                                data_key=jax.random.PRNGKey(21))
    res = muse(prob, 0.5, nsims=60, get_covariance=True, theta_rtol=1e-4,
               key=jax.random.PRNGKey(1))
    mle, fsig = grf_marginal_mle(prob.x_real, prob.grf_config)
    th = float(np.atleast_1d(res.theta)[0])
    sg = float(np.atleast_1d(res.sigma)[0])
    assert abs(th - mle) < 3 * fsig / np.sqrt(60)
    assert 0.8 < sg / fsig < 1.25


def test_spectral_h_precond_and_implicit_H_match_pixel():
    from muse_tpu import MuseResult, get_H
    from muse_tpu.models.grf import grf_spectral_problem

    pix = grf_problem(n=16, sigma_noise=0.5, data_key=jax.random.PRNGKey(3))
    spec = grf_spectral_problem(n=16, sigma_noise=0.5, noise="fft",
                                x_obs=np.asarray(pix.x))
    key = jax.random.PRNGKey(5)
    r_p, r_s = MuseResult(), MuseResult()
    get_H(r_p, pix, 0.2, key=key, nsims=4, implicit_diff=True,
          implicit_diff_precond=pix.suggested_h_precond)
    get_H(r_s, spec, 0.2, key=key, nsims=4, implicit_diff=True,
          implicit_diff_precond=spec.suggested_h_precond)
    np.testing.assert_allclose(r_s.H, r_p.H, rtol=1e-3)
    assert np.max(np.asarray(
        r_s.metadata["implicit_diff_cg_resid"])) < 1e-4


# ------------------------------------------------------------------ #
# marginal-x / conditional-u sampling (noise="marginal", the default)
# ------------------------------------------------------------------ #

def test_spectral_marginal_noise_joint_moments():
    """noise="marginal" must realize the SAME joint (x, u) law as the
    conventional factorization: per packed coordinate Var(x̃) = C+σ²,
    Var(ũ) = 1, Cov(x̃, ũ) = √C — checked against 4000 draws."""
    from muse_tpu.models.grf import grf_spectral_problem

    n, s = 16, 0.5
    prob = grf_spectral_problem(n=n, sigma_noise=s,
                                data_key=jax.random.PRNGKey(1))
    C2 = jnp.tile(prob.grf_config.spectrum(0.0).reshape(-1), 2)
    keys = jax.random.split(jax.random.PRNGKey(3), 4000)
    xs, us = jax.vmap(lambda k: prob.sample_x_z(k, 0.0))(keys)
    xs, us, C2 = np.asarray(xs), np.asarray(us), np.asarray(C2)
    # per-coordinate variance factor of the packed white draw: 1 for
    # generic modes, 1/2 for each member of a hermitian-duplicate pair
    # (the self-mirrored columns), 0 for self-conjugate imaginary parts
    from muse_tpu.models.grf import _herm_white_coeffs
    a, b, c, d = (np.asarray(v, np.float64)
                  for v in _herm_white_coeffs(n))
    v = np.concatenate([(a ** 2 + b ** 2).ravel(),
                        (c ** 2 + d ** 2).ravel()])
    # aggregate over coordinates (per-coordinate MC error ~1.6%)
    np.testing.assert_allclose(xs.var(0).sum(),
                               (v * (C2 + s ** 2)).sum(), rtol=0.05)
    np.testing.assert_allclose(us.var(0).sum(), v.sum(), rtol=0.05)
    np.testing.assert_allclose((xs * us).mean(0).sum(),
                               (v * np.sqrt(C2)).sum(), rtol=0.05)
    # u is still exactly hermitian-consistent and white in pixel space
    U = np.stack([prob.unpack_field(u) for u in us[:300]])
    np.testing.assert_allclose(U.var(), 1.0, rtol=0.03)
    assert abs((U * np.roll(U, 1, axis=1)).mean()) < 0.02


def test_spectral_marginal_end_to_end():
    """Full pipeline with the marginal sampler: θ̂ within MC error of the
    exact marginal MLE of ITS data, σ within Fisher tolerance — the
    estimator is a functional of x alone, so the factorization change
    must be invisible."""
    from muse_tpu.models.grf import grf_spectral_problem

    prob = grf_spectral_problem(n=32, sigma_noise=0.3,
                                data_key=jax.random.PRNGKey(21))
    res = muse(prob, 0.5, nsims=60, get_covariance=True, theta_rtol=1e-4,
               key=jax.random.PRNGKey(1))
    mle, fsig = grf_marginal_mle(prob.x_real, prob.grf_config)
    th = float(np.atleast_1d(res.theta)[0])
    sg = float(np.atleast_1d(res.sigma)[0])
    assert abs(th - mle) < 3 * fsig / np.sqrt(60)
    assert 0.8 < sg / fsig < 1.25


# --------------------------------------------------------------------- #
# CRN white-noise hoisting (problem.sample_white/x_of_white; no
# reference analog — src/muse.jl:169-170 re-runs each sim's full
# sampler every outer iteration, here the θ-independent draws are
# lifted out of the loop)
# --------------------------------------------------------------------- #


def test_white_split_hoisted_muse_matches_keyed(prob):
    """muse_fit's default white-hoisted iteration (muse_step_white) must
    reproduce the keyed path: identical CRN draws by the problem.py
    contract, so θ̂ and the per-iteration history must agree to
    program-roundoff."""
    kw = dict(nsims=12, maxsteps=8, theta_rtol=1e-3, grad_z_atol=1e-3,
              key=jax.random.PRNGKey(7))
    r_hoist = muse(prob, 0.5, hoist_sampling=True, **kw)
    r_keyed = muse(prob, 0.5, hoist_sampling=False, **kw)
    assert len(r_hoist.history) == len(r_keyed.history)
    # the two jit programs fuse differently, so float32 MAP trajectories
    # agree only to iterated roundoff (measured ~4e-6 absolute on θ)
    np.testing.assert_allclose(np.asarray(r_hoist.theta),
                               np.asarray(r_keyed.theta),
                               rtol=1e-3, atol=1e-4)
    for h1, h2 in zip(r_hoist.history, r_keyed.history):
        np.testing.assert_allclose(np.asarray(h1["g_post_t"]),
                                   np.asarray(h2["g_post_t"]),
                                   rtol=1e-2, atol=1e-3)


def test_white_split_hoisted_spectral_all_noise_modes():
    """Every spectral-GRF noise mode declares the split; hoisted ≡ keyed
    on the whole fit for each."""
    from muse_tpu.models.grf import grf_spectral_problem

    for noise in ("marginal", "direct", "fft"):
        p = grf_spectral_problem(n=16, noise=noise,
                                 data_key=jax.random.PRNGKey(3))
        kw = dict(nsims=8, maxsteps=5, theta_rtol=1e-3,
                  key=jax.random.PRNGKey(2))
        th1 = muse(p, 0.4, hoist_sampling=True, **kw).theta
        th2 = muse(p, 0.4, hoist_sampling=False, **kw).theta
        np.testing.assert_allclose(np.asarray(th1), np.asarray(th2),
                                   rtol=1e-5, atol=1e-6, err_msg=noise)


def test_white_split_contract_checked():
    """check_self_consistency must (a) verify the hoisting identity
    sample_x_z(key,θ) == x_of_white(sample_white(key),θ) and reject a
    problem whose split disagrees with its sampler, and (b) reject a
    half-declared pair."""
    from muse_tpu.adapters.simple import SimpleMuseProblem
    from muse_tpu.distributions import Normal

    def sample_x_z(key, theta):
        k1, k2 = jax.random.split(key)
        z = jax.random.normal(k1, (8,))
        x = theta * z + jax.random.normal(k2, (8,))
        return x, z

    def sample_white(key):
        k1, k2 = jax.random.split(key)
        return jax.random.normal(k1, (8,)), jax.random.normal(k2, (8,))

    def log_like(x, z, theta):
        return (jnp.sum(Normal(theta * z, 1.0).log_prob(x))
                + jnp.sum(Normal(0.0, 1.0).log_prob(z)))

    x0 = sample_x_z(jax.random.PRNGKey(0), 0.7)[0]

    def mk(x_of_white=None, sample_white_fn=None):
        return SimpleMuseProblem(
            x0, sample_x_z, log_like, lambda th: 0.0,
            sample_white=sample_white_fn, x_of_white=x_of_white)

    # consistent split passes
    good = mk(lambda W, th: (th * W[0] + W[1], W[0]), sample_white)
    assert check_self_consistency(good, 0.7)

    # wrong completion (swapped whites) must fail with the contract name
    bad = mk(lambda W, th: (th * W[1] + W[0], W[1]), sample_white)
    with pytest.raises(AssertionError, match="white-split"):
        check_self_consistency(bad, 0.7)

    # half-declared pair must fail
    half = mk(None, sample_white)
    with pytest.raises(AssertionError, match="declared together"):
        check_self_consistency(half, 0.7)
