"""Frequentist calibration of the headline output θ̂ ± σθ.

The reference's only accuracy oracle is ONE realization's z-score bound
(θ̂/σ < 2, test/runtests.jl:31).  These tests run the full pipeline
(muse_fit + get_J + get_H) over ~20 independent data realizations per
model and check the two properties MUSE is defined by
(arXiv:2112.09354 §2):

  * unbiasedness: mean(θ̂ − θ_true) consistent with 0 at the MC level —
    the "U" in MUSE;
  * σθ calibration: z = (θ̂ − θ_true)/σθ is ~N(0,1) across realizations —
    ≈95% within 1.96, and the empirical std(z) near 1 (a σθ wrong by 2×
    fails both).

Statistics of the bounds: with R ≈ 20 draws and true coverage 0.95,
P(>4 misses) ≈ 0.3%; √R·mean(z) ~ N(0,1) so |·| < 3 is a 3σ test;
std(z) has SE ≈ 1/√(2R) ≈ 0.16, so [0.45, 1.75] is ≳4σ generous while
still catching a 2× σθ error.  Each realization re-jits (x_obs is a
compile-time constant), so shapes are kept small.
"""

import jax
import numpy as np
import pytest

from muse_tpu import muse
from muse_tpu.models import funnel_problem
from muse_tpu.models.grf import grf_problem


def _check_calibration(zs, max_miss=4):
    zs = np.asarray(zs)
    R = len(zs)
    misses = int((np.abs(zs) > 1.96).sum())
    assert misses <= max_miss, (
        f"coverage failure: {misses}/{R} realizations outside ±1.96σ "
        f"(zs={np.round(zs, 2)})")
    assert abs(zs.mean()) * np.sqrt(R) < 3.0, (
        f"bias: mean z = {zs.mean():.3f} over {R} realizations "
        f"(√R·mean = {zs.mean() * np.sqrt(R):.2f})")
    assert 0.45 < zs.std(ddof=1) < 1.75, (
        f"σθ miscalibrated: std(z) = {zs.std(ddof=1):.3f}")


def test_funnel_coverage_and_unbiasedness():
    """128-dim scalar funnel, 20 seeded realizations, θ_true = 0."""
    zs = []
    for i in range(20):
        prob = funnel_problem(128, theta_true=0.0,
                              data_key=jax.random.PRNGKey(1000 + i))
        res = muse(prob, 0.3, nsims=24, theta_rtol=3e-2,
                   get_covariance=True,
                   key=jax.random.fold_in(jax.random.PRNGKey(7), i))
        zs.append(float(res.theta[0] / res.sigma[0]))
    _check_calibration(zs)


def test_lensing_coverage_and_unbiasedness():
    """16² lensing (the nonlinear flagship family), 10 seeded
    realizations, full pipeline: VarPro MAP solves, Broyden H⁻¹ (the
    fit path the flagship demo uses), implicit-diff H with the model
    preconditioner.  Extends the single-realization flagship evidence
    (BENCHMARKS.md 256²/512² rows) with a frequentist coverage check."""
    from muse_tpu import MuseResult, get_H, get_J
    from muse_tpu.solver.muse import muse_fit
    from muse_tpu.models.lensing import lensing_problem

    zs = []
    for i in range(10):
        prob = lensing_problem(16, theta_true=0.0,
                               data_key=jax.random.PRNGKey(3000 + i))
        key = jax.random.fold_in(jax.random.PRNGKey(9), i)
        res = MuseResult()
        muse_fit(res, prob, 0.3, nsims=16, theta_rtol=3e-2,
                 Hinv_update="broyden", key=key)
        get_J(res, prob, nsims=16, key=key)
        # 8 H-sims, not 4: with H from 4 sims the z statistic is t₄-ish
        # (std ≈ 1.4, heavy tails) and the std(z) gate below flakes on
        # kernel-level trajectory changes (measured: one realization's H
        # moved 138→108→79 across 4-sim estimates while θ̂ was identical
        # to 4 decimals; at 8 sims its z settled from -4.97 to -2.82).
        get_H(res, prob, nsims=8, implicit_diff=True,
              implicit_diff_precond=prob.suggested_h_precond, key=key)
        zs.append(float(res.theta[0] / res.sigma[0]))
    # R=10: P(>3 misses at true 95% coverage) ≈ 0.1%
    _check_calibration(zs, max_miss=3)


def test_grf_vector_theta_mahalanobis_calibration():
    """16² GRF with θ = (log-amplitude, tilt) — the two components are
    ~+0.94 correlated, so scalar z-scores alone cannot validate Σ's
    off-diagonal.  Checks the Mahalanobis statistic
    m² = (θ̂−θ)ᵀΣ⁻¹(θ̂−θ) ~ χ²₂ across 10 realizations (95% quantile
    5.99) plus per-component unbiasedness.  No reference analog: the
    reference never tests vector-θ covariance calibration."""
    from muse_tpu import MuseResult, get_H, get_J
    from muse_tpu.solver.muse import muse_fit

    th_true = np.array([0.0, 0.0])
    m2s, comp_zs = [], []
    for i in range(10):
        prob = grf_problem(n=16, sigma_noise=0.3, infer_tilt=True,
                           theta_true=jax.numpy.asarray(th_true),
                           data_key=jax.random.PRNGKey(4000 + i))
        key = jax.random.fold_in(jax.random.PRNGKey(11), i)
        res = MuseResult()
        # Hinv_update="sims" (default): the Broyden replay drifts on
        # correlated vector θ (the guarded non-ND case, solver/muse.py)
        # — under the round-4 two-consecutive-steps stop one realization
        # ran long enough for the drift to walk θ into score-variance
        # collapse at iteration 18 (loudly, via the zero-variance
        # RuntimeError). Broyden stays exercised by the funnel and
        # 16² lensing coverage tests, where it is the shipped choice.
        muse_fit(res, prob, jax.numpy.array([0.3, 0.1]), nsims=24,
                 theta_rtol=3e-2, key=key)
        get_J(res, prob, nsims=24, key=key)
        get_H(res, prob, nsims=6, implicit_diff=True,
              implicit_diff_precond=prob.suggested_h_precond, key=key)
        d = np.asarray(res.theta) - th_true
        m2s.append(float(d @ np.linalg.solve(np.asarray(res.Sigma), d)))
        comp_zs.extend(d / np.asarray(res.sigma))
    m2s = np.asarray(m2s)
    # χ²₂ coverage: P(>3 misses of the 95% quantile in 10 draws) ≈ 0.2%
    assert int((m2s > 5.99).sum()) <= 3, m2s.round(2)
    # E[m²] = 2 for χ²₂ (SE = 2/√10): a Σ wrong by 2× in the correlated
    # direction shifts this far outside [0.4, 5.0]
    assert 0.4 < m2s.mean() < 5.0, m2s.round(2)
    comp_zs = np.asarray(comp_zs)
    assert abs(comp_zs.mean()) * np.sqrt(len(comp_zs)) < 3.5, comp_zs


def test_grf_coverage_and_unbiasedness():
    """32² GRF amplitude, 14 seeded realizations, full pipeline with the
    implicit-diff H + exact Fourier preconditioner."""
    from muse_tpu import MuseResult, get_H, get_J
    from muse_tpu.solver.muse import muse_fit

    zs = []
    for i in range(14):
        prob = grf_problem(n=32, theta_true=0.0,
                           data_key=jax.random.PRNGKey(2000 + i))
        key = jax.random.fold_in(jax.random.PRNGKey(8), i)
        res = MuseResult()
        muse_fit(res, prob, 0.3, nsims=24, theta_rtol=3e-2, key=key)
        get_J(res, prob, nsims=24, key=key)
        get_H(res, prob, nsims=4, implicit_diff=True,
              implicit_diff_precond=prob.suggested_h_precond, key=key)
        zs.append(float(res.theta[0] / res.sigma[0]))
    _check_calibration(zs, max_miss=3)


def test_bandpower_mahalanobis_calibration():
    """32² bandpower model, nbands=6: the Mahalanobis statistic
    m² = (θ̂−θ)ᵀΣ̂⁻¹(θ̂−θ) across 10 data realizations — validates the
    FULL nbands×nbands Σ of the many-band vector-θ pipeline, which the
    decoupled-MLE oracle (tests/test_bandpower.py) pins only at one
    realization.  Because Σ̂ is itself estimated from nsims=48 sims, m²
    is Hotelling-T²-like rather than exact χ²₆: the 95% quantile scales
    to ≈ (ν−1)p/(ν−p) · F₀.₉₅(p, ν−p) ≈ 15.6 at p=6, ν=48 (measured
    across these seeds: mean 6.36, zero misses; at nsims=24 the same
    seeds show mean 9.6 — the inflation is real, not a Σ bug, confirmed
    by the exact-Fisher m² of the analytic MLE on the same data: mean
    6.47).  Each realization's θ̂ is additionally pinned to the exact
    decoupled marginal MLE within 0.8 of the per-band Fisher σ (measured
    max 0.36).  No reference analog (the reference's only accuracy
    oracle is one scalar z-score, test/runtests.jl:31)."""
    from muse_tpu import MuseResult, get_H, get_J
    from muse_tpu.models.bandpower import bandpower_mle, bandpower_problem
    from muse_tpu.solver.muse import muse_fit

    NB = 6
    m2s = []
    for i in range(10):
        # 32²/σ=0.05 (test_bandpower.py's healthy config): at 16² the top
        # annuli hold too few modes and per-band scores go pathological.
        prob = bandpower_problem(n=32, nbands=NB, sigma_noise=0.05,
                                 data_key=jax.random.PRNGKey(6000 + i))
        key = jax.random.fold_in(jax.random.PRNGKey(13), i)
        res = MuseResult()
        # Hinv_update="sims" (the default): Broyden replay drifts on
        # many-band vector θ (the guarded non-ND case, solver/muse.py:419)
        # badly enough here to push a band into score-variance collapse.
        muse_fit(res, prob, jax.numpy.zeros(NB) + 0.2, nsims=48,
                 theta_rtol=1e-2, key=key)
        get_J(res, prob, nsims=48, key=key)
        get_H(res, prob, nsims=6, implicit_diff=True,
              implicit_diff_precond=prob.suggested_h_precond, key=key)
        d = np.asarray(res.theta)
        m2s.append(float(d @ np.linalg.solve(np.asarray(res.Sigma), d)))
        th_mle, Sig_f = bandpower_mle(np.asarray(prob.x_real), 32, NB,
                                      sigma_noise=0.05)
        dev = np.abs(d - th_mle) / np.sqrt(np.diag(Sig_f))
        assert dev.max() < 0.8, (i, dev.round(3))
    m2s = np.asarray(m2s)
    # P(>3 misses of the 95% quantile in 10 draws) ≈ 0.1%
    assert int((m2s > 15.6).sum()) <= 3, m2s.round(2)
    # E[m²] ≈ 6·(ν−1)/(ν−p−1) ≈ 6.9, SE ≈ 1.2: [3.0, 10.5] is ≈3σ
    # generous yet catches a 2×-too-small Σ (mean → ~13) and, jointly
    # with the MLE pin above, a 2×-too-large one.
    assert 3.0 < m2s.mean() < 10.5, m2s.round(2)
