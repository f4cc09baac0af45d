"""CMB-lensing-style model — the nonlinear large-field benchmark config.

BASELINE.md config 5 ("CMB-lensing-style 1024² field, sims sharded across
the mesh"): the problem family the MUSE paper was built for
(arXiv:2112.09354 §5): infer the lensing-potential amplitude A_φ from
observed lensed maps, marginalizing over BOTH the unlensed field AND the
potential — a ~2n²-dimensional latent with a genuinely nonlinear
observation (coordinate remapping), so the latent MAP is real L-BFGS work,
not a linear solve.

Model (whitened latents, periodic sky):
  u_z, u_φ ~ N(0, I_{n²})                      (white)
  z = S_z u_z,  φ = A_φ^{1/2}·S_φ u_φ          (GRF spectra via FFT)
  d = ∇φ                                        (Fourier ik)
  x = Lens(z, d) + σ n,   Lens = 2nd-order Taylor remap p ↦ p + d(p)
  θ = log A_φ (optionally + log A_z)

TPU notes: the Taylor remap is FFT-derivative products — smooth in both
field and deflection (a bilinear gather warp is also provided, but its
displacement-gradient is discontinuous at pixel boundaries, which stalls
quasi-Newton MAP solvers — measured: L-BFGS plateaued at |g|≈4 for 1600
iterations under bilinear, converges under Taylor).  Latents stay
whitened so the MAP Hessian is I + O(signal²/σ²).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..adapters.simple import SimpleMuseProblem
from .grf import GrfConfig

__all__ = ["lensing_problem", "bilinear_warp", "gradient_field", "taylor_lens"]


def bilinear_warp(field: jnp.ndarray, dx: jnp.ndarray,
                  dy: jnp.ndarray) -> jnp.ndarray:
    """Sample ``field`` at (i+dy, j+dx) with periodic wrap (bilinear).

    Differentiable in both the field (linear gather) and the
    displacements (piecewise-linear blend weights).
    """
    n, m = field.shape
    ii = jnp.arange(n)[:, None] + dy
    jj = jnp.arange(m)[None, :] + dx
    i0 = jnp.floor(ii)
    j0 = jnp.floor(jj)
    fi = ii - i0
    fj = jj - j0
    i0 = i0.astype(jnp.int32) % n
    j0 = j0.astype(jnp.int32) % m
    i1 = (i0 + 1) % n
    j1 = (j0 + 1) % m
    f00 = field[i0, j0]
    f01 = field[i0, j1]
    f10 = field[i1, j0]
    f11 = field[i1, j1]
    return ((1 - fi) * (1 - fj) * f00 + (1 - fi) * fj * f01
            + fi * (1 - fj) * f10 + fi * fj * f11)


def gradient_field(phi: jnp.ndarray) -> tuple:
    """(∂φ/∂x, ∂φ/∂y) via Fourier ik on the periodic grid."""
    n = phi.shape[0]
    ky = jnp.fft.fftfreq(n)[:, None] * 2 * jnp.pi
    kx = jnp.fft.rfftfreq(n)[None, :] * 2 * jnp.pi
    pf = jnp.fft.rfft2(phi)
    dphix = jnp.fft.irfft2(1j * kx * pf, s=(n, n))
    dphiy = jnp.fft.irfft2(1j * ky * pf, s=(n, n))
    return dphix, dphiy


def taylor_lens(z: jnp.ndarray, dx: jnp.ndarray, dy: jnp.ndarray):
    """2nd-order Taylor remap z(p + d) ≈ z + d·∇z + ½ dᵀ(∇∇z)d.

    The standard small-deflection expansion in CMB lensing.  Unlike
    bilinear warping (whose displacement-gradient is discontinuous at
    pixel boundaries — it stalls quasi-Newton MAP solvers), this operator
    is C^∞ in both the field and the deflection, so the latent MAP is a
    smooth optimization.  All derivatives are Fourier ik products.
    """
    n = z.shape[0]
    ky = jnp.fft.fftfreq(n)[:, None] * 2 * jnp.pi
    kx = jnp.fft.rfftfreq(n)[None, :] * 2 * jnp.pi
    zf = jnp.fft.rfft2(z)

    def ir(spec):
        return jnp.fft.irfft2(spec, s=(n, n))

    zx = ir(1j * kx * zf)
    zy = ir(1j * ky * zf)
    zxx = ir(-(kx ** 2) * zf)
    zyy = ir(-(ky ** 2) * zf)
    zxy = ir(-(kx * ky) * zf)
    return (z + dx * zx + dy * zy
            + 0.5 * (dx * dx * zxx + 2 * dx * dy * zxy + dy * dy * zyy))


def lensing_problem(n: int = 64, *, sigma_noise: float = 0.2,
                    gamma_z: float = 1.5, gamma_phi: float = 3.0,
                    defl_scale: float = 0.7, infer_z_amp: bool = False,
                    theta_true=None, data_key=None, x_obs=None,
                    prior_std: float = 3.0) -> SimpleMuseProblem:
    """Build the lensing-style MUSE problem (see module docstring).

    θ (scalar, or 2-vector with ``infer_z_amp``) is the log-amplitude of
    the lensing-potential (and optionally unlensed-field) spectrum.
    ``defl_scale`` sets the rms deflection in pixels at θ=0.
    """
    cfg_z = GrfConfig(n, sigma_noise, gamma_z, 1.0, False)
    cfg_p = GrfConfig(n, sigma_noise, gamma_phi, 1.0, False)
    s2 = sigma_noise ** 2

    # normalize the φ spectrum so rms|∇φ| = defl_scale pixels at θ=0:
    # E[|∇φ|²] = (1/n²) Σ_modes (kx²+ky²) C_φ(k) — exact, host-side
    # (init-time constant; also avoids eager device complex math, which
    # some TPU backends don't implement).
    ky = np.fft.fftfreq(n)[:, None] * 2 * np.pi
    kx = np.fft.rfftfreq(n)[None, :] * 2 * np.pi
    C0 = np.asarray(cfg_p.spectrum(0.0), np.float64)
    w = np.asarray(cfg_p.herm_weight, np.float64)
    rms0 = float(np.sqrt(np.sum(w * (kx ** 2 + ky ** 2) * C0) / n ** 2))
    phi_norm = defl_scale / max(rms0, 1e-12)

    def _amps(theta):
        th = jnp.atleast_1d(jnp.asarray(theta))
        a_phi = jnp.exp(0.5 * th[0])
        a_z = jnp.exp(0.5 * th[1]) if infer_z_amp else 1.0
        return a_phi, a_z

    def _forward(uz, uphi, theta):
        a_phi, a_z = _amps(theta)
        z = a_z * cfg_z.apply_sqrtC(uz, 0.0)
        phi = phi_norm * a_phi * cfg_p.apply_sqrtC(uphi, 0.0)
        dx, dy = gradient_field(phi)
        return taylor_lens(z, dx, dy)

    def sample_x_z(key, theta):
        k1, k2, k3 = jax.random.split(key, 3)
        uz = jax.random.normal(k1, (n, n))
        uphi = jax.random.normal(k2, (n, n))
        x = (_forward(uz, uphi, theta)
             + sigma_noise * jax.random.normal(k3, (n, n)))
        return x, {"uphi": uphi, "uz": uz}

    def log_like(x, u, theta):
        r = x - _forward(u["uz"], u["uphi"], theta)
        return -0.5 * (jnp.sum(r * r) / s2
                       + jnp.sum(u["uz"] ** 2) + jnp.sum(u["uphi"] ** 2))

    def log_prior(theta):
        th = jnp.atleast_1d(jnp.asarray(theta))
        return -jnp.sum(th ** 2) / (2 * prior_std ** 2)

    def zhat_guess(x, u, theta):
        # warm-start φ from zero but keep the z-field guess informed by
        # the data through the (identity-deflection) Wiener filter
        return jax.tree.map(jnp.zeros_like, u)

    if theta_true is None:
        theta_true = jnp.zeros((2,)) if infer_z_amp else 0.0
    if x_obs is None:
        data_key = jax.random.PRNGKey(42) if data_key is None else data_key
        # jit: eager complex arithmetic is unimplemented on some backends
        x_obs, _ = jax.jit(sample_x_z)(data_key, jnp.asarray(theta_true))

    prob = SimpleMuseProblem(x_obs, sample_x_z, log_like, log_prior,
                             zhat_guess_from_truth=zhat_guess)
    prob.lensing_n = n

    # Wiener-informed warm start for the muse loop's cold start: treat the
    # data as unlensed and invert the whitening for u_z; φ starts at 0.
    # Pass as muse(..., z0=prob.suggested_z0) — cuts the first iteration's
    # L-BFGS work substantially (later iterations warm-start anyway).
    Cz = np.asarray(cfg_z.spectrum(0.0), np.float64)
    xf = np.fft.rfft2(np.asarray(x_obs, np.float64))
    uz0 = np.fft.irfft2(np.sqrt(Cz) * xf / (Cz + s2), s=(n, n))
    prob.suggested_z0 = {"uphi": jnp.zeros((n, n), jnp.float32),
                         "uz": jnp.asarray(uz0, jnp.float32)}
    return prob
