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

from typing import Optional

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
                    prior_std: float = 3.0,
                    solver: str = "auto",
                    gn_cg_maxiter: Optional[int] = None,
                    gn_max_outer: Optional[int] = None,
                    varpro_m: Optional[int] = None,
                    varpro_explicit_adjoint: bool = True
                    ) -> SimpleMuseProblem:
    """Build the lensing-style MUSE problem (see module docstring).

    θ (scalar, or 2-vector with ``infer_z_amp``) is the log-amplitude of
    the lensing-potential (and optionally unlensed-field) spectrum.
    ``defl_scale`` sets the rms deflection in pixels at θ=0.

    ``solver`` picks the latent MAP algorithm:
      * ``"auto"`` (default) — ``"varpro"`` at every size.  Until round
        3 this routed n ≥ 1024 to Newton-CG because the compiled VarPro
        program is VALUE-CORRUPTED by XLA at specific 1024² lane counts
        (identical per-lane inputs gave ‖ẑ‖ ~ 5×10⁵ vs 80 and objective
        10¹¹ vs 5×10⁵ at batch 13/17 while 5 was exact; the hand-written
        adjoint fixes 13 but not 17, and ``fused_fft_ok(1024, 17)``
        passes — the trigger is the whole while_loop program's
        structure, invisible to structural probes).  The blanket reroute
        is now replaced by RUNTIME VALUE-INTEGRITY CERTIFICATION
        (muse_tpu/solver/certify.py, on by default for field models on
        TPU backends): every solver entry point spot-re-solves chunk
        lanes with an independently compiled B=1 program, and a failed
        verdict re-runs the chunk lane-wise and routes future chunks to
        a width that certifies — so VarPro's ~2× speed advantage is kept
        at every (model, n, width) combination that actually compiles
        correctly, and corrupted ones are detected semantically instead
        of being guessed at build time.  Pick ``max_batch`` so lanes
        land on a width measured good (see BENCHMARKS.md's 1024²
        certified-width table) to avoid paying the reroute.
      * ``"varpro"`` — batched variable projection (ops/varpro.py): the
        observation is linear in the unlensed field given the potential,
        so the field is eliminated by an exact Fourier-preconditioned
        PCG (in packed-Fourier coordinates) and a reduced L-BFGS runs
        over the potential alone (measured ~4× fewer outer iterations
        than joint L-BFGS, and a lower objective);
      * ``"newton"`` — batched trust-region Newton-CG over the joint
        latent (ops/newton_cg.py), exact HVPs;
      * ``"lbfgs"`` — the generic batched L-BFGS path (the reference's
        only solver, src/interface.jl:162-166).

    MAP iteration budgets are n-dependent: ``gn_max_outer`` defaults to
    100 below 128², **40 at n ≥ 128**, and **25 at n ≥ 512** (polish
    80 → 30 → 20 over the same tiers), bounding the lockstep device time
    one stalled lane can impose on a large-field batch.  Lanes that
    exhaust the budget FREEZE with a warning and feed the score
    unconverged (reference non-convergence semantics,
    src/interface.jl:168-171) — the warm-started next outer iteration
    normally recovers them, but at large n raise ``gn_max_outer`` (and/or
    ``gn_cg_maxiter``; VarPro's *inner* elimination-CG budget, reported
    as ``varpro_inner_cg_maxiter`` in ``solver_budgets``, also drops
    from the Newton-CG/polish value of 50 to 35 at n ≥ 512) or loosen
    ``grad_z_atol`` if the non-convergence warnings persist; explicitly
    passed budgets are always respected.
    """
    cfg_z = GrfConfig(n, sigma_noise, gamma_z, 1.0, False)
    cfg_p = GrfConfig(n, sigma_noise, gamma_phi, 1.0, False)
    s2 = sigma_noise ** 2

    # Iteration budgets scale DOWN with field size: at large n a lane
    # whose objective sits at the f32 resolution floor (|f|·ε ≈ the
    # requested gradient decrease — typical when the outer Newton loop
    # overshoots θ and residuals blow up) would otherwise burn the full
    # budget in lockstep for every lane, turning one muse_step into a
    # multi-minute device program.  Frozen-with-warning is the designed
    # behavior for such lanes (≈ reference non-convergence warnings,
    # src/interface.jl:168-171); the muse loop's warm starts recover
    # them at the next (better-damped) θ.
    if gn_max_outer is None:
        gn_max_outer = 100 if n < 128 else (40 if n < 512 else 25)
    # the small-n polish budget covers a worst-case VarPro handoff: a
    # stalled reduced-space lane can need a full trust-region grind plus
    # one tr_refresh period plus the ~20-iteration escape (measured on
    # the 32² knife-edge lane) — at small n the per-program device-time
    # bound doesn't bind, so the budget is generous; at n ≥ 128 it
    # shrinks with the same tiers as gn_max_outer (tunnel kill limit)
    polish_max_outer = 130 if n < 128 else (30 if n < 512 else 20)
    # the Armijo loop re-solves the inner problem per trial, so it
    # dominates the worst-case program length; at flagship sizes the
    # per-program ceiling is a platform constraint (the tunnel kills
    # multi-minute device programs — "TPU worker crashed"), so trials
    # and inner iterations scale down with the budget
    varpro_max_ls = 15 if n < 512 else 6
    explicit_cg = gn_cg_maxiter is not None
    if not explicit_cg:
        gn_cg_maxiter = 50             # Newton-CG inner budget default
    # VarPro's inner-CG default scales down at flagship n, but an
    # explicitly passed budget is always respected
    inner_cg_eff = gn_cg_maxiter if (explicit_cg or n < 512) else 35

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

    # fused forward: everything after the two input rffts is a pointwise
    # spectrum product, so the whole lens operator is 2 rfft2 + 2 stacked
    # irfft2 calls (vs 13 separate transforms through apply_sqrtC /
    # gradient_field / taylor_lens).  The derivative specs are split into
    # stacks of 3 and 5 so the flattened FFT batch (3B / 5B) stays ODD for
    # odd lane counts — the TPU fused-batched-FFT rule (utils/fft_check).
    kxj = jnp.asarray(kx, jnp.float32)         # (1, n//2+1), physical 2π
    kyj = jnp.asarray(ky, jnp.float32)         # (n, 1)
    sqCz = jnp.sqrt(cfg_z.spectrum(0.0))
    sqCp = jnp.sqrt(cfg_p.spectrum(0.0))

    def _lens_parts_zf(zf_u, uphi, theta):
        # variant entered from the z-spectrum directly: the VarPro linear
        # block lives in packed-Fourier coordinates, so its obs_op skips
        # the leading rfft2 (and its transpose skips the trailing one)
        a_phi, a_z = _amps(theta)
        zf = (a_z * sqCz) * zf_u
        pf = (phi_norm * a_phi * sqCp) * jnp.fft.rfft2(uphi)
        s1 = jnp.stack([zf, 1j * kxj * zf, 1j * kyj * zf])
        s_dd = jnp.stack([-(kxj ** 2) * zf, -(kyj ** 2) * zf,
                          -(kxj * kyj) * zf])
        sp = jnp.stack([1j * kxj * pf, 1j * kyj * pf,
                        jnp.zeros_like(pf)])
        z, zx, zy = jnp.fft.irfft2(s1, s=(n, n), axes=(-2, -1))
        zxx, zyy, zxy = jnp.fft.irfft2(s_dd, s=(n, n), axes=(-2, -1))
        dx, dy, _ = jnp.fft.irfft2(sp, s=(n, n), axes=(-2, -1))
        lin = dx * zx + dy * zy
        quad = dx * dx * zxx + 2 * dx * dy * zxy + dy * dy * zyy
        return z + lin + 0.5 * quad, lin, quad

    def _lens_parts(uz, uphi, theta):
        # z-derived and φ-derived lanes ride SEPARATE irfft2 calls: the
        # VarPro solver transposes this function w.r.t. the z block with
        # jax.linear_transpose, which requires products like dx·zx to be
        # constant×linear — fusing both groups into one FFT would make
        # every output lane formally linear in uz.  Stacks of 3 also keep
        # the flattened FFT batch odd for odd lane counts.
        return _lens_parts_zf(jnp.fft.rfft2(uz), uphi, theta)

    def _forward(uz, uphi, theta):
        return _lens_parts(uz, uphi, theta)[0]

    def grad_theta(x, u, theta):
        """Analytic ∂θ log_like (exact; the ∇θ_logLike override).

        d ∝ a_φ = e^{θ₀/2} ⇒ ∂F/∂θ₀ = ½(d·∇z) + ½(dᵀ∇∇z d); every term
        of F carries one factor of z ∝ a_z = e^{θ₁/2} ⇒ ∂F/∂θ₁ = F/2.
        One fused forward pass replaces AD's forward+reverse sweep."""
        F, lin, quad = _lens_parts(u["uz"], u["uphi"], theta)
        r = x - F
        g0 = jnp.sum(r * (lin + quad)) / (2 * s2)
        if not infer_z_amp:
            return g0 if jnp.ndim(theta) == 0 else jnp.array([g0])
        g1 = jnp.sum(r * F) / (2 * s2)
        return jnp.array([g0, g1])

    # CRN white split (problem.py): the latents ARE whitened fields here,
    # so every draw is θ-independent — hoisting lifts all three RNG
    # kernels out of the muse loop; only the θ-dependent lens forward
    # re-runs per iteration
    def sample_white(key):
        k1, k2, k3 = jax.random.split(key, 3)
        return (jax.random.normal(k1, (n, n)),
                jax.random.normal(k2, (n, n)),
                jax.random.normal(k3, (n, n)))

    def x_of_white(W, theta):
        uz, uphi, e = W
        x = _forward(uz, uphi, theta) + sigma_noise * e
        return x, {"uphi": uphi, "uz": uz}

    def sample_x_z(key, theta):
        return x_of_white(sample_white(key), theta)

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

    # ---- batched Gauss-Newton MAP solver (custom_zhat) ---------------- #
    # flat latent layout: ravel_pytree sorts dict keys → [uphi; uz]
    kyg = jnp.asarray(ky, jnp.float32)         # (n, 1), physical 2π units
    kxg = jnp.asarray(kx, jnp.float32)         # (1, n//2+1)
    k2_grid = kyg ** 2 + kxg ** 2              # (n, n//2+1)
    Cz0 = cfg_z.spectrum(0.0)
    Cp0 = cfg_p.spectrum(0.0)
    wh = cfg_z.herm_weight

    def _vg_full(xs, th_flat):
        """Batched value-and-grad of −logLike over flat [uφ; uz] lanes."""
        def fn(U):
            B = U.shape[0]
            u = U.reshape(B, 2, n, n)

            def one(x, up, uzz):
                r = x - _forward(uzz, up, th_flat)
                return 0.5 * (jnp.sum(r * r) / s2
                              + jnp.sum(up * up) + jnp.sum(uzz * uzz))
            f, gu = jax.vmap(jax.value_and_grad(one, argnums=(1, 2)))(
                xs, u[:, 0], u[:, 1])
            return f, jnp.stack(gu, 1).reshape(B, -1)
        return fn

    def _precond2(th_flat):
        """Fourier-diagonal approximation of (I + JᵀJ/σ²)⁻¹, per block:
          z-block: the remap is near-unitary ⇒ JᵀJ ≈ a_z²C_z
          φ-block: F ≈ z + d·∇z with d = φ_norm a_φ ∇S_φ u_φ ⇒ per mode
                   |J|² ≈ (φ_norm a_φ)² k² C_φ · E|∇z|²"""
        a_phi, a_z = _amps(th_flat)
        gz2 = (a_z ** 2) * jnp.sum(wh * k2_grid * Cz0) / n ** 2  # E|∇z|²
        Mz = 1.0 + (a_z ** 2) * Cz0 / s2
        Mp = 1.0 + (phi_norm * a_phi) ** 2 * k2_grid * Cp0 * gz2 / s2

        def precond(Rflat):
            B = Rflat.shape[0]
            R = Rflat.reshape(B, 2, n, n)
            op = jnp.fft.irfft2(
                jnp.fft.rfft2(R[:, 0], axes=(-2, -1)) / Mp,
                s=(n, n), axes=(-2, -1))
            oz = jnp.fft.irfft2(
                jnp.fft.rfft2(R[:, 1], axes=(-2, -1)) / Mz,
                s=(n, n), axes=(-2, -1))
            return jnp.stack([op, oz], 1).reshape(B, -1)
        return precond

    def zhat_newton(xs, Z0, th_flat, atol):
        from ..ops.newton_cg import batched_newton_cg
        res = batched_newton_cg(
            _vg_full(xs, th_flat), Z0, g_atol=atol,
            max_outer=gn_max_outer, cg_maxiter=gn_cg_maxiter,
            precond=_precond2(th_flat))
        aux = {"converged": res.converged, "failed": res.failed,
               "iterations": res.iterations,
               "cg_iterations": res.cg_iterations,
               "g_norm": res.g_norm, "neg_logp": res.f}
        return res.z, aux

    def zhat_varpro(xs, Z0, th_flat, atol):
        """Two-phase MAP: VarPro for the bulk, Newton-CG polish for the
        tail.  VarPro eliminates the z×φ curved valley (the observation
        is linear in the unlensed field) and converges most lanes in tens
        of reduced iterations; the few lanes that stall in the reduced
        φ-landscape at strong lensing finish with warm-started
        trust-region Newton-CG, whose local quadratic convergence is
        exactly what a near-solution iterate needs (converged lanes
        freeze at polish entry and cost nothing but the lockstep ride).

        The linear (unlensed-field) block is handed to the solver in
        PACKED-FOURIER coordinates z̃ = pack(√w/n · rfft2(u_z)) — an
        isometry (Parseval with hermitian weights), so ½‖z̃‖² is exactly
        the whitened prior and the objective is unchanged.  Payoff per
        inner-CG iteration: the obs_op skips the leading rfft2 (and its
        transpose the trailing one) since it starts from the spectrum,
        and the Fourier-diagonal preconditioner becomes a pointwise
        multiply instead of an rfft2+irfft2 round-trip — ~2× fewer
        transform passes in the solve that dominates flagship-scale
        wall-clock.  The z-block gradient tolerance is then certified in
        the spectral basis (sup over Fourier coords; both bases' sup
        norms are bounded by the same basis-invariant L2)."""
        from ..ops.newton_cg import batched_newton_cg
        from ..ops.varpro import batched_varpro
        B = Z0.shape[0]
        a_phi, a_z = _amps(th_flat)

        nr = n // 2 + 1
        sqw_n = jnp.sqrt(wh) / n          # (n, nr) isometric pack scale

        def _pack(zf):                    # (B, n, nr) complex → (B, 2·n·nr)
            zs = zf * sqw_n
            return jnp.concatenate([zs.real.reshape(B, -1),
                                    zs.imag.reshape(B, -1)], -1)

        def _herm_sym(zf):
            """Orthogonal projection onto hermitian-consistent spectra.

            The rfft2 layout's self-conjugate columns (0 and, for even
            n, the axis-1 Nyquist) store both members of each conjugate
            pair, so the packed space has ~2n redundant coordinates.
            irfft2 annihilates the inconsistent directions, but its
            exact ADJOINT (via jax.linear_transpose) does not land back
            in the consistent subspace — measured ~1% off-subspace
            energy per Gᵀ application, which accumulated in the CG
            iterates (≈3% of ‖z‖² at 16²) and silently inflated the
            ½‖z̃‖² prior, corrupting both the objective and the
            convergence certificate.  Symmetrizing here makes the
            redundant directions invisible to the whole operator chain:
            b and every Krylov vector stay consistent.  (The projection
            commutes with the column-constant √w scaling.)"""
            cols = [0] + ([nr - 1] if n % 2 == 0 else [])
            for c in cols:
                col = zf[..., :, c]
                mirror = jnp.conj(jnp.roll(col[..., ::-1], 1, axis=-1))
                zf = zf.at[..., :, c].set(0.5 * (col + mirror))
            return zf

        def _unpack(zt):                  # inverse of _pack ∘ projection
            re, im = jnp.split(zt, 2, -1)
            return _herm_sym((re + 1j * im).reshape(-1, n, nr)) / sqw_n

        def obs_op(Up, Zt):
            zf = _unpack(Zt)

            def one(u_p, zf1):
                return _lens_parts_zf(zf1, u_p.reshape(n, n), th_flat)[0]
            return jax.vmap(one)(Up, zf)

        czs = a_z * sqCz                  # (n, nr) real spectral scale

        def lin_ops(Up):
            """Explicit (G, Gᵀ) of the lens operator at fixed potential.

            Replaces jax.linearize + jax.linear_transpose in the inner
            PCG: the lens map is Σ_j D_j·irfft2(S_j·c·unpack(z̃)) with
            pixel diagonals D_j ∈ {1, dx, dy, ½dx², ½dy², dx·dy} and
            spectral diagonals S_j ∈ {1, ikx, iky, −kx², −ky², −kx·ky},
            so the exact adjoint in packed coordinates is
            pack(herm_sym(Σ_j conj(S_j)·c·rfft2(D_j·w))) — the packing
            is an isometry, making adjoint-of-irfft2 = pack∘rfft2.
            Why hand-written: provably exact (adjoint-identity and
            AD-transpose parity tests, tests/test_newton_varpro.py),
            drops the linearize/transpose machinery from the compiled
            program, and narrows the platform's 1024² batch-width
            value corruption (this module's docstring): with it width
            13 compiles correctly where the AD transpose corrupted —
            though width 17 still corrupts, so the 1024² Newton-CG
            routing stands.  Deflections are computed once per inner
            solve (the linearize hoist, written out); the zero third
            lane keeps the flattened FFT batch odd (3B) per the
            fused-batched-FFT rule (utils/fft_check)."""
            pf = (phi_norm * a_phi * sqCp) * jnp.fft.rfft2(
                Up.reshape(B, n, n), axes=(-2, -1))
            sp = jnp.stack([1j * kxj * pf, 1j * kyj * pf,
                            jnp.zeros_like(pf)], 1)
            dd = jnp.fft.irfft2(sp, s=(n, n), axes=(-2, -1))
            dx, dy = dd[:, 0], dd[:, 1]

            def G(Zt):
                zf = _unpack(Zt) * czs
                s1 = jnp.stack([zf, 1j * kxj * zf, 1j * kyj * zf], 1)
                sdd = jnp.stack([-(kxj ** 2) * zf, -(kyj ** 2) * zf,
                                 -(kxj * kyj) * zf], 1)
                a = jnp.fft.irfft2(s1, s=(n, n), axes=(-2, -1))
                b = jnp.fft.irfft2(sdd, s=(n, n), axes=(-2, -1))
                return (a[:, 0] + dx * a[:, 1] + dy * a[:, 2]
                        + 0.5 * (dx * dx * b[:, 0] + dy * dy * b[:, 1])
                        + dx * dy * b[:, 2])

            def Gt(W):
                s1 = jnp.stack([W, dx * W, dy * W], 1)
                sdd = jnp.stack([0.5 * dx * dx * W, 0.5 * dy * dy * W,
                                 dx * dy * W], 1)
                F1 = jnp.fft.rfft2(s1, axes=(-2, -1))
                F2 = jnp.fft.rfft2(sdd, axes=(-2, -1))
                zf_adj = czs * (
                    F1[:, 0] - 1j * kxj * F1[:, 1] - 1j * kyj * F1[:, 2]
                    - (kxj ** 2) * F2[:, 0] - (kyj ** 2) * F2[:, 1]
                    - (kxj * kyj) * F2[:, 2])
                return _pack(_herm_sym(zf_adj))
            return G, Gt

        # exact Fourier-diagonal preconditioner, now a pointwise multiply
        Mz_packed = jnp.tile(
            (1.0 / (1.0 + (a_z ** 2) * Cz0 / s2)).reshape(-1), 2)

        def precond_lin(R):
            return R * Mz_packed

        # z-block residual measure: the EXACT pixel-space sup-norm.  The
        # packing is an isometry, so the pixel gradient is Pᵀr =
        # irfft2(unpack(r)) — one single-lane irfft2 per CG stopping
        # check, ≈8% of a matvec's 12 transform lanes.  Cheap proxies
        # were tried and measured wrong in both directions: raw spectral
        # max-abs is ~√N too strict for smooth residuals (budget
        # exhaustion), RMS·√(2 ln N) under-certifies structured ones
        # (polish churn, one-lane non-convergence at 32²).  Exact keeps
        # the certified semantics identical to every other solver here.
        def lin_sup(R):
            r_pix = jnp.fft.irfft2(_unpack(R), s=(n, n), axes=(-2, -1))
            return jnp.max(jnp.abs(r_pix.reshape(R.shape[0], -1)), -1)

        n2 = n * n
        # m bounds the dominant memory term (2·m·B·n² floats of outer
        # L-BFGS history — at 1024², 33 lanes, m=10 is ~10 GB and OOMs a
        # 16 GB chip).  Default: full history at small n (one hard lane
        # at strong lensing measurably benefits), short history at
        # memory-bound field sizes (the reduced problem converges in
        # tens of iterations, so the accuracy cost is nil).
        m_eff = varpro_m if varpro_m is not None else (10 if n < 512
                                                       else 5)
        Zt0 = _pack(jnp.fft.rfft2(Z0[:, n2:].reshape(B, n, n),
                                  axes=(-2, -1)))
        res = batched_varpro(
            obs_op, xs, Z0[:, :n2], Zt0, sigma2=s2, g_atol=atol,
            max_outer=gn_max_outer, inner_maxiter=inner_cg_eff,
            max_ls=varpro_max_ls,
            m=m_eff, precond_lin=precond_lin, lin_sup=lin_sup,
            lin_ops=lin_ops if varpro_explicit_adjoint else None)
        uz_hat = jnp.fft.irfft2(_unpack(res.z_lin), s=(n, n),
                                axes=(-2, -1)).reshape(B, -1)
        Z = jnp.concatenate([res.u_nl, uz_hat], -1)

        # Exact certificate: VarPro's z-block stop uses the calibrated
        # spectral proxy (lin_sup above), which can sit a small factor
        # off the true pixel sup for structured residuals.  One
        # value_and_grad of the joint objective (a few FFTs, amortized
        # over the ~40-iteration solve) gives the TRUE sup-norm — it
        # decides polish entry and is what aux reports, so downstream
        # consumers (implicit-diff get_H stationarity, reference
        # non-convergence warnings) see real gradients, not the proxy.
        f_true, g_true = _vg_full(xs, th_flat)(Z)
        sup_true = jnp.max(jnp.abs(g_true), -1)
        conv_true = sup_true < jnp.broadcast_to(jnp.asarray(atol), (B,))

        # polish only when VarPro left stragglers: lax.cond skips the
        # whole Newton phase (incl. its init f/g evaluation) at runtime
        # when every lane already satisfies the (true) tolerance
        def run_polish(Zc):
            pol = batched_newton_cg(
                _vg_full(xs, th_flat), Zc, g_atol=atol,
                max_outer=polish_max_outer, cg_maxiter=gn_cg_maxiter,
                precond=_precond2(th_flat))
            return (pol.z, pol.converged, res.failed & pol.failed,
                    pol.iterations, pol.cg_iterations, pol.g_norm, pol.f)

        def skip_polish(Zc):
            zero = jnp.zeros_like(res.iterations)
            return (Zc, conv_true, res.failed, zero, zero,
                    sup_true, f_true)

        Zf, conv, fail, pits, pcg, gnorm, fobj = jax.lax.cond(
            jnp.all(conv_true | res.failed), skip_polish, run_polish,
            Z)
        aux = {"converged": conv, "failed": fail,
               "iterations": res.iterations + pits,
               "cg_iterations": res.inner_iterations + pcg,
               "g_norm": gnorm, "neg_logp": fobj}
        return Zf, aux

    if solver == "auto":
        # VarPro everywhere: the platform's batch-width value corruption
        # (docstring above) is handled by the runtime certification in
        # the solvers (muse_tpu/solver/certify.py), not by a build-time
        # guess — a corrupted width is detected against a B=1 re-solve,
        # repaired lane-wise, and rerouted.
        solver = "varpro"
    custom = {"gn": zhat_newton, "newton": zhat_newton,
              "varpro": zhat_varpro, "lbfgs": None}[solver]

    if theta_true is None:
        theta_true = jnp.zeros((2,)) if infer_z_amp else 0.0
    if x_obs is None:
        data_key = jax.random.PRNGKey(42) if data_key is None else data_key
        # jit: eager complex arithmetic is unimplemented on some backends
        x_obs, _ = jax.jit(sample_x_z)(data_key, jnp.asarray(theta_true))

    prob = SimpleMuseProblem(x_obs, sample_x_z, log_like, log_prior,
                             zhat_guess_from_truth=zhat_guess,
                             custom_zhat=custom,
                             grad_theta_log_like=grad_theta,
                             sample_white=sample_white,
                             x_of_white=x_of_white)
    prob.lensing_n = n
    prob.fft_grid = n
    # resolved budgets, inspectable (the n-dependent defaults are policy
    # a user should be able to audit; explicit kwargs pass through)
    prob.solver_budgets = {
        "solver": solver, "gn_max_outer": gn_max_outer,
        "polish_max_outer": polish_max_outer,
        # gn_cg_maxiter is what Newton-CG and the VarPro polish actually
        # run with; VarPro's inner elimination-CG has its own (scaled)
        # budget — report both so the audit matches the device programs
        "gn_cg_maxiter": gn_cg_maxiter,
        "varpro_inner_cg_maxiter": inner_cg_eff,
        "varpro_max_ls": varpro_max_ls}

    def h_precond(w, x, th_flat):
        """Ready-made CG preconditioner for implicit-diff get_H (the Pl
        hook, src/muse.jl:312): the single-sim Fourier-diagonal
        approximation of (−∇z² logLike)⁻¹ — pass as
        ``get_H(..., implicit_diff=True, implicit_diff_precond=
        prob.suggested_h_precond)``."""
        a_phi, a_z = _amps(th_flat)
        gz2 = (a_z ** 2) * jnp.sum(wh * k2_grid * Cz0) / n ** 2
        Mz = 1.0 + (a_z ** 2) * Cz0 / s2
        Mp = 1.0 + (phi_norm * a_phi) ** 2 * k2_grid * Cp0 * gz2 / s2
        u = w.reshape(2, n, n)
        op = jnp.fft.irfft2(jnp.fft.rfft2(u[0]) / Mp, s=(n, n))
        oz = jnp.fft.irfft2(jnp.fft.rfft2(u[1]) / Mz, s=(n, n))
        return jnp.stack([op, oz]).reshape(-1)

    prob.suggested_h_precond = h_precond

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
