"""Compiled problem: the jitted TPU execution path behind the MUSE solver.

This is the L5-runtime ↔ L3-interface bridge.  Where the reference threads
dynamic dispatch + Distributed ``pmap`` through per-sim closures
(``src/muse.jl:169-176``), here every per-simulation quantity is computed by
one traced, batched, jit-compiled function:

  * ``muse_step``    — one outer-loop iteration's device work: sample all
                       sims at θ (common random numbers), run all latent MAP
                       solves in lockstep (batched L-BFGS or a problem's
                       custom batched solver), and take both θ-gradients per
                       lane (src/muse.jl:169-176).
  * ``j_sims``       — get_J's per-sim pipeline (src/muse.jl:508-513).
  * ``h_fd``/fiducial— get_H's finite-difference pipeline, batched over
                       sims × θ-columns × ±stencil (src/muse.jl:417-433).
  * ``h_implicit_with`` — get_H's implicit-diff estimator: fwd-over-rev
                       jacobians + matrix-free CG (src/muse.jl:335-405),
                       which in JAX collapses to jvp-of-grad + cg.

Simulations are lane 0..B-1 of every batched array; the observed data ride
as lane 0 in ``muse_step`` (matching ``[nothing; split_rng(rng, nsims)]``,
src/muse.jl:169).  On a mesh, the lane axis is sharded (data-parallel over
sims) by placing inputs with a NamedSharding — XLA then partitions the
whole traced computation and rides ICI for any cross-sim reduction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.flatten_util import ravel_pytree

from ..ops.lbfgs import batched_lbfgs
from ..problem import MuseProblem
from ..theta import ThetaSpec

__all__ = ["CompiledProblem"]


class CompiledProblem:
    """Jit-compiled, batched view of a :class:`MuseProblem`."""

    def __init__(self, problem: MuseProblem, spec: ThetaSpec,
                 theta0_flat, *, dtype=jnp.float32,
                 lbfgs_memory: int = 10, lbfgs_max_iters: int = 500):
        self.problem = problem
        self.spec = spec
        self.dtype = dtype
        self.lbfgs_memory = lbfgs_memory
        self.lbfgs_max_iters = lbfgs_max_iters

        if (jnp.dtype(dtype) == jnp.dtype("float64")
                and not jax.config.jax_enable_x64):
            import warnings
            warnings.warn(
                "dtype=float64 requested but jax_enable_x64 is off — "
                "arrays will silently be float32. Enable x64 with "
                "jax.config.update('jax_enable_x64', True) (CPU only; "
                "TPUs emulate f64 slowly — prefer float32 on device with "
                "the host-side float64 outer loop, which is the default).")

        # Discover z's pytree structure / flat size from one example draw
        # (jitted: eager complex arithmetic is unimplemented on some TPU
        # backends, and user models freely use it).
        x0, z0 = jax.jit(lambda k, t: problem.sample_x_z(
            k, spec.unflatten(t)))(jax.random.PRNGKey(0),
                                   jnp.asarray(theta0_flat))
        z_flat, self.unravel_z = ravel_pytree(z0)
        self.nz = int(z_flat.shape[0])
        self.x_obs = jax.tree.map(
            lambda v: jnp.asarray(v, dtype=jnp.result_type(v)), problem.x)

    # ------------------------------------------------------------ #
    # scalar building blocks (traced; θ and z flat)
    # ------------------------------------------------------------ #

    def _ll(self, x, z_flat, th_flat):
        """log P(x, z | θ), θ untransformed-flat, z flat."""
        return jnp.asarray(self.problem.log_like(
            x, self.unravel_z(z_flat), self.spec.unflatten(th_flat)),
            self.dtype)

    def _ll_t(self, x, z_flat, th_t_flat):
        """Same density seen from transformed θ-space (volume factor per
        the problem's convention — src/turing.jl:171-186 vs soss)."""
        th = self.problem.inv_transform_theta(th_t_flat)
        return self._ll(x, z_flat, th) - self.problem._log_volume(th)

    def _sample_flat(self, key, th_flat):
        x, z = self.problem.sample_x_z(key, self.spec.unflatten(th_flat))
        zf, _ = ravel_pytree(z)
        return x, zf.astype(self.dtype)

    def _sample_batch(self, keys, th_flat):
        """Batched forward sampling with a fusion barrier on the outputs.

        The barrier forces the sampled fields to materialize before any
        consumer: without it, XLA's TPU backend fuses the sampler's
        irfft2 into downstream rfft2 consumers and, at large batch
        (observed at B=128×1024², not at B=17), MIScompiles the chain —
        every per-sim score came out scaled by ×0.903, biasing θ̂ by
        ~50σ.  Verified: identical graph with the intermediate
        materialized is exact.  One HBM round-trip of x, which the MAP
        solve needs resident anyway.
        """
        xs, Zs = jax.vmap(self._sample_flat, in_axes=(0, None))(keys,
                                                                th_flat)
        return jax.lax.optimization_barrier((xs, Zs))

    def _zhat_guess_flat(self, x, z_flat, th_flat):
        g = self.problem.zhat_guess_from_truth(
            x, self.unravel_z(z_flat), self.spec.unflatten(th_flat))
        gf, _ = ravel_pytree(g)
        return gf.astype(self.dtype)

    def _grad_th(self, x, z_flat, th_flat):
        """∂θ log_like in untransformed space: the problem's analytic
        override when provided (src/interface.jl:56-58), else jax.grad."""
        if self.problem.grad_theta_log_like is not None:
            g = self.problem.grad_theta_log_like(
                x, self.unravel_z(z_flat), self.spec.unflatten(th_flat))
            gf, _ = ravel_pytree(g)
            return gf.astype(self.dtype)
        return jax.grad(lambda t: self._ll(x, z_flat, t))(th_flat)

    # ------------------------------------------------------------ #
    # batched MAP solve (ẑ_at_θ analog, lockstep over lanes)
    # ------------------------------------------------------------ #

    def _solve_maps(self, xs, Z0, th_flat, atol):
        """All lanes' latent MAP solves.  Returns (Z, aux) where aux carries
        per-lane diagnostics (the ``ẑ_history`` analog)."""
        if self.problem.custom_zhat is not None:
            Z, aux = self.problem.custom_zhat(xs, Z0, th_flat, atol)
            aux.setdefault("converged", jnp.ones(Z.shape[0], bool))
            aux.setdefault("failed", jnp.zeros(Z.shape[0], bool))
            return Z, aux

        def fn(Z):
            def one(x, z):
                f, g = jax.value_and_grad(
                    lambda zz: -self._ll(x, zz, th_flat))(z)
                return f, g
            return jax.vmap(one)(xs, Z)

        res = batched_lbfgs(fn, Z0, g_atol=atol,
                            m=self.lbfgs_memory,
                            max_iters=self.lbfgs_max_iters)
        aux = {"converged": res.converged, "failed": res.failed,
               "iterations": res.iterations, "g_norm": res.g_norm,
               "neg_logp": res.f}
        return res.z, aux

    # ------------------------------------------------------------ #
    # jitted entry points
    # ------------------------------------------------------------ #

    def _step_from_xs(self, xs_all, th, th_t, Z_prev, lane_ids, atol):
        """Shared muse-step tail: data-lane mix-in, lockstep MAP solves,
        per-lane θ-gradients in both spaces (src/muse.jl:169-181)."""
        lane = lane_ids

        def mix(o, s):
            m = (lane == 0).reshape((-1,) + (1,) * (s.ndim - 1))
            return jnp.where(m, o[None].astype(s.dtype), s)

        xs = jax.tree.map(mix, self.x_obs, xs_all)
        Z, aux = self._solve_maps(xs, Z_prev, th, atol)
        g = jax.vmap(lambda x, z: self._grad_th(x, z, th))(xs, Z)
        if self.problem.theta_bijector is None:
            # identity transform ⇒ the two θ-space gradients coincide
            # (src/muse.jl:172-173 collapses); skip half the AD work
            g_t = g
        else:
            g_t = jax.vmap(lambda x, z: jax.grad(
                lambda tt: self._ll_t(x, z, tt))(th_t))(xs, Z)
        return {"g": g, "g_t": g_t, "Z": Z, **aux}

    @functools.cached_property
    def muse_step(self):
        """(th, th_t, keys, Z_prev, atol) -> dict.

        Lane 0 is the observed data; lanes 1.. are sims drawn at θ with the
        fixed per-sim keys (CRN).  Output per-lane θ-gradients in both
        spaces + new warm starts + MAP diagnostics (src/muse.jl:169-181).
        """
        def step(th, th_t, keys_all, Z_prev, lane_ids, atol):
            # keys_all has one key per lane; the lane with global id 0 has
            # its sample replaced by the observed data (the
            # ``[nothing; split_rng(...)]`` layout, src/muse.jl:169-170).
            # Sampling it anyway keeps every lane identical in shape/work —
            # a prerequisite for lockstep batching and uniform mesh
            # sharding.  ``lane_ids`` carries global lane numbers so the
            # solver can process the lane axis in memory-bounded chunks
            # (src/muse.jl's whole-sims pmap has no such need; a 513-lane
            # 1024² batch exceeds one chip's HBM).
            xs_all, _ = self._sample_batch(keys_all, th)
            return self._step_from_xs(xs_all, th, th_t, Z_prev, lane_ids,
                                      atol)
        return jax.jit(step)

    # ------------------------------------------------------------ #
    # CRN white-hoisted iteration path (problem.sample_white /
    # x_of_white; no reference analog — src/muse.jl:169-170 re-runs
    # every sim's full sampler each outer iteration)
    # ------------------------------------------------------------ #

    @functools.cached_property
    def sample_whites(self):
        """keys -> batched θ-independent CRN draws (one pytree with a
        leading lane axis).  Run ONCE per fit; its output feeds every
        outer iteration's :meth:`muse_step_white`."""
        return jax.jit(jax.vmap(self.problem.sample_white))

    @functools.cached_property
    def muse_step_white(self):
        """muse_step with the RNG hoisted: takes the per-lane white draws
        W_all (from :meth:`sample_whites`) instead of keys, completing
        the samples with the θ-dependent ``x_of_white`` only.  Identical
        outputs to :meth:`muse_step` under the problem.py white-split
        contract."""
        def step(th, th_t, W_all, Z_prev, lane_ids, atol):
            def one(W):
                x, z = self.problem.x_of_white(W, self.spec.unflatten(th))
                zf, _ = ravel_pytree(z)
                return x, zf.astype(self.dtype)

            # same fusion barrier as _sample_batch: the completed fields
            # must materialize before downstream FFT consumers (the
            # fused-chain miscompile family, _sample_batch docstring)
            xs_all, _ = jax.lax.optimization_barrier(jax.vmap(one)(W_all))
            return self._step_from_xs(xs_all, th, th_t, Z_prev, lane_ids,
                                      atol)
        return jax.jit(step)

    @functools.cached_property
    def j_sims(self):
        """get_J per-sim pipeline: sample at θ₀, MAP warm-started from the
        *true* z, untransformed θ-gradient (src/muse.jl:510-513)."""
        def run(keys, th, atol):
            xs, Zs = self._sample_batch(keys, th)
            Z, aux = self._solve_maps(xs, Zs, th, atol)
            g = jax.vmap(lambda x, z: self._grad_th(x, z, th))(xs, Z)
            # Z rides along for the value-integrity certifier (certify.py)
            return {"g": g, "Z": Z, **aux}
        return jax.jit(run)

    @functools.cached_property
    def h_fiducial(self):
        """get_H fiducial fits: sims at θ₀, MAP from ẑ_guess_from_truth
        (src/muse.jl:417-423)."""
        def run(keys, th, atol):
            xs, Zs = self._sample_batch(keys, th)
            Z0 = jax.vmap(self._zhat_guess_flat, in_axes=(0, 0, None))(
                xs, Zs, th)
            Z, aux = self._solve_maps(xs, Z0, th, atol)
            return {"Z": Z, **aux}
        return jax.jit(run)

    @functools.cached_property
    def h_fd(self):
        """get_H finite-difference mode, fully batched.

        For every (sim, θ-column j, sign ±): regenerate the sim at θ₀±εⱼeⱼ
        with the SAME key, MAP at fiducial θ₀ warm-started from the sim's
        fiducial fit, θ-gradient at fiducial θ₀ (src/muse.jl:426-433 +
        src/util.jl:12-21).  All nsims·nθ·2 solves run as ONE lockstep
        batch — the TPU-native answer to the reference's nested
        pmap_over ∈ {:sims, :jac} pool routing (src/muse.jl:329-333).

        Returns g of shape (nsims, nθ, 2, nθ); the solver host-side forms
        H_sim[:, j] = (g[s,j,0] − g[s,j,1]) / (2εⱼ).

        ``n_shards`` (static) is the mesh's sims-axis device count: the
        flattened nsims·nθ·stencil batch is padded so the *per-device*
        lane count is odd (``utils.fft_check.safe_lane_count``) — an
        odd total alone would still give even per-device shards under a
        mesh, exactly the family measured broken for fused batched FFTs.
        """
        from ..utils.fft_check import pad_lanes_to, safe_lane_count

        def run(keys, th, steps, Zfid, atol, offsets, n_shards=1):
            nsims = keys.shape[0]
            ntheta = th.shape[0]
            ns = offsets.shape[0]
            eye = jnp.eye(ntheta, dtype=self.dtype)
            # perturbation grid: (nθ columns, stencil, nθ coords)
            pert = (offsets.astype(self.dtype)[None, :, None]
                    * steps[:, None, None] * eye[:, None, :])
            th_pert = jnp.broadcast_to(th[None, None, :] + pert,
                                       (nsims, ntheta, ns, ntheta))
            keys_b = jnp.broadcast_to(keys[:, None, None],
                                      (nsims, ntheta, ns) + keys.shape[1:])
            flat_keys = keys_b.reshape((-1,) + keys.shape[1:])
            flat_th = th_pert.reshape((-1, ntheta))
            M = nsims * ntheta * ns
            width = safe_lane_count(M, n_shards)
            Z0 = jnp.broadcast_to(Zfid[:, None, None, :],
                                  (nsims, ntheta, ns, self.nz)
                                  ).reshape((-1, self.nz))
            if width > M:
                flat_keys, flat_th, Z0 = (
                    pad_lanes_to(a, width)
                    for a in (flat_keys, flat_th, Z0))
            xs, _ = jax.vmap(self._sample_flat)(flat_keys, flat_th)
            Z, aux = self._solve_maps(xs, Z0, th, atol)
            g = jax.vmap(lambda x, z: self._grad_th(x, z, th))(xs, Z)
            g = g[:M].reshape((nsims, ntheta, ns, ntheta))
            # Z rides along for the value-integrity certifier (certify.py)
            return {"g": g, "Z": Z[:M],
                    "converged": aux["converged"][:M].reshape(
                        nsims, ntheta, ns),
                    "failed": aux["failed"][:M].reshape(nsims, ntheta, ns)}
        return jax.jit(run, static_argnames=("n_shards",))

    def h_implicit_with(self, precond=None):
        """get_H implicit-differentiation mode (src/muse.jl:335-405).

        Per sim:  H = H1 + H2,
          H1   = ∂θsim ∇θ′ logLike(x(θsim), ẑ, θ₀)           (:353-358)
          dFdθ = ∂θ ∇z logLike(x, ẑ, θ)                      (:361-365)
          dFdθ1= ∂θsim ∇z logLike(x(θsim), ẑ, θ₀)            (:366-371)
          A    = ∇z² logLike(x, ·, θ₀) as a matrix-free HVP  (:373-379)
          H2   = −dFdθᵀ A⁻¹ dFdθ1  via CG per column         (:380-387)

        The reference's LinearMap + IterativeSolvers.cg machinery is native
        here: jvp-of-grad for the HVP, jax.scipy CG for the solve.  The
        whole per-sim computation vmaps over the sims axis.

        ``precond`` is the reference's ``Pl`` CG-preconditioner hook
        (``implicit_diff_cg_kwargs``, src/muse.jl:312,380-384):
        ``precond(w, x, th_flat)`` must return an approximation of A⁻¹w
        (A = −∇z² logLike, SPD at the MAP) on flat z vectors; it is
        threaded to ``jax.scipy.sparse.linalg.cg``'s ``M``.  Jitted
        functions are cached per preconditioner."""
        cache = self.__dict__.setdefault("_h_implicit_cache", {})
        if precond in cache:
            return cache[precond]

        def one_sim(key, th, atol, cg_maxiter, cg_tol, h1_is_zero):
            x, z = self._sample_flat(key, th)
            z_start = self._zhat_guess_flat(x, z, th)
            # coarse-tolerance fiducial fit (reference uses atol=1e-1,
            # src/muse.jl:344)
            zhat, _ = self._solve_maps(
                jax.tree.map(lambda v: v[None], x), z_start[None], th, atol)
            zhat = zhat[0]

            grad_z = lambda xx, zz, tt: jax.grad(
                lambda z_: self._ll(xx, z_, tt))(zz)
            grad_t = lambda xx, zz, tt: jax.grad(
                lambda t_: self._ll(xx, zz, t_))(tt)

            if h1_is_zero:
                H1 = jnp.zeros((th.shape[0], th.shape[0]), self.dtype)
            else:
                def H1_fn(t):
                    xx, _ = self._sample_flat(key, t)
                    return grad_t(xx, zhat, th)
                H1 = jax.jacfwd(H1_fn)(th)

            dFdth = jax.jacfwd(lambda t: grad_z(x, zhat, t))(th)      # (nz,nθ)

            def dFdth1_fn(t):
                xx, _ = self._sample_flat(key, t)
                return grad_z(xx, zhat, th)
            dFdth1 = jax.jacfwd(dFdth1_fn)(th)                        # (nz,nθ)

            # −A w with A = ∇z² logLike (negative-definite at the MAP),
            # so CG solves the SPD system (−A) y = −b.  The linearization
            # point ẑ is fixed for every CG iteration of every θ-column,
            # so hoist the primal sweep out with jax.linearize: each HVP
            # application is then tangent-only (~2× cheaper than
            # jvp-of-grad, which re-runs the primal per call).
            _, hvp_lin = jax.linearize(
                lambda zz: grad_z(x, zz, th), zhat)

            def neg_hvp(w):
                return -hvp_lin(w)

            M = (None if precond is None
                 else (lambda w: precond(w, x, th)))

            def solve_col(b):
                y, _ = jax.scipy.sparse.linalg.cg(
                    neg_hvp, -b, maxiter=cg_maxiter, tol=cg_tol, M=M)
                return y

            Ainv_dFdth1 = jax.vmap(solve_col, in_axes=1, out_axes=1)(dFdth1)
            H2 = -(dFdth.T @ Ainv_dFdth1)
            # CG residual diagnostic (‖A y − b‖ per column) — the analog of
            # the stored cg convergence histories (src/muse.jl:405).
            resid = jnp.linalg.norm(
                jax.vmap(neg_hvp, in_axes=1, out_axes=1)(Ainv_dFdth1)
                - (-dFdth1), axis=0)
            return H1 + H2, resid

        def run(keys, th, atol, cg_maxiter, cg_tol, h1_is_zero):
            return jax.vmap(
                lambda k: one_sim(k, th, atol, cg_maxiter, cg_tol,
                                  h1_is_zero))(keys)
        fn = jax.jit(run, static_argnames=("cg_maxiter", "h1_is_zero"))
        cache[precond] = fn
        return fn

    # ------------------------------------------------------------ #
    # value-integrity certification (solver/certify.py)
    # ------------------------------------------------------------ #

    @functools.cached_property
    def certifier(self):
        """Shared :class:`~muse_tpu.solver.certify.ChunkCertifier` so the
        muse/get_J/get_H flows of one fit share verdicts and width
        routing (the platform's batch-width value-corruption guard)."""
        from .certify import ChunkCertifier
        return ChunkCertifier(self)

    # ------------------------------------------------------------ #
    # tiny θ-space derivatives (prior / transforms)
    # ------------------------------------------------------------ #

    def _lp_t(self, th_t):
        th = self.problem.inv_transform_theta(th_t)
        return (jnp.asarray(self.problem.log_prior(self.spec.unflatten(th)),
                            self.dtype)
                - self.problem._log_volume(th))

    def _lp_u(self, th):
        return jnp.asarray(self.problem.log_prior(self.spec.unflatten(th)),
                           self.dtype)

    @functools.cached_property
    def prior_grad_t(self):
        return jax.jit(jax.grad(self._lp_t))

    @functools.cached_property
    def prior_hess_t(self):
        return jax.jit(jax.hessian(self._lp_t))

    @functools.cached_property
    def prior_hess_u(self):
        return jax.jit(jax.hessian(self._lp_u))

    @functools.cached_property
    def transform(self):
        return jax.jit(self.problem.transform_theta)

    @functools.cached_property
    def inv_transform(self):
        return jax.jit(self.problem.inv_transform_theta)

