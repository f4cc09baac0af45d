"""Pallas TPU kernels for Gaussian-random-field likelihoods.

The GRF log-likelihood's Fourier-space term, −½ Σ_k w_k |ẑ_k|²/C_k (with
hermitian multiplicities w_k), and its z-gradient w_k ẑ_k/C_k are HBM-
bandwidth-bound at 1024² per lane.  This module provides:

  * :func:`spectrum_quadform_and_grad` — value AND z-gradient in ONE HBM
    pass per lane (the fused f+∇z evaluation MAP solvers want);
  * :func:`spectrum_quadform` — value with a custom VJP that *recomputes*
    z·(w/C) in the backward pass instead of storing it.

Honest benchmarking note (TPU v5e, B=16×1024²): for the plain
grad-of-quadform pattern XLA's fused einsum already runs at roofline
(~1.0 ms); an earlier kernel design that stored the gradient tensor in
the forward pass LOST to XLA (~1.5 ms) by paying an extra full write+read.
The win for Pallas here is only the fused value+grad single-pass variant
and kernel infrastructure for later fusions (spectrum construction,
CG vector ops); plain reductions should stay in XLA.

Layout: spectra are packed real/imag along the lane (last) axis —
``z_ri[(B, n, 2m)]`` with ``[..., :m]`` real and ``[..., m:]`` imag — so
every op in the kernel is a plain 2D elementwise/reduce on (8,128)-tileable
blocks.  ``pack_rfft2``/``pack_weights`` build this layout.

On CPU (tests, dry runs) the kernels run in interpret mode — identical
semantics, no Mosaic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pallas TPU backend is absent on CPU-only installs
    from jax.experimental.pallas import tpu as pltpu
    _HAVE_PLTPU = True
except ImportError:  # pragma: no cover
    pltpu = None
    _HAVE_PLTPU = False

__all__ = ["spectrum_quadform", "spectrum_quadform_and_grad",
           "spectrum_quadform_reference", "pack_rfft2", "pack_weights"]


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _vmem():
    return pltpu.VMEM if _HAVE_PLTPU else pl.ANY


def _smem():
    return pltpu.SMEM if _HAVE_PLTPU else pl.ANY


def pack_rfft2(z: jnp.ndarray) -> jnp.ndarray:
    """(…, n, n) real field → (…, n, 2m) packed rfft2 spectrum."""
    zf = jnp.fft.rfft2(z, axes=(-2, -1))
    return jnp.concatenate([zf.real, zf.imag], axis=-1)


def pack_weights(a: jnp.ndarray) -> jnp.ndarray:
    """(n, m) per-mode weights → (n, 2m) matching the packed layout."""
    return jnp.concatenate([a, a], axis=-1)


# ------------------------------------------------------------------ #
# fused value+grad kernel
# ------------------------------------------------------------------ #

def _quadform_kernel(z_ref, invCw_ref, out_ref, grad_ref):
    """One (lane, row-tile) step: grad tile = z·(w/C); partial quadform
    accumulated into row ``lane`` of a VMEM-resident (B, 128) accumulator.
    Row-tiled blocks keep each DMA ~0.5 MB so Mosaic double-buffers the
    HBM traffic behind the VPU work.  (A true (B,1) scalar output is not
    expressible — Mosaic requires (8,128)-tileable or full-array blocks.)
    """
    b = pl.program_id(0)
    r = pl.program_id(1)
    z = z_ref[:]
    g = z * invCw_ref[:]
    grad_ref[:] = g

    @pl.when(r == 0)
    def _():
        out_ref[b, :] = jnp.zeros((128,), z.dtype)

    out_ref[b, :] += jnp.full((128,), jnp.sum(z * g), z.dtype)


def _row_tile(n: int) -> int:
    for t in (256, 128, 64, 32, 16, 8):
        if n % t == 0:
            return t
    return n


def _quadform_fwd_impl(z_ri, invCw2):
    B, n, m2 = z_ri.shape
    t = _row_tile(n)
    quad, grad = pl.pallas_call(
        _quadform_kernel,
        grid=(B, n // t),
        in_specs=[
            pl.BlockSpec((1, t, m2), lambda b, r: (b, r, 0),
                         memory_space=_vmem()),
            pl.BlockSpec((t, m2), lambda b, r: (r, 0),
                         memory_space=_vmem()),
        ],
        out_specs=[
            pl.BlockSpec((B, 128), lambda b, r: (0, 0),
                         memory_space=_vmem()),
            pl.BlockSpec((1, t, m2), lambda b, r: (b, r, 0),
                         memory_space=_vmem()),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 128), z_ri.dtype),
            jax.ShapeDtypeStruct((B, n, m2), z_ri.dtype),
        ],
        interpret=_interpret(),
    )(z_ri, invCw2)
    return quad[:, 0], grad


def spectrum_quadform_and_grad(z_ri, invCw2):
    """Fused (quadform, z-gradient·½) in ONE HBM pass per lane.

    Use when BOTH the value and the z-gradient are needed at the same
    point (the fused f+∇z evaluation inside MAP solvers): one read of the
    spectrum produces both, vs two separate XLA kernels.  Returns
    ``(quad (B,), half_grad (B, n, 2m))`` with ∇z quad = 2·half_grad."""
    return _quadform_fwd_impl(z_ri, invCw2)


def _quad_only_kernel(z_ref, invCw_ref, out_ref):
    b = pl.program_id(0)
    r = pl.program_id(1)
    z = z_ref[:]

    @pl.when(r == 0)
    def _():
        out_ref[b, :] = jnp.zeros((128,), z.dtype)

    out_ref[b, :] += jnp.full((128,), jnp.sum(z * z * invCw_ref[:]),
                              z.dtype)


def _quad_only_impl(z_ri, invCw2):
    B, n, m2 = z_ri.shape
    t = _row_tile(n)
    quad = pl.pallas_call(
        _quad_only_kernel,
        grid=(B, n // t),
        in_specs=[
            pl.BlockSpec((1, t, m2), lambda b, r: (b, r, 0),
                         memory_space=_vmem()),
            pl.BlockSpec((t, m2), lambda b, r: (r, 0),
                         memory_space=_vmem()),
        ],
        out_specs=pl.BlockSpec((B, 128), lambda b, r: (0, 0),
                               memory_space=_vmem()),
        out_shape=jax.ShapeDtypeStruct((B, 128), z_ri.dtype),
        interpret=_interpret(),
    )(z_ri, invCw2)
    return quad[:, 0]


@jax.custom_vjp
def spectrum_quadform(z_ri: jnp.ndarray, invCw2: jnp.ndarray) -> jnp.ndarray:
    """Fused Σ_k w_k|ẑ_k|²/C_k per lane.

    Args:
      z_ri: (B, n, 2m) batched packed spectra (see :func:`pack_rfft2`).
      invCw2: (n, 2m) packed w_k/C_k (see :func:`pack_weights`).
    Returns:
      (B,) weighted quadratic forms.
    """
    return _quad_only_impl(z_ri, invCw2)


def _quadform_fwd(z_ri, invCw2):
    quad = _quad_only_impl(z_ri, invCw2)
    # residuals are the inputs; bwd recomputes z·(w/C) instead of storing
    # the gradient tensor — storing it would cost an extra full HBM
    # write+read, which benchmarking showed makes the kernel LOSE to
    # XLA's fused einsum (see module docstring).
    return quad, (z_ri, invCw2)


def _quadform_bwd(res, ct):
    z_ri, invCw2 = res
    dz = (2.0 * ct)[:, None, None] * z_ri * invCw2[None]
    dic = jnp.einsum("b,bnm->nm", ct, z_ri * z_ri)
    return dz, dic


spectrum_quadform.defvjp(_quadform_fwd, _quadform_bwd)


def spectrum_quadform_reference(z_ri, invCw2):
    """Plain-XLA reference implementation (tests/microbench parity)."""
    return jnp.einsum("bnm,nm->b", z_ri * z_ri, invCw2)
