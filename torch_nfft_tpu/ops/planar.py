"""Planar-complex NFFT pipelines — the pure-real TPU execution layer.

Mainline XLA lowers ``jnp.fft`` and complex64 on TPU, but some TPU runtimes
(including the one this framework benches on) expose **no complex dtype and
no FFT primitive**. These pipelines keep the entire transform in real
float32 arrays: complex values travel as (real, imag) planes, the FFT is the
matmul DFT from ops/fft.py, and spread/gather treat the two planes as extra
columns (they are real-weighted linear maps, so plane-wise application is
exact).

Same math as ops/nfft.py (reference ``csrc/cuda/core_cuda.cu:144-852``); only
the number representation differs. Everything is jit-compatible and
differentiable.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .fft import fftn_planar
from .spectral import (
    apply_phi_hat_inv,
    centered_crop,
    centered_embed,
    fastsum_band_filter,
)
from .spread_gather import gather, spread

__all__ = [
    "nfft_adjoint_planar",
    "nfft_forward_planar",
    "nfft_fastsum_real",
]

DEFAULT_SIGMA = 2.0


@partial(
    jax.jit,
    static_argnames=("batch_size", "N", "m", "sigma", "strategy"),
)
def nfft_adjoint_planar(
    x,
    pos,
    batch,
    plan=None,
    *,
    batch_size,
    N,
    m,
    sigma=DEFAULT_SIGMA,
    strategy="auto",
):
    """Adjoint NFFT of real samples, planar output.

    x: (n, C) real. Returns (yr, yi) each (batch_size, (N,)*dim, C).
    """
    n, dim = pos.shape
    M = int(round(sigma * N))
    C = x.shape[1]

    with jax.named_scope("nfft_spread"):
        g = spread(x, pos, batch, batch_size, N, m, sigma, strategy, plan=plan)
        g = g.reshape((batch_size,) + (M,) * dim + (C,))

    with jax.named_scope("nfft_fft"):
        gr, gi = fftn_planar(g, None, axes=tuple(range(1, dim + 1)), sign=+1)

    with jax.named_scope("nfft_rolloff"):
        yr = apply_phi_hat_inv(centered_crop(gr, dim, N, 1), dim, N, m, sigma, 1)
        yi = apply_phi_hat_inv(centered_crop(gi, dim, N, 1), dim, N, m, sigma, 1)
    return yr, yi


@partial(
    jax.jit,
    static_argnames=("batch_size", "dim", "m", "sigma", "strategy"),
)
def nfft_forward_planar(
    xr,
    xi,
    pos,
    batch,
    plan=None,
    *,
    batch_size,
    dim,
    m,
    sigma=DEFAULT_SIGMA,
    strategy="auto",
):
    """Forward NFFT of a planar spectrum, planar output.

    xr/xi: (batch_size, (N,)*dim, C) real planes (xi may be None).
    Returns (yr, yi) each (n, C).
    """
    N = xr.shape[1]
    M = int(round(sigma * N))
    C = xr.shape[-1]

    with jax.named_scope("nfft_rolloff"):
        wr = centered_embed(
            apply_phi_hat_inv(xr, dim, N, m, sigma, 1), dim, N, M, 1
        )
        wi = (
            None
            if xi is None
            else centered_embed(apply_phi_hat_inv(xi, dim, N, m, sigma, 1), dim, N, M, 1)
        )

    with jax.named_scope("nfft_fft"):
        gr, gi = fftn_planar(wr, wi, axes=tuple(range(1, dim + 1)), sign=-1)

    with jax.named_scope("nfft_gather"):
        # Planes ride the column axis through one gather call.
        g2 = jnp.concatenate(
            [gr.reshape(batch_size * M**dim, C), gi.reshape(batch_size * M**dim, C)],
            axis=1,
        )
        y = gather(g2, pos, batch, batch_size, N, m, sigma, strategy, plan=plan)
    return y[:, :C], y[:, C:]


@partial(
    jax.jit,
    static_argnames=("batch_size", "N", "m", "sigma", "strategy"),
)
def nfft_fastsum_real(
    x,
    coeffs,
    sources,
    targets,
    source_batch,
    target_batch,
    source_plan=None,
    target_plan=None,
    *,
    batch_size,
    N,
    m,
    sigma=DEFAULT_SIGMA,
    strategy="auto",
):
    """Fastsum for real samples and real kernel coefficients, real output.

    The full pipeline (spread -> IFFT -> band filter -> FFT -> gather) in
    planar arithmetic; the output keeps only the real plane, which is exact
    for even real coefficients (Gaussian kernels).
    """
    n_src, dim = sources.shape
    M = int(round(sigma * N))
    C = x.shape[1]
    axes = tuple(range(1, dim + 1))

    with jax.named_scope("fastsum_spread"):
        g = spread(x, sources, source_batch, batch_size, N, m, sigma, strategy, plan=source_plan)
        g = g.reshape((batch_size,) + (M,) * dim + (C,))

    with jax.named_scope("fastsum_fft_adjoint"):
        gr, gi = fftn_planar(g, None, axes=axes, sign=+1)

    with jax.named_scope("fastsum_kernel_convolution"):
        filt = fastsum_band_filter(coeffs, N, m, M, sigma)[None, ..., None]
        gr = gr * filt
        gi = gi * filt

    with jax.named_scope("fastsum_fft_forward"):
        gr, gi = fftn_planar(gr, gi, axes=axes, sign=-1)

    with jax.named_scope("fastsum_gather"):
        # Only the real plane matters for the (real) output.
        y = gather(
            gr.reshape(batch_size * M**dim, C),
            targets,
            target_batch,
            batch_size,
            N,
            m,
            sigma,
            strategy,
            plan=target_plan,
        )
    return y
