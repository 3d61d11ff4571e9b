"""Gaussian window tabulation for the NFFT.

TPU-native re-implementation of the window math in the reference CUDA kernels
(``csrc/cuda/spatial_window_operations.cu:3-97`` and
``csrc/cuda/spectral_window_operations.cu:2-43`` of dominikbuenger/torch_nfft).

The NFFT uses a (periodized, truncated) Gaussian window

    phi_act(x) = exp(-M^2 x^2 / b) / sqrt(pi b),   b = 2*sigma*m / ((2*sigma-1)*pi)

with oversampling rate sigma. The reference hard-codes sigma = 2 inside its
kernel constants; here the constants are *derived* from sigma so the rate is
tunable, with sigma = 2 as the default for exact numerical parity
(SURVEY.md section 5, config row).

Everything is expressed in the scaled argument t = M*x so that

    phi(t)     = exp(-t^2 * inv_b) * inv_sqrt_b_pi
    inv_b      = pi*(2*sigma - 1) / (2*sigma*m)        # sigma=2: 3*pi/(4*m)
    inv_sqrt_b_pi = sqrt((2*sigma - 1)/(2*sigma*m))    # sigma=2: sqrt(3/(4*m))

and the inverse window Fourier coefficients are

    phi_hat_inv(k) = 1 / (M * phi_act_hat(k)) = exp(k^2 * b * (pi/M)^2)
                                               # sigma=2: exp(k^2 * m*pi/(3*N^2))

All functions are pure jnp and fully differentiable w.r.t. the point
positions (the integer shifts are wrapped in stop_gradient: they are
piecewise constant, so their derivative is zero almost everywhere).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

__all__ = [
    "window_inv_b",
    "window_inv_sqrt_b_pi",
    "phi_hat_inv_param",
    "compute_shifts",
    "compute_psi",
    "compute_psi_and_dpsi",
    "phi_hat_inv_centered",
    "window_index_offsets",
]

DEFAULT_SIGMA = 2.0


def window_inv_b(m: int, sigma: float = DEFAULT_SIGMA) -> float:
    """1/b in the scaled window argument. sigma=2 -> 3*pi/(4*m).

    Reference: WINDOW_FORWARD_PARAM1, spatial_window_operations.cu:5.
    """
    return math.pi * (2.0 * sigma - 1.0) / (2.0 * sigma * m)


def window_inv_sqrt_b_pi(m: int, sigma: float = DEFAULT_SIGMA) -> float:
    """1/sqrt(pi*b). sigma=2 -> sqrt(0.75/m).

    Reference: WINDOW_FORWARD_PARAM2, spatial_window_operations.cu:6.
    """
    return math.sqrt((2.0 * sigma - 1.0) / (2.0 * sigma * m))


def phi_hat_inv_param(N: int, m: int, sigma: float = DEFAULT_SIGMA) -> float:
    """b*(pi/M)^2 with M = sigma*N. sigma=2 -> m*pi/(3*N^2).

    Reference: WINDOW_ADJOINT_PARAM, spectral_window_operations.cu:3.
    """
    b = 2.0 * sigma * m / ((2.0 * sigma - 1.0) * math.pi)
    M = sigma * N
    return b * (math.pi / M) ** 2


def compute_shifts(pos: jax.Array, N: int, m: int, sigma: float = DEFAULT_SIGMA) -> jax.Array:
    """Smallest window grid index per point and dimension.

    shifts[i, d] = floor(pos[i, d] * M) - m  with M = sigma*N (int32).

    For positions in [-1/2, 1/2) the shifts lie in [-M/2-m, M/2-m-1]; any
    position is handled via the periodic wrap applied downstream.

    Reference: compute_shifts_kernel, spatial_window_operations.cu:38-61.
    """
    M = int(round(sigma * N))
    shifts = jnp.floor(pos * M).astype(jnp.int32) - m
    return jax.lax.stop_gradient(shifts)


def _psi_arg(pos: jax.Array, shifts: jax.Array, N: int, m: int, sigma: float) -> jax.Array:
    M = int(round(sigma * N))
    window_length = 2 * m + 2
    l = jnp.arange(window_length, dtype=pos.dtype)
    # t[i, d, l] = M*pos[i,d] - shift[i,d] - l, in [m, m+1) - l
    return pos[..., None] * M - shifts[..., None].astype(pos.dtype) - l


def compute_psi(
    pos: jax.Array, shifts: jax.Array, N: int, m: int, sigma: float = DEFAULT_SIGMA
) -> jax.Array:
    """Per-point per-dimension window values, shape (n, d, 2*m+2).

    psi[i, d, l] = phi(M*pos[i,d] - shifts[i,d] - l), l in [0, 2*m+1].

    The window length is 2*m+2 (not 2*m+1): the index set spans
    [floor(M x)-m, ..., floor(M x)+m+1] so that the support is covered on both
    sides of the fractional offset.

    Reference: compute_psi_kernel, spatial_window_operations.cu:68-97.
    """
    t = _psi_arg(pos, shifts, N, m, sigma)
    inv_b = window_inv_b(m, sigma)
    amp = window_inv_sqrt_b_pi(m, sigma)
    return jnp.exp(-(t * t) * inv_b) * amp


def compute_psi_and_dpsi(
    pos: jax.Array, shifts: jax.Array, N: int, m: int, sigma: float = DEFAULT_SIGMA
):
    """Window values and their derivative w.r.t. the position coordinate.

    d psi / d pos[i,d] = -2 * M * inv_b * t * psi   (chain rule, t = M*pos-...).

    Used by the hand-written VJPs of the Pallas kernels; the pure-XLA path
    differentiates :func:`compute_psi` automatically.
    """
    M = int(round(sigma * N))
    t = _psi_arg(pos, shifts, N, m, sigma)
    inv_b = window_inv_b(m, sigma)
    amp = window_inv_sqrt_b_pi(m, sigma)
    psi = jnp.exp(-(t * t) * inv_b) * amp
    dpsi = psi * (-2.0 * inv_b * M) * t
    return psi, dpsi


def phi_hat_inv_centered(
    N: int, m: int, sigma: float = DEFAULT_SIGMA, dtype=jnp.float32
) -> jax.Array:
    """Inverse window Fourier coefficients on the centered band, shape (N,).

    out[i] = phi_hat_inv(k) = exp(k^2 * b * (pi/M)^2) for k = i - N/2,
    i in [0, N). Symmetric in k, so only |k| matters.

    Reference: compute_phi_hat_inv_kernel, spectral_window_operations.cu:27-43
    (which tabulates k in [0, N/2] and mirrors for negative k in the rolloff
    kernels at :81-95).
    """
    k = jnp.arange(N, dtype=dtype) - N // 2
    return jnp.exp(k * k * phi_hat_inv_param(N, m, sigma))


def window_index_offsets(dim: int, m: int) -> jnp.ndarray:
    """All window multi-index combinations, shape (W, dim), W = (2m+2)**dim.

    Row w holds (l_0, ..., l_{dim-1}) with each l in [0, 2m+2). The order of
    rows is irrelevant to the math (the spread/gather sums over all of them).
    """
    L = 2 * m + 2
    grids = jnp.meshgrid(*([jnp.arange(L, dtype=jnp.int32)] * dim), indexing="ij")
    return jnp.stack(grids, axis=-1).reshape(-1, dim)
