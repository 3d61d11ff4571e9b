"""Spectral-domain index bookkeeping: centered crop, zero-padded embed,
fftshift helpers and the fastsum band filter.

TPU-native equivalents of the reference CUDA kernels in
``csrc/cuda/spectral_window_operations.cu`` (rolloff correction at :51-265,
kernel convolution at :269-402). Instead of per-element index arithmetic we
express the fftshift-style mappings as slice/concat operations, which XLA
fuses into the surrounding elementwise work.

Conventions (matching the reference, see SURVEY.md section 7):

* The oversampled grid has M = sigma*N cells per dimension; frequency v of the
  unnormalized DFT lives at grid index v mod M, i.e. non-negative frequencies
  [0, N/2) at the head and negative frequencies [-N/2, 0) at the tail.
* "Centered" arrays have N entries per dimension with frequency k stored at
  index k + N/2, k in [-N/2, N/2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .window import phi_hat_inv_centered

__all__ = [
    "centered_crop",
    "centered_embed",
    "phi_hat_inv_outer",
    "apply_phi_hat_inv",
    "fastsum_band_filter",
]


def centered_crop(g_hat: jax.Array, dim: int, N: int, spatial_axis0: int = 1) -> jax.Array:
    """Extract the centered N^dim band out of an M^dim spectral grid.

    Input axes [spatial_axis0, spatial_axis0+dim) have length M >= N; output
    has length N on those axes with frequency k at index k + N/2.

    Reference: the g_hat index mapping in
    complex_adjoint_rolloff_correction_kernel,
    spectral_window_operations.cu:78-96.
    """
    halfN = N // 2
    for ax in range(spatial_axis0, spatial_axis0 + dim):
        M = g_hat.shape[ax]
        neg = jax.lax.slice_in_dim(g_hat, M - halfN, M, axis=ax)  # k in [-N/2, 0)
        pos = jax.lax.slice_in_dim(g_hat, 0, halfN, axis=ax)  # k in [0, N/2)
        g_hat = jnp.concatenate([neg, pos], axis=ax)
    return g_hat


def centered_embed(
    x: jax.Array, dim: int, N: int, M: int, spatial_axis0: int = 1
) -> jax.Array:
    """Zero-pad a centered N^dim spectrum into an M^dim DFT-layout grid.

    Inverse index mapping of :func:`centered_crop`: frequency k (stored at
    k + N/2) moves to grid position k mod M; all out-of-band positions are 0.

    Reference: complex_forward_rolloff_correction_kernel,
    spectral_window_operations.cu:158-221.
    """
    halfN = N // 2
    for ax in range(spatial_axis0, spatial_axis0 + dim):
        head = jax.lax.slice_in_dim(x, halfN, x.shape[ax], axis=ax)  # k >= 0
        tail = jax.lax.slice_in_dim(x, 0, halfN, axis=ax)  # k < 0
        pad_shape = list(x.shape)
        pad_shape[ax] = M - x.shape[ax]
        zeros = jnp.zeros(pad_shape, dtype=x.dtype)
        x = jnp.concatenate([head, zeros, tail], axis=ax)
    return x


def phi_hat_inv_outer(
    dim: int, N: int, m: int, sigma: float = 2.0, dtype=jnp.float32,
    window: str = "gaussian",
) -> jax.Array:
    """Separable product of centered phi_hat_inv vectors, shape (N,)*dim.

    out[i_0, ..., i_{d-1}] = prod_d phi_hat_inv(i_d - N/2).
    """
    v = phi_hat_inv_centered(N, m, sigma, dtype=dtype, window=window)
    out = v
    for _ in range(dim - 1):
        out = out[..., None] * v
    return out


def apply_phi_hat_inv(
    y: jax.Array, dim: int, N: int, m: int, sigma: float = 2.0, spatial_axis0: int = 1,
    window: str = "gaussian",
) -> jax.Array:
    """Multiply centered spectral data by the separable phi_hat_inv factors.

    Broadcasts one (N,)-vector per spatial axis; XLA fuses the dim
    multiplications into a single elementwise pass.
    """
    real_dtype = jnp.finfo(y.dtype).dtype if jnp.issubdtype(y.dtype, jnp.complexfloating) else y.dtype
    v = phi_hat_inv_centered(N, m, sigma, dtype=real_dtype, window=window)
    for ax in range(spatial_axis0, spatial_axis0 + dim):
        shape = [1] * y.ndim
        shape[ax] = N
        y = y * v.reshape(shape)
    return y


def fastsum_band_filter(
    coeffs: jax.Array, N: int, m: int, M: int, sigma: float = 2.0,
    window: str = "gaussian",
) -> jax.Array:
    """Spectral filter for the fastsum pipeline, shape (M,)*dim.

    filter[v] = coeffs_centered[k + N/2] * prod_d phi_hat_inv(k_d)^2 at the
    DFT position of every in-band frequency k, and 0 outside the band. The
    squared phi_hat_inv accounts for both the adjoint (spread) and forward
    (gather) window deconvolutions in one multiply.

    Reference: real/complex_kernel_convolution_kernel,
    spectral_window_operations.cu:269-402 (phi factor squared at :326,:394;
    out-of-band zeroing at :313-315).
    """
    dim = coeffs.ndim
    real_dtype = (
        jnp.finfo(coeffs.dtype).dtype
        if jnp.issubdtype(coeffs.dtype, jnp.complexfloating)
        else coeffs.dtype
    )
    phi2 = phi_hat_inv_outer(dim, N, m, sigma, dtype=real_dtype, window=window) ** 2
    band = coeffs * phi2
    # Add a dummy leading axis so spatial_axis0=1 matches centered_embed's
    # convention, then strip it again.
    band = band[None]
    out = centered_embed(band, dim, N, M, spatial_axis0=1)
    return out[0]


def fftshift_nd(x: jax.Array, dim: int, spatial_axis0: int = 0) -> jax.Array:
    """fftshift over `dim` axes starting at spatial_axis0 (N even => same as
    ifftshift). Used by the kernel-coefficient interpolation pipeline.

    Reference index map: b_idx = (i + N/2) % N per dim
    (kernel_coeffs.cu:56-57, :145, :193).
    """
    axes = tuple(range(spatial_axis0, spatial_axis0 + dim))
    return jnp.fft.fftshift(x, axes=axes)
