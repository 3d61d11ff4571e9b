"""Trigonometric kernel-coefficient generators.

TPU-native equivalents of the reference's ``torch_nfft/coeffs.py`` +
``csrc/cuda/kernel_coeffs.cu``: analytic Gaussian coefficients, interpolated
coefficients via an FFT of kernel samples, and the interpolation grids for
user-defined kernels.

Extension over the reference: the boundary *regularization* branch
(``p >= 0``, ``eps > 0``) is fully implemented here via two-point Hermite
interpolation, whereas the reference leaves it as an unimplemented stub and
asserts it away (kernel_coeffs.cu:67-69, core_cuda.cu:890-891 — SURVEY.md
section 2.4 "known defects, do NOT replicate").
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "gaussian_analytic_coeffs",
    "gaussian_interpolated_coeffs",
    "interpolation_grid",
    "radial_interpolation_grid",
    "interpolated_kernel_coeffs",
]


def gaussian_analytic_coeffs(sigma, dim=3, N=16, dtype=jnp.float32):
    """Separable analytic Fourier coefficients of the Gaussian kernel.

    coeffs[i_0, ..., i_{d-1}] = prod_d sqrt(pi)*sigma*exp(-sigma^2*pi^2*l_d^2)
    with l_d = i_d - N/2. Shape (N,)*dim, real.

    Reference: fill_gaussian_analytic_coeffs_kernel, kernel_coeffs.cu:6-30.
    """
    l = jnp.arange(N, dtype=dtype) - N // 2
    v = math.sqrt(math.pi) * sigma * jnp.exp(-(sigma**2) * (math.pi**2) * l * l)
    out = v
    for _ in range(dim - 1):
        out = out[..., None] * v
    return out


def interpolation_grid(dim=3, N=16, dtype=jnp.float32):
    """Uniform spatial grid in [-1/2, 1/2)^dim, shape (N,)*dim + (dim,).

    grid[i_0, ..., i_{d-1}, a] = i_a / N - 1/2.

    Reference: fill_interpolation_grid_kernel, kernel_coeffs.cu:76-97.
    """
    g1 = jnp.arange(N, dtype=dtype) / N - 0.5
    grids = jnp.meshgrid(*([g1] * dim), indexing="ij")
    return jnp.stack(grids, axis=-1)


def radial_interpolation_grid(dim=3, N=16, dtype=jnp.float32):
    """Euclidean norms of :func:`interpolation_grid` nodes, shape (N,)*dim.

    Reference: fill_radial_interpolation_grid_kernel, kernel_coeffs.cu:99-123.
    """
    grid = interpolation_grid(dim, N, dtype)
    return jnp.sqrt(jnp.sum(grid * grid, axis=-1))


def _coeffs_from_grid_values(vals: jax.Array, dim: int, N: int) -> jax.Array:
    """fftshift -> unnormalized FFT -> fftshift -> / N^dim.

    Exactly the index bookkeeping of copy_*_grid_kernel_values_kernel
    (fftshift in, kernel_coeffs.cu:145) + CUFFT_FORWARD (core_cuda.cu:1046)
    + copy_interpolated_kernel_coeffs_kernel (fftshift out and 1/N^dim scale,
    kernel_coeffs.cu:179-202). N even makes fftshift == ifftshift.

    On complex-free backends (axon TPU) the FFT runs on the host in NumPy —
    coefficient generation is a one-time concrete N^dim computation, never a
    hot path (reference runs it once per GaussianKernel, kernel.py:96). Real
    periodically-even samples (every radial kernel) yield real coefficients,
    which is the only form the complex-free device can hold; genuinely
    complex coefficients raise an actionable error there.
    """
    axes = tuple(range(dim))
    from .nfft import _complex_ok

    if not isinstance(vals, jax.core.Tracer) and not _complex_ok():
        v = np.asarray(vals)
        out = (
            np.fft.fftshift(
                np.fft.fftn(np.fft.fftshift(v, axes=axes), axes=axes), axes=axes
            )
            / N**dim
        )
        scale = float(np.abs(out).max()) or 1.0
        if float(np.abs(out.imag).max()) > 1e-5 * scale:
            raise ValueError(
                "interpolated kernel coefficients are complex-valued, which "
                "the active backend cannot represent (no complex dtype). "
                "Radially symmetric kernel samples produce real coefficients;"
                " for asymmetric kernels force a complex-capable platform or "
                "set TORCH_NFFT_TPU_COMPLEX=1."
            )
        out_dtype = np.float64 if v.dtype == np.float64 else np.float32
        return jnp.asarray(out.real.astype(out_dtype))

    cdtype = (
        vals.dtype
        if jnp.issubdtype(vals.dtype, jnp.complexfloating)
        else (jnp.complex128 if vals.dtype == jnp.float64 else jnp.complex64)
    )
    b = jnp.fft.fftshift(vals.astype(cdtype), axes=axes)
    b_hat = jnp.fft.fftn(b, axes=axes)
    return jnp.fft.fftshift(b_hat, axes=axes) / (N**dim)


def interpolated_kernel_coeffs(grid_values):
    """Coefficients of the trigonometric interpolant of arbitrary kernel samples.

    ``grid_values``: kernel evaluated on :func:`interpolation_grid` (or any
    function of :func:`radial_interpolation_grid`), shape (N,)*dim. Returns
    complex coefficients of the same shape, frequency l at index l + N/2.

    Reference: interpolated_kernel_coeffs_cuda, core_cuda.cu:995-1064.
    """
    grid_values = jnp.asarray(grid_values)
    dim = grid_values.ndim
    N = grid_values.shape[0]
    return _coeffs_from_grid_values(grid_values, dim, N)


# ---------------------------------------------------------------------------
# Regularized Gaussian samples (two-point Hermite boundary polynomial)
# ---------------------------------------------------------------------------


def _gaussian_radial_derivatives(sigma2: float, r: float, p: int) -> np.ndarray:
    """K^(j)(r) for K(r) = exp(-r^2/sigma2), j = 0..p (float64 host compute).

    Uses K^(j)(r) = exp(-r^2/sigma2) * P_j(r) with the polynomial recurrence
    P_{j+1} = P_j' - (2 r / sigma2) P_j.
    """
    # Polynomials as coefficient arrays, lowest degree first.
    P = np.array([1.0])
    out = np.empty(p + 1)
    base = math.exp(-(r * r) / sigma2)
    for j in range(p + 1):
        out[j] = base * float(np.polynomial.polynomial.polyval(r, P))
        dP = np.polynomial.polynomial.polyder(P)
        shifted = np.polynomial.polynomial.polymul(np.array([0.0, -2.0 / sigma2]), P)
        ln = max(len(dP), len(shifted))
        P = np.pad(dP, (0, ln - len(dP))) + np.pad(shifted, (0, ln - len(shifted)))
    return out


def _boundary_polynomial(sigma2: float, eps: float, p: int) -> np.ndarray:
    """Degree-2p polynomial T on [1/2-eps, 1/2] with

    T^(j)(1/2-eps) = K^(j)(1/2-eps) for j = 0..p   (smooth continuation)
    T^(j)(1/2)     = 0              for j = 1..p   (flat at the period edge)

    Returns monomial coefficients (lowest first). This is the standard
    NFFT-fastsum boundary regularization (Potts & Steidl) that the reference
    stubs out.
    """
    a = 0.5 - eps
    b = 0.5
    deg = 2 * p
    ncoef = deg + 1
    A = np.zeros((ncoef, ncoef))
    rhs = np.zeros(ncoef)
    ka = _gaussian_radial_derivatives(sigma2, a, p)

    def deriv_row(x, j):
        row = np.zeros(ncoef)
        for c in range(j, ncoef):
            row[c] = math.perm(c, j) * x ** (c - j)
        return row

    for j in range(p + 1):
        A[j] = deriv_row(a, j)
        rhs[j] = ka[j]
    for j in range(1, p + 1):
        A[p + j] = deriv_row(b, j)
        rhs[p + j] = 0.0
    return np.linalg.solve(A, rhs)


def gaussian_interpolated_coeffs(sigma, dim=3, N=16, p=-1, eps=0.0, dtype=jnp.float32):
    """Interpolated Fourier coefficients of the (optionally regularized)
    Gaussian kernel exp(-r^2/sigma^2), sampled radially on the N^dim grid.

    ``p < 0`` (default): pure Gaussian samples everywhere — bit-for-bit the
    reference's only implemented path (kernel_coeffs.cu:61-63).
    ``p >= 0`` with ``eps > 0``: boundary-regularized samples — K(r) inside
    r <= 1/2 - eps, a degree-2p two-point Hermite polynomial on
    [1/2-eps, 1/2], and the constant T(1/2) outside. This branch is
    unimplemented in the reference (kernel_coeffs.cu:67-69).

    Reference entry point: gaussian_interpolated_coeffs_cuda,
    core_cuda.cu:882-940.
    """
    sigma = float(sigma)
    sigma2 = sigma * sigma
    grid = interpolation_grid(dim, N, dtype)
    r2 = jnp.sum(grid * grid, axis=-1)

    if p < 0:
        vals = jnp.exp(-r2 / sigma2)
    else:
        if eps <= 0.0:
            raise ValueError(
                "Regularized Gaussian coefficients (p >= 0) require eps > 0"
            )
        coefs = _boundary_polynomial(sigma2, float(eps), int(p))
        r = jnp.sqrt(r2)
        t_poly = jnp.polyval(jnp.asarray(coefs[::-1].copy(), dtype=dtype), r)
        t_edge = float(np.polynomial.polynomial.polyval(0.5, coefs))
        inner = jnp.exp(-r2 / sigma2)
        vals = jnp.where(r2 <= (0.5 - eps) ** 2, inner, t_poly)
        vals = jnp.where(r2 >= 0.25, t_edge, vals)

    return _coeffs_from_grid_values(vals, dim, N)
