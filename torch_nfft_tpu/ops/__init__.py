"""Core NFFT compute ops (TPU-native JAX/XLA/Pallas)."""

from .coeffs import (
    gaussian_analytic_coeffs,
    gaussian_interpolated_coeffs,
    interpolated_kernel_coeffs,
    interpolation_grid,
    radial_interpolation_grid,
)
from .ndft import (
    exact_gaussian_matrix,
    exact_radial_matrix,
    exact_trigonometric_matrix,
    ndft_adjoint,
    ndft_fastsum,
    ndft_forward,
)
from .nfft import nfft_adjoint, nfft_fastsum, nfft_forward
from .spread_gather import gather, spread

__all__ = [
    "nfft_adjoint",
    "nfft_forward",
    "nfft_fastsum",
    "ndft_adjoint",
    "ndft_forward",
    "ndft_fastsum",
    "exact_trigonometric_matrix",
    "exact_gaussian_matrix",
    "exact_radial_matrix",
    "gaussian_analytic_coeffs",
    "gaussian_interpolated_coeffs",
    "interpolation_grid",
    "radial_interpolation_grid",
    "interpolated_kernel_coeffs",
    "spread",
    "gather",
]
