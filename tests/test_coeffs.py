"""Coefficient generators: analytic, interpolated, grids, and the
regularization branch the reference leaves unimplemented."""

import numpy as np
import pytest

import torch_nfft_tpu as tn
from torch_nfft_tpu.ops.coeffs import _boundary_polynomial


def test_analytic_coeffs_values():
    sigma, N = 0.25, 8
    c = np.asarray(tn.gaussian_analytic_coeffs(sigma, dim=1, N=N))
    l = np.arange(N) - N // 2
    expected = np.sqrt(np.pi) * sigma * np.exp(-(sigma**2) * np.pi**2 * l**2)
    np.testing.assert_allclose(c, expected, rtol=1e-6)


def test_analytic_coeffs_separable():
    sigma, N = 0.3, 8
    c1 = np.asarray(tn.gaussian_analytic_coeffs(sigma, dim=1, N=N))
    c2 = np.asarray(tn.gaussian_analytic_coeffs(sigma, dim=2, N=N))
    np.testing.assert_allclose(c2, np.outer(c1, c1), rtol=1e-6)


def test_interpolation_grid_layout():
    N, dim = 8, 2
    g = np.asarray(tn.interpolation_grid(dim=dim, N=N))
    assert g.shape == (N, N, dim)
    # grid[i0, i1, a] = i_a / N - 0.5  (kernel_coeffs.cu:76-97)
    np.testing.assert_allclose(g[3, 5], [3 / N - 0.5, 5 / N - 0.5], rtol=1e-6)


def test_radial_grid_matches_grid_norms():
    N, dim = 8, 3
    g = np.asarray(tn.interpolation_grid(dim=dim, N=N))
    r = np.asarray(tn.radial_interpolation_grid(dim=dim, N=N))
    np.testing.assert_allclose(r, np.linalg.norm(g, axis=-1), rtol=1e-5, atol=1e-7)


def test_interpolated_kernel_coeffs_equals_gaussian_interpolated():
    """User-defined kernel workflow reproduces the built-in Gaussian path
    (docs/source/theory/kernelmatrices.rst:158-163 in the reference)."""
    sigma, N, dim = 0.2, 8, 2
    r = np.asarray(tn.radial_interpolation_grid(dim=dim, N=N))
    user = np.asarray(tn.interpolated_kernel_coeffs(np.exp(-(r**2) / sigma**2)))
    builtin = np.asarray(tn.gaussian_interpolated_coeffs(sigma, dim=dim, N=N, p=-1))
    np.testing.assert_allclose(user, builtin, rtol=1e-5, atol=1e-7)


def test_interpolated_converges_to_analytic():
    """For a narrow Gaussian (negligible boundary mass) the interpolated
    coefficients approach the analytic ones as N grows."""
    sigma = 0.1
    ci = np.asarray(tn.gaussian_interpolated_coeffs(sigma, dim=1, N=32)).real
    ca = np.asarray(tn.gaussian_analytic_coeffs(sigma, dim=1, N=32))
    assert np.abs(ci - ca).max() / np.abs(ca).max() < 1e-3


def test_interpolated_coeffs_imag_small():
    """Samples of an even real kernel give (numerically) real coefficients."""
    c = np.asarray(tn.gaussian_interpolated_coeffs(0.2, dim=2, N=16, p=-1))
    assert np.abs(c.imag).max() < 1e-4 * np.abs(c.real).max()


def test_boundary_polynomial_continuity():
    """Regularized branch: T matches K and derivatives at 1/2-eps, is flat at
    1/2 — conditions of the two-point Hermite construction."""
    sigma2, eps, p = 0.04, 0.125, 3
    coefs = _boundary_polynomial(sigma2, eps, p)
    poly = np.polynomial.polynomial.Polynomial(coefs)
    a = 0.5 - eps
    K = lambda r: np.exp(-(r**2) / sigma2)
    assert abs(poly(a) - K(a)) < 1e-10
    d1 = poly.deriv(1)
    assert abs(d1(a) - (-2 * a / sigma2) * K(a)) < 1e-8
    assert abs(d1(0.5)) < 1e-8
    assert abs(poly.deriv(2)(0.5)) < 1e-6


def test_regularized_coeffs_improve_wide_gaussian():
    """For a wide Gaussian (non-negligible at r=1/2) the regularized samples
    give a smoother periodic extension => faster coefficient decay."""
    sigma, N = 0.45, 32
    plain = np.asarray(tn.gaussian_interpolated_coeffs(sigma, dim=1, N=N, p=-1))
    reg = np.asarray(tn.gaussian_interpolated_coeffs(sigma, dim=1, N=N, p=2, eps=0.125))
    # Tail coefficients (high frequency) should be smaller for the regularized
    # version: smoothness controls decay.
    tail = slice(0, 4)  # most negative frequencies
    assert np.abs(reg[tail]).max() < np.abs(plain[tail]).max()


def test_regularized_requires_eps():
    with pytest.raises(ValueError):
        tn.gaussian_interpolated_coeffs(0.3, dim=1, N=16, p=2, eps=0.0)
