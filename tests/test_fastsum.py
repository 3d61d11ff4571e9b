"""Fastsum accuracy, decomposed into NFFT error vs series-truncation error —
the reference's key testing pattern (test/test_fastsum.py, SURVEY.md §4)."""

import numpy as np
import pytest

import torch_nfft_tpu as tn

from helpers import make_points, max_err, rel_err


def _gauss_dense(pos_s, pos_t, sigma):
    d2 = ((pos_t[:, None, :] - pos_s[None, :, :]) ** 2).sum(-1)
    return np.exp(-d2 / sigma**2)


def test_fastsum_analytic_coeffs(rng):
    n, dim, sigma, N, m = 200, 2, 0.2, 8, 3
    pos, _ = make_points(rng, n, dim)
    pos /= np.abs(pos).max() * 4 / 0.95  # spread over the safe box

    A_true = _gauss_dense(pos, pos, sigma)
    coeffs = tn.gaussian_analytic_coeffs(sigma, dim=dim, N=N)
    A_nfft = np.asarray(tn.nfft_fastsum(np.eye(n, dtype=np.float32), coeffs, pos, cutoff=m))
    A_trig = np.asarray(tn.exact_trigonometric_matrix(coeffs, pos).real)

    # NFFT-vs-truncated-series error is much smaller than the truncation error.
    assert max_err(A_nfft, A_trig) < 5e-4
    # Total error dominated by truncation, bounded like the reference run.
    assert max_err(A_nfft, A_true) < 5e-3


def test_fastsum_interpolated_coeffs(rng):
    n, dim, sigma, N, m = 200, 2, 0.2, 8, 3
    pos, _ = make_points(rng, n, dim)

    A_true = _gauss_dense(pos, pos, sigma)
    coeffs = tn.gaussian_interpolated_coeffs(sigma, dim=dim, N=N, p=-1)
    A_nfft = np.asarray(tn.nfft_fastsum(np.eye(n, dtype=np.float32), coeffs, pos, cutoff=m))
    A_trig = np.asarray(tn.exact_trigonometric_matrix(coeffs, pos).real)

    assert max_err(A_nfft, A_trig) < 5e-4
    assert max_err(A_nfft, A_true) < 5e-3


def test_fastsum_matches_ndft_fastsum(rng):
    n, dim, N, m = 150, 2, 16, 4
    pos, _ = make_points(rng, n, dim)
    x = rng.random((n, 3), dtype=np.float32)
    coeffs = tn.gaussian_analytic_coeffs(0.3, dim=dim, N=N)

    y = tn.nfft_fastsum(x, coeffs, pos, cutoff=m)
    y_ref = tn.ndft_fastsum(x, coeffs, pos, N=N)
    assert rel_err(y, y_ref) < 1e-3


def test_fastsum_asymmetric_targets(rng):
    dim, N, m = 2, 16, 4
    src, _ = make_points(rng, 120, dim)
    tgt, _ = make_points(rng, 80, dim)
    x = rng.random((120, 2), dtype=np.float32)
    coeffs = tn.gaussian_analytic_coeffs(0.3, dim=dim, N=N)

    y = tn.nfft_fastsum(x, coeffs, src, tgt, cutoff=m)
    assert y.shape == (80, 2)
    y_ref = tn.ndft_fastsum(x, coeffs, src, tgt, N=N)
    assert rel_err(y, y_ref) < 1e-3


def test_fastsum_batched(rng):
    dim, N, m, b, n = 2, 16, 4, 3, 60
    pos, batch = make_points(rng, n, dim, batches=b)
    x = rng.random((n * b, 2), dtype=np.float32)
    coeffs = tn.gaussian_analytic_coeffs(0.3, dim=dim, N=N)

    y = tn.nfft_fastsum(x, coeffs, pos, batch=batch, cutoff=m)
    y_ref = tn.ndft_fastsum(x, coeffs, pos, batch=batch, N=N)
    assert rel_err(y, y_ref) < 1e-3

    # Block-diagonal semantics: batch 0's output only depends on batch 0's x.
    x2 = x.copy()
    x2[n:] += 1.0
    y2 = tn.nfft_fastsum(x2, coeffs, pos, batch=batch, cutoff=m)
    np.testing.assert_allclose(np.asarray(y[:n]), np.asarray(y2[:n]), atol=1e-5)


def test_fastsum_complex_input_and_coeffs(rng):
    dim, N, m, n = 1, 32, 4, 100
    pos, _ = make_points(rng, n, dim)
    x = (rng.random((n, 2)) + 1j * rng.random((n, 2))).astype(np.complex64)
    grid_vals = np.asarray(tn.radial_interpolation_grid(dim=dim, N=N))
    coeffs = tn.interpolated_kernel_coeffs(np.exp(-(grid_vals**2) / 0.1))

    y = tn.nfft_fastsum(x, coeffs, pos, cutoff=m)
    y_ref = tn.ndft_fastsum(x, coeffs, pos, N=N)
    assert np.iscomplexobj(np.asarray(y))
    assert rel_err(y, y_ref) < 1e-3
