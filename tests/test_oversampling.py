"""Tunable oversampling rate sigma (the reference hard-codes sigma=2,
spatial_window_operations.cu:20-23; here every constant derives from sigma,
SURVEY.md section 5 config row)."""

import numpy as np
import pytest

import torch_nfft_tpu as tn


def _points(rng, n, dim):
    pos = (rng.random((n, dim)) - 0.5).astype(np.float32)
    pos /= 4 * np.abs(pos).max()
    return pos


@pytest.mark.parametrize("sigma", [1.5, 2.0, 3.0])
def test_adjoint_accuracy_vs_sigma(rng, sigma):
    n, dim, N, m = 300, 2, 16, 4
    pos = _points(rng, n, dim)
    x = rng.standard_normal((n, 2)).astype(np.float32)
    got = tn.nfft_adjoint(x, pos, bandwidth=N, cutoff=m, sigma=sigma)
    ref = tn.ndft_adjoint(x, pos, N=N)
    rel = np.linalg.norm(np.asarray(got) - np.asarray(ref)) / np.linalg.norm(
        np.asarray(ref)
    )
    assert rel < 2e-3, (sigma, rel)


def test_higher_sigma_is_more_accurate(rng):
    """Larger oversampling -> smaller window truncation error at fixed m."""
    n, dim, N, m = 300, 1, 16, 3
    pos = _points(rng, n, dim)
    x = rng.standard_normal((n, 1)).astype(np.float32)
    ref = np.asarray(tn.ndft_adjoint(x, pos, N=N))

    def rel(sigma):
        got = np.asarray(tn.nfft_adjoint(x, pos, bandwidth=N, cutoff=m, sigma=sigma))
        return np.linalg.norm(got - ref) / np.linalg.norm(ref)

    assert rel(3.0) < rel(1.5)


def test_fastsum_sigma(rng):
    n, dim, N, m = 128, 2, 8, 3
    pos = _points(rng, n, dim)
    x = rng.standard_normal((n, 1)).astype(np.float32)
    coeffs = tn.gaussian_analytic_coeffs(0.25, dim=dim, N=N)
    ref = tn.nfft_fastsum(x, coeffs, pos, cutoff=m)
    got = tn.nfft_fastsum(x, coeffs, pos, cutoff=m, sigma=3.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=5e-3, atol=5e-3)
