"""Planar fallback routing for complex-free backends, forced via the
TORCH_NFFT_TPU_COMPLEX override (the real trigger is the axon TPU runtime)."""

import numpy as np
import pytest

import torch_nfft_tpu as tn
from torch_nfft_tpu.ops import nfft as nfft_mod


@pytest.fixture
def no_complex(monkeypatch):
    monkeypatch.setattr(nfft_mod, "_COMPLEX_OK", False)
    yield
    # monkeypatch restores the module global automatically


def _points(rng, n, dim):
    pos = (rng.random((n, dim)) - 0.5).astype(np.float32)
    pos /= 4 * np.abs(pos).max()
    return pos


def test_adjoint_real_output_fallback(rng, no_complex):
    n, dim, N, m = 200, 2, 16, 4
    pos = _points(rng, n, dim)
    x = rng.standard_normal((n, 3)).astype(np.float32)
    got = tn.nfft_adjoint(x, pos, bandwidth=N, cutoff=m, real_output=True)
    ref = np.asarray(tn.ndft_adjoint(x, pos, N=N)).real
    assert got.dtype == np.float32
    ga = np.asarray(got).reshape(ref.shape)
    rel = np.linalg.norm(ga - ref) / np.linalg.norm(ref)
    assert rel < 1e-3, rel


def test_forward_real_output_fallback(rng, no_complex):
    n, dim, N, m = 150, 2, 16, 4
    pos = _points(rng, n, dim)
    x = rng.standard_normal((1,) + (N,) * dim + (2,)).astype(np.float32)
    got = tn.nfft_forward(x, pos, cutoff=m, real_output=True)
    ref = np.asarray(tn.ndft_forward(x.astype(np.complex64), pos)).real
    assert got.dtype == np.float32
    rel = np.linalg.norm(np.asarray(got) - ref) / np.linalg.norm(ref)
    assert rel < 1e-3, rel


def test_fastsum_fallback_matches_complex_path(rng, no_complex):
    n, dim, N, m = 180, 2, 8, 3
    pos = _points(rng, n, dim)
    x = rng.standard_normal((n, 2)).astype(np.float32)
    coeffs = tn.gaussian_analytic_coeffs(0.25, dim=dim, N=N)
    got = tn.nfft_fastsum(x, coeffs, pos, cutoff=m)

    nfft_mod._COMPLEX_OK = True
    ref = tn.nfft_fastsum(x, coeffs, pos, cutoff=m)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_gram_matrix_fallback(rng, no_complex):
    n, dim = 250, 2
    pos = _points(rng, n, dim)
    x = rng.standard_normal((n,)).astype(np.float32)
    k = tn.GaussianKernel(0.5, dim=dim, bandwidth=16, cutoff=4, max_euclidean_norm=1.0)
    got = np.asarray(k(pos) @ x)
    assert np.isfinite(got).all() and got.dtype == np.float32
