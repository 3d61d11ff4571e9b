"""Lanczos / eigsh_operator on the matrix-free operators."""

import jax.numpy as jnp
import numpy as np
import pytest

import torch_nfft_tpu as tn

from helpers import make_points


def _gram(rng, n=2500, dim=2):
    pos, _ = make_points(rng, n, dim)
    coeffs = tn.gaussian_analytic_coeffs(0.3, dim=dim, N=16)
    return tn.GramMatrix(coeffs, pos, cutoff=4)


def test_lanczos_tridiagonal_small(rng):
    """On an explicit symmetric matrix, Lanczos + eigh of the tridiagonal
    reproduces the extreme eigenvalues."""
    A = rng.standard_normal((40, 40)).astype(np.float32)
    A = (A + A.T) / 2
    Aj = jnp.asarray(A)
    al, be, V = tn.lanczos(lambda v: Aj @ v, jnp.asarray(rng.standard_normal(40).astype(np.float32)), 40)
    tri = np.diag(np.asarray(al)) + np.diag(np.asarray(be), 1) + np.diag(np.asarray(be), -1)
    got = np.sort(np.linalg.eigvalsh(tri))
    want = np.sort(np.linalg.eigvalsh(A))
    # extreme ends converge first / exactly at full iterations
    np.testing.assert_allclose(got[-3:], want[-3:], rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(got[:3], want[:3], rtol=1e-3, atol=1e-3)


def test_eigsh_gram_top_eigs(rng):
    """Top eigenpairs of the Gram operator (slot-layout matvecs) match the
    dense operator's spectrum; Ritz pairs satisfy A y ~= w y."""
    gram = _gram(rng)
    k = 3
    w, Y = tn.eigsh_operator(gram, k, num_iters=40)
    dense = np.asarray(gram.to_dense())
    want = np.sort(np.linalg.eigvalsh((dense + dense.T) / 2))[-k:]
    np.testing.assert_allclose(np.asarray(w), want, rtol=1e-3)
    for j in range(k):
        y = Y[:, j]
        r = np.asarray(gram @ y) [:, None] if y.ndim == 1 else None
        Ay = np.asarray(gram @ y)
        resid = np.linalg.norm(Ay - np.asarray(w)[j] * np.asarray(y))
        assert resid / abs(float(w[j])) < 1e-2


def test_eigsh_adjacency_laplacian(rng):
    """Normalized-Laplacian top eigenvalue of the adjacency operator: the
    Gaussian Gram is numerically low-rank, so L = I - D^-1/2 A D^-1/2 has a
    large eigenvalue cluster at exactly 1 — Lanczos must find it and stay
    inside the [0, 2] bound. (No per-vector residual check: Ritz vectors
    inside a degenerate cluster are individually ill-conditioned.)"""
    gram = _gram(rng)
    adj = tn.AdjacencyMatrix(gram, normalization="sym", shift="laplacian")
    w, Y = tn.eigsh_operator(adj, 2, num_iters=40)
    assert float(w[-1]) <= 2.0 + 1e-3
    np.testing.assert_allclose(np.asarray(w), [1.0, 1.0], atol=1e-3)
    # the Ritz vectors still live in the right subspace: ||(A - I) y|| small
    for j in range(2):
        y = np.asarray(Y[:, j])
        Ay = np.asarray(adj @ Y[:, j])
        assert np.linalg.norm(Ay - y) / np.linalg.norm(y) < 5e-2
