"""GaussianKernel end-to-end: both scaling modes, batched, analytic and
interpolated coefficients (reference test/test_kernel.py)."""

import jax
import numpy as np
import pytest

import torch_nfft_tpu as tn

from helpers import max_err


def _prep_points(rng, n, dim, spread=3.0, batches=1):
    pts = ((rng.random((n * batches, dim)) * 2 - 1) * spread).astype(np.float32)
    batch = None if batches <= 1 else (np.arange(n * batches) // n).astype(np.int32)
    return pts, batch


def _expected_dense(kernel, pos, batch=None):
    """Dense Gaussian matrix on equivalently pre-shifted/scaled points
    (reference test_kernel.py:46-52)."""
    src, _ = tn.shift_points_by_center(pos, None, batch, batch)
    if kernel.scale_by_norm is not None:
        src, _ = tn.scale_points_by_norm(
            src, None, batch, batch, factor=1.0, norm=kernel.scale_by_norm
        )
        return np.asarray(
            tn.exact_gaussian_matrix(kernel.sigma, np.asarray(src), batch=batch)
        )
    # a-priori radius: the kernel approximates exp(-||z||^2 / sigma^2) on the
    # shifted points directly (radius folded into kernel.factor).
    return np.asarray(
        tn.exact_gaussian_matrix(kernel.sigma, np.asarray(src), batch=batch)
    )


def test_kernel_scale_by_norm_mode(rng):
    kernel = tn.GaussianKernel(sigma=1.0, dim=2, bandwidth=16, cutoff=4)
    pos, _ = _prep_points(rng, 60, 2)
    A = np.asarray(kernel(pos).to_dense())
    A_exp = _expected_dense(kernel, pos)
    assert max_err(A, A_exp) < 5e-3


def test_kernel_apriori_radius_mode(rng):
    pos, _ = _prep_points(rng, 60, 2, spread=2.0)
    radius = float(np.abs(pos - pos.mean(0)).max()) * 1.01
    kernel = tn.GaussianKernel(
        sigma=1.0, dim=2, bandwidth=16, cutoff=4, max_infinity_norm=radius
    )
    A = np.asarray(kernel(pos).to_dense())
    # A-priori radius mode approximates exp(-||z||^2 / sigma^2) on the
    # original (shifted) points (reference kernel.py:32-40).
    src, _ = tn.shift_points_by_center(pos)
    A_exp = np.asarray(tn.exact_gaussian_matrix(1.0, np.asarray(src)))
    assert max_err(A, A_exp) < 5e-3


def test_kernel_batched(rng):
    kernel = tn.GaussianKernel(sigma=1.0, dim=2, bandwidth=16, cutoff=4)
    pos, batch = _prep_points(rng, 30, 2, batches=2)
    A = np.asarray(kernel(pos, batch=batch).to_dense())
    A_exp = _expected_dense(kernel, pos, batch)
    assert A.shape == (60, 60)
    # block-diagonal: cross-batch entries are exactly zero
    assert np.abs(A[:30, 30:]).max() < 1e-5
    assert max_err(A, A_exp) < 5e-3


def test_kernel_analytic_mode(rng):
    kernel = tn.GaussianKernel(sigma=1.0, dim=2, bandwidth=16, cutoff=4, analytic=True)
    pos, _ = _prep_points(rng, 50, 2)
    A = np.asarray(kernel(pos).to_dense())
    A_exp = _expected_dense(kernel, pos)
    # Analytic coefficients use the infinite-domain Fourier transform, so the
    # periodization error of the wide effective Gaussian dominates (~1e-2).
    assert max_err(A, A_exp) < 3e-2


def test_kernel_regularized_mode(rng):
    """reg_degree >= 0 exercises the regularization branch (unimplemented in
    the reference, kernel_coeffs.cu:67-69)."""
    kernel = tn.GaussianKernel(
        sigma=1.0, dim=2, bandwidth=16, cutoff=4, reg_degree=2, reg_width=0.125
    )
    pos, _ = _prep_points(rng, 50, 2)
    A = np.asarray(kernel(pos).to_dense())
    src, _ = tn.shift_points_by_center(pos)
    src, _ = tn.scale_points_by_norm(src, factor=1.0, norm="euclidean")
    A_exp = np.asarray(tn.exact_gaussian_matrix(1.0, np.asarray(src)))
    assert max_err(A, A_exp) < 2e-2


def test_kernel_is_pytree():
    kernel = tn.GaussianKernel(sigma=0.5, dim=1, bandwidth=16)
    leaves, treedef = jax.tree_util.tree_flatten(kernel)
    kernel2 = jax.tree_util.tree_unflatten(treedef, leaves)
    np.testing.assert_array_equal(np.asarray(kernel.coeffs), np.asarray(kernel2.coeffs))
    assert kernel2.cutoff == kernel.cutoff


def test_adjacency_matrix_from_kernel(rng):
    kernel = tn.GaussianKernel(sigma=1.0, dim=2, bandwidth=16, cutoff=4)
    pos, _ = _prep_points(rng, 40, 2)
    adj = kernel.adjacency_matrix(pos, loop_weight=2, normalization="sym")
    x = rng.random(40, dtype=np.float32)
    y = np.asarray(adj @ x)
    assert y.shape == (40,)

    # Dense check: D^{-1/2} (A + (loop-1) I) D^{-1/2} x
    A = _expected_dense(kernel, pos) + np.eye(40)
    deg = A.sum(1)
    dinv = 1 / np.sqrt(deg)
    y_exp = dinv * (A @ (dinv * x))
    assert np.abs(y - y_exp).max() / np.abs(y_exp).max() < 2e-2
