"""Torch-facing compatibility layer: reference API semantics on torch
tensors (reference test/test_adjoint.py, test_forward.py, test_grad.py,
test_fastsum.py, driven through torch_nfft_tpu.torch_compat)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from torch_nfft_tpu import torch_compat as tc


@pytest.fixture
def rng():
    return np.random.default_rng(3)


def _points(rng, n, dim):
    pos = torch.tensor(
        (rng.random((n, dim)) - 0.5).astype(np.float32)
    )
    pos /= 4 * pos.abs().max()
    return pos


def test_adjoint_matches_oracle(rng):
    """Reference test_adjoint.py:21-49: batched 2D adjoint vs dense NDFT."""
    n_per, b, c, N, m = 300, 3, 4, 16, 4
    n = n_per * b
    pos = _points(rng, n, 2)
    batch = torch.arange(b).repeat_interleave(n_per)
    x = torch.tensor(rng.standard_normal((n, c)).astype(np.float32))

    y = tc.nfft_adjoint(x, pos, batch, bandwidth=N, cutoff=m)
    ref = tc.ndft_adjoint(x, pos, batch, N=N)
    assert y.shape == ref.shape == (b, N, N, c)
    rel = torch.linalg.norm(y - ref) / torch.linalg.norm(ref)
    assert float(rel) < 1e-3


def test_forward_matches_oracle(rng):
    """Reference test_forward.py:21-43."""
    n, N, m = 40, 16, 4
    pos = _points(rng, n, 2)
    x = torch.tensor(rng.standard_normal((1, N, N, 2)).astype(np.float32))

    y = tc.nfft_forward(x, pos, cutoff=m)
    ref = tc.ndft_forward(x, pos)
    rel = torch.linalg.norm(y - ref) / torch.linalg.norm(ref)
    assert float(rel) < 1e-3


def test_adjoint_grad_matches_fd(rng):
    """Reference test_grad.py:23-46: finite differences through torch
    autograd on loss = adjoint(x).abs().sum()."""
    n, N, m = 25, 8, 4
    pos = _points(rng, n, 2)
    x = torch.tensor(rng.standard_normal((n, 1)).astype(np.float64).astype(np.float32))
    x.requires_grad_(True)

    loss = tc.nfft_adjoint(x, pos, bandwidth=N, cutoff=m).abs().sum()
    loss.backward()
    assert x.grad is not None and x.grad.shape == x.shape

    eps = 1e-3
    for i in (0, 7, 19):
        xp = x.detach().clone()
        xp[i, 0] += eps
        lp = tc.nfft_adjoint(xp, pos, bandwidth=N, cutoff=m).abs().sum()
        fd = (float(lp) - float(loss)) / eps
        assert abs(fd - float(x.grad[i, 0])) < 5e-2 * max(1.0, abs(fd))


def test_forward_grad_matches_fd(rng):
    """Reference test_grad.py:50-73."""
    n, N, m = 30, 8, 4
    pos = _points(rng, n, 2)
    x = torch.tensor(rng.standard_normal((1, N, N, 1)).astype(np.float32))
    x.requires_grad_(True)

    loss = tc.nfft_forward(x, pos, cutoff=m).abs().sum()
    loss.backward()
    assert x.grad is not None and x.grad.shape == x.shape

    eps = 1e-3
    idx = (0, 3, 5, 0)
    xp = x.detach().clone()
    xp[idx] += eps
    lp = tc.nfft_forward(xp, pos, cutoff=m).abs().sum()
    fd = (float(lp) - float(loss)) / eps
    assert abs(fd - float(x.grad[idx])) < 5e-2 * max(1.0, abs(fd))


def test_fastsum_vs_exact_matrices(rng):
    """Reference test_fastsum.py:20-46: dense fastsum matrix vs the exact
    Gaussian matrix and the trigonometric truncation oracle."""
    n, dim, N, m, sigma = 60, 2, 8, 3, 0.2
    pos = _points(rng, n, dim)
    coeffs = tc.gaussian_analytic_coeffs(sigma, dim=dim, N=N)

    dense = tc.nfft_fastsum(torch.eye(n), coeffs, pos, cutoff=m)
    exact_trig = tc.exact_trigonometric_matrix(coeffs, pos)
    exact_gauss = tc.exact_gaussian_matrix(sigma, pos)

    nfft_err = (dense - exact_trig).abs().max()
    trunc_err = (exact_trig - exact_gauss.to(exact_trig.dtype)).abs().max()
    assert float(nfft_err) < 5e-3
    assert float(trunc_err) < 5e-2


def test_fastsum_grad_is_transposed_fastsum(rng):
    """Reference nfft.py:83-88: backward = fastsum with sources/targets
    swapped; check against torch FD on a symmetric point set."""
    n, dim, N, m = 30, 2, 8, 3
    pos = _points(rng, n, dim)
    coeffs = tc.gaussian_analytic_coeffs(1.0, dim=dim, N=N)
    x = torch.tensor(rng.standard_normal((n, 1)).astype(np.float32))
    x.requires_grad_(True)

    y = tc.nfft_fastsum(x, coeffs, pos, cutoff=m)
    loss = (y ** 2).sum()
    loss.backward()

    eps = 1e-3
    xp = x.detach().clone()
    xp[4, 0] += eps
    lp = (tc.nfft_fastsum(xp, coeffs, pos, cutoff=m) ** 2).sum()
    fd = (float(lp) - float(loss)) / eps
    assert abs(fd - float(x.grad[4, 0])) < 5e-2 * max(1.0, abs(fd))


def test_fastsum_rejects_point_grads(rng):
    pos = _points(rng, 20, 2)
    pos.requires_grad_(True)
    coeffs = tc.gaussian_analytic_coeffs(1.0, dim=2, N=8)
    x = torch.zeros((20, 1))
    with pytest.raises(AssertionError, match="sources"):
        tc.nfft_fastsum(x, coeffs, pos, cutoff=3)


def test_coeff_helpers_roundtrip():
    """interpolated_kernel_coeffs(gaussian samples) ~ analytic coeffs
    (reference test_fastsum.py analytic-vs-interpolated comparison)."""
    # sigma must be small enough that the Gaussian's mass fits the unit box:
    # the analytic coeffs integrate over R^dim while the interpolated path
    # periodizes over the box (at sigma=0.15 the two agree to ~5e-7).
    dim, N, sigma = 2, 16, 0.15
    grid = tc.interpolation_grid(dim=dim, N=N)
    r2 = (grid ** 2).sum(-1)
    vals = torch.exp(-r2 / sigma**2)
    interp = tc.interpolated_kernel_coeffs(vals)
    analytic = tc.gaussian_analytic_coeffs(sigma, dim=dim, N=N)
    assert torch.allclose(
        interp.real.to(torch.float32), analytic, atol=1e-5, rtol=0
    )

    rad = tc.radial_interpolation_grid(dim=dim, N=N)
    assert torch.allclose(rad, r2.sqrt(), atol=1e-6)


def test_gaussian_kernel_to_dense_matches_exact(rng):
    """Reference test_kernel.py:22-54: GaussianKernel end-to-end, batched,
    both scaling modes, to_dense vs the exact Gaussian matrix."""
    n_per, b, dim, N, m = 15, 2, 2, 16, 4
    n = n_per * b
    diameter = 10.0
    pos = torch.tensor(
        (diameter * (rng.random((n, dim)) - 0.5)).astype(np.float32)
    )
    batch = torch.arange(b).repeat_interleave(n_per)

    # absolute sigma + a-priori radius (test_kernel.py:24-35): the exact
    # Gaussian on the ORIGINAL points is the oracle
    kernel = tc.GaussianKernel(
        diameter, dim=dim, bandwidth=N, cutoff=m,
        shift_by_center=True, max_infinity_norm=diameter / 2,
    )
    matrix = kernel(pos, batch=batch)
    assert isinstance(matrix, tc.GramMatrix)
    assert matrix.is_symmetric()
    dense = matrix.to_dense()
    exact = tc.exact_gaussian_matrix(diameter, pos, batch=batch)
    rel = float((dense - exact).abs().max() / exact.abs().max())
    assert rel < 5e-2

    # relative sigma (per-call scale-by-norm, test_kernel.py:39-54): oracle
    # on the shifted + unit-infinity-norm-scaled points
    from torch_nfft_tpu.utils.points import (
        scale_points_by_norm,
        shift_points_by_center,
    )

    kernel = tc.GaussianKernel(1.0, dim=dim, bandwidth=N, cutoff=m)
    dense = kernel(pos, batch=batch).to_dense()
    shifted = shift_points_by_center(pos.numpy(), batch=batch.numpy())[0]
    scaled = scale_points_by_norm(
        shifted, batch=batch.numpy(), norm="infinity"
    )[0]
    exact = tc.exact_gaussian_matrix(1.0, np.asarray(scaled), batch=batch)
    rel = float((dense - exact).abs().max() / exact.abs().max())
    assert rel < 5e-2


def test_gram_matrix_class_symmetry_and_transpose(rng):
    n, dim, N, m = 25, 2, 8, 3
    src = _points(rng, n, dim)
    tgt = _points(rng, n + 5, dim)
    coeffs = tc.gaussian_analytic_coeffs(0.7, dim=dim, N=N)

    sym = tc.GramMatrix(coeffs, src, src)  # same tensor => symmetric
    assert sym.is_symmetric()  # fixed vs reference matrices.py:65
    asym = tc.GramMatrix(coeffs, src, tgt)
    assert not asym.is_symmetric()
    assert asym.shape == (n + 5, n)

    dense = asym.to_dense()
    dense_t = asym.T.to_dense()
    assert torch.allclose(dense_t, dense.T, atol=1e-5)
    assert torch.allclose(asym.column_sums(), dense.sum(0), atol=1e-4)


def test_adjacency_matrix_class_pipeline(rng):
    """sym-normalized Laplacian matvec == dense computation from the Gram
    to_dense (degrees, D^-1/2 A D^-1/2, shift), reference matrices.py:74-175
    with the apply_shift bug fixed."""
    n, dim, N, m = 30, 2, 8, 3
    pos = _points(rng, n, dim)
    kernel = tc.GaussianKernel(0.8, dim=dim, bandwidth=N, cutoff=m,
                               analytic=True, max_infinity_norm=1.0)
    adj = kernel.adjacency_matrix(
        pos, loop_weight=2.0, normalization="sym", shift="laplacian"
    )
    gram_dense = kernel(pos).to_dense().double()
    a_dense = gram_dense + (2.0 - 1.0) * torch.eye(n).double()
    deg = a_dense.sum(1)
    dinv = deg.rsqrt()
    lap = torch.eye(n).double() - dinv[:, None] * a_dense * dinv[None, :]

    x = torch.tensor(rng.standard_normal((n, 2)).astype(np.float32))
    got = adj @ x
    want = (lap @ x.double()).to(torch.float32)
    assert float((got - want).abs().max()) < 1e-4
    assert adj.is_symmetric()


def test_adjacency_left_normalization_transpose(rng):
    n, dim, N = 24, 2, 8
    pos = _points(rng, n, dim)
    kernel = tc.GaussianKernel(0.8, dim=dim, bandwidth=N, cutoff=3,
                               analytic=True, max_infinity_norm=1.0)
    adj = kernel.adjacency_matrix(pos, normalization="rw")
    assert not adj.is_symmetric()
    dense = adj.to_dense()
    dense_t = adj.T.to_dense()
    assert torch.allclose(dense_t, dense.T, atol=1e-5)
    # rows of a random-walk matrix sum to 1
    assert torch.allclose(dense.sum(1), torch.ones(n), atol=1e-4)


def test_class_matvec_autograd(rng):
    """torch autograd flows through `matrix @ x` (backward = A^T dy)."""
    n, dim, N, m = 25, 2, 8, 3
    pos = _points(rng, n, dim)
    kernel = tc.GaussianKernel(0.8, dim=dim, bandwidth=N, cutoff=m,
                               analytic=True, max_infinity_norm=1.0)
    matrix = kernel(pos)
    x = torch.tensor(rng.standard_normal((n, 1)).astype(np.float32))
    x.requires_grad_(True)
    loss = ((matrix @ x) ** 2).sum()
    loss.backward()

    eps = 1e-3
    xp = x.detach().clone()
    xp[11, 0] += eps
    lp = ((matrix @ xp) ** 2).sum()
    fd = (float(lp) - float(loss)) / eps
    assert abs(fd - float(x.grad[11, 0])) < 5e-2 * max(1.0, abs(fd))


def test_complex_input_adjoint(rng):
    """Complex x through the compat layer (CPU backend has complex FFT)."""
    n, N, m = 50, 16, 4
    pos = _points(rng, n, 2)
    x = torch.tensor(
        (rng.standard_normal((n, 1)) + 1j * rng.standard_normal((n, 1))).astype(
            np.complex64
        )
    )
    y = tc.nfft_adjoint(x, pos, bandwidth=N, cutoff=m)
    ref = tc.ndft_adjoint(x, pos, N=N)
    rel = torch.linalg.norm(y - ref) / torch.linalg.norm(ref)
    assert float(rel) < 1e-3


def test_radial_kernels_match_jax_layer(rng):
    """The torch radial veneers produce the same dense operators as the
    JAX RadialKernel family they wrap."""
    import torch_nfft_tpu as tn

    pos_np = ((rng.random((40, 2)) * 2 - 1) * 3.0).astype(np.float32)
    pos = torch.tensor(pos_np)

    for tc_cls, tn_cls, kwargs in [
        (tc.LaplaceKernel, tn.LaplaceKernel, dict(sigma=1.0)),
        (tc.MaternKernel, tn.MaternKernel, dict(sigma=1.0, nu=1.5)),
        (tc.InverseMultiquadricKernel, tn.InverseMultiquadricKernel,
         dict(sigma=1.0)),
    ]:
        kt = tc_cls(dim=2, bandwidth=16, cutoff=4, **kwargs)
        kj = tn_cls(dim=2, bandwidth=16, cutoff=4, **kwargs)
        A_t = kt(pos).to_dense()
        A_j = np.asarray(kj(pos_np).to_dense())
        assert isinstance(A_t, torch.Tensor)
        assert np.abs(A_t.numpy() - A_j).max() < 1e-6


def test_radial_custom_profile_and_matvec_autograd(rng):
    """Custom profile through the torch veneer; matvec supports autograd
    through the operator like the other torch matrices."""
    pos = torch.tensor(((rng.random((30, 2)) * 2 - 1)).astype(np.float32))
    k = tc.RadialKernel(lambda r: np.exp(-r * r), dim=2, bandwidth=16, cutoff=4)
    mat = k(pos)
    x = torch.tensor(rng.standard_normal((30,)).astype(np.float32),
                     requires_grad=True)
    y = mat @ x
    y.sum().backward()
    assert x.grad is not None and torch.isfinite(x.grad).all()
