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
