"""RadialKernel front-ends: arbitrary radial profiles through the
interpolated-coeffs workflow (reference kernelmatrices.rst:158-163), with
the GaussianKernel scaling semantics (reference kernel.py:69-116) and
generic boundary regularization (unimplemented in the reference,
kernel_coeffs.cu:67-69)."""

import jax
import numpy as np
import pytest

import torch_nfft_tpu as tn

from helpers import max_err


def _points(rng, n=60, dim=2, spread=3.0, batches=1):
    pts = ((rng.random((n * batches, dim)) * 2 - 1) * spread).astype(np.float32)
    batch = None if batches <= 1 else (np.arange(n * batches) // n).astype(np.int32)
    return pts, batch


def _norm_scaled_oracle(kernel, pos, batch=None):
    """Dense profile matrix on equivalently pre-shifted, norm-scaled points
    (same pattern as test_kernel._expected_dense)."""
    src, _ = tn.shift_points_by_center(pos, None, batch, batch)
    src, _ = tn.scale_points_by_norm(
        src, None, batch, batch, factor=1.0, norm=kernel.scale_by_norm
    )
    return np.asarray(tn.exact_radial_matrix(kernel.profile, np.asarray(src),
                                             batch=batch))


def test_laplace_scale_by_norm(rng):
    kernel = tn.LaplaceKernel(1.0, dim=2, bandwidth=32, cutoff=4)
    pos, _ = _points(rng, 60, 2)
    A = np.asarray(kernel(pos).to_dense())
    # Laplace's origin cusp bounds the truncation error at N=32.
    assert max_err(A, _norm_scaled_oracle(kernel, pos)) < 5e-2


def test_nfft_error_isolated_from_truncation(rng):
    """Against the dense trigonometric matrix of the same coefficients the
    NFFT machinery itself is near-exact (truncation excluded) — the error
    decomposition pattern of reference test_fastsum.py:41-63."""
    kernel = tn.MaternKernel(1.0, nu=1.5, dim=2, bandwidth=16, cutoff=4)
    pos, _ = _points(rng, 60, 2)
    A = np.asarray(kernel(pos).to_dense())
    src, _ = tn.shift_points_by_center(pos, None, None, None)
    src, _ = tn.scale_points_by_norm(
        src, None, None, None, factor=kernel.factor, norm=kernel.scale_by_norm
    )
    A_trig = np.asarray(
        tn.exact_trigonometric_matrix(kernel.coeffs, np.asarray(src)).real
    )
    assert max_err(A, A_trig) < 1e-4


@pytest.mark.parametrize("nu,tol", [(0.5, 5e-2), (1.5, 2e-2), (2.5, 2e-2)])
def test_matern(rng, nu, tol):
    kernel = tn.MaternKernel(1.0, nu=nu, dim=2, bandwidth=16, cutoff=4)
    pos, _ = _points(rng, 60, 2)
    A = np.asarray(kernel(pos).to_dense())
    assert max_err(A, _norm_scaled_oracle(kernel, pos)) < tol


def test_matern_rejects_unsupported_nu():
    with pytest.raises(ValueError, match="nu"):
        tn.MaternKernel(1.0, nu=1.0)


def test_inverse_multiquadric(rng):
    kernel = tn.InverseMultiquadricKernel(1.0, dim=2, bandwidth=16, cutoff=4)
    pos, _ = _points(rng, 60, 2)
    A = np.asarray(kernel(pos).to_dense())
    assert max_err(A, _norm_scaled_oracle(kernel, pos)) < 2e-2


def test_custom_profile_matches_gaussian_kernel(rng):
    """A RadialKernel with the Gaussian profile reproduces GaussianKernel's
    interpolated-coeffs operator."""
    sigma = 1.0
    rk = tn.RadialKernel(
        lambda r: np.exp(-(r / sigma) ** 2), dim=2, bandwidth=16, cutoff=4
    )
    gk = tn.GaussianKernel(sigma, dim=2, bandwidth=16, cutoff=4)
    pos, _ = _points(rng, 50, 2)
    A_r = np.asarray(rk(pos).to_dense())
    A_g = np.asarray(gk(pos).to_dense())
    assert max_err(A_r, A_g) < 1e-4


def test_apriori_radius_mode_original_units(rng):
    """With an explicit radius, the profile receives original-unit distances:
    the operator approximates profile(||s - t||) on the shifted points."""
    pos, _ = _points(rng, 60, 2, spread=2.0)
    radius = float(np.abs(pos - pos.mean(0)).max()) * 1.01
    kernel = tn.MaternKernel(
        2.0, nu=1.5, dim=2, bandwidth=32, cutoff=4, max_infinity_norm=radius
    )
    A = np.asarray(kernel(pos).to_dense())
    src, _ = tn.shift_points_by_center(pos)
    A_exact = np.asarray(tn.exact_radial_matrix(kernel.profile, np.asarray(src)))
    assert max_err(A, A_exact) < 2e-2


def test_regularization_improves_boundary(rng):
    """Boundary regularization (generic Hermite continuation) shrinks the
    periodization error of a smooth slowly-decaying kernel by well over 5x
    on pairs inside the unregularized range."""
    pos, _ = _points(rng, 80, 2, spread=2.0)
    radius = float(np.abs(pos - pos.mean(0)).max()) * 1.01
    src, _ = tn.shift_points_by_center(pos)
    src = np.asarray(src)
    D = np.sqrt(((src[:, None, :] - src[None, :, :]) ** 2).sum(-1))
    prof = lambda r: 1.0 / np.sqrt(1.0 + r * r)
    A_exact = np.asarray(tn.exact_radial_matrix(prof, src))

    errs = {}
    for p, eps in [(-1, 0.0), (2, 0.125)]:
        k = tn.InverseMultiquadricKernel(
            1.0, dim=2, bandwidth=32, cutoff=4,
            max_euclidean_norm=radius, reg_degree=p, reg_width=eps,
        )
        A = np.asarray(k(pos).to_dense())
        mask = k.factor * D < (0.5 - eps) * 0.999
        errs[p] = np.abs(A - A_exact)[mask].max()

    assert errs[2] < errs[-1] / 5


def test_batched_block_diagonal(rng):
    kernel = tn.LaplaceKernel(1.0, dim=2, bandwidth=32, cutoff=4)
    pos, batch = _points(rng, 40, 2, batches=2)
    A = np.asarray(kernel(pos, batch=batch).to_dense())
    A_exp = _norm_scaled_oracle(kernel, pos, batch=batch)
    assert max_err(A, A_exp) < 5e-2
    # off-diagonal blocks are exactly zero (independent batches)
    assert np.abs(A[:40, 40:]).max() == 0.0


def test_adjacency_path(rng):
    kernel = tn.MaternKernel(1.0, nu=1.5, dim=2, bandwidth=16, cutoff=4)
    pos, _ = _points(rng, 50, 2)
    adj = kernel.adjacency_matrix(pos, loop_weight=0, normalization="sym")
    A = np.asarray(adj.to_dense())
    assert np.all(np.isfinite(A))
    A_gram = np.asarray(kernel(pos).to_dense())
    deg = A_gram.sum(1) - 1.0  # loop_weight 0 => diagonal offset -1
    expected = (A_gram - np.eye(50)) / np.sqrt(deg[:, None] * deg[None, :])
    assert max_err(A, expected) < 1e-3


def test_pytree_roundtrip():
    kernel = tn.MaternKernel(1.0, nu=2.5, dim=2, bandwidth=16, cutoff=4)
    k2 = jax.tree.map(lambda x: x, kernel)
    assert type(k2) is tn.MaternKernel
    assert k2.nu == kernel.nu and k2.sigma == kernel.sigma
    assert np.allclose(np.asarray(k2.coeffs), np.asarray(kernel.coeffs))


def test_regularized_requires_width():
    with pytest.raises(ValueError, match="reg_width"):
        tn.LaplaceKernel(1.0, dim=2, bandwidth=16, reg_degree=2, reg_width=0.0,
                         max_euclidean_norm=1.0)


def test_complex_coeffs_slot_path(rng):
    """GramMatrix.apply_slot/solve with interpolated (complex-dtype) coeffs:
    the slot-layout fastsum coerces them real before nfft_fastsum_real
    (models/matrices.py _fastsum_slot), matching the user-order path."""
    import jax.numpy as jnp

    kernel = tn.MaternKernel(0.8, nu=1.5, dim=2, bandwidth=16, cutoff=3)
    assert jnp.issubdtype(kernel.coeffs.dtype, jnp.complexfloating)

    pos, _ = _points(rng, 70, 2)
    G = kernel(pos)
    v = rng.standard_normal(70).astype(np.float32)

    want = np.asarray(G @ v)  # user-order path (trailing .real)
    vs = G.to_slot(v)  # (1, S*K) slot vector
    got = np.asarray(G.from_slot(G.apply_slot(vs)))[:, 0]
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    z = np.asarray(G.solve(v, reg=1e-1))
    resid = np.asarray(G @ z) + 1e-1 * z - v
    assert np.linalg.norm(resid) / np.linalg.norm(v) < 1e-4
