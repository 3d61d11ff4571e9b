"""Forward NFFT vs the dense NDFT oracle + adjoint/forward duality."""

import numpy as np
import pytest

import torch_nfft_tpu as tn

from helpers import make_points, rel_err

CASES = [
    (1, 1, 10, 1, 128, 4, 1e-3),
    (1, 2, 100, 3, 64, 4, 1e-3),
    (2, 1, 10, 5, 16, 4, 5e-4),  # the reference test_forward.py config
    (2, 3, 200, 4, 16, 4, 5e-4),
    (3, 2, 50, 2, 8, 3, 5e-3),
]


@pytest.mark.parametrize("dim,batches,n,c,N,m,tol", CASES)
def test_forward_matches_ndft(rng, dim, batches, n, c, N, m, tol):
    pos, batch = make_points(rng, n, dim, batches)
    x = rng.random((batches,) + (N,) * dim + (c,), dtype=np.float32)

    y_nfft = tn.nfft_forward(x, pos, batch, cutoff=m)
    y_ndft = tn.ndft_forward(x, pos, batch)

    assert y_nfft.shape == (pos.shape[0], c)
    assert rel_err(y_nfft, y_ndft) < tol


def test_forward_complex(rng):
    dim, n, N, m = 2, 150, 16, 4
    pos, _ = make_points(rng, n, dim)
    x = (rng.random((1,) + (N,) * dim + (2,)) + 1j * rng.random((1,) + (N,) * dim + (2,))).astype(
        np.complex64
    )
    y = tn.nfft_forward(x, pos, cutoff=m)
    y_ref = tn.ndft_forward(x, pos)
    assert rel_err(y, y_ref) < 5e-4


def test_forward_real_output(rng):
    pos, _ = make_points(rng, 60, 1)
    x = rng.random((1, 16, 2), dtype=np.float32)
    y_c = tn.nfft_forward(x, pos, cutoff=4)
    y_r = tn.nfft_forward(x, pos, cutoff=4, real_output=True)
    np.testing.assert_allclose(np.asarray(y_c.real), np.asarray(y_r))


def test_forward_no_trailing_dims(rng):
    pos, _ = make_points(rng, 60, 2)
    x = rng.random((1, 16, 16), dtype=np.float32)
    y = tn.nfft_forward(x, pos, cutoff=4)
    assert y.shape == (60,)


def test_adjoint_forward_duality(rng):
    """<adjoint(x), y> == <x, conj(forward(conj(y)))>: the two transforms are
    (conjugate-)transposes of each other, matching the reference autograd
    pairing (nfft.py:23-28, 48-54)."""
    dim, n, N, m = 2, 120, 16, 4
    pos, _ = make_points(rng, n, dim)
    x = (rng.random((n, 1)) + 1j * rng.random((n, 1))).astype(np.complex64)
    y = (rng.random((1,) + (N,) * dim + (1,)) + 1j * rng.random((1,) + (N,) * dim + (1,))).astype(
        np.complex64
    )

    ax = np.asarray(tn.nfft_adjoint(x, pos, bandwidth=N, cutoff=m))
    aty = np.asarray(tn.nfft_forward(y, pos, cutoff=m))

    lhs = np.vdot(np.asarray(y), ax)  # <y, A x>
    rhs = np.vdot(aty, np.asarray(x))  # <A^H y, x>
    assert abs(lhs - rhs) / abs(lhs) < 1e-5


def test_roundtrip_projection(rng):
    """forward(adjoint(.)) on well-separated frequencies reproduces scaled
    input structure: sanity check of index conventions via a pure tone."""
    N, m = 32, 6
    # A pure tone x_j = exp(-2 pi i k0 pos_j): the adjoint sums
    # x_j * exp(+2 pi i k pos_j), so spectral mass concentrates at k = k0.
    pos = (np.linspace(-0.25, 0.25, 64, endpoint=False, dtype=np.float32)).reshape(-1, 1)
    k0 = 5
    x = np.exp(-2j * np.pi * k0 * pos[:, 0]).astype(np.complex64)
    y = np.asarray(tn.nfft_adjoint(x, pos, bandwidth=N, cutoff=m))[0]
    peak = np.argmax(np.abs(y))
    assert peak == k0 + N // 2
