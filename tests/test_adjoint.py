"""Adjoint NFFT vs the dense NDFT oracle.

Upgrade of the reference's print-only script (test/test_adjoint.py) into
asserted tolerances, parametrized over dimension, batching, dtype and
strategy.
"""

import numpy as np
import pytest

import torch_nfft_tpu as tn

from helpers import make_points, rel_err

# (dim, batches, n_per_batch, cols, N, m, tol)
CASES = [
    (1, 1, 500, 1, 64, 4, 5e-4),
    (1, 3, 200, 4, 16, 4, 5e-4),
    (2, 1, 300, 2, 16, 4, 5e-4),
    (2, 3, 1000, 10, 16, 4, 5e-4),  # the reference test_adjoint.py config
    (3, 2, 100, 2, 8, 3, 5e-3),
]


@pytest.mark.parametrize("dim,batches,n,c,N,m,tol", CASES)
def test_adjoint_matches_ndft(rng, dim, batches, n, c, N, m, tol):
    pos, batch = make_points(rng, n, dim, batches)
    x = rng.random((pos.shape[0], c), dtype=np.float32)

    y_nfft = tn.nfft_adjoint(x, pos, batch, bandwidth=N, cutoff=m)
    y_ndft = tn.ndft_adjoint(x, pos, batch, N=N)

    assert y_nfft.shape == (batches,) + (N,) * dim + (c,)
    assert rel_err(y_nfft, y_ndft) < tol


def test_adjoint_complex_input(rng):
    dim, n, N, m = 2, 200, 16, 4
    pos, _ = make_points(rng, n, dim)
    x = (rng.random((n, 3)) + 1j * rng.random((n, 3))).astype(np.complex64)

    y_nfft = tn.nfft_adjoint(x, pos, bandwidth=N, cutoff=m)
    y_ndft = tn.ndft_adjoint(x, pos, N=N)
    assert rel_err(y_nfft, y_ndft) < 5e-4


def test_adjoint_real_output(rng):
    pos, _ = make_points(rng, 100, 2)
    x = rng.random((100, 2), dtype=np.float32)
    y_c = tn.nfft_adjoint(x, pos, bandwidth=16, cutoff=4)
    y_r = tn.nfft_adjoint(x, pos, bandwidth=16, cutoff=4, real_output=True)
    np.testing.assert_allclose(np.asarray(y_c.real), np.asarray(y_r), rtol=0, atol=0)
    assert not np.iscomplexobj(np.asarray(y_r))


def test_adjoint_trailing_dims(rng):
    """Arbitrary trailing column dims are transformed independently."""
    pos, _ = make_points(rng, 120, 1)
    x = rng.random((120, 2, 3), dtype=np.float32)
    y = tn.nfft_adjoint(x, pos, bandwidth=16, cutoff=4)
    assert y.shape == (1, 16, 2, 3)
    y_flat = tn.nfft_adjoint(x.reshape(120, 6), pos, bandwidth=16, cutoff=4)
    np.testing.assert_array_equal(np.asarray(y).reshape(1, 16, 6), np.asarray(y_flat))


def test_adjoint_1d_column_vector(rng):
    """x with no trailing dims (shape (n,)) works like a single column."""
    pos, _ = make_points(rng, 80, 1)
    x = rng.random((80,), dtype=np.float32)
    y = tn.nfft_adjoint(x, pos, bandwidth=16, cutoff=4)
    assert y.shape == (1, 16)
    y_ndft = tn.ndft_adjoint(x, pos, N=16)
    assert rel_err(y, y_ndft) < 5e-4


def test_adjoint_accuracy_improves_with_cutoff(rng):
    pos, _ = make_points(rng, 300, 2)
    x = rng.random((300, 2), dtype=np.float32)
    y_ref = tn.ndft_adjoint(x, pos, N=16)
    errs = [
        rel_err(tn.nfft_adjoint(x, pos, bandwidth=16, cutoff=m), y_ref)
        for m in (2, 4, 6)
    ]
    assert errs[0] > errs[1] > errs[2]


def test_adjoint_jit_with_static_batch_size(rng):
    import jax

    pos, batch = make_points(rng, 50, 2, batches=2)
    x = rng.random((100, 3), dtype=np.float32)

    fn = jax.jit(
        lambda x, p, b: tn.nfft_adjoint(x, p, b, bandwidth=16, cutoff=4, batch_size=2)
    )
    y = fn(x, pos, batch)
    y_ref = tn.nfft_adjoint(x, pos, batch, bandwidth=16, cutoff=4)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-6)
