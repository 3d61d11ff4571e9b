"""Randomized configuration sweep: adjoint/forward vs the dense oracle over
many (dim, N, m, batch, columns, dtype-shape) combinations in one test."""

import numpy as np
import pytest

import torch_nfft_tpu as tn


@pytest.mark.parametrize("seed", range(6))
def test_random_config_roundtrip(seed):
    rng = np.random.default_rng(1000 + seed)
    dim = int(rng.integers(1, 4))
    N = int(2 ** rng.integers(3, 5 if dim == 3 else 6))
    m = int(rng.integers(2, 5))
    B = int(rng.integers(1, 4))
    C = int(rng.integers(1, 4))
    n = int(rng.integers(30, 120)) * B

    pos = (rng.random((n, dim)) - 0.5).astype(np.float32)
    pos /= 4 * np.abs(pos).max()
    batch = np.repeat(np.arange(B, dtype=np.int32), n // B)
    x = rng.standard_normal((n, C)).astype(np.float32)

    got = np.asarray(tn.nfft_adjoint(x, pos, batch, bandwidth=N, cutoff=m, batch_size=B))
    ref = np.stack(
        [np.asarray(tn.ndft_adjoint(x[batch == b], pos[batch == b], N=N)) for b in range(B)]
    ).reshape(got.shape)
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    # window truncation error compounds roughly per dimension
    tol = {2: 6e-3, 3: 1.2e-3, 4: 3e-4}[m] * dim
    assert rel < tol, (dim, N, m, B, C, n, rel)

    # forward of the spectrum matches the oracle too
    y = np.asarray(tn.nfft_forward(got.astype(np.complex64), pos, batch, cutoff=m, batch_size=B))
    y_ref = np.concatenate(
        [np.asarray(tn.ndft_forward(ref.reshape((B,) + (N,) * dim + (C,))[b : b + 1].astype(np.complex64), pos[batch == b])) for b in range(B)]
    )
    rel2 = np.linalg.norm(y - y_ref) / np.linalg.norm(y_ref)
    assert rel2 < 2 * tol, (dim, N, m, B, C, n, rel2)
