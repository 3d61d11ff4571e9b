"""All spread/gather strategies must agree (scatter is the semantic anchor)."""

import jax.numpy as jnp
import numpy as np
import pytest

import torch_nfft_tpu as tn
from torch_nfft_tpu.ops.spread_gather import (
    _gather_matmul,
    _gather_scatter,
    _spread_matmul,
    _spread_scatter,
    gather,
    spread,
)

from helpers import make_points


@pytest.mark.parametrize("dim,N,m,batches", [(1, 32, 4, 1), (1, 16, 3, 3), (2, 16, 4, 2), (3, 8, 2, 2)])
def test_spread_matmul_equals_scatter(rng, dim, N, m, batches):
    n = 64
    pos, batch = make_points(rng, n, dim, batches)
    if batch is None:
        batch = np.zeros(n, dtype=np.int32)
    x = jnp.asarray(rng.random((pos.shape[0], 3), dtype=np.float32))

    g_sc = _spread_scatter(x, jnp.asarray(pos), jnp.asarray(batch), batches, N, m, 2.0, None)
    g_mm = _spread_matmul(x, jnp.asarray(pos), jnp.asarray(batch), batches, N, m, 2.0)
    np.testing.assert_allclose(np.asarray(g_sc), np.asarray(g_mm), atol=2e-5)


@pytest.mark.parametrize("dim,N,m,batches", [(1, 32, 4, 1), (2, 16, 4, 2), (3, 8, 2, 2)])
def test_gather_matmul_equals_scatter(rng, dim, N, m, batches):
    n = 64
    M = 2 * N
    pos, batch = make_points(rng, n, dim, batches)
    if batch is None:
        batch = np.zeros(n, dtype=np.int32)
    g = jnp.asarray(
        (rng.random((batches * M**dim, 2)) + 1j * rng.random((batches * M**dim, 2))).astype(
            np.complex64
        )
    )
    y_sc = _gather_scatter(g, jnp.asarray(pos), jnp.asarray(batch), N, m, 2.0, None)
    y_mm = _gather_matmul(g, jnp.asarray(pos), jnp.asarray(batch), batches, N, m, 2.0)
    np.testing.assert_allclose(np.asarray(y_sc), np.asarray(y_mm), atol=2e-4)


def test_chunked_spread_equals_unchunked(rng):
    dim, N, m, n = 2, 16, 4, 200
    pos, _ = make_points(rng, n, dim)
    batch = jnp.zeros(n, dtype=jnp.int32)
    x = jnp.asarray(rng.random((n, 2), dtype=np.float32))

    g_full = _spread_scatter(x, jnp.asarray(pos), batch, 1, N, m, 2.0, None)
    g_chunk = _spread_scatter(x, jnp.asarray(pos), batch, 1, N, m, 2.0, 37)
    np.testing.assert_allclose(np.asarray(g_full), np.asarray(g_chunk), atol=2e-5)


def test_chunked_gather_equals_unchunked(rng):
    dim, N, m, n = 2, 16, 4, 200
    M = 2 * N
    pos, _ = make_points(rng, n, dim)
    batch = jnp.zeros(n, dtype=jnp.int32)
    g = jnp.asarray(
        (rng.random((M**dim, 2)) + 1j * rng.random((M**dim, 2))).astype(np.complex64)
    )
    y_full = _gather_scatter(g, jnp.asarray(pos), batch, N, m, 2.0, None)
    y_chunk = _gather_scatter(g, jnp.asarray(pos), batch, N, m, 2.0, 37)
    np.testing.assert_allclose(np.asarray(y_full), np.asarray(y_chunk), atol=2e-4)


def test_strategy_kwarg_threading(rng):
    """nfft_adjoint(strategy=...) produces consistent results end to end."""
    pos, _ = make_points(rng, 100, 2)
    x = rng.random((100, 2), dtype=np.float32)
    ys = np.asarray(tn.nfft_adjoint(x, pos, bandwidth=16, cutoff=4, strategy="scatter"))
    ym = np.asarray(tn.nfft_adjoint(x, pos, bandwidth=16, cutoff=4, strategy="matmul"))
    ya = np.asarray(tn.nfft_adjoint(x, pos, bandwidth=16, cutoff=4, strategy="auto"))
    np.testing.assert_allclose(ys, ym, atol=5e-5)
    np.testing.assert_allclose(ys, ya, atol=5e-5)
