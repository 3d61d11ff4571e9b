"""Binned (sort + dense-tile) spread/gather vs the scatter reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import torch_nfft_tpu as tn
from torch_nfft_tpu.ops.binned import build_plan, gather_binned, spread_binned
from torch_nfft_tpu.ops.spread_gather import _gather_scatter, _spread_scatter


def _points(rng, n, dim, batch_size, full_box=False):
    pos = (rng.random((n, dim)) - 0.5).astype(np.float32)
    if not full_box:
        pos /= 4 * np.abs(pos).max()
    batch = np.repeat(np.arange(batch_size, dtype=np.int32), n // batch_size)
    return pos, batch


@pytest.mark.parametrize("dim,N", [(1, 16), (2, 16), (3, 8)])
@pytest.mark.parametrize("full_box", [False, True])
def test_spread_binned_matches_scatter(rng, dim, N, full_box):
    n, m, B, C = 96, 3, 2, 3
    pos, batch = _points(rng, n, dim, B, full_box)
    x = rng.standard_normal((n, C)).astype(np.float32)
    plan = build_plan(pos, batch, N=N, m=m, batch_size=B)
    got = spread_binned(plan, jnp.asarray(x), jnp.asarray(pos), batch_size=B)
    ref = _spread_scatter(
        jnp.asarray(x), jnp.asarray(pos), jnp.asarray(batch), B, N, m, 2.0, None
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("dim,N", [(1, 16), (2, 16), (3, 8)])
def test_gather_binned_matches_scatter(rng, dim, N):
    n, m, B, C = 96, 3, 2, 3
    M = 2 * N
    pos, batch = _points(rng, n, dim, B)
    g = rng.standard_normal((B * M**dim, C)).astype(np.float32)
    plan = build_plan(pos, batch, N=N, m=m, batch_size=B)
    got = gather_binned(plan, jnp.asarray(g), jnp.asarray(pos))
    ref = _gather_scatter(
        jnp.asarray(g), jnp.asarray(pos), jnp.asarray(batch), N, m, 2.0, None
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_small_capacity_multirow(rng):
    """Tiles holding more points than K points split into multiple rows."""
    n, dim, N, m = 64, 2, 8, 2
    pos = (rng.random((n, dim)).astype(np.float32) - 0.5) * 0.02  # all in one tile
    batch = np.zeros((n,), np.int32)
    x = rng.standard_normal((n, 1)).astype(np.float32)
    plan = build_plan(pos, batch, N=N, m=m, batch_size=1, K=8)
    assert plan.slot_pt.shape[0] >= n // 8
    got = spread_binned(plan, jnp.asarray(x), jnp.asarray(pos), batch_size=1)
    ref = _spread_scatter(
        jnp.asarray(x), jnp.asarray(pos), jnp.asarray(batch), 1, N, m, 2.0, None
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_binned_strategy_in_nfft(rng):
    """strategy='binned' end to end vs the default path, incl. plan reuse."""
    n, dim, N, m, B = 80, 2, 16, 4, 2
    pos, batch = _points(rng, n, dim, B)
    x = rng.standard_normal((n, 2)).astype(np.float32)
    ref = tn.nfft_adjoint(x, pos, batch, bandwidth=N, cutoff=m, batch_size=B)
    got = tn.nfft_adjoint(
        x, pos, batch, bandwidth=N, cutoff=m, batch_size=B, strategy="binned"
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)

    plan = build_plan(pos, batch, N=N, m=m, batch_size=B)
    got2 = tn.nfft_adjoint(
        x, pos, batch, bandwidth=N, cutoff=m, batch_size=B, plan=plan
    )
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref), rtol=1e-5, atol=1e-5)

    y = tn.nfft_forward(ref, pos, batch, cutoff=m, batch_size=B, plan=plan)
    y_ref = tn.nfft_forward(ref, pos, batch, cutoff=m, batch_size=B)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-5, atol=1e-4)


def test_binned_gradients_match(rng):
    """Value and position gradients agree between binned and scatter paths."""
    n, dim, N, m = 40, 2, 8, 3
    pos, batch = _points(rng, n, dim, 1)
    x = rng.standard_normal((n, 2)).astype(np.float32)
    plan = build_plan(pos, batch, N=N, m=m, batch_size=1)

    def loss_binned(x, pos):
        g = spread_binned(plan, x, pos, batch_size=1)
        return jnp.sum(g**2)

    def loss_scatter(x, pos):
        g = _spread_scatter(x, pos, jnp.asarray(batch), 1, N, m, 2.0, None)
        return jnp.sum(g**2)

    gx_b, gp_b = jax.grad(loss_binned, argnums=(0, 1))(jnp.asarray(x), jnp.asarray(pos))
    gx_s, gp_s = jax.grad(loss_scatter, argnums=(0, 1))(jnp.asarray(x), jnp.asarray(pos))
    np.testing.assert_allclose(np.asarray(gx_b), np.asarray(gx_s), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gp_b), np.asarray(gp_s), rtol=1e-4, atol=1e-3)
