"""Row-batched Pallas engines (R rows per grid step) vs the per-row path.

The row-batched kernels amortize the ~1 us/step fixed cost of the per-row
kernels (BASELINE.md round-4 profile); math must be identical: fused
per-lane window batch, per-row dots, and the dense tile array composed as
first-row take + exact overflow scatter (ops/binned.py:_dense_from_rowtiles).
Runs in interpret mode on CPU.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from torch_nfft_tpu.ops.binned import (
    _dense_tiles_pallas,
    _gather_dft_pallas,
    _row_batch,
    _spread_dft_pallas,
    build_plan,
    gather_binned_dft_slot,
    spread_binned_dft_slot,
    to_slot_order,
)
from torch_nfft_tpu.ops.plan_stack import pad_plan_rows


def _points(rng, n, dim, B=1):
    pos = (rng.random((n, dim), dtype=np.float32) - 0.5)
    pos /= 4 * np.abs(pos).max()
    if B == 1:
        return pos, np.zeros((n,), np.int32)
    batch = np.sort(rng.integers(0, B, n)).astype(np.int32)
    batch[0] = 0
    batch[-1] = B - 1
    return pos, batch


@pytest.fixture
def rng():
    return np.random.default_rng(17)


def _ab(monkeypatch, fn):
    """Run fn once with the row-batched engines forced on (R=4) and once
    with them off; return both results."""
    monkeypatch.setenv("TORCH_NFFT_TPU_KERNEL_PRECISION", "highest")
    monkeypatch.setenv("TORCH_NFFT_TPU_ROW_BATCH", "4")
    on = fn()
    monkeypatch.setenv("TORCH_NFFT_TPU_ROW_BATCH", "0")
    off = fn()
    return on, off


@pytest.mark.parametrize("dim,N,n", [(3, 8, 300), (2, 16, 400)])
def test_rb_spread_dense_matches(rng, monkeypatch, dim, N, n):
    pos, batch = _points(rng, n, dim, B=2)
    plan = build_plan(pos, batch, N=N, m=2, batch_size=2, K=128)
    assert plan.S_occ is not None
    monkeypatch.setenv("TORCH_NFFT_TPU_ROW_BATCH", "4")
    assert _row_batch(plan, 2) > 0  # forced; auto gates on halo-tile size
    x = jnp.asarray(rng.standard_normal((n, 2)).astype(np.float32))

    on, off = _ab(
        monkeypatch,
        lambda: _spread_dft_pallas(plan, x, jnp.asarray(pos), 2),
    )
    np.testing.assert_allclose(np.asarray(on), np.asarray(off),
                               rtol=1e-5, atol=1e-5)


def test_rb_multirow_tiles_overflow(rng, monkeypatch):
    """Tiles with multiple rows exercise the overflow scatter: cram points
    into few tiles so most tiles need several K=128 rows."""
    dim, N, n = 3, 8, 3000
    pos = (rng.random((n, dim), dtype=np.float32) - 0.5) * 0.08  # tight blob
    batch = np.zeros((n,), np.int32)
    plan = build_plan(pos, batch, N=N, m=2, batch_size=1, K=128)
    S = plan.slot_pt.shape[0]
    assert S - plan.S_occ > 0  # real overflow rows exist
    x = jnp.asarray(rng.standard_normal((n, 1)).astype(np.float32))

    on, off = _ab(
        monkeypatch,
        lambda: _spread_dft_pallas(plan, x, jnp.asarray(pos), 1),
    )
    np.testing.assert_allclose(np.asarray(on), np.asarray(off),
                               rtol=1e-5, atol=1e-5)


def test_rb_gather_matches(rng, monkeypatch):
    dim, N, n = 3, 8, 400
    pos, batch = _points(rng, n, dim)
    plan = build_plan(pos, batch, N=N, m=2, batch_size=1, K=128)
    M = plan.M
    rng2 = np.random.default_rng(5)
    # a DFT-layout grid (B, L1, L2, C, L0)
    from torch_nfft_tpu.ops.tilefold import active_axes

    axes = active_axes(plan, False)
    L = [a * plan.T for _, a in axes]
    g = jnp.asarray(rng2.standard_normal((1, L[1], L[2], 2, L[0]))
                    .astype(np.float32))

    on, off = _ab(
        monkeypatch,
        lambda: _gather_dft_pallas(plan, g, jnp.asarray(pos)),
    )
    np.testing.assert_allclose(np.asarray(on), np.asarray(off),
                               rtol=1e-5, atol=1e-5)


def test_rb_padded_plan_rows(rng, monkeypatch):
    """pad_plan_rows keeps S_occ; padded rows must contribute exact zeros
    through the row-batched composition (and land in the overflow set)."""
    dim, N, n = 3, 8, 300
    pos, batch = _points(rng, n, dim)
    plan = build_plan(pos, batch, N=N, m=2, batch_size=1, K=128)
    S = plan.slot_pt.shape[0]
    padded = pad_plan_rows(plan, S + 5)
    assert padded.S_occ == plan.S_occ
    x = jnp.asarray(rng.standard_normal((n, 1)).astype(np.float32))

    monkeypatch.setenv("TORCH_NFFT_TPU_KERNEL_PRECISION", "highest")
    monkeypatch.setenv("TORCH_NFFT_TPU_ROW_BATCH", "4")
    a = _spread_dft_pallas(padded, x, jnp.asarray(pos), 1)
    b = _spread_dft_pallas(plan, x, jnp.asarray(pos), 1)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)


def test_rb_slot_layout(rng, monkeypatch):
    dim, N, n = 3, 8, 300
    pos, batch = _points(rng, n, dim)
    plan = build_plan(pos, batch, N=N, m=2, batch_size=1, K=128)
    x = jnp.asarray(rng.standard_normal((n, 2)).astype(np.float32))
    xs = to_slot_order(plan, x)

    on, off = _ab(
        monkeypatch,
        lambda: spread_binned_dft_slot(plan, xs, batch_size=1),
    )
    np.testing.assert_allclose(np.asarray(on), np.asarray(off),
                               rtol=1e-5, atol=1e-5)

    on2, off2 = _ab(
        monkeypatch,
        lambda: gather_binned_dft_slot(plan, on),
    )
    np.testing.assert_allclose(np.asarray(on2), np.asarray(off2),
                               rtol=1e-5, atol=1e-5)


def test_rb_grad_through_custom_vjp(rng, monkeypatch):
    """jax.grad w.r.t. values and positions through the rb spread (the
    custom_vjp backward rides the rb gather + the per-row pos-grad
    kernel)."""
    monkeypatch.setenv("TORCH_NFFT_TPU_KERNEL_PRECISION", "highest")
    from torch_nfft_tpu.ops.binned import _spread_dft_pallas_cv, _spread_dft_xla

    dim, N, n = 3, 8, 200
    pos, batch = _points(rng, n, dim)
    plan = build_plan(pos, batch, N=N, m=2, batch_size=1, K=128)
    x = rng.standard_normal((n, 1)).astype(np.float32)

    def loss_rb(x, p):
        return jnp.sum(_spread_dft_pallas_cv(1, False, plan, x, p) ** 2)

    def loss_ref(x, p):
        return jnp.sum(_spread_dft_xla(plan, x, p, 1, False) ** 2)

    monkeypatch.setenv("TORCH_NFFT_TPU_ROW_BATCH", "4")
    gx, gp = jax.grad(loss_rb, argnums=(0, 1))(jnp.asarray(x),
                                               jnp.asarray(pos))
    gx_r, gp_r = jax.grad(loss_ref, argnums=(0, 1))(jnp.asarray(x),
                                                    jnp.asarray(pos))
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_r),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gp_r),
                               rtol=1e-4, atol=1e-3)
