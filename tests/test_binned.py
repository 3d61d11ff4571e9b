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


def test_pallas_kernels_interpret(rng, monkeypatch):
    """Force the fused Pallas path (interpret mode on CPU): K=128, dim=3."""
    # f32-exact comparison vs the XLA engine needs the highest-precision
    # kernels (bf16kr intentionally trades ~2e-4 error for speed)
    monkeypatch.setenv("TORCH_NFFT_TPU_KERNEL_PRECISION", "highest")
    from torch_nfft_tpu.ops.binned import (
        _gather_pallas,
        _gather_xla,
        _spread_pallas,
        _spread_xla,
        build_plan,
    )
    from torch_nfft_tpu.ops.pallas.contract import pallas_supported

    n, dim, N, m, B, C = 200, 3, 8, 3, 2, 2
    pos, batch = _points(rng, n, dim, B)
    plan = build_plan(pos, batch, N=N, m=m, batch_size=B, K=128)
    assert pallas_supported(plan, C)
    x = rng.standard_normal((n, C)).astype(np.float32)

    g_p = _spread_pallas(plan, jnp.asarray(x), jnp.asarray(pos), B)
    g_x = _spread_xla(plan, jnp.asarray(x), jnp.asarray(pos), B)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x), rtol=1e-5, atol=1e-5)

    y_p = _gather_pallas(plan, g_x, jnp.asarray(pos))
    y_x = _gather_xla(plan, g_x, jnp.asarray(pos))
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_x), rtol=1e-5, atol=1e-5)


def test_pallas_kernels_interpret_chunked_K(rng, monkeypatch):
    """K > the kernels' 1024-lane chunk (n_chunks = 2): the chunk loop's
    second iteration must re-read the scalar-prefetch tables with the ROW
    index (a shadowing bug made the gather kernel index them with the
    previous chunk's (H, KC) dot result — crashed every K=2048 plan on
    device; the CPU XLA fallback masked it, so this drives the kernels in
    interpret mode)."""
    monkeypatch.setenv("TORCH_NFFT_TPU_KERNEL_PRECISION", "highest")
    from torch_nfft_tpu.ops.binned import (
        _gather_dft_pallas,
        _gather_dft_xla,
        _spread_dft_pallas,
        _spread_dft_xla,
        build_plan,
    )
    from torch_nfft_tpu.ops.pallas.contract import pallas_supported

    n, dim, N, m, B, C = 5000, 3, 16, 2, 1, 2
    pos, batch = _points(rng, n, dim, B)
    plan = build_plan(pos, batch, N=N, m=m, batch_size=B, K=2048)
    assert plan.K == 2048 and pallas_supported(plan, C)
    x = rng.standard_normal((n, C)).astype(np.float32)

    g_p = _spread_dft_pallas(plan, jnp.asarray(x), jnp.asarray(pos), B)
    g_x = _spread_dft_xla(plan, jnp.asarray(x), jnp.asarray(pos), B)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x), rtol=1e-5,
                               atol=1e-5)

    y_p = _gather_dft_pallas(plan, g_x, jnp.asarray(pos))
    y_x = _gather_dft_xla(plan, g_x, jnp.asarray(pos))
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_x), rtol=1e-5,
                               atol=1e-5)


@pytest.mark.parametrize("dim,N,m,B", [(3, 16, 4, 1), (2, 32, 3, 2)])
def test_build_plan_device_matches_host(rng, dim, N, m, B):
    """Device-built plans must execute identically to host-built ones."""
    from torch_nfft_tpu.ops.binned import (
        build_plan,
        build_plan_device,
        gather_binned_dft,
        spread_binned_dft,
    )

    n = 4000
    pos, batch = _points(rng, n, dim, B)
    x = rng.standard_normal((n, 2)).astype(np.float32)
    ph = build_plan(pos, batch, N=N, m=m, batch_size=B)
    pd = build_plan_device(pos, batch, N=N, m=m, batch_size=B)
    assert (ph.T, ph.K, ph.active) == (pd.T, pd.K, pd.active)
    assert ph.slot_pt.shape == pd.slot_pt.shape
    assert pd.pos_fp is None and pd.order is None

    gh = spread_binned_dft(ph, jnp.asarray(x), jnp.asarray(pos), batch_size=B)
    gd = spread_binned_dft(pd, jnp.asarray(x), jnp.asarray(pos), batch_size=B)
    np.testing.assert_allclose(np.asarray(gd), np.asarray(gh), rtol=1e-5, atol=1e-5)
    yh = gather_binned_dft(ph, gh, jnp.asarray(pos))
    yd = gather_binned_dft(pd, gh, jnp.asarray(pos))
    np.testing.assert_allclose(np.asarray(yd), np.asarray(yh), rtol=1e-5, atol=1e-5)


def test_pallas_bf16kr_mode_close(rng, monkeypatch):
    """bf16kr kernels agree with the f32 XLA engine to bf16-level tolerance."""
    monkeypatch.setenv("TORCH_NFFT_TPU_KERNEL_PRECISION", "bf16kr")
    from torch_nfft_tpu.ops.binned import (
        _gather_pallas,
        _gather_xla,
        _spread_pallas,
        _spread_xla,
        build_plan,
    )

    n, dim, N, m, B, C = 200, 3, 8, 3, 2, 2
    pos, batch = _points(rng, n, dim, B)
    plan = build_plan(pos, batch, N=N, m=m, batch_size=B, K=128)
    x = rng.standard_normal((n, C)).astype(np.float32)

    g_p = _spread_pallas(plan, jnp.asarray(x), jnp.asarray(pos), B)
    g_x = _spread_xla(plan, jnp.asarray(x), jnp.asarray(pos), B)
    scale = float(np.abs(np.asarray(g_x)).max())
    np.testing.assert_allclose(
        np.asarray(g_p), np.asarray(g_x), atol=2e-2 * scale
    )
    y_p = _gather_pallas(plan, g_x, jnp.asarray(pos))
    y_x = _gather_xla(plan, g_x, jnp.asarray(pos))
    yscale = float(np.abs(np.asarray(y_x)).max())
    np.testing.assert_allclose(
        np.asarray(y_p), np.asarray(y_x), atol=2e-2 * yscale
    )


def test_dense_spread_pallas_padded_rows(rng, monkeypatch):
    """In-kernel dense accumulation with PADDED rows (row_count == 0) in the
    plan: padded rows must contribute nothing and never corrupt a flushed
    tile block (they are repointed at their predecessor's tile)."""
    monkeypatch.setenv("TORCH_NFFT_TPU_KERNEL_PRECISION", "highest")
    from torch_nfft_tpu.ops.binned import (
        _spread_dft_pallas,
        _spread_dft_xla,
        build_plan,
    )
    from torch_nfft_tpu.ops.plan_stack import pad_plan_rows

    n, dim, N, m, B, C = 300, 3, 8, 3, 1, 2
    pos, batch = _points(rng, n, dim, B)
    plan = build_plan(pos, batch, N=N, m=m, batch_size=B, K=128)
    padded = pad_plan_rows(plan, plan.slot_pt.shape[0] + 5)
    x = rng.standard_normal((n, C)).astype(np.float32)

    g_p = _spread_dft_pallas(padded, jnp.asarray(x), jnp.asarray(pos), B)
    g_x = _spread_dft_xla(padded, jnp.asarray(x), jnp.asarray(pos), B)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x), rtol=1e-5, atol=1e-5)


def test_plan_mismatch_rejected(rng):
    import pytest as _pytest

    import torch_nfft_tpu as tn

    n, dim, N = 64, 2, 16
    pos, batch = _points(rng, n, dim, 1)
    x = rng.standard_normal((n, 1)).astype(np.float32)
    plan = build_plan(pos, batch, N=N, m=3, batch_size=1)
    with _pytest.raises(ValueError, match="plan was built"):
        tn.nfft_adjoint(x, pos, batch, bandwidth=N, cutoff=4, plan=plan)


def test_symmetric_fastsum_auto_plan(rng, monkeypatch):
    """Auto-planned symmetric fastsum uses the plan for BOTH halves."""
    import torch_nfft_tpu as tn
    from torch_nfft_tpu.ops import nfft as nfft_mod

    calls = []
    orig = nfft_mod._nfft_fastsum_impl

    def spy(x, coeffs, s_, t_, sb, tb, sp, tp, **kw):
        calls.append((sp is not None, tp is not None))
        return orig(x, coeffs, s_, t_, sb, tb, sp, tp, **kw)

    monkeypatch.setattr(nfft_mod, "_nfft_fastsum_impl", spy)

    n, dim, N, m = 20000, 3, 16, 3  # past the one-hot cost threshold
    pos = ((rng.random((n, dim)) - 0.5) / 2).astype(np.float32)
    x = rng.standard_normal((n, 1)).astype(np.float32)
    coeffs = tn.gaussian_analytic_coeffs(0.25, dim=dim, N=N)
    tn.nfft_fastsum(x, coeffs, pos, cutoff=m)
    assert calls and calls[0] == (True, True)


def test_pallas_kernels_interpret_1d(rng, monkeypatch):
    """1D fused kernels (interpret mode) vs the XLA engine."""
    monkeypatch.setenv("TORCH_NFFT_TPU_KERNEL_PRECISION", "highest")
    from torch_nfft_tpu.ops.binned import (
        _gather_dft_pallas,
        _gather_dft_xla,
        _spread_dft_pallas,
        _spread_dft_xla,
        build_plan,
    )
    from torch_nfft_tpu.ops.pallas.contract import pallas_supported

    n, dim, N, m, B, C = 3000, 1, 64, 4, 2, 2
    pos, batch = _points(rng, n, dim, B)
    plan = build_plan(pos, batch, N=N, m=m, batch_size=B, K=128)
    assert pallas_supported(plan, C)
    x = rng.standard_normal((n, C)).astype(np.float32)

    g_p = _spread_dft_pallas(plan, jnp.asarray(x), jnp.asarray(pos), B)
    g_x = _spread_dft_xla(plan, jnp.asarray(x), jnp.asarray(pos), B)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x), rtol=1e-5, atol=1e-5)

    y_p = _gather_dft_pallas(plan, g_x, jnp.asarray(pos))
    y_x = _gather_dft_xla(plan, g_x, jnp.asarray(pos))
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_x), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("dim,N", [(1, 16), (2, 16), (3, 8)])
def test_fused_backward_matches_xla_vjp(rng, monkeypatch, dim, N):
    """The fused Pallas VJP (value cotangent via the transpose kernel,
    position cotangent via the derivative-window kernel) matches
    differentiating the XLA engine, for both spread and gather."""
    monkeypatch.setenv("TORCH_NFFT_TPU_KERNEL_PRECISION", "highest")
    monkeypatch.setenv("TORCH_NFFT_TPU_FUSED_BWD", "1")
    from torch_nfft_tpu.ops.binned import (
        _gather_pallas_cv,
        _gather_xla,
        _spread_pallas_cv,
        _spread_xla,
        build_plan,
    )

    n, m, B, C = 200, 3, 2, 2
    pos, batch = _points(rng, n, dim, B)
    plan = build_plan(pos, batch, N=N, m=m, batch_size=B, K=128)
    x = jnp.asarray(rng.standard_normal((n, C)).astype(np.float32))
    M = 2 * N
    g = jnp.asarray(rng.standard_normal((B * M**dim, C)).astype(np.float32))
    p = jnp.asarray(pos)

    def check(got, ref):
        for a, b in zip(got, ref):
            sc = max(1e-6, float(jnp.abs(b).max()))
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-5 * sc
            )

    check(
        jax.grad(
            lambda a, b: jnp.vdot(_spread_pallas_cv(B, plan, a, b), g),
            argnums=(0, 1),
        )(x, p),
        jax.grad(
            lambda a, b: jnp.vdot(_spread_xla(plan, a, b, B), g),
            argnums=(0, 1),
        )(x, p),
    )
    check(
        jax.grad(
            lambda a, b: jnp.vdot(_gather_pallas_cv(plan, a, b), x),
            argnums=(0, 1),
        )(g, p),
        jax.grad(
            lambda a, b: jnp.vdot(_gather_xla(plan, a, b), x),
            argnums=(0, 1),
        )(g, p),
    )


def test_fused_backward_dft_matches_xla_vjp(rng, monkeypatch):
    """Fused VJP through the DFT-layout entry points (the hot planar path)."""
    monkeypatch.setenv("TORCH_NFFT_TPU_KERNEL_PRECISION", "highest")
    monkeypatch.setenv("TORCH_NFFT_TPU_FUSED_BWD", "1")
    from torch_nfft_tpu.ops.binned import (
        _gather_dft_pallas_cv,
        _gather_dft_xla,
        _spread_dft_pallas_cv,
        _spread_dft_xla,
        build_plan,
    )

    n, dim, N, m, B, C = 300, 3, 8, 3, 2, 2
    pos, batch = _points(rng, n, dim, B)
    plan = build_plan(pos, batch, N=N, m=m, batch_size=B, K=128)
    x = jnp.asarray(rng.standard_normal((n, C)).astype(np.float32))
    p = jnp.asarray(pos)
    g_shape = _spread_dft_xla(plan, x, p, B).shape
    g = jnp.asarray(rng.standard_normal(g_shape).astype(np.float32))

    def check(got, ref):
        for a, b in zip(got, ref):
            sc = max(1e-6, float(jnp.abs(b).max()))
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-5 * sc
            )

    check(
        jax.grad(
            lambda a, b: jnp.vdot(
                _spread_dft_pallas_cv(B, False, plan, a, b), g
            ),
            argnums=(0, 1),
        )(x, p),
        jax.grad(
            lambda a, b: jnp.vdot(_spread_dft_xla(plan, a, b, B), g),
            argnums=(0, 1),
        )(x, p),
    )
    check(
        jax.grad(
            lambda a, b: jnp.vdot(_gather_dft_pallas_cv(False, plan, a, b), x),
            argnums=(0, 1),
        )(g, p),
        jax.grad(
            lambda a, b: jnp.vdot(_gather_dft_xla(plan, a, b, False), x),
            argnums=(0, 1),
        )(g, p),
    )


def test_pallas_high3_mode_f32_class(rng, monkeypatch):
    """high3 (manual 3-pass bf16 dot) agrees with the f32 XLA engine to
    f32-class tolerance — unlike bf16kr it must NOT cost ~2e-3."""
    monkeypatch.setenv("TORCH_NFFT_TPU_KERNEL_PRECISION", "high3")
    from torch_nfft_tpu.ops.binned import (
        _gather_pallas,
        _gather_xla,
        _spread_pallas,
        _spread_xla,
        build_plan,
    )

    n, dim, N, m, B, C = 200, 3, 8, 3, 2, 2
    pos, batch = _points(rng, n, dim, B)
    plan = build_plan(pos, batch, N=N, m=m, batch_size=B, K=128)
    x = rng.standard_normal((n, C)).astype(np.float32)

    g_p = _spread_pallas(plan, jnp.asarray(x), jnp.asarray(pos), B)
    g_x = _spread_xla(plan, jnp.asarray(x), jnp.asarray(pos), B)
    scale = float(np.abs(np.asarray(g_x)).max())
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x), atol=3e-5 * scale)

    y_p = _gather_pallas(plan, g_x, jnp.asarray(pos))
    y_x = _gather_xla(plan, g_x, jnp.asarray(pos))
    yscale = float(np.abs(np.asarray(y_x)).max())
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_x), atol=3e-5 * yscale)


def test_slot_order_roundtrip(rng):
    """to_slot_order/from_slot_order invert each other; empty slots are
    exact zeros so slot-space dot products agree with user order."""
    n, dim, N, m, B, C = 300, 3, 8, 3, 2, 2
    pos, batch = _points(rng, n, dim, B)
    plan = build_plan(pos, batch, N=N, m=m, batch_size=B, K=128)
    x = jnp.asarray(rng.standard_normal((n, C)).astype(np.float32))
    v = tn.to_slot_order(plan, x)
    S, K = plan.slot_pt.shape
    assert v.shape == (C, S * K)
    np.testing.assert_array_equal(
        np.asarray(tn.from_slot_order(plan, v)), np.asarray(x)
    )
    np.testing.assert_allclose(
        float(jnp.vdot(v, v)), float(jnp.vdot(x, x)), rtol=1e-6
    )


def test_slot_layout_matches_user_order(rng, monkeypatch):
    """Slot-in spread and slot-out gather (interpret mode) produce the same
    grid / point values as the user-order XLA engine."""
    monkeypatch.setenv("TORCH_NFFT_TPU_KERNEL_PRECISION", "highest")
    from torch_nfft_tpu.ops.binned import (
        _gather_dft_slot,
        _gather_dft_xla,
        _spread_dft_slot,
        _spread_dft_xla,
        from_slot_order,
        to_slot_order,
    )

    n, dim, N, m, B, C = 300, 3, 8, 3, 2, 2
    pos, batch = _points(rng, n, dim, B)
    plan = build_plan(pos, batch, N=N, m=m, batch_size=B, K=128)
    x = jnp.asarray(rng.standard_normal((n, C)).astype(np.float32))
    p = jnp.asarray(pos)
    v = to_slot_order(plan, x)

    g_s = _spread_dft_slot(plan, v, B, False)
    g_x = _spread_dft_xla(plan, x, p, B, False)
    np.testing.assert_allclose(
        np.asarray(g_s), np.asarray(g_x), rtol=1e-5, atol=1e-5
    )

    y_s = _gather_dft_slot(plan, g_x, False)  # (C, S*K)
    y_x = _gather_dft_xla(plan, g_x, p, False)  # (n, C)
    np.testing.assert_allclose(
        np.asarray(from_slot_order(plan, y_s)), np.asarray(y_x),
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(y_s), np.asarray(to_slot_order(plan, y_x)),
        rtol=1e-5, atol=1e-5,
    )


def test_slot_layout_vjp(rng, monkeypatch):
    """Value cotangents of the slot-layout custom_vjps equal the slotted
    user-order cotangents (the backward itself is permutation-free)."""
    monkeypatch.setenv("TORCH_NFFT_TPU_KERNEL_PRECISION", "highest")
    from torch_nfft_tpu.ops.binned import (
        _gather_dft_slot_cv,
        _gather_dft_xla,
        _spread_dft_slot_cv,
        _spread_dft_xla,
        to_slot_order,
    )

    n, dim, N, m, B, C = 300, 3, 8, 3, 2, 2
    pos, batch = _points(rng, n, dim, B)
    plan = build_plan(pos, batch, N=N, m=m, batch_size=B, K=128)
    x = jnp.asarray(rng.standard_normal((n, C)).astype(np.float32))
    p = jnp.asarray(pos)
    v = to_slot_order(plan, x)
    g_shape = _spread_dft_xla(plan, x, p, B).shape
    g = jnp.asarray(rng.standard_normal(g_shape).astype(np.float32))

    dv = jax.grad(lambda a: jnp.vdot(_spread_dft_slot_cv(B, False, plan, a), g))(v)
    dx = jax.grad(lambda a: jnp.vdot(_spread_dft_xla(plan, a, p, B), g))(x)
    sc = max(1e-6, float(jnp.abs(dx).max()))
    np.testing.assert_allclose(
        np.asarray(dv), np.asarray(to_slot_order(plan, dx)), atol=5e-5 * sc
    )

    dg_s = jax.grad(
        lambda a: jnp.vdot(_gather_dft_slot_cv(False, plan, a), v)
    )(g)
    dg_x = jax.grad(lambda a: jnp.vdot(_gather_dft_xla(plan, a, p, False), x))(g)
    sc = max(1e-6, float(jnp.abs(dg_x).max()))
    np.testing.assert_allclose(np.asarray(dg_s), np.asarray(dg_x), atol=5e-5 * sc)


def test_device_builder_dense_probe_picks_t8(rng):
    """Dense 3D point sets (>= 1024 points per occupied T=16 bin) switch
    the device builder to T=8 tiles — smaller window halos and a ~3x
    smaller folded tile array (headline A/B in BASELINE.md) — and the
    transform still matches a T=16-forced plan."""
    from torch_nfft_tpu.ops.binned import build_plan_device

    n, dim, N, m = 28000, 3, 32, 2  # M=64: ~27 occupied T=16 bins
    pos = ((rng.random((n, dim)) - 0.5) / 2.0).astype(np.float32)
    x = rng.standard_normal((n, 1)).astype(np.float32)
    batch = jnp.zeros((n,), jnp.int32)

    plan = build_plan_device(jnp.asarray(pos), None, N=N, m=m,
                             batch_size=1, window="es")
    assert plan.T == 8, plan.T
    plan16 = build_plan_device(jnp.asarray(pos), None, N=N, m=m,
                               batch_size=1, window="es", T=16)

    import torch_nfft_tpu as tn

    def run(p):
        return np.asarray(tn.nfft_adjoint(
            jnp.asarray(x), jnp.asarray(pos), batch, batch_size=1,
            bandwidth=N, cutoff=m, plan=p, strategy="binned", window="es"))

    y8, y16 = run(plan), run(plan16)
    # different tiling -> different f32 summation order only
    sc = float(np.abs(y16).max())
    np.testing.assert_allclose(y8, y16, atol=2e-5 * sc)
