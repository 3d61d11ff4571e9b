"""Grid-streamed batched transforms (ops/streaming.py) against the batched
reference semantics: one (2N)^dim buffer per iteration must reproduce the
all-at-once batched pipeline exactly (block-diagonal independence,
core_cuda.cu:84,216)."""

import numpy as np
import pytest

import jax.numpy as jnp

import torch_nfft_tpu as tn


def _batched_points(rng, counts, dim):
    n = int(np.sum(counts))
    pos = (rng.random((n, dim)) - 0.5).astype(np.float32)
    pos /= 4 * np.abs(pos).max()
    batch = np.repeat(np.arange(len(counts), dtype=np.int32), counts)
    return pos, batch


@pytest.mark.parametrize("counts", [(300, 300, 300), (250, 400, 175)])
def test_adjoint_streamed_matches_batched(rng, counts):
    dim, N, m, C = 2, 16, 4, 3
    B = len(counts)
    pos, batch = _batched_points(rng, counts, dim)
    x = rng.standard_normal((pos.shape[0], C)).astype(np.float32)

    layout = tn.make_streamed_layout(pos, batch, batch_size=B, N=N, m=m)
    yr, yi = tn.nfft_adjoint_streamed(x, layout)

    ref = np.asarray(tn.nfft_adjoint(x, pos, batch, bandwidth=N, cutoff=m))
    np.testing.assert_allclose(np.asarray(yr), ref.real, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(yi), ref.imag, rtol=2e-4, atol=2e-4)


def test_forward_streamed_matches_batched(rng):
    counts, dim, N, m, C = (220, 350), 2, 16, 4, 2
    B = len(counts)
    pos, batch = _batched_points(rng, counts, dim)
    spec = rng.standard_normal((B,) + (N,) * dim + (C,)).astype(np.float32)

    layout = tn.make_streamed_layout(pos, batch, batch_size=B, N=N, m=m)
    yr, yi = tn.nfft_forward_streamed(spec, None, layout)

    ref = np.asarray(tn.nfft_forward(spec, pos, batch, cutoff=m))
    np.testing.assert_allclose(np.asarray(yr), ref.real, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(yi), ref.imag, rtol=2e-4, atol=2e-4)


def test_fastsum_streamed_matches_batched(rng):
    counts, dim, N, m = (200, 300), 2, 8, 3
    B = len(counts)
    src, batch = _batched_points(rng, counts, dim)
    x = rng.standard_normal((src.shape[0], 2)).astype(np.float32)
    coeffs = np.asarray(tn.gaussian_analytic_coeffs(0.25, dim=dim, N=N))

    layout = tn.make_streamed_layout(src, batch, batch_size=B, N=N, m=m)
    got = tn.nfft_fastsum_streamed(x, coeffs, layout)

    ref = np.asarray(tn.nfft_fastsum(x, coeffs, src, batch=batch, cutoff=m))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=2e-4)


def test_fastsum_streamed_asymmetric_targets(rng):
    dim, N, m = 2, 8, 3
    src, sb = _batched_points(rng, (180, 220), dim)
    tgt, tb = _batched_points(rng, (150, 260), dim)
    x = rng.standard_normal((src.shape[0], 1)).astype(np.float32)
    coeffs = np.asarray(tn.gaussian_analytic_coeffs(0.3, dim=dim, N=N))

    sl = tn.make_streamed_layout(src, sb, batch_size=2, N=N, m=m)
    tl = tn.make_streamed_layout(tgt, tb, batch_size=2, N=N, m=m)
    got = tn.nfft_fastsum_streamed(x, coeffs, sl, tl)

    ref = np.asarray(tn.nfft_fastsum(x, coeffs, src, tgt, sb, tb, cutoff=m))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=2e-4)


def test_streamed_column_chunking(rng):
    counts, dim, N, m, C = (150, 150), 2, 16, 4, 5
    B = len(counts)
    pos, batch = _batched_points(rng, counts, dim)
    x = rng.standard_normal((pos.shape[0], C)).astype(np.float32)
    layout = tn.make_streamed_layout(pos, batch, batch_size=B, N=N, m=m, plan=False)

    yr1, yi1 = tn.nfft_adjoint_streamed(x, layout)
    yr2, yi2 = tn.nfft_adjoint_streamed(x, layout, column_chunk=2)
    np.testing.assert_allclose(np.asarray(yr1), np.asarray(yr2), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(yi1), np.asarray(yi2), rtol=1e-5, atol=1e-6)


def test_streamed_roundtrip_3d(rng):
    """The bench configuration in miniature: 3D batched adjoint+forward."""
    counts, dim, N, m, C = (128, 128), 3, 8, 3, 2
    B = len(counts)
    pos, batch = _batched_points(rng, counts, dim)
    x = rng.standard_normal((pos.shape[0], C)).astype(np.float32)

    layout = tn.make_streamed_layout(pos, batch, batch_size=B, N=N, m=m)
    yr, yi = tn.nfft_adjoint_streamed(x, layout)
    zr, _ = tn.nfft_forward_streamed(yr, yi, layout)

    yref = tn.nfft_adjoint(x, pos, batch, bandwidth=N, cutoff=m)
    zref = np.asarray(tn.nfft_forward(yref, pos, batch, cutoff=m)).real
    np.testing.assert_allclose(np.asarray(zr), zref, rtol=2e-3, atol=2e-3)


def test_streamed_compact_slab_matches_direct(rng):
    """Streamed members share one merged active slab (plan_stack preserves
    `active`); results must match the plan-free scatter pipeline."""
    import jax.numpy as jnp

    from torch_nfft_tpu.ops.planar import nfft_adjoint_planar
    from torch_nfft_tpu.ops.streaming import make_streamed_layout, nfft_adjoint_streamed

    n, dim, N, m, B = 1200, 3, 64, 4, 2
    pos = ((rng.random((n, dim)) - 0.5) * 0.5).astype(np.float32)
    batch = np.sort(rng.integers(0, B, n)).astype(np.int32)
    batch[0], batch[-1] = 0, B - 1
    x = rng.standard_normal((n, 2)).astype(np.float32)

    # pin T=16 so the slab exists at this size (the density probe would
    # pick T=32, whose coarser tiles cover the axis)
    layout = make_streamed_layout(pos, batch, batch_size=B, N=N, m=m, T=16)
    assert layout.plans is not None and layout.plans.active is not None
    yr, yi = nfft_adjoint_streamed(x, layout)

    er, ei = nfft_adjoint_planar(
        jnp.asarray(x), jnp.asarray(pos), jnp.asarray(batch), None,
        batch_size=B, N=N, m=m, strategy="scatter",
    )
    np.testing.assert_allclose(np.asarray(yr), np.asarray(er), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(yi), np.asarray(ei), rtol=2e-4, atol=2e-4)
