"""Dense-tile fold engine (ops/tilefold.py) and pruned spectral transforms
(ops/fft.py): each fast path must agree with the explicit fallback it
replaces, which the rest of the suite already ties to the dense NDFT oracle.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from torch_nfft_tpu.ops import binned
from torch_nfft_tpu.ops.binned import build_plan
from torch_nfft_tpu.ops.fft import (
    fftn_planar,
    spectral_adjoint_pruned,
    spectral_forward_pruned,
)
from torch_nfft_tpu.ops.spectral import (
    apply_phi_hat_inv,
    centered_crop,
    centered_embed,
)
from torch_nfft_tpu.ops.tilefold import fold_geometry_ok, use_fold


CONFIGS = [
    # (n, dim, N, m, batch_size)
    (600, 1, 64, 4, 1),
    (800, 2, 32, 4, 2),
    (500, 2, 16, 3, 1),
    (400, 3, 16, 4, 2),
]


def _points(rng, n, dim, batch_size):
    pos = (rng.random((n, dim)) - 0.5).astype(np.float32) / 2.0
    batch = np.sort(rng.integers(0, batch_size, n)).astype(np.int32)
    batch[-1] = batch_size - 1
    return pos, batch


@pytest.mark.parametrize("n,dim,N,m,batch_size", CONFIGS)
def test_fold_spread_matches_windowed(rng, n, dim, N, m, batch_size):
    pos, batch = _points(rng, n, dim, batch_size)
    x = jnp.asarray(rng.standard_normal((n, 2)).astype(np.float32))
    plan = build_plan(pos, batch, N=N, m=m, batch_size=batch_size)
    assert fold_geometry_ok(plan), "test configs must exercise the fold path"
    posj = jnp.asarray(pos)
    got = binned._spread_xla_fold(plan, x, posj, batch_size)
    ref = binned._spread_xla_windowed(plan, x, posj, batch_size)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("n,dim,N,m,batch_size", CONFIGS)
def test_fold_gather_matches_windowed(rng, n, dim, N, m, batch_size):
    pos, batch = _points(rng, n, dim, batch_size)
    plan = build_plan(pos, batch, N=N, m=m, batch_size=batch_size)
    M = plan.M
    g = jnp.asarray(
        rng.standard_normal((batch_size * M**dim, 2)).astype(np.float32)
    )
    posj = jnp.asarray(pos)
    got = binned._gather_xla_fold(plan, g, posj, batch_size)
    ref = binned._gather_xla_windowed(plan, g, posj)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_use_fold_budget_gate(rng):
    pos, batch = _points(rng, 300, 3, 1)
    plan = build_plan(pos, batch, N=16, m=4, batch_size=1)
    assert use_fold(plan, 1, 4, 1)
    assert not use_fold(plan, 1, 4, 1, budget=16)  # dense array over budget


@pytest.mark.parametrize("dim,N,sigma,C", [(1, 16, 2.0, 3), (2, 16, 2.0, 2), (3, 8, 2.0, 1), (2, 12, 1.5, 2)])
def test_pruned_adjoint_matches_explicit(rng, dim, N, sigma, C):
    m = 3
    M = int(round(sigma * N))
    g = jnp.asarray(rng.standard_normal((2,) + (M,) * dim + (C,)).astype(np.float32))
    yr, yi = spectral_adjoint_pruned(g, None, dim, N, m, sigma)
    gr, gi = fftn_planar(g, None, axes=tuple(range(1, dim + 1)), sign=+1)
    er = apply_phi_hat_inv(centered_crop(gr, dim, N, 1), dim, N, m, sigma, 1)
    ei = apply_phi_hat_inv(centered_crop(gi, dim, N, 1), dim, N, m, sigma, 1)
    np.testing.assert_allclose(np.asarray(yr), np.asarray(er), rtol=2e-4, atol=2e-3)
    np.testing.assert_allclose(np.asarray(yi), np.asarray(ei), rtol=2e-4, atol=2e-3)


@pytest.mark.parametrize("dim,N,sigma,C", [(1, 16, 2.0, 3), (2, 16, 2.0, 2), (3, 8, 2.0, 1), (2, 12, 1.5, 2)])
def test_pruned_forward_matches_explicit(rng, dim, N, sigma, C):
    m = 3
    M = int(round(sigma * N))
    xr = jnp.asarray(rng.standard_normal((2,) + (N,) * dim + (C,)).astype(np.float32))
    xi = jnp.asarray(rng.standard_normal(xr.shape).astype(np.float32))
    yr, yi = spectral_forward_pruned(xr, xi, dim, M, m, sigma)
    wr = centered_embed(apply_phi_hat_inv(xr, dim, N, m, sigma, 1), dim, N, M, 1)
    wi = centered_embed(apply_phi_hat_inv(xi, dim, N, m, sigma, 1), dim, N, M, 1)
    er, ei = fftn_planar(wr, wi, axes=tuple(range(1, dim + 1)), sign=-1)
    np.testing.assert_allclose(np.asarray(yr), np.asarray(er), rtol=2e-4, atol=2e-3)
    np.testing.assert_allclose(np.asarray(yi), np.asarray(ei), rtol=2e-4, atol=2e-3)


def test_active_runs_cyclic():
    from torch_nfft_tpu.ops.binned import _active_runs

    # occupied tiles {7, 0, 1} of 8 -> run starts at 7, covers {7,0,1,2}
    origin = np.array([[56], [0], [8]], np.int32)
    runs = _active_runs(origin, 8, 64, 1)
    assert runs == ((7, 4),)
    # full covering -> None
    origin = (np.arange(8) * 8).reshape(-1, 1).astype(np.int32)
    assert _active_runs(origin, 8, 64, 1) is None


@pytest.mark.parametrize("span", [0.5, 1.0])
def test_compact_dft_pipeline_matches_scatter(rng, span):
    """3D planar adjoint/forward with a fold-capable plan (active slab when
    points live in a sub-box) must match the plan-free scatter pipeline."""
    import jax

    from torch_nfft_tpu.ops.planar import nfft_adjoint_planar, nfft_forward_planar

    n, dim, N, m, B = 500, 3, 64, 4, 1
    pos = ((rng.random((n, dim)) - 0.5) * span).astype(np.float32)
    batch = np.zeros((n,), np.int32)
    x = jnp.asarray(rng.standard_normal((n, 2)).astype(np.float32))
    # pin T=16: the density probe would pick T=32 here, whose coarser tiles
    # cover the axis and disable the slab this test exercises
    plan = build_plan(pos, batch, N=N, m=m, batch_size=B, T=16)
    if span < 1.0:
        assert plan.active is not None, "sub-box points must yield a slab"
    posj, batchj = jnp.asarray(pos), jnp.asarray(batch)

    yr, yi = nfft_adjoint_planar(x, posj, batchj, plan, batch_size=B, N=N, m=m)
    er, ei = nfft_adjoint_planar(
        x, posj, batchj, None, batch_size=B, N=N, m=m, strategy="scatter"
    )
    np.testing.assert_allclose(np.asarray(yr), np.asarray(er), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(yi), np.asarray(ei), rtol=2e-4, atol=2e-4)

    fr, fi = nfft_forward_planar(
        yr, yi, posj, batchj, plan, batch_size=B, dim=dim, m=m
    )
    gr_, gi_ = nfft_forward_planar(
        yr, yi, posj, batchj, None, batch_size=B, dim=dim, m=m,
        strategy="scatter",
    )
    # forward outputs span ~1e3; compare in rel-L2 (single tiny elements can
    # exceed a fixed atol by precision noise alone)
    for got, ref in ((fr, gr_), (fi, gi_)):
        got, ref = np.asarray(got), np.asarray(ref)
        rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
        assert rel < 1e-5, rel


def test_compact_fastsum_matches(rng):
    from torch_nfft_tpu.ops.coeffs import gaussian_analytic_coeffs
    from torch_nfft_tpu.ops.planar import nfft_fastsum_real

    n, dim, N, m = 400, 3, 64, 4
    src = ((rng.random((n, dim)) - 0.5) * 0.5).astype(np.float32)
    tgt = ((rng.random((300, dim)) - 0.5) * 0.4).astype(np.float32)
    x = jnp.asarray(rng.standard_normal((n, 1)).astype(np.float32))
    coeffs = gaussian_analytic_coeffs(0.4, dim, N)
    b_s = jnp.zeros((n,), jnp.int32)
    b_t = jnp.zeros((300,), jnp.int32)
    sp = build_plan(src, None, N=N, m=m, batch_size=1, T=16)
    tp = build_plan(tgt, None, N=N, m=m, batch_size=1, T=16)
    assert sp.active is not None and tp.active is not None

    y = nfft_fastsum_real(
        x, coeffs, jnp.asarray(src), jnp.asarray(tgt), b_s, b_t, sp, tp,
        batch_size=1, N=N, m=m,
    )
    e = nfft_fastsum_real(
        x, coeffs, jnp.asarray(src), jnp.asarray(tgt), b_s, b_t, None, None,
        batch_size=1, N=N, m=m, strategy="scatter",
    )
    np.testing.assert_allclose(np.asarray(y), np.asarray(e), rtol=2e-4, atol=2e-4)
