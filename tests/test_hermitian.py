"""Hermitian half-spectrum pruned DFT vs the full-spectrum path.

The adjoint of real samples has a conjugate-symmetric spectrum; the half
transforms (ops/fft.py) store k0 in {-N/2} u [0, N/2) with extended trailing
bands and must reproduce the full-band path (the reference's asymmetric
band semantics, core_cuda.cu:298-303 / :405-413) to f32 round-off —
including the -N/2 edge planes a naive rfft-style half gets wrong.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from torch_nfft_tpu.ops.fft import (
    full_filter_to_half,
    half_spectrum_to_full,
    spectral_adjoint_half_dft,
    spectral_adjoint_pruned_dft,
    spectral_forward_half_dft,
    spectral_forward_pruned_dft,
)

DIMS = [1, 2, 3]


def _grid(rng, dim, B, L, C, off=None):
    """Random real DFT-layout grid (B, L_1, ..., L_{dim-1}, C, L_0)."""
    shape = (B,) + (L,) * (dim - 1) + (C, L)
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32))


def _rel(a, b):
    return float(np.linalg.norm(np.asarray(a) - np.asarray(b)) /
                 max(np.linalg.norm(np.asarray(b)), 1e-30))


@pytest.mark.parametrize("dim", DIMS)
@pytest.mark.parametrize("window", ["gaussian", "es"])
def test_adjoint_half_matches_full(dim, window):
    rng = np.random.default_rng(3 + dim)
    N, sigma, m, B, C = 16, 2.0, 3, 2, 2
    M = int(round(sigma * N))
    g = _grid(rng, dim, B, M, C)

    fr, fi = spectral_adjoint_pruned_dft(g, None, dim, N, m, sigma, M=M,
                                         window=window)
    hr, hi = spectral_adjoint_half_dft(g, dim, N, m, sigma, M=M,
                                       window=window)
    rr, ri = half_spectrum_to_full(hr, hi, dim, N)
    assert _rel(rr, fr) < 2e-6
    assert _rel(ri, fi) < 2e-6


@pytest.mark.parametrize("dim", DIMS)
def test_adjoint_half_with_cells(dim):
    """Compact-slab (offset) matrices must agree with the full-axis ones on a
    grid that is zero outside the slab."""
    rng = np.random.default_rng(11)
    N, sigma, m, B, C = 16, 2.0, 2, 1, 1
    M = int(round(sigma * N))
    off, L = 8, 16
    cells = tuple((off, L) for _ in range(dim))
    g_slab = _grid(rng, dim, B, L, C)
    # embed the slab into the full grid (slab cells [off, off+L) per axis)
    g_full = np.zeros((B,) + (M,) * (dim - 1) + (C, M), np.float32)
    idx = (slice(None),) + (slice(off, off + L),) * (dim - 1) + (
        slice(None), slice(off, off + L))
    g_full[idx] = np.asarray(g_slab)

    fr, fi = spectral_adjoint_pruned_dft(jnp.asarray(g_full), None, dim, N,
                                         m, sigma, M=M)
    hr, hi = spectral_adjoint_half_dft(g_slab, dim, N, m, sigma, M=M,
                                       cells=cells)
    rr, ri = half_spectrum_to_full(hr, hi, dim, N)
    assert _rel(rr, fr) < 2e-6
    assert _rel(ri, fi) < 2e-6


@pytest.mark.parametrize("dim", DIMS)
@pytest.mark.parametrize("window", ["gaussian", "es"])
def test_forward_half_matches_full_pair(dim, window):
    """Round trip: forward-from-half of an adjoint-produced half spectrum
    must equal the full-spectrum real-only forward of the full spectrum —
    the exact asymmetric band, edge planes included."""
    rng = np.random.default_rng(7 * dim)
    N, sigma, m, B, C = 16, 2.0, 3, 2, 2
    M = int(round(sigma * N))
    g = _grid(rng, dim, B, M, C)

    fr, fi = spectral_adjoint_pruned_dft(g, None, dim, N, m, sigma, M=M,
                                         window=window)
    ref, _ = spectral_forward_pruned_dft(fr, fi, dim, M, m, sigma,
                                         real_only=True, window=window)

    hr, hi = spectral_adjoint_half_dft(g, dim, N, m, sigma, M=M,
                                       window=window)
    got, gi = spectral_forward_half_dft(hr, hi, dim, M, m, sigma,
                                        window=window)
    assert gi is None
    assert _rel(got, ref) < 3e-6


@pytest.mark.parametrize("dim", [2, 3])
def test_forward_half_with_cells(dim):
    rng = np.random.default_rng(29)
    N, sigma, m, B, C = 16, 2.0, 2, 1, 2
    M = int(round(sigma * N))
    off, L = 8, 16
    cells = tuple((off, L) for _ in range(dim))
    g = _grid(rng, dim, B, L, C)

    fr, fi = spectral_adjoint_pruned_dft(g, None, dim, N, m, sigma, M=M,
                                         cells=cells)
    ref, _ = spectral_forward_pruned_dft(fr, fi, dim, M, m, sigma,
                                         cells=cells, real_only=True)
    hr, hi = spectral_adjoint_half_dft(g, dim, N, m, sigma, M=M, cells=cells)
    got, _ = spectral_forward_half_dft(hr, hi, dim, M, m, sigma, cells=cells)
    assert _rel(got, ref) < 3e-6


@pytest.mark.parametrize("dim", DIMS)
def test_filtered_pair_matches_full(dim):
    """Fastsum-style chain: adjoint -> even filter -> forward, half vs full."""
    rng = np.random.default_rng(41)
    N, sigma, m, B, C = 8, 2.0, 2, 1, 1
    M = int(round(sigma * N))
    g = _grid(rng, dim, B, M, C)

    # even real filter (separable gaussian bumps): c[-k] = c[k] on the
    # centered band incl. the unpaired -N/2 edge
    k = np.arange(N) - N // 2
    c1 = np.exp(-0.13 * k.astype(np.float64) ** 2)
    c1 = np.minimum(c1, c1[::np.sign(1)])  # already even in value terms
    c = c1.copy()
    for _ in range(dim - 1):
        c = np.multiply.outer(c, c1)
    # evenness under the centered index map: c[j] == c[N - j] for j >= 1
    c = jnp.asarray(c.astype(np.float32))

    fr, fi = spectral_adjoint_pruned_dft(g, None, dim, N, m, sigma, M=M)
    cf = c[None, ..., None]
    ref, _ = spectral_forward_pruned_dft(fr * cf, fi * cf, dim, M, m, sigma,
                                         real_only=True)

    hr, hi = spectral_adjoint_half_dft(g, dim, N, m, sigma, M=M)
    ch = full_filter_to_half(c, dim, N)[None, ..., None]
    got, _ = spectral_forward_half_dft(hr * ch, hi * ch, dim, M, m, sigma)
    assert _rel(got, ref) < 3e-6


def test_half_layout_shapes():
    N, sigma, m, dim = 16, 2.0, 3, 3
    M = int(round(sigma * N))
    rng = np.random.default_rng(0)
    g = _grid(rng, dim, 2, M, 2)
    hr, hi = spectral_adjoint_half_dft(g, dim, N, m, sigma, M=M)
    assert hr.shape == (2, N // 2 + 1, N + 1, N + 1, 2)
    assert hi.shape == hr.shape
    fr, fi = half_spectrum_to_full(hr, hi, dim, N)
    assert fr.shape == (2, N, N, N, 2)


# ---------------------------------------------------------------------------
# End-to-end: the planar pipelines with the Hermitian path on vs off
# ---------------------------------------------------------------------------


def _pointset(rng, n, dim):
    pos = (rng.random((n, dim), dtype=np.float32) - 0.5)
    pos /= 4 * np.abs(pos).max()
    return pos


@pytest.mark.parametrize("dim", [1, 2, 3])
def test_pair_planar_matches_compose(dim, monkeypatch):
    """nfft_pair_planar (half-spectrum internal) == adjoint->forward composed
    with the full spectrum, and == the same composition with Hermitian off."""
    from torch_nfft_tpu.ops.planar import (
        nfft_adjoint_planar,
        nfft_forward_planar,
        nfft_pair_planar,
    )

    rng = np.random.default_rng(5)
    n, N, m = 300, 16, 3
    pos = jnp.asarray(_pointset(rng, n, dim))
    x = jnp.asarray(rng.standard_normal((n, 2)).astype(np.float32))
    batch = jnp.zeros((n,), jnp.int32)

    z_pair = nfft_pair_planar(x, pos, batch, batch_size=1, N=N, m=m)

    monkeypatch.setenv("TORCH_NFFT_TPU_HERMITIAN", "0")
    yr, yi = nfft_adjoint_planar(x, pos, batch, batch_size=1, N=N, m=m)
    ref, _ = nfft_forward_planar(yr, yi, pos, batch, batch_size=1, dim=dim,
                                 m=m, real_output=True)
    assert _rel(z_pair, ref) < 5e-6


@pytest.mark.parametrize("dim", [2, 3])
def test_adjoint_planar_hermitian_toggle(dim, monkeypatch):
    from torch_nfft_tpu.ops.planar import nfft_adjoint_planar

    rng = np.random.default_rng(9)
    n, N, m = 250, 16, 3
    pos = jnp.asarray(_pointset(rng, n, dim))
    x = jnp.asarray(rng.standard_normal((n, 1)).astype(np.float32))
    batch = jnp.zeros((n,), jnp.int32)

    yr1, yi1 = nfft_adjoint_planar(x, pos, batch, batch_size=1, N=N, m=m)
    monkeypatch.setenv("TORCH_NFFT_TPU_HERMITIAN", "0")
    # distinct shape (C) to defeat the jit cache across the env change
    x2 = jnp.concatenate([x, x], axis=1)
    yr0, yi0 = nfft_adjoint_planar(x2, pos, batch, batch_size=1, N=N, m=m)
    assert _rel(yr1[..., 0], yr0[..., 0]) < 5e-6
    assert _rel(yi1[..., 0], yi0[..., 0]) < 5e-6


def test_fastsum_real_hermitian_matches(monkeypatch):
    from torch_nfft_tpu.ops.coeffs import gaussian_analytic_coeffs
    from torch_nfft_tpu.ops.planar import nfft_fastsum_real

    rng = np.random.default_rng(13)
    n, N, m, dim = 200, 8, 3, 2
    pos = jnp.asarray(_pointset(rng, n, dim))
    x = jnp.asarray(rng.standard_normal((n, 2)).astype(np.float32))
    batch = jnp.zeros((n,), jnp.int32)
    coeffs = gaussian_analytic_coeffs(0.3, dim, N)

    y1 = nfft_fastsum_real(x, coeffs, pos, pos, batch, batch,
                           batch_size=1, N=N, m=m)
    monkeypatch.setenv("TORCH_NFFT_TPU_HERMITIAN", "0")
    x2 = jnp.concatenate([x, x, x], axis=1)
    y0 = nfft_fastsum_real(x2, coeffs, pos, pos, batch, batch,
                           batch_size=1, N=N, m=m)
    assert _rel(y1, y0[:, :2]) < 5e-6


def test_pair_planar_gradients(monkeypatch):
    """jax.grad through nfft_pair_planar (values + positions) matches the
    gradient of the Hermitian-off composition."""
    import jax

    from torch_nfft_tpu.ops.planar import (
        nfft_adjoint_planar,
        nfft_forward_planar,
        nfft_pair_planar,
    )

    rng = np.random.default_rng(21)
    n, N, m, dim = 200, 16, 3, 2
    pos = _pointset(rng, n, dim)
    x = rng.standard_normal((n, 1)).astype(np.float32)
    batch = jnp.zeros((n,), jnp.int32)

    def loss_pair(x_, p_):
        return jnp.sum(nfft_pair_planar(x_, p_, batch, batch_size=1, N=N,
                                        m=m) ** 2)

    gx, gp = jax.grad(loss_pair, argnums=(0, 1))(jnp.asarray(x),
                                                 jnp.asarray(pos))

    monkeypatch.setenv("TORCH_NFFT_TPU_HERMITIAN", "0")

    def loss_ref(x_, p_):
        yr, yi = nfft_adjoint_planar(x_, p_, batch, batch_size=1, N=N, m=m)
        zr, _ = nfft_forward_planar(yr, yi, p_, batch, batch_size=1, dim=dim,
                                    m=m, real_output=True)
        return jnp.sum(zr ** 2)

    gx_r, gp_r = jax.grad(loss_ref, argnums=(0, 1))(jnp.asarray(x),
                                                    jnp.asarray(pos))
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_r),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gp_r),
                               rtol=1e-3, atol=1e-2)


def test_pair_planar_with_plan():
    """The pair through an explicit binned plan (the benchmark route)."""
    from torch_nfft_tpu.ops.binned import build_plan
    from torch_nfft_tpu.ops.planar import nfft_pair_planar

    rng = np.random.default_rng(8)
    n, N, m, dim = 5000, 16, 2, 3
    pos = _pointset(rng, n, dim)
    x = jnp.asarray(rng.standard_normal((n, 2)).astype(np.float32))
    batch = jnp.zeros((n,), jnp.int32)
    plan = build_plan(pos, np.zeros((n,), np.int32), N=N, m=m, batch_size=1,
                      K=128)
    z_plan = nfft_pair_planar(x, jnp.asarray(pos), batch, plan,
                              batch_size=1, N=N, m=m)
    z_auto = nfft_pair_planar(x, jnp.asarray(pos), batch, batch_size=1,
                              N=N, m=m)
    # binned vs auto (scatter/matmul) engines accumulate in different
    # orders; a handful of near-support-edge points land ~2e-3 apart in f32
    np.testing.assert_allclose(np.asarray(z_plan), np.asarray(z_auto),
                               rtol=5e-3, atol=5e-3)


def test_fastsum_kb_window_vs_trig_oracle():
    """Fastsum with the kb WINDOW matches the exact trigonometric-kernel
    oracle (separating NFFT window error from series truncation, the
    reference's test_fastsum.py pattern)."""
    from torch_nfft_tpu.ops.coeffs import gaussian_analytic_coeffs
    from torch_nfft_tpu.ops.ndft import exact_trigonometric_matrix
    from torch_nfft_tpu.ops.planar import nfft_fastsum_real

    rng = np.random.default_rng(31)
    n, N, m, dim = 150, 8, 3, 2
    pos = _pointset(rng, n, dim)
    batch = jnp.zeros((n,), jnp.int32)
    coeffs = gaussian_analytic_coeffs(0.35, dim, N)
    x = jnp.asarray(rng.standard_normal((n, 1)).astype(np.float32))
    y = nfft_fastsum_real(x, coeffs, jnp.asarray(pos), jnp.asarray(pos),
                          batch, batch, batch_size=1, N=N, m=m, window="kb")
    A = exact_trigonometric_matrix(coeffs, jnp.asarray(pos))
    ref = np.asarray(A @ np.asarray(x))
    rel = _rel(y, ref)
    assert rel < 2e-4
