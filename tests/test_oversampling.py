"""Tunable oversampling rate sigma (the reference hard-codes sigma=2,
spatial_window_operations.cu:20-23; here every constant derives from sigma,
SURVEY.md section 5 config row)."""

import numpy as np
import pytest

import torch_nfft_tpu as tn


def _points(rng, n, dim):
    pos = (rng.random((n, dim)) - 0.5).astype(np.float32)
    pos /= 4 * np.abs(pos).max()
    return pos


@pytest.mark.parametrize("sigma", [1.5, 2.0, 3.0])
def test_adjoint_accuracy_vs_sigma(rng, sigma):
    n, dim, N, m = 300, 2, 16, 4
    pos = _points(rng, n, dim)
    x = rng.standard_normal((n, 2)).astype(np.float32)
    got = tn.nfft_adjoint(x, pos, bandwidth=N, cutoff=m, sigma=sigma)
    ref = tn.ndft_adjoint(x, pos, N=N)
    rel = np.linalg.norm(np.asarray(got) - np.asarray(ref)) / np.linalg.norm(
        np.asarray(ref)
    )
    assert rel < 2e-3, (sigma, rel)


def test_higher_sigma_is_more_accurate(rng):
    """Larger oversampling -> smaller window truncation error at fixed m."""
    n, dim, N, m = 300, 1, 16, 3
    pos = _points(rng, n, dim)
    x = rng.standard_normal((n, 1)).astype(np.float32)
    ref = np.asarray(tn.ndft_adjoint(x, pos, N=N))

    def rel(sigma):
        got = np.asarray(tn.nfft_adjoint(x, pos, bandwidth=N, cutoff=m, sigma=sigma))
        return np.linalg.norm(got - ref) / np.linalg.norm(ref)

    assert rel(3.0) < rel(1.5)


def test_fastsum_sigma(rng):
    n, dim, N, m = 128, 2, 8, 3
    pos = _points(rng, n, dim)
    x = rng.standard_normal((n, 1)).astype(np.float32)
    coeffs = tn.gaussian_analytic_coeffs(0.25, dim=dim, N=N)
    ref = tn.nfft_fastsum(x, coeffs, pos, cutoff=m)
    got = tn.nfft_fastsum(x, coeffs, pos, cutoff=m, sigma=3.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=5e-3, atol=5e-3)


@pytest.mark.parametrize("sigma", [1.625, 1.75])
def test_binned_planar_roundtrip_fractional_sigma_3d(rng, sigma):
    """The binned+planar engine (T=8 tiles, es window) at the fractional
    oversampling rates the headline bench uses: a non-power-of-two M =
    sigma*N must thread the plan builder, the active-slab fold and the
    pruned DFT matrices exactly (round-4 headline configs run sigma=1.75
    at full scale; this pins the path on CPU)."""
    import jax.numpy as jnp

    from torch_nfft_tpu.ops.binned import build_plan
    from torch_nfft_tpu.ops.planar import (
        nfft_adjoint_planar,
        nfft_forward_planar,
    )

    n, dim, N, m = 6000, 3, 32, 2
    pos = _points(rng, n, dim)
    x = rng.standard_normal((n, 1)).astype(np.float32)
    batch = jnp.zeros((n,), jnp.int32)

    plan = build_plan(pos, None, N=N, m=m, sigma=sigma, T=8, window="es")
    yr, yi = nfft_adjoint_planar(
        jnp.asarray(x), jnp.asarray(pos), batch, plan, batch_size=1,
        N=N, m=m, sigma=sigma, window="es",
    )
    ref = np.asarray(tn.ndft_adjoint(x, pos, N=N))
    got = np.asarray(yr)[0, ..., 0] + 1j * np.asarray(yi)[0, ..., 0]
    rel = np.linalg.norm(got - ref[..., 0]) / np.linalg.norm(ref[..., 0])
    assert rel < 2e-4, (sigma, rel)

    # forward round trip against the unplanned scatter path
    zr, _ = nfft_forward_planar(
        yr, yi, jnp.asarray(pos), batch, plan, batch_size=1, dim=dim, m=m,
        sigma=sigma, real_output=True, window="es",
    )
    zr2, _ = nfft_forward_planar(
        yr, yi, jnp.asarray(pos), batch, batch_size=1, dim=dim, m=m,
        sigma=sigma, real_output=True, window="es", strategy="scatter",
    )
    np.testing.assert_allclose(np.asarray(zr), np.asarray(zr2), rtol=2e-4,
                               atol=2e-4 * float(np.abs(np.asarray(zr2)).max()))


def test_planar_plan_sigma_mismatch_fails_loudly(rng):
    """A plan built at one sigma passed to a transform at another must raise
    (the silent version of this ran at full speed and returned garbage —
    round-4 bench bug, caught by the sampled-frequency headline gate)."""
    import jax.numpy as jnp
    import pytest

    from torch_nfft_tpu.ops.binned import build_plan
    from torch_nfft_tpu.ops.planar import nfft_adjoint_planar

    n, dim, N, m = 2000, 2, 16, 2
    pos = _points(rng, n, dim)
    x = rng.standard_normal((n, 1)).astype(np.float32)
    batch = jnp.zeros((n,), jnp.int32)
    plan = build_plan(pos, None, N=N, m=m, sigma=2.0, window="es")
    with pytest.raises(ValueError, match="sigma"):
        nfft_adjoint_planar(jnp.asarray(x), jnp.asarray(pos), batch, plan,
                            batch_size=1, N=N, m=m, sigma=1.75, window="es")
    with pytest.raises(ValueError, match="cutoff"):
        nfft_adjoint_planar(jnp.asarray(x), jnp.asarray(pos), batch, plan,
                            batch_size=1, N=N, m=3, sigma=2.0, window="es")


def test_default_tile_divides_fractional_M():
    """Fractional sigma makes M a non-power-of-two; the default tile must
    drop to a dividing power of two (a ragged last tile measured 1.65x
    slower at 2D N=128 sigma=1.625) without violating the halo-fold
    minimum T >= 2m+1."""
    from torch_nfft_tpu.ops.binned import default_tile

    assert default_tile(2, 2, 208) == 16      # 208 = 16*13, preferred 32
    assert default_tile(3, 2, 416) == 16      # unchanged (16 divides)
    assert default_tile(1, 2, 6656) == 64     # unchanged (64 divides)
    assert default_tile(2, 4, 208) == 16      # tmin=16 still divides
    assert default_tile(3, 2, 512) == 16      # power-of-two M unchanged
    # odd M: nothing divides — keep the preferred tile (ceil tiling)
    assert default_tile(2, 2, 209) == 32
