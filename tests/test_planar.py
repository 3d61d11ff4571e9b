"""Planar (pure-real) pipelines vs the complex-dtype pipelines."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import torch_nfft_tpu as tn
from torch_nfft_tpu.ops.binned import build_plan
from torch_nfft_tpu.ops.planar import (
    nfft_adjoint_planar,
    nfft_fastsum_real,
    nfft_forward_planar,
)


def _points(rng, n, dim, batch_size):
    pos = (rng.random((n, dim)) - 0.5).astype(np.float32)
    pos /= 4 * np.abs(pos).max()
    batch = np.repeat(np.arange(batch_size, dtype=np.int32), n // batch_size)
    return pos, batch


@pytest.mark.parametrize("dim,N", [(1, 16), (2, 16), (3, 8)])
def test_adjoint_planar_matches_complex(rng, dim, N):
    n, m, B, C = 60, 3, 2, 3
    pos, batch = _points(rng, n, dim, B)
    x = rng.standard_normal((n, C)).astype(np.float32)
    ref = tn.nfft_adjoint(x, pos, batch, bandwidth=N, cutoff=m, batch_size=B)
    yr, yi = nfft_adjoint_planar(
        jnp.asarray(x), jnp.asarray(pos), jnp.asarray(batch), batch_size=B, N=N, m=m
    )
    got = np.asarray(yr) + 1j * np.asarray(yi)
    np.testing.assert_allclose(got, np.asarray(ref), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("dim,N", [(1, 16), (2, 16)])
def test_forward_planar_matches_complex(rng, dim, N):
    n, m, B, C = 60, 3, 2, 3
    pos, batch = _points(rng, n, dim, B)
    x = (
        rng.standard_normal((B,) + (N,) * dim + (C,))
        + 1j * rng.standard_normal((B,) + (N,) * dim + (C,))
    ).astype(np.complex64)
    ref = tn.nfft_forward(x, pos, batch, cutoff=m, batch_size=B)
    yr, yi = nfft_forward_planar(
        jnp.asarray(x.real.copy()),
        jnp.asarray(x.imag.copy()),
        jnp.asarray(pos),
        jnp.asarray(batch),
        batch_size=B,
        dim=dim,
        m=m,
    )
    got = np.asarray(yr) + 1j * np.asarray(yi)
    np.testing.assert_allclose(got, np.asarray(ref), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("dim,N", [(1, 16), (2, 16), (3, 8)])
def test_forward_planar_real_output_bitwise(rng, dim, N):
    """real_output=True must return yr bit-identical to the two-plane run:
    the gather never mixes planes, so skipping the imaginary one is exact."""
    n, m, B, C = 60, 3, 2, 3
    pos, batch = _points(rng, n, dim, B)
    xr = rng.standard_normal((B,) + (N,) * dim + (C,)).astype(np.float32)
    xi = rng.standard_normal((B,) + (N,) * dim + (C,)).astype(np.float32)
    args = (jnp.asarray(pos), jnp.asarray(batch))
    full_r, full_i = nfft_forward_planar(
        jnp.asarray(xr), jnp.asarray(xi), *args, batch_size=B, dim=dim, m=m
    )
    only_r, none_i = nfft_forward_planar(
        jnp.asarray(xr), jnp.asarray(xi), *args, batch_size=B, dim=dim, m=m,
        real_output=True,
    )
    assert none_i is None
    # single- vs two-plane gathers batch their reductions differently, so
    # parity is numerical (~1e-6 f32 jitter), not bitwise
    np.testing.assert_allclose(
        np.asarray(only_r), np.asarray(full_r), rtol=1e-5, atol=1e-5
    )


def test_forward_planar_real_output_with_plan(rng):
    """Same bitwise-parity check through the binned-plan fold route."""
    from torch_nfft_tpu.ops.binned import build_plan

    n, N, m, B, dim = 5000, 16, 4, 1, 2
    pos, batch = _points(rng, n, dim, B)
    plan = build_plan(pos, batch, N=N, m=m, batch_size=B)
    xr = rng.standard_normal((B,) + (N,) * dim + (2,)).astype(np.float32)
    xi = rng.standard_normal((B,) + (N,) * dim + (2,)).astype(np.float32)
    args = (jnp.asarray(pos), jnp.asarray(batch), plan)
    full_r, _ = nfft_forward_planar(
        jnp.asarray(xr), jnp.asarray(xi), *args, batch_size=B, dim=dim, m=m
    )
    only_r, none_i = nfft_forward_planar(
        jnp.asarray(xr), jnp.asarray(xi), *args, batch_size=B, dim=dim, m=m,
        real_output=True,
    )
    assert none_i is None
    np.testing.assert_allclose(
        np.asarray(only_r), np.asarray(full_r), rtol=1e-4, atol=1e-5
    )


def test_fastsum_real_matches_complex(rng):
    n, N, m, B, C, dim = 64, 8, 3, 2, 2, 2
    pos, batch = _points(rng, n, dim, B)
    x = rng.standard_normal((n, C)).astype(np.float32)
    coeffs = tn.gaussian_analytic_coeffs(0.25, dim=dim, N=N)
    ref = tn.nfft_fastsum(x, coeffs, pos, batch=batch, cutoff=m, batch_size=B)
    got = nfft_fastsum_real(
        jnp.asarray(x),
        coeffs,
        jnp.asarray(pos),
        jnp.asarray(pos),
        jnp.asarray(batch),
        jnp.asarray(batch),
        batch_size=B,
        N=N,
        m=m,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_roundtrip_planar_vs_ndft(rng):
    """adjoint -> forward planar roundtrip against the dense oracle."""
    n, N, m, dim = 50, 16, 4, 2
    pos, batch = _points(rng, n, dim, 1)
    x = rng.standard_normal((n, 2)).astype(np.float32)
    yr, yi = nfft_adjoint_planar(
        jnp.asarray(x), jnp.asarray(pos), jnp.asarray(batch), batch_size=1, N=N, m=m
    )
    zr, _ = nfft_forward_planar(
        yr, yi, jnp.asarray(pos), jnp.asarray(batch), batch_size=1, dim=dim, m=m
    )
    spec = tn.ndft_adjoint(x, pos, N=N)
    ref = tn.ndft_forward(np.asarray(spec), pos).real
    rel = np.linalg.norm(np.asarray(zr) - ref) / np.linalg.norm(ref)
    assert rel < 5e-4, rel


def test_fastsum_slot_io_matches(rng):
    """slot_io fastsum (slot vector in, slot vector out) matches the
    user-order fastsum; gradients w.r.t. the user values agree through the
    to_slot_order chain; missing plans fail loudly."""
    import pytest as _pytest

    n, N, m, B, C, dim = 5000, 16, 4, 1, 2, 2
    pos, batch = _points(rng, n, dim, B)
    plan = build_plan(pos, batch, N=N, m=m, batch_size=B)
    x = jnp.asarray(rng.standard_normal((n, C)).astype(np.float32))
    coeffs = tn.gaussian_analytic_coeffs(0.25, dim=dim, N=N)
    args = (jnp.asarray(pos), jnp.asarray(pos), jnp.asarray(batch),
            jnp.asarray(batch), plan, plan)

    ref = nfft_fastsum_real(x, coeffs, *args, batch_size=B, N=N, m=m)
    v = tn.to_slot_order(plan, x)
    got = nfft_fastsum_real(
        v, coeffs, *args, batch_size=B, N=N, m=m, slot_io=True
    )
    S, K = plan.slot_pt.shape
    assert got.shape == (C, S * K)
    np.testing.assert_allclose(
        np.asarray(tn.from_slot_order(plan, got)), np.asarray(ref),
        rtol=1e-5, atol=1e-5,
    )

    d_ref = jax.grad(
        lambda a: jnp.sum(
            nfft_fastsum_real(a, coeffs, *args, batch_size=B, N=N, m=m) ** 2
        )
    )(x)
    d_slot = jax.grad(
        lambda a: jnp.sum(
            nfft_fastsum_real(
                tn.to_slot_order(plan, a), coeffs, *args,
                batch_size=B, N=N, m=m, slot_io=True,
            ) ** 2
        )
    )(x)
    sc = max(1e-6, float(jnp.abs(d_ref).max()))
    np.testing.assert_allclose(
        np.asarray(d_slot), np.asarray(d_ref), atol=5e-5 * sc
    )

    with _pytest.raises(ValueError, match="slot_io"):
        nfft_fastsum_real(
            v, coeffs, jnp.asarray(pos), jnp.asarray(pos),
            jnp.asarray(batch), jnp.asarray(batch),
            batch_size=B, N=N, m=m, slot_io=True,
        )
