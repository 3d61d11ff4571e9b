"""Fail-loudly and caching behavior: plan/point-set mismatch detection, the
eager plan LRU, complex-free coefficient generation, and actionable errors on
complex-free backends (ADVICE.md round-1 findings + VERDICT items 3/7/9)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import torch_nfft_tpu as tn
from torch_nfft_tpu.ops import binned as binned_mod
from torch_nfft_tpu.ops import nfft as nfft_mod


@pytest.fixture
def no_complex(monkeypatch):
    monkeypatch.setattr(nfft_mod, "_COMPLEX_OK", False)


@pytest.fixture(autouse=True)
def fresh_plan_cache():
    tn.clear_plan_cache()
    yield
    tn.clear_plan_cache()


def _points(rng, n, dim):
    pos = (rng.random((n, dim)) - 0.5).astype(np.float32)
    pos /= 4 * np.abs(pos).max()
    return pos


# ---------------------------------------------------------------------------
# Plan <-> point-set mismatch detection
# ---------------------------------------------------------------------------


def test_plan_wrong_point_count_raises(rng):
    pos = _points(rng, 300, 2)
    plan = tn.build_plan(pos, None, N=16, m=4)
    x = rng.standard_normal((200, 1)).astype(np.float32)
    with pytest.raises(ValueError, match="n=300"):
        tn.nfft_adjoint(x, _points(rng, 200, 2), bandwidth=16, cutoff=4, plan=plan)


def test_plan_wrong_positions_same_shape_raises(rng):
    pos_a = _points(rng, 300, 2)
    pos_b = _points(rng, 300, 2)
    plan = tn.build_plan(pos_a, None, N=16, m=4)
    x = rng.standard_normal((300, 1)).astype(np.float32)
    with pytest.raises(ValueError, match="fingerprint"):
        tn.nfft_adjoint(x, pos_b, bandwidth=16, cutoff=4, plan=plan)
    # the matching point set sails through
    tn.nfft_adjoint(x, pos_a, bandwidth=16, cutoff=4, plan=plan)


def test_plan_wrong_batch_size_raises(rng):
    pos = _points(rng, 300, 2)
    batch = np.repeat(np.arange(2, dtype=np.int32), 150)
    plan = tn.build_plan(pos, batch, N=16, m=4, batch_size=2)
    x = rng.standard_normal((300, 1)).astype(np.float32)
    with pytest.raises(ValueError, match="batch_size"):
        tn.nfft_adjoint(
            x, pos, np.zeros(300, np.int32), bandwidth=16, cutoff=4,
            batch_size=1, plan=plan,
        )


def test_plan_wrong_geometry_raises(rng):
    pos = _points(rng, 300, 2)
    plan = tn.build_plan(pos, None, N=16, m=4)
    x = rng.standard_normal((300, 1)).astype(np.float32)
    with pytest.raises(ValueError, match="m="):
        tn.nfft_adjoint(x, pos, bandwidth=16, cutoff=3, plan=plan)


# ---------------------------------------------------------------------------
# Eager plan cache
# ---------------------------------------------------------------------------


def test_eager_plan_cache_builds_once(rng, monkeypatch):
    calls = {"n": 0}
    real_build = binned_mod.build_plan

    def counting_build(*args, **kwargs):
        calls["n"] += 1
        return real_build(*args, **kwargs)

    monkeypatch.setattr(binned_mod, "build_plan", counting_build)

    pos = _points(rng, 500, 2)
    x = rng.standard_normal((500, 1)).astype(np.float32)
    ref = np.asarray(tn.ndft_adjoint(x, pos, N=16))

    for _ in range(3):
        y = tn.nfft_adjoint(x, pos, bandwidth=16, cutoff=4, strategy="binned")
    assert calls["n"] == 1
    rel = np.linalg.norm(np.asarray(y) - ref) / np.linalg.norm(ref)
    assert rel < 1e-3

    # different geometry -> a second build
    tn.nfft_forward(y, pos, cutoff=4, strategy="binned")
    assert calls["n"] == 1  # same (points, N, m, sigma, batch) key as adjoint
    tn.nfft_adjoint(x, pos, bandwidth=32, cutoff=4, strategy="binned")
    assert calls["n"] == 2

    tn.clear_plan_cache()
    tn.nfft_adjoint(x, pos, bandwidth=16, cutoff=4, strategy="binned")
    assert calls["n"] == 3


def test_plan_cache_key_identity_fast_path(rng, monkeypatch):
    """Repeat eager calls with the SAME array object must not re-hash the
    positions on the host (round-3 VERDICT weak #6: the content hash is an
    O(n) host read per call — ~100 ms at n=16M)."""
    import hashlib

    hashes = {"n": 0}
    real_blake = hashlib.blake2b

    def counting_blake(*args, **kwargs):
        hashes["n"] += 1
        return real_blake(*args, **kwargs)

    monkeypatch.setattr(hashlib, "blake2b", counting_blake)

    # The fast path only trusts immutable arrays (jax.Array, or numpy frozen
    # with writeable=False): a writable ndarray mutated in place would
    # otherwise return a stale content key and a silently wrong plan.
    pos = _points(rng, 500, 2)
    pos.flags.writeable = False
    batch = np.zeros((500,), np.int32)
    batch.flags.writeable = False
    k1 = nfft_mod._plan_cache_key(pos, batch, 16, 4, 2.0, 1, "gaussian")
    assert hashes["n"] == 1
    k2 = nfft_mod._plan_cache_key(pos, batch, 16, 4, 2.0, 1, "gaussian")
    assert hashes["n"] == 1  # identity hit: no second content hash
    assert k1 == k2

    # same content, different object -> content hash runs, same key
    k3 = nfft_mod._plan_cache_key(pos.copy(), batch, 16, 4, 2.0, 1, "gaussian")
    assert hashes["n"] == 2
    assert k3 == k1

    # same object, different params -> distinct key (hash may rerun)
    k4 = nfft_mod._plan_cache_key(pos, batch, 32, 4, 2.0, 1, "gaussian")
    assert k4 != k1

    # a DIFFERENT batch object with the same positions object -> no stale hit
    batch2 = np.ones((500,), np.int32)
    k5 = nfft_mod._plan_cache_key(pos, batch2, 16, 4, 2.0, 1, "gaussian")
    assert k5 != k1

    # WRITABLE arrays must re-hash every call: in-place mutation changes the
    # plan, and an identity hit would hide it (round-4 ADVICE, medium)
    posw = _points(rng, 500, 2)
    h0 = hashes["n"]
    kw1 = nfft_mod._plan_cache_key(posw, None, 16, 4, 2.0, 1, "gaussian")
    kw2 = nfft_mod._plan_cache_key(posw, None, 16, 4, 2.0, 1, "gaussian")
    assert hashes["n"] == h0 + 2  # no identity shortcut for mutable inputs
    assert kw1 == kw2
    posw[:] = posw + 0.01  # in-place mutation -> the key must change
    kw3 = nfft_mod._plan_cache_key(posw, None, 16, 4, 2.0, 1, "gaussian")
    assert kw3 != kw1

    # jax.Arrays are immutable: identity fast path applies
    import jax.numpy as jnp

    posj = jnp.asarray(_points(rng, 500, 2))
    h0 = hashes["n"]
    nfft_mod._plan_cache_key(posj, None, 16, 4, 2.0, 1, "gaussian")
    nfft_mod._plan_cache_key(posj, None, 16, 4, 2.0, 1, "gaussian")
    assert hashes["n"] == h0 + 1


# ---------------------------------------------------------------------------
# Complex-free coefficient generation (VERDICT missing item #3)
# ---------------------------------------------------------------------------


def test_interpolated_coeffs_complex_free(rng, no_complex, monkeypatch):
    def boom(*a, **k):  # prove the device complex FFT is never touched
        raise AssertionError("jnp.fft.fftn must not run on a complex-free backend")

    monkeypatch.setattr(jnp.fft, "fftn", boom)

    got = tn.gaussian_interpolated_coeffs(0.3, dim=2, N=16)
    assert not jnp.issubdtype(got.dtype, jnp.complexfloating)

    grid_vals = np.exp(-np.asarray(tn.radial_interpolation_grid(dim=2, N=16)) ** 2)
    got2 = tn.interpolated_kernel_coeffs(grid_vals)
    assert not jnp.issubdtype(got2.dtype, jnp.complexfloating)


def test_interpolated_coeffs_complex_free_matches_complex_path(rng, monkeypatch):
    monkeypatch.setattr(nfft_mod, "_COMPLEX_OK", False)
    got = np.asarray(tn.gaussian_interpolated_coeffs(0.3, dim=2, N=16))
    monkeypatch.setattr(nfft_mod, "_COMPLEX_OK", True)
    ref = np.asarray(tn.gaussian_interpolated_coeffs(0.3, dim=2, N=16))
    np.testing.assert_allclose(got, ref.real, rtol=1e-5, atol=1e-6)
    assert np.abs(ref.imag).max() < 1e-6


def test_gaussian_kernel_default_path_complex_free(rng, no_complex, monkeypatch):
    def boom(*a, **k):
        raise AssertionError("complex FFT reached from GaussianKernel")

    monkeypatch.setattr(jnp.fft, "fftn", boom)
    monkeypatch.setattr(jnp.fft, "ifftn", boom)

    pos = _points(rng, 200, 2)
    x = rng.standard_normal((200,)).astype(np.float32)
    k = tn.GaussianKernel(
        0.5, dim=2, bandwidth=16, cutoff=4, max_euclidean_norm=1.0, analytic=False
    )
    out = np.asarray(k(pos) @ x)
    assert np.isfinite(out).all()


# ---------------------------------------------------------------------------
# Actionable errors on complex-free backends (VERDICT weak item #4)
# ---------------------------------------------------------------------------


def test_complex_output_raises_actionable_error(rng, no_complex):
    pos = _points(rng, 100, 2)
    x = rng.standard_normal((100, 1)).astype(np.float32)
    with pytest.raises(ValueError, match="real_output=True"):
        tn.nfft_adjoint(x, pos, bandwidth=16, cutoff=4)  # complex output
    spec = rng.standard_normal((1, 16, 16, 1)).astype(np.float32)
    with pytest.raises(ValueError, match="planar"):
        tn.nfft_forward(spec, pos, cutoff=4)
    with pytest.raises(ValueError, match="planar"):
        tn.nfft_fastsum(
            x, jnp.ones((16, 16), jnp.complex64), pos, cutoff=4
        )


# ---------------------------------------------------------------------------
# Fastsum symmetric-shortcut gating (ADVICE low #2)
# ---------------------------------------------------------------------------


def test_fastsum_same_points_different_batches(rng):
    n, dim, N, m = 120, 2, 8, 3
    pos = _points(rng, n, dim)
    x = rng.standard_normal((n, 1)).astype(np.float32)
    coeffs = np.asarray(tn.gaussian_analytic_coeffs(0.25, dim=dim, N=N))
    src_b = np.repeat(np.arange(2, dtype=np.int32), n // 2)
    tgt_b = np.sort(np.tile(np.arange(2, dtype=np.int32), n // 2))

    got = tn.nfft_fastsum(x, coeffs, pos, pos, src_b, tgt_b, cutoff=m)
    # oracle: targets as a *distinct* array forces the non-shared-plan path
    ref = tn.nfft_fastsum(x, coeffs, pos, pos.copy(), src_b, tgt_b, cutoff=m)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# float64 positions under a float32 plan (ADVICE low #4)
# ---------------------------------------------------------------------------


def test_binned_float64_positions_match_plan(rng):
    with jax.enable_x64(True):
        pos32 = _points(rng, 400, 2)
        pos64 = jnp.asarray(pos32, jnp.float64)
        x = jnp.asarray(rng.standard_normal((400, 1)).astype(np.float32))
        plan = tn.build_plan(pos32, None, N=16, m=4)
        got = tn.nfft_adjoint(
            np.asarray(x), pos64, bandwidth=16, cutoff=4, plan=plan, real_output=True
        )
        ref = np.asarray(tn.ndft_adjoint(np.asarray(x), pos32, N=16)).real
        rel = np.linalg.norm(np.asarray(got).reshape(ref.shape) - ref) / np.linalg.norm(ref)
        assert rel < 1e-3, rel


def test_set_complex_override_roundtrip(rng):
    """The public setter flips dispatch to the planar pipeline and back."""
    import torch_nfft_tpu as tn
    from torch_nfft_tpu.ops import nfft as nfft_mod

    n, N, m = 80, 16, 3
    pos = (rng.random((n, 2)) - 0.5).astype(np.float32)
    pos /= 4 * np.abs(pos).max()
    x = rng.standard_normal((n, 2)).astype(np.float32)
    try:
        tn.set_complex_override(False)
        y_planar = tn.nfft_adjoint(x, pos, bandwidth=N, cutoff=m, real_output=True)
        assert not np.iscomplexobj(np.asarray(y_planar))
        tn.set_complex_override(True)
        y_cplx = tn.nfft_adjoint(x, pos, bandwidth=N, cutoff=m, real_output=True)
        np.testing.assert_allclose(
            np.asarray(y_planar), np.asarray(y_cplx), rtol=1e-4, atol=1e-4
        )
    finally:
        tn.set_complex_override(None)
    assert nfft_mod._COMPLEX_OK is None
