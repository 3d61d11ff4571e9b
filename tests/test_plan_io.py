"""Plan persistence: save_plan/load_plan round-trips (ops/plan_io.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

import torch_nfft_tpu as tn
from torch_nfft_tpu.ops.binned import build_plan
from torch_nfft_tpu.ops.plan_io import _ARRAY_FIELDS, load_plan, save_plan


def _plan_and_points(rng, window="gaussian"):
    n, dim, N, m, B = 96, 2, 16, 3, 2
    pos = (rng.random((n, dim)) - 0.5).astype(np.float32)
    pos /= 4 * np.abs(pos).max()
    batch = np.repeat(np.arange(B, dtype=np.int32), n // B)
    plan = build_plan(pos, batch, N=N, m=m, batch_size=B, window=window)
    return plan, pos, batch, N, m, B


@pytest.mark.parametrize("window", ["gaussian", "es"])
def test_round_trip_preserves_everything(rng, tmp_path, window):
    plan, _, _, _, _, _ = _plan_and_points(rng, window=window)
    path = tmp_path / "plan.npz"
    save_plan(path, plan)
    loaded = load_plan(path)

    for name in _ARRAY_FIELDS:
        np.testing.assert_array_equal(
            np.asarray(getattr(loaded, name)), np.asarray(getattr(plan, name))
        )
    for name in (
        "n", "dim", "N", "m", "sigma", "T", "K", "batch_size", "pos_fp",
        "window", "active",
    ):
        assert getattr(loaded, name) == getattr(plan, name), name
    # host-side layout arrays survive when present
    if plan.order is not None:
        np.testing.assert_array_equal(loaded.order, plan.order)
        np.testing.assert_array_equal(loaded.row_start, plan.row_start)


def test_loaded_plan_runs_transforms(rng, tmp_path):
    plan, pos, batch, N, m, B = _plan_and_points(rng)
    path = tmp_path / "plan.npz"
    save_plan(path, plan)
    loaded = load_plan(path)

    x = jnp.asarray(rng.standard_normal((pos.shape[0], 2)).astype(np.float32))
    want = tn.nfft_adjoint(
        x, jnp.asarray(pos), jnp.asarray(batch), batch_size=B,
        bandwidth=N, cutoff=m, plan=plan,
    )
    got = tn.nfft_adjoint(
        x, jnp.asarray(pos), jnp.asarray(batch), batch_size=B,
        bandwidth=N, cutoff=m, plan=loaded,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_round_trip_preserves_benes_routing(rng, tmp_path):
    """A benes-upgraded plan persists its routed bits; the loaded plan
    re-expands them (no host re-routing) and transforms bit-identically."""
    from torch_nfft_tpu.native import native_available

    if not native_available():
        pytest.skip("native router unavailable")
    plan, pos, batch, N, m, B = _plan_and_points(rng)
    plan = plan.with_benes_tables(block_log2=9)
    assert plan.benes.pair_bits is not None
    path = tmp_path / "plan.npz"
    save_plan(path, plan)
    loaded = load_plan(path)

    assert loaded.benes is not None
    assert (loaded.benes.n, loaded.benes.b) == (plan.benes.n, plan.benes.b)
    assert loaded.benes.compact == plan.benes.compact
    np.testing.assert_array_equal(
        np.asarray(loaded.benes.cross_words), np.asarray(plan.benes.cross_words)
    )
    np.testing.assert_array_equal(
        np.asarray(loaded.benes.local_words), np.asarray(plan.benes.local_words)
    )
    x = jnp.asarray(rng.standard_normal((pos.shape[0], 1)).astype(np.float32))
    want = tn.nfft_adjoint(
        x, jnp.asarray(pos), jnp.asarray(batch), batch_size=B,
        bandwidth=N, cutoff=m, plan=plan, strategy="binned",
    )
    got = tn.nfft_adjoint(
        x, jnp.asarray(pos), jnp.asarray(batch), batch_size=B,
        bandwidth=N, cutoff=m, plan=loaded, strategy="binned",
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_loaded_plan_keeps_mismatch_detection(rng, tmp_path):
    """The saved pos_fp fingerprint still catches a foreign point set."""
    plan, pos, batch, N, m, B = _plan_and_points(rng)
    path = tmp_path / "plan.npz"
    save_plan(path, plan)
    loaded = load_plan(path)
    assert loaded.pos_fp == plan.pos_fp

    other = np.roll(pos, 1, axis=0) * 0.9  # bins differently
    x = jnp.asarray(rng.standard_normal((pos.shape[0], 1)).astype(np.float32))
    # the fingerprint check runs when positions are host-side NumPy
    with pytest.raises(ValueError, match="plan"):
        tn.nfft_adjoint(
            x, other, np.asarray(batch), batch_size=B,
            bandwidth=N, cutoff=m, plan=loaded,
        )


def test_rejects_wrong_files(tmp_path):
    bogus = tmp_path / "bogus.npz"
    np.savez(bogus, a=np.arange(3))
    with pytest.raises(ValueError, match="not a torch_nfft_tpu plan"):
        load_plan(bogus)


def test_rejects_future_format(rng, tmp_path):
    import json

    plan, _, _, _, _, _ = _plan_and_points(rng)
    path = tmp_path / "plan.npz"
    save_plan(path, plan)
    with np.load(path) as data:
        arrays = {k: data[k] for k in data.files}
    meta = json.loads(bytes(arrays["__meta__"].tobytes()).decode("utf-8"))
    meta["format_version"] = 999
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta).encode("utf-8"), dtype=np.uint8
    )
    np.savez(path, **arrays)
    with pytest.raises(ValueError, match="format version"):
        load_plan(path)


def test_build_plan_rejects_unknown_window(rng):
    """Typo'd window strings fail at the builder call site, not later at
    transform time or deep inside jit tracing."""
    plan_args = dict(N=16, m=3, batch_size=1)
    pos = (rng.random((32, 2)) - 0.5).astype(np.float32) / 2
    batch = np.zeros((32,), np.int32)
    with pytest.raises(ValueError, match="unknown window"):
        build_plan(pos, batch, window="Gaussian", **plan_args)
    from torch_nfft_tpu.ops.binned import build_plan_device

    with pytest.raises(ValueError, match="unknown window"):
        build_plan_device(jnp.asarray(pos), jnp.asarray(batch),
                          window="esx", **plan_args)


def test_loads_v1_format_rebuilding_fill_keys(rng, tmp_path):
    """v1 files stored inv_slot (n,); loading must rebuild the full (S*K,)
    fill permutation (head = inv_slot, tail = the padding slots)."""
    import json

    plan, pos, batch, N, m, B = _plan_and_points(rng)
    path = tmp_path / "plan.npz"
    save_plan(path, plan)
    with np.load(path) as data:
        arrays = {k: data[k] for k in data.files}
    meta = json.loads(bytes(arrays["__meta__"].tobytes()).decode("utf-8"))
    meta["format_version"] = 1
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta).encode("utf-8"), dtype=np.uint8
    )
    arrays["inv_slot"] = arrays.pop("fill_keys")[: plan.n]
    np.savez(path, **arrays)

    loaded = load_plan(path)
    np.testing.assert_array_equal(
        np.asarray(loaded.fill_keys), np.asarray(plan.fill_keys)
    )

    x = jnp.asarray(rng.standard_normal((pos.shape[0], 2)).astype(np.float32))
    want = tn.nfft_adjoint(
        x, jnp.asarray(pos), jnp.asarray(batch), batch_size=B,
        bandwidth=N, cutoff=m, plan=plan,
    )
    got = tn.nfft_adjoint(
        x, jnp.asarray(pos), jnp.asarray(batch), batch_size=B,
        bandwidth=N, cutoff=m, plan=loaded,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_fill_keys_is_a_permutation_on_every_builder(rng):
    """fill_keys must be a permutation of [0, S*K) whose head is the
    point->slot map — on the host, native and device builders alike."""
    from torch_nfft_tpu.ops.binned import build_plan_device

    n, dim, N, m = 160, 2, 16, 3
    pos = (rng.random((n, dim)) - 0.5).astype(np.float32)
    pos /= 4 * np.abs(pos).max()
    batch = np.zeros((n,), np.int32)

    for plan in (
        build_plan(pos, batch, N=N, m=m, batch_size=1),
        build_plan_device(jnp.asarray(pos), jnp.asarray(batch), N=N, m=m,
                          batch_size=1),
    ):
        fk = np.asarray(plan.fill_keys)
        S, K = plan.slot_pt.shape
        assert fk.shape == (S * K,)
        np.testing.assert_array_equal(np.sort(fk), np.arange(S * K))
        # head routes points: slot_pt[fill_keys[i]] == i for valid slots
        sp = np.asarray(plan.slot_pt).reshape(-1)
        np.testing.assert_array_equal(sp[fk[:n]], np.arange(n))
        # tail lists only invalid slots
        rc = np.asarray(plan.row_count)
        valid = (np.arange(K)[None, :] < rc[:, None]).reshape(-1)
        assert not valid[fk[n:]].any()
