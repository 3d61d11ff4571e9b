"""Native (C++) plan builder vs the NumPy fallback — identical tables."""

import numpy as np
import pytest

from torch_nfft_tpu import native
from torch_nfft_tpu.ops import binned


@pytest.fixture(scope="module")
def have_native():
    if not native.native_available():
        pytest.skip("native library unavailable (no g++?)")
    return True


def _build_both(pos, batch, **kw):
    plan_native = binned.build_plan(pos, batch, **kw)
    # force the NumPy path
    import unittest.mock as mock

    with mock.patch.object(binned, "build_plan", wraps=binned.build_plan):
        with mock.patch("torch_nfft_tpu.native.plan_tables", return_value=None):
            plan_np = binned.build_plan(pos, batch, **kw)
    return plan_native, plan_np


@pytest.mark.parametrize("dim,N,B", [(1, 16, 1), (2, 16, 3), (3, 8, 2)])
def test_native_matches_numpy(have_native, rng, dim, N, B):
    n, m = 257, 3
    pos = (rng.random((n, dim)) - 0.5).astype(np.float32)
    batch = np.sort(rng.integers(0, B, n)).astype(np.int32)
    a, b = _build_both(pos, batch, N=N, m=m, batch_size=B)
    assert a.K == b.K and a.T == b.T
    valid = np.asarray(a.slot_valid) > 0
    np.testing.assert_array_equal(np.asarray(a.slot_valid), np.asarray(b.slot_valid))
    # padding slots carry arbitrary (masked) point indices; compare valid only
    np.testing.assert_array_equal(
        np.asarray(a.slot_pt)[valid], np.asarray(b.slot_pt)[valid]
    )
    np.testing.assert_array_equal(np.asarray(a.origin), np.asarray(b.origin))
    np.testing.assert_array_equal(np.asarray(a.row_batch), np.asarray(b.row_batch))
    np.testing.assert_array_equal(np.asarray(a.inv_slot), np.asarray(b.inv_slot))


def test_native_explicit_capacity(have_native, rng):
    n, dim, N, m = 100, 2, 8, 2
    pos = (rng.random((n, dim)) - 0.5).astype(np.float32) * 0.05  # clustered
    a, b = _build_both(pos, None, N=N, m=m, batch_size=1, K=8)
    assert a.K == b.K == 8
    valid = np.asarray(a.slot_valid) > 0
    np.testing.assert_array_equal(
        np.asarray(a.slot_pt)[valid], np.asarray(b.slot_pt)[valid]
    )
    np.testing.assert_array_equal(np.asarray(a.inv_slot), np.asarray(b.inv_slot))


def test_sorted_layout_consistency(have_native, rng):
    """order/row_start/row_count describe the same assignment as slot_pt."""
    n, dim, N, m, B = 300, 2, 16, 3, 2
    pos = (rng.random((n, dim)) - 0.5).astype(np.float32)
    batch = np.sort(rng.integers(0, B, n)).astype(np.int32)
    plan = binned.build_plan(pos, batch, N=N, m=m, batch_size=B)
    order = np.asarray(plan.order)
    rs, rc = np.asarray(plan.row_start), np.asarray(plan.row_count)
    pt, valid = np.asarray(plan.slot_pt), np.asarray(plan.slot_valid)
    assert sorted(order.tolist()) == list(range(n))
    for r in range(pt.shape[0]):
        cnt = rc[r]
        np.testing.assert_array_equal(order[rs[r] : rs[r] + cnt], pt[r, :cnt])
        assert valid[r, :cnt].all() and not valid[r, cnt:].any()
