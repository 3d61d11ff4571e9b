"""Tests for the fused Pallas bitonic sorter (ops/pallas/bitonic.py).

Run in interpret mode on CPU (conftest pins JAX_PLATFORMS=cpu); the TPU
path is exercised by examples/probe_bitonic.py and the engine benchmarks.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from torch_nfft_tpu.ops.pallas.bitonic import (
    _round_chunks,
    apply_permutation,
    sort_pairs,
)


@pytest.mark.parametrize("unrolled", [False, True])
@pytest.mark.parametrize("q,b", [(9, 9), (10, 10), (12, 10), (14, 11)])
def test_sort_pairs_permutation_keys(q, b, unrolled):
    rng = np.random.default_rng(q * 31 + b)
    Q = 1 << q
    dest = rng.permutation(Q).astype(np.int32)
    vals = rng.standard_normal(Q).astype(np.float32)
    sk, sv = sort_pairs(jnp.asarray(dest), jnp.asarray(vals),
                        block_log2=b, interpret=True, unrolled=unrolled)
    ref = np.zeros(Q, np.float32)
    ref[dest] = vals
    np.testing.assert_array_equal(np.asarray(sk), np.arange(Q))
    np.testing.assert_array_equal(np.asarray(sv), ref)


def test_sort_pairs_with_ties():
    rng = np.random.default_rng(7)
    Q = 1 << 12
    keys = rng.integers(0, 37, Q).astype(np.int32)
    vals = rng.standard_normal(Q).astype(np.float32)
    sk, sv = sort_pairs(jnp.asarray(keys), jnp.asarray(vals),
                        block_log2=10, interpret=True)
    np.testing.assert_array_equal(np.asarray(sk), np.sort(keys))
    # values must be the same multiset, paired with their original keys
    got = sorted(zip(np.asarray(sk).tolist(), np.asarray(sv).tolist()))
    want = sorted(zip(keys.tolist(), vals.tolist()))
    assert got == want


def test_sort_pairs_negative_and_duplicate_extremes():
    Q = 1 << 9
    keys = np.concatenate([np.full(Q // 2, -5), np.full(Q // 2, 3)])
    np.random.default_rng(0).shuffle(keys)
    vals = np.arange(Q, dtype=np.float32)
    sk, _ = sort_pairs(jnp.asarray(keys.astype(np.int32)),
                       jnp.asarray(vals), interpret=True)
    np.testing.assert_array_equal(np.asarray(sk), np.sort(keys))


def test_small_input_falls_back():
    rng = np.random.default_rng(3)
    Q = 1 << 6
    dest = rng.permutation(Q).astype(np.int32)
    vals = rng.standard_normal(Q).astype(np.float32)
    out = apply_permutation(jnp.asarray(dest), jnp.asarray(vals),
                            interpret=True)
    ref = np.zeros(Q, np.float32)
    ref[dest] = vals
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_non_power_of_two_rejected():
    with pytest.raises(ValueError, match="power of two"):
        sort_pairs(jnp.zeros(100, jnp.int32), jnp.zeros(100, jnp.float32),
                   interpret=True)


def test_shape_mismatch_rejected():
    with pytest.raises(ValueError, match="identical"):
        sort_pairs(jnp.zeros(128, jnp.int32), jnp.zeros(64, jnp.float32),
                   interpret=True)


def test_round_chunks_cover_all_rounds():
    for b in range(1, 21):
        chunks = _round_chunks(b)
        rounds = [jj for lo, hi in chunks for jj in range(lo, hi + 1)]
        assert rounds == list(range(1, b + 1))
        for lo, hi in chunks:
            assert sum(range(lo, hi + 1)) <= 88 or lo == hi
