"""Ragged stream expansion/compaction kernels (ops/pallas/ragged.py).

CPU interpret-mode checks against a NumPy oracle: expand places
compact[row_start[s] + k] at padded[s, k] (k < count), compact is its
transpose, and the two are inverse on valid lanes.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from torch_nfft_tpu.ops.pallas.ragged import (
    compact_rows,
    expand_rows,
    row_start_from_counts,
)


def _random_layout(rng, S, K):
    counts = rng.integers(1, K + 1, size=S).astype(np.int32)
    rs = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int32)
    n = int(counts.sum())
    return counts, rs, n


@pytest.mark.parametrize("S,K", [(7, 128), (23, 256), (4, 128)])
def test_expand_matches_oracle(S, K):
    rng = np.random.default_rng(0)
    counts, rs, n = _random_layout(rng, S, K)
    nb_in = (n - 1) // K + 2
    stream = rng.standard_normal(nb_in * K).astype(np.float32)

    got = np.asarray(
        expand_rows(
            jnp.asarray(stream),
            jnp.asarray(rs),
            jnp.asarray(counts),
            K=K,
            interpret=True,
        )
    )
    want = np.zeros((S, K), np.float32)
    for s in range(S):
        c = counts[s]
        want[s, :c] = stream[rs[s] : rs[s] + c]
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("S,K", [(7, 128), (23, 256)])
def test_compact_matches_oracle(S, K):
    rng = np.random.default_rng(1)
    counts, rs, n = _random_layout(rng, S, K)
    padded = rng.standard_normal((S, K)).astype(np.float32)

    got = np.asarray(
        compact_rows(
            jnp.asarray(padded),
            jnp.asarray(rs),
            jnp.asarray(counts),
            n,
            interpret=True,
        )
    )
    NB = -(-n // K)
    want = np.zeros(NB * K, np.float32)
    for s in range(S):
        c = counts[s]
        want[rs[s] : rs[s] + c] = padded[s, :c]
    np.testing.assert_array_equal(got, want)


def test_expand_compact_roundtrip_and_adjoint():
    rng = np.random.default_rng(2)
    S, K = 17, 128
    counts, rs, n = _random_layout(rng, S, K)
    NB = -(-n // K)
    nb_in = (n - 1) // K + 2
    stream = np.zeros(nb_in * K, np.float32)
    stream[:n] = rng.standard_normal(n).astype(np.float32)

    rs_d = jnp.asarray(rs)
    cnt_d = jnp.asarray(counts)
    padded = expand_rows(jnp.asarray(stream), rs_d, cnt_d, K=K,
                         interpret=True)
    back = np.asarray(compact_rows(padded, rs_d, cnt_d, n, interpret=True))
    np.testing.assert_array_equal(back[:n], stream[:n])

    # adjointness: <expand(c), y> == <c, compact(y)> for the valid lanes
    y = rng.standard_normal((S, K)).astype(np.float32)
    lhs = float(jnp.vdot(padded, jnp.asarray(y)))
    cy = compact_rows(jnp.asarray(y), rs_d, cnt_d, n, interpret=True)
    rhs = float(jnp.vdot(jnp.asarray(stream[: NB * K]), cy))
    assert abs(lhs - rhs) < 1e-3 * max(1.0, abs(lhs))


def test_row_start_from_counts():
    counts = jnp.asarray([3, 1, 4, 2], jnp.int32)
    np.testing.assert_array_equal(
        np.asarray(row_start_from_counts(counts)), [0, 3, 4, 8]
    )
