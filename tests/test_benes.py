"""Benes permutation network: routing (looping algorithm), packed masks,
forward/reverse device apply (ops/pallas/benes.py, csrc/benes_router.cpp).
Interpret mode on CPU; TPU timing lives in examples/probe_benes.py."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from torch_nfft_tpu.ops.pallas.benes import (
    apply_benes,
    apply_benes_np,
    expand_pair_bits,
    pack_masks,
    route_benes_np,
    stage_distances,
    unpack_pair_bits_np,
)


@pytest.mark.parametrize("q", [1, 2, 3, 5, 8, 11])
def test_route_and_apply_np(q):
    rng = np.random.default_rng(q)
    n = 1 << q
    perm = rng.permutation(n)
    masks = route_benes_np(perm)
    assert masks.shape == (max(2 * q - 1, 1), n)
    # pair-consistency: mask[t][i] == mask[t][i ^ 2^d]
    for t, d in enumerate(stage_distances(q)):
        m2 = masks[t].reshape(-1, 2, 1 << d)
        np.testing.assert_array_equal(m2[:, 0], m2[:, 1])
    x = rng.standard_normal(n).astype(np.float32)
    out = apply_benes_np(masks, x)
    ref = np.empty_like(x)
    ref[perm] = x
    np.testing.assert_array_equal(out, ref)


@pytest.mark.parametrize("mode", ["unrolled", "loop", "xla"])
@pytest.mark.parametrize("q,b", [(9, 9), (11, 9), (12, 10), (13, 9)])
def test_apply_benes_device_matches_permutation(q, b, mode):
    rng = np.random.default_rng(q * 13 + b)
    n = 1 << q
    perm = rng.permutation(n)
    cw, lw = pack_masks(route_benes_np(perm), q, b)
    x = rng.standard_normal(n).astype(np.float32)
    out = apply_benes(jnp.asarray(x), jnp.asarray(cw), jnp.asarray(lw),
                      block_log2=b, interpret=True, mode=mode)
    ref = np.empty_like(x)
    ref[perm] = x
    np.testing.assert_array_equal(np.asarray(out), ref)
    # reverse applies the inverse permutation with the SAME masks
    back = apply_benes(out, jnp.asarray(cw), jnp.asarray(lw),
                       block_log2=b, reverse=True, interpret=True, mode=mode)
    np.testing.assert_array_equal(np.asarray(back), x)


@pytest.mark.parametrize("sb", [9, 10, 11, 12, 13])
def test_apply_benes_super_log2_splits(sb):
    """The execution superblock (fused low-distance cross stages) must not
    change results at any outer/fused split, forward or reverse."""
    q, b = 13, 9
    rng = np.random.default_rng(sb)
    n = 1 << q
    perm = rng.permutation(n)
    cw, lw = pack_masks(route_benes_np(perm), q, b)
    x = rng.standard_normal(n).astype(np.float32)
    out = apply_benes(jnp.asarray(x), jnp.asarray(cw), jnp.asarray(lw),
                      block_log2=b, interpret=True, super_log2=sb)
    ref = np.empty_like(x)
    ref[perm] = x
    np.testing.assert_array_equal(np.asarray(out), ref)
    back = apply_benes(out, jnp.asarray(cw), jnp.asarray(lw), block_log2=b,
                       reverse=True, interpret=True, super_log2=sb)
    np.testing.assert_array_equal(np.asarray(back), x)


def test_apply_benes_int32_payload():
    rng = np.random.default_rng(3)
    q, b = 10, 9
    n = 1 << q
    perm = rng.permutation(n)
    cw, lw = pack_masks(route_benes_np(perm), q, b)
    x = rng.integers(-(1 << 30), 1 << 30, n).astype(np.int32)
    out = apply_benes(jnp.asarray(x), jnp.asarray(cw), jnp.asarray(lw),
                      block_log2=b, interpret=True)
    ref = np.empty_like(x)
    ref[perm] = x
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_native_router_matches_numpy():
    from torch_nfft_tpu.native import benes_route, native_available

    if not native_available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(5)
    for q in (6, 9, 12):
        n = 1 << q
        perm = rng.permutation(n).astype(np.int32)
        bits = benes_route(perm)
        masks = unpack_pair_bits_np(bits, q)
        np.testing.assert_array_equal(masks, route_benes_np(perm))


def test_native_router_mlp_path(monkeypatch):
    """The speculative multi-chain chase (used for levels >= NFFT_BENES_MLP_MIN,
    normally 2^16) must realize the permutation. Its routing differs from the
    serial one only by per-cycle flips, so validate by applying, not bit-equality.
    Regression: interrupted chains' seed output-pair constraints used to be
    dropped, producing a wrong network (fixed by the reconciliation pass)."""
    from torch_nfft_tpu.native import benes_route, native_available

    if not native_available():
        pytest.skip("native library unavailable")
    monkeypatch.setenv("NFFT_BENES_MLP_MIN", "4")
    monkeypatch.setenv("NFFT_BENES_CHAINS", "16")
    rng = np.random.default_rng(7)
    for q in (6, 8, 11, 13):
        n = 1 << q
        perm = rng.permutation(n).astype(np.int32)
        bits = benes_route(perm)
        masks = unpack_pair_bits_np(bits, q)
        for t, d in enumerate(stage_distances(q)):
            m2 = masks[t].reshape(-1, 2, 1 << d)
            np.testing.assert_array_equal(m2[:, 0], m2[:, 1])
        x = rng.standard_normal(n).astype(np.float32)
        out = apply_benes_np(masks, x)
        ref = np.empty_like(x)
        ref[perm] = x
        np.testing.assert_array_equal(out, ref)


def test_expand_pair_bits_matches_host_packing():
    from torch_nfft_tpu.native import benes_route, native_available

    if not native_available():
        pytest.skip("native library unavailable")
    q, b = 12, 9
    n = 1 << q
    perm = np.random.default_rng(8).permutation(n).astype(np.int32)
    bits = benes_route(perm)
    cw_host, lw_host = pack_masks(unpack_pair_bits_np(bits, q), q, b)
    cw_dev, lw_dev = expand_pair_bits(jnp.asarray(bits.view(np.int32)), q, b)
    np.testing.assert_array_equal(np.asarray(cw_dev), cw_host)
    np.testing.assert_array_equal(np.asarray(lw_dev), lw_host)


def test_route_rejects_non_power_of_two():
    with pytest.raises(ValueError, match="power of two"):
        route_benes_np(np.arange(100))


def test_plan_with_benes_matches_sort_path_exactly(rng):
    """A benes-upgraded plan must produce bit-identical transforms (C=1):
    the masked network and the destination sort realize the same
    permutation."""
    import torch_nfft_tpu as tn
    from torch_nfft_tpu.ops.binned import build_plan

    n, dim, N, m = 600, 2, 16, 3
    pos = (np.random.default_rng(1).random((n, dim)) - 0.5).astype(np.float32)
    pos /= 4 * np.abs(pos).max()
    batch = np.zeros((n,), np.int32)
    x = np.random.default_rng(2).standard_normal((n, 1)).astype(np.float32)

    plan = build_plan(pos, batch, N=N, m=m, batch_size=1)
    plan_b = plan.with_benes_tables(block_log2=9)

    want = tn.nfft_adjoint(jnp.asarray(x), jnp.asarray(pos),
                           jnp.asarray(batch), batch_size=1, bandwidth=N,
                           cutoff=m, plan=plan, strategy="binned")
    got = tn.nfft_adjoint(jnp.asarray(x), jnp.asarray(pos),
                          jnp.asarray(batch), batch_size=1, bandwidth=N,
                          cutoff=m, plan=plan_b, strategy="binned")
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    yw = tn.nfft_forward(want, jnp.asarray(pos), jnp.asarray(batch),
                         cutoff=m, plan=plan, strategy="binned")
    yg = tn.nfft_forward(want, jnp.asarray(pos), jnp.asarray(batch),
                         cutoff=m, plan=plan_b, strategy="binned")
    np.testing.assert_array_equal(np.asarray(yg), np.asarray(yw))


def test_plan_with_benes_slot_space_matches_sort_path(rng):
    """compact=False keeps the legacy padded-slot-space network; it must
    still match the sort path bit-for-bit."""
    import torch_nfft_tpu as tn
    from torch_nfft_tpu.ops.binned import build_plan

    n, dim, N, m = 700, 2, 16, 3
    pos = (np.random.default_rng(5).random((n, dim)) - 0.5).astype(np.float32)
    pos /= 4 * np.abs(pos).max()
    batch = np.zeros((n,), np.int32)
    x = np.random.default_rng(6).standard_normal((n, 1)).astype(np.float32)

    plan = build_plan(pos, batch, N=N, m=m, batch_size=1)
    plan_b = plan.with_benes_tables(block_log2=9, compact=False)
    assert plan_b.benes.compact is False

    want = tn.nfft_adjoint(jnp.asarray(x), jnp.asarray(pos),
                           jnp.asarray(batch), batch_size=1, bandwidth=N,
                           cutoff=m, plan=plan, strategy="binned")
    got = tn.nfft_adjoint(jnp.asarray(x), jnp.asarray(pos),
                          jnp.asarray(batch), batch_size=1, bandwidth=N,
                          cutoff=m, plan=plan_b, strategy="binned")
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_device_plan_with_compact_benes_matches_sort_path(rng):
    """Device-built plans carry no host ``order``; the compact rank
    permutation is derived from fill_keys + row_count and must reproduce
    the sort path bit-for-bit (both directions)."""
    import torch_nfft_tpu as tn
    from torch_nfft_tpu.ops.binned import build_plan_device

    n, dim, N, m = 600, 2, 16, 3
    pos = (np.random.default_rng(7).random((n, dim)) - 0.5).astype(np.float32)
    pos /= 4 * np.abs(pos).max()
    batch = np.zeros((n,), np.int32)
    x = np.random.default_rng(8).standard_normal((n, 2)).astype(np.float32)

    plan = build_plan_device(jnp.asarray(pos), jnp.asarray(batch), N=N, m=m,
                             batch_size=1)
    assert plan.order is None
    plan_b = plan.with_benes_tables(block_log2=9)
    assert plan_b.benes.compact is True

    want = tn.nfft_adjoint(jnp.asarray(x), jnp.asarray(pos),
                           jnp.asarray(batch), batch_size=1, bandwidth=N,
                           cutoff=m, plan=plan, strategy="binned")
    got = tn.nfft_adjoint(jnp.asarray(x), jnp.asarray(pos),
                          jnp.asarray(batch), batch_size=1, bandwidth=N,
                          cutoff=m, plan=plan_b, strategy="binned")
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    yw = tn.nfft_forward(want, jnp.asarray(pos), jnp.asarray(batch),
                         cutoff=m, plan=plan, strategy="binned")
    yg = tn.nfft_forward(want, jnp.asarray(pos), jnp.asarray(batch),
                         cutoff=m, plan=plan_b, strategy="binned")
    np.testing.assert_array_equal(np.asarray(yg), np.asarray(yw))


def test_host_rank_derivation_matches_device_plan(rng):
    """Host-side rank derivation (host_rank_permutation) reproduces the
    device plan's rank exactly — fingerprints agree — and the resulting
    compact tables match the sort path, including a multi-batch plan."""
    import torch_nfft_tpu as tn
    from torch_nfft_tpu.ops.binned import build_plan_device
    from torch_nfft_tpu.ops.pallas.benes import (
        device_rank_hash,
        host_rank_permutation,
        rank_hash_np,
    )

    n, dim, N, m, B = 900, 3, 16, 2, 3
    r = np.random.default_rng(9)
    pos = (r.random((n, dim)) - 0.5).astype(np.float32)
    pos /= 4 * np.abs(pos).max()
    batch = np.sort(r.integers(0, B, size=n)).astype(np.int32)
    x = r.standard_normal((n, 1)).astype(np.float32)

    plan = build_plan_device(jnp.asarray(pos), jnp.asarray(batch), N=N, m=m,
                             batch_size=B)
    rank = host_rank_permutation(plan, pos, batch)
    assert rank_hash_np(rank) == device_rank_hash(plan)

    plan_b = plan.with_benes_tables(block_log2=9, pos=pos, batch=batch)
    want = tn.nfft_adjoint(jnp.asarray(x), jnp.asarray(pos),
                           jnp.asarray(batch), batch_size=B, bandwidth=N,
                           cutoff=m, plan=plan, strategy="binned")
    got = tn.nfft_adjoint(jnp.asarray(x), jnp.asarray(pos),
                          jnp.asarray(batch), batch_size=B, bandwidth=N,
                          cutoff=m, plan=plan_b, strategy="binned")
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_plan_with_benes_matches_sort_path_multicolumn(rng):
    """Multi-column (C=3) transforms through a benes-upgraded plan run the
    network once per column and must match the sort path bit-for-bit."""
    import torch_nfft_tpu as tn
    from torch_nfft_tpu.ops.binned import build_plan

    n, dim, N, m, C = 500, 2, 16, 3, 3
    pos = (np.random.default_rng(3).random((n, dim)) - 0.5).astype(np.float32)
    pos /= 4 * np.abs(pos).max()
    batch = np.zeros((n,), np.int32)
    x = np.random.default_rng(4).standard_normal((n, C)).astype(np.float32)

    plan = build_plan(pos, batch, N=N, m=m, batch_size=1)
    plan_b = plan.with_benes_tables(block_log2=9)

    want = tn.nfft_adjoint(jnp.asarray(x), jnp.asarray(pos),
                           jnp.asarray(batch), batch_size=1, bandwidth=N,
                           cutoff=m, plan=plan, strategy="binned")
    got = tn.nfft_adjoint(jnp.asarray(x), jnp.asarray(pos),
                          jnp.asarray(batch), batch_size=1, bandwidth=N,
                          cutoff=m, plan=plan_b, strategy="binned")
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    yw = tn.nfft_forward(want, jnp.asarray(pos), jnp.asarray(batch),
                         cutoff=m, plan=plan, strategy="binned")
    yg = tn.nfft_forward(want, jnp.asarray(pos), jnp.asarray(batch),
                         cutoff=m, plan=plan_b, strategy="binned")
    np.testing.assert_array_equal(np.asarray(yg), np.asarray(yw))


def test_grad_through_benes_plan_matches_sort_path(rng):
    """jax.grad w.r.t. values and positions through an adjoint built on a
    benes-upgraded plan must match the sort-path gradients bit-for-bit:
    the VJP engines route through the same _slot/_unslot paths
    (ops/pallas/contract.py), which dispatch on plan.benes."""
    import torch_nfft_tpu as tn
    from torch_nfft_tpu.ops.binned import build_plan

    n, dim, N, m = 520, 2, 16, 3
    pos = (np.random.default_rng(9).random((n, dim)) - 0.5).astype(np.float32)
    pos /= 4 * np.abs(pos).max()
    batch = np.zeros((n,), np.int32)
    x = np.random.default_rng(10).standard_normal((n, 1)).astype(np.float32)

    plan = build_plan(pos, batch, N=N, m=m, batch_size=1)
    plan_b = plan.with_benes_tables(block_log2=9)

    def loss(x, pos, plan):
        y = tn.nfft_adjoint(x, pos, jnp.asarray(batch), batch_size=1,
                            bandwidth=N, cutoff=m, plan=plan,
                            strategy="binned")
        return jnp.sum(jnp.abs(y) ** 2)

    gx_w, gp_w = jax.grad(loss, argnums=(0, 1))(
        jnp.asarray(x), jnp.asarray(pos), plan)
    gx_g, gp_g = jax.grad(loss, argnums=(0, 1))(
        jnp.asarray(x), jnp.asarray(pos), plan_b)
    np.testing.assert_array_equal(np.asarray(gx_g), np.asarray(gx_w))
    np.testing.assert_array_equal(np.asarray(gp_g), np.asarray(gp_w))
