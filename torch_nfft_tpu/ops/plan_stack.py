"""Stacks of binned plans with a common shape — the bridge between the
host-built :class:`~torch_nfft_tpu.ops.binned.BinnedPlan` (one concrete point
set) and traced contexts that select a plan at run time:

* **grid streaming** (ops/streaming.py): a ``lax.fori_loop`` over batch
  members re-uses ONE oversampled grid buffer, indexing the member's plan out
  of the stack each iteration — the TPU answer to the reference allocating
  ``batch * cols * (2N)^dim`` at once (``core_cuda.cu:216``), which exceeds
  one chip's HBM at the driver's batch=16, N=256 configuration;
* **multi-chip** (parallel/sharded.py): each shard of a ``shard_map`` slices
  its own plan from the stack, so the sharded transforms run the fast binned
  engine instead of degrading to XLA scatter on traced positions.

All members are padded to a common row count S and forced to a common slot
capacity K; padded rows have ``row_count == 0`` and contribute exactly
nothing through every engine (their masked tiles are zero).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .binned import BinnedPlan, build_plan, merge_active_runs

__all__ = [
    "pad_plan_rows",
    "stack_plans",
    "index_plan",
    "squeeze_plan",
    "build_plan_stack",
    "split_by_batch",
]


def pad_plan_rows(plan: BinnedPlan, S_target: int) -> BinnedPlan:
    """Pad a plan to ``S_target`` rows with empty (row_count == 0) rows."""
    S = plan.slot_pt.shape[0]
    if S > S_target:
        raise ValueError(f"plan has {S} rows > target {S_target}")
    if S == S_target:
        return plan
    p = S_target - S
    return BinnedPlan(
        slot_pt=jnp.pad(plan.slot_pt, ((0, p), (0, 0))),
        slot_pos=jnp.pad(plan.slot_pos, ((0, 0), (0, p * plan.K))),
        origin=jnp.pad(plan.origin, ((0, p), (0, 0))),
        row_batch=jnp.pad(plan.row_batch, (0, p)),
        # the appended rows are all padding: their slot ids extend the
        # invalid tail of the fill permutation
        fill_keys=jnp.concatenate([
            plan.fill_keys,
            jnp.arange(S * plan.K, S_target * plan.K, dtype=jnp.int32),
        ]),
        row_count=jnp.pad(plan.row_count, (0, p)),
        n=plan.n,
        dim=plan.dim,
        N=plan.N,
        m=plan.m,
        sigma=plan.sigma,
        T=plan.T,
        K=plan.K,
        batch_size=plan.batch_size,
        pos_fp=plan.pos_fp,
        window=plan.window,
        active=plan.active,
        # appended rows are invalid (row_count == 0): the group count among
        # valid rows is unchanged
        S_occ=plan.S_occ,
    )


def stack_plans(plans: list[BinnedPlan]) -> BinnedPlan:
    """Stack same-shaped plans along a new leading axis.

    The result is a regular BinnedPlan pytree whose array leaves carry an
    extra leading member axis; static fields come from the first member
    (``pos_fp`` is dropped — it is per-member). Use :func:`index_plan` to
    select a member under tracing, or shard the leading axis in a shard_map.
    """
    p0 = plans[0]
    for p in plans[1:]:
        if (p.n, p.dim, p.N, p.m, p.sigma, p.T, p.K, p.window) != (
            p0.n, p0.dim, p0.N, p0.m, p0.sigma, p0.T, p0.K, p0.window
        ):
            raise ValueError(
                "all stacked plans must share (n, dim, N, m, sigma, T, K, window)"
            )
        if p.slot_pt.shape != p0.slot_pt.shape:
            raise ValueError("all stacked plans must share S — pad_plan_rows first")
    stack = lambda get: jnp.stack([get(p) for p in plans])
    return BinnedPlan(
        slot_pt=stack(lambda p: p.slot_pt),
        slot_pos=stack(lambda p: p.slot_pos),
        origin=stack(lambda p: p.origin),
        row_batch=stack(lambda p: p.row_batch),
        fill_keys=stack(lambda p: p.fill_keys),
        row_count=stack(lambda p: p.row_count),
        n=p0.n,
        dim=p0.dim,
        N=p0.N,
        m=p0.m,
        sigma=p0.sigma,
        T=p0.T,
        K=p0.K,
        batch_size=p0.batch_size,
        pos_fp=None,
        window=p0.window,
        # one shared slab for every member: the fold shapes must agree
        # across the lax.fori_loop / shard_map that indexes the stack
        active=merge_active_runs(
            [p.active for p in plans], p0.M // p0.T, p0.dim
        ),
        # S_occ differs per member; a traced member index cannot carry a
        # static value, so stacked plans run the per-row engines
        S_occ=None,
    )


def index_plan(stacked: BinnedPlan, i) -> BinnedPlan:
    """Member ``i`` (traced or concrete) of a stacked plan."""
    return jax.tree.map(
        lambda a: jax.lax.dynamic_index_in_dim(a, i, axis=0, keepdims=False), stacked
    )


def squeeze_plan(stacked: BinnedPlan) -> BinnedPlan:
    """Drop a leading length-1 member axis (the per-shard view inside a
    shard_map whose in_spec shards the member axis)."""
    return jax.tree.map(lambda a: jnp.squeeze(a, axis=0), stacked)


def split_by_batch(pos, x, batch, batch_size: int):
    """Host-side split of a batched point set into equal-size members.

    Members are padded to the largest member count with zero rows (zero
    spread weight at the domain origin — exact for spreading; callers slice
    gather outputs back with the returned counts). ``batch`` must be sorted
    ascending (the reference's own data contract, core_cuda.cu:60).

    Returns (pos_stack (B, n_max, dim), x_stack (B, n_max, C) or None,
    counts (B,) np.ndarray, order=None placeholder).
    """
    pos = np.asarray(pos)
    n, dim = pos.shape
    if batch is None:
        batch = np.zeros((n,), np.int32)
    batch = np.asarray(batch)
    if np.any(batch[1:] < batch[:-1]):
        raise ValueError("batch must be sorted ascending")
    bounds = np.searchsorted(batch, np.arange(batch_size + 1))
    counts = np.diff(bounds)
    n_max = int(counts.max())
    pos_stack = np.zeros((batch_size, n_max, dim), pos.dtype)
    x_stack = None
    if x is not None:
        x = np.asarray(x)
        x_stack = np.zeros((batch_size, n_max) + x.shape[1:], x.dtype)
    for b in range(batch_size):
        lo, hi = bounds[b], bounds[b + 1]
        pos_stack[b, : counts[b]] = pos[lo:hi]
        if x is not None:
            x_stack[b, : counts[b]] = x[lo:hi]
    return pos_stack, x_stack, counts, bounds


def build_plan_stack(
    pos_stack,
    *,
    N: int,
    m: int,
    sigma: float = 2.0,
    T: int | None = None,
    K: int | None = None,
    window: str = "gaussian",
) -> BinnedPlan:
    """Build one single-batch plan per member of ``pos_stack`` (B, n, dim)
    and stack them. K is forced to the first member's choice so the stack is
    rectangular; S is padded to the largest member's row count."""
    pos_stack = np.asarray(pos_stack)
    plans = []
    for b in range(pos_stack.shape[0]):
        p = build_plan(
            pos_stack[b], None, N=N, m=m, sigma=sigma, batch_size=1, T=T, K=K,
            window=window,
        )
        if K is None:
            K = p.K
            T = p.T
        plans.append(p)
    S_max = max(p.slot_pt.shape[0] for p in plans)
    return stack_plans([pad_plan_rows(p, S_max) for p in plans])
