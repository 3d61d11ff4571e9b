"""Binned (sort + dense-tile) spread/gather — the TPU-first answer to the
reference's atomicAdd window convolutions.

The reference scatters every (point, window-cell) pair with an atomicAdd
(``spatial_window_operations.cu:103-211``). TPUs have no atomics and XLA's
scatter serializes duplicate indices, so the hot loop is redesigned around
what the hardware is good at — dense contractions:

1. **Plan** (host/NumPy, amortized across transforms on the same points):
   each point's window starts at cell ``s = (floor(M*pos) - m) mod M``; the
   grid is cut into tiles of ``T`` cells per axis and every point is assigned
   to the tile containing ``s``. Points are sorted by (batch, tile) and packed
   into fixed-capacity *rows* of at most ``K`` points over the same tile
   (a tile with more points gets multiple rows).
2. **Execute** (jitted): for every row, per-axis window matrices
   ``A_d[row, k, u] = phi(M*x_d - (origin_d + u))`` over the tile halo
   ``H = T + 2m + 1`` are built directly from the window definition
   (``spatial_window_operations.cu:68-97`` semantics, including the
   [0, 2m+2) truncation), and the row's halo tile is formed by the dense
   separable contraction ``tile[u,v,w] = sum_k x_k A0[k,u] A1[k,v] A2[k,w]``
   — matmuls/VPU work instead of pointwise scatter. One scatter-add of
   whole tiles (rows x H^dim elements, ~W/K times fewer updates than the
   pointwise form) lands them on the oversampled grid. The gather runs the
   same contraction in reverse off dense tile reads.

Everything in execute is jnp, so gradients w.r.t. both the values and the
point positions flow (the plan is integer-only data).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from .window import window_inv_b, window_inv_sqrt_b_pi

__all__ = ["BinnedPlan", "build_plan", "spread_binned", "gather_binned"]


def _next_pow2(v: int) -> int:
    return 1 << max(0, (int(v) - 1).bit_length())


@jax.tree_util.register_pytree_node_class
@dataclass
class BinnedPlan:
    """Sorted point-to-tile assignment for one (pos, batch) point set."""

    # arrays
    slot_pt: jax.Array  # (S, K) int32 — original point index per slot
    slot_valid: jax.Array  # (S, K) float32 — 1 for a real point, 0 for padding
    origin: jax.Array  # (S, dim) int32 — tile origin cell per row
    row_batch: jax.Array  # (S,) int32
    inv_slot: jax.Array  # (n,) int32 — flat slot id per point
    # static
    n: int
    dim: int
    N: int
    m: int
    sigma: float
    T: int
    K: int

    @property
    def M(self) -> int:
        return int(round(self.sigma * self.N))

    @property
    def H(self) -> int:
        return self.T + 2 * self.m + 1

    def tree_flatten(self):
        children = (
            self.slot_pt,
            self.slot_valid,
            self.origin,
            self.row_batch,
            self.inv_slot,
        )
        aux = (self.n, self.dim, self.N, self.m, self.sigma, self.T, self.K)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


def default_tile(dim: int, m: int, M: int) -> int:
    """Tile edge T: big enough to keep rows/points ratio sane, small enough
    that the halo overhead H^dim / (2m+2)^dim stays moderate."""
    base = {1: 256, 2: 32, 3: 16}.get(dim, 16)
    T = max(base, _next_pow2(2 * m + 1))  # halo fold needs T >= 2m+1
    return min(T, M)


def build_plan(
    pos,
    batch=None,
    *,
    N: int,
    m: int,
    sigma: float = 2.0,
    batch_size: int | None = None,
    T: int | None = None,
    K: int | None = None,
) -> BinnedPlan:
    """Host-side plan construction (NumPy; requires concrete pos/batch).

    The plan depends only on point->cell geometry, so it is reusable across
    every transform on the same point set (both spread and gather, forward
    and backward, every fastsum matvec).
    """
    pos = np.asarray(pos)
    n, dim = pos.shape
    if batch is None:
        batch = np.zeros((n,), np.int32)
        batch_size = 1 if batch_size is None else batch_size
    batch = np.asarray(batch, dtype=np.int64)
    if batch_size is None:
        batch_size = int(batch[-1]) + 1
    M = int(round(sigma * N))
    if T is None:
        T = default_tile(dim, m, M)
    T = min(T, M)
    nb = -(-M // T)  # tiles per axis

    # The native (C++) counting-sort builder constructs the tables in
    # O(n + bins) without a comparison sort; NumPy below is the fallback.
    from ..native import plan_tables

    def _pick_K(counts):
        occ = counts[counts > 0]
        mean_occ = float(occ.mean()) if occ.size else 1.0
        return min(512, max(8, _next_pow2(math.ceil(mean_occ))))

    native = plan_tables(
        pos,
        batch.astype(np.int32),
        M,
        m,
        T,
        nb,
        None if K is None else int(K),
        batch_size,
        pick_K=_pick_K,
    )
    if native is not None:
        (slot_pt, slot_valid, origin, row_batch, inv_slot), K_used = native
        return BinnedPlan(
            slot_pt=jnp.asarray(slot_pt),
            slot_valid=jnp.asarray(slot_valid),
            origin=jnp.asarray(origin),
            row_batch=jnp.asarray(row_batch),
            inv_slot=jnp.asarray(inv_slot),
            n=n,
            dim=dim,
            N=N,
            m=m,
            sigma=float(sigma),
            T=int(T),
            K=int(K_used),
        )

    # window start cell, wrapped; tile index and tile id per point
    s_mod = (np.floor(pos * M).astype(np.int64) - m) % M  # (n, dim)
    b = s_mod // T  # (n, dim)
    bin_id = batch
    for d in range(dim):
        bin_id = bin_id * nb + b[:, d]

    order = np.argsort(bin_id, kind="stable")
    sorted_bin = bin_id[order]
    uniq, start_idx, counts = np.unique(
        sorted_bin, return_index=True, return_counts=True
    )

    if K is None:
        # Row capacity: near the mean occupancy, clamped to a MXU-friendly
        # range. Rows per tile = ceil(count/K).
        mean_occ = n / max(1, len(uniq))
        K = int(min(512, max(8, _next_pow2(math.ceil(mean_occ)))))

    rows_per_bin = -(-counts // K)
    S = int(rows_per_bin.sum())

    row_bin = np.repeat(np.arange(len(uniq)), rows_per_bin)
    # index of each row within its bin
    row_rank = np.arange(S) - np.repeat(
        np.concatenate([[0], np.cumsum(rows_per_bin)[:-1]]), rows_per_bin
    )
    row_start = start_idx[row_bin] + row_rank * K  # into `order`
    row_count = np.minimum(counts[row_bin] - row_rank * K, K)

    k_ar = np.arange(K)[None, :]
    gidx = np.minimum(row_start[:, None] + k_ar, n - 1)
    slot_pt = order[gidx].astype(np.int32)  # (S, K)
    slot_valid = (k_ar < row_count[:, None]).astype(np.float32)

    # tile origin + batch per row, decoded from the bin id
    bid = uniq[row_bin]
    origin = np.empty((S, dim), np.int32)
    for d in range(dim - 1, -1, -1):
        origin[:, d] = (bid % nb) * T
        bid = bid // nb
    row_batch = bid.astype(np.int32)

    # flat slot id per point (each point sits in exactly one valid slot)
    inv_slot = np.empty((n,), np.int64)
    flat_slots = (np.arange(S)[:, None] * K + k_ar).reshape(-1)
    valid_flat = slot_valid.reshape(-1) > 0
    inv_slot[slot_pt.reshape(-1)[valid_flat]] = flat_slots[valid_flat]

    return BinnedPlan(
        slot_pt=jnp.asarray(slot_pt),
        slot_valid=jnp.asarray(slot_valid),
        origin=jnp.asarray(origin),
        row_batch=jnp.asarray(row_batch),
        inv_slot=jnp.asarray(inv_slot.astype(np.int32)),
        n=n,
        dim=dim,
        N=N,
        m=m,
        sigma=float(sigma),
        T=int(T),
        K=int(K),
    )


def _row_windows(plan: BinnedPlan, pos_s, origin):
    """Per-axis window matrices A_d: (R, K, H) for a chunk of rows.

    A_d[r, k, u] = phi(M*x - (origin + u)) if (origin + u) is one of the
    point's 2m+2 window cells, else 0. Uses the unwrapped identity
    t = frac + m - (u - o) with o = (s_mod - origin), frac = M*x - floor(M*x),
    so the periodic wrap never enters the window argument
    (spatial_window_operations.cu:68-97).
    """
    m, M, H = plan.m, plan.M, plan.H
    L = 2 * plan.m + 2
    inv_b = window_inv_b(m, plan.sigma)
    amp = window_inv_sqrt_b_pi(m, plan.sigma)

    scaled = pos_s * M  # (R, K, dim)
    floor_s = jax.lax.stop_gradient(jnp.floor(scaled))
    frac = scaled - floor_s
    s_mod = (floor_s.astype(jnp.int32) - m) % M
    o = (s_mod - origin[:, None, :]) % M  # (R, K, dim), in [0, T)

    u = jnp.arange(H, dtype=jnp.int32)
    rel = u[None, None, None, :] - o[..., None]  # (R, K, dim, H) = u - o
    t = frac[..., None] + (m - rel).astype(frac.dtype)
    vals = jnp.exp(-(t * t) * inv_b) * amp
    mask = (rel >= 0) & (rel < L)
    A = jnp.where(mask, vals, jnp.zeros_like(vals))
    return A  # (R, K, dim, H)


def _tile_flat_indices(plan: BinnedPlan, origin, row_batch):
    """Flat grid indices of each row's halo tile: (R, H^dim) int32."""
    M, H, dim = plan.M, plan.H, plan.dim
    R = origin.shape[0]
    u = jnp.arange(H, dtype=jnp.int32)
    idx = jnp.zeros((R,) + (1,) * dim, jnp.int32)
    for d in range(dim):
        cell = (origin[:, d][:, None] + u[None, :]) % M  # (R, H)
        shape = (R,) + tuple(H if e == d else 1 for e in range(dim))
        idx = idx * M + cell.reshape(shape)  # broadcasts into (R, H, ..., H)
    idx = idx.reshape(R, H**dim)
    return row_batch[:, None] * (M**dim) + idx


def _pick_row_chunk(S: int, K: int, H: int, dim: int, C: int, itemsize: int) -> int:
    """Rows per chunk keeping the largest intermediate under ~256 MB."""
    inner = max(K * (H ** max(1, dim - 1)) * C, H**dim * C)
    budget = 1 << 28
    chunk = max(1, budget // max(1, inner * itemsize))
    return int(min(S, chunk))


@partial(jax.jit, static_argnames=("batch_size",))
def spread_binned(plan: BinnedPlan, x, pos, *, batch_size: int):
    """Spread x (n, C) onto the flat oversampled grid (batch_size*M^dim, C).

    Exact same math as the scatter strategy (ops/spread_gather.py) — only the
    execution schedule differs.
    """
    dim, H, K = plan.dim, plan.H, plan.K
    M = plan.M
    C = x.shape[1]
    S = plan.slot_pt.shape[0]
    R = _pick_row_chunk(S, K, H, dim, C, jnp.dtype(x.dtype).itemsize)
    n_chunks = -(-S // R)
    S_pad = n_chunks * R

    slot_pt = jnp.pad(plan.slot_pt, ((0, S_pad - S), (0, 0)))
    slot_valid = jnp.pad(plan.slot_valid, ((0, S_pad - S), (0, 0)))
    origin = jnp.pad(plan.origin, ((0, S_pad - S), (0, 0)))
    row_batch = jnp.pad(plan.row_batch, (0, S_pad - S))

    g = jnp.zeros((batch_size * M**dim, C), dtype=x.dtype)

    def body(i, g_acc):
        sl = i * R
        pt = jax.lax.dynamic_slice_in_dim(slot_pt, sl, R, 0)
        vmask = jax.lax.dynamic_slice_in_dim(slot_valid, sl, R, 0)
        org = jax.lax.dynamic_slice_in_dim(origin, sl, R, 0)
        rb = jax.lax.dynamic_slice_in_dim(row_batch, sl, R, 0)

        xs = jnp.take(x, pt, axis=0) * vmask[..., None].astype(x.dtype)  # (R,K,C)
        pos_s = jnp.take(pos, pt, axis=0)  # (R,K,dim)
        A = _row_windows(plan, pos_s, org).astype(x.real.dtype)  # (R,K,dim,H)

        if dim == 1:
            tiles = jnp.einsum("rku,rkc->ruc", A[:, :, 0], xs)
        elif dim == 2:
            t1 = jnp.einsum("rkv,rkc->rkvc", A[:, :, 1], xs)
            tiles = jnp.einsum("rku,rkvc->ruvc", A[:, :, 0], t1)
        else:
            t1 = jnp.einsum("rkw,rkc->rkwc", A[:, :, 2], xs)
            t2 = jnp.einsum("rkv,rkwc->rkvwc", A[:, :, 1], t1)
            tiles = jnp.einsum("rku,rkvwc->ruvwc", A[:, :, 0], t2)

        flat = _tile_flat_indices(plan, org, rb)  # (R, H^dim)
        return g_acc.at[flat.reshape(-1)].add(
            tiles.reshape(-1, C), mode="drop", unique_indices=False
        )

    return jax.lax.fori_loop(0, n_chunks, body, g)


@jax.jit
def gather_binned(plan: BinnedPlan, g_flat, pos):
    """Gather from the flat grid back to the points: (n, C). Transpose of
    :func:`spread_binned` (same tiles, contraction reversed)."""
    dim, H, K = plan.dim, plan.H, plan.K
    C = g_flat.shape[1]
    S = plan.slot_pt.shape[0]
    R = _pick_row_chunk(S, K, H, dim, C, jnp.dtype(g_flat.dtype).itemsize)
    n_chunks = -(-S // R)
    S_pad = n_chunks * R

    slot_pt = jnp.pad(plan.slot_pt, ((0, S_pad - S), (0, 0)))
    slot_valid = jnp.pad(plan.slot_valid, ((0, S_pad - S), (0, 0)))
    origin = jnp.pad(plan.origin, ((0, S_pad - S), (0, 0)))
    row_batch = jnp.pad(plan.row_batch, (0, S_pad - S))

    out = jnp.zeros((S_pad * K, C), dtype=g_flat.dtype)

    def body(i, out_acc):
        sl = i * R
        pt = jax.lax.dynamic_slice_in_dim(slot_pt, sl, R, 0)
        vmask = jax.lax.dynamic_slice_in_dim(slot_valid, sl, R, 0)
        org = jax.lax.dynamic_slice_in_dim(origin, sl, R, 0)
        rb = jax.lax.dynamic_slice_in_dim(row_batch, sl, R, 0)

        pos_s = jnp.take(pos, pt, axis=0)
        A = _row_windows(plan, pos_s, org).astype(g_flat.real.dtype)

        flat = _tile_flat_indices(plan, org, rb)
        tiles = jnp.take(g_flat, flat.reshape(-1), axis=0).reshape(
            (R,) + (H,) * dim + (C,)
        )

        if dim == 1:
            y = jnp.einsum("rku,ruc->rkc", A[:, :, 0], tiles)
        elif dim == 2:
            t1 = jnp.einsum("rku,ruvc->rkvc", A[:, :, 0], tiles)
            y = jnp.einsum("rkv,rkvc->rkc", A[:, :, 1], t1)
        else:
            t1 = jnp.einsum("rku,ruvwc->rkvwc", A[:, :, 0], tiles)
            t2 = jnp.einsum("rkv,rkvwc->rkwc", A[:, :, 1], t1)
            y = jnp.einsum("rkw,rkwc->rkc", A[:, :, 2], t2)

        y = y * vmask[..., None].astype(y.dtype)
        return jax.lax.dynamic_update_slice_in_dim(
            out_acc, y.reshape(R * K, C), sl * K, 0
        )

    out = jax.lax.fori_loop(0, n_chunks, body, out)
    return jnp.take(out, plan.inv_slot, axis=0)
