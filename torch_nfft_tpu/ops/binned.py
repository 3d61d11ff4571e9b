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
   — matmuls/VPU work instead of pointwise scatter (fused Pallas kernels on
   TPU, chunked einsums otherwise). Tiles then accumulate into the *dense*
   tile array with ONE scalar index per row and overlap-add onto the grid
   with reshapes and rolls only (ops/tilefold.py) — zero windowed scatters;
   a windowed lax.scatter_add/lax.gather fallback remains for geometries the
   fold cannot cover (M % T != 0 or over the memory budget). The gather runs
   the same contraction in reverse off dense tile reads.

The ``*_dft`` entry points additionally keep the grid in the DFT layout
``(B, M_1, ..., C, M_0)`` — produced natively by the layout-careful 3D fold
and consumed directly by the pruned spectral matmuls (ops/fft.py) — and can
restrict all grid-side work to the plan's active slab (``compact=True``).

Everything in execute is jnp, so gradients w.r.t. both the values and the
point positions flow (the plan is integer-only data).
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass, replace
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from .tilefold import (
    active_axes,
    fold_tiles_to_grid,
    fold_tiles_to_grid_dft,
    row_tile_ids,
    unfold_grid_to_tiles,
    unfold_grid_to_tiles_dft,
    use_fold,
)
from .window import _check_window, window_value_fn

__all__ = [
    "BinnedPlan",
    "build_plan",
    "build_plan_device",
    "spread_binned",
    "gather_binned",
    "spread_binned_dft",
    "gather_binned_dft",
    "position_fingerprint",
]

# High-precision contractions: TPU default (single bf16 pass) costs ~4e-3
# relative error, far above the NFFT window error budget. HIGH (3-pass bf16)
# restores ~f32 accuracy at half the cost of HIGHEST.
_P = jax.lax.Precision.HIGH


def _es(spec, *ops):
    return jnp.einsum(spec, *ops, precision=_P)


def _next_pow2(v: int) -> int:
    return 1 << max(0, (int(v) - 1).bit_length())


@jax.tree_util.register_pytree_node_class
@dataclass
class BinnedPlan:
    """Sorted point-to-tile assignment for one (pos, batch) point set."""

    # arrays
    slot_pt: jax.Array  # (S, K) int32 — original point index per slot
    slot_pos: jax.Array  # (dim, S*K) f32 — slot-ordered coordinates, feature-
    # major (precomputed so the hot path never gathers positions per call)
    origin: jax.Array  # (S, dim) int32 — tile origin cell per row
    row_batch: jax.Array  # (S,) int32
    fill_keys: jax.Array  # (S*K,) int32 — a permutation of [0, S*K): the
    # destination slot of each element of [x in user order (n), padding
    # zeros (S*K - n)]. fill_keys[:n] is the point->slot inverse map (the
    # ``inv_slot`` property); the tail lists the invalid (padding) slots.
    # Stored in this fused form because the hot permutations execute as
    # lax.sort_key_val by destination (ops/pallas/contract._slot_values),
    # ~1.6x faster than a unique-index scatter at 16M points on TPU.
    row_count: jax.Array  # (S,) int32 — points actually filling each row
    # static
    n: int
    dim: int
    N: int
    m: int
    sigma: float
    T: int
    K: int
    # identity of the point set the plan was built on (used by the loud
    # plan-mismatch checks in ops/nfft.py): the batch count and the host-side
    # bin-id fingerprint from position_fingerprint()
    batch_size: int | None = None
    pos_fp: int | None = None
    # spreading window family: "gaussian" (reference parity) or "es"
    # (exp-sqrt — better accuracy per support width; ops/window.py)
    window: str = "gaussian"
    # per-axis active tile run ((start_tile, num_tiles) per dim) covering all
    # occupied tiles plus their +1 halo neighbours; None = full axis. The
    # reference's GaussianKernel maps every point set into the [-1/4, 1/4]
    # safe box (kernel.py:76), so typically only ~(1/2)^dim of the oversampled
    # grid is ever touched — the DFT-layout fold pipeline runs on this
    # compact cyclic slab and the pruned DFT matrices absorb the offset.
    active: tuple | None = None
    # host-side sorted layout (NumPy; not shipped to the device; dropped by
    # pytree round-trips): point ids in (batch, tile) order and each row's
    # contiguous run of `order`
    order: object = None  # (n,) int32 np.ndarray
    row_start: object = None  # (S,) int32 np.ndarray
    # optional routed Benes masks for the slot permutation (built once via
    # with_benes_tables(); transforms then apply the user<->slot
    # permutations in 2*log2(n)-1 masked exchange stages — one network pass
    # per trailing column — ~3x faster than the lax.sort path per column;
    # see ops/pallas/benes.py)
    benes: object = None  # BenesTables | None (pytree child)
    # number of occupied (batch, tile) groups among the valid rows — static,
    # set by the builders. The row-batched Pallas spread sizes its exact
    # overflow scatter from S - S_occ (rows beyond the first of each tile);
    # None (legacy/stacked plans) disables the row-batched path.
    S_occ: int | None = None

    @property
    def M(self) -> int:
        return int(round(self.sigma * self.N))

    @property
    def H(self) -> int:
        return self.T + 2 * self.m + 1

    @property
    def slot_valid(self) -> jax.Array:
        """(S, K) float32 validity mask, derived from row_count."""
        k = jnp.arange(self.K, dtype=jnp.int32)[None, :]
        return (k < self.row_count[:, None]).astype(jnp.float32)

    @property
    def inv_slot(self) -> jax.Array:
        """(n,) int32 — flat slot id per point (the head of fill_keys)."""
        return self.fill_keys[..., : self.n]

    def tree_flatten(self):
        children = (
            self.slot_pt,
            self.slot_pos,
            self.origin,
            self.row_batch,
            self.fill_keys,
            self.row_count,
            self.benes,
        )
        aux = (
            self.n, self.dim, self.N, self.m, self.sigma, self.T, self.K,
            self.batch_size, self.pos_fp, self.window, self.active,
            self.S_occ,
        )
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children[:6], *aux[:11], benes=children[6],
                   S_occ=aux[11] if len(aux) > 11 else None)

    def with_benes_tables(self, block_log2: int = 18, compact: bool = True,
                          pos=None, batch=None) -> "BinnedPlan":
        """A copy of this plan carrying routed Benes permutation masks
        (ops/pallas/benes.py). One-time host routing + bit upload;
        transforms then run the user<->slot permutations (one network pass
        per trailing column) ~3x faster than the sort path. ``compact``
        (default) routes the n-point rank space and streams it to/from the
        padded slot layout with the ragged kernels (ops/pallas/ragged.py)
        — roughly half the network work of the padded slot space.

        For DEVICE-built plans pass the host ``pos`` (and ``batch``) NumPy
        arrays: the rank permutation is then derived on the host
        (fingerprint-verified against the plan) instead of pulling an O(n)
        table over a possibly slow host link."""
        from .pallas.benes import plan_benes_tables

        return replace(self, benes=plan_benes_tables(
            self, block_log2=block_log2, compact=compact, pos=pos,
            batch=batch))


def _count_row_groups(origin_np, row_batch_np, row_count_np) -> int:
    """Number of occupied (batch, tile) groups among the valid rows — the
    static S_occ the row-batched spread sizes its overflow scatter from.
    Rows are grouped by (batch, tile) (plan order), so a group starts
    wherever the key differs from the previous row's."""
    valid = np.asarray(row_count_np) > 0
    key = np.concatenate(
        [np.asarray(row_batch_np)[:, None], np.asarray(origin_np)], axis=1
    )
    if key.shape[0] == 0:
        return 0
    d = np.any(key[1:] != key[:-1], axis=1)
    first = np.concatenate([[True], d]) & valid
    return int(first.sum())


def position_fingerprint(pos, M: int, m: int) -> int:
    """Cheap exact fingerprint of the binning geometry: the sum of all
    window-start bin ids. Two point sets that bin identically execute
    identically under a plan, so this is exactly the invariant to check."""
    pos = np.asarray(pos, dtype=np.float32)
    s_mod = (np.floor(pos * M).astype(np.int64) - m) % M
    return int(s_mod.sum())


def _min_cyclic_run(cover, nb: int):
    """(start, count) of the minimal cyclic run covering the tile set."""
    if cover.size >= nb:
        return (0, nb)
    s = np.sort(cover)
    gaps = np.diff(np.concatenate([s, s[:1] + nb]))
    i = int(np.argmax(gaps))
    start = int(s[(i + 1) % s.size])
    count = nb - int(gaps[i]) + 1
    return (start, count)


def _active_runs(origin_np, T: int, M: int, dim: int) -> tuple | None:
    """Per-axis minimal cyclic tile run covering every occupied tile and its
    +1 neighbour (the halo spill target). Returns ((start, count), ...) or
    None when every axis is (nearly) full.

    The run's last tile is always a pure halo tile (an occupied tile's +1
    that is itself unoccupied), so the fold's circular roll inside the
    compact slab only ever wraps zeros — compaction is exact.
    """
    nb = M // T
    runs = []
    any_partial = False
    for d in range(dim):
        occ = np.unique(np.asarray(origin_np)[:, d] // T)
        if occ.size == 0:
            return None
        cover = np.unique(np.concatenate([occ, (occ + 1) % nb]))
        run = _min_cyclic_run(cover, nb)
        runs.append(run)
        if run[1] < nb:
            any_partial = True
    return tuple(runs) if any_partial else None


def merge_active_runs(actives, nb: int, dim: int) -> tuple | None:
    """Union of per-plan active runs (for stacked plans whose members must
    share one slab). Any member with a full/unknown axis makes that axis
    full; the result is minimal over the union of member tile sets."""
    runs = []
    any_partial = False
    for d in range(dim):
        tiles = []
        full = False
        for a in actives:
            if a is None or a[d][1] >= nb:
                full = True
                break
            s, c = a[d]
            tiles.append((s + np.arange(c)) % nb)
        if full:
            runs.append((0, nb))
            continue
        run = _min_cyclic_run(np.unique(np.concatenate(tiles)), nb)
        runs.append(run)
        if run[1] < nb:
            any_partial = True
    return tuple(runs) if any_partial else None


def default_tile(dim: int, m: int, M: int) -> int:
    """Tile edge T: big enough to keep rows/points ratio sane, small enough
    that the halo overhead H^dim / (2m+2)^dim stays moderate. 1D uses 64:
    the window work per row scales with H = T + 2m + 1, and 1D rows are
    plentiful at any T (one axis of bins), so a small halo wins.

    T should DIVIDE M: fractional oversampling rates make M a
    non-power-of-two (sigma=1.625, N=128 -> M=208 = 16*13), and a
    non-dividing T leaves a ragged last tile whose wrap handling
    measurably hurts (2D N=128 es sigma=1.625 A/B: T=32 measures 97.5,
    T=16 160.9 M pts/s). When the preferred T does not divide, drop to
    the largest power-of-two divisor that still satisfies the halo-fold
    minimum T >= 2m+1; if none exists (odd M), keep the preferred T —
    ceil-tiling stays correct, just slower."""
    base = {1: 64, 2: 32, 3: 16}.get(dim, 16)
    tmin = _next_pow2(2 * m + 1)  # halo fold needs T >= 2m+1
    T = min(max(base, tmin), M)
    if M % T:
        t = T
        while t > tmin and M % t:
            t //= 2
        if t >= tmin and M % t == 0:
            T = t
    return T


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
    window: str = "gaussian",
) -> BinnedPlan:
    """Host-side plan construction (NumPy; requires concrete pos/batch).

    The plan depends only on point->cell geometry, so it is reusable across
    every transform on the same point set (both spread and gather, forward
    and backward, every fastsum matvec).
    """
    _check_window(window)
    # bin in float32 regardless of input dtype: the device window math runs
    # in f32 and a different floor() near cell boundaries would assign a
    # point to a tile whose halo misses its last window cell
    pos = np.asarray(pos, dtype=np.float32)
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
        if dim == 3 and M % 32 == 0 and M > 32:
            # Density probe: at low occupancy the engines are row-bound, so
            # fewer/fuller T=32 tiles beat T=16's smaller halos (the halo
            # volume ratio (H/T)^3 also drops, 3.8x -> 2.1x at m=4).
            s16 = (((np.floor(pos * M).astype(np.int64) - m) % M) // 16)
            ids = batch
            for d in range(dim):
                ids = ids * (M // 16) + s16[:, d]
            occ16 = n / max(1, np.unique(ids).size)
            if occ16 < 64:
                T = 32
            elif (occ16 >= 1024 and K is None and 2 * m + 1 <= 8
                  and M % 8 == 0):
                # DENSE sets: T=8 wins (same probe as build_plan_device;
                # accept only inside the SMEM-prefetch row budget)
                s8 = (((np.floor(pos * M).astype(np.int64) - m) % M) // 8)
                ids8 = batch
                for d in range(dim):
                    ids8 = ids8 * (M // 8) + s8[:, d]
                cnt8 = np.unique(ids8, return_counts=True)[1]
                K8 = _choose_K(cnt8.astype(np.int64), n)
                if int(np.sum(-(-cnt8 // K8))) <= 56000:
                    T = 8
    T = min(T, M)
    nb = -(-M // T)  # tiles per axis

    # The native (C++) counting-sort builder constructs the tables in
    # O(n + bins) without a comparison sort; NumPy below is the fallback.
    from ..native import plan_tables

    def _pick_K(counts):
        # Large K keeps the windowed-tile count (and its per-window cost)
        # independent of n; the einsum chunker bounds the memory.
        # cap at the Pallas lane-chunk size: a K=2048 row runs two kernel
        # chunks with worse VMEM pipelining than two K=1024 rows; halve
        # when padding-slot savings pay for it (_choose_K).
        return _choose_K(counts[counts > 0].astype(np.int64), n)

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
        (slot_pt, slot_valid, origin, row_batch, inv_slot, order, row_start,
         row_count), K_used = native
        # slot_pos gathered on device: one-time ~0.3s instead of shipping
        # an extra dim*S*K*4B array through a (possibly slow) host link
        slot_pt_dev = jnp.asarray(slot_pt)
        slot_pos = jnp.take(jnp.asarray(pos), slot_pt_dev.reshape(-1), axis=0).T
        flat_ids = np.arange(slot_pt.size, dtype=np.int32)
        fill_keys = np.concatenate(
            [inv_slot, flat_ids[slot_valid.reshape(-1) <= 0]]
        )
        return BinnedPlan(
            slot_pt=slot_pt_dev,
            slot_pos=slot_pos,
            origin=jnp.asarray(origin),
            row_batch=jnp.asarray(row_batch),
            fill_keys=jnp.asarray(fill_keys),
            row_count=jnp.asarray(row_count),
            order=order,
            row_start=row_start,
            n=n,
            dim=dim,
            N=N,
            m=m,
            sigma=float(sigma),
            window=str(window),
            T=int(T),
            K=int(K_used),
            batch_size=int(batch_size),
            pos_fp=position_fingerprint(pos, M, m),
            active=_active_runs(origin, T, M, dim) if M % T == 0 else None,
            S_occ=_count_row_groups(origin, row_batch, row_count),
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
        # range (padding-aware: _choose_K). Rows per tile = ceil(count/K).
        K = _choose_K(counts.astype(np.int64), n)

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
    fill_keys = np.concatenate(
        [inv_slot.astype(np.int32), flat_slots[~valid_flat].astype(np.int32)]
    )

    slot_pt_dev = jnp.asarray(slot_pt)
    slot_pos = jnp.take(jnp.asarray(pos), slot_pt_dev.reshape(-1), axis=0).T
    return BinnedPlan(
        slot_pt=slot_pt_dev,
        slot_pos=slot_pos,
        origin=jnp.asarray(origin),
        row_batch=jnp.asarray(row_batch),
        fill_keys=jnp.asarray(fill_keys),
        row_count=jnp.asarray(row_count.astype(np.int32)),
        order=order.astype(np.int32),
        row_start=row_start.astype(np.int32),
        n=n,
        dim=dim,
        N=N,
        m=m,
        sigma=float(sigma),
        window=str(window),
        T=int(T),
        K=int(K),
        batch_size=int(batch_size),
        pos_fp=position_fingerprint(pos, M, m),
        active=_active_runs(origin, T, M, dim) if M % T == 0 else None,
        S_occ=len(uniq),
    )


# ---------------------------------------------------------------------------
# Device-side plan construction: every O(n) step (bin ids, argsort, slot
# gathers, permutation inverse) runs on the device; the host round-trips only
# the per-bin histogram (~batch_size*nb^dim int32) and lays out the O(S) row
# tables. On tunnel-attached TPUs this avoids shipping the ~8B/point slot
# tables over the host link (tens of seconds at 16M points).
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("M", "m", "t", "nb", "nbins", "dim"))
def _sorted_bins_device(pos, batch, *, M, m, t, nb, nbins, dim):
    """(order, counts): stable argsort of the per-point bin ids and the dense
    per-bin histogram (via two searchsorted sweeps on the sorted keys)."""
    s_mod = (jnp.floor(pos * M).astype(jnp.int32) - m) % M
    b = s_mod // t
    bid = batch.astype(jnp.int32)
    for d in range(dim):
        bid = bid * nb + b[:, d]
    order = jnp.argsort(bid, stable=True).astype(jnp.int32)
    sorted_bid = jnp.take(bid, order)
    edges = jnp.searchsorted(
        sorted_bid, jnp.arange(nbins + 1, dtype=jnp.int32), side="left"
    )
    return order, jnp.diff(edges).astype(jnp.int32)


@partial(jax.jit, static_argnames=("K", "n"))
def _assemble_plan_device(order, row_start, row_count, pos, *, K, n):
    """Device slot tables from the sorted order and host row layout:
    slot_pt (S, K), slot_pos (dim, S*K), fill_keys (S*K,)."""
    S = row_start.shape[0]
    k_ar = jnp.arange(K, dtype=jnp.int32)[None, :]
    gidx = jnp.minimum(row_start[:, None] + k_ar, n - 1)
    slot_pt = jnp.take(order, gidx.reshape(-1)).reshape(S, K)
    slot_pos = jnp.take(pos, slot_pt.reshape(-1), axis=0).T
    # rows partition the sorted order contiguously (row_start ascending), so
    # sorted position j belongs to row searchsorted(row_start, j, right) - 1
    j = jnp.arange(n, dtype=jnp.int32)
    row_of_j = (
        jnp.searchsorted(row_start, j, side="right").astype(jnp.int32) - 1
    )
    slot_flat = row_of_j * K + (j - jnp.take(row_start, row_of_j))
    inv_slot = (
        jnp.zeros((n,), jnp.int32).at[order].set(slot_flat, unique_indices=True)
    )
    # every point fills exactly one valid slot, so the invalid count is
    # statically S*K - n; appending those ids makes fill_keys a permutation
    invalid_ids = jnp.nonzero(
        (k_ar >= row_count[:, None]).reshape(-1), size=S * K - n
    )[0].astype(jnp.int32)
    fill_keys = jnp.concatenate([inv_slot, invalid_ids])
    return slot_pt, slot_pos, fill_keys


def _pick_K_cap(mean_occ: float) -> int:
    """Row capacity from mean bin occupancy, capped at the Pallas lane chunk
    (see build_plan's _pick_K)."""
    return int(min(1024, max(8, _next_pow2(math.ceil(mean_occ)))))


# Pallas kernels prefetch ~5 (S,) int32 row tables into SMEM; beyond ~36k
# rows the scoped SMEM allocation fails (measured: S=35k compiles, S=68k
# does not on v5e).
_MAX_ROWS_SMEM = 36000


def _choose_K(cnt, n: int) -> int:
    """Row capacity from the occupied-bin histogram ``cnt``.

    Starts from the mean-occupancy power of two (capped at the lane chunk),
    then considers halving to 512: ragged 3D tiles leave ~13% padding slots
    at K=1024, and since the user<->slot permutations run as sorts over
    S*K elements, padding is pure sort cost — measured 0.267 -> 0.253 s on
    the 3D headline pair. Halve only when it saves >=3% of n in padding and
    the row count stays inside the SMEM prefetch budget."""
    mean_occ = float(cnt.mean()) if cnt.size else 1.0
    K = _pick_K_cap(mean_occ)
    if K == 1024:
        s512 = int(np.sum(-(-cnt // 512)))
        pad512 = s512 * 512 - n
        pad1024 = int(np.sum(-(-cnt // 1024))) * 1024 - n
        if pad1024 - pad512 >= 0.03 * n and s512 <= _MAX_ROWS_SMEM:
            return 512
    return K


def build_plan_device(
    pos,
    batch=None,
    *,
    N: int,
    m: int,
    sigma: float = 2.0,
    batch_size: int | None = None,
    T: int | None = None,
    K: int | None = None,
    window: str = "gaussian",
) -> BinnedPlan:
    """:func:`build_plan` with all O(n) work on the DEVICE.

    Produces a functionally identical plan (up to within-bin point order,
    which every transform is invariant to). Device plans carry
    ``pos_fp=None`` (the fingerprint is a host-side integrity feature) and no
    host ``order``/``row_start`` copies. Prefer this builder when the
    positions already live on the device or the host link is slow; the host
    builder remains the right choice for NumPy positions on well-attached
    hosts (its native counting sort is O(n) vs the device's O(n log n)).
    """
    _check_window(window)
    pos = jnp.asarray(pos)
    if pos.dtype != jnp.float32:
        pos = pos.astype(jnp.float32)  # device binning must match execution
    n, dim = pos.shape
    if batch is None:
        batch_dev = jnp.zeros((n,), jnp.int32)
        batch_size = 1 if batch_size is None else int(batch_size)
    else:
        batch_dev = jnp.asarray(batch, jnp.int32)
        if batch_size is None:
            batch_size = int(batch_dev[-1]) + 1  # one scalar device read
    M = int(round(sigma * N))

    def histogram(t):
        nb = -(-M // t)
        nbins = batch_size * nb**dim
        if nbins >= 1 << 31:
            raise ValueError(
                f"bin-id space {nbins} overflows int32 — use build_plan"
            )
        order, counts = _sorted_bins_device(
            pos, batch_dev, M=M, m=m, t=t, nb=nb, nbins=nbins, dim=dim
        )
        return order, counts, nb

    if T is None:
        T = default_tile(dim, m, M)
        if T == 16 and dim == 3 and M % 32 == 0 and M > 32:
            # same density probe as build_plan, from the T=16 histogram
            order, counts, nb = histogram(16)
            counts_np = np.asarray(counts)
            occupied = int((counts_np > 0).sum())
            occ16 = n / max(1, occupied)
            if occ16 < 64:
                T = 32
            elif occ16 >= 1024 and K is None and 2 * m + 1 <= 8 and M % 8 == 0:
                # DENSE point sets: halving the tile edge cuts the window
                # halo volume (H = T+2m+1)^3 ~2.8x at m=2 and the folded
                # tile array ~3x (headline A/B: 0.171 -> 0.158 s/pair).
                # Rows grow with the bin count, so only consider it when
                # every T=16 bin is row-bound anyway (>= 2 K=512 rows) and
                # accept only if the exact T=8 row count stays inside the
                # kernels' SMEM-prefetch compile budget (50.5k rows
                # measured compiling; 68k does not).
                o8, c8, nb8 = histogram(8)
                c8_np = np.asarray(c8)
                cnt8 = c8_np[c8_np > 0].astype(np.int64)
                K8 = _choose_K(cnt8, n)
                rows8 = int(np.sum(-(-cnt8 // K8)))
                if rows8 <= 56000:
                    return _finish_plan_device(
                        pos, o8, c8_np, n, dim, N, m, sigma, 8, nb8, K,
                        batch_size, window,
                    )
            if T == 16:
                return _finish_plan_device(
                    pos, order, counts_np, n, dim, N, m, sigma, 16, nb, K,
                    batch_size, window,
                )
    T = min(T, M)
    order, counts, nb = histogram(T)
    return _finish_plan_device(
        pos, order, np.asarray(counts), n, dim, N, m, sigma, T, nb, K,
        batch_size, window,
    )


def _finish_plan_device(
    pos, order, counts_np, n, dim, N, m, sigma, T, nb, K, batch_size,
    window="gaussian",
) -> BinnedPlan:
    """Host O(S) row layout from the histogram + device slot assembly."""
    M = int(round(sigma * N))
    uniq = np.flatnonzero(counts_np)
    cnt = counts_np[uniq].astype(np.int64)
    if K is None:
        K = _choose_K(cnt, n)
    rows_per_bin = -(-cnt // K)
    S = int(rows_per_bin.sum())
    row_bin = np.repeat(np.arange(len(uniq)), rows_per_bin)
    row_rank = np.arange(S) - np.repeat(
        np.concatenate([[0], np.cumsum(rows_per_bin)[:-1]]), rows_per_bin
    )
    start_idx = np.concatenate([[0], np.cumsum(cnt)[:-1]])
    row_start = (start_idx[row_bin] + row_rank * K).astype(np.int32)
    row_count = np.minimum(cnt[row_bin] - row_rank * K, K).astype(np.int32)

    bid = uniq[row_bin]
    origin = np.empty((S, dim), np.int32)
    for d in range(dim - 1, -1, -1):
        origin[:, d] = (bid % nb) * T
        bid = bid // nb
    row_batch = bid.astype(np.int32)

    row_count_dev = jnp.asarray(row_count)
    slot_pt, slot_pos, fill_keys = _assemble_plan_device(
        order, jnp.asarray(row_start), row_count_dev, pos, K=int(K), n=n
    )
    return BinnedPlan(
        slot_pt=slot_pt,
        slot_pos=slot_pos,
        origin=jnp.asarray(origin),
        row_batch=jnp.asarray(row_batch),
        fill_keys=fill_keys,
        row_count=row_count_dev,
        n=n,
        dim=dim,
        N=N,
        m=m,
        sigma=float(sigma),
        window=str(window),
        T=int(T),
        K=int(K),
        batch_size=int(batch_size),
        pos_fp=None,
        active=_active_runs(origin, T, M, dim) if M % T == 0 else None,
        S_occ=len(uniq),
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
    phi = window_value_fn(m, plan.sigma, plan.window)

    scaled = pos_s * M  # (R, K, dim)
    floor_s = jax.lax.stop_gradient(jnp.floor(scaled))
    frac = scaled - floor_s
    s_mod = (floor_s.astype(jnp.int32) - m) % M
    o = (s_mod - origin[:, None, :]) % M  # (R, K, dim), in [0, T)

    u = jnp.arange(H, dtype=jnp.int32)
    rel = u[None, None, None, :] - o[..., None]  # (R, K, dim, H) = u - o
    t = frac[..., None] + (m - rel).astype(frac.dtype)
    vals = phi(t)
    mask = (rel >= 0) & (rel < L)
    A = jnp.where(mask, vals, jnp.zeros_like(vals))
    return A  # (R, K, dim, H)


def _pick_row_chunk(S: int, K: int, H: int, dim: int, C: int, itemsize: int) -> int:
    """Rows per chunk keeping the largest intermediate under ~256 MB."""
    inner = max(K * (H ** max(1, dim - 1)) * C, H**dim * C)
    budget = 1 << 28
    chunk = max(1, budget // max(1, inner * itemsize))
    return int(min(S, chunk))


# ---------------------------------------------------------------------------
# Windowed tile movement: whole (H,)*dim halo tiles move between rows and a
# periodically-extended grid with ONE index per row (lax.gather /
# lax.scatter_add with window dims), instead of one index per element —
# measured ~10x faster on TPU than element scatter/take at 3D N=256 scale.
# The extension of length H per axis absorbs the periodic wrap; spread folds
# the borders back with dim slice-adds.
# ---------------------------------------------------------------------------


def _row_starts(plan: BinnedPlan, origin, row_batch):
    """lax scatter/gather start indices (R, 1 + dim): [batch, origin...]."""
    return jnp.concatenate([row_batch[:, None], origin], axis=1)


def _extend_grid(g, plan: BinnedPlan):
    """Append the first H cells of each spatial axis: periodic windows become
    plain in-bounds windows. g: (B, C, M, ..., M) -> (B, C, M+H, ..., M+H).
    Handles H > M (tiny grids) by tiling extra periods."""
    M, H = plan.M, plan.H
    reps = 1 + -(-H // M)
    for ax in range(2, 2 + plan.dim):
        full = jnp.concatenate([g] * reps, axis=ax) if reps > 1 else g
        g = jax.lax.slice_in_dim(full, 0, M + H, axis=ax)
    return g


def _fold_extension(ge, plan: BinnedPlan):
    """Inverse of :func:`_extend_grid` for accumulated (scattered) data:
    wrap each axis's extension back onto the body, then trim."""
    M, H = plan.M, plan.H
    for ax in range(2, 2 + plan.dim):
        body = jax.lax.slice_in_dim(ge, 0, M, axis=ax)
        off = M
        while off < M + H:
            ln = min(M, M + H - off)
            ext = jax.lax.slice_in_dim(ge, off, off + ln, axis=ax)
            pad = [(0, 0)] * body.ndim
            pad[ax] = (0, M - ln)
            body = body + jnp.pad(ext, pad)
            off += M
        ge = body
    return ge


def _gather_dnums(dim: int):
    return jax.lax.GatherDimensionNumbers(
        offset_dims=tuple(range(1, dim + 3)),  # (1=batch-window, 2=C, spatial)
        collapsed_slice_dims=(),
        start_index_map=tuple([0] + list(range(2, dim + 2))),
    )


def _scatter_dnums(dim: int):
    return jax.lax.ScatterDimensionNumbers(
        update_window_dims=tuple(range(1, dim + 3)),
        inserted_window_dims=(),
        scatter_dims_to_operand_dims=tuple([0] + list(range(2, dim + 2))),
    )


def _spread_xla(plan: BinnedPlan, x, pos, batch_size: int):
    """Differentiable XLA spread: chunked einsum tiles moved to the grid by
    the dense overlap-add fold (ops/tilefold.py) when the geometry allows,
    else by windowed scatter."""
    if use_fold(plan, x.shape[1], jnp.dtype(x.dtype).itemsize, batch_size):
        return _spread_xla_fold(plan, x, pos, batch_size)
    return _spread_xla_windowed(plan, x, pos, batch_size)


def _tiles_for_chunk(plan: BinnedPlan, x, pos, pt, vmask, org):
    """Row halo tiles for one row chunk, C-major: (R, C, (H,)*dim)."""
    dim = plan.dim
    xs = jnp.take(x, pt, axis=0) * vmask[..., None].astype(x.dtype)  # (R,K,C)
    pos_s = jnp.take(pos, pt, axis=0)  # (R,K,dim)
    A = _row_windows(plan, pos_s, org).astype(x.real.dtype)  # (R,K,dim,H)
    if dim == 1:
        return _es("rku,rkc->rcu", A[:, :, 0], xs)
    if dim == 2:
        t1 = _es("rkv,rkc->rkcv", A[:, :, 1], xs)
        return _es("rku,rkcv->rcuv", A[:, :, 0], t1)
    t1 = _es("rkw,rkc->rkcw", A[:, :, 2], xs)
    t2 = _es("rkv,rkcw->rkcvw", A[:, :, 1], t1)
    return _es("rku,rkcvw->rcuvw", A[:, :, 0], t2)


def _spread_xla_fold(plan: BinnedPlan, x, pos, batch_size: int):
    acc = _dense_tiles_xla(plan, x, pos, batch_size)
    return fold_tiles_to_grid(acc, plan, batch_size, x.shape[1])


def _dense_tiles_xla(plan: BinnedPlan, x, pos, batch_size: int, compact=False,
                     tid=None, NT=None):
    """Chunked einsum tiles accumulated into the dense tile array (NT, F)
    with one scalar index per row — negligible layout padding. ``compact``
    restricts the array to the plan's active slab (tilefold.active_axes).
    ``tid``/``NT`` override the dense-tile indexing (used by the grid-sharded
    transforms, whose tile array covers only the local grid slab)."""
    dim, H, K, M, T = plan.dim, plan.H, plan.K, plan.M, plan.T
    nb = M // T
    C = x.shape[1]
    if NT is None:
        NT = batch_size * math.prod(a for _, a in active_axes(plan, compact))
    F = C * H**dim
    S = plan.slot_pt.shape[0]
    R = _pick_row_chunk(S, K, H, dim, C, jnp.dtype(x.dtype).itemsize)
    n_chunks = -(-S // R)
    S_pad = n_chunks * R

    slot_pt = jnp.pad(plan.slot_pt, ((0, S_pad - S), (0, 0)))
    row_count = jnp.pad(plan.row_count, (0, S_pad - S))
    origin = jnp.pad(plan.origin, ((0, S_pad - S), (0, 0)))
    # pad rows scatter out of range and are dropped
    if tid is None:
        tid = row_tile_ids(plan, compact)
    tid = jnp.pad(tid, (0, S_pad - S), constant_values=NT)
    k_iota = jnp.arange(K, dtype=jnp.int32)[None, :]

    acc = jnp.zeros((NT, F), dtype=x.dtype)

    def body(i, acc):
        sl = i * R
        pt = jax.lax.dynamic_slice_in_dim(slot_pt, sl, R, 0)
        rc = jax.lax.dynamic_slice_in_dim(row_count, sl, R, 0)
        vmask = (k_iota < rc[:, None]).astype(jnp.float32)
        org = jax.lax.dynamic_slice_in_dim(origin, sl, R, 0)
        t_id = jax.lax.dynamic_slice_in_dim(tid, sl, R, 0)
        tiles = _tiles_for_chunk(plan, x, pos, pt, vmask, org)
        return acc.at[t_id].add(
            # indices are grouped per tile but NOT ascending when the active
            # slab wraps the periodic boundary (compact ids are a cyclic
            # rotation of the sorted global ids) — no sortedness hint
            tiles.reshape(R, F), mode="drop"
        )

    acc = body(0, acc)  # seed varying carry (see _spread_xla_windowed)
    return jax.lax.fori_loop(1, n_chunks, body, acc)


def _spread_xla_windowed(plan: BinnedPlan, x, pos, batch_size: int):
    """Windowed-scatter fallback for geometries the fold cannot cover
    (M % T != 0 or dense tile array over budget)."""
    dim, H, K = plan.dim, plan.H, plan.K
    M = plan.M
    C = x.shape[1]
    S = plan.slot_pt.shape[0]
    R = _pick_row_chunk(S, K, H, dim, C, jnp.dtype(x.dtype).itemsize)
    n_chunks = -(-S // R)
    S_pad = n_chunks * R

    slot_pt = jnp.pad(plan.slot_pt, ((0, S_pad - S), (0, 0)))
    row_count = jnp.pad(plan.row_count, (0, S_pad - S))
    origin = jnp.pad(plan.origin, ((0, S_pad - S), (0, 0)))
    row_batch = jnp.pad(plan.row_batch, (0, S_pad - S))
    k_iota = jnp.arange(K, dtype=jnp.int32)[None, :]

    Mx = M + H
    ge = jnp.zeros((batch_size, C) + (Mx,) * dim, dtype=x.dtype)
    dnums = _scatter_dnums(dim)

    def body(i, ge_acc):
        sl = i * R
        pt = jax.lax.dynamic_slice_in_dim(slot_pt, sl, R, 0)
        rc = jax.lax.dynamic_slice_in_dim(row_count, sl, R, 0)
        vmask = (k_iota < rc[:, None]).astype(jnp.float32)
        org = jax.lax.dynamic_slice_in_dim(origin, sl, R, 0)
        rb = jax.lax.dynamic_slice_in_dim(row_batch, sl, R, 0)
        tiles = _tiles_for_chunk(plan, x, pos, pt, vmask, org)
        updates = tiles[:, None]  # (R, 1, C, (H,)*dim)
        starts = _row_starts(plan, org, rb)
        return jax.lax.scatter_add(
            ge_acc,
            starts,
            updates,
            dnums,
            mode=jax.lax.GatherScatterMode.CLIP,
        )

    # Chunk 0 outside the loop: under shard_map the updates are varying over
    # the manual axis while the zeros carry is replicated, and a fori_loop
    # rejects that type mismatch — seeding the carry with one varying chunk
    # fixes it generically (and is a no-op otherwise).
    ge = body(0, ge)
    ge = jax.lax.fori_loop(1, n_chunks, body, ge)
    g = _fold_extension(ge, plan)  # (B, C, (M,)*dim)
    # pipeline layout: (B * M^dim, C)
    g = jnp.moveaxis(g, 1, -1)
    return g.reshape(batch_size * M**dim, C)


def _use_pallas(plan: BinnedPlan, C: int, dtype) -> bool:
    if jnp.issubdtype(dtype, jnp.complexfloating):
        return False
    # Mosaic needs a real TPU. Interpret mode exists for kernel unit tests
    # (which call the pallas internals directly), but dispatching through it
    # here would (a) be slower than the XLA path and (b) leak tracer
    # constants when linearized under jax.grad — the custom_vjp shields the
    # backward, not the interpret-mode forward trace.
    if jax.default_backend() != "tpu":
        return False
    from .pallas.contract import pallas_supported

    return pallas_supported(plan, C)


def _row_batch(plan: BinnedPlan, C: int) -> int:
    """Rows per grid step for the row-batched Pallas engines (0 = per-row
    kernels). The per-row kernels pay ~1 us of fixed step cost per plan row
    (small DMAs + pipeline overhead); batching R rows per step amortizes it
    (ops/pallas/contract.py row-batched section). Bounded by a VMEM
    estimate; TORCH_NFFT_TPU_ROW_BATCH forces a value (0 disables)."""
    env = os.environ.get("TORCH_NFFT_TPU_ROW_BATCH", "auto")
    if env == "0":
        return 0
    if plan.dim not in (2, 3) or plan.K % 128 or plan.K > 1024:
        return 0
    if env in ("auto", "") and plan.H**plan.dim > 8192:
        # big halo tiles (e.g. T=32 m=3: H=39, 59k cells): the row-order
        # tile expansion/compose the rb route pays dwarfs the per-step
        # saving — measured a wash at H^3=2197 and the block VMEM budget
        # would force R<=2 here anyway
        return 0
    R = 8 if env in ("auto", "") else int(env)
    G = -(-plan.H // 8) * 8
    W2 = plan.H ** (plan.dim - 1)
    while R > 1:
        lanes = R * plan.K
        # double-buffered data block + fused window batch + KR/dot
        # transients + double-buffered output block
        est = (
            2 * (C + plan.dim) * lanes * 4
            + plan.dim * G * lanes * 4
            + 2 * W2 * plan.K * 4
            + 2 * R * C * plan.H * W2 * 4
        )
        if est <= (10 << 20):
            break
        R //= 2
    return 0 if R <= 1 else R


def _dense_from_rowtiles(plan: BinnedPlan, rowtiles, tid, NT: int):
    """Compose the dense tile array (NT, C, H, W2) from per-row tiles
    (S, C, H, W2): a take of each tile's FIRST row plus an exact overflow
    scatter-add of the remaining rows (statically S - S_occ of them — at
    the 3D headline ~11% of rows, ~20 MB, vs scatter-adding all 175 MB).
    Unoccupied tiles read an appended zero row."""
    S = rowtiles.shape[0]
    valid = plan.row_count > 0
    prev_valid = jax.lax.cummax(
        jnp.where(valid, jnp.arange(S, dtype=jnp.int32), 0)
    )
    tid = jnp.take(tid, prev_valid)  # padded rows point at their predecessor
    first = valid & jnp.concatenate(
        [jnp.ones((1,), bool), tid[1:] != tid[:-1]]
    )
    zero = jnp.zeros((1,) + rowtiles.shape[1:], rowtiles.dtype)
    rt = jnp.concatenate([rowtiles, zero], axis=0)  # (S+1, ...)
    primary = (
        jnp.full((NT,), S, jnp.int32)
        .at[jnp.where(first, tid, NT)]
        .set(jnp.arange(S, dtype=jnp.int32), mode="drop")
    )
    dense = jnp.take(rt, primary, axis=0)  # (NT, C, H, W2)
    OV = S - plan.S_occ
    if OV > 0:
        ov = jnp.nonzero(~first, size=OV, fill_value=S)[0]
        ov_t = jnp.take(tid, jnp.minimum(ov, S - 1))
        dense = dense.at[ov_t].add(jnp.take(rt, ov, axis=0))
    return dense


def _tile_chunk_rows(S: int, H: int, dim: int, C: int) -> int:
    """Row chunk for windowed tile placement: the (Rc, 1, C, (H,)*dim)
    update/output arrays pay ~6.5x TPU layout padding on the (H, H) minor
    dims, so bound the padded chunk at ~6 GB (chunking costs ~10% wall
    time, so stay unchunked whenever it fits beside the grids)."""
    padded_tile = C * (H ** max(0, dim - 2)) * (-(-H // 8) * 8) * 128 * 4
    return int(max(1, min(S, (3 << 31) // max(1, padded_tile))))


def _dense_tiles_pallas(plan: BinnedPlan, x, pos, batch_size: int, compact=False,
                        tid=None, NT=None, x_slot=None):
    """Fused Pallas tiles accumulated IN-KERNEL into the dense (NT, F) array
    (no separate scatter pass; untouched tiles stay zero via aliasing).
    ``tid``/``NT`` as in :func:`_dense_tiles_xla`. With ``x_slot`` (C, S*K)
    the values arrive pre-permuted (slot-layout API) and ``x`` may be None."""
    from .pallas.contract import spread_tiles_dense_pallas

    dim, H = plan.dim, plan.H
    C = x_slot.shape[0] if x_slot is not None else x.shape[1]
    out_dtype = x_slot.dtype if x_slot is not None else x.dtype
    if NT is None:
        NT = batch_size * math.prod(a for _, a in active_axes(plan, compact))
    S = plan.slot_pt.shape[0]
    tid_overridden = tid is not None
    if tid is None:
        tid = row_tile_ids(plan, compact)
    # Padded rows (row_count == 0, e.g. from plan_stack.pad_plan_rows) must
    # not re-open an already-flushed tile block: repoint each at the nearest
    # PRECEDING real row's tile — they contribute exact zeros to it.
    # Row-batched route: only for the plan's own grouped tile ids (an
    # override — grid-sharded local slabs — may clamp non-adjacent groups
    # onto one id, breaking the first-row composition).
    R = _row_batch(plan, C)
    if R and plan.S_occ is not None and not tid_overridden:
        from .pallas.contract import spread_tiles_rb_pallas

        rowtiles = spread_tiles_rb_pallas(
            plan, None if x is None else x.astype(jnp.float32), pos, C=C,
            R=R, x_slot=x_slot,
        )  # (S, C, H, W2)
        acc4 = _dense_from_rowtiles(plan, rowtiles, tid, NT)
        return acc4.reshape(NT, C * H**dim).astype(out_dtype)
    valid = plan.row_count > 0
    prev_valid = jax.lax.cummax(
        jnp.where(valid, jnp.arange(S, dtype=jnp.int32), 0)
    )
    tid = jnp.take(tid, prev_valid)
    acc4 = spread_tiles_dense_pallas(
        plan, None if x is None else x.astype(jnp.float32), pos, C=C,
        tile_index=tid, NT=NT, x_slot=x_slot,
    )
    return acc4.reshape(NT, C * H**dim).astype(out_dtype)


def _spread_pallas(plan: BinnedPlan, x, pos, batch_size: int):
    """Fused Pallas tiles + dense-fold (or windowed-scatter fallback)."""
    from .pallas.contract import spread_tiles_pallas

    dim, H, M, C = plan.dim, plan.H, plan.M, x.shape[1]
    if use_fold(plan, C, jnp.dtype(x.dtype).itemsize, batch_size):
        acc = _dense_tiles_pallas(plan, x, pos, batch_size)
        return fold_tiles_to_grid(acc, plan, batch_size, C)
    tiles = spread_tiles_pallas(plan, x.astype(jnp.float32), pos, C=C)
    tiles = tiles.astype(x.dtype)  # (S, C, H, H*H): modest padding
    S = tiles.shape[0]
    Rc = _tile_chunk_rows(S, H, dim, C)
    n_chunks = -(-S // Rc)
    S_pad = n_chunks * Rc
    tiles = jnp.pad(tiles, ((0, S_pad - S), (0, 0), (0, 0), (0, 0)))
    origin = jnp.pad(plan.origin, ((0, S_pad - S), (0, 0)))
    row_batch = jnp.pad(plan.row_batch, (0, S_pad - S))
    dnums = _scatter_dnums(dim)

    ge = jnp.zeros((batch_size, C) + (M + H,) * dim, dtype=x.dtype)

    def body(i, ge_acc):
        sl = i * Rc
        t = jax.lax.dynamic_slice_in_dim(tiles, sl, Rc, 0)
        org = jax.lax.dynamic_slice_in_dim(origin, sl, Rc, 0)
        rb = jax.lax.dynamic_slice_in_dim(row_batch, sl, Rc, 0)
        updates = t.reshape((Rc, 1, C) + (H,) * dim)
        starts = _row_starts(plan, org, rb)
        return jax.lax.scatter_add(
            ge_acc, starts, updates, dnums, mode=jax.lax.GatherScatterMode.CLIP
        )

    ge = body(0, ge)  # seed varying carry (see _spread_xla)
    if n_chunks > 1:
        ge = jax.lax.fori_loop(1, n_chunks, body, ge)
    g = _fold_extension(ge, plan)
    g = jnp.moveaxis(g, 1, -1)
    return g.reshape(batch_size * M**dim, C)



def _plan_zero_cotangent(plan: BinnedPlan):
    """Cotangent for a plan argument of a custom_vjp: plans are integer
    metadata plus the frozen slot coordinates — never differentiated. Int
    leaves take float0 zeros (their tangent space), float leaves zeros."""
    return jax.tree.map(
        lambda a: (
            jnp.zeros_like(a)
            if jnp.issubdtype(a.dtype, jnp.inexact)
            else np.zeros(a.shape, jax.dtypes.float0)
        ),
        plan,
    )


# The Pallas engines' VJPs are themselves fused Pallas programs: spread and
# gather are exact transposes of each other (same window matrices; fold and
# unfold are transposes by construction), so each value-cotangent rides the
# OTHER direction's existing kernel, and the position cotangent runs one
# derivative-window kernel (pallas/contract.py:pos_grad_pallas) — the XLA
# backward's (R, K, dim, H) window residuals never materialize. Set
# TORCH_NFFT_TPU_FUSED_BWD=0 to fall back to differentiating the XLA engine
# (the reference backward the fused one is tested against). The custom_vjp
# wrappers are MODULE-LEVEL with the plan as an explicit argument: a
# custom_vjp defined inside a jitted function would close over the traced
# plan leaves, and those captured tracers poison the residual jaxpr
# ("No constant handler for DynamicJaxprTracer").


def _fused_bwd() -> bool:
    return os.environ.get("TORCH_NFFT_TPU_FUSED_BWD", "1") != "0"


def _pos_grad_from_tiles(plan: BinnedPlan, tiles, w, tile_index, w_slot=None):
    """(n, dim) position cotangent from tile-space data + point weights."""
    from .pallas.contract import _unslot_values, pos_grad_pallas

    S, K = plan.slot_pt.shape
    dp = pos_grad_pallas(
        plan, tiles, w, C=tiles.shape[1], tile_index=tile_index, w_slot=w_slot
    )  # (S, dim, K)
    out = jnp.swapaxes(dp, 1, 2).reshape(S * K, plan.dim)
    return _unslot_values(plan, out, plan.n)


def _pos_grad_flat(plan: BinnedPlan, g_flat, w):
    tiles, tile_index = _tiles_from_flat(plan, g_flat)
    return _pos_grad_from_tiles(plan, tiles, w, tile_index)


def _pos_grad_dft(plan: BinnedPlan, g_dft, w, compact=False, w_slot=None):
    batch_size = g_dft.shape[0]
    tiles = unfold_grid_to_tiles_dft(g_dft, plan, batch_size, compact)
    return _pos_grad_from_tiles(
        plan, tiles.astype(jnp.float32), w, row_tile_ids(plan, compact),
        w_slot=w_slot,
    )


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _spread_pallas_cv(batch_size, plan, x, pos):
    return _spread_pallas(plan, x, pos, batch_size)


def _spread_pallas_cv_fwd(batch_size, plan, x, pos):
    return _spread_pallas(plan, x, pos, batch_size), (plan, x, pos)


def _spread_pallas_cv_bwd(batch_size, res, g):
    plan, x, pos = res
    if _fused_bwd():
        dx = _gather_pallas(plan, g, pos).astype(x.dtype)  # spread^T = gather
        dpos = _pos_grad_flat(plan, g, x).astype(pos.dtype)
        return _plan_zero_cotangent(plan), dx, dpos
    _, vjp = jax.vjp(lambda a, b: _spread_xla(plan, a, b, batch_size), x, pos)
    dx, dpos = vjp(g)
    return _plan_zero_cotangent(plan), dx, dpos


_spread_pallas_cv.defvjp(_spread_pallas_cv_fwd, _spread_pallas_cv_bwd)


@jax.custom_vjp
def _gather_pallas_cv(plan, g_flat, pos):
    return _gather_pallas(plan, g_flat, pos)


def _gather_pallas_cv_fwd(plan, g_flat, pos):
    return _gather_pallas(plan, g_flat, pos), (plan, g_flat, pos)


def _gather_pallas_cv_bwd(res, g):
    plan, gf, pos = res
    if _fused_bwd():
        M = plan.M
        batch_size = gf.shape[0] // M**plan.dim
        # gather^T = spread of the point cotangent
        dg = _spread_pallas(plan, g, pos, batch_size).astype(gf.dtype)
        dpos = _pos_grad_flat(plan, gf, g).astype(pos.dtype)
        return _plan_zero_cotangent(plan), dg, dpos
    _, vjp = jax.vjp(lambda a, b: _gather_xla(plan, a, b), gf, pos)
    dg, dpos = vjp(g)
    return _plan_zero_cotangent(plan), dg, dpos


_gather_pallas_cv.defvjp(_gather_pallas_cv_fwd, _gather_pallas_cv_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _spread_dft_pallas_cv(batch_size, compact, plan, x, pos):
    return _spread_dft_pallas(plan, x, pos, batch_size, compact)


def _spread_dft_pallas_cv_fwd(batch_size, compact, plan, x, pos):
    return _spread_dft_pallas(plan, x, pos, batch_size, compact), (plan, x, pos)


def _spread_dft_pallas_cv_bwd(batch_size, compact, res, g):
    plan, x, pos = res
    if _fused_bwd():
        dx = _gather_dft_pallas(plan, g, pos, compact).astype(x.dtype)
        dpos = _pos_grad_dft(plan, g, x, compact).astype(pos.dtype)
        return _plan_zero_cotangent(plan), dx, dpos
    _, vjp = jax.vjp(
        lambda a, b: _spread_dft_xla(plan, a, b, batch_size, compact), x, pos
    )
    dx, dpos = vjp(g)
    return _plan_zero_cotangent(plan), dx, dpos


_spread_dft_pallas_cv.defvjp(_spread_dft_pallas_cv_fwd, _spread_dft_pallas_cv_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _gather_dft_pallas_cv(compact, plan, g_dft, pos):
    return _gather_dft_pallas(plan, g_dft, pos, compact)


def _gather_dft_pallas_cv_fwd(compact, plan, g_dft, pos):
    return _gather_dft_pallas(plan, g_dft, pos, compact), (plan, g_dft, pos)


def _gather_dft_pallas_cv_bwd(compact, res, g):
    plan, gd, pos = res
    if _fused_bwd():
        dg = _spread_dft_pallas(
            plan, g, pos, gd.shape[0], compact
        ).astype(gd.dtype)
        dpos = _pos_grad_dft(plan, gd, g, compact).astype(pos.dtype)
        return _plan_zero_cotangent(plan), dg, dpos
    _, vjp = jax.vjp(lambda a, b: _gather_dft_xla(plan, a, b, compact), gd, pos)
    dg, dpos = vjp(g)
    return _plan_zero_cotangent(plan), dg, dpos


_gather_dft_pallas_cv.defvjp(_gather_dft_pallas_cv_fwd, _gather_dft_pallas_cv_bwd)


@partial(jax.jit, static_argnames=("batch_size",))
def spread_binned(plan: BinnedPlan, x, pos, *, batch_size: int):
    """Spread x (n, C) onto the flat oversampled grid (batch_size*M^dim, C).

    Exact same math as the scatter strategy (ops/spread_gather.py) — only the
    execution schedule differs. On TPU (3D) the tile contraction runs as a
    fused Pallas kernel; its custom VJP falls back to the differentiable XLA
    path, so gradients (incl. positions) are always available.
    """
    # The plan binned float32-cast positions; run the device window math in
    # the same dtype so a float64 point near a cell boundary can't floor()
    # into a tile whose planned halo misses its last window cell.
    pos = pos.astype(jnp.float32)
    if not _use_pallas(plan, x.shape[1], x.dtype):
        return _spread_xla(plan, x, pos, batch_size)
    return _spread_pallas_cv(batch_size, plan, x, pos)


def _row_values_from_tiles(plan: BinnedPlan, pos, pt, vmask, org, tiles):
    """tiles: (R, C, (H,)*dim) -> per-slot values (R, K, C)."""
    dim = plan.dim
    pos_s = jnp.take(pos, pt, axis=0)
    A = _row_windows(plan, pos_s, org).astype(tiles.real.dtype)
    if dim == 1:
        y = _es("rku,rcu->rkc", A[:, :, 0], tiles)
    elif dim == 2:
        t1 = _es("rku,rcuv->rkcv", A[:, :, 0], tiles)
        y = _es("rkv,rkcv->rkc", A[:, :, 1], t1)
    else:
        t1 = _es("rku,rcuvw->rkcvw", A[:, :, 0], tiles)
        t2 = _es("rkv,rkcvw->rkcw", A[:, :, 1], t1)
        y = _es("rkw,rkcw->rkc", A[:, :, 2], t2)
    return y * vmask[..., None].astype(y.dtype)


def _gather_xla(plan: BinnedPlan, g_flat, pos):
    """Differentiable XLA gather: dense tile unfold + contraction when the
    fold geometry allows, else windowed lax.gather."""
    batch_size = g_flat.shape[0] // plan.M**plan.dim
    if use_fold(plan, g_flat.shape[1], jnp.dtype(g_flat.dtype).itemsize, batch_size):
        return _gather_xla_fold(plan, g_flat, pos, batch_size)
    return _gather_xla_windowed(plan, g_flat, pos)


def _gather_xla_fold(plan: BinnedPlan, g_flat, pos, batch_size: int):
    """Unfold the grid into the dense halo-tile array (reshape/roll reads),
    then contract per-row tiles fetched with one contiguous take per row."""
    tiles_dense = unfold_grid_to_tiles(g_flat, plan, batch_size)
    return _points_from_tiles_xla(plan, tiles_dense, pos)


def _points_from_tiles_xla(plan: BinnedPlan, tiles_dense, pos, compact=False,
                           tid=None):
    """Dense tile4 array (NT, C, H, H^{dim-1}) -> per-point values (n, C).
    ``tid`` overrides the per-row tile indexing (grid-sharded transforms)."""
    dim, H, K = plan.dim, plan.H, plan.K
    C = tiles_dense.shape[1]
    S = plan.slot_pt.shape[0]
    R = _pick_row_chunk(S, K, H, dim, C, jnp.dtype(tiles_dense.dtype).itemsize)
    n_chunks = -(-S // R)
    S_pad = n_chunks * R

    slot_pt = jnp.pad(plan.slot_pt, ((0, S_pad - S), (0, 0)))
    row_count = jnp.pad(plan.row_count, (0, S_pad - S))
    origin = jnp.pad(plan.origin, ((0, S_pad - S), (0, 0)))
    if tid is None:
        tid = row_tile_ids(plan, compact)
    tid = jnp.pad(tid, (0, S_pad - S))  # pad rows read tile 0, masked
    k_iota = jnp.arange(K, dtype=jnp.int32)[None, :]

    out = jnp.zeros((S_pad * K, C), dtype=tiles_dense.dtype)

    def body(i, out_acc):
        sl = i * R
        pt = jax.lax.dynamic_slice_in_dim(slot_pt, sl, R, 0)
        rc = jax.lax.dynamic_slice_in_dim(row_count, sl, R, 0)
        vmask = (k_iota < rc[:, None]).astype(jnp.float32)
        org = jax.lax.dynamic_slice_in_dim(origin, sl, R, 0)
        t_id = jax.lax.dynamic_slice_in_dim(tid, sl, R, 0)
        tiles = jnp.take(tiles_dense, t_id, axis=0)  # (R, C, H, H^{dim-1})
        tiles = tiles.reshape((R, C) + (H,) * dim)
        y = _row_values_from_tiles(plan, pos, pt, vmask, org, tiles)
        return jax.lax.dynamic_update_slice_in_dim(
            out_acc, y.reshape(R * K, C), sl * K, 0
        )

    out = body(0, out)  # seed varying carry (see _spread_xla_windowed)
    out = jax.lax.fori_loop(1, n_chunks, body, out)
    return jnp.take(out, plan.inv_slot, axis=0)


def _gather_xla_windowed(plan: BinnedPlan, g_flat, pos):
    """Windowed-gather fallback (see _spread_xla_windowed)."""
    dim, H, K, M = plan.dim, plan.H, plan.K, plan.M
    C = g_flat.shape[1]
    S = plan.slot_pt.shape[0]
    R = _pick_row_chunk(S, K, H, dim, C, jnp.dtype(g_flat.dtype).itemsize)
    n_chunks = -(-S // R)
    S_pad = n_chunks * R

    slot_pt = jnp.pad(plan.slot_pt, ((0, S_pad - S), (0, 0)))
    row_count = jnp.pad(plan.row_count, (0, S_pad - S))
    origin = jnp.pad(plan.origin, ((0, S_pad - S), (0, 0)))
    row_batch = jnp.pad(plan.row_batch, (0, S_pad - S))
    k_iota = jnp.arange(K, dtype=jnp.int32)[None, :]

    # batch_size is recoverable from the grid length (static shapes)
    batch_size = g_flat.shape[0] // M**dim

    # (B*M^dim, C) -> (B, C, (M,)*dim) -> periodic extension for windowing
    gx = g_flat.reshape((batch_size,) + (M,) * dim + (C,))
    gx = jnp.moveaxis(gx, -1, 1)
    gx = _extend_grid(gx, plan)
    dnums = _gather_dnums(dim)
    slice_sizes = (1, C) + (H,) * dim

    out = jnp.zeros((S_pad * K, C), dtype=g_flat.dtype)

    def body(i, out_acc):
        sl = i * R
        pt = jax.lax.dynamic_slice_in_dim(slot_pt, sl, R, 0)
        rc = jax.lax.dynamic_slice_in_dim(row_count, sl, R, 0)
        vmask = (k_iota < rc[:, None]).astype(jnp.float32)
        org = jax.lax.dynamic_slice_in_dim(origin, sl, R, 0)
        rb = jax.lax.dynamic_slice_in_dim(row_batch, sl, R, 0)

        starts = _row_starts(plan, org, rb)
        tiles = jax.lax.gather(
            gx, starts, dnums, slice_sizes=slice_sizes,
            mode=jax.lax.GatherScatterMode.CLIP,
        )[:, 0]  # (R, C, (H,)*dim)

        y = _row_values_from_tiles(plan, pos, pt, vmask, org, tiles)
        return jax.lax.dynamic_update_slice_in_dim(
            out_acc, y.reshape(R * K, C), sl * K, 0
        )

    out = body(0, out)  # seed varying carry (see _spread_xla_windowed)
    out = jax.lax.fori_loop(1, n_chunks, body, out)
    return jnp.take(out, plan.inv_slot, axis=0)


def _tiles_from_flat(plan: BinnedPlan, g_flat):
    """Per-row/dense halo tiles + tile index for a flat-layout grid — the
    shared front half of the Pallas gather and of the fused position-gradient
    backward. Returns ``(tiles (NT|S, C, H, H^{dim-1}) f32, tile_index|None)``.
    """
    dim, H, M = plan.dim, plan.H, plan.M
    C = g_flat.shape[1]
    batch_size = g_flat.shape[0] // M**dim
    S = plan.slot_pt.shape[0]

    if use_fold(plan, C, jnp.dtype(g_flat.dtype).itemsize, batch_size):
        # Dense unfold (reshape/roll reads); the kernel reads each row's tile
        # straight out of the dense array via a prefetched tile index, so
        # consecutive rows of one tile reuse the VMEM-resident block.
        tiles_dense = unfold_grid_to_tiles(g_flat, plan, batch_size)
        return tiles_dense.astype(jnp.float32), row_tile_ids(plan)

    gx = g_flat.reshape((batch_size,) + (M,) * dim + (C,))
    gx = jnp.moveaxis(gx, -1, 1)
    gx = _extend_grid(gx, plan)

    Rc = _tile_chunk_rows(S, H, dim, C)
    n_chunks = -(-S // Rc)
    S_pad = n_chunks * Rc
    origin = jnp.pad(plan.origin, ((0, S_pad - S), (0, 0)))
    row_batch = jnp.pad(plan.row_batch, (0, S_pad - S))
    dnums = _gather_dnums(dim)
    slice_sizes = (1, C) + (H,) * dim

    def chunk_tiles(org, rb, R):
        starts = _row_starts(plan, org, rb)
        t = jax.lax.gather(
            gx, starts, dnums, slice_sizes=slice_sizes,
            mode=jax.lax.GatherScatterMode.CLIP,
        )[:, 0]  # (R, C, (H,)*dim)
        return t.reshape(R, C, H, H ** (dim - 1)).astype(jnp.float32)

    if n_chunks == 1:
        tiles = chunk_tiles(origin, row_batch, S_pad)[:S]
    else:
        tiles = jnp.zeros((S_pad, C, H, H ** (dim - 1)), jnp.float32)

        def body(i, tiles_acc):
            sl = i * Rc
            org = jax.lax.dynamic_slice_in_dim(origin, sl, Rc, 0)
            rb = jax.lax.dynamic_slice_in_dim(row_batch, sl, Rc, 0)
            return jax.lax.dynamic_update_slice_in_dim(
                tiles_acc, chunk_tiles(org, rb, Rc), sl, 0
            )

        tiles = body(0, tiles)  # seed varying carry (see _spread_xla)
        tiles = jax.lax.fori_loop(1, n_chunks, body, tiles)[:S]
    return tiles, None


def _gather_from_dense(plan: BinnedPlan, tiles_dense, C: int, tid):
    """(S, C, K) slot values from the dense tile array: the row-batched
    kernel off a row-order take of the tiles when enabled, else the per-row
    kernel reading the dense array through its prefetched tile index."""
    from .pallas.contract import gather_points_pallas, gather_points_rb_pallas

    R = _row_batch(plan, C)
    if R:
        S = plan.slot_pt.shape[0]
        S_pad = -(-S // R) * R
        tid_p = jnp.pad(tid, (0, S_pad - S))
        rows = jnp.take(tiles_dense.astype(jnp.float32), tid_p, axis=0)
        return gather_points_rb_pallas(plan, rows, C=C, R=R)
    return gather_points_pallas(
        plan, tiles_dense.astype(jnp.float32), None, C=C, tile_index=tid
    )


def _gather_pallas(plan: BinnedPlan, g_flat, pos):
    from .pallas.contract import _unslot_values, gather_points_pallas

    C = g_flat.shape[1]
    S, K = plan.slot_pt.shape
    tiles, tile_index = _tiles_from_flat(plan, g_flat)
    if tile_index is not None:
        y = _gather_from_dense(plan, tiles, C, tile_index)
    else:
        # windowed fallback produced per-row tiles already
        y = gather_points_pallas(
            plan, tiles, pos, C=C, tile_index=tile_index
        )  # (S, C, K)
    out = jnp.swapaxes(y, 1, 2).reshape(S * K, C).astype(g_flat.dtype)
    return _unslot_values(plan, out, plan.n)


@jax.jit
def gather_binned(plan: BinnedPlan, g_flat, pos):
    """Gather from the flat grid back to the points: (n, C). Transpose of
    :func:`spread_binned`; Pallas-fused on TPU (3D), XLA otherwise."""
    # float32 for the same plan/device binning-consistency reason as
    # spread_binned.
    pos = pos.astype(jnp.float32)
    if not _use_pallas(plan, g_flat.shape[1], g_flat.dtype):
        return _gather_xla(plan, g_flat, pos)
    return _gather_pallas_cv(plan, g_flat, pos)


# ---------------------------------------------------------------------------
# DFT-layout entry points: identical math to spread_binned / gather_binned,
# but the grid travels in the layout (B, M_1, ..., M_{dim-1}, C, M_0) that
# the layout-careful 3D fold produces natively and the pruned spectral
# matmuls (ops/fft.py:spectral_*_pruned_dft) consume directly — the planar
# pipelines chain them with zero intermediate grid transposes.
# ---------------------------------------------------------------------------


def _spread_dft_xla(plan: BinnedPlan, x, pos, batch_size: int, compact=False):
    acc = _dense_tiles_xla(plan, x, pos, batch_size, compact)
    return fold_tiles_to_grid_dft(acc, plan, batch_size, x.shape[1], compact)


def _spread_dft_pallas(plan: BinnedPlan, x, pos, batch_size: int, compact=False):
    acc = _dense_tiles_pallas(plan, x, pos, batch_size, compact)
    return fold_tiles_to_grid_dft(acc, plan, batch_size, x.shape[1], compact)


@partial(jax.jit, static_argnames=("batch_size", "compact"))
def spread_binned_dft(plan: BinnedPlan, x, pos, *, batch_size: int,
                      compact: bool = False):
    """spread_binned in the DFT grid layout. Requires a fold-capable plan
    (use_fold(...) must hold — checked by the planar pipeline dispatch).
    ``compact=True`` produces the grid only on the plan's active slab; the
    consumer must build its pruned DFT matrices with the matching
    tilefold.compact_cells(plan) spec."""
    pos = pos.astype(jnp.float32)
    if not _use_pallas(plan, x.shape[1], x.dtype):
        return _spread_dft_xla(plan, x, pos, batch_size, compact)
    return _spread_dft_pallas_cv(batch_size, compact, plan, x, pos)


def _gather_dft_xla(plan: BinnedPlan, g_dft, pos, compact=False):
    batch_size = g_dft.shape[0]
    tiles_dense = unfold_grid_to_tiles_dft(g_dft, plan, batch_size, compact)
    return _points_from_tiles_xla(plan, tiles_dense, pos, compact)


def _gather_dft_pallas(plan: BinnedPlan, g_dft, pos, compact=False):
    from .pallas.contract import _unslot_values

    batch_size = g_dft.shape[0]
    C = g_dft.shape[-2]
    S, K = plan.slot_pt.shape
    tiles_dense = unfold_grid_to_tiles_dft(g_dft, plan, batch_size, compact)
    y = _gather_from_dense(
        plan, tiles_dense, C, row_tile_ids(plan, compact)
    )  # (S, C, K)
    out = jnp.swapaxes(y, 1, 2).reshape(S * K, C).astype(g_dft.dtype)
    return _unslot_values(plan, out, plan.n)


@partial(jax.jit, static_argnames=("compact",))
def gather_binned_dft(plan: BinnedPlan, g_dft, pos, *, compact: bool = False):
    """gather_binned from a DFT-layout grid (B, L_1, ..., C, L_0)."""
    pos = pos.astype(jnp.float32)
    if not _use_pallas(plan, g_dft.shape[-2], g_dft.dtype):
        return _gather_dft_xla(plan, g_dft, pos, compact)
    return _gather_dft_pallas_cv(compact, plan, g_dft, pos)


# ---------------------------------------------------------------------------
# Slot-layout (plan-native) API. The per-call point-order permutations —
# user order -> slot order on the way in, slot order -> user order on the
# way out — are issue-bound scatters (~11 ns/element; ~250 ms of the 497 ms
# headline pair at 16.7M points) and are the one per-transform cost that is
# NOT part of the transform's math. Iterated workloads on a fixed point set
# (CG / power iteration on a Gram matrix, repeated fastsum matvecs) can pay
# them once: convert to slot order at solve start, run every matvec
# slot-in/slot-out, convert back at the end. A slot vector is an opaque
# (C, S*K) array — empty slots hold exact zeros and every point occupies
# exactly one slot, so +, scalar*, and dot products agree with user order.
# ---------------------------------------------------------------------------


@jax.jit
def to_slot_order(plan: BinnedPlan, x):
    """(n, C) user-order values -> (C, S*K) slot-layout values.

    The slot layout is the plan's native execution order (points sorted by
    (batch, tile), packed into K-capacity rows); empty slots are zero."""
    from .pallas.contract import _slot_values

    return _slot_values(plan, x)


@jax.jit
def from_slot_order(plan: BinnedPlan, v):
    """(C, S*K) slot-layout values -> (n, C) user order (inverse of
    :func:`to_slot_order` on its image; empty slots are dropped)."""
    from .pallas.contract import _unslot_values

    return _unslot_values(plan, v.T, plan.n)


def _spread_dft_slot(plan: BinnedPlan, x_slot, batch_size: int, compact):
    acc = _dense_tiles_pallas(
        plan, None, None, batch_size, compact, x_slot=x_slot
    )
    return fold_tiles_to_grid_dft(
        acc, plan, batch_size, x_slot.shape[0], compact
    )


def _gather_dft_slot(plan: BinnedPlan, g_dft, compact):
    batch_size = g_dft.shape[0]
    C = g_dft.shape[-2]
    S, K = plan.slot_pt.shape
    tiles_dense = unfold_grid_to_tiles_dft(g_dft, plan, batch_size, compact)
    y = _gather_from_dense(
        plan, tiles_dense, C, row_tile_ids(plan, compact)
    )  # (S, C, K)
    return jnp.swapaxes(y, 0, 1).reshape(C, S * K).astype(g_dft.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _spread_dft_slot_cv(batch_size, compact, plan, x_slot):
    return _spread_dft_slot(plan, x_slot, batch_size, compact)


def _spread_dft_slot_cv_fwd(batch_size, compact, plan, x_slot):
    return _spread_dft_slot(plan, x_slot, batch_size, compact), (plan, x_slot)


def _spread_dft_slot_cv_bwd(batch_size, compact, res, g):
    plan, x_slot = res
    # spread^T = gather, already slot-out — the backward needs no
    # permutation at all (unlike the user-order backward).
    dx = _gather_dft_slot(plan, g, compact).astype(x_slot.dtype)
    return _plan_zero_cotangent(plan), dx


_spread_dft_slot_cv.defvjp(_spread_dft_slot_cv_fwd, _spread_dft_slot_cv_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _gather_dft_slot_cv(compact, plan, g_dft):
    return _gather_dft_slot(plan, g_dft, compact)


def _gather_dft_slot_cv_fwd(compact, plan, g_dft):
    # residuals must be JAX types: a zero-size marker carries the grid's
    # batch size (shape) and dtype without keeping the grid alive.
    marker = jnp.empty((g_dft.shape[0], 0), g_dft.dtype)
    return _gather_dft_slot(plan, g_dft, compact), (plan, marker)


def _gather_dft_slot_cv_bwd(compact, res, g):
    plan, marker = res
    dg = _spread_dft_slot(plan, g, marker.shape[0], compact).astype(marker.dtype)
    return _plan_zero_cotangent(plan), dg


_gather_dft_slot_cv.defvjp(_gather_dft_slot_cv_fwd, _gather_dft_slot_cv_bwd)


@partial(jax.jit, static_argnames=("batch_size", "compact"))
def spread_binned_dft_slot(plan: BinnedPlan, x_slot, *, batch_size: int,
                           compact: bool = False):
    """:func:`spread_binned_dft` taking (C, S*K) slot-layout values — skips
    the per-call point-order permutation. Requires a fold-capable plan.
    Gradients flow to ``x_slot`` (the backward is the slot gather — also
    permutation-free); position gradients are not offered here, use the
    user-order entry points for position optimization."""
    if not _use_pallas(plan, x_slot.shape[0], x_slot.dtype):
        # Differentiable fallback for CPU/debug backends: convert and run
        # the user-order XLA engine (to/from_slot_order are plain scatters,
        # so jax.grad still flows to x_slot).
        x = from_slot_order(plan, x_slot)
        return _spread_dft_xla(
            plan, x, plan_slot_pos_user(plan), batch_size, compact
        )
    return _spread_dft_slot_cv(batch_size, compact, plan, x_slot)


@partial(jax.jit, static_argnames=("compact",))
def gather_binned_dft_slot(plan: BinnedPlan, g_dft, *, compact: bool = False):
    """:func:`gather_binned_dft` returning (C, S*K) slot-layout values —
    skips the slot -> user permutation. Requires a fold-capable plan."""
    if not _use_pallas(plan, g_dft.shape[-2], g_dft.dtype):
        y = _gather_dft_xla(
            plan, g_dft, plan_slot_pos_user(plan), compact
        )
        return to_slot_order(plan, y)
    return _gather_dft_slot_cv(compact, plan, g_dft)


def plan_slot_pos_user(plan: BinnedPlan):
    """(n, dim) float32 positions reconstructed from the plan's slot-ordered
    coordinates — the slot-layout entry points take no ``pos`` argument (the
    Pallas engines read ``plan.slot_pos`` directly); the XLA fallback path
    rebuilds user-order positions from the same source so both routes use
    exactly the coordinates the plan binned."""
    from .pallas.contract import _unslot_values

    S, K = plan.slot_pt.shape
    return _unslot_values(plan, plan.slot_pos.T.reshape(S * K, plan.dim),
                          plan.n)


# ---------------------------------------------------------------------------
# Local-slab engine hooks for the grid-sharded transforms
# (parallel/grid_sharded.py): the same fused Pallas engines, but with the
# dense-tile indexing overridden to the caller's LOCAL slab (tid/NT), and
# custom VJPs so the sharded transforms stay differentiable (pallas_call has
# no automatic transpose).
# ---------------------------------------------------------------------------


def _tiles4(plan: BinnedPlan, g, NT: int, C: int):
    return g.reshape(NT, C, plan.H, plan.H ** (plan.dim - 1)).astype(
        jnp.float32
    )


def _int_zero_cotangent(a):
    return np.zeros(a.shape, jax.dtypes.float0)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def dense_tiles_local(NT, plan, x, pos, tid):
    """(NT, C*H^dim) dense tile array for a LOCAL tile id space: the fused
    Pallas spread with ``tid``/``NT`` overriding the plan's own dense
    indexing. Valid rows must stay grouped under ``tid`` (the grid-sharded
    layouts guarantee it: real rows lie inside the shard's slab)."""
    return _dense_tiles_pallas(plan, x, pos, 1, tid=tid, NT=NT)


def _dense_tiles_local_fwd(NT, plan, x, pos, tid):
    return dense_tiles_local(NT, plan, x, pos, tid), (plan, x, pos, tid)


def _dense_tiles_local_bwd(NT, res, g):
    from .pallas.contract import _unslot_values

    plan, x, pos, tid = res
    C = x.shape[1]
    S, K = plan.slot_pt.shape
    tiles = _tiles4(plan, g, NT, C)
    y = _gather_from_dense(plan, tiles, C, tid)  # spread^T = gather
    dx = _unslot_values(
        plan, jnp.swapaxes(y, 1, 2).reshape(S * K, C), plan.n
    ).astype(x.dtype)
    dpos = _pos_grad_from_tiles(plan, tiles, x, tid).astype(pos.dtype)
    return (_plan_zero_cotangent(plan), dx, dpos, _int_zero_cotangent(tid))


dense_tiles_local.defvjp(_dense_tiles_local_fwd, _dense_tiles_local_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def points_from_tiles_local(NT, plan, tiles_dense, pos, tid):
    """(n, C) user-order values from a LOCAL dense tile array — the fused
    Pallas gather with overridden tile indexing (transpose of
    :func:`dense_tiles_local`)."""
    from .pallas.contract import _unslot_values

    C = tiles_dense.shape[1]
    S, K = plan.slot_pt.shape
    y = _gather_from_dense(plan, tiles_dense, C, tid)
    return _unslot_values(plan, jnp.swapaxes(y, 1, 2).reshape(S * K, C),
                          plan.n)


def _points_from_tiles_local_fwd(NT, plan, tiles_dense, pos, tid):
    out = points_from_tiles_local(NT, plan, tiles_dense, pos, tid)
    return out, (plan, tiles_dense, pos, tid)


def _points_from_tiles_local_bwd(NT, res, g):
    plan, tiles_dense, pos, tid = res
    C = tiles_dense.shape[1]
    H = plan.H
    dt = _dense_tiles_pallas(plan, g, pos, 1, tid=tid, NT=NT)
    dt = dt.reshape(tiles_dense.shape).astype(tiles_dense.dtype)
    dpos = _pos_grad_from_tiles(
        plan, tiles_dense.astype(jnp.float32), g, tid
    ).astype(pos.dtype)
    return (_plan_zero_cotangent(plan), dt, dpos, _int_zero_cotangent(tid))


points_from_tiles_local.defvjp(
    _points_from_tiles_local_fwd, _points_from_tiles_local_bwd
)
