"""End-to-end GRID-sharded NFFT transforms: the oversampled grid itself is
partitioned across the mesh — for N^dim grids beyond one chip's HBM.

Where ``parallel/sharded.py`` shards the POINT dimension (every chip holds a
full grid replica and one psum reduces them — the analogue of the reference's
one shared grid, ``csrc/cuda/core_cuda.cu:216``), this module shards the
GRID's axis-0 tile slabs:

* every point belongs to the slab containing its window-origin tile, so the
  point set partitions cleanly by slab (plan rows are sorted tile-major on
  axis 0);
* **spread** forms the local slab's dense tile array, overlap-adds axis 0
  WITHOUT the periodic wrap, and hands the (2m+1)-cell halo spill to the next
  shard with ONE ``ppermute`` — the spill of the last tile fits inside one
  neighbouring tile by construction (ops/tilefold.py geometry);
* the **adjoint spectral stage** contracts each shard's row block of the
  axis-0 pruned DFT matrix locally and finishes with ONE ``psum`` of the
  (small) N^dim spectrum; axes 1..dim-1 are fully local;
* the **forward spectral stage** is fully local (each shard builds its slab
  from the replicated spectrum — zero collectives), and the **gather** pulls
  the first halo cells of the next slab with one reverse ``ppermute``.

Total communication per transform: one E-cell-plane ppermute plus (adjoint
only) one N^dim psum — both riding ICI.

Current scope: dim >= 2, batch_size == 1 (grid sharding targets single huge
transforms; batched point sets shard better by batch), real planar inputs
(the execution layer used on complex-free TPU runtimes), XLA engine inside
the shard_map body (portable across backends; the fused Pallas engine can be
slotted per shard later).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..ops.binned import (
    BinnedPlan,
    _dense_tiles_xla,
    _points_from_tiles_xla,
    dense_tiles_local,
    points_from_tiles_local,
    build_plan,
    default_tile,
)
from ..ops.fft import _axis_contract, _cells_spec, _pruned_mats_np
from ..ops.plan_stack import pad_plan_rows, squeeze_plan, stack_plans
from ..ops.tilefold import _geom, _pair_fold, _pair_unfold

__all__ = [
    "GridShardedLayout",
    "build_grid_sharded_layout",
    "nfft_adjoint_grid_sharded",
    "nfft_forward_grid_sharded",
    "nfft_fastsum_grid_sharded",
    "spectral_adjoint_pruned_dft_sharded0",
    "spectral_forward_pruned_dft_sharded0",
]

import functools as _functools

# check_vma=False: pallas_call (compiled Mosaic and its interpreter alike)
# mixes varying shard data with unvarying loop/index machinery, which the
# strict varying-manual-axes checker rejects; the shapes/specs here are
# explicit, so the check is not load-bearing.
shard_map = _functools.partial(jax.shard_map, check_vma=False)


# ---------------------------------------------------------------------------
# Layout: per-slab point partition + per-shard plans
# ---------------------------------------------------------------------------


@dataclass
class GridShardedLayout:
    """Host-built partition of a point set by grid-axis-0 tile slab."""

    plans: BinnedPlan  # stacked (leading axis = shard)
    pos_stack: jax.Array  # (P, n_loc, dim) f32
    point_index: jax.Array  # (P, n_loc) int32; n == sentinel (padded slot)
    n: int
    n_shards: int
    dim: int
    N: int
    m: int
    sigma: float
    T: int
    A0_loc: int  # axis-0 tiles per shard
    window: str = "gaussian"


def build_grid_sharded_layout(
    pos,
    *,
    n_shards: int,
    N: int,
    m: int,
    sigma: float = 2.0,
    T: int | None = None,
    K: int | None = None,
    window: str = "gaussian",
) -> GridShardedLayout:
    """Partition ``pos`` by axis-0 tile slab and build one plan per shard.

    Requires dim >= 2 and ``nb % n_shards == 0`` (equal tile slabs, mirror of
    the divisibility rule in parallel/sharded.py's spectral stages). Shards
    with fewer points are padded with a zero-weight point inside their slab.
    """
    pos = np.asarray(pos, dtype=np.float32)
    n, dim = pos.shape
    if dim < 2:
        raise ValueError("grid sharding needs dim >= 2")
    M = int(round(sigma * N))
    if T is None:
        T = default_tile(dim, m, M)
    if M % T:
        raise ValueError(f"M={M} must be divisible by the tile size T={T}")
    if T < 2 * m + 1:
        raise ValueError(
            f"tile size T={T} must be >= the window halo E=2m+1={2 * m + 1}"
            " (the overlap-add spill must fit one neighbouring tile)"
        )
    nb = M // T
    if nb % n_shards:
        raise ValueError(
            f"tiles per axis nb={nb} not divisible by n_shards={n_shards}"
        )
    A0_loc = nb // n_shards

    s0 = ((np.floor(pos[:, 0] * M).astype(np.int64) - m) % M) // T
    shard = (s0 // A0_loc).astype(np.int64)
    counts = np.bincount(shard, minlength=n_shards)
    n_loc = max(1, int(counts.max()))

    pos_stack = np.empty((n_shards, n_loc, dim), np.float32)
    point_index = np.full((n_shards, n_loc), n, np.int32)  # sentinel
    plans, K_sh = [], K
    for p in range(n_shards):
        idx = np.flatnonzero(shard == p)
        if idx.size == 0:
            # synthetic in-slab point (weight 0 via the sentinel packing)
            filler = np.zeros((dim,), np.float32)
            filler[0] = ((p * A0_loc * T + m) % M + 0.5) / M
            pos_p = np.broadcast_to(filler, (n_loc, dim)).copy()
        else:
            pad = idx[np.zeros(n_loc - idx.size, np.int64)]
            full = np.concatenate([idx, pad])
            pos_p = pos[full]
            point_index[p, : idx.size] = idx
        pos_stack[p] = pos_p
        plan = build_plan(
            pos_p, None, N=N, m=m, sigma=sigma, batch_size=1, T=T, K=K_sh,
            window=window,
        )
        if K_sh is None:
            K_sh = plan.K
        plans.append(plan)
    S_max = max(pl.slot_pt.shape[0] for pl in plans)
    stacked = stack_plans([pad_plan_rows(pl, S_max) for pl in plans])
    return GridShardedLayout(
        plans=stacked,
        pos_stack=jnp.asarray(pos_stack),
        point_index=jnp.asarray(point_index),
        n=n,
        n_shards=n_shards,
        dim=dim,
        N=N,
        m=m,
        sigma=float(sigma),
        T=int(T),
        A0_loc=int(A0_loc),
        window=str(window),
    )


def _use_pallas_shard(plan, C: int, dtype) -> bool:
    """Engine choice inside the shard bodies: the fused Pallas kernels on a
    real TPU (same rule as ops/binned.py:_use_pallas), the portable XLA
    engine elsewhere. TORCH_NFFT_TPU_SHARD_PALLAS=1 forces the Pallas route
    off-TPU (interpret mode — CPU-mesh value-parity tests); =0 forces XLA.
    """
    import os

    v = os.environ.get("TORCH_NFFT_TPU_SHARD_PALLAS", "auto")
    if v == "0":
        return False
    if jnp.issubdtype(jnp.dtype(dtype), jnp.complexfloating):
        return False
    from ..ops.pallas.contract import pallas_supported

    if not pallas_supported(plan, C):
        return False
    if v == "1":
        return True
    import jax as _jax

    return _jax.default_backend() == "tpu"


def _spread_tiles_local(plan, x, pos, tid, NT: int):
    if _use_pallas_shard(plan, x.shape[1], x.dtype):
        return dense_tiles_local(NT, plan, x, pos, tid)
    return _dense_tiles_xla(plan, x, pos, 1, tid=tid, NT=NT)


def _gather_points_local(plan, tiles, pos, tid, NT: int):
    if _use_pallas_shard(plan, tiles.shape[1], tiles.dtype):
        return points_from_tiles_local(NT, plan, tiles, pos, tid)
    return _points_from_tiles_xla(plan, tiles, pos, tid=tid)


def _local_tile_ids(plan: BinnedPlan, A0_loc: int, shard_idx):
    """Dense tile id per plan row RELATIVE to this shard's slab:
    ((t0 - shard*A0_loc) * nb + t1) * ... — valid because every real row's t0
    lies inside the slab (the layout partitioned points by slab)."""
    nb = plan.M // plan.T
    t = plan.origin // plan.T  # (S, dim)
    tid = jnp.clip(t[:, 0] - shard_idx * A0_loc, 0, A0_loc - 1)
    for d in range(1, plan.dim):
        tid = tid * nb + t[:, d]
    return tid.astype(jnp.int32)


# ---------------------------------------------------------------------------
# Axis-0 no-wrap fold / unfold (the halo crosses shards instead of wrapping)
# ---------------------------------------------------------------------------


def _pair_fold_nowrap(a, T: int, H: int, L: int, E: int):
    """(P, nb, H, Z, W) -> (P, L + T, Z, W) overlap-add with NO periodic
    wrap: cells [L, L+E) hold the spill for the next slab. Elementwise add +
    concat of static slices (the scatter/pad-roll formulations measure 2-3x
    slower; see tilefold._pair_fold)."""
    Pp, nb, _, Z, W = a.shape
    body_e = jax.lax.slice_in_dim(a, 0, E, axis=2)
    body_rest = jax.lax.slice_in_dim(a, E, T, axis=2)
    tail = jax.lax.slice_in_dim(a, T, H, axis=2)
    # block b's first E cells receive block b-1's tail (no wrap: block 0
    # receives nothing; the last tail becomes the spill block)
    shifted = jnp.pad(tail, ((0, 0), (1, 0), (0, 0), (0, 0), (0, 0)))[:, :nb]
    merged = body_e + shifted
    out = jnp.concatenate([merged, body_rest], axis=2).reshape(Pp, L, Z, W)
    spill = jnp.pad(
        tail[:, nb - 1], ((0, 0), (0, T - E), (0, 0), (0, 0))
    )  # (P, T, Z, W)
    return jnp.concatenate([out, spill], axis=1)


def _pair_unfold_nowrap(g_ext, T: int, H: int, L: int, E: int, nb: int):
    """(P, L+E, Z, W) slab extended with the next shard's first E cells ->
    (P, nb, H, Z, W) halo tiles (no wrap: tails read the extension)."""
    Pp, _, Z, W = g_ext.shape
    g_pad = jnp.pad(g_ext, ((0, 0), (0, T - E), (0, 0), (0, 0)))  # L+T
    body = jax.lax.slice_in_dim(g_pad, 0, L, axis=1).reshape(Pp, nb, T, Z, W)
    tail = jax.lax.slice_in_dim(g_pad, T, T + L, axis=1).reshape(Pp, nb, T, Z, W)
    tail = jax.lax.slice_in_dim(tail, 0, E, axis=2)
    return jnp.concatenate([body, tail], axis=2)


def _fold_dft_slab(tiles_dense, plan, C: int, A0_loc: int, axis_name,
                   n_shards: int):
    """Local dense tiles (NT_loc, C*H^dim) -> local DFT-layout grid slab
    (1, M, ..., C, L0_loc); ONE ppermute moves the axis-0 spill."""
    dim, T, H, M, nb, E = _geom(plan)
    L0 = A0_loc * T
    perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]

    if dim == 2:
        # (A0_loc, A1, C, H0, H1) -> pair 0 no-wrap, ppermute, pair 1 local
        a = tiles_dense.reshape(1, A0_loc, nb * C, H, H)
        a = a.transpose(0, 1, 3, 2, 4)  # (1, A0, H0, Z0=nb*C, W0=H1)
        g = _pair_fold_nowrap(a, T, H, L0, E)  # (1, L0+T, Z0, W0)
        body = jax.lax.slice_in_dim(g, 0, L0, axis=1)
        spill = jax.lax.slice_in_dim(g, L0, L0 + E, axis=1)
        recv = jax.lax.ppermute(spill, axis_name, perm)
        body = jnp.concatenate(
            [body[:, :E] + recv, body[:, E:]], axis=1
        )
        g = body.transpose(0, 2, 3, 1)  # (1, Z0, W0, L0)
        a = g.reshape(1, nb, C, H, L0).transpose(0, 1, 3, 2, 4)
        g = _pair_fold(a, T, H, M, E)  # (1, M, C, L0)
        return g.reshape(1, M, C, L0)

    # dim == 3 (layout-careful; mirrors tilefold._fold3_dft)
    a = tiles_dense.reshape(1, A0_loc, nb * nb * C, H, H * H)
    a = a.transpose(0, 1, 3, 2, 4)
    g = _pair_fold_nowrap(a, T, H, L0, E)  # (1, L0+T, Z0, W0)
    body = jax.lax.slice_in_dim(g, 0, L0, axis=1)
    spill = jax.lax.slice_in_dim(g, L0, L0 + E, axis=1)
    recv = jax.lax.ppermute(spill, axis_name, perm)
    body = jnp.concatenate([body[:, :E] + recv, body[:, E:]], axis=1)
    g = body.transpose(0, 2, 3, 1)  # (1, Z0, W0, L0): minor L0
    a = g.reshape(1, nb, nb * C, H, H * L0).transpose(0, 1, 3, 2, 4)
    g = _pair_fold(a, T, H, M, E)  # (1, M1, A2*C, H2*L0)
    a = g.reshape(M, nb, C, H, L0).transpose(0, 1, 3, 2, 4)
    g = _pair_fold(a, T, H, M, E)  # (M1, M2, C, L0)
    return g.reshape(1, M, M, C, L0)


def _unfold_dft_slab(g_dft, plan, C: int, A0_loc: int, axis_name,
                     n_shards: int):
    """Local DFT-layout slab -> local dense halo tiles (NT_loc, C, H, H^{dim-1});
    ONE reverse ppermute brings the next slab's first E cells."""
    dim, T, H, M, nb, E = _geom(plan)
    L0 = A0_loc * T
    perm = [(i, (i - 1) % n_shards) for i in range(n_shards)]

    if dim == 2:
        a = _pair_unfold(g_dft.reshape(1, M, C, L0), T, H, M, E, nb)
        a = a.transpose(0, 1, 3, 2, 4)  # (1, A1, C, H1, L0)
        a = a.reshape(1, nb * C, H, L0).transpose(0, 3, 1, 2)  # (1, L0, Z, W)
        recv = jax.lax.ppermute(
            jax.lax.slice_in_dim(a, 0, E, axis=1), axis_name, perm
        )
        ext = jnp.concatenate([a, recv], axis=1)  # (1, L0+E, Z, W)
        a = _pair_unfold_nowrap(ext, T, H, L0, E, A0_loc)  # (1, A0, H0, Z, W)
        a = a.transpose(0, 1, 3, 2, 4)  # (1, A0, Z=(A1*C), H0, W=H1)
        return a.reshape(A0_loc * nb, C, H, H)

    # dim == 3 (mirrors tilefold.unfold_grid_to_tiles_dft)
    a = _pair_unfold(g_dft.reshape(M, M, C, L0), T, H, M, E, nb)  # pair 2
    a = a.transpose(0, 1, 3, 2, 4)  # (M1, A2, C, H2, L0)
    a = _pair_unfold(a.reshape(1, M, nb * C * H, L0), T, H, M, E, nb)  # pair 1
    a = a.reshape(1, nb, H, nb * C, H, L0)
    a = a.transpose(0, 1, 3, 2, 4, 5)  # (1, A1, A2*C, H1, H2, L0)
    a = a.reshape(1, nb * nb * C, H * H, L0)
    a = a.transpose(0, 3, 1, 2)  # (1, L0, Z0, W0)
    recv = jax.lax.ppermute(
        jax.lax.slice_in_dim(a, 0, E, axis=1), axis_name, perm
    )
    ext = jnp.concatenate([a, recv], axis=1)  # (1, L0+E, Z0, W0)
    a = _pair_unfold_nowrap(ext, T, H, L0, E, A0_loc)  # (1, A0, H0, Z0, W0)
    a = a.transpose(0, 1, 3, 2, 4)  # (1, A0, Z0, H0, W0)
    return a.reshape(A0_loc * nb * nb, C, H, H * H)


# ---------------------------------------------------------------------------
# Axis-0-sharded pruned spectral stages (mirrors parallel/sharded.py's
# axis-1-sharded pair, for the slab layout the sharded fold produces)
# ---------------------------------------------------------------------------


def spectral_adjoint_pruned_dft_sharded0(
    gr, gi, dim, N, m, sigma, axis_name, M, cells=None, window="gaussian"
):
    """Adjoint spectral stage for a grid sharded on AXIS 0 (the minor L0 axis
    of the DFT layout). Local row-block contraction + one psum; gi may be
    None. Returns the replicated planar spectrum (B, (N,)*dim, C)."""
    spec = _cells_spec(dim, M, cells)
    off0, L0 = spec[0]
    L0_loc = gr.shape[-1]
    if L0 % L0_loc:
        raise ValueError(
            f"local slab length {L0_loc} does not divide axis length {L0}"
        )
    idx = jax.lax.axis_index(axis_name)
    cr, ci = _pruned_mats_np(N, M, m, float(sigma), +1, off0, L0, window)
    mr = jax.lax.dynamic_slice_in_dim(jnp.asarray(cr), idx * L0_loc, L0_loc, 0)
    mi = jax.lax.dynamic_slice_in_dim(jnp.asarray(ci), idx * L0_loc, L0_loc, 0)
    ax = gr.ndim - 1
    rr = _axis_contract(gr, mr, ax)
    ri = _axis_contract(gr, mi, ax)
    if gi is not None:
        rr = rr - _axis_contract(gi, mi, ax)
        ri = ri + _axis_contract(gi, mr, ax)
    gr, gi = rr, ri
    for d in range(1, dim):
        off, L = spec[d]
        crd, cid = _pruned_mats_np(N, M, m, float(sigma), +1, off, L, window)
        mrd, mid = jnp.asarray(crd), jnp.asarray(cid)
        rr = _axis_contract(gr, mrd, d) - _axis_contract(gi, mid, d)
        ri = _axis_contract(gr, mid, d) + _axis_contract(gi, mrd, d)
        gr, gi = rr, ri
    gr = jax.lax.psum(gr, axis_name)
    gi = jax.lax.psum(gi, axis_name)
    perm = [0, gr.ndim - 1] + list(range(1, gr.ndim - 1))
    return gr.transpose(perm), gi.transpose(perm)


def spectral_forward_pruned_dft_sharded0(
    xr, xi, dim, M, m, sigma, axis_name, n_shards, cells=None,
    real_only=False, window="gaussian",
):
    """Forward spectral stage producing this shard's AXIS-0 grid slab from
    the replicated spectrum — fully local, zero collectives. ``real_only``
    as in ops/fft.py:spectral_forward_pruned_dft."""
    N = xr.shape[1]
    spec = _cells_spec(dim, M, cells)
    off0, L0 = spec[0]
    if L0 % n_shards:
        raise ValueError(f"L0={L0} not divisible by n_shards={n_shards}")
    L0_loc = L0 // n_shards
    idx = jax.lax.axis_index(axis_name)

    perm = [0] + list(range(2, dim + 2)) + [1]
    xr = xr.transpose(perm)
    xi = None if xi is None else xi.transpose(perm)

    cr, ci = _pruned_mats_np(N, M, m, float(sigma), -1, off0, L0, window)
    mr_f = jnp.asarray(np.ascontiguousarray(cr.T))  # (N, L0)
    mi_f = jnp.asarray(np.ascontiguousarray(ci.T))
    mr = jax.lax.dynamic_slice_in_dim(mr_f, idx * L0_loc, L0_loc, 1)
    mi = jax.lax.dynamic_slice_in_dim(mi_f, idx * L0_loc, L0_loc, 1)

    def mats(d):
        off, L = spec[d]
        crd, cid = _pruned_mats_np(N, M, m, float(sigma), -1, off, L, window)
        return (
            jnp.asarray(np.ascontiguousarray(crd.T)),
            jnp.asarray(np.ascontiguousarray(cid.T)),
        )

    def cx(ar, ai, mrd, mid, ax, drop_imag=False):
        rr = _axis_contract(ar, mrd, ax)
        if ai is not None:
            rr = rr - _axis_contract(ai, mid, ax)
        if drop_imag:
            return rr, None
        ri = _axis_contract(ar, mid, ax)
        if ai is not None:
            ri = ri + _axis_contract(ai, mrd, ax)
        return rr, ri

    xr, xi = cx(xr, xi, mr, mi, xr.ndim - 1, real_only and dim == 1)
    for d in range(1, dim):
        xr, xi = cx(xr, xi, *mats(d), d, real_only and d == dim - 1)
    return xr, xi


# ---------------------------------------------------------------------------
# Public transforms
# ---------------------------------------------------------------------------


def _pack_values(x, layout: GridShardedLayout):
    """(n, C) user-order values -> (P, n_loc, C) slab order; padded slots 0."""
    xp = jnp.concatenate([x, jnp.zeros((1, x.shape[1]), x.dtype)], axis=0)
    return jnp.take(xp, layout.point_index.reshape(-1), axis=0).reshape(
        layout.n_shards, -1, x.shape[1]
    )


def nfft_adjoint_grid_sharded(
    x, layout: GridShardedLayout, mesh, *, axis_name: str = "grid"
):
    """Grid-sharded adjoint NFFT of real samples, planar output.

    x: (n, C) real, user point order (matching the ``pos`` the layout was
    built from). Returns (yr, yi) each (1, (N,)*dim, C), replicated over the
    mesh axis. One ppermute (halo) + one psum (spectrum) total.
    """
    x = jnp.asarray(x, jnp.float32)
    lay = layout
    N, m, sigma, dim = lay.N, lay.m, lay.sigma, lay.dim
    M = int(round(sigma * N))
    C = x.shape[1]
    xs = _pack_values(x, lay)
    n_shards = lay.n_shards

    def body(xs_l, pos_l, plans_l):
        plan = squeeze_plan(plans_l)
        idx = jax.lax.axis_index(axis_name)
        tid = _local_tile_ids(plan, lay.A0_loc, idx)
        nb = M // lay.T
        NT = lay.A0_loc * nb ** (dim - 1)
        tiles = _spread_tiles_local(
            plan, xs_l[0], pos_l[0].astype(jnp.float32), tid, NT
        )
        g_slab = _fold_dft_slab(tiles, plan, C, lay.A0_loc, axis_name, n_shards)
        yr, yi = spectral_adjoint_pruned_dft_sharded0(
            g_slab, None, dim, N, m, sigma, axis_name, M, window=lay.window
        )
        return yr, yi

    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(axis_name), P(axis_name), P(axis_name)),
        out_specs=(P(), P()),
    )
    return jax.jit(fn)(xs, lay.pos_stack, lay.plans)


def nfft_forward_grid_sharded(
    xr, xi, layout: GridShardedLayout, mesh, *, axis_name: str = "grid",
    real_output: bool = False,
):
    """Grid-sharded forward NFFT of a planar spectrum.

    xr/xi: (1, (N,)*dim, C) planes (xi may be None; replicated). Returns
    (yr, yi) each (n, C) in user point order (yi None with real_output).
    Zero collectives except the halo ppermute.
    """
    lay = layout
    N, m, sigma, dim = lay.N, lay.m, lay.sigma, lay.dim
    M = int(round(sigma * N))
    C = xr.shape[-1]
    n_shards = lay.n_shards

    def body(xr_r, xi_r, pos_l, plans_l):
        plan = squeeze_plan(plans_l)
        idx = jax.lax.axis_index(axis_name)
        tid = _local_tile_ids(plan, lay.A0_loc, idx)
        gr, gi = spectral_forward_pruned_dft_sharded0(
            xr_r, xi_r, dim, M, m, sigma, axis_name, n_shards,
            real_only=real_output, window=lay.window,
        )
        outs = []
        for g in (gr,) if real_output else (gr, gi):
            tiles = _unfold_dft_slab(
                g[0] if dim == 3 else g, plan, C, lay.A0_loc, axis_name,
                n_shards,
            )
            NT_t = tiles.shape[0]
            outs.append(
                _gather_points_local(
                    plan, tiles, pos_l[0].astype(jnp.float32), tid, NT_t
                )
            )
        if real_output:
            return outs[0][None], outs[0][None]
        return outs[0][None], outs[1][None]

    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(), P(axis_name), P(axis_name)),
        out_specs=(P(axis_name), P(axis_name)),
    )
    yr_s, yi_s = jax.jit(fn)(
        xr, xi if xi is not None else jnp.zeros_like(xr), lay.pos_stack,
        lay.plans,
    )

    def unpack(ys):
        flat = ys.reshape(-1, C)
        out = jnp.zeros((lay.n, C), flat.dtype)
        return out.at[lay.point_index.reshape(-1)].set(
            flat, mode="drop", unique_indices=True
        )

    yr = unpack(yr_s)
    return (yr, None) if real_output else (yr, unpack(yi_s))


def nfft_fastsum_grid_sharded(
    x, coeffs, layout: GridShardedLayout, mesh, *, axis_name: str = "grid"
):
    """Grid-sharded fastsum (Gram-matrix matvec) for real samples and real
    even coefficients: adjoint spread -> band filter on the replicated
    N^dim spectrum -> forward gather, every grid-sized stage on one slab
    per chip. Symmetric sources == targets (the layout's point set); two
    ppermutes + one psum total. Returns y (n, C) real.

    Reference pipeline: ``nfft_fastsum_cuda`` (core_cuda.cu:535-852) with
    the band filter of spectral_window_operations.cu:269-402 — here the
    phi_hat_inv^2 factor rides inside the two pruned DFT matrices and
    ``coeffs`` multiplies the centered band directly (see
    ops/planar.py:nfft_fastsum_real).
    """
    x = jnp.asarray(x, jnp.float32)
    coeffs = jnp.asarray(coeffs, jnp.float32)
    lay = layout
    N, m, sigma, dim = lay.N, lay.m, lay.sigma, lay.dim
    M = int(round(sigma * N))
    C = x.shape[1]
    xs = _pack_values(x, lay)
    n_shards = lay.n_shards

    def body(xs_l, coeffs_r, pos_l, plans_l):
        plan = squeeze_plan(plans_l)
        idx = jax.lax.axis_index(axis_name)
        tid = _local_tile_ids(plan, lay.A0_loc, idx)
        nb = M // lay.T
        NT = lay.A0_loc * nb ** (dim - 1)
        pos32 = pos_l[0].astype(jnp.float32)
        tiles = _spread_tiles_local(plan, xs_l[0], pos32, tid, NT)
        g_slab = _fold_dft_slab(tiles, plan, C, lay.A0_loc, axis_name, n_shards)
        sr, si = spectral_adjoint_pruned_dft_sharded0(
            g_slab, None, dim, N, m, sigma, axis_name, M, window=lay.window
        )
        cf = coeffs_r[None, ..., None]
        sr = sr * cf
        si = si * cf
        gr, _ = spectral_forward_pruned_dft_sharded0(
            sr, si, dim, M, m, sigma, axis_name, n_shards, real_only=True,
            window=lay.window,
        )
        tiles2 = _unfold_dft_slab(
            gr[0] if dim == 3 else gr, plan, C, lay.A0_loc, axis_name,
            n_shards,
        )
        y = _gather_points_local(plan, tiles2, pos32, tid, tiles2.shape[0])
        return y[None]

    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(axis_name), P(), P(axis_name), P(axis_name)),
        out_specs=P(axis_name),
    )
    ys = jax.jit(fn)(xs, coeffs, lay.pos_stack, lay.plans)
    flat = ys.reshape(-1, C)
    out = jnp.zeros((lay.n, C), flat.dtype)
    return out.at[lay.point_index.reshape(-1)].set(
        flat, mode="drop", unique_indices=True
    )
