"""shard_map implementations of the three transforms.

Communication pattern (the TPU-native answer to the reference's atomicAdd
scatter into one shared grid, ``csrc/cuda/spatial_window_operations.cu:156``):

* **adjoint**: every chip spreads its local point shard into a local
  oversampled grid, then ONE ``lax.psum`` over the point axis reduces the
  grids over ICI; FFT + rolloff run replicated (cheap relative to spreading
  at large n) so the spectral output is replicated.
* **forward**: the spectral input is replicated; embed + FFT run replicated
  and the window gather is purely local — zero collectives.
* **fastsum**: spread(local) -> psum -> IFFT -> band filter -> FFT ->
  gather(local); again one psum total.

The optional column axis shards trailing coefficient columns with zero
communication (independent signals, ``core_cuda.cu:84`` semantics).

All functions require the local point count to be equal on every chip: pad
``pos``/``x`` with zero-weight points if n is not divisible (spreading a zero
adds nothing; padded forward outputs are sliced away by the caller).
"""

from __future__ import annotations

import math

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..ops.nfft import _complex_dtype_for
from ..ops.window import DEFAULT_SIGMA, DEFAULT_WINDOW
from ..ops.plan_stack import squeeze_plan
from ..ops.spectral import (
    apply_phi_hat_inv,
    centered_crop,
    centered_embed,
    fastsum_band_filter,
)
from ..ops.spread_gather import gather, spread

__all__ = [
    "nfft_adjoint_sharded",
    "nfft_forward_sharded",
    "nfft_fastsum_sharded",
    "fastsum_local",
    "build_sharded_plans",
]

# NB: keep check_vma ON here — these transforms are differentiated (the
# training loop), and with the checker off jax transposes lax.psum to
# another psum instead of identity, inflating gradients by the axis size.
shard_map = jax.shard_map


def _check_plans_geometry(plans, N, m, sigma, window, what="plans"):
    """Same contract as ``ops/nfft.py:_check_plan`` for the sharded entry
    points: a plan whose window geometry disagrees with the transform's
    would spread with one window and deconvolve with the other — silently
    wrong — so fail loudly. Point-count/fingerprint checks don't apply here
    (stacked plans carry per-shard n against a global pos)."""
    if plans is None:
        return
    if (
        (plans.N, plans.m) != (int(N), int(m))
        or plans.sigma != float(sigma)
        or plans.window != window
    ):
        raise ValueError(
            f"{what} were built for (N={plans.N}, m={plans.m}, "
            f"sigma={plans.sigma}, window={plans.window!r}) but the "
            f"transform uses (N={int(N)}, m={int(m)}, sigma={float(sigma)}, "
            f"window={window!r}) — rebuild with build_sharded_plans(..., "
            "matching window/sigma) or pass the matching window= here"
        )


def build_sharded_plans(
    pos,
    batch=None,
    *,
    n_shards: int,
    N: int,
    m: int,
    sigma: float = DEFAULT_SIGMA,
    batch_size: int | None = None,
    window: str = DEFAULT_WINDOW,
):
    """Per-shard binned plans for the sharded transforms.

    Under ``shard_map`` positions are traced, so the transforms cannot build
    plans themselves and would degrade to XLA scatter — exactly where scale
    matters most. This builds one plan per contiguous point shard (matching
    the default axis-0 sharding that ``pad_points`` + a P(points_axis) spec
    produce) and stacks them; pass the result as ``plans=`` to the sharded
    transforms, which slice their member inside the shard_map body.

    ``pos`` (n, dim) must divide evenly into ``n_shards`` (use
    :func:`~torch_nfft_tpu.parallel.pad_points` first). The per-shard plans
    carry the *global* batch indices, so every shard spreads into the right
    grid rows before the psum.
    """
    pos = np.asarray(pos)
    n = pos.shape[0]
    if n % n_shards:
        raise ValueError(f"n={n} not divisible by n_shards={n_shards}; pad_points first")
    n_loc = n // n_shards
    if batch is None:
        batch = np.zeros((n,), np.int32)
        batch_size = 1 if batch_size is None else batch_size
    batch = np.asarray(batch, np.int32)
    if batch_size is None:
        batch_size = int(batch[-1]) + 1

    from ..ops.binned import build_plan
    from ..ops.plan_stack import pad_plan_rows, stack_plans

    plans, K, T = [], None, None
    for s in range(n_shards):
        sl = slice(s * n_loc, (s + 1) * n_loc)
        p = build_plan(
            pos[sl], batch[sl], N=N, m=m, sigma=sigma, batch_size=batch_size,
            T=T, K=K, window=window,
        )
        if K is None:
            K, T = p.K, p.T
        plans.append(p)
    S_max = max(p.slot_pt.shape[0] for p in plans)
    return stack_plans([pad_plan_rows(p, S_max) for p in plans])


def fastsum_local(
    xf,
    sources,
    source_batch,
    targets,
    target_batch,
    coeffs,
    *,
    batch_size,
    N,
    m,
    sigma=DEFAULT_SIGMA,
    window=DEFAULT_WINDOW,
    strategy="auto",
    points_axis=None,
    cdtype=None,
    source_plan=None,
    target_plan=None,
):
    """Per-shard fastsum body: spread(local) -> [psum] -> IFFT -> band filter
    -> FFT -> gather(local). Callable inside any shard_map (pass
    ``points_axis``) or standalone single-device (``points_axis=None``).
    Shapes: xf (n_src, C), sources/targets (n, dim), returns (n_tgt, C).
    """
    _check_plans_geometry(source_plan, N, m, sigma, window, what="source_plan")
    _check_plans_geometry(target_plan, N, m, sigma, window, what="target_plan")
    n_src, dim = sources.shape
    M = int(round(sigma * N))
    C = xf.shape[1]

    from ..ops.nfft import _complex_ok

    if not (jnp.issubdtype(xf.dtype, jnp.complexfloating) or _complex_ok()):
        # Complex-free backend (e.g. the axon TPU runtime): the planar
        # pipeline. The ONE psum moves the REAL oversampled grid (half the
        # complex payload); the DFTs run as planar matmuls. Exact for real
        # samples with real even coefficients (Gaussian kernels) — the same
        # contract as ops/planar.py:nfft_fastsum_real.
        from ..ops.fft import fftn_planar

        axes = tuple(range(1, dim + 1))
        g = spread(
            xf, sources, source_batch, batch_size, N, m, sigma, strategy,
            plan=source_plan, window=window,
        )
        if points_axis is not None:
            g = jax.lax.psum(g, points_axis)
        g = g.reshape((batch_size,) + (M,) * dim + (C,))
        gr, gi = fftn_planar(g, None, axes=axes, sign=+1)
        filt = fastsum_band_filter(coeffs, N, m, M, sigma, window=window)[None, ..., None]
        gr = gr * filt
        gi = gi * filt
        gr, _ = fftn_planar(gr, gi, axes=axes, sign=-1)
        return gather(
            gr.reshape(batch_size * M**dim, C), targets, target_batch,
            batch_size, N, m, sigma, strategy, plan=target_plan, window=window,
        )

    if cdtype is None:
        cdtype = jnp.result_type(_complex_dtype_for(xf), _complex_dtype_for(coeffs))

    g = spread(xf, sources, source_batch, batch_size, N, m, sigma, strategy,
               plan=source_plan, window=window)
    if points_axis is not None:
        g = jax.lax.psum(g, points_axis)
    g = g.reshape((batch_size,) + (M,) * dim + (C,))
    g_hat = jnp.fft.ifftn(g.astype(cdtype), axes=tuple(range(1, dim + 1)), norm="forward")
    filt = fastsum_band_filter(coeffs, N, m, M, sigma, window=window)
    g_hat = g_hat * filt[None, ..., None].astype(cdtype)
    g2 = jnp.fft.fftn(g_hat, axes=tuple(range(1, dim + 1)))
    g2_flat = g2.reshape(batch_size * M**dim, C)
    y = gather(g2_flat, targets, target_batch, batch_size, N, m, sigma, strategy,
               plan=target_plan, window=window)
    if not jnp.issubdtype(xf.dtype, jnp.complexfloating):
        y = y.real
    return y


def _col_spec(ndim_trailing: int, cols_axis):
    """PartitionSpec entries for the trailing column dims (first one sharded)."""
    if ndim_trailing == 0:
        return ()
    return (cols_axis,) + (None,) * (ndim_trailing - 1)


def nfft_adjoint_sharded(
    x,
    pos,
    batch=None,
    bandwidth=16,
    cutoff=3,
    real_output=False,
    *,
    mesh,
    points_axis="points",
    cols_axis=None,
    batch_size=None,
    sigma=DEFAULT_SIGMA,
    window=DEFAULT_WINDOW,
    strategy="auto",
    plans=None,
):
    """Multi-chip adjoint NFFT. Points sharded over ``points_axis``; the
    (batch, N^dim, cols) spectrum is returned replicated over that axis.
    Pass ``plans=`` from :func:`build_sharded_plans` to run the fast binned
    engine per shard instead of XLA scatter.
    """
    N, m = int(bandwidth), int(cutoff)
    _check_plans_geometry(plans, N, m, sigma, window)
    x = jnp.asarray(x)
    pos = jnp.asarray(pos)
    n, dim = pos.shape
    if batch is None:
        batch = jnp.zeros((n,), jnp.int32)
        batch_size = 1 if batch_size is None else batch_size
    batch = jnp.asarray(batch, jnp.int32)
    if batch_size is None:
        batch_size = int(batch[-1]) + 1
    M = int(round(sigma * N))
    trailing = x.shape[1:]
    C = math.prod(trailing) if trailing else 1
    xf = x.reshape(n, C)

    def local(xf, pos, batch, plans):
        plan = None if plans is None else squeeze_plan(plans)
        g = spread(xf, pos, batch, batch_size, N, m, sigma, strategy, plan=plan,
                   window=window)
        g = jax.lax.psum(g, points_axis)
        g = g.reshape((batch_size,) + (M,) * dim + (C,))
        g_hat = jnp.fft.ifftn(
            g.astype(_complex_dtype_for(x)),
            axes=tuple(range(1, dim + 1)),
            norm="forward",
        )
        y = centered_crop(g_hat, dim, N, spatial_axis0=1)
        y = apply_phi_hat_inv(y, dim, N, m, sigma, spatial_axis0=1, window=window)
        return y.real if real_output else y

    cspec = (cols_axis,)
    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(points_axis, *cspec),
            P(points_axis, None),
            P(points_axis),
            P(points_axis),
        ),
        out_specs=P(None, *([None] * dim), *cspec),
    )
    y = jax.jit(fn)(xf, pos, batch, plans)
    return y.reshape((batch_size,) + (N,) * dim + trailing)


def nfft_forward_sharded(
    x,
    pos,
    batch=None,
    cutoff=3,
    real_output=False,
    *,
    mesh,
    points_axis="points",
    cols_axis=None,
    batch_size=None,
    sigma=DEFAULT_SIGMA,
    window=DEFAULT_WINDOW,
    strategy="auto",
    plans=None,
):
    """Multi-chip forward NFFT. The spectral input is replicated over the
    point axis; the per-point output comes back sharded over it.
    ``plans=`` from :func:`build_sharded_plans` enables the binned engine.
    """
    m = int(cutoff)
    x = jnp.asarray(x)
    pos = jnp.asarray(pos)
    n, dim = pos.shape
    N = x.shape[1]
    _check_plans_geometry(plans, N, m, sigma, window)
    M = int(round(sigma * N))
    if batch is None:
        batch = jnp.zeros((n,), jnp.int32)
    batch = jnp.asarray(batch, jnp.int32)
    batch_size = x.shape[0] if batch_size is None else batch_size
    trailing = x.shape[1 + dim :]
    C = math.prod(trailing) if trailing else 1
    xc = x.reshape((batch_size,) + (N,) * dim + (C,)).astype(_complex_dtype_for(x))

    def local(xc, pos, batch, plans):
        plan = None if plans is None else squeeze_plan(plans)
        xw = apply_phi_hat_inv(xc, dim, N, m, sigma, spatial_axis0=1, window=window)
        g_hat = centered_embed(xw, dim, N, M, spatial_axis0=1)
        g = jnp.fft.fftn(g_hat, axes=tuple(range(1, dim + 1)))
        g_flat = g.reshape(batch_size * M**dim, C)
        y = gather(g_flat, pos, batch, batch_size, N, m, sigma, strategy, plan=plan,
                   window=window)
        return y.real if real_output else y

    cspec = (cols_axis,)
    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(None, *([None] * dim), *cspec),
            P(points_axis, None),
            P(points_axis),
            P(points_axis),
        ),
        out_specs=P(points_axis, *cspec),
    )
    y = jax.jit(fn)(xc, pos, batch, plans)
    return y.reshape((n,) + trailing)


def nfft_fastsum_sharded(
    x,
    coeffs,
    sources,
    targets=None,
    source_batch=None,
    target_batch=None,
    /,
    batch=None,
    cutoff=3,
    *,
    mesh,
    points_axis="points",
    cols_axis=None,
    batch_size=None,
    sigma=DEFAULT_SIGMA,
    window=DEFAULT_WINDOW,
    strategy="auto",
    source_plans=None,
    target_plans=None,
):
    """Multi-chip fastsum: sources and targets both sharded over the point
    axis, one psum of the oversampled grid in between. ``source_plans=`` /
    ``target_plans=`` from :func:`build_sharded_plans` enable the binned
    engine per shard.
    """
    m = int(cutoff)
    x = jnp.asarray(x)
    coeffs = jnp.asarray(coeffs)
    sources = jnp.asarray(sources)
    if targets is None:
        targets = sources
        target_batch = source_batch
    targets = jnp.asarray(targets)
    if batch is not None:
        source_batch = batch
        target_batch = batch
    n_src, dim = sources.shape
    n_tgt = targets.shape[0]
    if source_batch is None:
        source_batch = jnp.zeros((n_src,), jnp.int32)
        target_batch = jnp.zeros((n_tgt,), jnp.int32)
        batch_size = 1 if batch_size is None else batch_size
    source_batch = jnp.asarray(source_batch, jnp.int32)
    target_batch = jnp.asarray(target_batch, jnp.int32)
    if batch_size is None:
        batch_size = int(source_batch[-1]) + 1
    N = coeffs.shape[0]
    _check_plans_geometry(source_plans, N, m, sigma, window, what="source_plans")
    _check_plans_geometry(target_plans, N, m, sigma, window, what="target_plans")
    M = int(round(sigma * N))
    trailing = x.shape[1:]
    C = math.prod(trailing) if trailing else 1
    xf = x.reshape(n_src, C)
    cdtype = jnp.result_type(_complex_dtype_for(x), _complex_dtype_for(coeffs))

    def local(xf, sources, source_batch, targets, target_batch, coeffs, sp, tp):
        return fastsum_local(
            xf,
            sources,
            source_batch,
            targets,
            target_batch,
            coeffs,
            batch_size=batch_size,
            N=N,
            m=m,
            sigma=sigma,
            window=window,
            strategy=strategy,
            points_axis=points_axis,
            cdtype=cdtype,
            source_plan=None if sp is None else squeeze_plan(sp),
            target_plan=None if tp is None else squeeze_plan(tp),
        )

    cspec = (cols_axis,)
    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(points_axis, *cspec),
            P(points_axis, None),
            P(points_axis),
            P(points_axis, None),
            P(points_axis),
            P(*([None] * dim)),
            P(points_axis),
            P(points_axis),
        ),
        out_specs=P(points_axis, *cspec),
    )
    y = jax.jit(fn)(
        xf, sources, source_batch, targets, target_batch, coeffs,
        source_plans, target_plans,
    )
    return y.reshape((n_tgt,) + trailing)


# ---------------------------------------------------------------------------
# Grid-sharded spectral transforms (the SURVEY section-5 "sharded FFT for
# large N^dim" answer): the pruned band-limited DFT (ops/fft.py) is per-axis
# matmuls, so sharding the grid's M_1 axis across chips turns the adjoint
# spectral stage into local contractions plus ONE psum of the (small) N^dim
# spectrum, and the forward stage into fully local slab contractions with no
# collective at all. One chip never holds more than its grid slab.
# ---------------------------------------------------------------------------


def _axis_contract_local(x, mat, ax):
    from ..ops.fft import _axis_contract

    return _axis_contract(x, mat, ax)


def spectral_adjoint_pruned_dft_sharded(
    gr, gi, dim, N, m, sigma, axis_name, M, cells=None, window=DEFAULT_WINDOW
):
    """Adjoint spectral stage on a grid slab, inside a shard_map.

    gr/gi: the LOCAL slab of the DFT-layout grid (B, L1/P, ..., C, L0),
    sharded over grid axis 1 (the M_1 axis) on mesh axis ``axis_name``;
    gi may be None. Returns the REPLICATED centered spectrum
    (B, (N,)*dim, C) after one psum per plane. ``cells`` as in
    ops/fft.py:spectral_adjoint_pruned_dft (the sharded axis's spec refers
    to the full axis; each chip slices its row block by axis_index).

    Preconditions: ``dim >= 2`` (grid sharding targets multi-axis grids —
    there is no M_1 axis at dim 1) and the sharded axis length must divide
    evenly into equal per-chip row blocks (each chip slices its block at
    ``axis_index * local_len``; a remainder would leave trailing rows of the
    full-axis matrix uncontracted).
    """
    from ..ops.fft import _cells_spec, _pruned_mats_np

    if dim < 2:
        raise ValueError(
            f"grid-sharded spectral transforms need dim >= 2 (got dim={dim}):"
            " they shard the grid's M_1 axis, which a 1D grid does not have"
        )
    spec = _cells_spec(dim, M, cells)

    def mats_for(d):
        off, L = spec[d]
        cr, ci = _pruned_mats_np(N, M, m, float(sigma), +1, off, L, window)
        return jnp.asarray(cr), jnp.asarray(ci)

    # local axes first: M0 (last axis) then M2.. shrink to N
    mr0, mi0 = mats_for(0)
    rr = _axis_contract_local(gr, mr0, gr.ndim - 1)
    ri = _axis_contract_local(gr, mi0, gr.ndim - 1)
    if gi is not None:
        rr = rr - _axis_contract_local(gi, mi0, gi.ndim - 1)
        ri = ri + _axis_contract_local(gi, mr0, gi.ndim - 1)
    gr, gi = rr, ri
    for d in range(2, dim):
        mrd, mid = mats_for(d)
        rr = _axis_contract_local(gr, mrd, d)
        ri2 = _axis_contract_local(gr, mid, d)
        ir = _axis_contract_local(gi, mrd, d)
        ii = _axis_contract_local(gi, mid, d)
        gr, gi = rr - ii, ri2 + ir

    # sharded M1 axis: contract the LOCAL row block of the full matrix,
    # then one psum completes the sum over grid cells.
    mr1_full, mi1_full = mats_for(1)
    L1_loc = gr.shape[1]
    if mr1_full.shape[0] % L1_loc:
        raise ValueError(
            f"local slab rows {L1_loc} do not evenly divide the full sharded "
            f"axis length {mr1_full.shape[0]} — equal per-chip row blocks are "
            "required (a remainder would drop trailing grid rows)"
        )
    idx = jax.lax.axis_index(axis_name)
    mr1 = jax.lax.dynamic_slice_in_dim(mr1_full, idx * L1_loc, L1_loc, 0)
    mi1 = jax.lax.dynamic_slice_in_dim(mi1_full, idx * L1_loc, L1_loc, 0)
    rr = _axis_contract_local(gr, mr1, 1) - _axis_contract_local(gi, mi1, 1)
    ri = _axis_contract_local(gr, mi1, 1) + _axis_contract_local(gi, mr1, 1)
    rr = jax.lax.psum(rr, axis_name)
    ri = jax.lax.psum(ri, axis_name)
    perm = [0, rr.ndim - 1] + list(range(1, rr.ndim - 1))
    return rr.transpose(perm), ri.transpose(perm)


def spectral_forward_pruned_dft_sharded(
    xr, xi, dim, M, m, sigma, axis_name, n_shards, cells=None,
    window=DEFAULT_WINDOW
):
    """Forward spectral stage producing a grid slab, inside a shard_map.

    xr/xi: the REPLICATED centered spectrum (B, (N,)*dim, C). Returns the
    LOCAL slab (B, L1/P, ..., C, L0) of the DFT-layout grid for this chip's
    block of the M_1 axis — fully local, zero collectives (every output
    cell depends only on the replicated spectrum).

    Preconditions: ``dim >= 2`` and ``L1 % n_shards == 0`` (see
    :func:`spectral_adjoint_pruned_dft_sharded`).
    """
    from ..ops.fft import _cells_spec, _pruned_mats_np

    if dim < 2:
        raise ValueError(
            f"grid-sharded spectral transforms need dim >= 2 (got dim={dim}):"
            " they shard the grid's M_1 axis, which a 1D grid does not have"
        )
    N = xr.shape[1]
    spec = _cells_spec(dim, M, cells)

    def mats_for(d, sign=-1):
        off, L = spec[d]
        cr, ci = _pruned_mats_np(N, M, m, float(sigma), sign, off, L, window)
        return (
            jnp.asarray(np.ascontiguousarray(cr.T)),
            jnp.asarray(np.ascontiguousarray(ci.T)),
        )

    perm = [0] + list(range(2, dim + 2)) + [1]
    xr = xr.transpose(perm)
    xi = None if xi is None else xi.transpose(perm)

    def cx(ar, ai, mr, mi, ax):
        rr = _axis_contract_local(ar, mr, ax)
        ri = _axis_contract_local(ar, mi, ax)
        if ai is None:
            return rr, ri
        return (
            rr - _axis_contract_local(ai, mi, ax),
            ri + _axis_contract_local(ai, mr, ax),
        )

    mr0, mi0 = mats_for(0)
    xr, xi = cx(xr, xi, mr0, mi0, xr.ndim - 1)  # N0 -> L0 (local)
    # sharded M1 axis: slice this chip's COLUMN block of the (N, L1) matrix
    mr1_full, mi1_full = mats_for(1)
    L1 = mr1_full.shape[1]
    if L1 % n_shards:
        raise ValueError(
            f"sharded grid axis length L1={L1} is not divisible by "
            f"n_shards={n_shards} — equal per-chip row blocks are required "
            "(a remainder would silently truncate the grid)"
        )
    L1_loc = L1 // n_shards
    idx = jax.lax.axis_index(axis_name)
    mr1 = jax.lax.dynamic_slice_in_dim(mr1_full, idx * L1_loc, L1_loc, 1)
    mi1 = jax.lax.dynamic_slice_in_dim(mi1_full, idx * L1_loc, L1_loc, 1)
    xr, xi = cx(xr, xi, mr1, mi1, 1)
    for d in range(2, dim):
        mrd, mid = mats_for(d)
        xr, xi = cx(xr, xi, mrd, mid, d)
    return xr, xi
