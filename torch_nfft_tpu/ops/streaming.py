"""Grid-streamed batched transforms: one oversampled grid buffer, reused.

The reference materializes the full ``batch * cols * (2N)^dim`` complex grid
in one allocation (``core_cuda.cu:216``) — 16 GiB for the driver's 3D
batch=16, N=256 configuration, which fits an 80 GB H100 but not one TPU
chip's HBM. Batched transforms are block-diagonal (each batch member and
each column is an independent signal, ``core_cuda.cu:84``,
``docs dataformat.rst:19-48``), so this module runs them as a
``lax.fori_loop`` over batch members inside ONE jit: each iteration spreads
one member onto a single ``(2N)^dim`` buffer, FFTs it, and writes the
member's output slice. XLA allocates the grid once as a loop-local
temporary; peak memory is one member's pipeline + the packed outputs.

Inputs arrive in the reference's flat layout (points (n, dim), sorted
``batch`` vector); the host-side packing to (B, n_max, *) plus per-member
plan construction happens once via ops/plan_stack.py and is amortized across
calls exactly like a single-set plan. Trailing columns can additionally be
chunked (``column_chunk=``) to bound the per-iteration grid at
``(2N)^dim * column_chunk``.

All streamed functions run the pure-real planar pipelines (ops/planar.py),
so they execute on every TPU runtime including complex-free ones, and return
planar (real, imag) pairs where the result is a spectrum.
"""

from __future__ import annotations

import math
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from .planar import nfft_adjoint_planar, nfft_fastsum_real, nfft_forward_planar
from .plan_stack import build_plan_stack, index_plan, split_by_batch

__all__ = [
    "StreamedLayout",
    "make_streamed_layout",
    "nfft_adjoint_streamed",
    "nfft_forward_streamed",
    "nfft_fastsum_streamed",
]

# single source of truth for the window defaults: ops/window.py
from .window import DEFAULT_SIGMA, DEFAULT_WINDOW  # noqa: E402


class StreamedLayout:
    """Host-side packing of one batched point set + its per-member plans.

    Build once per point set (the FFTW-plan pattern), reuse across every
    streamed transform. Fields: ``pos_stack`` (B, n_max, dim) device array,
    ``counts`` (B,) numpy, ``plans`` stacked BinnedPlan (or None for small
    problems, which fall back to the scatter/matmul engines).
    """

    def __init__(self, pos_stack, counts, plans, N, m, sigma,
                 window=DEFAULT_WINDOW):
        self.pos_stack = pos_stack
        self.counts = counts
        self.plans = plans
        self.N = int(N)
        self.m = int(m)
        self.sigma = float(sigma)
        self.window = str(window)

    @property
    def batch_size(self) -> int:
        return self.pos_stack.shape[0]

    @property
    def n_max(self) -> int:
        return self.pos_stack.shape[1]

    def pack(self, x) -> jax.Array:
        """Pack per-point values (n, C) into the member layout (B, n_max, C)."""
        x = np.asarray(x)
        out = np.zeros((self.batch_size, self.n_max) + x.shape[1:], x.dtype)
        lo = 0
        for b, c in enumerate(self.counts):
            out[b, :c] = x[lo : lo + c]
            lo += c
        return jnp.asarray(out)

    def unpack(self, y_stack) -> jax.Array:
        """Inverse of :meth:`pack` for per-point outputs (B, n_max, C)."""
        parts = [y_stack[b, : int(c)] for b, c in enumerate(self.counts)]
        return jnp.concatenate(parts, axis=0)


def make_streamed_layout(
    pos,
    batch=None,
    *,
    batch_size: int,
    N: int,
    m: int,
    sigma: float = DEFAULT_SIGMA,
    plan: bool = True,
    T: int | None = None,
    window: str = DEFAULT_WINDOW,
) -> StreamedLayout:
    """Split (pos, batch) into members and build the per-member plan stack."""
    pos_stack, _, counts, _ = split_by_batch(pos, None, batch, batch_size)
    plans = (
        build_plan_stack(pos_stack, N=N, m=m, sigma=sigma, T=T, window=window)
        if plan
        else None
    )
    return StreamedLayout(
        jnp.asarray(pos_stack), counts, plans, N, m, sigma, window
    )


def _member_plan(layout, i):
    return None if layout.plans is None else index_plan(layout.plans, i)


@partial(jax.jit, static_argnames=("N", "m", "sigma", "strategy", "window"))
def _adjoint_streamed_impl(x_stack, pos_stack, plans, *, N, m, sigma, strategy,
                           window=DEFAULT_WINDOW):
    B, n_max, C = x_stack.shape
    dim = pos_stack.shape[-1]
    batch0 = jnp.zeros((n_max,), jnp.int32)
    out_r = jnp.zeros((B,) + (N,) * dim + (C,), jnp.float32)
    out_i = jnp.zeros_like(out_r)

    def body(i, acc):
        out_r, out_i = acc
        plan_i = None if plans is None else index_plan(plans, i)
        yr, yi = nfft_adjoint_planar(
            x_stack[i],
            pos_stack[i],
            batch0,
            plan_i,
            batch_size=1,
            N=N,
            m=m,
            sigma=sigma,
            strategy=strategy,
            window=window,
        )
        out_r = jax.lax.dynamic_update_index_in_dim(out_r, yr[0], i, 0)
        out_i = jax.lax.dynamic_update_index_in_dim(out_i, yi[0], i, 0)
        return out_r, out_i

    return jax.lax.fori_loop(0, B, body, (out_r, out_i))


def nfft_adjoint_streamed(
    x,
    layout: StreamedLayout,
    *,
    strategy: str = "auto",
    column_chunk: int | None = None,
):
    """Adjoint NFFT of real samples, streamed one batch member at a time.

    ``x``: (n, *cols) real, flat reference layout matching the ``(pos,
    batch)`` the layout was built from. Returns planar (yr, yi), each
    (batch_size, (N,)*dim, *cols).
    """
    x = np.asarray(x)
    trailing = x.shape[1:]
    C = math.prod(trailing) if trailing else 1
    xs = layout.pack(x.reshape(x.shape[0], C))
    dim = layout.pos_stack.shape[-1]

    chunks = _column_chunks(C, column_chunk)
    outs = [
        _adjoint_streamed_impl(
            xs[..., lo:hi],
            layout.pos_stack,
            layout.plans,
            N=layout.N,
            m=layout.m,
            sigma=layout.sigma,
            strategy=strategy,
            window=layout.window,
        )
        for lo, hi in chunks
    ]
    yr = jnp.concatenate([o[0] for o in outs], axis=-1)
    yi = jnp.concatenate([o[1] for o in outs], axis=-1)
    shp = (layout.batch_size,) + (layout.N,) * dim + trailing
    return yr.reshape(shp), yi.reshape(shp)


@partial(jax.jit, static_argnames=("dim", "m", "sigma", "strategy", "window"))
def _forward_streamed_impl(xr, xi, pos_stack, plans, *, dim, m, sigma, strategy,
                           window=DEFAULT_WINDOW):
    B = xr.shape[0]
    n_max = pos_stack.shape[1]
    C = xr.shape[-1]
    batch0 = jnp.zeros((n_max,), jnp.int32)
    out_r = jnp.zeros((B, n_max, C), jnp.float32)
    out_i = jnp.zeros_like(out_r)

    def body(i, acc):
        out_r, out_i = acc
        plan_i = None if plans is None else index_plan(plans, i)
        yr, yi = nfft_forward_planar(
            jax.lax.dynamic_slice_in_dim(xr, i, 1, 0),
            None if xi is None else jax.lax.dynamic_slice_in_dim(xi, i, 1, 0),
            pos_stack[i],
            batch0,
            plan_i,
            batch_size=1,
            dim=dim,
            m=m,
            sigma=sigma,
            strategy=strategy,
            window=window,
        )
        out_r = jax.lax.dynamic_update_index_in_dim(out_r, yr, i, 0)
        out_i = jax.lax.dynamic_update_index_in_dim(out_i, yi, i, 0)
        return out_r, out_i

    return jax.lax.fori_loop(0, B, body, (out_r, out_i))


def nfft_forward_streamed(
    xr,
    xi,
    layout: StreamedLayout,
    *,
    strategy: str = "auto",
    column_chunk: int | None = None,
):
    """Forward NFFT of a planar spectrum (batch_size, (N,)*dim, *cols),
    streamed per member. Returns planar (yr, yi), each (n, *cols) in the flat
    reference layout."""
    xr = jnp.asarray(xr)
    dim = layout.pos_stack.shape[-1]
    B = layout.batch_size
    N = layout.N
    trailing = xr.shape[1 + dim :]
    C = math.prod(trailing) if trailing else 1
    xr = xr.reshape((B,) + (N,) * dim + (C,))
    xi = None if xi is None else jnp.asarray(xi).reshape(xr.shape)

    chunks = _column_chunks(C, column_chunk)
    outs = [
        _forward_streamed_impl(
            xr[..., lo:hi],
            None if xi is None else xi[..., lo:hi],
            layout.pos_stack,
            layout.plans,
            dim=dim,
            m=layout.m,
            sigma=layout.sigma,
            strategy=strategy,
            window=layout.window,
        )
        for lo, hi in chunks
    ]
    yr = layout.unpack(jnp.concatenate([o[0] for o in outs], axis=-1))
    yi = layout.unpack(jnp.concatenate([o[1] for o in outs], axis=-1))
    return yr.reshape((-1,) + trailing), yi.reshape((-1,) + trailing)


@partial(jax.jit, static_argnames=("N", "m", "sigma", "strategy", "window"))
def _fastsum_streamed_impl(
    x_stack, coeffs, src_stack, tgt_stack, src_plans, tgt_plans,
    *, N, m, sigma, strategy, window=DEFAULT_WINDOW
):
    B, n_src, C = x_stack.shape
    n_tgt = tgt_stack.shape[1]
    batch_s = jnp.zeros((n_src,), jnp.int32)
    batch_t = jnp.zeros((n_tgt,), jnp.int32)
    out = jnp.zeros((B, n_tgt, C), jnp.float32)

    def body(i, out):
        sp = None if src_plans is None else index_plan(src_plans, i)
        tp = None if tgt_plans is None else index_plan(tgt_plans, i)
        y = nfft_fastsum_real(
            x_stack[i],
            coeffs,
            src_stack[i],
            tgt_stack[i],
            batch_s,
            batch_t,
            sp,
            tp,
            batch_size=1,
            N=N,
            m=m,
            sigma=sigma,
            strategy=strategy,
            window=window,
        )
        return jax.lax.dynamic_update_index_in_dim(out, y, i, 0)

    return jax.lax.fori_loop(0, B, body, out)


def nfft_fastsum_streamed(
    x,
    coeffs,
    source_layout: StreamedLayout,
    target_layout: StreamedLayout | None = None,
    *,
    strategy: str = "auto",
    column_chunk: int | None = None,
):
    """Gaussian/trigonometric fastsum streamed per batch member (real in,
    real out). ``x``: (n_src, *cols) flat; returns (n_tgt, *cols) flat."""
    if target_layout is None:
        target_layout = source_layout
    x = np.asarray(x)
    trailing = x.shape[1:]
    C = math.prod(trailing) if trailing else 1
    xs = source_layout.pack(x.reshape(x.shape[0], C))
    coeffs = jnp.asarray(coeffs)
    N = coeffs.shape[0]
    if N != source_layout.N:
        raise ValueError(f"coeffs bandwidth {N} != layout bandwidth {source_layout.N}")

    chunks = _column_chunks(C, column_chunk)
    outs = [
        _fastsum_streamed_impl(
            xs[..., lo:hi],
            coeffs,
            source_layout.pos_stack,
            target_layout.pos_stack,
            source_layout.plans,
            target_layout.plans,
            N=N,
            m=source_layout.m,
            sigma=source_layout.sigma,
            strategy=strategy,
            window=source_layout.window,
        )
        for lo, hi in chunks
    ]
    y = target_layout.unpack(jnp.concatenate(outs, axis=-1))
    return y.reshape((-1,) + trailing)


def _column_chunks(C: int, column_chunk):
    if column_chunk is None or column_chunk >= C:
        return [(0, C)]
    return [(lo, min(lo + column_chunk, C)) for lo in range(0, C, column_chunk)]
