"""Fused Pallas window-contraction kernels (TPU Mosaic).

The hot loops of the binned engine (ops/binned.py) are the per-row
contractions

    spread:  tile[u, v, w] = sum_k x[k] * A0[k, u] * A1[k, v] * A2[k, w]
    gather:  y[k] = sum_{u,v,w} A0[k, u] * A1[k, v] * A2[k, w] * tile[u,v,w]

In XLA these materialize a (K, H^2) Khatri-Rao intermediate to HBM between
two matmuls. These kernels fuse everything in VMEM: the window matrices A_d
are evaluated on the fly from the point coordinates (same math as
ops/binned.py:_row_windows, i.e. the reference's compute_psi_kernel,
spatial_window_operations.cu:68-97), the Khatri-Rao product lives only in a
VMEM scratch, and the MXU does the K-contraction.

Data layout: point features (x columns + coordinates) are gathered once into
slot order and stored feature-major as (F, S*K); each grid step's (F, K)
block is then a plain aligned BlockSpec DMA (K is a multiple of the 128-lane
tile), pipelined automatically. Points sit on the LANE axis throughout; the
window matrices are (H, K), so every elementwise op is lane-parallel and the
contraction is one lane-contracting dot per K-chunk.

3D only (the headline regime); 1D/2D use the XLA path. Kernels are
value-only — ops/binned.py wraps them in a custom_vjp whose backward falls
back to the differentiable XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..window import window_inv_b, window_inv_sqrt_b_pi

__all__ = ["spread_tiles_pallas", "gather_points_pallas", "pallas_supported"]

_KC = 512  # lane chunk per inner iteration (VMEM bound)


def _interpret() -> bool:
    # Mosaic needs a real TPU; everywhere else (CPU tests) run interpreted.
    return jax.default_backend() != "tpu"


def pallas_supported(plan, C: int) -> bool:
    # K must tile the 128-lane axis and the kernel's chunking (either one
    # chunk of K <= _KC or whole _KC chunks); otherwise fall back to XLA.
    if plan.dim != 3 or plan.K % 128:
        return False
    return plan.K <= _KC or plan.K % _KC == 0


def _window_row(p_row, origin_d, M, m, H, inv_b, amp):
    """A (H, KC): window values of one coordinate row against the tile cells
    origin_d + [0, H); points on lanes. Same math as binned._row_windows."""
    L = 2 * m + 2
    scaled = p_row * M  # (1, KC)
    fl = jnp.floor(scaled)
    frac = scaled - fl
    s_mod = (fl.astype(jnp.int32) - m) % M
    o = (s_mod - origin_d) % M  # (1, KC)
    u = jax.lax.broadcasted_iota(jnp.int32, (H, p_row.shape[1]), 0)
    rel = u - o  # (H, KC)
    t = frac + (m - rel).astype(frac.dtype)
    vals = jnp.exp(-(t * t) * inv_b) * amp
    return jnp.where((rel >= 0) & (rel < L), vals, 0.0)


def _chunks(K):
    if K <= _KC:
        return 1, K
    assert K % _KC == 0
    return K // _KC, _KC


def _spread_kernel(
    row_count_ref,  # scalar prefetch (S,)
    org0_ref,  # scalar prefetch (S,) per axis (2D SMEM operands pad to 128
    org1_ref,  # lanes and blow the SMEM budget)
    org2_ref,
    data_ref,  # (F, K) block: rows [0:C]=x columns, [C:C+3]=coords
    tile_ref,  # (1, C, H, H*H) block
    t2buf,  # VMEM scratch (H*H, KC)
    *,
    K,
    C,
    H,
    M,
    m,
    inv_b,
    amp,
):
    s = pl.program_id(0)
    count = row_count_ref[s]
    n_chunks, KC = _chunks(K)

    for c in range(C):
        acc = jnp.zeros((H, H * H), jnp.float32)
        for j in range(n_chunks):
            sl = j * KC
            kmask = (
                jax.lax.broadcasted_iota(jnp.int32, (1, KC), 1) + sl < count
            ).astype(jnp.float32)
            A0 = _window_row(data_ref[C + 0 : C + 1, pl.ds(sl, KC)], org0_ref[s], M, m, H, inv_b, amp)
            A1 = _window_row(data_ref[C + 1 : C + 2, pl.ds(sl, KC)], org1_ref[s], M, m, H, inv_b, amp)
            A2 = _window_row(data_ref[C + 2 : C + 3, pl.ds(sl, KC)], org2_ref[s], M, m, H, inv_b, amp)
            xw = data_ref[c : c + 1, pl.ds(sl, KC)] * kmask  # (1, KC)
            t1 = A2 * xw  # (H, KC)
            # Khatri-Rao in VMEM scratch: t2[v*H + w, k] = A1[v, k] * t1[w, k]
            for v in range(H):
                t2buf[v * H : (v + 1) * H, pl.ds(0, KC)] = A1[v : v + 1, :] * t1
            # tile[u, vw] = sum_k A0[u, k] * t2[vw, k]
            acc = acc + jax.lax.dot_general(
                A0,
                t2buf[:, pl.ds(0, KC)],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        tile_ref[0, c] = acc


def _gather_kernel(
    row_count_ref,
    org0_ref,
    org1_ref,
    org2_ref,
    tile_index_ref,  # scalar prefetch (S,): tile block id per row (drives the
    # tile_in_ref index map; unused in the body)
    tile_in_ref,  # (1, C, H, H*H) block
    data_ref,  # (F, K) block: rows [0:3]=coords
    y_ref,  # (1, C, K) block
    *,
    K,
    C,
    H,
    M,
    m,
    inv_b,
    amp,
):
    s = pl.program_id(0)
    count = row_count_ref[s]
    n_chunks, KC = _chunks(K)

    for c in range(C):
        G = tile_in_ref[0, c]  # (H, H*H)
        for j in range(n_chunks):
            sl = j * KC
            kmask = (
                jax.lax.broadcasted_iota(jnp.int32, (1, KC), 1) + sl < count
            ).astype(jnp.float32)
            A0 = _window_row(data_ref[0:1, pl.ds(sl, KC)], org0_ref[s], M, m, H, inv_b, amp)
            A1 = _window_row(data_ref[1:2, pl.ds(sl, KC)], org1_ref[s], M, m, H, inv_b, amp)
            A2 = _window_row(data_ref[2:3, pl.ds(sl, KC)], org2_ref[s], M, m, H, inv_b, amp)
            # t1[vw, k] = sum_u G[u, vw] A0[u, k]
            t1 = jax.lax.dot_general(
                G,
                A0,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # (H*H, KC)
            # t2[w, k] = sum_v A1[v, k] t1[v*H + w, k]
            t2 = jnp.zeros((H, KC), jnp.float32)
            for v in range(H):
                t2 = t2 + A1[v : v + 1, :] * t1[v * H : (v + 1) * H, :]
            # y[k] = sum_w A2[w, k] t2[w, k]
            yk = jnp.sum(A2 * t2, axis=0, keepdims=True) * kmask  # (1, KC)
            y_ref[0, c : c + 1, pl.ds(sl, KC)] = yk


def _slot_values(plan, x):
    """Feature-major slot-ordered values: (C, S*K) gathered from x (n, C).
    Coordinates never need this — the plan precomputes plan.slot_pos."""
    flat = plan.slot_pt.reshape(-1)  # (S*K,)
    return jnp.take(x, flat, axis=0).T  # (C, S*K)


@functools.partial(jax.jit, static_argnames=("C",))
def spread_tiles_pallas(plan, x, pos, *, C):
    """Fused tile contraction: (n, C) points -> (S, C, H, H*H) halo tiles."""
    S = plan.slot_pt.shape[0]
    K, H, M, m = plan.K, plan.H, plan.M, plan.m
    inv_b = window_inv_b(m, plan.sigma)
    amp = window_inv_sqrt_b_pi(m, plan.sigma)

    # values gathered per call; coordinates precomputed in the plan
    data = jnp.concatenate(
        [_slot_values(plan, x.astype(jnp.float32)), plan.slot_pos], axis=0
    )
    F = data.shape[0]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(S,),
        in_specs=[
            pl.BlockSpec((F, K), lambda s, *_: (0, s), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, C, H, H * H), lambda s, *_: (s, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((H * H, min(K, _KC)), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _spread_kernel, K=K, C=C, H=H, M=M, m=m, inv_b=inv_b, amp=amp
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((S, C, H, H * H), jnp.float32),
        interpret=_interpret(),
    )(plan.row_count, plan.origin[:, 0], plan.origin[:, 1], plan.origin[:, 2], data)


@functools.partial(jax.jit, static_argnames=("C",))
def gather_points_pallas(plan, tiles, pos, *, C, tile_index=None):
    """Fused point interpolation: halo tiles -> (S, C, K) slot values
    (ops/binned.py maps slots back to points via plan.inv_slot).

    ``tiles`` is (NT, C, H, H*H); row s of the grid reads tile block
    ``tile_index[s]`` (defaults to the identity, i.e. per-row tiles). With the
    dense-fold layout consecutive rows of one tile share the block, so Mosaic
    keeps it resident in VMEM instead of re-fetching.
    """
    S = plan.slot_pt.shape[0]
    K, H, M, m = plan.K, plan.H, plan.M, plan.m
    inv_b = window_inv_b(m, plan.sigma)
    amp = window_inv_sqrt_b_pi(m, plan.sigma)
    if tile_index is None:
        tile_index = jnp.arange(S, dtype=jnp.int32)

    data = plan.slot_pos  # (dim, S*K): zero per-call gathers
    F = data.shape[0]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(S,),
        in_specs=[
            pl.BlockSpec(
                (1, C, H, H * H),
                lambda s, cnt, o0, o1, o2, ti: (ti[s], 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((F, K), lambda s, *_: (0, s), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, C, K), lambda s, *_: (s, 0, 0), memory_space=pltpu.VMEM
        ),
    )
    kernel = functools.partial(
        _gather_kernel, K=K, C=C, H=H, M=M, m=m, inv_b=inv_b, amp=amp
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((S, C, K), jnp.float32),
        interpret=_interpret(),
    )(
        plan.row_count,
        plan.origin[:, 0],
        plan.origin[:, 1],
        plan.origin[:, 2],
        tile_index.astype(jnp.int32),
        tiles,
        data,
    )
