"""Ragged row-stream expansion/compaction kernels (TPU Mosaic).

The binned engine's slot layout pads each plan row to K lanes, so the
user<->slot permutation acts on S*K >= n elements — and the Benes apply
(ops/pallas/benes.py) pads THAT to the next power of two. At the 3D
headline n = 2^24 points become S*K ~= 18M slots, which pad to 2^25: the
network moves 1.86x the payload and runs one level deeper than a network
over the points themselves.

These kernels decouple padding from permutation: the network runs in
COMPACT rank space (exactly n elements — a 2^24 network at the headline),
and the padded slot stream is produced/consumed by one cheap streaming
pass per direction:

    expand_rows:   padded[s, k] = compact[row_start[s] + k]   (k < count_s)
    compact_rows:  compact[row_start[s] + k] = padded[s, k]   (k < count_s)

with ``row_start`` the exclusive cumsum of the plan's ``row_count`` (rows
tile [0, n) contiguously in plan order). Each grid step handles R rows at
once — one step per row leaves the pass grid-overhead-bound (~35k tiny
steps at the headline). A group of R consecutive rows spans less than
R*K = KB stream elements past its first row's block-aligned base, so one
(2*KB)-wide window (two dynamically indexed KB input blocks — the same
scalar-prefetch index-map mechanism as the tile-id-driven specs in
contract.py) covers the whole group; each row aligns its lanes with one
dynamic roll of the window. Compaction is the transpose: each row's
aligned lanes roll to their stream offset inside a (2*KB) accumulator,
written as two output block arrays — ``lo`` (the group's base block) and
``hi`` (the spill into the following block) — combined by one elementwise
add afterwards. Output blocks are revisited only consecutively (rows are
stream-ordered), the same Mosaic flush-on-change accumulation contract as
contract._spread_dense_kernel.

The reference has no analog (its data movement is hardware atomics,
csrc/cuda/cuda_utils.cu:45-84); this exists so a static permutation can be
applied to the minimum number of elements at TPU memory speed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_ROWS_PER_STEP = 16


def row_start_from_counts(row_count):
    """(S,) exclusive cumsum: each plan row's offset in the compact stream."""
    return jnp.concatenate(
        [
            jnp.zeros((1,), jnp.int32),
            jnp.cumsum(row_count, dtype=jnp.int32)[:-1],
        ]
    )


def _expand_kernel(rs_ref, cnt_ref, lo_ref, hi_ref, out_ref, *, K: int,
                   R: int, interpret: bool):
    g = pl.program_id(0)
    KB = R * K
    base = (rs_ref[g * R] // KB) * KB
    w = jnp.concatenate([lo_ref[:], hi_ref[:]], axis=2)  # (1, 1, 2*KB)
    roll = jnp.roll if interpret else pltpu.roll
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 2 * KB), 2)
    for r in range(R):
        o = rs_ref[g * R + r] - base  # < 2*KB for rows with data in window
        cnt = cnt_ref[g * R + r]
        # rolled[p] = w[(p + o) mod 2KB] = stream value at row_start + p
        rolled = roll(w, (2 * KB - o) % (2 * KB), axis=2)
        v = jnp.where(lane < cnt, rolled, 0.0)
        out_ref[0, r : r + 1, :] = v[0, :, :K]


def expand_rows(compact_flat, row_start, row_count, *, K: int,
                rows_per_step: int = DEFAULT_ROWS_PER_STEP,
                interpret: bool = False):
    """(L,) compact stream (L >= n, tail ignored) -> (S, K) padded rows
    (invalid lanes 0). Block padding is handled internally."""
    S = row_start.shape[0]
    R = rows_per_step
    KB = R * K
    S8 = -(-S // R)
    L = compact_flat.shape[0]
    nb_in = L // KB + 2
    stream = jnp.concatenate(
        [compact_flat, jnp.zeros((nb_in * KB - L,), compact_flat.dtype)]
    )
    comp3 = stream.reshape(nb_in, 1, KB)
    # pad rows to a multiple of R: start L (block index stays in range),
    # count 0 (all lanes masked)
    rs_pad = jnp.concatenate(
        [row_start.astype(jnp.int32),
         jnp.full((S8 * R - S,), L, jnp.int32)]
    )
    cnt_pad = jnp.concatenate(
        [row_count.astype(jnp.int32), jnp.zeros((S8 * R - S,), jnp.int32)]
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(S8,),
        in_specs=[
            pl.BlockSpec((1, 1, KB),
                         lambda g, rs, cnt: (rs[g * R] // KB, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, KB),
                         lambda g, rs, cnt: (rs[g * R] // KB + 1, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, R, K), lambda g, *_: (g, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_expand_kernel, K=K, R=R, interpret=interpret),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((S8, R, K), compact_flat.dtype),
        interpret=interpret,
    )(rs_pad, cnt_pad, comp3, comp3)
    return out.reshape(S8 * R, K)[:S]


def _compact_kernel(rs_ref, cnt_ref, y_ref, zlo_ref, zhi_ref, lo_ref, hi_ref,
                    *, K: int, R: int, interpret: bool):
    del zlo_ref, zhi_ref  # aliased zeros; never read
    g = pl.program_id(0)
    KB = R * K
    base = (rs_ref[g * R] // KB) * KB
    roll = jnp.roll if interpret else pltpu.roll
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, K), 2)
    acc = jnp.zeros((1, 1, 2 * KB), y_ref.dtype)
    for r in range(R):
        o = rs_ref[g * R + r] - base
        cnt = cnt_ref[g * R + r]
        y = jnp.where(lane < cnt, y_ref[0, r : r + 1, :][None], 0.0)
        ypad = jnp.concatenate(
            [y, jnp.zeros((1, 1, 2 * KB - K), y.dtype)], axis=2
        )
        # rolled[p] = ypad[(p - o) mod 2KB]: row lanes land at stream
        # offsets [o, o + cnt) inside the window
        acc = acc + roll(ypad, o % (2 * KB), axis=2)
    lo_c = acc[:, :, :KB]
    hi_c = acc[:, :, KB:]

    prev = rs_ref[jnp.maximum(g - 1, 0) * R]
    first = (g == 0) | (rs_ref[g * R] // KB != prev // KB)

    @pl.when(first)
    def _():
        lo_ref[:] = lo_c
        hi_ref[:] = hi_c

    @pl.when(jnp.logical_not(first))
    def _():
        lo_ref[:] = lo_ref[:] + lo_c
        hi_ref[:] = hi_ref[:] + hi_c


def compact_rows(padded, row_start, row_count, n: int, *,
                 rows_per_step: int = DEFAULT_ROWS_PER_STEP,
                 interpret: bool = False):
    """(S, K) padded rows -> (NB*K,) compact stream, NB = ceil(n/K).

    The transpose of :func:`expand_rows`: valid lanes land at
    compact[row_start[s] + k]; the tail beyond position n is zero."""
    S, K = padded.shape
    R = rows_per_step
    KB = R * K
    S8 = -(-S // R)
    NBk = n // KB + 1  # base-block range: real rows <= (n-1)//KB, pads n//KB
    NB = -(-n // K)

    padded3 = jnp.concatenate(
        [padded, jnp.zeros((S8 * R - S, K), padded.dtype)]
    ).reshape(S8, R, K)
    rs_pad = jnp.concatenate(
        [row_start.astype(jnp.int32), jnp.full((S8 * R - S,), n, jnp.int32)]
    )
    cnt_pad = jnp.concatenate(
        [row_count.astype(jnp.int32), jnp.zeros((S8 * R - S,), jnp.int32)]
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(S8,),
        in_specs=[
            pl.BlockSpec((1, R, K), lambda g, *_: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # aliased zeros (lo)
            pl.BlockSpec(memory_space=pl.ANY),  # aliased zeros (hi)
        ],
        out_specs=[
            pl.BlockSpec((1, 1, KB),
                         lambda g, rs, cnt: (rs[g * R] // KB, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, KB),
                         lambda g, rs, cnt: (rs[g * R] // KB, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    zeros = jnp.zeros((NBk, 1, KB), padded.dtype)
    lo, hi = pl.pallas_call(
        functools.partial(_compact_kernel, K=K, R=R, interpret=interpret),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((NBk, 1, KB), padded.dtype),
            jax.ShapeDtypeStruct((NBk, 1, KB), padded.dtype),
        ],
        # operand index counts the 2 scalar-prefetch args: 3/4 = zeros
        input_output_aliases={3: 0, 4: 1},
        interpret=interpret,
    )(rs_pad, cnt_pad, padded3, zeros, zeros)
    # hi[b] holds the spill into block b+1
    lo = lo.reshape(NBk, KB)
    hi = hi.reshape(NBk, KB)
    compact = lo + jnp.concatenate(
        [jnp.zeros((1, KB), lo.dtype), hi[:-1]], 0
    )
    return compact.reshape(-1)[: NB * K]
