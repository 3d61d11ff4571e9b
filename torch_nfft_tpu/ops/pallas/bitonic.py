"""Fused bitonic key/value sort for TPU (Pallas) — experimental.

Why this exists: applying the plan's point-order permutations (user order
<-> slot order, ``contract._slot_values`` / ``_unslot_values``) is
issue-bound in every element-indexed XLA formulation — gather, scatter,
take_along_axis on any axis all measure ~11 ns/element at 16M points
(``examples/profile_permute.py``), which makes the two permutations ~57%
of the headline adjoint+forward pair. A permutation *is* a sort by
destination index, and a bitonic sorting network is self-routing: no
routing tables, no edge coloring, just O(log^2 n) compare-exchange passes
that vectorize perfectly on the VPU. The hoped-for wins over
``jax.lax.sort``:

- the first ``log2(block)`` rounds run fused in VMEM (one HBM round trip
  for ~170 network stages instead of one per stage);
- every later round does its sub-``block`` stages in VMEM too (one merge
  kernel pass per round);
- only the cross-block stages touch HBM, and those are perfectly aligned
  elementwise compare-exchanges that XLA executes at bandwidth.

MEASURED OUTCOME (v5e, 2^24 elements, examples/probe_bitonic.py): the
loop-bodied kernels reach 10.05 ns/elem — better than the scatter
formulation's floor but BEHIND ``jax.lax.sort_key_val`` at 4.45 ns/elem,
whose multi-million-key TPU sort is already excellent. The engine
therefore routes its permutations through ``lax.sort`` (see
``contract._slot_values``); this module is kept as a correct, tested
reference point for future VPU-level experiments (an unrolled variant —
``unrolled=True`` — halves per-stage cost but Mosaic compile time scales
with stages x sublane-tiles: minutes per kernel at 2 MB blocks).

The reference has no analog (its permutation problem is solved by CUDA
atomicAdd hardware, ``csrc/cuda/cuda_utils.cu:45-84``).

Network convention (standard bitonic, 0-indexed element i, Q = 2^q):
  for jj = 1..q:            # after round jj, runs of 2^jj alternate asc/desc
    for d = jj-1..0:        # compare-exchange at distance 2^d
      partner(i) = i ^ 2^d; descending iff bit_jj(i) == 1
Round q's direction bit is always 0, so the final result is ascending.

Keys may be any int32s (ties sort unstably but correctly); callers here
always use distinct destination indices.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
# log2 of the default VMEM block (elements). 2^18 elements = (2048, 128):
# key+value blocks are 1 MB each; with input/output aliasing and Mosaic's
# temporary reuse this stays well inside ~16 MB VMEM.
DEFAULT_BLOCK_LOG2 = 18


def _row_stage(k, v, d: int, desc):
    """Compare-exchange at element distance 2^d >= 128 (across sublanes).

    ``desc`` is a bool array broadcastable to (R, 1): True where the
    enclosing run sorts descending. Direction is constant within each
    2^(d+1) group (the caller's round exponent jj > d), so the 'a' half's
    mask is used for the whole group.
    """
    R = k.shape[0]
    pr = 1 << (d - 7)  # distance in rows
    grp = R // (2 * pr)
    k4 = k.reshape(grp, 2, pr, LANES)
    v4 = v.reshape(grp, 2, pr, LANES)
    ka, kb = k4[:, 0], k4[:, 1]
    va, vb = v4[:, 0], v4[:, 1]
    if isinstance(desc, bool):
        dm = desc
    else:
        dm = jnp.broadcast_to(desc, (R, 1)).reshape(grp, 2, pr, 1)[:, 0]
    swap = (ka > kb) ^ dm
    k_lo = jnp.where(swap, kb, ka)
    k_hi = jnp.where(swap, ka, kb)
    v_lo = jnp.where(swap, vb, va)
    v_hi = jnp.where(swap, va, vb)
    k = jnp.concatenate([k_lo[:, None], k_hi[:, None]], 1).reshape(R, LANES)
    v = jnp.concatenate([v_lo[:, None], v_hi[:, None]], 1).reshape(R, LANES)
    return k, v


def _lane_stage(k, v, d: int, desc, *, interpret: bool):
    """Compare-exchange at element distance 2^d < 128 (across lanes).

    Both partner candidates are materialized with circular lane rolls and
    the correct one selected by the lane's role bit; keys are distinct in
    every caller so tie direction is irrelevant.
    """
    s = 1 << d
    roll = jnp.roll if interpret else pltpu.roll
    lane = jax.lax.broadcasted_iota(jnp.int32, k.shape, 1)
    upper = (lane & s) != 0  # this element is the 'b' member of its pair
    # pltpu.roll wants non-negative shifts: -s == LANES - s circularly
    kp = jnp.where(upper, roll(k, s, axis=1), roll(k, LANES - s, axis=1))
    vp = jnp.where(upper, roll(v, s, axis=1), roll(v, LANES - s, axis=1))
    # Both pair members must reach the SAME swap verdict (ties included),
    # or a tied pair duplicates one payload and drops the other: compare as
    # (lower member's key > upper member's key), which both sides see.
    k_lo = jnp.where(upper, kp, k)
    k_hi = jnp.where(upper, k, kp)
    swap = (k_lo > k_hi) ^ desc
    k = jnp.where(swap, kp, k)
    v = jnp.where(swap, vp, v)
    return k, v


def _stage(k, v, d: int, desc, *, interpret: bool):
    if d >= 7:
        return _row_stage(k, v, d, desc)
    return _lane_stage(k, v, d, desc, interpret=interpret)


def _round_desc_mask(jj: int, R: int):
    """Direction mask (descending) for round jj from LOCAL index bits.

    bit_jj of the local element index: a lane mask for jj < 7, a sublane
    (row) mask otherwise. Only valid for jj < log2(block elements).
    """
    if jj < 7:
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
        return ((lane >> jj) & 1) == 1
    row = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
    return ((row >> (jj - 7)) & 1) == 1


# The tunnel's remote Mosaic compiler dies on kernels with more than ~100
# unrolled network stages (the full b=18 local sort is 171); chunk the local
# rounds into kernels below this. One extra kernel only costs one extra HBM
# round trip of the block (~0.7 ms at 2^24), so the split is near-free.
MAX_STAGES_PER_KERNEL = 88


def _local_rounds_kernel(k_ref, v_ref, ko_ref, vo_ref, *, jj_lo: int,
                         jj_hi: int, b: int, interpret: bool):
    """Rounds jj_lo..jj_hi of the bitonic network, fused in VMEM.

    Valid while every stage distance stays inside the block (jj_hi <= b).
    Round b's direction bit is bit b of the global index = the block id's
    parity, so after round b blocks are sorted in alternating directions,
    ready for the global merge rounds."""
    g = pl.program_id(0)
    R = k_ref.shape[0]
    ko_ref[:] = k_ref[:]
    vo_ref[:] = v_ref[:]
    for jj in range(jj_lo, jj_hi + 1):
        if jj == b:
            desc = (g & 1) == 1  # scalar; broadcasts in both stage kinds
        else:
            desc = _round_desc_mask(jj, R)
        for d in range(jj - 1, -1, -1):
            # write each stage back to the (aliased) output refs: an unrolled
            # SSA chain of ~170 stages keeps enough full-block temporaries
            # live to blow Mosaic's scoped-VMEM stack; materializing per
            # stage bounds the working set to one stage's temporaries
            k, v = _stage(ko_ref[:], vo_ref[:], d, desc, interpret=interpret)
            ko_ref[:] = k
            vo_ref[:] = v


def _round_chunks(b: int):
    """Split rounds 1..b into chunks of <= MAX_STAGES_PER_KERNEL stages
    (round jj contributes jj stages)."""
    chunks, lo, stages = [], 1, 0
    for jj in range(1, b + 1):
        if stages and stages + jj > MAX_STAGES_PER_KERNEL:
            chunks.append((lo, jj - 1))
            lo, stages = jj, 0
        stages += jj
    chunks.append((lo, b))
    return chunks


# ---------------------------------------------------------------------------
# Loop-bodied kernels: Mosaic compile time for the unrolled kernels scales
# with (stages x sublane tiles) — minutes at (2048, 128) blocks — because
# every jnp op on an (R, 128) block unrolls into R/8 native tile ops. The
# variants below run ONE generic stage body under lax.fori_loop with the
# stage's (jj, d) read from SMEM, compiling in seconds at ~2x the VPU cost
# per stage (dynamic rolls both ways instead of specialized half-slices).
# ---------------------------------------------------------------------------


def _partner_dyn(x, s_lane, s_row, role_up, R: int, interpret: bool):
    """Partner values at xor-distance 2^d, d encoded as (s_lane, s_row) with
    exactly one nonzero. role_up marks the pair's upper member (bit_d set),
    whose partner sits BELOW it; rolls are circular but the xor structure
    guarantees the selected direction never wraps."""
    roll = jnp.roll if interpret else pltpu.roll
    # roll(x, +s)[i] = x[i-s]: the partner below (what the upper member
    # needs); roll(x, -s) ≡ roll(x, size-s) reads the partner above.
    below = roll(roll(x, s_lane, axis=1), s_row, axis=0)
    above = roll(
        roll(x, (LANES - s_lane) % LANES, axis=1),
        (R - s_row) % R, axis=0,
    )
    return jnp.where(role_up, below, above)


def _loop_stage(k, v, d, desc, idx, R: int, interpret: bool):
    """One compare-exchange stage with TRACED distance exponent d.

    desc: bool (R, LANES) or scalar — descending regions. idx: (R, LANES)
    int32 local element index."""
    s = jnp.left_shift(jnp.int32(1), d)
    lane_stage = d < 7
    s_lane = jnp.where(lane_stage, s, 0)
    s_row = jnp.where(lane_stage, 0, jnp.right_shift(s, 7))
    role_up = (jnp.right_shift(idx, d) & 1) == 1
    kp = _partner_dyn(k, s_lane, s_row, role_up, R, interpret)
    vp = _partner_dyn(v, s_lane, s_row, role_up, R, interpret)
    k_lo = jnp.where(role_up, kp, k)
    k_hi = jnp.where(role_up, k, kp)
    swap = (k_lo > k_hi) ^ desc
    return jnp.where(swap, kp, k), jnp.where(swap, vp, v)


def _local_sort_loop_kernel(jjs_ref, ds_ref, k_ref, v_ref, ko_ref, vo_ref,
                            *, b: int, n_stages: int, interpret: bool):
    """All local rounds 1..b as a fori_loop over the (jj, d) stage tables."""
    g = pl.program_id(0)
    R = k_ref.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 1)
    idx = row * LANES + lane
    g_bit = g & 1

    def body(i, kv):
        k, v = kv
        jj = jjs_ref[i]
        d = ds_ref[i]
        # select in int32 (Mosaic cannot legalize selects on i1 vectors)
        desc = jnp.where(jj == b, g_bit,
                         jnp.right_shift(idx, jj) & 1) == 1
        return _loop_stage(k, v, d, desc, idx, R, interpret)

    k, v = jax.lax.fori_loop(0, n_stages, body, (k_ref[:], v_ref[:]))
    ko_ref[:] = k
    vo_ref[:] = v


def _local_merge_loop_kernel(bit_ref, k_ref, v_ref, ko_ref, vo_ref,
                             *, b: int, interpret: bool):
    """Stages d = b-1..0 of one global merge round as a fori_loop; the
    direction is constant per block: bit (jj - b) of the block id."""
    g = pl.program_id(0)
    R = k_ref.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 1)
    idx = row * LANES + lane
    desc = ((g >> bit_ref[0]) & 1) == 1

    def body(i, kv):
        k, v = kv
        return _loop_stage(k, v, b - 1 - i, desc, idx, R, interpret)

    k, v = jax.lax.fori_loop(0, b, body, (k_ref[:], v_ref[:]))
    ko_ref[:] = k
    vo_ref[:] = v


def _local_merge_kernel(bit_ref, k_ref, v_ref, ko_ref, vo_ref, *, b: int,
                        interpret: bool):
    """Stages d = b-1..0 of one global merge round jj, fused in VMEM.

    The direction is bit jj of the global index = bit (jj - b) of the block
    id; ``bit_ref`` holds jj - b so one compiled kernel serves every round.
    """
    g = pl.program_id(0)
    desc = ((g >> bit_ref[0]) & 1) == 1
    ko_ref[:] = k_ref[:]
    vo_ref[:] = v_ref[:]
    for d in range(b - 1, -1, -1):
        k, v = _stage(ko_ref[:], vo_ref[:], d, desc, interpret=interpret)
        ko_ref[:] = k
        vo_ref[:] = v


def _cross_stage(k, v, jj: int, d: int):
    """One compare-exchange stage at distance 2^d >= block size, as plain
    XLA: aligned halves, elementwise select — runs at HBM bandwidth."""
    D = 1 << d
    k3 = k.reshape(-1, 2, D)
    v3 = v.reshape(-1, 2, D)
    outer = jnp.arange(k3.shape[0], dtype=jnp.int32)[:, None]
    desc = ((outer >> (jj - d - 1)) & 1) == 1
    ka, kb = k3[:, 0], k3[:, 1]
    va, vb = v3[:, 0], v3[:, 1]
    swap = (ka > kb) ^ desc
    k_lo = jnp.where(swap, kb, ka)
    k_hi = jnp.where(swap, ka, kb)
    v_lo = jnp.where(swap, vb, va)
    v_hi = jnp.where(swap, va, vb)
    k = jnp.concatenate([k_lo[:, None], k_hi[:, None]], 1).reshape(k.shape)
    v = jnp.concatenate([v_lo[:, None], v_hi[:, None]], 1).reshape(v.shape)
    return k, v


def _block_specs(R: int):
    spec = pl.BlockSpec((R, LANES), lambda g, *a: (g, 0))
    return [spec, spec], [spec, spec]


def _compiler_params():
    # v5e has far more physical VMEM than Mosaic's default 16 MB scoped
    # limit; give the network kernels room for one stage's temporaries on
    # 2 MB blocks plus double-buffered pipeline copies.
    return pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


@functools.partial(jax.jit,
                   static_argnames=("block_log2", "interpret", "unrolled"))
def sort_pairs(keys, vals, *, block_log2: int = DEFAULT_BLOCK_LOG2,
               interpret: bool = False, unrolled: bool = False):
    """Sort ``vals`` by int32 ``keys`` (both 1D, power-of-two length).

    Returns (sorted_keys, sorted_vals). Equivalent to
    ``jax.lax.sort_key_val`` except ties are not stable (and measured
    slower than it at 2^24 — see the module docstring; prefer lax.sort).

    ``unrolled=True`` emits one specialized Mosaic op per network stage
    (lowest per-stage VPU cost, but compile time scales with
    stages x sublane-tiles — minutes at 2 MB blocks); the default runs a
    generic stage body under ``lax.fori_loop`` reading (jj, d) from SMEM,
    compiling in seconds at ~2x the per-stage VPU cost.
    """
    Q = keys.shape[0]
    q = Q.bit_length() - 1
    if (1 << q) != Q:
        raise ValueError(f"length must be a power of two, got {Q}")
    if vals.shape != keys.shape:
        raise ValueError("keys and vals must have identical shapes")
    b = min(q, block_log2)
    if q < 8:
        sk, sv = jax.lax.sort_key_val(keys, vals)  # tiny: not worth a kernel
        return sk, sv
    R = (1 << b) // LANES
    G = Q // (1 << b)
    k2 = keys.reshape(G * R, LANES)
    v2 = vals.reshape(G * R, LANES)

    in_specs, out_specs = _block_specs(R)
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    grid = (G,)
    out_shape = [
        jax.ShapeDtypeStruct(k2.shape, k2.dtype),
        jax.ShapeDtypeStruct(v2.shape, v2.dtype),
    ]
    common = dict(grid=grid, out_specs=out_specs, out_shape=out_shape,
                  compiler_params=None if interpret else _compiler_params(),
                  interpret=interpret)

    if unrolled:
        for jj_lo, jj_hi in _round_chunks(b):
            k2, v2 = pl.pallas_call(
                functools.partial(_local_rounds_kernel, jj_lo=jj_lo,
                                  jj_hi=jj_hi, b=b, interpret=interpret),
                in_specs=in_specs,
                input_output_aliases={0: 0, 1: 1},
                **common,
            )(k2, v2)
    else:
        stages = [(jj, d) for jj in range(1, b + 1)
                  for d in range(jj - 1, -1, -1)]
        jjs = jnp.asarray([s[0] for s in stages], jnp.int32)
        ds = jnp.asarray([s[1] for s in stages], jnp.int32)
        k2, v2 = pl.pallas_call(
            functools.partial(_local_sort_loop_kernel, b=b,
                              n_stages=len(stages), interpret=interpret),
            in_specs=[smem_spec, smem_spec] + in_specs,
            input_output_aliases={2: 0, 3: 1},
            **common,
        )(jjs, ds, k2, v2)

    merge_in_specs = [smem_spec] + in_specs
    merge_kernel = functools.partial(
        _local_merge_kernel if unrolled else _local_merge_loop_kernel,
        b=b, interpret=interpret)
    for jj in range(b + 1, q + 1):
        kf = k2.reshape(-1)
        vf = v2.reshape(-1)
        for d in range(jj - 1, b - 1, -1):
            kf, vf = _cross_stage(kf, vf, jj, d)
        k2 = kf.reshape(G * R, LANES)
        v2 = vf.reshape(G * R, LANES)
        bit = jnp.full((1,), jj - b, jnp.int32)
        k2, v2 = pl.pallas_call(
            merge_kernel,
            in_specs=merge_in_specs,
            input_output_aliases={1: 0, 2: 1},
            **common,
        )(bit, k2, v2)

    return k2.reshape(Q), v2.reshape(Q)


def apply_permutation(dest, vals, *, block_log2: int = DEFAULT_BLOCK_LOG2,
                      interpret: bool = False):
    """out[dest[i]] = vals[i] for a full permutation ``dest`` of [0, Q).

    The scatter-by-permutation primitive: sorting vals by destination index
    places each value at its destination. (The engine uses
    ``jax.lax.sort_key_val`` for this — measured faster; see module
    docstring.)
    """
    _, out = sort_pairs(dest, vals, block_log2=block_log2,
                        interpret=interpret)
    return out
