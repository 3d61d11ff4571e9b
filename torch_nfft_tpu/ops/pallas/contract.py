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

2D/3D (1D uses the XLA path). Kernels are
value-only — ops/binned.py wraps them in a custom_vjp whose backward falls
back to the differentiable XLA path.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..window import window_value_and_deriv_fn, window_value_fn

__all__ = [
    "spread_tiles_pallas",
    "spread_tiles_dense_pallas",
    "gather_points_pallas",
    "pos_grad_pallas",
    "pallas_supported",
]

_KC = 1024  # lane chunk per inner iteration (VMEM bound)


def kernel_precision() -> str:
    """Window-contraction precision mode, read at trace time.

    * ``"highest"`` — f32 Khatri-Rao, HIGHEST (6-pass) MXU dot. Reference
      accuracy (~1.1e-4 rel-L2 at 3D N=256 m=4).
    * ``"high3"`` — f32 Khatri-Rao; the MXU dot splits both operands into
      bf16 hi+lo parts and sums the three significant cross products
      (DEFAULT-precision passes, f32 accumulation) — the manual version of
      ``Precision.HIGH``, which Mosaic does not lower inside kernels.
      Accuracy is f32-class (the dropped lo*lo term is ~2^-18 relative),
      at roughly a third of HIGHEST's MXU passes. Measured on the 3D
      N=256 m=4 headline it is nevertheless ~11% *slower* end to end
      (0.552 vs 0.497 s/pair): the dots are not the bottleneck there and
      the VPU split/round passes cost more than the MXU passes saved —
      kept as an opt-in for dot-bound shapes.
    * ``"bf16kr"`` — bf16 Khatri-Rao feeding a single-pass bf16 MXU dot;
      fastest, but measured 2.8e-3 rel-L2 at the 3D headline (any bf16
      rounding of per-point weights lands ~2e-3 in the output) — opt-in
      for error-tolerant workloads only.
    """
    return os.environ.get("TORCH_NFFT_TPU_KERNEL_PRECISION", "highest").lower()



# Per-mode MXU dot precision inside the kernels. "high" asks Mosaic for the
# 3-pass bf16 scheme directly (round-3 found it unsupported in-kernel and
# hand-built high3 instead; re-probed in round 5 since Mosaic grew support).
_PREC = {
    "default": jax.lax.Precision.DEFAULT,
    "bf16kr": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}

def _split_bf16(v):
    """Two-term bf16 decomposition: v ~= hi + lo with both parts bf16 and
    the residual ~2^-18 relative (hi carries 8 mantissa bits, lo the next 8)."""
    hi = v.astype(jnp.bfloat16)
    lo = (v - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot_high3(a, b, dn):
    """dot_general(a, b) with Precision.HIGH semantics built by hand:
    hi*hi + hi*lo + lo*hi in three DEFAULT bf16 MXU passes, f32 accumulate."""
    a_hi, a_lo = _split_bf16(a)
    b_hi, b_lo = _split_bf16(b)

    def d(x, y):
        return jax.lax.dot_general(
            x, y, dimension_numbers=dn,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )

    return d(a_hi, b_hi) + d(a_hi, b_lo) + d(a_lo, b_hi)


def _interpret() -> bool:
    # Mosaic needs a real TPU; everywhere else (CPU tests) run interpreted.
    return jax.default_backend() != "tpu"


def pallas_supported(plan, C: int) -> bool:
    # K must tile the 128-lane axis and the kernel's chunking (either one
    # chunk of K <= _KC or whole _KC chunks); otherwise fall back to XLA.
    if plan.dim not in (1, 2, 3) or plan.K % 128:
        return False
    return plan.K <= _KC or plan.K % _KC == 0



def _out_vma(*arrays):
    """Union of the inputs' varying-mesh-axes (shard_map vma typing): a
    pallas_call inside a shard_map body must declare how its outputs vary
    across mesh axes, and they vary exactly like the data they're computed
    from. Empty outside shard_map (a no-op)."""
    vmas = set()
    for a in arrays:
        v = getattr(jax.typeof(a), "vma", None)
        if v:
            vmas |= set(v)
    return frozenset(vmas)


def _windows_fused(pd, orgs, M, m, H, phi):
    """Per-dim window matrices, each (H, KC): values of every coordinate row
    against its tile cells origin_d + [0, H), evaluated in ONE batch of
    vector ops. Same math as binned._row_windows.

    Layout: the dims stack on the sublane axis in groups of G = roundup(H, 8)
    rows (so the per-dim slices sit at aligned sublane offsets); within a
    group, row u holds cell origin_d + u. Using the unwrapped identity
    t = frac + m + o - u, every heavy op runs once on (dim*G, KC) — the
    kernel is op-issue-bound, not FLOP-bound, so fewer, bigger vector ops is
    the whole game.
    """
    D, KC = pd.shape
    G = -(-H // 8) * 8
    L = 2 * m + 2
    scaled = pd * M  # (D, KC)
    fl = jnp.floor(scaled)
    frac = scaled - fl
    s_mod = (fl.astype(jnp.int32) - m) % M
    org = jnp.concatenate(
        [jnp.full((1, KC), o, jnp.int32) for o in orgs], axis=0
    )  # (D, KC)
    o = (s_mod - org) % M  # (D, KC), in [0, T)
    o_r = jnp.concatenate(
        [jnp.broadcast_to(o[d : d + 1], (G, KC)) for d in range(D)], axis=0
    )
    frac_r = jnp.concatenate(
        [jnp.broadcast_to(frac[d : d + 1], (G, KC)) for d in range(D)], axis=0
    )
    u = jax.lax.broadcasted_iota(jnp.int32, (D * G, KC), 0) % G
    rel = u - o_r  # integer, exact — same expression as binned._row_windows
    t = frac_r + (m - rel).astype(frac_r.dtype)
    vals = phi(t)
    vals = jnp.where((rel >= 0) & (rel < L), vals, 0.0)
    return [vals[d * G : d * G + H] for d in range(D)]


def _windows_and_derivs(pd, orgs, M, m, H, phi_pair):
    """Like :func:`_windows_fused` but also returns the derivative windows
    D_d = dA_d/dpos_d = M * phi'(t) masked like A_d (the floor in the window
    argument is piecewise constant, so d t/d pos = M exactly — matching the
    XLA path, where ``binned._row_windows`` stop-gradients the floor).

    Returns a list of ``(A_d, D_d)`` pairs, each (H, KC). Costs one extra
    whole-array multiply pass over the fused (dim*G, KC) window batch.
    """
    D, KC = pd.shape
    G = -(-H // 8) * 8
    L = 2 * m + 2
    scaled = pd * M
    fl = jnp.floor(scaled)
    frac = scaled - fl
    s_mod = (fl.astype(jnp.int32) - m) % M
    org = jnp.concatenate(
        [jnp.full((1, KC), o, jnp.int32) for o in orgs], axis=0
    )
    o = (s_mod - org) % M
    o_r = jnp.concatenate(
        [jnp.broadcast_to(o[d : d + 1], (G, KC)) for d in range(D)], axis=0
    )
    frac_r = jnp.concatenate(
        [jnp.broadcast_to(frac[d : d + 1], (G, KC)) for d in range(D)], axis=0
    )
    u = jax.lax.broadcasted_iota(jnp.int32, (D * G, KC), 0) % G
    rel = u - o_r
    t = frac_r + (m - rel).astype(frac_r.dtype)
    inb = (rel >= 0) & (rel < L)
    vals, dvals = phi_pair(t)
    vals = jnp.where(inb, vals, 0.0)
    dvals = jnp.where(inb, dvals, 0.0)
    return [
        (vals[d * G : d * G + H], dvals[d * G : d * G + H]) for d in range(D)
    ]


def _khatri_rao(A, t, H):
    """(H^2, KC) rows r = v*H + w holding A[v, k] * t[w, k].

    Both row replications ride broadcasts that fuse into the multiply
    (Mosaic lowers sublane broadcast_to + collapse-reshape without a
    materialized copy), so the KR is ONE whole-array VPU pass — the kernels
    are VPU-pass-bound, so every elementwise pass counts.
    """
    KC = t.shape[1]
    prod = A[:, None, :] * t[None, :, :]  # (H, H, KC)
    return prod.reshape(H * H, KC)


def _chunks(K):
    if K <= _KC:
        return 1, K
    assert K % _KC == 0
    return K // _KC, _KC


def _spread_row_tile(A, xw, H, dim):
    """One row's tile contribution: tile[u, vw] = sum_k A0[u,k] * t2[vw,k]
    with t2 the value-weighted Khatri-Rao of the trailing dims. Precision per
    :func:`kernel_precision` — in bf16kr mode the KR pass runs in bf16 (half
    the VPU traffic of the dominant pass) and the dot is one bf16 MXU pass
    with f32 accumulation."""
    mode = kernel_precision()
    if mode == "bf16kr":
        if dim == 1:
            t2 = xw.astype(jnp.bfloat16)  # tile[u] = sum_k A0[u,k] x[k]
        elif dim == 2:
            t2 = (A[1] * xw).astype(jnp.bfloat16)
        else:
            t2 = _khatri_rao(
                A[1].astype(jnp.bfloat16), (A[2] * xw).astype(jnp.bfloat16), H
            )
        a0 = A[0].astype(jnp.bfloat16)
        prec = jax.lax.Precision.DEFAULT
    else:
        if dim == 1:
            t2 = xw
        elif dim == 2:
            t2 = A[1] * xw
        else:
            t2 = _khatri_rao(A[1], A[2] * xw, H)
        a0 = A[0]
        prec = _PREC.get(mode, jax.lax.Precision.HIGHEST)
    dn = (((1,), (1,)), ((), ()))
    if mode == "high3":
        return _dot_high3(a0, t2, dn)
    return jax.lax.dot_general(
        a0,
        t2,
        dimension_numbers=dn,
        preferred_element_type=jnp.float32,
        precision=prec,
    )


def _spread_kernel(
    row_count_ref,  # scalar prefetch (S,)
    org0_ref,  # scalar prefetch (S,) per axis (2D SMEM operands pad to 128
    org1_ref,  # lanes and blow the SMEM budget)
    org2_ref,
    data_ref,  # (F, K) block: rows [0:C]=x columns, [C:C+3]=coords
    tile_ref,  # (1, C, H, H^{dim-1}) block
    *,
    K,
    C,
    H,
    M,
    m,
    phi,
    dim,
):
    s = pl.program_id(0)
    count = row_count_ref[s]
    n_chunks, KC = _chunks(K)
    W2 = H ** (dim - 1)

    accs = [jnp.zeros((H, W2), jnp.float32) for _ in range(C)]
    for j in range(n_chunks):
        sl = j * KC
        kmask = (
            jax.lax.broadcasted_iota(jnp.int32, (1, KC), 1) + sl < count
        ).astype(jnp.float32)
        orgs = (org0_ref[s], org1_ref[s], org2_ref[s])[:dim]
        A = _windows_fused(
            data_ref[C : C + dim, pl.ds(sl, KC)],
            orgs, M, m, H, phi,
        )
        for c in range(C):
            xw = data_ref[c : c + 1, pl.ds(sl, KC)] * kmask  # (1, KC)
            accs[c] = accs[c] + _spread_row_tile(A, xw, H, dim)
    for c in range(C):
        tile_ref[0, c] = accs[c]


def _spread_dense_kernel(
    row_count_ref,  # scalar prefetch (S,)
    org0_ref,
    org1_ref,
    org2_ref,
    tile_id_ref,  # scalar prefetch (S,): dense tile id per row — drives the
    # output index map AND the first-row-of-tile detection
    data_ref,  # (F, K) block: rows [0:C]=x columns, [C:C+dim]=coords
    zeros_ref,  # aliased (NT, C, H, H^{dim-1}) zeros; never read (ANY space)
    tile_ref,  # (1, C, H, H^{dim-1}) block of the DENSE tile array
    *,
    K,
    C,
    H,
    M,
    m,
    phi,
    dim,
):
    """Spread with IN-KERNEL dense-tile accumulation: consecutive rows of one
    tile accumulate in the VMEM-resident output block (Mosaic only flushes an
    output block when its index map changes), so the separate (S,F)->(NT,F)
    scatter pass — and one full HBM round trip of the per-row tile tensor —
    disappears. Tiles with no rows keep the zeros of the aliased input.
    Requires ``tile_id`` runs to be grouped (plan rows are sorted by
    (batch, tile), so they are).
    """
    s = pl.program_id(0)
    count = row_count_ref[s]
    n_chunks, KC = _chunks(K)

    accs = [jnp.zeros((H, H ** (dim - 1)), jnp.float32) for _ in range(C)]
    for j in range(n_chunks):
        sl = j * KC
        kmask = (
            jax.lax.broadcasted_iota(jnp.int32, (1, KC), 1) + sl < count
        ).astype(jnp.float32)
        orgs = (org0_ref[s], org1_ref[s], org2_ref[s])[:dim]
        A = _windows_fused(
            data_ref[C : C + dim, pl.ds(sl, KC)],
            orgs, M, m, H, phi,
        )
        for c in range(C):
            xw = data_ref[c : c + 1, pl.ds(sl, KC)] * kmask  # (1, KC)
            accs[c] = accs[c] + _spread_row_tile(A, xw, H, dim)

    prev = tile_id_ref[jnp.maximum(s - 1, 0)]
    first = (s == 0) | (tile_id_ref[s] != prev)

    @pl.when(first)
    def _():
        for c in range(C):
            tile_ref[0, c] = accs[c]

    @pl.when(jnp.logical_not(first))
    def _():
        for c in range(C):
            tile_ref[0, c] = tile_ref[0, c] + accs[c]


def spread_tiles_dense_pallas(plan, x, pos, *, C, tile_index, NT, x_slot=None):
    """Fused spread contraction straight into the dense tile array:
    (n, C) points -> (NT, C, H, H^{dim-1}) with same-tile rows accumulated in
    VMEM and untouched tiles exactly zero (input/output aliasing).

    ``tile_index``: (S,) int32 dense tile id per plan row, grouped (each
    tile's rows consecutive — plan order guarantees it); padded rows must
    point at their predecessor's tile (ops/binned.py handles that).
    ``x_slot``: optional (C, S*K) values already in slot order — skips the
    per-call point-order permutation (the slot-layout API)."""
    S = plan.slot_pt.shape[0]
    K, H, M, m = plan.K, plan.H, plan.M, plan.m
    W2 = H ** (plan.dim - 1)
    phi = window_value_fn(m, plan.sigma, plan.window)

    vals = (
        x_slot.astype(jnp.float32)
        if x_slot is not None
        else _slot_values(plan, x.astype(jnp.float32))
    )
    data = jnp.concatenate([vals, plan.slot_pos], axis=0)
    F = data.shape[0]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(S,),
        in_specs=[
            pl.BlockSpec((F, K), lambda s, *_: (0, s), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # aliased zeros, unread
        ],
        out_specs=pl.BlockSpec(
            (1, C, H, W2),
            lambda s, cnt, o0, o1, o2, ti: (ti[s], 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    kernel = functools.partial(
        _spread_dense_kernel, K=K, C=C, H=H, M=M, m=m, phi=phi,
        dim=plan.dim,
    )
    zeros = jnp.zeros((NT, C, H, W2), jnp.float32)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((NT, C, H, W2), jnp.float32,
                                       vma=_out_vma(data, zeros)),
        # input index counts the 5 scalar-prefetch operands: 5=data, 6=zeros
        input_output_aliases={6: 0},
        interpret=_interpret(),
    )(
        plan.row_count,
        *_origin_args(plan),
        tile_index.astype(jnp.int32),
        data,
        zeros,
    )


def _gather_kernel(
    row_count_ref,
    org0_ref,
    org1_ref,
    org2_ref,
    tile_index_ref,  # scalar prefetch (S,): tile block id per row (drives the
    # tile_in_ref index map; unused in the body)
    tile_in_ref,  # (1, C, H, H^{dim-1}) block
    data_ref,  # (F, K) block: rows [0:dim]=coords
    y_ref,  # (1, C, K) block
    *,
    K,
    C,
    H,
    M,
    m,
    phi,
    dim,
):
    s = pl.program_id(0)
    count = row_count_ref[s]
    n_chunks, KC = _chunks(K)

    for j in range(n_chunks):
        sl = j * KC
        kmask = (
            jax.lax.broadcasted_iota(jnp.int32, (1, KC), 1) + sl < count
        ).astype(jnp.float32)
        orgs = (org0_ref[s], org1_ref[s], org2_ref[s])[:dim]
        A = _windows_fused(
            data_ref[0:dim, pl.ds(sl, KC)],
            orgs, M, m, H, phi,
        )
        mode = kernel_precision()
        bf = mode == "bf16kr"
        if dim == 1:
            # y[k] = sum_u A0[u, k] * G[u, 0]: one broadcast-multiply pass
            # (G's single lane splats over K) + a sublane reduce.
            for c in range(C):
                G = tile_in_ref[0, c]  # (H, 1)
                yk = jnp.sum(A[0] * G, axis=0, keepdims=True) * kmask
                y_ref[0, c : c + 1, pl.ds(sl, KC)] = yk
            continue
        # B[v*H + w, k] = A1[v, k] * A2[w, k]  (3D); B = A1 (2D)
        if dim == 3:
            B = (
                _khatri_rao(
                    A[1].astype(jnp.bfloat16), A[2].astype(jnp.bfloat16), H
                )
                if bf
                else _khatri_rao(A[1], A[2], H)
            )
        else:
            B = A[1].astype(jnp.bfloat16) if bf else A[1]
        a0 = A[0]
        prec = _PREC.get(mode, jax.lax.Precision.HIGHEST)
        dn = (((1,), (0,)), ((), ()))
        for c in range(C):
            G = tile_in_ref[0, c]  # (H, H^{dim-1})
            # s[u, k] = sum_vw G[u, vw] B[vw, k]: contraction DEEP over the
            # H^{dim-1} axis with a small (H, KC) output — the MXU-friendly
            # association (contracting the H-deep axis with a (W2, KC)
            # output, the other association, measures ~2x slower).
            # NB: do not name this `s` — that shadows the program_id above,
            # and the next K-chunk's org?_ref[s] would index with this
            # (H, KC) array (crashed every K > _KC plan on device).
            if mode == "high3":
                sG = _dot_high3(G, B, dn)
            else:
                sG = jax.lax.dot_general(
                    G.astype(jnp.bfloat16) if bf else G,
                    B,
                    dimension_numbers=dn,
                    preferred_element_type=jnp.float32,
                    precision=prec,
                )  # (H, KC)
            # y[k] = sum_u A0[u, k] * sG[u, k]
            yk = jnp.sum(a0 * sG, axis=0, keepdims=True) * kmask  # (1, KC)
            y_ref[0, c : c + 1, pl.ds(sl, KC)] = yk


def _slot_values(plan, x):
    """Feature-major slot-ordered values: (C, S*K) from x (n, C).

    Executed as a SORT by destination slot: padding x with S*K - n zeros and
    sorting by ``plan.fill_keys`` (a permutation of [0, S*K)) places x[i] at
    slot inv_slot[i] and exact zeros in every invalid slot. XLA's sort moves
    data in structured passes and measures ~102 ms at the 3D headline
    (S*K = 19.3M) where the unique-index scatter — itself ~30% faster than
    any gather formulation — takes ~132 ms and random-access formulations
    are issue-bound at ~11 ns/element (examples/probe_permute_sort.py).
    Coordinates never need this — the plan precomputes plan.slot_pos.

    Plans upgraded with routed Benes masks (plan.with_benes_tables())
    apply the permutation in 2*log2(n)-1 masked exchange stages instead —
    ~42 ms vs ~100 ms at the headline (ops/pallas/benes.py)."""
    S, K = plan.slot_pt.shape
    n, C = x.shape
    bt = getattr(plan, "benes", None)
    if bt is not None:
        from .benes import apply_benes

        interp = _interpret()
        compact = getattr(bt, "compact", False)
        if compact:
            # compact tables route user -> RANK (n points, not S*K slots);
            # the padded slot layout is produced by one ragged expansion
            # pass per column (ops/pallas/ragged.py)
            from .ragged import expand_rows, row_start_from_counts

            rs = row_start_from_counts(plan.row_count)
            need = ((n - 1) // K + 2) * K  # expand_rows input length
        cols = []
        for c in range(C):
            v = jnp.concatenate(
                [x[:, c], jnp.zeros((bt.n - n,), x.dtype)]
            )
            out = apply_benes(v, bt.cross_words, bt.local_words,
                              block_log2=bt.b, interpret=interp)
            if compact:
                if out.shape[0] < need:
                    out = jnp.concatenate(
                        [out, jnp.zeros((need - out.shape[0],), out.dtype)]
                    )
                padded = expand_rows(out[:need], rs, plan.row_count, K=K,
                                     interpret=interp)
                cols.append(padded.reshape(-1))
            else:
                cols.append(out[: S * K])
        return jnp.stack(cols, axis=0)
    pad = jnp.zeros((S * K - n, C), x.dtype)
    vals = jnp.concatenate([x, pad], axis=0)
    sorted_ops = jax.lax.sort(
        [plan.fill_keys] + [vals[:, c] for c in range(C)],
        num_keys=1, is_stable=False,
    )
    return jnp.stack(sorted_ops[1:], axis=0)  # (C, S*K)


def _unslot_values(plan, out_flat, n):
    """(S*K, C) slot-ordered values -> (n, C) user order: the transpose of
    :func:`_slot_values`, again as a sort by destination — valid slots carry
    their user index (a permutation of [0, n)), padding slots the sentinel n
    and sort to the dropped tail. ~100 ms vs the scatter's ~174 ms at the 3D
    headline (examples/probe_permute_sort.py).

    With routed Benes masks on the plan, runs the slot network in REVERSE —
    the same masks apply the inverse permutation (slot -> user)."""
    S, K = plan.slot_pt.shape
    C = out_flat.shape[1]
    bt = getattr(plan, "benes", None)
    if bt is not None:
        from .benes import apply_benes

        interp = _interpret()
        compact = getattr(bt, "compact", False)
        if compact:
            # compact the padded slot rows to the rank stream first (the
            # ragged pass drops invalid lanes), then run the rank network
            # in reverse to reach user order
            from .ragged import compact_rows, row_start_from_counts

            rs = row_start_from_counts(plan.row_count)
        cols = []
        for c in range(C):
            if compact:
                stream = compact_rows(out_flat[:, c].reshape(S, K), rs,
                                      plan.row_count, n, interpret=interp)
                v = jnp.concatenate(
                    [stream,
                     jnp.zeros((bt.n - stream.shape[0],), out_flat.dtype)]
                )
            else:
                v = jnp.concatenate(
                    [out_flat[:, c],
                     jnp.zeros((bt.n - S * K,), out_flat.dtype)]
                )
            out = apply_benes(v, bt.cross_words, bt.local_words,
                              block_log2=bt.b, reverse=True,
                              interpret=interp)
            cols.append(out[:n])
        return jnp.stack(cols, axis=1)
    k_iota = jnp.arange(K, dtype=jnp.int32)[None, :]
    valid = k_iota < plan.row_count[:, None]
    keys = jnp.where(valid, plan.slot_pt, n).reshape(-1)
    sorted_ops = jax.lax.sort(
        [keys] + [out_flat[:, c] for c in range(C)],
        num_keys=1, is_stable=False,
    )
    return jnp.stack(sorted_ops[1:], axis=1)[:n]


def _origin_args(plan):
    """Three 1D origin prefetch vectors (the unused tail repeats axis 0 for
    dim == 2 — 2D SMEM operands would pad to 128 lanes and blow SMEM)."""
    d = plan.dim
    return tuple(plan.origin[:, min(i, d - 1)] for i in range(3))


def spread_tiles_pallas(plan, x, pos, *, C):
    """Fused tile contraction: (n, C) points -> (S, C, H, H^{dim-1}) tiles."""
    S = plan.slot_pt.shape[0]
    K, H, M, m = plan.K, plan.H, plan.M, plan.m
    W2 = H ** (plan.dim - 1)
    phi = window_value_fn(m, plan.sigma, plan.window)

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
            (1, C, H, W2), lambda s, *_: (s, 0, 0, 0), memory_space=pltpu.VMEM
        ),
    )
    kernel = functools.partial(
        _spread_kernel, K=K, C=C, H=H, M=M, m=m, phi=phi,
        dim=plan.dim,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((S, C, H, W2), jnp.float32,
                                       vma=_out_vma(data)),
        interpret=_interpret(),
    )(plan.row_count, *_origin_args(plan), data)


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
    W2 = H ** (plan.dim - 1)
    phi = window_value_fn(m, plan.sigma, plan.window)
    if tile_index is None:
        tile_index = jnp.arange(S, dtype=jnp.int32)

    data = plan.slot_pos  # (dim, S*K): zero per-call gathers
    F = data.shape[0]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(S,),
        in_specs=[
            pl.BlockSpec(
                (1, C, H, W2),
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
        _gather_kernel, K=K, C=C, H=H, M=M, m=m, phi=phi,
        dim=plan.dim,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((S, C, K), jnp.float32,
                                       vma=_out_vma(tiles, data)),
        interpret=_interpret(),
    )(
        plan.row_count,
        *_origin_args(plan),
        tile_index.astype(jnp.int32),
        tiles,
        data,
    )


def _pos_grad_kernel(
    row_count_ref,
    org0_ref,
    org1_ref,
    org2_ref,
    tile_index_ref,  # scalar prefetch (S,): tile block id per row
    tile_in_ref,  # (1, C, H, H^{dim-1}) block — the tile-space cotangent
    data_ref,  # (F, K) block: rows [0:C]=w columns, [C:C+dim]=coords
    dpos_ref,  # (1, dim, K) block
    *,
    K,
    C,
    H,
    M,
    m,
    phi,
    dim,
):
    """Fused position-gradient contraction. For each point k,

        dpos[k, d] = sum_c w[c, k] * sum_cells T[c, cells]
                     * prod_{e != d} A_e[u_e, k] * D_d[u_d, k]

    — i.e. a gather with the derivative window on axis d, weighted by the
    per-point cotangent/value w. One kernel emits all ``dim`` axes, sharing
    the loaded tile block and (for axis 0) the gather's own inner matmul.
    This is what the XLA backward materializes (R, K, dim, H) residuals
    for; here everything stays in VMEM (~3x one gather's MXU work in 3D).
    """
    s = pl.program_id(0)
    count = row_count_ref[s]
    n_chunks, KC = _chunks(K)
    mode = kernel_precision()
    bf = mode == "bf16kr"
    prec = _PREC.get(mode, jax.lax.Precision.HIGHEST)
    dn = (((1,), (0,)), ((), ()))

    def dot(G, B):
        return jax.lax.dot_general(
            G.astype(jnp.bfloat16) if bf else G,
            B.astype(jnp.bfloat16) if bf else B,
            dimension_numbers=dn,
            preferred_element_type=jnp.float32,
            precision=prec,
        )

    for j in range(n_chunks):
        sl = j * KC
        kmask = (
            jax.lax.broadcasted_iota(jnp.int32, (1, KC), 1) + sl < count
        ).astype(jnp.float32)
        orgs = (org0_ref[s], org1_ref[s], org2_ref[s])[:dim]
        AD = _windows_and_derivs(
            data_ref[C : C + dim, pl.ds(sl, KC)],
            orgs, M, m, H, phi,
        )
        accs = [jnp.zeros((1, KC), jnp.float32) for _ in range(dim)]
        for c in range(C):
            w = data_ref[c : c + 1, pl.ds(sl, KC)] * kmask  # (1, KC)
            G = tile_in_ref[0, c]  # (H, H^{dim-1})
            if dim == 1:
                accs[0] = accs[0] + w * jnp.sum(
                    AD[0][1] * G, axis=0, keepdims=True
                )
                continue
            if dim == 2:
                sv = dot(G, AD[1][0])  # (H, KC), shared gather contraction
                accs[0] = accs[0] + w * jnp.sum(
                    AD[0][1] * sv, axis=0, keepdims=True
                )
                sd = dot(G, AD[1][1])
                accs[1] = accs[1] + w * jnp.sum(
                    AD[0][0] * sd, axis=0, keepdims=True
                )
                continue
            # dim == 3: share the gather's own s = G @ KR(A1, A2) for axis 0,
            # then one derivative Khatri-Rao + dot per trailing axis.
            B = _khatri_rao(AD[1][0], AD[2][0], H)
            sv = dot(G, B)
            accs[0] = accs[0] + w * jnp.sum(
                AD[0][1] * sv, axis=0, keepdims=True
            )
            B1 = _khatri_rao(AD[1][1], AD[2][0], H)
            accs[1] = accs[1] + w * jnp.sum(
                AD[0][0] * dot(G, B1), axis=0, keepdims=True
            )
            B2 = _khatri_rao(AD[1][0], AD[2][1], H)
            accs[2] = accs[2] + w * jnp.sum(
                AD[0][0] * dot(G, B2), axis=0, keepdims=True
            )
        for d in range(dim):
            dpos_ref[0, d : d + 1, pl.ds(sl, KC)] = accs[d]


def pos_grad_pallas(plan, tiles, w, *, C, tile_index=None, w_slot=None):
    """Fused position-gradient: tile-space cotangent + per-point weights ->
    (S, dim, K) slot-ordered dpos (ops/binned.py unslots to (n, dim)).

    ``tiles``: (NT, C, H, H^{dim-1}) — the unfolded grid cotangent (spread
    backward) or the unfolded primal grid (gather backward). ``w``: (n, C)
    point weights — the primal values x (spread backward) or the point
    cotangent y-bar (gather backward). ``w_slot``: optional (C, S*K)
    slot-ordered weights instead of ``w`` (the slot-layout API's backward
    passes already hold them in this layout).
    """
    S = plan.slot_pt.shape[0]
    K, H, M, m = plan.K, plan.H, plan.M, plan.m
    W2 = H ** (plan.dim - 1)
    phi = window_value_and_deriv_fn(m, plan.sigma, plan.window, M=M)
    if tile_index is None:
        tile_index = jnp.arange(S, dtype=jnp.int32)

    wv = (
        w_slot.astype(jnp.float32)
        if w_slot is not None
        else _slot_values(plan, w.astype(jnp.float32))
    )
    data = jnp.concatenate([wv, plan.slot_pos], axis=0)
    F = data.shape[0]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(S,),
        in_specs=[
            pl.BlockSpec(
                (1, C, H, W2),
                lambda s, cnt, o0, o1, o2, ti: (ti[s], 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((F, K), lambda s, *_: (0, s), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, plan.dim, K), lambda s, *_: (s, 0, 0), memory_space=pltpu.VMEM
        ),
    )
    kernel = functools.partial(
        _pos_grad_kernel, K=K, C=C, H=H, M=M, m=m, phi=phi,
        dim=plan.dim,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((S, plan.dim, K), jnp.float32,
                                       vma=_out_vma(tiles, data)),
        interpret=_interpret(),
    )(
        plan.row_count,
        *_origin_args(plan),
        tile_index.astype(jnp.int32),
        tiles,
        data,
    )


# ---------------------------------------------------------------------------
# Row-batched kernels: R plan rows per grid step.
#
# The per-row kernels above are step-overhead-bound (~1 us per grid step on
# v5e — small per-step DMAs + pipeline fixed cost; measured in BASELINE.md
# round-4, ~40 ms of the 110 ms headline pair across both sides). These
# variants amortize that cost: one (F, R*K) input DMA covers R rows, the
# window evaluation for all R rows runs as ONE fused (dim*G, R*K) vector
# batch (per-lane tile origins), and the dots unroll over the R rows inside
# the step. Outputs are per-ROW tiles (R, C, H, W2) per step — the dense
# accumulation moves out of the kernel into an exact take + tiny overflow
# scatter (ops/binned.py:_dense_from_rowtiles), sized statically from the
# plan's S_occ group count.
#
# The grid ceil-divides S; the ragged last block's out-of-bounds lanes are
# masked AND the coordinates selected to 0.0 first (OOB VMEM reads are
# undefined bits — a NaN there would poison the dot through 0*NaN).
# ---------------------------------------------------------------------------


def _windows_fused_lanes(pd, org_lane, M, m, H, phi):
    """:func:`_windows_fused` with per-LANE tile origins: the lane axis
    concatenates R rows' K-chunks, each with its own origin. Same math,
    same single fused vector batch."""
    D, Lt = pd.shape
    G = -(-H // 8) * 8
    L = 2 * m + 2
    scaled = pd * M
    fl = jnp.floor(scaled)
    frac = scaled - fl
    s_mod = (fl.astype(jnp.int32) - m) % M
    o = (s_mod - org_lane) % M  # (D, Lt), in [0, T)
    o_r = jnp.concatenate(
        [jnp.broadcast_to(o[d : d + 1], (G, Lt)) for d in range(D)], axis=0
    )
    frac_r = jnp.concatenate(
        [jnp.broadcast_to(frac[d : d + 1], (G, Lt)) for d in range(D)], axis=0
    )
    u = jax.lax.broadcasted_iota(jnp.int32, (D * G, Lt), 0) % G
    rel = u - o_r
    t = frac_r + (m - rel).astype(frac_r.dtype)
    vals = phi(t)
    vals = jnp.where((rel >= 0) & (rel < L), vals, 0.0)
    return [vals[d * G : d * G + H] for d in range(D)]


def _rb_lane_tables(s, R, K, dim, lane, row_count_ref, org_refs):
    """Per-lane origin rows (dim, R*K) + the valid-lane cutoff (1, R*K)
    (lane < cutoff iff the lane's slot is filled), built from the R per-row
    SMEM scalars of this step."""
    Lt = R * K
    orgs = [jnp.zeros((1, Lt), jnp.int32) for _ in range(dim)]
    cut = jnp.zeros((1, Lt), jnp.int32)
    for r in range(R):
        in_r = (lane >= r * K) & (lane < (r + 1) * K)
        cut = jnp.where(in_r, row_count_ref[s * R + r] + r * K, cut)
        for d in range(dim):
            orgs[d] = jnp.where(in_r, org_refs[d][s * R + r], orgs[d])
    return jnp.concatenate(orgs, axis=0), cut


def _spread_rb_kernel(
    row_count_ref,  # scalar prefetch (S_pad,)
    org0_ref,
    org1_ref,
    org2_ref,
    data_ref,  # (F, R*K) block: rows [0:C]=x columns, [C:C+dim]=coords
    out_ref,  # (R, C, H, H^{dim-1}) block — per-ROW tiles
    *,
    R,
    K,
    C,
    H,
    M,
    m,
    phi,
    dim,
    SK,
):
    s = pl.program_id(0)
    Lt = R * K
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, Lt), 1)
    lane_ok = lane + s * Lt < SK
    org_lane, cut = _rb_lane_tables(
        s, R, K, dim, lane, row_count_ref, (org0_ref, org1_ref, org2_ref)
    )
    fm = ((lane < cut) & lane_ok).astype(jnp.float32)  # (1, Lt)
    pd = data_ref[C : C + dim, :]
    pd = jnp.where(lane_ok, pd, 0.0)  # OOB tail lanes: undefined bits
    A = _windows_fused_lanes(pd, org_lane, M, m, H, phi)
    for r in range(R):
        sl = r * K
        Ar = [a[:, sl : sl + K] for a in A]
        for c in range(C):
            xw = data_ref[c : c + 1, sl : sl + K] * fm[:, sl : sl + K]
            out_ref[r, c] = _spread_row_tile(Ar, xw, H, dim)


def spread_tiles_rb_pallas(plan, x, pos, *, C, R, x_slot=None):
    """Row-batched fused spread contraction: (n, C) points -> per-ROW tiles
    (S, C, H, H^{dim-1}) with R rows per grid step. Same math as
    :func:`spread_tiles_pallas`; ops/binned.py composes the dense tile array
    from these rows (take of each tile's first row + exact overflow
    scatter). Requires K <= the lane chunk (1024)."""
    S, K = plan.slot_pt.shape
    H, M, m = plan.H, plan.M, plan.m
    W2 = H ** (plan.dim - 1)
    phi = window_value_fn(m, plan.sigma, plan.window)

    vals = (
        x_slot.astype(jnp.float32)
        if x_slot is not None
        else _slot_values(plan, x.astype(jnp.float32))
    )
    data = jnp.concatenate([vals, plan.slot_pos], axis=0)
    F = data.shape[0]
    n_steps = -(-S // R)
    S_pad = n_steps * R
    rc = jnp.pad(plan.row_count, (0, S_pad - S))
    o0, o1, o2 = (jnp.pad(v, (0, S_pad - S)) for v in _origin_args(plan))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec(
                (F, R * K), lambda s, *_: (0, s), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (R, C, H, W2), lambda s, *_: (s, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    kernel = functools.partial(
        _spread_rb_kernel, R=R, K=K, C=C, H=H, M=M, m=m, phi=phi,
        dim=plan.dim, SK=S * K,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((S_pad, C, H, W2), jnp.float32,
                                       vma=_out_vma(data)),
        interpret=_interpret(),
    )(rc, o0, o1, o2, data)
    return out[:S]


def _gather_rb_kernel(
    row_count_ref,
    org0_ref,
    org1_ref,
    org2_ref,
    tiles_ref,  # (R, C, H, H^{dim-1}) block — per-row tile reads
    data_ref,  # (dim, R*K) block: slot coordinates
    y_ref,  # (R, C, K) block
    *,
    R,
    K,
    C,
    H,
    M,
    m,
    phi,
    dim,
    SK,
):
    s = pl.program_id(0)
    Lt = R * K
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, Lt), 1)
    lane_ok = lane + s * Lt < SK
    org_lane, cut = _rb_lane_tables(
        s, R, K, dim, lane, row_count_ref, (org0_ref, org1_ref, org2_ref)
    )
    fm = ((lane < cut) & lane_ok).astype(jnp.float32)
    pd = data_ref[0:dim, :]
    pd = jnp.where(lane_ok, pd, 0.0)
    A = _windows_fused_lanes(pd, org_lane, M, m, H, phi)

    mode = kernel_precision()
    bf = mode == "bf16kr"
    prec = _PREC.get(mode, jax.lax.Precision.HIGHEST)
    dn = (((1,), (0,)), ((), ()))
    for r in range(R):
        sl = r * K
        Ar = [a[:, sl : sl + K] for a in A]
        fmr = fm[:, sl : sl + K]
        if dim == 1:
            for c in range(C):
                G = tiles_ref[r, c]  # (H, 1)
                yk = jnp.sum(Ar[0] * G, axis=0, keepdims=True) * fmr
                y_ref[r, c : c + 1, :] = yk
            continue
        if dim == 3:
            B = (
                _khatri_rao(
                    Ar[1].astype(jnp.bfloat16), Ar[2].astype(jnp.bfloat16), H
                )
                if bf
                else _khatri_rao(Ar[1], Ar[2], H)
            )
        else:
            B = Ar[1].astype(jnp.bfloat16) if bf else Ar[1]
        for c in range(C):
            G = tiles_ref[r, c]  # (H, H^{dim-1})
            if mode == "high3":
                sG = _dot_high3(G, B, dn)
            else:
                sG = jax.lax.dot_general(
                    G.astype(jnp.bfloat16) if bf else G,
                    B,
                    dimension_numbers=dn,
                    preferred_element_type=jnp.float32,
                    precision=prec,
                )  # (H, K)
            yk = jnp.sum(Ar[0] * sG, axis=0, keepdims=True) * fmr
            y_ref[r, c : c + 1, :] = yk


def gather_points_rb_pallas(plan, tiles_rows, *, C, R):
    """Row-batched fused point interpolation: per-row tile reads
    (S_pad, C, H, H^{dim-1}) -> (S, C, K) slot values, R rows per grid step.
    ``tiles_rows`` is the dense tile array already expanded to row order
    (one take per transform; ops/binned.py)."""
    S, K = plan.slot_pt.shape
    H, M, m = plan.H, plan.M, plan.m
    W2 = H ** (plan.dim - 1)
    phi = window_value_fn(m, plan.sigma, plan.window)

    data = plan.slot_pos
    F = data.shape[0]
    n_steps = -(-S // R)
    S_pad = n_steps * R
    if tiles_rows.shape[0] != S_pad:
        raise ValueError(
            f"tiles_rows has {tiles_rows.shape[0]} rows, expected {S_pad}"
        )
    rc = jnp.pad(plan.row_count, (0, S_pad - S))
    o0, o1, o2 = (jnp.pad(v, (0, S_pad - S)) for v in _origin_args(plan))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec(
                (R, C, H, W2), lambda s, *_: (s, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (F, R * K), lambda s, *_: (0, s), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (R, C, K), lambda s, *_: (s, 0, 0), memory_space=pltpu.VMEM
        ),
    )
    kernel = functools.partial(
        _gather_rb_kernel, R=R, K=K, C=C, H=H, M=M, m=m, phi=phi,
        dim=plan.dim, SK=S * K,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((S_pad, C, K), jnp.float32,
                                       vma=_out_vma(tiles_rows, data)),
        interpret=_interpret(),
    )(rc, o0, o1, o2, tiles_rows, data)
    return out[:S]
