"""Dense-tile overlap-add: move halo tiles to/from the oversampled grid with
reshapes, rolls and adds only — no windowed scatter/gather in the hot path.

The binned engine (ops/binned.py) forms per-row halo tiles of shape
``(H,)*dim`` with ``H = T + 2m + 1`` (tile body T plus the window spill of
``2m+1`` cells, reference window semantics at
``spatial_window_operations.cu:38-97``). Round-1 moved those tiles with
``lax.scatter_add`` / ``lax.gather`` carrying ``(H,)*dim`` update windows —
correct, but the ``(H, H)`` minor dims of the updates pay ~6.5x TPU layout
padding, which made tile movement the dominant fixed cost (~350 ms at the 3D
N=256 headline).

This module replaces that movement with a dense overlap-add. Key facts:

* tile origins are multiples of T, so the *dense* tile array indexed by
  ``(batch, tile_0, ..., tile_{dim-1})`` covers the grid exactly;
* the halo spill ``E = H - T = 2m + 1`` fits inside one neighbouring tile
  whenever ``E <= T`` (guaranteed by ops/binned.py:default_tile), so folding
  a tile axis onto the grid is ``grid[b*T + u] += tile[b, u]`` — a reshape of
  the body plus a single ``jnp.roll`` of the zero-padded tail. The periodic
  wrap of the NFFT grid (``(shift + l) mod M``, reference
  ``spatial_window_operations.cu:150``) is exactly the roll's wraparound.

TPU layout rule that shapes this code: XLA stores every array tiled on the
two minor dims of its layout ((8, 128) for f32), so any *materialized*
intermediate whose axes are all small (nb ~ 32, H ~ 25, C ~ 1) pays up to
~5x physical padding — at the 3D N=256 headline that is a 10-20 GB
allocation and an immediate OOM. The 3D paths below therefore keep a large
flat axis (M = 512 or H^2*C >= 625) as the trailing (minor) axis of every
transpose/concat result. The natural endpoint of that discipline is the
"DFT layout" ``(B, M_1, ..., M_{dim-1}, C, M_0)``: grid axis 0 sits minor,
which is also exactly the axis the pruned spectral matmuls
(ops/fft.py:spectral_*_pruned_dft) want to contract first — the planar
pipelines chain fold -> DFT with no layout hazard in between.

Everything is pure jnp (reshape/slice/pad/roll/concat/add/transpose), so XLA
lays it out as full-bandwidth memory passes and gradients flow through
unchanged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "fold_geometry_ok",
    "use_fold",
    "row_tile_ids",
    "fold_tiles_to_grid",
    "unfold_grid_to_tiles",
    "fold_tiles_to_grid_dft",
    "unfold_grid_to_tiles_dft",
    "grid_flat_to_dft",
    "grid_dft_to_flat",
]


def fold_geometry_ok(plan) -> bool:
    """The overlap-add requires tiles that exactly partition the grid
    (M % T == 0) and a halo spill no longer than one tile (E <= T)."""
    return plan.M % plan.T == 0 and (plan.H - plan.T) <= plan.T


def use_fold(
    plan, C: int, itemsize: int, batch_size: int, budget: int = 6 << 30,
    compact: bool = False,
) -> bool:
    """Whether the dense tile array (NT, C*H^dim) fits the memory budget.

    The dense array costs ``(H/T)^dim`` times the grid itself (~3.8x at the
    3D m=4 default) — or only the active slab's share when ``compact``;
    above the budget the caller keeps the windowed scatter/gather fallback.
    """
    if not fold_geometry_ok(plan):
        return False
    nt = batch_size
    for _, a in active_axes(plan, compact):
        nt *= a
    f = C * plan.H**plan.dim
    return nt * f * itemsize <= budget


def active_axes(plan, compact: bool):
    """Per-axis (start_tile, num_tiles) of the slab the fold operates on:
    the plan's active runs when ``compact``, else the full axes."""
    nb = plan.M // plan.T
    if compact and plan.active is not None:
        return tuple(plan.active)
    return tuple((0, nb) for _ in range(plan.dim))


def compact_cells(plan) -> tuple | None:
    """Per-axis (cell_offset, cell_count) of the compact slab, for building
    offset pruned-DFT matrices (ops/fft.py). None when no compaction."""
    if plan.active is None or plan.dim != 3:
        return None
    T = plan.T
    return tuple((s * T, a * T) for (s, a) in plan.active)


def tile_array_bytes(plan, C: int, itemsize: int, batch_size: int,
                     compact: bool = False) -> int:
    """Size of the dense tile array (NT, C*H^dim) the fold paths materialize."""
    nt = batch_size * 1
    for _, a in active_axes(plan, compact):
        nt *= a
    return nt * C * plan.H**plan.dim * itemsize


def row_tile_ids(plan, compact: bool = False) -> jax.Array:
    """(S,) int32 linear dense-tile id per plan row:
    ``((batch*A_0 + t_0)*A_1 + t_1)* ...`` with ``t_d = origin_d / T``
    (relative to the compact slab start when ``compact``).

    Per-axis indices clamp into the slab: only padded rows (row_count == 0,
    origin 0 — e.g. from plan_stack.pad_plan_rows) can fall outside, their
    contributions are masked to zero everywhere, and the clamp keeps the
    Pallas block index maps in bounds.
    """
    nb = plan.M // plan.T
    axes = active_axes(plan, compact)
    t = plan.origin // plan.T  # (S, dim)
    tid = plan.row_batch.astype(jnp.int32)
    for d in range(plan.dim):
        s, a = axes[d]
        tid = tid * a + jnp.minimum((t[:, d] - s) % nb, a - 1)
    return tid


def _geom(plan):
    return plan.dim, plan.T, plan.H, plan.M, plan.M // plan.T, plan.H - plan.T


# ---------------------------------------------------------------------------
# dim <= 2: grids are small (M^dim*C a few MB at most), so the simple
# interleave transpose is fine even though its all-small-axes intermediates
# pad. dim == 3 uses the layout-careful scheme further down.
# ---------------------------------------------------------------------------


def _fold_simple(tiles_dense, plan, batch_size: int, C: int):
    dim, T, H, M, nb, E = _geom(plan)
    arr = tiles_dense.reshape((batch_size,) + (nb,) * dim + (C,) + (H,) * dim)
    # Interleave each tile-index axis with its halo axis:
    # (B, nb_0, H_0, nb_1, H_1, ..., C).
    perm = [0]
    for d in range(dim):
        perm += [1 + d, 2 + dim + d]
    perm.append(1 + dim)
    arr = arr.transpose(perm)
    for d in range(dim):
        # After folding the first d pairs they occupy axes [1, 1+d); the
        # current (nb, H) pair sits at (1+d, 2+d).
        ax = 1 + d
        body_e = jax.lax.slice_in_dim(arr, 0, E, axis=ax + 1)
        body_rest = jax.lax.slice_in_dim(arr, E, T, axis=ax + 1)
        tail = jax.lax.slice_in_dim(arr, T, H, axis=ax + 1)
        # tile b's tail lands at cells ((b+1)*T + v) mod M: roll the small
        # tail one tile forward (the wraparound IS the periodic boundary)
        # and add it into the body's first E cells. Expressed as elementwise
        # add + concat — XLA fuses these at full bandwidth, where the
        # at[...].add scatter formulation measured ~2x slower.
        merged = body_e + jnp.roll(tail, 1, axis=ax)
        body = jnp.concatenate([merged, body_rest], axis=ax + 1)
        shp = arr.shape[:ax] + (M,) + arr.shape[ax + 2 :]
        arr = body.reshape(shp)
    return arr.reshape(batch_size * M**dim, C)


def _unfold_simple(g_flat, plan, batch_size: int):
    dim, T, H, M, nb, E = _geom(plan)
    C = g_flat.shape[1]
    arr = g_flat.reshape((batch_size,) + (M,) * dim + (C,))
    for d in range(dim):
        # Each completed split inserted one extra axis before the next M axis.
        ax = 1 + 2 * d
        shp_split = arr.shape[:ax] + (nb, T) + arr.shape[ax + 1 :]
        body = arr.reshape(shp_split)
        # tile[b, T + v] = grid[((b+1)*T + v) mod M] = row b+1's cell v:
        # slice the small head first, then roll one tile backward.
        head = jax.lax.slice_in_dim(body, 0, E, axis=ax + 1)
        tail = jnp.roll(head, -1, axis=ax)
        arr = jnp.concatenate([body, tail], axis=ax + 1)
    # (B, nb_0, H_0, nb_1, H_1, ..., C) -> (B, nb_0, ..., C, H_0, ...)
    perm = (
        [0]
        + [1 + 2 * d for d in range(dim)]
        + [1 + 2 * dim]
        + [2 + 2 * d for d in range(dim)]
    )
    arr = arr.transpose(perm)
    return arr.reshape((batch_size * nb**dim, C) + (H,) * dim)


# ---------------------------------------------------------------------------
# dim == 3, layout-careful: every materialized intermediate keeps a >= M or
# >= H^2 flat trailing axis, ending in / starting from the DFT layout
# (B, M1, M2, C, M0).
# ---------------------------------------------------------------------------


def _pair_fold(a, T: int, H: int, M: int, E: int):
    """One (nb, H) -> M overlap-add on ``a`` of shape (P, nb, H, Z, W):
    returns (P, M, Z, W). One transpose already applied by the caller so the
    halo axis sits right of nb; minor axis W stays minor throughout.

    Tile b's tail (cells T..H-1) lands at cells ((b+1)*T + v) mod M — row
    b+1's first E body cells, with the roll's wraparound providing the
    periodic boundary. Formulated as elementwise add + concat of static
    slices: measured A/B on TPU (examples/profile_fold_ab.py) — concat
    ~16 ms/pass net at the batched 2 GiB shape vs ~32 for at[...].add
    (scatter lowering) vs ~45 for pad-to-T + full-array roll + add."""
    P, nb, _, Z, W = a.shape
    body_e = jax.lax.slice_in_dim(a, 0, E, axis=2)  # (P, nb, E, Z, W)
    body_rest = jax.lax.slice_in_dim(a, E, T, axis=2)
    tail = jax.lax.slice_in_dim(a, T, H, axis=2)  # (P, nb, E, Z, W)
    merged = body_e + jnp.roll(tail, 1, axis=1)
    return jnp.concatenate([merged, body_rest], axis=2).reshape(P, M, Z, W)


def _fold3_dft(tiles_dense, plan, batch_size: int, C: int, compact: bool = False):
    """(NT, C*H^3) -> DFT-layout grid (B, L1, L2, C, L0), with L_d = A_d*T
    the (possibly compact) slab length per axis."""
    dim, T, H, M, nb, E = _geom(plan)
    (s0, A0), (s1, A1), (s2, A2) = active_axes(plan, compact)
    L0, L1, L2 = A0 * T, A1 * T, A2 * T
    B = batch_size
    # pair 0: (B, A0, Z0=A1*A2*C, H0, W0=H*H) with H0 moved next to A0
    a = tiles_dense.reshape(B, A0, A1 * A2 * C, H, H * H)
    a = a.transpose(0, 1, 3, 2, 4)  # (B, A0, H0, Z0, W0): minor W0 = H^2
    g = _pair_fold(a, T, H, L0, E)  # (B, L0, Z0, W0)
    # park grid axis 0 on the minor: (B, Z0, W0, L0)
    g = g.transpose(0, 2, 3, 1)
    # pair 1: Z0 = (A1, A2*C), W0 = (H1, H2)
    a = g.reshape(B, A1, A2 * C, H, H * L0)  # (B, A1, Z1, H1, W1=H2*L0)
    a = a.transpose(0, 1, 3, 2, 4)  # minor H2*L0
    g = _pair_fold(a, T, H, L1, E)  # (B, L1, A2*C, H2*L0)
    # pair 2
    a = g.reshape(B * L1, A2, C, H, L0)  # (BL1, A2, Z2=C, H2, W2=L0)
    a = a.transpose(0, 1, 3, 2, 4)  # minor L0
    g = _pair_fold(a, T, H, L2, E)  # (B*L1, L2, C, L0)
    return g.reshape(B, L1, L2, C, L0)


def _pair_unfold(g, T: int, H: int, M: int, E: int, nb: int):
    """Inverse reads of :func:`_pair_fold`: (P, M, Z, W) -> (P, nb, H, Z, W)
    where tile[b, u] = grid[(b*T + u) mod M]. Tile b's tail cells are row
    b+1's first E body cells; slice first, then roll only the small tail
    (the full-array roll this replaces cost an extra full pass)."""
    P, _, Z, W = g.shape
    body = g.reshape(P, nb, T, Z, W)
    tail = jnp.roll(
        jax.lax.slice_in_dim(body, 0, E, axis=2), -1, axis=1
    )
    return jnp.concatenate([body, tail], axis=2)


def unfold_grid_to_tiles_dft(g_dft, plan, batch_size: int, compact: bool = False):
    """DFT-layout grid (B, L1, ..., C, L0) -> dense tiles (NT, C, H, H^{dim-1})."""
    dim, T, H, M, nb, E = _geom(plan)
    B = batch_size
    if dim != 3:
        return grid_dft_to_flat_small(g_dft, plan, batch_size, unfold=True)
    (s0, A0), (s1, A1), (s2, A2) = active_axes(plan, compact)
    L0, L1, L2 = A0 * T, A1 * T, A2 * T
    C = g_dft.shape[3]
    # pair 2: split L2 of (B*L1, L2, Z=C, W=L0)
    a = _pair_unfold(g_dft.reshape(B * L1, L2, C, L0), T, H, L2, E, A2)
    a = a.transpose(0, 1, 3, 2, 4)  # (B*L1, A2, C, H2, L0): minor L0
    # pair 1: split L1 of (B, L1, Z=A2*C*H2, W=L0)
    a = _pair_unfold(a.reshape(B, L1, A2 * C * H, L0), T, H, L1, E, A1)
    # (B, A1, H1, A2*C*H2, L0) -> (B, A1, A2*C, H1, H2, L0): H1 must move
    # right of (A2, C) but left of H2.
    a = a.reshape(B, A1, H, A2 * C, H, L0)
    a = a.transpose(0, 1, 3, 2, 4, 5)  # minor L0
    # pair 0: park L0 back in front of (Z0=A1*A2*C, W0=H1*H2)
    a = a.reshape(B, A1 * A2 * C, H * H, L0)
    a = a.transpose(0, 3, 1, 2)  # (B, L0, Z0, W0): minor W0 = H^2
    a = _pair_unfold(a, T, H, L0, E, A0)  # (B, A0, H0, Z0, W0)
    a = a.transpose(0, 1, 3, 2, 4)  # (B, A0, Z0, H0, W0): minor W0
    return a.reshape(batch_size * A0 * A1 * A2, C, H, H * H)


def fold_tiles_to_grid_dft(tiles_dense, plan, batch_size: int, C: int,
                           compact: bool = False):
    """(NT, C*H^dim) -> DFT-layout grid (B, L_1, ..., L_{dim-1}, C, L_0).

    For dim == 3 this is the layout-careful path, optionally on the compact
    active slab (``compact=True``); dim <= 2 grids are small, so the simple
    full-grid fold plus one cheap transpose suffices.
    """
    dim, T, H, M, nb, E = _geom(plan)
    if dim == 3:
        return _fold3_dft(tiles_dense, plan, batch_size, C, compact)
    flat = _fold_simple(tiles_dense, plan, batch_size, C)
    return grid_flat_to_dft(flat, plan.dim, M, batch_size)


def grid_flat_to_dft(g_flat, dim: int, M: int, batch_size: int):
    """(B*M^dim, C) -> (B, M_1, ..., M_{dim-1}, C, M_0). The materialized
    result has grid axis 0 minor, so this direction is always layout-safe."""
    C = g_flat.shape[1]
    arr = g_flat.reshape((batch_size,) + (M,) * dim + (C,))
    perm = [0] + list(range(2, dim + 2)) + [1]
    return arr.transpose(perm)


def grid_dft_to_flat(g_dft, dim: int, M: int, batch_size: int):
    """Inverse of :func:`grid_flat_to_dft`."""
    C = g_dft.shape[-2]
    perm = [0, dim + 1] + list(range(1, dim + 1))
    arr = g_dft.transpose(perm)
    return arr.reshape(batch_size * M**dim, C)


def grid_dft_to_flat_small(g_dft, plan, batch_size: int, unfold: bool):
    """dim <= 2 helper: route through the simple flat path."""
    flat = grid_dft_to_flat(g_dft, plan.dim, plan.M, batch_size)
    if unfold:
        t = _unfold_simple(flat, plan, batch_size)
        H = plan.H
        C = flat.shape[1]
        nb = plan.M // plan.T
        return t.reshape(batch_size * nb**plan.dim, C, H, H ** (plan.dim - 1))
    return flat


def fold_tiles_to_grid(tiles_dense, plan, batch_size: int, C: int):
    """Overlap-add the dense tile array onto the flat oversampled grid.

    tiles_dense: (batch_size * nb^dim, C * H^dim) — tile contents row-major
    over ``(C, H_0, ..., H_{dim-1})``. Returns (batch_size * M^dim, C) in the
    pipeline's grid layout (spatial axes row-major, columns last).
    """
    dim = plan.dim
    if dim == 3:
        g = _fold3_dft(tiles_dense, plan, batch_size, C)
        return grid_dft_to_flat(g, dim, plan.M, batch_size)
    return _fold_simple(tiles_dense, plan, batch_size, C)


def unfold_grid_to_tiles(g_flat, plan, batch_size: int):
    """Expand the flat grid into the dense halo-tile array (inverse reads of
    :func:`fold_tiles_to_grid`): every tile sees its body plus the periodic
    ``E``-cell halo of the next tile per axis.

    g_flat: (batch_size * M^dim, C). Returns the "tile4" interchange shape
    (batch_size * nb^dim, C, H, H^{dim-1}) — tile contents row-major over
    (H_0, ..., H_{dim-1}), with the trailing dims flattened so the array's
    minor axes stay large enough to avoid TPU tile padding.
    """
    dim, T, H, M, nb, E = _geom(plan)
    if dim == 3:
        g = grid_flat_to_dft(g_flat, dim, M, batch_size)
        return unfold_grid_to_tiles_dft(g, plan, batch_size)
    t = _unfold_simple(g_flat, plan, batch_size)
    C = g_flat.shape[1]
    return t.reshape(batch_size * nb**dim, C, H, H ** (dim - 1))
