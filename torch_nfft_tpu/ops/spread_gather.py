"""Irregular <-> regular grid data movement (the NFFT's "window convolution").

This is the TPU-native answer to the reference's atomicAdd scatter / gather
CUDA kernels (``csrc/cuda/spatial_window_operations.cu:103-332``). On TPU
there are no atomics; instead we have three strategies, selected by
``strategy=`` (default "auto"):

* ``"scatter"`` — XLA's deterministic scatter-add / gather. Always correct,
  good for moderate problem sizes; duplicate indices are combined by XLA
  deterministically (no race by construction; SURVEY.md section 5).
* ``"matmul"`` — one-hot matrix products that put the spreading on the MXU.
  Wins for small oversampled grids (the library's intended regime,
  N in {16, 32, 64}).
* ``"binned"`` — the plan-based sorted-tile engine (ops/binned.py), which
  runs the fused Pallas kernels on TPU; chosen automatically for large
  concrete point sets, or pass a prebuilt ``plan=``.

Both spread and gather are pure jnp compositions, so ``jax.grad`` flows
through them — including through the window weights to the point positions,
which the reference cannot do (its position grads are None, nfft.py:28).

Point-chunking: for large n * window_volume * columns workloads the index /
weight tensors are materialized per chunk inside a ``lax.fori_loop`` so peak
memory stays bounded.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from .window import compute_psi, compute_shifts, window_index_offsets

__all__ = ["spread", "gather", "window_weights_and_indices"]


def window_weights_and_indices(
    pos: jax.Array,
    batch: jax.Array,
    N: int,
    m: int,
    sigma: float = 2.0,
    window: str = "gaussian",
):
    """Flat grid indices and separable window weights for every point.

    Returns
    -------
    flat_idx : (n, W) int32 — index into the flattened (batch, M^dim) grid,
        with the periodic wrap (shift + l) mod M per dimension
        (spatial_window_operations.cu:150).
    weights : (n, W) float — prod_d psi[i, d, l_d].
    """
    n, dim = pos.shape
    M = int(round(sigma * N))
    shifts = compute_shifts(pos, N, m, sigma)  # (n, dim) int32
    psi = compute_psi(pos, shifts, N, m, sigma, window)  # (n, dim, L)
    ls = window_index_offsets(dim, m)  # (W, dim)
    W = ls.shape[0]

    # Per-dim wrapped grid coordinates -> row-major flat index over (M,)*dim.
    idx = (shifts[:, None, :] + ls[None, :, :]) % M  # (n, W, dim)
    flat_idx = idx[..., 0]
    for d in range(1, dim):
        flat_idx = flat_idx * M + idx[..., d]

    prod_M = M**dim
    flat_idx = batch.astype(jnp.int32)[:, None] * prod_M + flat_idx

    # weights[i, w] = prod_d psi[i, d, ls[w, d]]
    weights = jnp.take(psi[:, 0, :], ls[:, 0], axis=1)  # (n, W)
    for d in range(1, dim):
        weights = weights * jnp.take(psi[:, d, :], ls[:, d], axis=1)
    return flat_idx, weights


def _auto_chunk(n: int, W: int, C: int, itemsize: int, budget_bytes: int = 1 << 29) -> int:
    """Pick a point-chunk size keeping the (chunk, W, C) temporary under budget."""
    per_point = max(1, W * C * itemsize)
    chunk = max(1, budget_bytes // per_point)
    return min(n, chunk)


# ---------------------------------------------------------------------------
# Scatter strategy
# ---------------------------------------------------------------------------


def _spread_scatter(x, pos, batch, batch_size, N, m, sigma, point_chunk, window="gaussian"):
    n, dim = pos.shape
    C = x.shape[1]
    M = int(round(sigma * N))
    prod_M = M**dim
    W = (2 * m + 2) ** dim

    g = jnp.zeros((batch_size * prod_M, C), dtype=x.dtype)

    if point_chunk is None:
        point_chunk = _auto_chunk(n, W, C, x.dtype.itemsize)

    if point_chunk >= n:
        flat_idx, weights = window_weights_and_indices(pos, batch, N, m, sigma, window)
        vals = x[:, None, :] * weights[..., None].astype(x.dtype)
        g = g.at[flat_idx.reshape(-1)].add(
            vals.reshape(-1, C), mode="drop", unique_indices=False
        )
        return g

    # Chunked accumulation: pad to a multiple of the chunk size with weight-0
    # points directed at a valid index (mode="drop" also guards the pad rows).
    n_chunks = -(-n // point_chunk)
    n_pad = n_chunks * point_chunk - n
    pos_p = jnp.pad(pos, ((0, n_pad), (0, 0)))
    batch_p = jnp.pad(batch, (0, n_pad))
    x_p = jnp.pad(x, ((0, n_pad), (0, 0)))
    valid = (jnp.arange(n_chunks * point_chunk) < n).astype(x.real.dtype)

    def body(i, g_acc):
        sl = i * point_chunk
        pos_c = jax.lax.dynamic_slice_in_dim(pos_p, sl, point_chunk, 0)
        batch_c = jax.lax.dynamic_slice_in_dim(batch_p, sl, point_chunk, 0)
        x_c = jax.lax.dynamic_slice_in_dim(x_p, sl, point_chunk, 0)
        valid_c = jax.lax.dynamic_slice_in_dim(valid, sl, point_chunk, 0)
        flat_idx, weights = window_weights_and_indices(pos_c, batch_c, N, m, sigma, window)
        weights = weights * valid_c[:, None]
        vals = x_c[:, None, :] * weights[..., None].astype(x_c.dtype)
        return g_acc.at[flat_idx.reshape(-1)].add(
            vals.reshape(-1, C), mode="drop", unique_indices=False
        )

    # Chunk 0 outside the loop: seeds a shard_map-varying carry (the zeros
    # init is replicated while updates vary over the manual axis).
    g = body(0, g)
    return jax.lax.fori_loop(1, n_chunks, body, g)


def _gather_scatter(g_flat, pos, batch, N, m, sigma, point_chunk, window="gaussian"):
    """Gather strategy shared with the scatter spread (gathers are cheap on TPU)."""
    n, dim = pos.shape
    C = g_flat.shape[1]
    W = (2 * m + 2) ** dim

    if point_chunk is None:
        point_chunk = _auto_chunk(n, W, C, g_flat.dtype.itemsize)

    if point_chunk >= n:
        flat_idx, weights = window_weights_and_indices(pos, batch, N, m, sigma, window)
        vals = jnp.take(g_flat, flat_idx, axis=0)  # (n, W, C)
        return jnp.einsum("nw,nwc->nc", weights.astype(vals.real.dtype), vals, precision=_P)

    n_chunks = -(-n // point_chunk)
    n_pad = n_chunks * point_chunk - n
    pos_p = jnp.pad(pos, ((0, n_pad), (0, 0)))
    batch_p = jnp.pad(batch, (0, n_pad))
    y = jnp.zeros((n_chunks * point_chunk, C), dtype=g_flat.dtype)

    def body(i, y_acc):
        sl = i * point_chunk
        pos_c = jax.lax.dynamic_slice_in_dim(pos_p, sl, point_chunk, 0)
        batch_c = jax.lax.dynamic_slice_in_dim(batch_p, sl, point_chunk, 0)
        flat_idx, weights = window_weights_and_indices(pos_c, batch_c, N, m, sigma, window)
        flat_idx = jnp.minimum(flat_idx, g_flat.shape[0] - 1)
        vals = jnp.take(g_flat, flat_idx, axis=0)
        y_c = jnp.einsum("nw,nwc->nc", weights.astype(vals.real.dtype), vals, precision=_P)
        return jax.lax.dynamic_update_slice_in_dim(y_acc, y_c, sl, 0)

    y = body(0, y)  # seed varying carry (see _spread_scatter)
    y = jax.lax.fori_loop(1, n_chunks, body, y)
    return y[:n]


# ---------------------------------------------------------------------------
# One-hot matmul strategy (MXU): best for small batch_size * M^dim.
# ---------------------------------------------------------------------------


def _onehot_rows(pos, batch, batch_size, N, m, sigma, fold_batch_dim, window="gaussian"):
    """Per-dimension dense one-hot window matrices.

    Returns a list of dim arrays; entry d has shape (n, M) — or
    (n, batch_size*M) for d == fold_batch_dim, where the batch index is folded
    into the row so a single matmul handles the whole batch block-diagonally.
    """
    n, dim = pos.shape
    M = int(round(sigma * N))
    shifts = compute_shifts(pos, N, m, sigma)
    psi = compute_psi(pos, shifts, N, m, sigma, window)  # (n, dim, L)
    L = 2 * m + 2
    mats = []
    for d in range(dim):
        cols = (shifts[:, d : d + 1] + jnp.arange(L, dtype=jnp.int32)[None]) % M  # (n, L)
        width = M
        if d == fold_batch_dim and batch_size > 1:
            cols = batch.astype(jnp.int32)[:, None] * M + cols
            width = batch_size * M
        onehot = (
            cols[:, :, None] == jnp.arange(width, dtype=jnp.int32)[None, None, :]
        ).astype(psi.dtype)
        mats.append(jnp.einsum("nl,nlw->nw", psi[:, d, :], onehot, precision=_P))
    return mats


_P = jax.lax.Precision.HIGHEST  # full-f32 MXU passes (see ops/fft.py)


def _complex_matmul(a_real, b):
    """(n x k) real  @  (k x ...) possibly-complex, keeping MXU-friendly dtypes."""
    if jnp.issubdtype(b.dtype, jnp.complexfloating):
        return jax.lax.complex(
            jnp.matmul(a_real, b.real, preferred_element_type=a_real.dtype, precision=_P),
            jnp.matmul(a_real, b.imag, preferred_element_type=a_real.dtype, precision=_P),
        ).astype(b.dtype)
    return jnp.matmul(a_real, b, preferred_element_type=b.dtype, precision=_P)


def _spread_matmul(x, pos, batch, batch_size, N, m, sigma, window="gaussian"):
    n, dim = pos.shape
    C = x.shape[1]
    M = int(round(sigma * N))
    mats = _onehot_rows(pos, batch, batch_size, N, m, sigma, 0, window)

    if dim == 1:
        # g[(b,u), c] = sum_j S0[j,(b,u)] x[j,c]
        g = _complex_matmul(mats[0].T, x)  # (B*M, C)
        return g.reshape(batch_size * M, C)
    if dim == 2:
        # rhs[j, u2*C + c] = S1[j,u2] * x[j,c]; g = S0b^T @ rhs
        rhs = (mats[1][:, :, None] * x[:, None, :]).reshape(n, M * C)
        g = _complex_matmul(mats[0].T, rhs)  # (B*M, M*C)
        return g.reshape(batch_size * M * M, C)
    # dim == 3: rhs[j, (u2,u3,c)] = S1[j,u2]*S2[j,u3]*x[j,c] — only viable for
    # tiny M; guarded by the auto-dispatch cost model.
    rhs = (
        mats[1][:, :, None, None] * mats[2][:, None, :, None] * x[:, None, None, :]
    ).reshape(n, M * M * C)
    g = _complex_matmul(mats[0].T, rhs)
    return g.reshape(batch_size * M * M * M, C)


def _gather_matmul(g_flat, pos, batch, batch_size, N, m, sigma, window="gaussian"):
    n, dim = pos.shape
    C = g_flat.shape[1]
    M = int(round(sigma * N))
    mats = _onehot_rows(pos, batch, batch_size, N, m, sigma, 0, window)

    if dim == 1:
        return _complex_matmul(mats[0], g_flat.reshape(batch_size * M, C))
    if dim == 2:
        t = _complex_matmul(mats[0], g_flat.reshape(batch_size * M, M * C))
        t = t.reshape(n, M, C)
        return jnp.einsum("nu,nuc->nc", mats[1].astype(t.real.dtype), t, precision=_P)
    t = _complex_matmul(mats[0], g_flat.reshape(batch_size * M, M * M * C))
    t = t.reshape(n, M, M, C)
    t = jnp.einsum("nu,nuvc->nvc", mats[1].astype(t.real.dtype), t, precision=_P)
    return jnp.einsum("nv,nvc->nc", mats[2].astype(t.real.dtype), t, precision=_P)


# ---------------------------------------------------------------------------
# Dispatch
# ---------------------------------------------------------------------------


def _onehot_cost(n, dim, batch_size, M, C):
    """Size of the one-hot matmul strategy's operands: (n, B*M) plus
    (n, M^(dim-1)*C). Shared with the eager auto-planner in ops/nfft.py."""
    return n * batch_size * M + n * (M ** max(0, dim - 1)) * C


def _pick_strategy(strategy, n, dim, batch_size, M, C):
    if strategy != "auto":
        return strategy
    # Use the one-hot matmul when its operands stay small enough that MXU
    # throughput beats scatter cost.
    if _onehot_cost(n, dim, batch_size, M, C) <= (1 << 24):
        return "matmul"
    return "scatter"


def spread(
    x: jax.Array,
    pos: jax.Array,
    batch: jax.Array,
    batch_size: int,
    N: int,
    m: int,
    sigma: float = 2.0,
    strategy: str = "auto",
    point_chunk: int | None = None,
    plan=None,
    window: str = "gaussian",
) -> jax.Array:
    """Window-convolve irregular samples onto the oversampled grid.

    Parameters: x (n, C) real or complex; pos (n, dim) in [-1/2, 1/2);
    batch (n,) int. Returns the flat grid (batch_size * M^dim, C) in the same
    dtype as x (the FFT layer promotes to complex).

    Semantics match real/complex_adjoint_window_convolution_kernel
    (spatial_window_operations.cu:103-211): each point adds
    x[i, c] * prod_d psi[i, d, l_d] into grid cell ((shift+l) mod M, ...).
    """
    n, dim = pos.shape
    M = int(round(sigma * N))
    if plan is not None:
        from .binned import spread_binned

        return spread_binned(plan, x, pos, batch_size=batch_size)
    strat = _pick_strategy(strategy, n, dim, batch_size, M, x.shape[1])
    if strat == "binned":
        if isinstance(pos, jax.core.Tracer):
            strat = "scatter"  # plans need concrete points; scatter is exact
        else:
            from .binned import build_plan, spread_binned

            plan = build_plan(pos, batch, N=N, m=m, sigma=sigma,
                              batch_size=batch_size, window=window)
            return spread_binned(plan, x, pos, batch_size=batch_size)
    if strat == "matmul":
        return _spread_matmul(x, pos, batch, batch_size, N, m, sigma, window)
    return _spread_scatter(x, pos, batch, batch_size, N, m, sigma, point_chunk, window)


def gather(
    g_flat: jax.Array,
    pos: jax.Array,
    batch: jax.Array,
    batch_size: int,
    N: int,
    m: int,
    sigma: float = 2.0,
    strategy: str = "auto",
    point_chunk: int | None = None,
    plan=None,
    window: str = "gaussian",
) -> jax.Array:
    """Interpolate grid values back to irregular points (transpose of spread).

    g_flat: (batch_size * M^dim, C); returns (n, C).

    Semantics match complex/real_forward_window_convolution_kernel
    (spatial_window_operations.cu:214-332).
    """
    n, dim = pos.shape
    M = int(round(sigma * N))
    if plan is not None:
        from .binned import gather_binned

        return gather_binned(plan, g_flat, pos)
    strat = _pick_strategy(strategy, n, dim, batch_size, M, g_flat.shape[1])
    if strat == "binned":
        if isinstance(pos, jax.core.Tracer):
            strat = "scatter"
        else:
            from .binned import build_plan, gather_binned

            plan = build_plan(pos, batch, N=N, m=m, sigma=sigma,
                              batch_size=batch_size, window=window)
            return gather_binned(plan, g_flat, pos)
    if strat == "matmul":
        return _gather_matmul(g_flat, pos, batch, batch_size, N, m, sigma, window)
    return _gather_scatter(g_flat, pos, batch, N, m, sigma, point_chunk, window)
