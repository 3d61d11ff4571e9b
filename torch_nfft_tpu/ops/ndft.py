"""Dense (exact) NDFT reference implementations — the correctness oracle.

jnp port of the semantics of the reference's ``torch_nfft/ndft.py`` (the
ground truth used by every reference test, SURVEY.md section 4). These run in
O(n * N^dim) and are meant for testing and error decomposition, not
production. Batched variants loop over batches in Python with boolean masks,
so they require concrete (non-traced) inputs — exactly like the reference,
whose loop calls ``.item()`` (ndft.py:21).

For high-precision oracle checks on CPU, enable x64 and pass float64 inputs.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = [
    "ndft_adjoint",
    "ndft_forward",
    "ndft_fastsum",
    "exact_trigonometric_matrix",
    "exact_gaussian_matrix",
    "exact_radial_matrix",
]


def _cdtype(*arrays):
    dt = jnp.result_type(*(a.dtype for a in arrays))
    return jnp.complex128 if dt in (jnp.float64, jnp.complex128) else jnp.complex64


def _centered_grid(N, dim, dtype):
    """Frequency multi-index grid, shape (N, ..., N, dim), k in [-N/2, N/2)."""
    g1 = jnp.arange(-N / 2, N / 2, dtype=dtype)
    grids = jnp.meshgrid(*([g1] * dim), indexing="ij")
    return jnp.stack(grids, axis=-1)


def ndft_adjoint(x, pos, batch=None, N=16):
    """Exact adjoint NDFT. Reference: ndft.py:5-23.

    y[b, k, *cols] = sum_{i in batch b} x[i, *cols] * exp(2 pi 1j k . pos_i).
    """
    x = jnp.asarray(x)
    pos = jnp.asarray(pos)
    n, d = pos.shape
    cdtype = _cdtype(x, pos)
    x = x.astype(cdtype)
    grid = _centered_grid(N, d, pos.dtype)

    def single(x_part, pos_part):
        phase = jnp.tensordot(grid, pos_part, axes=[[-1], [-1]])  # (N,)*d + (n_part,)
        fourier = jnp.exp(2j * jnp.pi * phase.astype(cdtype))
        return jnp.tensordot(fourier, x_part, axes=1)[None]

    if batch is None:
        return single(x, pos)
    batch = np.asarray(batch)
    batch_size = int(batch.max()) + 1
    return jnp.concatenate(
        [single(x[batch == b], pos[batch == b]) for b in range(batch_size)]
    )


def ndft_forward(x, pos, batch=None):
    """Exact forward NDFT. Reference: ndft.py:26-44.

    y[i, *cols] = sum_k x[batch_i, k, *cols] * exp(-2 pi 1j k . pos_i).
    """
    x = jnp.asarray(x)
    pos = jnp.asarray(pos)
    n, d = pos.shape
    cdtype = _cdtype(x, pos)
    x = x.astype(cdtype)
    N = x.shape[1]
    grid = _centered_grid(N, d, pos.dtype)

    def single(x_part, pos_part):
        phase = jnp.tensordot(pos_part, grid, axes=[[-1], [-1]])  # (n_part,) + (N,)*d
        fourier = jnp.exp(-2j * jnp.pi * phase.astype(cdtype))
        return jnp.tensordot(fourier, x_part, axes=d)

    if batch is None:
        return single(x[0], pos)
    batch = np.asarray(batch)
    batch_size = int(batch.max()) + 1
    return jnp.concatenate(
        [single(x[b], pos[batch == b]) for b in range(batch_size)]
    )


def ndft_fastsum(
    x, coeffs, sources, targets=None, source_batch=None, target_batch=None, batch=None, N=16
):
    """Exact fastsum: forward(coeffs * adjoint(x)). Reference: ndft.py:48-62."""
    x = jnp.asarray(x)
    coeffs = jnp.asarray(coeffs)
    if targets is None:
        targets = sources
        target_batch = source_batch
    if batch is not None:
        source_batch = batch
        target_batch = batch

    y = ndft_adjoint(x, sources, source_batch, N=N)
    extra = (None,) * (y.ndim - 1 - coeffs.ndim)
    y = y * coeffs[(None, ..., *extra)]
    y = ndft_forward(y, targets, target_batch)
    return y if jnp.issubdtype(x.dtype, jnp.complexfloating) else y.real


def _block_diag(blocks):
    total_r = sum(b.shape[0] for b in blocks)
    total_c = sum(b.shape[1] for b in blocks)
    out = jnp.zeros((total_r, total_c), dtype=blocks[0].dtype)
    r = c = 0
    for b in blocks:
        out = out.at[r : r + b.shape[0], c : c + b.shape[1]].set(b)
        r += b.shape[0]
        c += b.shape[1]
    return out


def exact_trigonometric_matrix(
    coeffs, sources, targets=None, source_batch=None, target_batch=None, /, batch=None
):
    """Dense kernel matrix of the truncated trigonometric series.

    mat[t, s] = sum_l coeffs_l exp(2 pi 1j l . (sources_s - targets_t)).
    Reference: ndft.py:66-95. Separates NFFT approximation error from series
    truncation error in tests (SURVEY.md section 4).
    """
    coeffs = jnp.asarray(coeffs)
    sources = jnp.asarray(sources)
    if targets is None:
        targets = sources
        target_batch = source_batch
    targets = jnp.asarray(targets)
    if batch is not None:
        source_batch = batch
        target_batch = batch

    dim = coeffs.ndim
    N = coeffs.shape[0]
    cdtype = _cdtype(coeffs, sources)
    coeffs = coeffs.astype(cdtype)
    grid = _centered_grid(N, dim, sources.dtype)

    def single(source_part, target_part):
        diff = source_part.reshape(1, -1, dim) - target_part.reshape(-1, 1, dim)
        phase = jnp.tensordot(grid, diff, axes=[[-1], [-1]])
        mat = jnp.exp(2j * jnp.pi * phase.astype(cdtype))
        return jnp.tensordot(coeffs, mat, axes=dim)

    if source_batch is None:
        return single(sources, targets)
    source_batch = np.asarray(source_batch)
    target_batch = np.asarray(target_batch)
    batch_size = int(source_batch.max()) + 1
    return _block_diag(
        [
            single(sources[source_batch == b], targets[target_batch == b])
            for b in range(batch_size)
        ]
    )


def exact_gaussian_matrix(
    sigma, sources, targets=None, source_batch=None, target_batch=None, batch=None
):
    """Dense Gaussian kernel matrix exp(-||s - t||^2 / sigma^2).

    Reference: ndft.py:98-117.
    """
    sources = jnp.asarray(sources)
    if targets is None:
        targets = sources
        target_batch = source_batch
    targets = jnp.asarray(targets)
    if batch is not None:
        source_batch = batch
        target_batch = batch

    def single(source_part, target_part):
        s2 = jnp.sum(source_part**2, axis=1, keepdims=True)
        t2 = jnp.sum(target_part**2, axis=1, keepdims=True)
        sq = t2 - 2 * target_part @ source_part.T + s2.T
        return jnp.exp(-sq / (sigma**2))

    if source_batch is None:
        return single(sources, targets)
    source_batch = np.asarray(source_batch)
    target_batch = np.asarray(target_batch)
    batch_size = int(source_batch.max()) + 1
    return _block_diag(
        [
            single(sources[source_batch == b], targets[target_batch == b])
            for b in range(batch_size)
        ]
    )


def exact_radial_matrix(
    profile, sources, targets=None, source_batch=None, target_batch=None, batch=None
):
    """Dense radial kernel matrix ``profile(||s - t||)``.

    Generalizes :func:`exact_gaussian_matrix` (reference ndft.py:98-117) to an
    arbitrary radial profile; the oracle for :class:`RadialKernel` and its
    subclasses. ``profile`` takes a NumPy float64 array of distances.
    """
    sources = np.asarray(sources, dtype=np.float64)
    if targets is None:
        targets = sources
        target_batch = source_batch
    targets = np.asarray(targets, dtype=np.float64)
    if batch is not None:
        source_batch = batch
        target_batch = batch

    def single(source_part, target_part):
        diff = target_part[:, None, :] - source_part[None, :, :]
        r = np.sqrt(np.sum(diff * diff, axis=-1))
        return jnp.asarray(np.asarray(profile(r), dtype=np.float64))

    if source_batch is None:
        return single(sources, targets)
    source_batch = np.asarray(source_batch)
    target_batch = np.asarray(target_batch)
    batch_size = int(source_batch.max()) + 1
    return _block_diag(
        [
            single(sources[source_batch == b], targets[target_batch == b])
            for b in range(batch_size)
        ]
    )
