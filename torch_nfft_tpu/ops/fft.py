"""Planar-complex DFT built from MXU matmuls.

The reference leans on cuFFT (``core_cuda.cu:254-268``). On TPU the XLA FFT
op exists on mainline backends, but this framework also has to run on TPU
runtimes with **no complex dtype and no FFT primitive** at all. This module
therefore implements the (unnormalized) DFT in *planar* form — separate real
and imaginary float32 arrays — out of dense matmuls, which is exactly what
the MXU is built for:

* sizes <= ``_DIRECT_MAX`` use one dense DFT matrix per axis (a single pass
  of 3-4 real matmuls, MXU-bound);
* larger sizes use the four-step (Cooley-Tukey) factorization M = M1*M2:
  DFT_M1 along the rows, twiddle multiply, DFT_M2 along the columns, and a
  transpose-flatten — cost O(M*(M1+M2)) per signal instead of O(M^2), with
  both DFT stages still dense matmuls. The split recurses, so any
  power-of-two M stays MXU-friendly.

Conventions (matching ops/nfft.py):

* ``sign=-1``: forward DFT, kernel e^{-2*pi*i*a*k/M} — cufftExecC2C(...,
  CUFFT_FORWARD) / ``jnp.fft.fftn``.
* ``sign=+1``: unnormalized inverse, kernel e^{+2*pi*i*a*k/M} —
  CUFFT_INVERSE / ``jnp.fft.ifftn(..., norm="forward")``.
"""

from __future__ import annotations

import math
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "dft_planar",
    "fftn_planar",
    "DIRECT_MAX",
    "PRUNED_MAX",
    "spectral_adjoint_pruned",
    "spectral_forward_pruned",
    "spectral_adjoint_pruned_dft",
    "spectral_forward_pruned_dft",
]

# Largest axis length handled by a single dense DFT-matrix pass. 128 matches
# the MXU systolic dimension; cost per element is M <= 128 MACs, which is
# still bandwidth-bound territory on the MXU.
DIRECT_MAX = 128


@lru_cache(maxsize=None)
def _dft_mats_np(M: int, sign: int) -> tuple[np.ndarray, np.ndarray]:
    """(cos, sin) of the M x M DFT kernel with the given sign, float64->float32.

    F[a, k] = cos(2 pi a k / M) + i * sign * sin(2 pi a k / M).
    """
    a = np.arange(M, dtype=np.float64)
    theta = 2.0 * np.pi * np.outer(a, a) / M
    return np.cos(theta).astype(np.float32), np.sin(theta).astype(np.float32)


@lru_cache(maxsize=None)
def _twiddle_np(M1: int, M2: int, sign: int) -> tuple[np.ndarray, np.ndarray]:
    """(cos, sin) twiddle factors w[k1, a2] = e^{sign*2*pi*i*k1*a2/(M1*M2)}."""
    k1 = np.arange(M1, dtype=np.float64)[:, None]
    a2 = np.arange(M2, dtype=np.float64)[None, :]
    theta = 2.0 * np.pi * k1 * a2 / (M1 * M2)
    return np.cos(theta).astype(np.float32), np.sin(theta).astype(np.float32)


def _split(M: int):
    """Factor M = M1*M2 with both factors as close to sqrt(M) (and <= each
    other) as possible. Returns None when a single direct pass is best."""
    if M <= DIRECT_MAX:
        return None
    m1 = int(math.isqrt(M))
    while m1 > 1 and M % m1:
        m1 -= 1
    if m1 == 1:  # prime M: direct is the only dense option
        return None
    return m1, M // m1


# TPU MXUs multiply f32 operands in bf16 passes by default; the DFT needs
# high-precision products or the transform error (~4e-3 in bf16) swamps the
# NFFT window error (~1e-4 at m=4). HIGH = 3-pass bf16 (~f32 accuracy) at
# half the cost of HIGHEST.
MATMUL_PRECISION = jax.lax.Precision.HIGH


def _mm(a, b):
    return jnp.matmul(
        a, b, preferred_element_type=a.dtype, precision=MATMUL_PRECISION
    )


def _dft_last_direct(xr, xi, M: int, sign: int):
    cos_np, sin_np = _dft_mats_np(M, sign)
    C = jnp.asarray(cos_np, dtype=xr.dtype)
    S = jnp.asarray(sin_np, dtype=xr.dtype) * sign
    # y = x @ (C + i S): 3-4 real matmuls on the MXU.
    if xi is None:
        yr = _mm(xr, C)
        yi = _mm(xr, S)
    else:
        yr = _mm(xr, C) - _mm(xi, S)
        yi = _mm(xr, S) + _mm(xi, C)
    return yr, yi


def _dft_last(xr, xi, sign: int):
    """Unnormalized DFT along the last axis, planar in/out."""
    M = xr.shape[-1]
    split = _split(M)
    if split is None:
        return _dft_last_direct(xr, xi, M, sign)
    M1, M2 = split
    shp = xr.shape[:-1]
    xr = xr.reshape(shp + (M1, M2))
    xi = None if xi is None else xi.reshape(shp + (M1, M2))

    # Stage 1: DFT_M1 along the M1 axis (second-to-last) — move it last.
    tr = jnp.swapaxes(xr, -1, -2)
    ti = None if xi is None else jnp.swapaxes(xi, -1, -2)
    tr, ti = _dft_last(tr, ti, sign)  # (..., M2=a2, M1=k1)
    tr = jnp.swapaxes(tr, -1, -2)  # (..., k1, a2)
    ti = jnp.swapaxes(ti, -1, -2)

    # Stage 2: twiddle w[k1, a2].
    tw_cos_np, tw_sin_np = _twiddle_np(M1, M2, sign)
    wc = jnp.asarray(tw_cos_np, dtype=xr.dtype)
    ws = jnp.asarray(tw_sin_np, dtype=xr.dtype) * sign
    ur = tr * wc - ti * ws
    ui = tr * ws + ti * wc

    # Stage 3: DFT_M2 along the last (a2) axis.
    yr, yi = _dft_last(ur, ui, sign)  # (..., k1, k2)

    # Stage 4: flat index k = k1 + M1*k2 -> transpose to (..., k2, k1).
    yr = jnp.swapaxes(yr, -1, -2).reshape(shp + (M1 * M2,))
    yi = jnp.swapaxes(yi, -1, -2).reshape(shp + (M1 * M2,))
    return yr, yi


def dft_planar(xr, xi, axis: int, sign: int):
    """Unnormalized planar DFT along ``axis``. ``xi=None`` means purely real
    input. Returns (yr, yi)."""
    axis = axis % xr.ndim
    if axis != xr.ndim - 1:
        xr = jnp.moveaxis(xr, axis, -1)
        xi = None if xi is None else jnp.moveaxis(xi, axis, -1)
    yr, yi = _dft_last(xr, xi, sign)
    if axis != yr.ndim - 1:
        yr = jnp.moveaxis(yr, -1, axis)
        yi = jnp.moveaxis(yi, -1, axis)
    return yr, yi


def fftn_planar(xr, xi, axes, sign: int):
    """Unnormalized planar DFT over multiple axes (separable passes)."""
    for ax in axes:
        xr, xi = dft_planar(xr, xi, ax, sign)
    return xr, xi


# ---------------------------------------------------------------------------
# Pruned spectral transforms: the NFFT only ever uses the centered N-band of
# the M = sigma*N oversampled spectrum (the adjoint crops to it,
# core_cuda.cu:298-303; the forward embeds from it, core_cuda.cu:405-413; the
# fastsum filter zeroes everything outside it,
# spectral_window_operations.cu:313-324). Folding the crop/embed, the
# fftshift index map AND the separable phi_hat_inv rolloff into ONE (M, N)
# DFT matrix per axis prunes ~3.4x of the FLOPs at sigma=2 and turns the
# whole spectral stage into dense MXU matmuls with no index shuffling at all.
# ---------------------------------------------------------------------------

# Largest oversampled axis length the pruned direct matrices handle; above
# this the O(M*N) per-line cost loses to the four-step's O(M log M) and the
# pipelines fall back to fftn_planar + explicit crop/embed.
PRUNED_MAX = 2048


@lru_cache(maxsize=None)
def _pruned_mats_np(N: int, M: int, m: int, sigma: float, sign: int,
                    off: int = 0, L: int | None = None,
                    window: str = "gaussian"):
    """(cos, sin) of the pruned planar DFT matrix, shape (L, N), float32.

    Column j holds frequency k = j - N/2 (the centered layout, frequency k
    stored at index k + N/2, reference nfft.py:119-121 / kernel_coeffs.cu:56);
    row a covers grid cells off + [0, L) of the M-cell axis (off/L restrict
    to a plan's active slab; default: the full axis). Entries are

        D[a, j] = e^{sign * 2*pi*i * (off + a) * k / M} * phi_hat_inv(k)

    which equals (unnormalized M-point DFT) x (fftshift crop to the centered
    band) x (rolloff correction) in one matrix: the DFT reads frequency
    k mod M, and e^{2*pi*i*a*(k mod M)/M} == e^{2*pi*i*a*k/M} exactly; cells
    outside the slab hold zeros by construction, so dropping their rows is
    exact too.
    """
    L = M if L is None else L
    k = np.arange(N, dtype=np.float64) - N // 2
    a = np.arange(L, dtype=np.float64) + off
    theta = 2.0 * np.pi * np.outer(a, k) / M
    # shared float64 phi_hat_inv definition (closed-form gaussian / es
    # quadrature), ops/window.py:phi_hat_inv_np
    from .window import phi_hat_inv_np

    phinv = phi_hat_inv_np(N, m, sigma, window)
    cr = np.cos(theta) * phinv[None, :]
    ci = np.sin(theta) * sign * phinv[None, :]
    return cr.astype(np.float32), ci.astype(np.float32)


def _axis_contract(x, mat, ax: int):
    """Real contraction of axis ``ax`` with an (L_in, L_out) matrix, as a
    batched matmul (pre, L, post) x (L, L_out) -> (pre, L_out, post)."""
    pre = math.prod(x.shape[:ax])
    L = x.shape[ax]
    post = math.prod(x.shape[ax + 1 :])
    out_shape = x.shape[:ax] + (mat.shape[1],) + x.shape[ax + 1 :]
    x2 = x.reshape(pre, L, post)
    if post == 1:
        y = _mm(x2[:, :, 0], mat)[:, :, None]
    else:
        y = jnp.einsum("alq,lj->ajq", x2, mat, precision=MATMUL_PRECISION)
    return y.reshape(out_shape)


def _axis_contract_planar(xr, xi, mr, mi, ax: int):
    """(xr + i*xi) contracted along ``ax`` with (mr + i*mi); xi may be None."""
    rr = _axis_contract(xr, mr, ax)
    ri = _axis_contract(xr, mi, ax)
    if xi is None:
        return rr, ri
    ir = _axis_contract(xi, mr, ax)
    ii = _axis_contract(xi, mi, ax)
    return rr - ii, ri + ir


def spectral_adjoint_pruned(gr, gi, dim: int, N: int, m: int, sigma: float,
                            spatial_axis0: int = 1,
                            window: str = "gaussian"):
    """Oversampled planar grid -> centered spectrum, rolloff-corrected.

    Fuses ``fftn_planar(sign=+1)`` + ``centered_crop`` + ``apply_phi_hat_inv``
    (the adjoint tail, core_cuda.cu:267-335) into dim pruned matmuls.
    gr/gi: (..., (M,)*dim, ...C) with spatial axes starting at spatial_axis0;
    gi may be None. Returns planar (yr, yi) with those axes of length N.
    """
    M = gr.shape[spatial_axis0]
    cr, ci = _pruned_mats_np(N, M, m, float(sigma), +1, window=window)
    mr = jnp.asarray(cr)
    mi = jnp.asarray(ci)
    for d in range(dim):
        gr, gi = _axis_contract_planar(gr, gi, mr, mi, spatial_axis0 + d)
    return gr, gi


def spectral_forward_pruned(xr, xi, dim: int, M: int, m: int, sigma: float,
                            spatial_axis0: int = 1,
                            window: str = "gaussian"):
    """Centered spectrum -> oversampled planar grid, rolloff-corrected.

    Fuses ``apply_phi_hat_inv`` + ``centered_embed`` + ``fftn_planar(sign=-1)``
    (the forward head, core_cuda.cu:390-450). The matrix is the transpose of
    the adjoint one with the opposite sign. xi may be None.
    """
    N = xr.shape[spatial_axis0]
    cr, ci = _pruned_mats_np(N, M, m, float(sigma), -1, window=window)
    mr = jnp.asarray(np.ascontiguousarray(cr.T))
    mi = jnp.asarray(np.ascontiguousarray(ci.T))
    for d in range(dim):
        xr, xi = _axis_contract_planar(xr, xi, mr, mi, spatial_axis0 + d)
    return xr, xi


def _cells_spec(dim: int, M: int, cells):
    """Normalize the per-axis (cell_offset, cell_count) spec; None = full."""
    if cells is None:
        return tuple((0, M) for _ in range(dim))
    return tuple(cells)


def spectral_adjoint_pruned_dft(gr, gi, dim: int, N: int, m: int, sigma: float,
                                M: int | None = None, cells=None,
                                window: str = "gaussian"):
    """DFT-layout grid (B, L_1, ..., L_{dim-1}, C, L_0) -> standard centered
    spectrum (B, (N,)*dim, C).

    Same math as :func:`spectral_adjoint_pruned`, but consumes the grid
    layout the 3D tile fold produces natively (ops/tilefold.py): grid axis 0
    sits minor and is contracted first as a plain (pre, L) @ (L, N) matmul;
    the output re-permutes on the small N^dim array. ``cells`` restricts each
    axis to a plan's active slab (tilefold.compact_cells) — the matrices then
    carry the slab offset, so compaction is exact.
    """
    M = gr.shape[-1] if M is None else M
    spec = _cells_spec(dim, M, cells)

    def mats(d):
        off, L = spec[d]
        cr, ci = _pruned_mats_np(N, M, m, float(sigma), +1, off, L, window)
        return jnp.asarray(cr), jnp.asarray(ci)

    gr, gi = _axis_contract_planar(gr, gi, *mats(0), gr.ndim - 1)  # L0 -> N0
    for d in range(1, dim):
        gr, gi = _axis_contract_planar(gr, gi, *mats(d), d)
    perm = [0, gr.ndim - 1] + list(range(1, gr.ndim - 1))
    return gr.transpose(perm), gi.transpose(perm)


def spectral_forward_pruned_dft(xr, xi, dim: int, M: int, m: int, sigma: float,
                                cells=None, real_only: bool = False,
                                window: str = "gaussian"):
    """Standard centered spectrum (B, (N,)*dim, C) -> DFT-layout grid
    (B, L_1, ..., L_{dim-1}, C, L_0). Mirror of
    :func:`spectral_adjoint_pruned_dft`; the input permutation happens on the
    small N^dim array, the contractions grow it axis by axis. With ``cells``
    the output covers only each axis's active slab — exact as long as the
    consumer (the gather) only reads slab cells, which the plan guarantees.

    ``real_only=True`` computes just the REAL plane of the grid (returns
    (gr, None)): the last axis contraction drops the two matmuls feeding the
    imaginary plane. Exact for real-output forward transforms, where the
    gather (a real-weighted map) of the imaginary plane would be discarded
    anyway (reference real-output forward kernel,
    spatial_window_operations.cu:214-332 real variant).
    """
    N = xr.shape[1]
    spec = _cells_spec(dim, M, cells)

    def mats(d):
        off, L = spec[d]
        cr, ci = _pruned_mats_np(N, M, m, float(sigma), -1, off, L, window)
        return (
            jnp.asarray(np.ascontiguousarray(cr.T)),
            jnp.asarray(np.ascontiguousarray(ci.T)),
        )

    perm = [0] + list(range(2, dim + 2)) + [1]
    xr = xr.transpose(perm)
    xi = None if xi is None else xi.transpose(perm)
    order = [xr.ndim - 1] + list(range(1, dim))  # axis 0 (minor) first
    for i, ax in enumerate(order):
        d = 0 if i == 0 else i
        mr, mi = mats(d)
        if real_only and i == len(order) - 1:
            # real plane only: Re((xr + i xi)(mr + i mi)) = xr mr - xi mi
            rr = _axis_contract(xr, mr, ax)
            if xi is not None:
                rr = rr - _axis_contract(xi, mi, ax)
            return rr, None
        xr, xi = _axis_contract_planar(xr, xi, mr, mi, ax)
    return xr, xi
