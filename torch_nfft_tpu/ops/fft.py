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

__all__ = ["dft_planar", "fftn_planar", "DIRECT_MAX"]

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
