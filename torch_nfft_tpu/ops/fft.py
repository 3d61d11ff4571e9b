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
    other) as possible. Returns None when a single direct pass is best.

    TORCH_NFFT_TPU_SPLIT_<M>="M1xM2" overrides the factorization of that M
    (read at trace time) — the device A/B hook for non-power-of-two sizes
    (e.g. M=6656=2^9*13, where (64,104) and (52,128) pad differently on the
    MXU)."""
    if M <= DIRECT_MAX:
        return None
    import os

    ov = os.environ.get(f"TORCH_NFFT_TPU_SPLIT_{M}")
    if ov:
        m1, m2 = (int(v) for v in ov.lower().split("x"))
        if m1 * m2 != M:
            raise ValueError(f"TORCH_NFFT_TPU_SPLIT_{M}={ov!r}: {m1}*{m2} != {M}")
        return m1, m2
    m1 = int(math.isqrt(M))
    while m1 > 1 and M % m1:
        m1 -= 1
    if m1 == 1:  # prime M: direct is the only dense option
        return None
    return m1, M // m1


# TPU MXUs multiply f32 operands in bf16 passes by default; the DFT needs
# high-precision products or the transform error (~4e-3 in bf16) swamps the
# NFFT window error (~1e-4 at m=4). HIGH = 3-pass bf16 (~f32 accuracy) at
# half the cost of HIGHEST; its residual rounding floors the TPU pipeline at
# ~2-3e-5 rel-L2 (BASELINE.md "Window model validation"). HIGHEST (6-pass)
# buys a tighter floor for users who need tolerances below that — opt in per
# process via TORCH_NFFT_TPU_DFT_PRECISION=highest (read at trace time;
# re-jit after changing it).
_PRECISIONS = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}


def matmul_precision() -> jax.lax.Precision:
    """The DFT matmul precision, from TORCH_NFFT_TPU_DFT_PRECISION
    (default|high|highest; default "high")."""
    import os

    name = os.environ.get("TORCH_NFFT_TPU_DFT_PRECISION", "high").lower()
    try:
        return _PRECISIONS[name]
    except KeyError:
        raise ValueError(
            f"TORCH_NFFT_TPU_DFT_PRECISION={name!r}; expected one of "
            f"{sorted(_PRECISIONS)}"
        ) from None


# Backward-compatible module attribute (callers historically imported this
# constant); the call sites below read matmul_precision() at trace time.
MATMUL_PRECISION = jax.lax.Precision.HIGH


def _mm(a, b):
    return jnp.matmul(
        a, b, preferred_element_type=a.dtype, precision=matmul_precision()
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
        y = jnp.einsum("alq,lj->ajq", x2, mat, precision=matmul_precision())
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


# ---------------------------------------------------------------------------
# Hermitian (real-input) half-spectrum pruned transforms.
#
# The adjoint of REAL samples has a conjugate-symmetric spectrum,
# y[-k] = conj(y[k]) — yet the reference carries the full two-plane spectrum
# through C2C FFTs in both directions (core_cuda.cu:263,441, despite its
# README advertising R2C at README.md:15-16). These transforms do what that
# README only claims: compute and carry ~half the spectral planes.
#
# The subtlety is the reference's ASYMMETRIC band k in [-N/2, N/2)^dim: the
# band is not closed under k -> -k (the -N/2 edge has no +N/2 partner), so a
# naive rfft-style half would lose the trailing-axis -N/2 planes of the
# negative-k0 half and land ~percent-level errors. Exact fix used here:
#
# * store k0 in {-N/2} u [0, N/2)  (index 0 = -N/2 edge plane, i>=1 -> i-1);
# * store trailing axes on the EXTENDED band k in [-N/2, N/2] (N+1 values,
#   index j -> j - N/2): every mirror -k of a stored k0>0 entry then exists;
# * the forward (half spectrum -> real grid) splits the band sum into a
#   separable bulk (trailing interior, k0 weights {1,1,2,2,...}) plus pinned
#   +-N/2 shell corrections, each a rank-1 broadcast along the pinned grid
#   axis — ~1% of the bulk's work in 3D.
#
# MXU-shape notes: the k0 axis splits into a 128-aligned main block plus the
# single -N/2 edge handled as a VPU reduction / rank-1 update — a 129-wide
# matmul would pad to two full 128 tiles (or two 128-depth passes on the
# forward side) and surrender the factor-2 on the axis-0 contractions.
# ---------------------------------------------------------------------------


def _phinv_idx_np(N: int, m: int, sigma: float, window: str, k: np.ndarray):
    """phi_hat_inv at integer frequencies ``k`` (|k| <= N/2); the +N/2 edge
    uses the -N/2 value (phi_hat is even)."""
    from .window import phi_hat_inv_np

    ph = phi_hat_inv_np(N, m, sigma, window)
    idx = np.where(k == N // 2, 0, k + N // 2)
    return ph[idx]


@lru_cache(maxsize=None)
def _herm_mats_np(N: int, M: int, m: int, sigma: float, off: int, L: int,
                  window: str, kind: str):
    """(cos, sin) float32 blocks of the Hermitian half-spectrum DFT matrices.

    kinds (a = off + [0, L) grid cells; phinv folded into every block):
      adjoint, sign=+1, shape (L, n_k):
        'half_main' k in [0, N/2)           'ext' k in [-N/2, N/2]
      adjoint edge vector, shape (L,): 'half_edge' k = -N/2
      forward, sign=-1, transposed (n_k, L):
        'fwd_main' k in [0, N/2) with band weights w(0)=1, w(k>0)=2
        'fwd_core' k in (-N/2, N/2)
      forward vectors, shape (L,):
        'fwd_edge' k = -N/2 (weight 1); 'fwd_pin_m' k = -N/2 pinned trailing;
        'fwd_pin_p' k = +N/2 pinned trailing
    """
    a = np.arange(L, dtype=np.float64) + off
    h = N // 2

    def block(ks, sign, weights=None, transpose=False):
        ks = np.asarray(ks, dtype=np.int64)
        theta = 2.0 * np.pi * np.outer(a, ks.astype(np.float64)) / M
        ph = _phinv_idx_np(N, m, sigma, window, ks)
        if weights is not None:
            ph = ph * weights
        cr = np.cos(theta) * ph[None, :]
        ci = np.sin(theta) * sign * ph[None, :]
        if transpose:
            cr, ci = np.ascontiguousarray(cr.T), np.ascontiguousarray(ci.T)
        return cr.astype(np.float32), ci.astype(np.float32)

    if kind == "half_main":
        return block(np.arange(h), +1)
    if kind == "ext":
        return block(np.arange(N + 1) - h, +1)
    if kind == "half_edge":
        cr, ci = block([-h], +1)
        return cr[:, 0], ci[:, 0]
    if kind == "fwd_main":
        w = np.where(np.arange(h) > 0, 2.0, 1.0)
        return block(np.arange(h), -1, weights=w, transpose=True)
    if kind == "fwd_core":
        return block(np.arange(1, N) - h, -1, transpose=True)
    if kind == "fwd_edge":
        cr, ci = block([-h], -1)
        return cr[:, 0], ci[:, 0]
    if kind == "fwd_pin_m":
        cr, ci = block([-h], -1)
        return cr[:, 0], ci[:, 0]
    if kind == "fwd_pin_p":
        cr, ci = block([h], -1)
        return cr[:, 0], ci[:, 0]
    raise ValueError(f"unknown kind {kind!r}")


def _edge_reduce(g, vec):
    """Weighted reduction of the minor axis: (…, L) x (L,) -> (…,). Runs as
    an f32 multiply+reduce (exact f32 accumulation — no MXU rounding)."""
    return jnp.einsum("...l,l->...", g, jnp.asarray(vec),
                      precision=jax.lax.Precision.HIGHEST)


def spectral_adjoint_half_dft(gr, dim: int, N: int, m: int, sigma: float,
                              M: int | None = None, cells=None,
                              window: str = "gaussian"):
    """REAL DFT-layout grid (B, L_1, ..., L_{dim-1}, C, L_0) -> Hermitian
    half spectrum (hr, hi), each (B, N/2+1, (N+1,)*(dim-1), C).

    Half-k0 layout: index 0 holds k0 = -N/2, index i >= 1 holds k0 = i - 1.
    Trailing axes hold the extended band k = j - N/2 for j in [0, N] (the
    standard centered layout plus one +N/2 tail entry, so every conjugate
    mirror of the dropped k0 < 0 half exists in storage). Use
    :func:`half_spectrum_to_full` to materialize the standard full band.

    Same math as :func:`spectral_adjoint_pruned_dft` restricted to the
    stored frequencies — ~half its matmul FLOPs (the trailing-axis
    contractions run at half thickness).
    """
    if N % 2:
        raise ValueError("Hermitian half-spectrum path requires even N")
    M = gr.shape[-1] if M is None else M
    spec = _cells_spec(dim, M, cells)
    off0, L0 = spec[0]

    cr, ci = _herm_mats_np(N, M, m, float(sigma), off0, L0, window,
                           "half_main")
    hr = _axis_contract(gr, jnp.asarray(cr), gr.ndim - 1)
    hi = _axis_contract(gr, jnp.asarray(ci), gr.ndim - 1)
    er, ei = _herm_mats_np(N, M, m, float(sigma), off0, L0, window,
                           "half_edge")
    hr = jnp.concatenate([_edge_reduce(gr, er)[..., None], hr], axis=-1)
    hi = jnp.concatenate([_edge_reduce(gr, ei)[..., None], hi], axis=-1)

    for d in range(1, dim):
        off, L = spec[d]
        cr, ci = _herm_mats_np(N, M, m, float(sigma), off, L, window, "ext")
        hr, hi = _axis_contract_planar(hr, hi, jnp.asarray(cr),
                                       jnp.asarray(ci), d)
    perm = [0, hr.ndim - 1] + list(range(1, hr.ndim - 1))
    return hr.transpose(perm), hi.transpose(perm)


def _half_scales(S0: int):
    """(u/(u+v), v/(u+v)) over the stored k0 axis: u = 1 everywhere (the
    B-band group), v = 1 only for k0 > 0 (the mirrored -B-band group)."""
    i = np.arange(S0)
    w = np.where(i >= 2, 2.0, 1.0)
    return (1.0 / w).astype(np.float32), (np.where(i >= 2, 1.0, 0.0) / w
                                          ).astype(np.float32)


def spectral_forward_half_dft(hr, hi, dim: int, M: int, m: int, sigma: float,
                              cells=None, window: str = "gaussian"):
    """Hermitian half spectrum -> REAL DFT-layout grid (B, L_1, ..., C, L_0).

    Computes Re sum_{k in [-N/2, N/2)^dim} X[k] phi_hat_inv(k)
    e^{-2 pi i a.k / M} with X[k] = conj(X[-k]) — EXACTLY the asymmetric
    reference band (core_cuda.cu:405-413): the negative-k0 half folds onto
    the stored half as doubled weights on the trailing interior plus pinned
    +-N/2 shell corrections. Each shell piece runs its own (tiny) k0
    contraction and joins the output as a rank-1 broadcast in the real
    plane — the adds fuse into the epilogue of the main contraction
    instead of forcing extra full passes over the big complex intermediate
    (material at batched scale, where the intermediate is GBs).
    Returns (gr, None) — the real plane only, which is what a real-output
    gather consumes.
    """
    S0 = hr.shape[1]
    N = 2 * (S0 - 1)
    spec = _cells_spec(dim, M, cells)

    # (B, S0, e1, ..., C) -> (B, e1, ..., C, S0)
    perm = [0] + list(range(2, dim + 2)) + [1]
    hr = hr.transpose(perm)
    hi = hi.transpose(perm)

    u_scale, v_scale = _half_scales(S0)
    u_scale = jnp.asarray(u_scale)
    v_scale = jnp.asarray(v_scale)

    off0, L0 = spec[0]
    mr, mi = _herm_mats_np(N, M, m, float(sigma), off0, L0, window,
                           "fwd_main")
    mr = jnp.asarray(mr)
    mi = jnp.asarray(mi)
    er0, ei0 = _herm_mats_np(N, M, m, float(sigma), off0, L0, window,
                             "fwd_edge")
    er0 = jnp.asarray(er0)
    ei0 = jnp.asarray(ei0)

    def k0_real(Xr, Xi):
        """Weighted k0 contraction, real part: (..., S0) -> (..., L0)."""
        out = _axis_contract(Xr[..., 1:], mr, Xr.ndim - 1)
        out = out - _axis_contract(Xi[..., 1:], mi, Xi.ndim - 1)
        return out + (Xr[..., 0:1] * er0 - Xi[..., 0:1] * ei0)

    def k0_complex(Xr, Xi):
        """Weighted k0 contraction, both planes (pinned shell pieces —
        their +-N/2 phase multiplies after)."""
        rr = (_axis_contract(Xr[..., 1:], mr, Xr.ndim - 1)
              - _axis_contract(Xi[..., 1:], mi, Xi.ndim - 1)
              + Xr[..., 0:1] * er0 - Xi[..., 0:1] * ei0)
        ri = (_axis_contract(Xr[..., 1:], mi, Xr.ndim - 1)
              + _axis_contract(Xi[..., 1:], mr, Xi.ndim - 1)
              + Xr[..., 0:1] * ei0 + Xi[..., 0:1] * er0)
        return rr, ri

    def core_mats(d):
        off, L = spec[d]
        cr, ci = _herm_mats_np(N, M, m, float(sigma), off, L, window,
                               "fwd_core")
        return jnp.asarray(cr), jnp.asarray(ci)

    def pin_vecs(d, sign_kind):
        off, L = spec[d]
        er, ei = _herm_mats_np(N, M, m, float(sigma), off, L, window,
                               sign_kind)
        return jnp.asarray(er), jnp.asarray(ei)

    if dim == 1:
        return k0_real(hr, hi), None

    if dim == 2:
        cr, ci = core_mats(1)
        Wr, Wi = _axis_contract_planar(hr[:, 1:N], hi[:, 1:N], cr, ci, 1)
        out = k0_real(Wr, Wi)  # (B, L1, C, L0)
        for idx, scale, kind in ((0, u_scale, "fwd_pin_m"),
                                 (N, v_scale, "fwd_pin_p")):
            pr, pi = k0_complex(hr[:, idx] * scale, hi[:, idx] * scale)
            er, ei = pin_vecs(1, kind)  # (L1,)
            out = out + (er[None, :, None, None] * pr[:, None]
                         - ei[None, :, None, None] * pi[:, None])
        return out, None

    if dim != 3:
        raise ValueError("dim must be 1, 2 or 3")

    cr1, ci1 = core_mats(1)
    cr2, ci2 = core_mats(2)
    Wr, Wi = _axis_contract_planar(hr[:, 1:N, 1:N], hi[:, 1:N, 1:N],
                                   cr1, ci1, 1)
    Wr, Wi = _axis_contract_planar(Wr, Wi, cr2, ci2, 2)  # (B,L1,L2,C,S0)
    out = k0_real(Wr, Wi)  # (B, L1, L2, C, L0)

    # slabs: one trailing axis pinned at -N/2 (weight u) or +N/2 (weight v),
    # the other on the open interior; contract interior + k0, then join as
    # a rank-1 broadcast along the pinned grid axis (real plane only)
    def slab(sr, si, scale, other_mats, pin, axis):
        sr, si = _axis_contract_planar(sr * scale, si * scale,
                                       *other_mats, 1)  # (B, L_o, C, S0)
        pr, pi = k0_complex(sr, si)  # (B, L_o, C, L0)
        er, ei = pin
        if axis == 1:
            er = er[None, :, None, None, None]
            ei = ei[None, :, None, None, None]
            pr, pi = pr[:, None], pi[:, None]      # (B, 1, L2, C, L0)
        else:
            er = er[None, None, :, None, None]
            ei = ei[None, None, :, None, None]
            pr, pi = pr[:, :, None], pi[:, :, None]  # (B, L1, 1, C, L0)
        return er * pr - ei * pi

    p1m = pin_vecs(1, "fwd_pin_m")
    p1p = pin_vecs(1, "fwd_pin_p")
    p2m = pin_vecs(2, "fwd_pin_m")
    p2p = pin_vecs(2, "fwd_pin_p")
    out = out + slab(hr[:, 0, 1:N], hi[:, 0, 1:N], u_scale, (cr2, ci2),
                     p1m, 1)
    out = out + slab(hr[:, N, 1:N], hi[:, N, 1:N], v_scale, (cr2, ci2),
                     p1p, 1)
    out = out + slab(hr[:, 1:N, 0], hi[:, 1:N, 0], u_scale, (cr1, ci1),
                     p2m, 2)
    out = out + slab(hr[:, 1:N, N], hi[:, 1:N, N], v_scale, (cr1, ci1),
                     p2p, 2)

    # corners: both trailing axes pinned — rank-2 broadcast e1(a1) e2(a2)
    for idx1, idx2, scale, pin1, pin2 in (
        (0, 0, u_scale, p1m, p2m),
        (N, N, v_scale, p1p, p2p),
    ):
        pr, pi = k0_complex(hr[:, idx1, idx2] * scale,
                            hi[:, idx1, idx2] * scale)  # (B, C, L0)
        fr = pin1[0][:, None] * pin2[0][None, :] - (
            pin1[1][:, None] * pin2[1][None, :])       # (L1, L2)
        fi = pin1[0][:, None] * pin2[1][None, :] + (
            pin1[1][:, None] * pin2[0][None, :])
        out = out + (fr[None, :, :, None, None] * pr[:, None, None]
                     - fi[None, :, :, None, None] * pi[:, None, None])
    return out, None


def half_spectrum_to_full(hr, hi, dim: int, N: int):
    """Hermitian half spectrum (B, N/2+1, (N+1,)*(dim-1), C) -> standard
    centered full-band planes (B, (N,)*dim, C) (reference layout,
    frequency k stored at index k + N/2).

    Negative-k0 planes are conjugate mirrors of stored entries; their
    trailing mirrors -k land inside the extended band by construction
    (index j -> N - j in [1, N])."""
    h = N // 2
    trail = tuple(range(2, 1 + dim))  # trailing spectral axes

    def cut(a):  # trailing ext [0, N+1) -> standard band [0, N)
        for ax in trail:
            a = jax.lax.slice_in_dim(a, 0, N, axis=ax)
        return a

    def mirror(a):  # trailing index j -> N - j, then standard band
        for ax in trail:
            a = jnp.flip(a, axis=ax)  # q -> N - q over [0, N]
        return cut(a)

    upper_r = cut(hr[:, 1:])           # k0 in [0, N/2)
    upper_i = cut(hi[:, 1:])
    edge_r = cut(hr[:, 0:1])           # k0 = -N/2
    edge_i = cut(hi[:, 0:1])
    # k0 = j0 - N/2 for j0 in [1, N/2): conj of stored i = N/2 - j0 + 1,
    # descending -> flip the stored axis slice [2, N/2+1)
    low_r = mirror(jnp.flip(hr[:, 2:], axis=1))
    low_i = -mirror(jnp.flip(hi[:, 2:], axis=1))
    return (
        jnp.concatenate([edge_r, low_r, upper_r], axis=1),
        jnp.concatenate([edge_i, low_i, upper_i], axis=1),
    )


def full_filter_to_half(coeffs, dim: int, N: int):
    """Centered full-band filter (N,)*dim -> the half-spectrum sampling
    (N/2+1, (N+1,)*(dim-1)). Exact for EVEN filters (c[-k] = c[k]), which
    the fastsum math requires anyway (real even kernel coefficients; the
    +N/2 trailing tail reuses the -N/2 value)."""
    f = jnp.asarray(coeffs)
    f = jnp.concatenate([f[0:1], f[N // 2:]], axis=0)  # half-k0 layout
    for ax in range(1, dim):
        f = jnp.concatenate(
            [f, jax.lax.slice_in_dim(f, 0, 1, axis=ax)], axis=ax
        )
    return f
