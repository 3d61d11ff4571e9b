"""Window tabulation for the NFFT: Gaussian (reference parity) + exp-sqrt.

TPU-native re-implementation of the window math in the reference CUDA kernels
(``csrc/cuda/spatial_window_operations.cu:3-97`` and
``csrc/cuda/spectral_window_operations.cu:2-43`` of dominikbuenger/torch_nfft).

The reference NFFT uses a (periodized, truncated) Gaussian window

    phi_act(x) = exp(-M^2 x^2 / b) / sqrt(pi b),   b = 2*sigma*m / ((2*sigma-1)*pi)

with oversampling rate sigma. The reference hard-codes sigma = 2 inside its
kernel constants; here the constants are *derived* from sigma so the rate is
tunable, with sigma = 2 as the default for exact numerical parity
(SURVEY.md section 5, config row).

Everything is expressed in the scaled argument t = M*x so that

    phi(t)     = exp(-t^2 * inv_b) * inv_sqrt_b_pi
    inv_b      = pi*(2*sigma - 1) / (2*sigma*m)        # sigma=2: 3*pi/(4*m)
    inv_sqrt_b_pi = sqrt((2*sigma - 1)/(2*sigma*m))    # sigma=2: sqrt(3/(4*m))

and the inverse window Fourier coefficients are

    phi_hat_inv(k) = 1 / (M * phi_act_hat(k)) = exp(k^2 * b * (pi/M)^2)
                                               # sigma=2: exp(k^2 * m*pi/(3*N^2))

**Extension (window="es")**: the "exponential of semicircle" window

    phi(t) = exp(beta * (sqrt(1 - (t/(m+1))^2) - 1)),  |t| < m+1
    beta   = 0.976 * pi * (2m+2) * (1 - 1/(2*sigma))

(the standard FINUFFT kernel shape/parametrization) reaches far better
accuracy per support width than the truncated Gaussian: measured rel-L2 vs
the dense NDFT oracle, es at m=2/sigma=2 gives ~1e-5 where the Gaussian
needs m=4 for ~8e-5 — i.e. the same accuracy with (6/10)^dim of the window
work, or 40x+ better accuracy at equal m. Its Fourier transform has no
closed form; ``phi_hat_inv`` values come from a host-side Gauss-Legendre
quadrature of the (smooth, compactly supported) window, computed once per
(N, m, sigma) in float64.

All tabulation functions are pure jnp and fully differentiable w.r.t. the
point positions (the integer shifts are wrapped in stop_gradient: they are
piecewise constant, so their derivative is zero almost everywhere).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "window_inv_b",
    "window_inv_sqrt_b_pi",
    "phi_hat_inv_param",
    "es_beta",
    "kb_beta",
    "window_value_fn",
    "window_value_and_deriv_fn",
    "phi_hat_inv_np",
    "suggest_window_parameters",
    "compute_shifts",
    "compute_psi",
    "compute_psi_and_dpsi",
    "phi_hat_inv_centered",
    "window_index_offsets",
]

DEFAULT_SIGMA = 2.0
DEFAULT_WINDOW = "gaussian"
WINDOWS = ("gaussian", "es", "kb")


def _check_window(window: str) -> str:
    if window not in WINDOWS:
        raise ValueError(f"unknown window {window!r}; supported: {WINDOWS}")
    return window


def window_inv_b(m: int, sigma: float = DEFAULT_SIGMA) -> float:
    """1/b in the scaled window argument. sigma=2 -> 3*pi/(4*m).

    Reference: WINDOW_FORWARD_PARAM1, spatial_window_operations.cu:5.
    """
    return math.pi * (2.0 * sigma - 1.0) / (2.0 * sigma * m)


def window_inv_sqrt_b_pi(m: int, sigma: float = DEFAULT_SIGMA) -> float:
    """1/sqrt(pi*b). sigma=2 -> sqrt(0.75/m).

    Reference: WINDOW_FORWARD_PARAM2, spatial_window_operations.cu:6.
    """
    return math.sqrt((2.0 * sigma - 1.0) / (2.0 * sigma * m))


def phi_hat_inv_param(N: int, m: int, sigma: float = DEFAULT_SIGMA) -> float:
    """b*(pi/M)^2 with M = sigma*N. sigma=2 -> m*pi/(3*N^2).

    Reference: WINDOW_ADJOINT_PARAM, spectral_window_operations.cu:3.
    """
    b = 2.0 * sigma * m / ((2.0 * sigma - 1.0) * math.pi)
    M = sigma * N
    return b * (math.pi / M) ** 2


def es_beta(m: int, sigma: float = DEFAULT_SIGMA) -> float:
    """Shape parameter of the exp-sqrt window: 0.976*pi*(2m+2)*(1-1/(2*sigma)).

    Empirically optimal over (m, sigma) sweeps against the dense NDFT oracle
    (the 0.976 safety factor and the (1-1/(2*sigma)) rate are the standard
    FINUFFT parametrization; our scans reproduce its optimality at
    sigma = 2, 1.5 and 1.25).
    """
    return 0.976 * math.pi * (2 * m + 2) * (1.0 - 1.0 / (2.0 * sigma))


def kb_beta(m: int, sigma: float = DEFAULT_SIGMA) -> float:
    """Shape parameter of the Kaiser-Bessel window (Beatty et al. 2005,
    the standard gridding choice): pi*sqrt((J*(1-1/(2 sigma)))^2 - 0.8)
    with support width J = 2m+2 oversampled cells. Nearly the es rate
    pi*J*(1-1/(2 sigma)) for large J; the -0.8 correction matters at small
    m / low sigma, where KB's sharper spectral decay is the draw."""
    J = 2 * m + 2
    arg = (J * (1.0 - 1.0 / (2.0 * sigma))) ** 2 - 0.8
    return math.pi * math.sqrt(max(arg, 0.25))


def _i0(x):
    """Modified Bessel I0 for x >= 0, Abramowitz-Stegun 9.8.1/9.8.2
    rational approximations (|rel err| < 2e-7) — pure vector ops (polys,
    one exp, one rsqrt, one select), safe inside Pallas kernel bodies."""
    small = x < 3.75
    y = jnp.where(small, x / 3.75, 0.0)
    y = y * y
    p_small = 1.0 + y * (3.5156229 + y * (3.0899424 + y * (
        1.2067492 + y * (0.2659732 + y * (0.0360768 + y * 0.0045813)))))
    ax = jnp.maximum(x, 3.75)  # keep exp/rsqrt finite in the dead branch
    z = 3.75 / ax
    p_big = (0.39894228 + z * (0.01328592 + z * (0.00225319 + z * (
        -0.00157565 + z * (0.00916281 + z * (-0.02057706 + z * (
            0.02635537 + z * (-0.01647633 + z * 0.00392377))))))))
    big = jnp.exp(ax) * jax.lax.rsqrt(ax) * p_big
    return jnp.where(small, p_small, big)


def _i1(x):
    """Modified Bessel I1 for x >= 0 (A&S 9.8.3/9.8.4, |rel err| < 3e-7)."""
    small = x < 3.75
    y = jnp.where(small, x / 3.75, 0.0)
    y = y * y
    p_small = x * (0.5 + y * (0.87890594 + y * (0.51498869 + y * (
        0.15084934 + y * (0.02658733 + y * (0.00301532 + y * 0.00032411))))))
    ax = jnp.maximum(x, 3.75)
    z = 3.75 / ax
    inner = 0.02282967 + z * (-0.02895312 + z * (0.01787654 - z * 0.00420059))
    p_big = 0.39894228 + z * (-0.03988024 + z * (-0.00362018 + z * (
        0.00163801 + z * (-0.01031555 + z * inner))))
    big = jnp.exp(ax) * jax.lax.rsqrt(ax) * p_big
    return jnp.where(small, p_small, big)


def _i0_np(x: np.ndarray) -> np.ndarray:
    return np.i0(x)  # float64 reference (coefficient generation)


def window_value_fn(m: int, sigma: float = DEFAULT_SIGMA, window: str = DEFAULT_WINDOW):
    """phi as a jnp-traceable function of the scaled argument t = M*x - cell.

    The returned callable evaluates the active window on arrays of any shape
    (pure vector ops: one exp + one multiply for the Gaussian; one sqrt, one
    exp, one select for es) — safe inside Pallas kernel bodies.
    """
    _check_window(window)
    if window == "gaussian":
        inv_b = window_inv_b(m, sigma)
        amp = window_inv_sqrt_b_pi(m, sigma)

        def phi(t):
            return jnp.exp(-(t * t) * inv_b) * amp

        return phi

    w = m + 1.0
    inv_w2 = 1.0 / (w * w)

    if window == "kb":
        beta = kb_beta(m, sigma)
        inv_i0b = 1.0 / float(_i0_np(np.float64(beta)))

        def phi_kb(t):
            s2 = 1.0 - (t * t) * inv_w2
            inside = s2 > 0.0
            s = jnp.sqrt(jnp.where(inside, s2, 1.0))  # double-where (below)
            return jnp.where(inside, _i0(beta * s) * inv_i0b, 0.0)

        return phi_kb

    beta = es_beta(m, sigma)

    def phi(t):
        s2 = 1.0 - (t * t) * inv_w2
        inside = s2 > 0.0
        # double-where: sqrt never sees a non-positive argument, so reverse-
        # mode AD through the out-of-support branch stays NaN-free (the
        # classic where/sqrt(0) trap).
        s = jnp.sqrt(jnp.where(inside, s2, 1.0))
        return jnp.where(inside, jnp.exp(beta * (s - 1.0)), 0.0)

    return phi


def window_value_and_deriv_fn(
    m: int, sigma: float = DEFAULT_SIGMA, window: str = DEFAULT_WINDOW, *, M: int
):
    """(phi(t), d phi / d pos) as one fused evaluator (d t / d pos = M).

    Gaussian: dvals = -2*inv_b*M * t * vals.
    es:       dvals = -beta*M/( (m+1)^2 ) * t / s * vals, with the (measure
    zero) support edge s -> 0 clamped — the window itself vanishes there.
    """
    _check_window(window)
    if window == "gaussian":
        inv_b = window_inv_b(m, sigma)
        amp = window_inv_sqrt_b_pi(m, sigma)

        def phi_pair(t):
            vals = jnp.exp(-(t * t) * inv_b) * amp
            return vals, ((-2.0 * inv_b * M) * t) * vals

        return phi_pair

    w = m + 1.0
    inv_w2 = 1.0 / (w * w)

    if window == "kb":
        beta = kb_beta(m, sigma)
        inv_i0b = 1.0 / float(_i0_np(np.float64(beta)))

        def phi_pair_kb(t):
            s2 = 1.0 - (t * t) * inv_w2
            inside = s2 > 0.0
            s = jnp.sqrt(jnp.where(inside, s2, 1.0))  # double-where
            bs = beta * s
            vals = jnp.where(inside, _i0(bs) * inv_i0b, 0.0)
            # d/dpos I0(beta s)/I0(beta) = M * I1(beta s) * beta * ds/dt,
            # ds/dt = -t/(w^2 s); window vanishes at the (measure-zero)
            # support edge, so the clamped 1/s is harmless
            dvals = jnp.where(
                inside,
                (-beta * M * inv_w2) * t / jnp.maximum(s, 1e-6)
                * _i1(bs) * inv_i0b,
                0.0,
            )
            return vals, dvals

        return phi_pair_kb

    beta = es_beta(m, sigma)

    def phi_pair(t):
        s2 = 1.0 - (t * t) * inv_w2
        inside = s2 > 0.0
        s = jnp.sqrt(jnp.where(inside, s2, 1.0))  # double-where (see phi)
        vals = jnp.where(inside, jnp.exp(beta * (s - 1.0)), 0.0)
        dvals = (-beta * M * inv_w2) * t / jnp.maximum(s, 1e-6) * vals
        return vals, dvals

    return phi_pair


@functools.lru_cache(maxsize=None)
def phi_hat_inv_np(N: int, m: int, sigma: float = DEFAULT_SIGMA,
                   window: str = DEFAULT_WINDOW) -> np.ndarray:
    """Centered inverse window Fourier coefficients as float64 numpy, (N,).

    out[i] = 1 / (M * phi_act_hat(k)), k = i - N/2. Gaussian: closed form.
    es: Gauss-Legendre quadrature of the compactly supported smooth window
    (300 nodes — converged to ~1e-15 for every practical m, sigma).
    Host-side so the pruned DFT matrix builders (ops/fft.py) and
    :func:`phi_hat_inv_centered` share one definition.
    """
    _check_window(window)
    k = np.arange(N, dtype=np.float64) - N // 2
    if window == "gaussian":
        return np.exp(k * k * phi_hat_inv_param(N, m, sigma))
    w = m + 1.0
    M = sigma * N
    nodes, weights = np.polynomial.legendre.leggauss(300)
    s = np.sqrt(1.0 - nodes * nodes)
    if window == "kb":
        beta = kb_beta(m, sigma)
        prof = _i0_np(beta * s) / _i0_np(np.float64(beta))
    else:  # es
        beta = es_beta(m, sigma)
        prof = np.exp(beta * (s - 1.0))
    t = nodes * w
    vals = prof * (weights * w)
    ph = vals @ np.cos(2.0 * np.pi * np.outer(t, k / M))
    return 1.0 / ph


def compute_shifts(pos: jax.Array, N: int, m: int, sigma: float = DEFAULT_SIGMA) -> jax.Array:
    """Smallest window grid index per point and dimension.

    shifts[i, d] = floor(pos[i, d] * M) - m  with M = sigma*N (int32).

    For positions in [-1/2, 1/2) the shifts lie in [-M/2-m, M/2-m-1]; any
    position is handled via the periodic wrap applied downstream.

    Reference: compute_shifts_kernel, spatial_window_operations.cu:38-61.
    """
    M = int(round(sigma * N))
    shifts = jnp.floor(pos * M).astype(jnp.int32) - m
    return jax.lax.stop_gradient(shifts)


def _psi_arg(pos: jax.Array, shifts: jax.Array, N: int, m: int, sigma: float) -> jax.Array:
    M = int(round(sigma * N))
    window_length = 2 * m + 2
    l = jnp.arange(window_length, dtype=pos.dtype)
    # t[i, d, l] = M*pos[i,d] - shift[i,d] - l, in [m, m+1) - l
    return pos[..., None] * M - shifts[..., None].astype(pos.dtype) - l


def compute_psi(
    pos: jax.Array,
    shifts: jax.Array,
    N: int,
    m: int,
    sigma: float = DEFAULT_SIGMA,
    window: str = DEFAULT_WINDOW,
) -> jax.Array:
    """Per-point per-dimension window values, shape (n, d, 2*m+2).

    psi[i, d, l] = phi(M*pos[i,d] - shifts[i,d] - l), l in [0, 2*m+1].

    The window length is 2*m+2 (not 2*m+1): the index set spans
    [floor(M x)-m, ..., floor(M x)+m+1] so that the support is covered on both
    sides of the fractional offset.

    Reference: compute_psi_kernel, spatial_window_operations.cu:68-97.
    """
    t = _psi_arg(pos, shifts, N, m, sigma)
    return window_value_fn(m, sigma, window)(t)


def compute_psi_and_dpsi(
    pos: jax.Array,
    shifts: jax.Array,
    N: int,
    m: int,
    sigma: float = DEFAULT_SIGMA,
    window: str = DEFAULT_WINDOW,
):
    """Window values and their derivative w.r.t. the position coordinate.

    d psi / d pos[i,d] = M * phi'(t)   (chain rule, t = M*pos - ...).

    Used by the hand-written VJPs of the Pallas kernels; the pure-XLA path
    differentiates :func:`compute_psi` automatically.
    """
    M = int(round(sigma * N))
    t = _psi_arg(pos, shifts, N, m, sigma)
    return window_value_and_deriv_fn(m, sigma, window, M=M)(t)


def phi_hat_inv_centered(
    N: int,
    m: int,
    sigma: float = DEFAULT_SIGMA,
    dtype=jnp.float32,
    window: str = DEFAULT_WINDOW,
) -> jax.Array:
    """Inverse window Fourier coefficients on the centered band, shape (N,).

    out[i] = phi_hat_inv(k) for k = i - N/2, i in [0, N). Symmetric in k, so
    only |k| matters. Gaussian: exp(k^2 * b * (pi/M)^2); es: host quadrature
    (see :func:`phi_hat_inv_np`).

    Reference: compute_phi_hat_inv_kernel, spectral_window_operations.cu:27-43
    (which tabulates k in [0, N/2] and mirrors for negative k in the rolloff
    kernels at :81-95).
    """
    if window == "gaussian":
        k = jnp.arange(N, dtype=dtype) - N // 2
        return jnp.exp(k * k * phi_hat_inv_param(N, m, sigma))
    return jnp.asarray(phi_hat_inv_np(N, m, float(sigma), window), dtype=dtype)


def window_index_offsets(dim: int, m: int) -> jnp.ndarray:
    """All window multi-index combinations, shape (W, dim), W = (2m+2)**dim.

    Row w holds (l_0, ..., l_{dim-1}) with each l in [0, 2m+2). The order of
    rows is irrelevant to the math (the spread/gather sums over all of them).
    """
    L = 2 * m + 2
    grids = jnp.meshgrid(*([jnp.arange(L, dtype=jnp.int32)] * dim), indexing="ij")
    return jnp.stack(grids, axis=-1).reshape(-1, dim)


# Measured TPU pipeline floor: the planar DFTs run Precision.HIGH (3-pass
# bf16) matmuls whose rounding lands 2.1-3.0e-5 rel-L2 regardless of M, dim
# or n (TPU sweep, sigma=3 where window truncation is ~1e-9: 3D N=32/64/128/
# 256 measured 2.68/2.93/2.82/2.70e-5, 2D 2.1-2.2e-5, n 1.5k-16k flat —
# examples/validate_window_model.py + BASELINE.md "Window model validation").
# CPU backends do exact-f32 matmuls and reach ~1e-6; the model bounds the
# production (TPU) path.
_F32_PIPELINE_FLOOR = 4e-5


def _pipeline_floor() -> float:
    """Accuracy floor of the TPU planar pipeline at the active DFT matmul
    precision (ops/fft.py:matmul_precision). HIGH (default, 3-pass bf16)
    measured 2-3e-5 rel-L2 flat over N/dim/n (BASELINE.md); HIGHEST
    (6-pass) buys a tighter floor — provisionally modeled at 1e-5 pending
    an on-device refit. CPU backends (exact f32) sit near 1e-6."""
    import os

    name = os.environ.get("TORCH_NFFT_TPU_DFT_PRECISION", "high").lower()
    if name == "highest":
        return 1e-5
    if name == "default":
        return 5e-3  # single bf16 pass: ~4e-3 measured
    return _F32_PIPELINE_FLOOR


@functools.lru_cache(maxsize=None)
def _window_error_model(window: str, m: int, sigma: float,
                        floor: float) -> float:
    """Conservative rel-L2 error model at (window, m, sigma):

    truncation + TPU matmul floor + deconvolution amplification

    * window truncation ``exp(-r(sigma) * beta)``; for es the measured
      effective decay rate is r = 0.92 * (1 - 1/(2 sigma)) (falls with
      oversampling: ~0.56-0.72 at sigma=1.25, ~0.74-0.84 at sigma=2);
      for kb, r = 0.17 + 0.7565*(1 - 1/(2 sigma)) — a 0.85x-safety fit of
      the CPU oracle sweep (kb measures ~2x better than es at m=2 across
      sigma 1.25-2; see tests/test_window.py kb rows);
    * the pipeline matmul floor (precision-dependent, ``_pipeline_floor``);
    * a low-oversampling term in the deconvolution's dynamic range
      ``amp = max(phi_hat_inv)/min(phi_hat_inv)``: the rolloff correction
      amplifies f32 rounding, the dominant term below sigma ~1.5 and the
      reason accuracy DEGRADES with m there. Calibrated as an upper bound
      on the on-device 3D sweep (sigma=1.25, N=64/256: m=3 measured
      5.4-6.2e-4, m=4 measured 3.3-6.3e-3 — model 8.5e-4 / 1.3e-2); the
      round-3 CPU-only calibration used ``1e-6 * amp``, which a TPU run
      violates by up to 50x (BASELINE.md table).
    """
    if window == "kb":
        rate = 0.17 + 0.7565 * (1.0 - 1.0 / (2.0 * sigma))
        trunc = math.exp(-rate * kb_beta(m, sigma))
    else:
        rate = 0.92 * (1.0 - 1.0 / (2.0 * sigma))
        trunc = math.exp(-rate * es_beta(m, sigma))
    v = phi_hat_inv_np(64, m, float(sigma), window)
    amp = float(v.max() / v.min())
    return trunc + floor + 7e-9 * amp**3.2


def _es_error_model(m: int, sigma: float) -> float:
    """Back-compat alias: the es model at the current pipeline floor."""
    return _window_error_model("es", m, sigma, _pipeline_floor())


def suggest_window_parameters(tol: float, sigma: float = DEFAULT_SIGMA) -> dict:
    """Smallest-cost window configuration reaching ``tol`` relative L2 error.

    Considers the es and Kaiser-Bessel families (both far better than the
    reference's truncated Gaussian per support width; kb decays ~2x harder
    at m=2 and low sigma) and picks the smallest cutoff m whose conservative
    error model meets ``tol`` (see :func:`_window_error_model`: truncation
    decay + the precision-dependent TPU matmul pipeline floor + a low-sigma
    deconvolution-amplification term). Ties at equal m prefer es (cheaper
    per-window vector ops than kb's Bessel evaluation). If nothing reaches
    ``tol`` at this sigma, the most accurate configuration is returned with
    a ``UserWarning`` naming the model's reachable minimum. Tolerances
    below the pipeline floor are unreachable on the TPU planar path at ANY
    sigma at the default HIGH DFT precision — set
    TORCH_NFFT_TPU_DFT_PRECISION=highest for a tighter floor; CPU backends
    (exact-f32 matmuls) measure ~1e-6-class errors with the same
    parameters.

    Returns ``{"window": ..., "m": m, "sigma": sigma, "predicted_rel_l2":
    model_bound}`` — pass into any transform as
    ``nfft_adjoint(x, pos, cutoff=p["m"], window=p["window"])``.
    """
    tol = float(tol)
    floor = _pipeline_floor()
    errs = {
        (w, m): _window_error_model(w, m, float(sigma), floor)
        for m in range(1, 9)
        for w in ("es", "kb")
    }
    feasible = [(m, w) for (w, m), e in errs.items() if e <= tol]
    if feasible:
        m, w = min(feasible)  # smallest m; es before kb at equal m
        return {"window": w, "m": m, "sigma": sigma,
                "predicted_rel_l2": errs[(w, m)]}
    best_w, best_m = min(errs, key=errs.get)
    import warnings

    warnings.warn(
        f"tol={tol:g} is below the reachable error at sigma={sigma} "
        f"(error model minimum {errs[(best_w, best_m)]:.1e} at "
        f"window={best_w!r} m={best_m}); returning the most accurate "
        "configuration. Raising sigma helps against the low-oversampling "
        f"amplification but not below the ~{floor:.0e} matmul pipeline "
        "floor at the active DFT precision "
        "(TORCH_NFFT_TPU_DFT_PRECISION=highest tightens it); CPU backends "
        "measure ~1e-6-class errors with the same parameters",
        UserWarning,
        stacklevel=2,
    )
    return {"window": best_w, "m": best_m, "sigma": sigma,
            "predicted_rel_l2": errs[(best_w, best_m)]}
