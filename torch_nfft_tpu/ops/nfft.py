"""The three core NFFT transforms: adjoint, forward, fastsum.

TPU-native (JAX/XLA) re-implementation of the reference pipeline
(``csrc/cuda/core_cuda.cu``: nfft_adjoint_cuda :144-336, nfft_forward_cuda
:340-531, nfft_fastsum_cuda :535-852), with the same public Python surface as
``torch_nfft/nfft.py`` plus two extensions:

* gradients w.r.t. the point positions (the reference returns None for pos,
  nfft.py:28,54,88) — everything here is a differentiable jnp composition;
* jit/static-shape friendliness: pass ``batch_size=`` when tracing with a
  traced ``batch`` vector.

Math conventions (verified against the dense NDFT oracle in ops/ndft.py):

  adjoint:  y[b, k, c] = sum_{i in batch b} x[i, c] * exp(+2*pi*1j * k . pos_i)
  forward:  y[i, c]    = sum_k x[batch_i, k, c] * exp(-2*pi*1j * k . pos_i)
  fastsum:  y = forward(coeffs * adjoint(x))     (per batch, per column)

with k in [-N/2, N/2)^dim. cuFFT's unnormalized transforms map to
``jnp.fft.ifftn(..., norm="forward")`` (unnormalized e^{+2 pi i}) and
``jnp.fft.fftn(...)`` (unnormalized e^{-2 pi i}).
"""

from __future__ import annotations

import math
from collections import OrderedDict
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from .spectral import (
    apply_phi_hat_inv,
    centered_crop,
    centered_embed,
    fastsum_band_filter,
)
from .spread_gather import gather, spread

__all__ = ["nfft_adjoint", "nfft_forward", "nfft_fastsum"]

# single source of truth for the window defaults: ops/window.py
from .window import DEFAULT_SIGMA, DEFAULT_WINDOW  # noqa: E402


def _complex_dtype_for(x):
    if jnp.issubdtype(x.dtype, jnp.complexfloating):
        return x.dtype
    return jnp.complex128 if x.dtype == jnp.float64 else jnp.complex64


def _normalize_batch(batch, n, batch_size):
    """Resolve (batch, batch_size) to concrete arrays / static ints."""
    if batch is None:
        return jnp.zeros((n,), dtype=jnp.int32), 1
    batch = jnp.asarray(batch)
    if batch_size is None:
        if isinstance(batch, jax.core.Tracer):
            raise ValueError(
                "batch_size must be passed explicitly when `batch` is a traced "
                "value (shapes must be static under jit)."
            )
        batch_size = int(batch[-1]) + 1
    return batch.astype(jnp.int32), int(batch_size)




# Tri-state override for tests / emergencies: None = auto-detect per call.
_COMPLEX_OK = None


def set_complex_override(value: bool | None) -> None:
    """Override complex-pipeline availability detection.

    ``True`` forces the complex-dtype pipelines, ``False`` forces the
    pure-real planar pipelines, ``None`` (default) restores per-call
    auto-detection from the active backend. Equivalent to the
    TORCH_NFFT_TPU_COMPLEX environment variable, but scriptable — this is
    load-bearing dispatch state, so prefer this setter over reaching into
    module internals."""
    global _COMPLEX_OK
    if value is not None:
        value = bool(value)
    _COMPLEX_OK = value


def _complex_ok() -> bool:
    """Whether the active backend can run complex64 FFTs (mainline CPU/TPU:
    yes; the axon TPU runtime exposes no complex dtype at all). Re-derived on
    every call from the actually-selected backend's platform_version, so
    switching platforms mid-process (jax.config.update / JAX_PLATFORMS) is
    always picked up — execution-probing is unsafe (a failed complex op
    poisons the process on exactly the runtimes to detect) and AOT
    compilation accepts complex that the runtime rejects. When complex is
    unavailable the real-valued planar pipelines (ops/planar.py) take over
    where the math allows. Override with TORCH_NFFT_TPU_COMPLEX=0/1."""
    if _COMPLEX_OK is not None:
        return _COMPLEX_OK
    import os

    env = os.environ.get("TORCH_NFFT_TPU_COMPLEX")
    if env is not None:
        return env not in ("0", "false", "no")
    try:
        version = jax.devices()[0].client.platform_version
    except Exception:
        version = ""
    return "axon" not in version.lower()


def _debug() -> bool:
    from ..utils.debug import debug_enabled

    return debug_enabled()


def _no_complex_error(op: str) -> ValueError:
    """Actionable failure instead of an opaque XLA runtime error when a
    complex-valued pipeline is requested on a complex-free backend."""
    return ValueError(
        f"{op} needs a complex-valued FFT pipeline, but the active backend "
        "has no complex/FFT support (axon TPU runtime). Either pass "
        "real_output=True with real inputs (routes through the pure-real "
        "planar pipeline), call the planar APIs directly "
        "(torch_nfft_tpu.ops.planar.nfft_adjoint_planar / "
        "nfft_forward_planar / nfft_fastsum_real), or force the complex "
        "path with TORCH_NFFT_TPU_COMPLEX=1 if your runtime does support it."
    )


def _check_plan(plan, N, m, sigma, pos=None, batch_size=None, window="gaussian"):
    """A plan with mismatched window geometry would be silently wrong (the
    grid shapes still line up when only m differs), so fail loudly. The same
    goes for a plan built on a different point set: point count, batch count
    and — when the positions are host-side NumPy, where it is free — a
    bin-id fingerprint are all verified."""
    if plan is None:
        return
    if (
        (plan.N, plan.m) != (N, m)
        or plan.sigma != float(sigma)
        or plan.window != window
    ):
        raise ValueError(
            f"plan was built for (N={plan.N}, m={plan.m}, sigma={plan.sigma}, "
            f"window={plan.window!r}) but the transform uses "
            f"(N={N}, m={m}, sigma={float(sigma)}, window={window!r})"
        )
    if pos is not None and not isinstance(pos, jax.core.Tracer):
        if plan.n != pos.shape[0]:
            raise ValueError(
                f"plan was built for n={plan.n} points but pos has "
                f"{pos.shape[0]} rows — rebuild the plan for this point set"
            )
    if (
        batch_size is not None
        and plan.batch_size is not None
        and plan.batch_size != batch_size
    ):
        raise ValueError(
            f"plan was built for batch_size={plan.batch_size} but the "
            f"transform uses batch_size={batch_size}"
        )
    if (
        pos is not None
        and isinstance(pos, np.ndarray)
        and plan.pos_fp is not None
    ):
        from .binned import position_fingerprint

        fp = position_fingerprint(pos, plan.M, plan.m)
        if fp != plan.pos_fp:
            raise ValueError(
                "plan does not match these positions (bin-id fingerprint "
                "differs) — plans are tied to the exact point set they were "
                "built on; rebuild with build_plan(pos, ...)"
            )


# Keyed LRU over eagerly-built plans: repeated eager transforms on the same
# point set pay plan construction once (reference contrast: the CUDA code
# recomputes shifts/psi every call, core_cuda.cu:192-204). Entries hold
# device arrays, so the cap stays small; clear_plan_cache() frees them.
_PLAN_CACHE: OrderedDict = OrderedDict()
_PLAN_CACHE_MAX = 4


def clear_plan_cache() -> None:
    """Drop all cached eager plans (frees their device arrays)."""
    _PLAN_CACHE.clear()
    _PLAN_ID_CACHE.clear()


# Identity fast path over the content-keyed cache: jax.Arrays are immutable,
# so seeing the SAME object again means the same content — no O(n) host read
# needed on repeat eager calls with the same array (at n=16M the content hash
# below costs ~100 ms/call host-side, which is also exactly the large-array
# case the fast path targets). NumPy arrays are mutable in place and are
# deliberately NOT identity-cached unless frozen (arr.flags.writeable is
# False): a caller that mutates pos and calls again would otherwise get a
# silently stale plan.
# Maps id(pos) -> (weakref(pos), weakref(batch) | None, params, content_key);
# the `ref() is pos` identity check makes id-reuse after GC harmless.
_PLAN_ID_CACHE: OrderedDict = OrderedDict()
_PLAN_ID_CACHE_MAX = 16


def _plan_cache_key(pos, batch, N, m, sigma, batch_size, window):
    """Content hash of the exact inputs that determine a plan, with an
    identity (same-object) fast path. A content-hash miss reads the
    positions on the host — same cost class as the host-side plan build it
    saves; callers on slow device links should pass ``plan=`` instead."""
    import hashlib
    import weakref

    def _immutable(a):
        if isinstance(a, jax.Array):
            return True
        return isinstance(a, np.ndarray) and not a.flags.writeable

    params = (N, m, float(sigma), batch_size, window)
    ent = _PLAN_ID_CACHE.get(id(pos))
    if ent is not None and _immutable(pos) and (
        batch is None or _immutable(batch)
    ):
        pref, bref, eparams, ckey = ent
        bmatch = (bref is None and batch is None) or (
            bref is not None and bref() is batch)
        if pref() is pos and bmatch and eparams == params:
            _PLAN_ID_CACHE.move_to_end(id(pos))
            return ckey

    a = np.ascontiguousarray(np.asarray(pos, dtype=np.float32))
    h = hashlib.blake2b(digest_size=16)
    h.update(a.tobytes())
    if batch is not None:
        h.update(np.ascontiguousarray(np.asarray(batch, np.int32)).tobytes())
    key = (h.digest(), a.shape, N, m, float(sigma), batch_size, window)
    if not (_immutable(pos) and (batch is None or _immutable(batch))):
        return key  # mutable inputs: content-hash every call
    try:
        pref = weakref.ref(pos)
        bref = None if batch is None else weakref.ref(batch)
    except TypeError:  # e.g. plain lists — no identity caching
        return key
    _PLAN_ID_CACHE[id(pos)] = (pref, bref, params, key)
    while len(_PLAN_ID_CACHE) > _PLAN_ID_CACHE_MAX:
        _PLAN_ID_CACHE.popitem(last=False)
    return key


def _maybe_build_plan(strategy, plan, pos, batch, N, m, sigma, batch_size, C=1,
                      window="gaussian"):
    """strategy="binned" needs a concrete-point plan built before tracing.

    "auto" with concrete points also plans eagerly once the problem outgrows
    the one-hot matmul regime: the binned engine beats XLA scatter there and
    is the only fast path on TPU runtimes without a good scatter.
    """
    if plan is not None:
        _check_plan(plan, N, m, sigma, pos, batch_size, window)
        return plan, strategy
    if strategy == "auto":
        if isinstance(pos, jax.core.Tracer):
            return None, "auto"
        from .spread_gather import _onehot_cost

        n, dim = pos.shape
        M = int(round(sigma * N))
        if n < 4096 or _onehot_cost(n, dim, batch_size, M, C) <= (1 << 24):
            return None, "auto"
        strategy = "binned"
    if strategy != "binned":
        return None, strategy
    if isinstance(pos, jax.core.Tracer):
        return None, "scatter"
    from .binned import build_plan

    key = _plan_cache_key(pos, batch, N, m, sigma, batch_size, window)
    plan = _PLAN_CACHE.get(key)
    if plan is None:
        plan = build_plan(pos, batch, N=N, m=m, sigma=sigma,
                          batch_size=batch_size, window=window)
        _PLAN_CACHE[key] = plan
        while len(_PLAN_CACHE) > _PLAN_CACHE_MAX:
            _PLAN_CACHE.popitem(last=False)
    else:
        _PLAN_CACHE.move_to_end(key)
    return plan, "auto"


# ---------------------------------------------------------------------------
# Adjoint
# ---------------------------------------------------------------------------


@partial(
    jax.jit,
    static_argnames=("batch_size", "N", "m", "real_output", "sigma", "strategy", "window"),
)
def _nfft_adjoint_impl(x, pos, batch, plan, *, batch_size, N, m, real_output, sigma, strategy, window):
    n, dim = pos.shape
    M = int(round(sigma * N))
    trailing = x.shape[1:]
    C = math.prod(trailing) if trailing else 1
    xf = x.reshape(n, C)

    with jax.named_scope("nfft_spread"):
        g = spread(xf, pos, batch, batch_size, N, m, sigma, strategy, plan=plan, window=window)
        g = g.reshape((batch_size,) + (M,) * dim + (C,))

    with jax.named_scope("nfft_fft"):
        # Unnormalized inverse DFT == cufftExecC2C(..., CUFFT_INVERSE)
        # (core_cuda.cu:267).
        g_hat = jnp.fft.ifftn(
            g.astype(_complex_dtype_for(x)), axes=tuple(range(1, dim + 1)), norm="forward"
        )

    with jax.named_scope("nfft_rolloff"):
        y = centered_crop(g_hat, dim, N, spatial_axis0=1)
        y = apply_phi_hat_inv(y, dim, N, m, sigma, spatial_axis0=1, window=window)

    y = y.reshape((batch_size,) + (N,) * dim + trailing)
    return y.real if real_output else y


def nfft_adjoint(
    x,
    pos,
    batch=None,
    bandwidth=16,
    cutoff=3,
    real_output=False,
    *,
    batch_size=None,
    N=None,
    m=None,
    sigma=DEFAULT_SIGMA,
    strategy="auto",
    plan=None,
    window=DEFAULT_WINDOW,
):
    """Adjoint NFFT: irregular samples -> centered spectral coefficients.

    Mirrors ``torch_nfft.nfft_adjoint`` (reference nfft.py:31): ``x`` has shape
    (n, *cols); returns (batch_size, N, ..., N, *cols) with frequency k stored
    at index k + N/2. ``N``/``m`` are accepted as aliases for
    ``bandwidth``/``cutoff``. Differentiable w.r.t. both x and pos.
    """
    N = int(bandwidth if N is None else N)
    m = int(cutoff if m is None else m)
    x = jnp.asarray(x)
    # NumPy positions stay on the host here: plan checks/builds read them for
    # free, and the jitted impls take them as-is.
    pos = pos if isinstance(pos, np.ndarray) else jnp.asarray(pos)
    batch, batch_size = _normalize_batch(batch, pos.shape[0], batch_size)
    if _debug():
        from ..utils.debug import validate_inputs

        validate_inputs(pos, batch, batch_size)
    plan, strategy = _maybe_build_plan(
        strategy, plan, pos, batch, N, m, sigma, batch_size,
        C=math.prod(x.shape[1:]) if x.ndim > 1 else 1,
        window=window,
    )

    if (
        real_output
        and not jnp.issubdtype(x.dtype, jnp.complexfloating)
        and not _complex_ok()
    ):
        from .planar import nfft_adjoint_planar

        trailing = x.shape[1:]
        C = math.prod(trailing) if trailing else 1
        yr, _ = nfft_adjoint_planar(
            x.reshape(x.shape[0], C).astype(jnp.float32),
            pos,
            batch,
            plan,
            batch_size=batch_size,
            N=N,
            m=m,
            sigma=float(sigma),
            strategy=strategy,
            window=window,
        )
        return yr.reshape((batch_size,) + (N,) * pos.shape[1] + trailing)

    if not _complex_ok():
        raise _no_complex_error("nfft_adjoint with complex output")

    return _nfft_adjoint_impl(
        x,
        pos,
        batch,
        plan,
        batch_size=batch_size,
        N=N,
        m=m,
        real_output=bool(real_output),
        sigma=float(sigma),
        strategy=strategy,
        window=window,
    )


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


@partial(
    jax.jit,
    static_argnames=("batch_size", "dim", "m", "real_output", "sigma", "strategy", "window"),
)
def _nfft_forward_impl(x, pos, batch, plan, *, batch_size, dim, m, real_output, sigma, strategy, window):
    N = x.shape[1]
    M = int(round(sigma * N))
    trailing = x.shape[1 + dim :]
    C = math.prod(trailing) if trailing else 1

    xc = x.reshape((batch_size,) + (N,) * dim + (C,)).astype(_complex_dtype_for(x))

    with jax.named_scope("nfft_rolloff"):
        xw = apply_phi_hat_inv(xc, dim, N, m, sigma, spatial_axis0=1, window=window)
        g_hat = centered_embed(xw, dim, N, M, spatial_axis0=1)

    with jax.named_scope("nfft_fft"):
        # Unnormalized forward DFT == cufftExecC2C(..., CUFFT_FORWARD)
        # (core_cuda.cu:445).
        g = jnp.fft.fftn(g_hat, axes=tuple(range(1, dim + 1)))

    with jax.named_scope("nfft_gather"):
        g_flat = g.reshape(batch_size * M**dim, C)
        y = gather(g_flat, pos, batch, batch_size, N, m, sigma, strategy, plan=plan, window=window)

    y = y.reshape((pos.shape[0],) + trailing)
    return y.real if real_output else y


def nfft_forward(
    x,
    pos,
    batch=None,
    cutoff=3,
    real_output=False,
    *,
    batch_size=None,
    m=None,
    sigma=DEFAULT_SIGMA,
    strategy="auto",
    plan=None,
    window=DEFAULT_WINDOW,
):
    """Forward NFFT: centered spectral coefficients -> irregular samples.

    Mirrors ``torch_nfft.nfft_forward`` (reference nfft.py:57): ``x`` has shape
    (batch_size, N, ..., N, *cols) with the number of spatial axes given by
    ``pos.shape[1]``; returns (n, *cols). Differentiable w.r.t. x and pos.
    """
    m = int(cutoff if m is None else m)
    x = jnp.asarray(x)
    pos = pos if isinstance(pos, np.ndarray) else jnp.asarray(pos)
    dim = pos.shape[1]
    batch, batch_size = _normalize_batch(batch, pos.shape[0], batch_size)
    if x.shape[0] != batch_size:
        raise ValueError(
            f"x.shape[0] = {x.shape[0]} must equal batch_size = {batch_size}"
        )
    if _debug():
        from ..utils.debug import validate_inputs

        validate_inputs(pos, batch, batch_size)
    plan, strategy = _maybe_build_plan(
        strategy, plan, pos, batch, x.shape[1], m, sigma, batch_size,
        C=math.prod(x.shape[1 + pos.shape[1]:]) if x.ndim > 1 + pos.shape[1] else 1,
        window=window,
    )

    if (
        real_output
        and not jnp.issubdtype(x.dtype, jnp.complexfloating)
        and not _complex_ok()
    ):
        from .planar import nfft_forward_planar

        N_ = x.shape[1]
        trailing = x.shape[1 + dim :]
        C = math.prod(trailing) if trailing else 1
        yr, _ = nfft_forward_planar(
            x.reshape((batch_size,) + (N_,) * dim + (C,)).astype(jnp.float32),
            None,
            pos,
            batch,
            plan,
            batch_size=batch_size,
            dim=dim,
            m=m,
            sigma=float(sigma),
            strategy=strategy,
            real_output=True,
            window=window,
        )
        return yr.reshape((pos.shape[0],) + trailing)

    if not _complex_ok():
        raise _no_complex_error("nfft_forward with complex output")

    return _nfft_forward_impl(
        x,
        pos,
        batch,
        plan,
        batch_size=batch_size,
        dim=dim,
        m=m,
        real_output=bool(real_output),
        sigma=float(sigma),
        strategy=strategy,
        window=window,
    )


# ---------------------------------------------------------------------------
# Fastsum
# ---------------------------------------------------------------------------


@partial(
    jax.jit,
    static_argnames=("batch_size", "N", "m", "sigma", "strategy", "symmetric", "window"),
)
def _nfft_fastsum_impl(
    x,
    coeffs,
    sources,
    targets,
    source_batch,
    target_batch,
    source_plan,
    target_plan,
    *,
    batch_size,
    N,
    m,
    sigma,
    strategy,
    symmetric,
    window,
):
    n_src, dim = sources.shape
    M = int(round(sigma * N))
    trailing = x.shape[1:]
    C = math.prod(trailing) if trailing else 1
    xf = x.reshape(n_src, C)
    cdtype = jnp.result_type(_complex_dtype_for(x), _complex_dtype_for(coeffs))

    with jax.named_scope("fastsum_spread"):
        g = spread(xf, sources, source_batch, batch_size, N, m, sigma, strategy, plan=source_plan, window=window)
        g = g.reshape((batch_size,) + (M,) * dim + (C,))

    with jax.named_scope("fastsum_fft_adjoint"):
        g_hat = jnp.fft.ifftn(
            g.astype(cdtype), axes=tuple(range(1, dim + 1)), norm="forward"
        )

    with jax.named_scope("fastsum_kernel_convolution"):
        # coeffs * phi_hat_inv^2 embedded on the oversampled grid, zero
        # outside the band (spectral_window_operations.cu:269-402).
        filt = fastsum_band_filter(coeffs, N, m, M, sigma, window=window)
        g_hat = g_hat * filt[None, ..., None].astype(cdtype)

    with jax.named_scope("fastsum_fft_forward"):
        g2 = jnp.fft.fftn(g_hat, axes=tuple(range(1, dim + 1)))

    with jax.named_scope("fastsum_gather"):
        g2_flat = g2.reshape(batch_size * M**dim, C)
        y = gather(g2_flat, targets, target_batch, batch_size, N, m, sigma, strategy, plan=target_plan, window=window)

    y = y.reshape((targets.shape[0],) + trailing)
    if not jnp.issubdtype(x.dtype, jnp.complexfloating):
        y = y.real
    return y


def nfft_fastsum(
    x,
    coeffs,
    sources,
    targets=None,
    source_batch=None,
    target_batch=None,
    /,
    batch=None,
    cutoff=3,
    *,
    batch_size=None,
    m=None,
    sigma=DEFAULT_SIGMA,
    strategy="auto",
    source_plan=None,
    target_plan=None,
    window=DEFAULT_WINDOW,
):
    """Fast multiplication with a trigonometric kernel (Gram) matrix.

    Mirrors ``torch_nfft.nfft_fastsum`` (reference nfft.py:91-179):
    ``y[t] ~= sum_s K(sources[s] - targets[t]) x[s]`` where K is the
    trigonometric kernel with centered coefficients ``coeffs`` (shape
    (N,)*dim, value for frequency l at index l + N/2). Real input -> real
    output. Cost O(m^dim * max(n_src, n_tgt) + N^dim log N) per column.
    """
    m_ = int(cutoff if m is None else m)
    x = jnp.asarray(x)
    coeffs = jnp.asarray(coeffs)
    sources = sources if isinstance(sources, np.ndarray) else jnp.asarray(sources)
    if targets is None:
        targets = sources
        target_batch = source_batch
        if target_plan is None:
            target_plan = source_plan
    targets = targets if isinstance(targets, np.ndarray) else jnp.asarray(targets)
    if batch is not None:
        source_batch = batch
        target_batch = batch
    # The shared-plan shortcut needs identical batch assignment too (same
    # guard as GramMatrix.is_symmetric; reference core_cuda.cu:552 compares
    # only the point tensors because its batches are one argument).
    symmetric = targets is sources and target_batch is source_batch

    N = coeffs.shape[0]
    if coeffs.ndim != sources.shape[1]:
        raise ValueError(
            f"coeffs must be {sources.shape[1]}-dimensional, got {coeffs.ndim}"
        )
    for d in range(coeffs.ndim):
        if coeffs.shape[d] != N:
            raise ValueError("coeffs must have equal size N in every dimension")

    source_batch, bs_src = _normalize_batch(source_batch, sources.shape[0], batch_size)
    target_batch, bs_tgt = _normalize_batch(target_batch, targets.shape[0], batch_size)
    if bs_src != bs_tgt:
        raise ValueError(
            f"source batch size {bs_src} != target batch size {bs_tgt}"
        )
    if _debug():
        from ..utils.debug import validate_inputs

        validate_inputs(sources, source_batch, bs_src)
        validate_inputs(targets, target_batch, bs_tgt)

    _C_fs = math.prod(x.shape[1:]) if x.ndim > 1 else 1
    source_plan, strat_src = _maybe_build_plan(
        strategy, source_plan, sources, source_batch, N, m_, sigma, bs_src,
        C=_C_fs, window=window,
    )
    if symmetric:
        target_plan = target_plan if target_plan is not None else source_plan
        strategy = strat_src
    else:
        target_plan, strategy = _maybe_build_plan(
            strategy, target_plan, targets, target_batch, N, m_, sigma, bs_tgt,
            C=_C_fs, window=window,
        )

    if (
        not jnp.issubdtype(x.dtype, jnp.complexfloating)
        and not jnp.issubdtype(coeffs.dtype, jnp.complexfloating)
        and not _complex_ok()
    ):
        from .planar import nfft_fastsum_real

        trailing = x.shape[1:]
        C = math.prod(trailing) if trailing else 1
        y = nfft_fastsum_real(
            x.reshape(x.shape[0], C).astype(jnp.float32),
            coeffs,
            sources,
            targets,
            source_batch,
            target_batch,
            source_plan,
            target_plan,
            batch_size=bs_src,
            N=N,
            m=m_,
            sigma=float(sigma),
            strategy=strategy,
            window=window,
        )
        return y.reshape((targets.shape[0],) + trailing)

    if not _complex_ok():
        raise _no_complex_error("nfft_fastsum with complex inputs")

    return _nfft_fastsum_impl(
        x,
        coeffs,
        sources,
        targets,
        source_batch,
        target_batch,
        source_plan,
        target_plan,
        batch_size=bs_src,
        N=N,
        m=m_,
        sigma=float(sigma),
        strategy=strategy,
        symmetric=symmetric,
        window=window,
    )
