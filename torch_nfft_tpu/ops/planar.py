"""Planar-complex NFFT pipelines — the pure-real TPU execution layer.

Mainline XLA lowers ``jnp.fft`` and complex64 on TPU, but some TPU runtimes
(including the one this framework benches on) expose **no complex dtype and
no FFT primitive**. These pipelines keep the entire transform in real
float32 arrays: complex values travel as (real, imag) planes, the FFT is the
matmul DFT from ops/fft.py, and spread/gather treat the two planes as extra
columns (they are real-weighted linear maps, so plane-wise application is
exact).

Same math as ops/nfft.py (reference ``csrc/cuda/core_cuda.cu:144-852``); only
the number representation differs. Everything is jit-compatible and
differentiable.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .fft import (
    PRUNED_MAX,
    fftn_planar,
    full_filter_to_half,
    half_spectrum_to_full,
    spectral_adjoint_half_dft,
    spectral_adjoint_pruned_dft,
    spectral_forward_half_dft,
    spectral_forward_pruned_dft,
)
from .spectral import (
    apply_phi_hat_inv,
    centered_crop,
    centered_embed,
    fastsum_band_filter,
)
from .spread_gather import gather, spread
from .tilefold import (
    compact_cells,
    grid_dft_to_flat,
    grid_flat_to_dft,
    tile_array_bytes,
    use_fold,
)

__all__ = [
    "nfft_adjoint_planar",
    "nfft_forward_planar",
    "nfft_pair_planar",
    "nfft_fastsum_real",
]

# single source of truth for the window defaults: ops/window.py
from .window import DEFAULT_SIGMA, DEFAULT_WINDOW  # noqa: E402


def _hermitian() -> bool:
    """Whether real-input pipelines exploit spectral conjugate symmetry
    (half the DFT matmul FLOPs; exact to f32 round-off incl. the asymmetric
    band's -N/2 edge planes — tests/test_hermitian.py). Read at trace time;
    TORCH_NFFT_TPU_HERMITIAN=0 opts out (A/B + debugging)."""
    import os

    return os.environ.get("TORCH_NFFT_TPU_HERMITIAN", "1") != "0"


def _check_window_match(window, *plans, m=None, M=None, sigma=None):
    """A plan built for one window family — or one (M, m, sigma) geometry —
    used with another would be silently wrong (a sigma mismatch reproduces
    the round-4 bench bug: a sigma=2 plan fed to a sigma=1.75 transform ran
    at full speed and produced garbage) — fail loudly. sigma is compared
    directly, not only through the derived M: the plan's baked window
    weights depend on sigma via the es beta, so two (N, sigma) pairs that
    alias to the same M (e.g. N=16/sigma=2 vs N=20/sigma=1.6) must still be
    rejected."""
    for p in plans:
        if p is None:
            continue
        if p.window != window:
            raise ValueError(
                f"plan was built with window={p.window!r} but the transform "
                f"uses window={window!r} — rebuild the plan or pass the "
                "matching window="
            )
        if m is not None and p.m != m:
            raise ValueError(
                f"plan was built with cutoff m={p.m} but the transform uses "
                f"m={m} — rebuild the plan for this geometry"
            )
        if M is not None and p.M != M:
            raise ValueError(
                f"plan was built for an oversampled grid M={p.M} but the "
                f"transform uses M={M} (sigma*N mismatch) — rebuild the "
                "plan with this N and sigma"
            )
        if sigma is not None and p.sigma != float(sigma):
            raise ValueError(
                f"plan was built with sigma={p.sigma} but the transform "
                f"uses sigma={float(sigma)} (same M={p.M}, different N) — "
                "the plan's window weights depend on sigma; rebuild the "
                "plan for this (N, sigma)"
            )


def _dft_route(plan, C: int, batch_size: int, itemsize: int = 4):
    """(use_plan, cells) for one half of a DFT-layout pipeline: whether the
    fold engine carries the grid, and — if the plan has an active slab — the
    per-axis (offset, length) spec the pruned DFT matrices must match. The
    spread/gather side and the DFT side MUST share this decision: a compact
    grid is only meaningful to matrices built with the same cells. The
    memory budget is judged on the array the route would actually build —
    the compact slab when the plan has one, sized with the actual dtype's
    ``itemsize`` (the execute paths size their chunks from it too)."""
    if plan is None:
        return False, None
    cells = compact_cells(plan)
    if not use_fold(plan, C, itemsize, batch_size, compact=cells is not None):
        return False, None
    return True, cells


def _spread_dft(x, pos, batch, plan, batch_size, N, m, sigma, strategy, dim,
                use_plan, window=DEFAULT_WINDOW):
    """Spread onto the DFT-layout grid (B, L_1, ..., C, L_0): directly via
    the fold engine when a fold-capable plan exists (zero grid transposes,
    compact slab when the plan has one), else flat spread + the
    always-layout-safe flat->dft permute."""
    M = int(round(sigma * N))
    if use_plan:
        from .binned import spread_binned_dft

        return spread_binned_dft(
            plan, x, pos, batch_size=batch_size,
            compact=compact_cells(plan) is not None,
        )
    g = spread(x, pos, batch, batch_size, N, m, sigma, strategy, plan=plan,
               window=window)
    return grid_flat_to_dft(g, dim, M, batch_size)


def _gather_dft(g_dft, pos, batch, plan, batch_size, N, m, sigma, strategy,
                use_plan, window=DEFAULT_WINDOW):
    """Gather from the DFT-layout grid; mirror of :func:`_spread_dft`."""
    dim = pos.shape[1]
    M = g_dft.shape[-1]
    if use_plan:
        from .binned import gather_binned_dft

        return gather_binned_dft(
            plan, g_dft, pos, compact=compact_cells(plan) is not None
        )
    g_flat = grid_dft_to_flat(g_dft, dim, M, batch_size)
    return gather(g_flat, pos, batch, batch_size, N, m, sigma, strategy, plan=plan,
                  window=window)


@partial(
    jax.jit,
    static_argnames=("batch_size", "N", "m", "sigma", "strategy", "window"),
)
def nfft_adjoint_planar(
    x,
    pos,
    batch,
    plan=None,
    *,
    batch_size,
    N,
    m,
    sigma=DEFAULT_SIGMA,
    strategy="auto",
    window=DEFAULT_WINDOW,
):
    """Adjoint NFFT of real samples, planar output.

    x: (n, C) real. Returns (yr, yi) each (batch_size, (N,)*dim, C).
    """
    n, dim = pos.shape
    M = int(round(sigma * N))
    C = x.shape[1]
    _check_window_match(window, plan, m=m, M=M, sigma=sigma)

    if M <= PRUNED_MAX:
        # DFT-layout flow: fold-spread straight into (B, L1, .., C, L0)
        # (the plan's active slab when it has one), then the pruned
        # band-limited DFT (FFT + crop + rolloff fused into dim MXU
        # matmuls) — no grid-sized transposes anywhere.
        use_plan, cells = _dft_route(
            plan, C, batch_size, jnp.dtype(x.dtype).itemsize
        )
        with jax.named_scope("nfft_spread"):
            g_dft = _spread_dft(
                x, pos, batch, plan, batch_size, N, m, sigma, strategy, dim,
                use_plan, window,
            )
        with jax.named_scope("nfft_fft_rolloff"):
            if _hermitian() and N % 2 == 0:
                # real input => Hermitian spectrum: run the half-spectrum
                # DFTs (~half the matmul FLOPs) and mirror the stored half
                # onto the full band (cheap N^dim passes).
                hr, hi = spectral_adjoint_half_dft(
                    g_dft, dim, N, m, sigma, M=M, cells=cells, window=window
                )
                return half_spectrum_to_full(hr, hi, dim, N)
            return spectral_adjoint_pruned_dft(
                g_dft, None, dim, N, m, sigma, M=M, cells=cells, window=window
            )

    with jax.named_scope("nfft_spread"):
        g = spread(x, pos, batch, batch_size, N, m, sigma, strategy, plan=plan,
                   window=window)
        g = g.reshape((batch_size,) + (M,) * dim + (C,))

    with jax.named_scope("nfft_fft"):
        gr, gi = fftn_planar(g, None, axes=tuple(range(1, dim + 1)), sign=+1)

    with jax.named_scope("nfft_rolloff"):
        yr = apply_phi_hat_inv(centered_crop(gr, dim, N, 1), dim, N, m, sigma, 1,
                               window=window)
        yi = apply_phi_hat_inv(centered_crop(gi, dim, N, 1), dim, N, m, sigma, 1,
                               window=window)
    return yr, yi


@partial(
    jax.jit,
    static_argnames=("batch_size", "dim", "m", "sigma", "strategy", "real_output", "window"),
)
def nfft_forward_planar(
    xr,
    xi,
    pos,
    batch,
    plan=None,
    *,
    batch_size,
    dim,
    m,
    sigma=DEFAULT_SIGMA,
    strategy="auto",
    real_output=False,
    window=DEFAULT_WINDOW,
):
    """Forward NFFT of a planar spectrum, planar output.

    xr/xi: (batch_size, (N,)*dim, C) real planes (xi may be None).
    Returns (yr, yi) each (n, C). With ``real_output=True`` only the real
    plane is computed and gathered — the imaginary grid plane (whose gather
    a real-output caller would discard) is never materialized — and the
    return is (yr, None). yr is identical either way: the gather is a
    real-weighted linear map, so the planes never mix.
    """
    N = xr.shape[1]
    M = int(round(sigma * N))
    C = xr.shape[-1]
    _check_window_match(window, plan, m=m, M=M, sigma=sigma)

    if M <= PRUNED_MAX:
        itemsize = jnp.dtype(xr.dtype).itemsize
        use_plan2, cells2 = _dft_route(plan, 2 * C, batch_size, itemsize)
        use_plan1, cells1 = _dft_route(plan, C, batch_size, itemsize)
        # Prefer one gather with both planes on the column axis; gather the
        # planes separately (columns are independent signals) when only the
        # single-plane tile array fits the fold budget, or when the 2-plane
        # array is large enough that its unfold transients threaten HBM.
        # Real output always takes the single-plane route.
        split_planes = real_output or (
            use_plan1
            and (
                not use_plan2
                or tile_array_bytes(
                    plan, 2 * C, itemsize, batch_size,
                    compact_cells(plan) is not None,
                ) > (3 << 29)
            )
        )
        use_plan, cells = (use_plan1, cells1) if split_planes else (use_plan2, cells2)
        with jax.named_scope("nfft_rolloff_fft"):
            gr_dft, gi_dft = spectral_forward_pruned_dft(
                xr, xi, dim, M, m, sigma, cells=cells, real_only=real_output,
                window=window,
            )
        with jax.named_scope("nfft_gather"):
            if split_planes:
                yr = _gather_dft(
                    gr_dft, pos, batch, plan, batch_size, N, m, sigma,
                    strategy, use_plan, window,
                )
                if real_output:
                    return yr, None
                yi = _gather_dft(
                    gi_dft, pos, batch, plan, batch_size, N, m, sigma,
                    strategy, use_plan, window,
                )
                return yr, yi
            # Planes ride the column axis (axis -2 in the DFT layout).
            g2_dft = jnp.concatenate([gr_dft, gi_dft], axis=-2)
            y = _gather_dft(
                g2_dft, pos, batch, plan, batch_size, N, m, sigma, strategy,
                use_plan, window,
            )
        return y[:, :C], y[:, C:]

    with jax.named_scope("nfft_rolloff"):
        wr = centered_embed(
            apply_phi_hat_inv(xr, dim, N, m, sigma, 1, window=window), dim, N, M, 1
        )
        wi = (
            None
            if xi is None
            else centered_embed(
                apply_phi_hat_inv(xi, dim, N, m, sigma, 1, window=window),
                dim, N, M, 1,
            )
        )

    with jax.named_scope("nfft_fft"):
        gr, gi = fftn_planar(wr, wi, axes=tuple(range(1, dim + 1)), sign=-1)

    with jax.named_scope("nfft_gather"):
        if real_output:
            yr = gather(
                gr.reshape(batch_size * M**dim, C), pos, batch, batch_size,
                N, m, sigma, strategy, plan=plan, window=window,
            )
            return yr, None
        # Planes ride the column axis through one gather call.
        g2 = jnp.concatenate(
            [gr.reshape(batch_size * M**dim, C), gi.reshape(batch_size * M**dim, C)],
            axis=1,
        )
        y = gather(g2, pos, batch, batch_size, N, m, sigma, strategy, plan=plan,
                   window=window)
    return y[:, :C], y[:, C:]


@partial(
    jax.jit,
    static_argnames=("batch_size", "N", "m", "sigma", "strategy", "window"),
)
def nfft_pair_planar(
    x,
    pos,
    batch,
    plan=None,
    *,
    batch_size,
    N,
    m,
    sigma=DEFAULT_SIGMA,
    strategy="auto",
    window=DEFAULT_WINDOW,
):
    """Adjoint followed by a real-output forward on the same points — the
    benchmark pair (and a band-limited roundtrip filter). x: (n, C) real;
    returns (n, C) real.

    Numerically identical to ``nfft_forward_planar(*nfft_adjoint_planar(...),
    real_output=True)``, but the spectrum travels in the Hermitian HALF
    representation end to end on the pruned-DFT route: the full N^dim
    two-plane spectrum is never materialized and the spectral matmuls cost
    ~half (the reference runs full C2C in both directions,
    core_cuda.cu:263,441)."""
    n, dim = pos.shape
    M = int(round(sigma * N))
    C = x.shape[1]
    _check_window_match(window, plan, m=m, M=M, sigma=sigma)

    if M <= PRUNED_MAX and _hermitian() and N % 2 == 0:
        itemsize = jnp.dtype(x.dtype).itemsize
        use_plan, cells = _dft_route(plan, C, batch_size, itemsize)
        with jax.named_scope("pair_spread"):
            g_dft = _spread_dft(
                x, pos, batch, plan, batch_size, N, m, sigma, strategy, dim,
                use_plan, window,
            )
        with jax.named_scope("pair_fft_adjoint"):
            hr, hi = spectral_adjoint_half_dft(
                g_dft, dim, N, m, sigma, M=M, cells=cells, window=window
            )
        with jax.named_scope("pair_fft_forward"):
            gr_dft, _ = spectral_forward_half_dft(
                hr, hi, dim, M, m, sigma, cells=cells, window=window
            )
        with jax.named_scope("pair_gather"):
            return _gather_dft(
                gr_dft, pos, batch, plan, batch_size, N, m, sigma, strategy,
                use_plan, window,
            )

    yr, yi = nfft_adjoint_planar(
        x, pos, batch, plan, batch_size=batch_size, N=N, m=m, sigma=sigma,
        strategy=strategy, window=window,
    )
    zr, _ = nfft_forward_planar(
        yr, yi, pos, batch, plan, batch_size=batch_size, dim=dim, m=m,
        sigma=sigma, strategy=strategy, real_output=True, window=window,
    )
    return zr


@partial(
    jax.jit,
    static_argnames=("batch_size", "N", "m", "sigma", "strategy", "slot_io", "window"),
)
def nfft_fastsum_real(
    x,
    coeffs,
    sources,
    targets,
    source_batch,
    target_batch,
    source_plan=None,
    target_plan=None,
    *,
    batch_size,
    N,
    m,
    sigma=DEFAULT_SIGMA,
    strategy="auto",
    slot_io=False,
    window=DEFAULT_WINDOW,
):
    """Fastsum for real samples and real kernel coefficients, real output.

    The full pipeline (spread -> IFFT -> band filter -> FFT -> gather) in
    planar arithmetic; the output keeps only the real plane, which is exact
    for even real coefficients (Gaussian kernels). On the pruned-DFT route
    the spectral round trip additionally runs in the Hermitian HALF
    representation (~half the DFT matmuls) — exact under the same even-real
    coefficient contract the fastsum transpose property already requires
    (reference matrices.py:67-70); TORCH_NFFT_TPU_HERMITIAN=0 restores the
    full-spectrum path for experiments with non-even filters.

    ``slot_io=True`` switches to the slot-layout API for iterated matvecs on
    a fixed point set: ``x`` is a (C, S_src*K) slot vector of the SOURCE
    plan (ops.binned.to_slot_order) and the return is a (C, S_tgt*K) slot
    vector of the TARGET plan — the per-call point-order permutations
    (the dominant non-math cost) are skipped entirely. Requires
    fold-capable source and target plans (the pruned-DFT route).
    """
    n_src, dim = sources.shape
    M = int(round(sigma * N))
    C = x.shape[0] if slot_io else x.shape[1]
    axes = tuple(range(1, dim + 1))
    _check_window_match(window, source_plan, target_plan, m=m, M=M, sigma=sigma)

    if slot_io:
        from .binned import gather_binned_dft_slot, spread_binned_dft_slot

        itemsize = jnp.dtype(x.dtype).itemsize
        use_s, cells_s = _dft_route(source_plan, C, batch_size, itemsize)
        use_t, cells_t = _dft_route(target_plan, C, batch_size, itemsize)
        if M > PRUNED_MAX or not (use_s and use_t):
            raise ValueError(
                "slot_io=True requires fold-capable source and target plans "
                "on the pruned-DFT route (M <= PRUNED_MAX, use_fold(...) "
                "holding for both plans); build binned plans for this "
                "geometry or use the user-order entry point."
            )
        with jax.named_scope("fastsum_spread"):
            g_dft = spread_binned_dft_slot(
                source_plan, x, batch_size=batch_size,
                compact=cells_s is not None,
            )
        if _hermitian() and N % 2 == 0:
            # real sources + even real coeffs (the fastsum/Gram contract,
            # matrices.py transpose property): the whole spectral round
            # trip runs on the Hermitian half representation.
            with jax.named_scope("fastsum_fft_adjoint"):
                hr, hi = spectral_adjoint_half_dft(
                    g_dft, dim, N, m, sigma, M=M, cells=cells_s,
                    window=window,
                )
            with jax.named_scope("fastsum_kernel_convolution"):
                ch = full_filter_to_half(coeffs, dim, N)[None, ..., None]
                hr = hr * ch
                hi = hi * ch
            with jax.named_scope("fastsum_fft_forward"):
                gr_dft, _ = spectral_forward_half_dft(
                    hr, hi, dim, M, m, sigma, cells=cells_t, window=window
                )
            with jax.named_scope("fastsum_gather"):
                return gather_binned_dft_slot(
                    target_plan, gr_dft, compact=cells_t is not None
                )
        with jax.named_scope("fastsum_fft_adjoint"):
            sr, si = spectral_adjoint_pruned_dft(
                g_dft, None, dim, N, m, sigma, M=M, cells=cells_s, window=window
            )
        with jax.named_scope("fastsum_kernel_convolution"):
            cf = coeffs[None, ..., None]
            sr = sr * cf
            si = si * cf
        with jax.named_scope("fastsum_fft_forward"):
            gr_dft, _ = spectral_forward_pruned_dft(
                sr, si, dim, M, m, sigma, cells=cells_t, real_only=True,
                window=window,
            )
        with jax.named_scope("fastsum_gather"):
            return gather_binned_dft_slot(
                target_plan, gr_dft, compact=cells_t is not None
            )

    if M <= PRUNED_MAX:
        # Band-limited round trip in the DFT grid layout: the fastsum filter
        # zeroes everything outside the N-band anyway
        # (spectral_window_operations.cu:313-324), so both DFTs run pruned and
        # the coeff multiply happens on the N^dim band (phi_hat_inv^2 arrives
        # via one factor in each pruned matrix).
        # The source and target halves may use different plans (and thus
        # different active slabs); the N^dim mid-spectrum is slab-independent,
        # so each half simply carries its own cells spec.
        itemsize = jnp.dtype(x.dtype).itemsize
        use_s, cells_s = _dft_route(source_plan, C, batch_size, itemsize)
        use_t, cells_t = _dft_route(target_plan, C, batch_size, itemsize)
        with jax.named_scope("fastsum_spread"):
            g_dft = _spread_dft(
                x, sources, source_batch, source_plan,
                batch_size, N, m, sigma, strategy, dim, use_s, window,
            )
        if _hermitian() and N % 2 == 0:
            # Hermitian half round trip (see the slot_io branch above).
            with jax.named_scope("fastsum_fft_adjoint"):
                hr, hi = spectral_adjoint_half_dft(
                    g_dft, dim, N, m, sigma, M=M, cells=cells_s,
                    window=window,
                )
            with jax.named_scope("fastsum_kernel_convolution"):
                ch = full_filter_to_half(coeffs, dim, N)[None, ..., None]
                hr = hr * ch
                hi = hi * ch
            with jax.named_scope("fastsum_fft_forward"):
                gr_dft, _ = spectral_forward_half_dft(
                    hr, hi, dim, M, m, sigma, cells=cells_t, window=window
                )
            with jax.named_scope("fastsum_gather"):
                return _gather_dft(
                    gr_dft, targets, target_batch, target_plan,
                    batch_size, N, m, sigma, strategy, use_t, window,
                )
        with jax.named_scope("fastsum_fft_adjoint"):
            sr, si = spectral_adjoint_pruned_dft(
                g_dft, None, dim, N, m, sigma, M=M, cells=cells_s, window=window
            )
        with jax.named_scope("fastsum_kernel_convolution"):
            cf = coeffs[None, ..., None]
            sr = sr * cf
            si = si * cf
        with jax.named_scope("fastsum_fft_forward"):
            # real_only: the output is real, so the imaginary grid plane
            # (whose gather would be discarded below) is never built.
            gr_dft, _ = spectral_forward_pruned_dft(
                sr, si, dim, M, m, sigma, cells=cells_t, real_only=True,
                window=window,
            )
        with jax.named_scope("fastsum_gather"):
            # Only the real plane matters for the (real) output.
            return _gather_dft(
                gr_dft, targets, target_batch, target_plan,
                batch_size, N, m, sigma, strategy, use_t, window,
            )

    with jax.named_scope("fastsum_spread"):
        g = spread(x, sources, source_batch, batch_size, N, m, sigma, strategy,
                   plan=source_plan, window=window)
        g = g.reshape((batch_size,) + (M,) * dim + (C,))

    with jax.named_scope("fastsum_fft_adjoint"):
        gr, gi = fftn_planar(g, None, axes=axes, sign=+1)

    with jax.named_scope("fastsum_kernel_convolution"):
        filt = fastsum_band_filter(coeffs, N, m, M, sigma, window=window)[None, ..., None]
        gr = gr * filt
        gi = gi * filt

    with jax.named_scope("fastsum_fft_forward"):
        gr, gi = fftn_planar(gr, gi, axes=axes, sign=-1)

    with jax.named_scope("fastsum_gather"):
        # Only the real plane matters for the (real) output.
        y = gather(
            gr.reshape(batch_size * M**dim, C),
            targets,
            target_batch,
            batch_size,
            N,
            m,
            sigma,
            strategy,
            plan=target_plan,
            window=window,
        )
    return y
