"""Debug-mode input validation (SURVEY.md section 5, race-detection row).

The engines are deterministic by construction (sort + segment contractions —
no atomics, so the reference's race class cannot exist here), but malformed
inputs can still produce silently-wrong output: out-of-range batch indices
are dropped by the CLIP/drop scatter modes, unsorted batch vectors break the
``batch[-1] + 1`` convention (``core_cuda.cu:60``), and NaN positions poison
the window products. Two layers of defense:

* :func:`validate_inputs` — host-side checks on concrete inputs, run
  automatically by the eager transform wrappers when
  ``TORCH_NFFT_TPU_DEBUG=1``;
* :func:`with_checkify` — wraps any jitted transform with
  ``jax.experimental.checkify`` index/NaN checks, surfacing out-of-bounds
  grid indices and NaN propagation inside compiled code (the TPU-native
  stand-in for the reference's per-kernel ``CHECK_ERRORS`` sync,
  ``cuda_utils.cu:16``).
"""

from __future__ import annotations

import os

import numpy as np

import jax

__all__ = ["debug_enabled", "validate_inputs", "with_checkify"]


def debug_enabled() -> bool:
    return os.environ.get("TORCH_NFFT_TPU_DEBUG", "0") not in ("0", "", "false")


def validate_inputs(pos, batch=None, batch_size=None) -> None:
    """Raise ValueError on malformed concrete inputs (no-op for tracers)."""
    if isinstance(pos, jax.core.Tracer) or isinstance(batch, jax.core.Tracer):
        return
    p = np.asarray(pos)
    if not np.isfinite(p).all():
        raise ValueError("positions contain non-finite values")
    if np.abs(p).max() > 0.5:
        raise ValueError(
            "positions must lie in [-1/2, 1/2); scale them first "
            "(scale_points_by_norm / GaussianKernel do this automatically)"
        )
    if batch is not None:
        b = np.asarray(batch)
        if b.shape != (p.shape[0],):
            raise ValueError(f"batch shape {b.shape} != (n,) = ({p.shape[0]},)")
        if b.size and np.any(b[1:] < b[:-1]):
            raise ValueError("batch indices must be sorted ascending")
        if b.size and (b[0] < 0 or (batch_size is not None and b[-1] >= batch_size)):
            raise ValueError(
                f"batch indices must lie in [0, {batch_size}); got "
                f"[{int(b.min())}, {int(b.max())}]"
            )


def with_checkify(fn):
    """Wrap ``fn`` so every call runs under checkify index/NaN checks and
    throws a JaxRuntimeError naming the failed check. Debug tool — adds
    real overhead; do not wrap production hot paths."""
    from jax.experimental import checkify

    checked = checkify.checkify(
        fn, errors=checkify.index_checks | checkify.nan_checks
    )

    def wrapped(*args, **kwargs):
        err, out = checked(*args, **kwargs)
        err.throw()
        return out

    return wrapped
