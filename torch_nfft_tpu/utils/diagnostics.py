"""Accuracy self-check: NFFT vs the dense NDFT oracle on a subsample.

The reference has no observability beyond a compile-time printf flag
(SURVEY.md section 5); this gives users a one-call error estimate for their
actual (N, m, point distribution) configuration without paying the full
O(n N^d) oracle cost.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..ops.ndft import ndft_adjoint
from ..ops.nfft import nfft_adjoint

__all__ = ["accuracy_check"]


def accuracy_check(
    pos,
    bandwidth=16,
    cutoff=3,
    *,
    sample_points=256,
    columns=2,
    seed=0,
    sigma=2.0,
    window="gaussian",
):
    """Relative L2 error of the adjoint NFFT vs the dense NDFT on a random
    subsample of ``pos`` (single batch). Returns a float; ~1e-4 at m=4 (f32).

    Cheap: O(sample_points * N^dim). Use before committing to a (N, m)
    configuration for a new point distribution.
    """
    pos = np.asarray(pos)
    rng = np.random.default_rng(seed)
    n = pos.shape[0]
    take = min(int(sample_points), n)
    idx = rng.choice(n, size=take, replace=False)
    sub = pos[idx].astype(np.float32)
    x = rng.standard_normal((take, columns)).astype(np.float32)

    approx = nfft_adjoint(x, sub, bandwidth=bandwidth, cutoff=cutoff,
                          sigma=sigma, window=window)
    exact = ndft_adjoint(x, sub, N=bandwidth)
    num = float(jnp.linalg.norm(approx - exact))
    den = float(jnp.linalg.norm(exact))
    return num / max(den, 1e-30)
