"""Shared test utilities: point-cloud generators and error norms.

Mirrors the reference test setup (test/test_adjoint.py:21-31): points are
scaled well inside the unit box because the window support spills +-m grid
cells.
"""

import numpy as np


def rel_err(a, b, ord=None):
    a = np.asarray(a)
    b = np.asarray(b)
    return np.linalg.norm((a - b).ravel(), ord=ord) / np.linalg.norm(b.ravel(), ord=ord)


def max_err(a, b):
    return np.abs(np.asarray(a) - np.asarray(b)).max()


def make_points(rng, n, dim, batches=1, scale="norm"):
    """Random points in the NFFT-safe region, plus the batch index vector."""
    pos = rng.random((n * batches, dim), dtype=np.float32) - 0.5
    if scale == "norm":
        pos /= 4 * np.linalg.norm(pos, axis=1, keepdims=True).clip(min=1e-6)
    else:
        pos *= 0.5  # inside [-1/4, 1/4]
    batch = None if batches <= 1 else (np.arange(n * batches) // n).astype(np.int32)
    return pos.astype(np.float32), batch
