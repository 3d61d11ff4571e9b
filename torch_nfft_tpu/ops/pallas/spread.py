"""Placeholder Pallas spread/gather — falls back to the XLA strategies.

The sorted-tile kernels land here; until then requesting strategy="pallas"
uses the scatter path so results are always correct.
"""

from __future__ import annotations


def spread_pallas(x, pos, batch, batch_size, N, m, sigma):
    from ..spread_gather import _spread_scatter

    return _spread_scatter(x, pos, batch, batch_size, N, m, sigma, None)


def gather_pallas(g_flat, pos, batch, batch_size, N, m, sigma):
    from ..spread_gather import _gather_scatter

    return _gather_scatter(g_flat, pos, batch, N, m, sigma, None)
