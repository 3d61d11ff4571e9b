"""Pallas TPU kernels for the spread/gather hot loops (large-grid strategy).

Populated incrementally; the dispatcher in ops/spread_gather.py falls back to
the XLA scatter strategy when a kernel is unavailable for a configuration.
"""

from .spread import gather_pallas, spread_pallas  # noqa: F401

__all__ = ["spread_pallas", "gather_pallas"]
