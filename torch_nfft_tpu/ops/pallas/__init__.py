"""Pallas TPU kernels for the NFFT hot loops.

The fused window-contraction kernels live in :mod:`.contract` and are driven
by the binned engine (ops/binned.py) whenever a concrete BinnedPlan exists;
see docs/tpu_design.md for the kernel design and the Mosaic constraints it
encodes.
"""

from .contract import gather_points_pallas, pallas_supported, spread_tiles_pallas

__all__ = ["spread_tiles_pallas", "gather_points_pallas", "pallas_supported"]
