"""Utility helpers: point preprocessing, batch handling, diagnostics,
iterative solvers."""

from .diagnostics import accuracy_check
from .points import (
    compute_points_center,
    compute_points_radius,
    scale_points_by_norm,
    shift_points_by_center,
)
from .solve import eigsh_operator, lanczos

__all__ = [
    "accuracy_check",
    "compute_points_center",
    "compute_points_radius",
    "shift_points_by_center",
    "scale_points_by_norm",
    "lanczos",
    "eigsh_operator",
]
