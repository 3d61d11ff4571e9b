"""torch_nfft_tpu — a TPU-native batched NFFT framework in JAX.

A from-scratch re-design of the capabilities of ``dominikbuenger/torch_nfft``
(batched non-equispaced FFTs in 1/2/3 dimensions + NFFT-based fast Gaussian
kernel summation) for TPU hardware: XLA FFTs on the oversampled grid,
MXU/scatter/Pallas spreading strategies, shard_map multi-chip scaling, and
full differentiability — including point-position gradients the reference
does not provide.

Public API parity with the reference package ``torch_nfft/__init__.py:14-20``.
"""

from .models.kernel import GaussianKernel
from .models.radial import (
    InverseMultiquadricKernel,
    LaplaceKernel,
    MaternKernel,
    RadialKernel,
)
from .models.matrices import AbstractMatrix, AdjacencyMatrix, GramMatrix
from .ops.coeffs import (
    gaussian_analytic_coeffs,
    gaussian_interpolated_coeffs,
    interpolated_kernel_coeffs,
    interpolation_grid,
    radial_interpolation_grid,
)
from .ops.ndft import (
    exact_gaussian_matrix,
    exact_radial_matrix,
    exact_trigonometric_matrix,
    ndft_adjoint,
    ndft_fastsum,
    ndft_forward,
)
from .ops.binned import (
    BinnedPlan,
    build_plan,
    build_plan_device,
    from_slot_order,
    to_slot_order,
)
from .ops.plan_io import load_plan, save_plan
from .ops.window import suggest_window_parameters
from .ops.nfft import (
    clear_plan_cache,
    nfft_adjoint,
    nfft_fastsum,
    nfft_forward,
    set_complex_override,
)
from .ops.planar import (
    nfft_adjoint_planar,
    nfft_fastsum_real,
    nfft_forward_planar,
)
from .ops.streaming import (
    StreamedLayout,
    make_streamed_layout,
    nfft_adjoint_streamed,
    nfft_fastsum_streamed,
    nfft_forward_streamed,
)
from . import parallel
from .utils.diagnostics import accuracy_check
from .utils.solve import eigsh_operator, lanczos
from .utils.points import (
    compute_points_center,
    compute_points_radius,
    scale_points_by_norm,
    shift_points_by_center,
)

__version__ = "0.3.0"  # keep in sync with pyproject.toml

__all__ = [
    "nfft_forward",
    "nfft_adjoint",
    "set_complex_override",
    "suggest_window_parameters",
    "nfft_fastsum",
    "BinnedPlan",
    "build_plan",
    "build_plan_device",
    "to_slot_order",
    "from_slot_order",
    "save_plan",
    "load_plan",
    "clear_plan_cache",
    "nfft_adjoint_planar",
    "nfft_forward_planar",
    "nfft_fastsum_real",
    "StreamedLayout",
    "make_streamed_layout",
    "nfft_adjoint_streamed",
    "nfft_forward_streamed",
    "nfft_fastsum_streamed",
    "parallel",
    "ndft_forward",
    "ndft_adjoint",
    "ndft_fastsum",
    "exact_trigonometric_matrix",
    "exact_gaussian_matrix",
    "exact_radial_matrix",
    "gaussian_analytic_coeffs",
    "gaussian_interpolated_coeffs",
    "interpolation_grid",
    "radial_interpolation_grid",
    "interpolated_kernel_coeffs",
    "GramMatrix",
    "AdjacencyMatrix",
    "AbstractMatrix",
    "GaussianKernel",
    "RadialKernel",
    "LaplaceKernel",
    "MaternKernel",
    "InverseMultiquadricKernel",
    "accuracy_check",
    "lanczos",
    "eigsh_operator",
    "compute_points_center",
    "compute_points_radius",
    "shift_points_by_center",
    "scale_points_by_norm",
]
