"""Kernel-matrix / model layer: lazy operators and the Gaussian kernel."""

from .kernel import GaussianKernel
from .radial import (
    InverseMultiquadricKernel,
    LaplaceKernel,
    MaternKernel,
    RadialKernel,
)
from .matrices import AbstractMatrix, AdjacencyMatrix, GramMatrix

__all__ = ["AbstractMatrix", "GramMatrix", "AdjacencyMatrix", "GaussianKernel", "RadialKernel", "LaplaceKernel", "MaternKernel", "InverseMultiquadricKernel"]
