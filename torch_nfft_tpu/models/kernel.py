"""User-facing Gaussian kernel front-end.

Re-implementation of the reference's ``torch_nfft/kernel.py``: precomputes
trigonometric coefficients once, then produces :class:`GramMatrix` /
:class:`AdjacencyMatrix` operators per point set. Registered as a pytree so a
configured kernel serializes / crosses jit boundaries like any array bundle
(SURVEY.md section 5, checkpoint row).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..ops.coeffs import gaussian_analytic_coeffs, gaussian_interpolated_coeffs
from ..utils.points import scale_points_by_norm, shift_points_by_center
from .matrices import AdjacencyMatrix, GramMatrix

__all__ = ["GaussianKernel"]


@jax.tree_util.register_pytree_node_class
class GaussianKernel:
    r"""Fast-multiplication approximation of a Gaussian kernel.

    Workflow (reference kernel.py:10-24):

    * ``kernel = GaussianKernel(sigma, ...)``
    * ``matrix = kernel(points, batch=batch)``  -> :class:`GramMatrix`
    * ``y = matrix @ x``

    Two operating modes (reference kernel.py:69-96):

    * a-priori radius: pass ``max_euclidean_norm`` / ``max_infinity_norm``;
      points are scaled by the fixed factor ``(0.25 - 0.5*reg_width)/radius``
      and the kernel is ``exp(-||z||^2 / sigma^2)``.
    * per-call scaling: without a radius, every point set is scaled by its own
      norm, giving ``exp(-||z||^2 / (rho^2 sigma^2))``.

    The point scale factor ``0.25 - 0.5*reg_width`` maps data into the NFFT's
    safe box [-1/4, 1/4] (kernel.py:76).
    """

    def __init__(
        self,
        sigma,
        dim=3,
        bandwidth=16,
        cutoff=3,
        shift_by_center=True,
        max_euclidean_norm=None,
        max_infinity_norm=None,
        analytic=False,
        reg_degree=-1,
        reg_width=0.0,
        *,
        window="gaussian",
        _coeffs=None,
    ):
        self.sigma = sigma
        self.dim = dim
        self.bandwidth = bandwidth
        self.cutoff = cutoff
        self.shift_by_center = shift_by_center
        self.analytic = analytic
        self.reg_degree = reg_degree
        self.reg_width = reg_width
        self.scale_by_norm = None
        self.window = str(window)
        self.factor = 0.25 - 0.5 * reg_width

        if reg_degree < 0:
            radius = max_infinity_norm or max_euclidean_norm
            if radius is None:
                self.scale_by_norm = "infinity"
            else:
                self.factor /= radius
        else:
            radius = max_euclidean_norm
            if radius is None and max_infinity_norm is not None:
                radius = max_infinity_norm * math.sqrt(dim)
            if radius is None:
                self.scale_by_norm = "euclidean"
            else:
                self.factor /= radius

        if _coeffs is not None:
            self.coeffs = _coeffs
        elif analytic:
            self.coeffs = gaussian_analytic_coeffs(self.factor * sigma, dim, bandwidth)
        else:
            self.coeffs = gaussian_interpolated_coeffs(
                self.factor * sigma, dim, bandwidth, reg_degree, reg_width
            )

    def gram_matrix(
        self,
        sources,
        targets=None,
        source_batch=None,
        target_batch=None,
        /,
        batch=None,
        *,
        batch_size=None,
    ):
        """Gram matrix operator for (pre-shifted, pre-scaled) point sets.

        Reference: kernel.py:99-116.
        """
        if batch is not None:
            source_batch = batch
            target_batch = batch

        symmetric = targets is None

        if self.shift_by_center:
            sources, targets = shift_points_by_center(
                sources, targets, source_batch, target_batch, num_segments=batch_size
            )

        if self.scale_by_norm is not None:
            sources, targets = scale_points_by_norm(
                sources,
                targets,
                source_batch,
                target_batch,
                factor=self.factor,
                norm=self.scale_by_norm,
                num_segments=batch_size,
            )
        else:
            sources = self.factor * jnp.asarray(sources)
            if targets is not None:
                targets = self.factor * jnp.asarray(targets)

        return GramMatrix(
            self.coeffs,
            sources,
            targets,
            source_batch,
            target_batch,
            cutoff=self.cutoff,
            batch_size=batch_size,
            window=self.window,
            _symmetric=symmetric or None,
        )

    def __call__(self, *args, **kwargs):
        return self.gram_matrix(*args, **kwargs)

    def adjacency_matrix(
        self,
        sources,
        batch=None,
        loop_weight=1,
        normalization=None,
        shift=None,
        degree_threshold=0,
        *,
        batch_size=None,
    ):
        """Graph adjacency operator. Reference: kernel.py:123-126."""
        return AdjacencyMatrix(
            self.gram_matrix(sources, batch=batch, batch_size=batch_size),
            diagonal_offset=loop_weight - 1,
            normalization=normalization,
            shift=shift,
            degree_threshold=degree_threshold,
        )

    # -- pytree protocol ----------------------------------------------------
    def tree_flatten(self):
        children = (self.coeffs,)
        aux = (
            self.sigma,
            self.dim,
            self.bandwidth,
            self.cutoff,
            self.shift_by_center,
            self.analytic,
            self.reg_degree,
            self.reg_width,
            self.scale_by_norm,
            self.factor,
            self.window,
        )
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        (coeffs,) = children
        obj = object.__new__(cls)
        (
            obj.sigma,
            obj.dim,
            obj.bandwidth,
            obj.cutoff,
            obj.shift_by_center,
            obj.analytic,
            obj.reg_degree,
            obj.reg_width,
            obj.scale_by_norm,
            obj.factor,
            obj.window,
        ) = aux
        obj.coeffs = coeffs
        return obj
