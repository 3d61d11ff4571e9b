"""Generic radial-kernel front-ends built on the interpolated-coeffs workflow.

The reference ships only a Gaussian front-end (``torch_nfft/kernel.py``) but
documents a workflow for arbitrary user-defined kernels: evaluate the kernel
on ``radial_interpolation_grid`` and feed the samples through
``interpolated_kernel_coeffs`` (reference
docs/source/theory/kernelmatrices.rst:158-163, coeff ops at
csrc/cuda/kernel_coeffs.cu:76-123,179-202). :class:`RadialKernel` packages
that workflow with the same scaling/shifting semantics as
:class:`~torch_nfft_tpu.models.kernel.GaussianKernel` (reference
kernel.py:69-116), so any radial profile gets the full GramMatrix /
AdjacencyMatrix operator surface. :class:`LaplaceKernel`,
:class:`MaternKernel` and :class:`InverseMultiquadricKernel` are ready-made
profiles.

Extension over the reference: boundary regularization (``reg_degree >= 0``,
``reg_width > 0``) works for *any* profile here via a two-point Hermite
polynomial whose left-end derivatives are estimated numerically — the
reference stubs regularization out even for the Gaussian
(kernel_coeffs.cu:67-69).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.coeffs import interpolated_kernel_coeffs
from ..utils.points import scale_points_by_norm, shift_points_by_center
from .matrices import AdjacencyMatrix, GramMatrix

__all__ = [
    "RadialKernel",
    "LaplaceKernel",
    "MaternKernel",
    "InverseMultiquadricKernel",
]


def _local_poly_derivatives(profile, a: float, p: int) -> np.ndarray:
    """profile^(j)(a) for j = 0..p, via a local least-squares polynomial fit.

    Fits a degree-(2p+2) polynomial to float64 samples of ``profile`` on a
    small window around ``a`` and differentiates the fit — stabler than
    high-order finite differences for the smooth profiles used here.
    """
    deg = 2 * p + 2
    half = max(2e-2, 1e-3 * max(abs(a), 1.0) * (p + 1))
    # Keep the window inside r >= 0 where radial profiles are defined.
    lo = max(0.0, a - half)
    xs = np.linspace(lo, a + half, 8 * deg + 9, dtype=np.float64)
    ys = np.asarray(profile(xs), dtype=np.float64)
    # Fit around the expansion point so coefficient c_j = f^(j)(a)/j!.
    coefs = np.polynomial.polynomial.polyfit(xs - a, ys, deg)
    return np.array([coefs[j] * math.factorial(j) for j in range(p + 1)])


def _hermite_boundary_polynomial(profile, eps: float, p: int) -> np.ndarray:
    """Degree-2p polynomial T on [1/2-eps, 1/2] with

    T^(j)(1/2-eps) = profile^(j)(1/2-eps)  for j = 0..p  (smooth continuation)
    T^(j)(1/2)     = 0                     for j = 1..p  (flat at period edge)

    Monomial coefficients, lowest degree first. Same construction as the
    Gaussian-specific regularizer in ``ops.coeffs._boundary_polynomial``, but
    with numerically estimated left-end derivatives so it applies to any
    profile.
    """
    a = 0.5 - eps
    b = 0.5
    ncoef = 2 * p + 1
    A = np.zeros((ncoef, ncoef))
    rhs = np.zeros(ncoef)
    ka = _local_poly_derivatives(profile, a, p)

    def deriv_row(x, j):
        row = np.zeros(ncoef)
        for c in range(j, ncoef):
            row[c] = math.perm(c, j) * x ** (c - j)
        return row

    for j in range(p + 1):
        A[j] = deriv_row(a, j)
        rhs[j] = ka[j]
    for j in range(1, p + 1):
        A[p + j] = deriv_row(b, j)
        rhs[p + j] = 0.0
    return np.linalg.solve(A, rhs)


@jax.tree_util.register_pytree_node_class
class RadialKernel:
    r"""Fast-multiplication approximation of an arbitrary radial kernel.

    ``profile`` is a callable ``r -> K(r)`` (NumPy float64 in, array out)
    giving the kernel as a function of distance. Workflow and scaling
    semantics mirror :class:`GaussianKernel` (reference kernel.py:69-116):

    * a-priori radius mode: pass ``max_euclidean_norm`` / ``max_infinity_norm``
      and ``profile`` receives distances in the *original* data units — the
      operator approximates ``K(||s - t||)`` on the (shifted) input points.
    * per-call scaling mode: without a radius, each point set is scaled by its
      own norm into the safe box and ``profile`` receives distances in the
      norm-scaled domain (the point set divided by its own norm, so distances
      lie in [0, ~2]); the effective original-unit kernel then depends on the
      point set's norm, exactly as the reference's per-call Gaussian mode does
      (kernel.py:39-40).

    With ``reg_degree >= 0`` and ``reg_width > 0`` the sampled kernel is
    smoothly flattened near the torus boundary (two-point Hermite polynomial
    on [1/2-eps, 1/2]), which suppresses periodization artifacts for slowly
    decaying profiles.
    """

    def __init__(
        self,
        profile,
        dim=3,
        bandwidth=16,
        cutoff=3,
        shift_by_center=True,
        max_euclidean_norm=None,
        max_infinity_norm=None,
        reg_degree=-1,
        reg_width=0.0,
        *,
        window="gaussian",
        _coeffs=None,
    ):
        self.profile = profile
        self.dim = dim
        self.bandwidth = bandwidth
        self.cutoff = cutoff
        self.shift_by_center = shift_by_center
        self.reg_degree = reg_degree
        self.reg_width = reg_width
        self.scale_by_norm = None
        self.window = str(window)
        self.factor = 0.25 - 0.5 * reg_width

        # Norm-mode selection mirrors GaussianKernel / reference kernel.py:
        # unregularized kernels admit the tighter infinity-norm box; the
        # regularized branch needs the euclidean radius (kernel.py:72-85).
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
        else:
            self.coeffs = self._build_coeffs()

    # -- coefficient construction -------------------------------------------
    def _build_coeffs(self):
        # float64 radii of the interpolation grid nodes, computed host-side
        # (same nodes as ops.coeffs.radial_interpolation_grid, which is the
        # reference's fill_radial_interpolation_grid_kernel,
        # kernel_coeffs.cu:99-123).
        N = self.bandwidth
        g1 = np.arange(N, dtype=np.float64) / N - 0.5
        grids = np.meshgrid(*([g1] * self.dim), indexing="ij")
        r = np.sqrt(sum(g * g for g in grids))

        # Grid distances r relate to profile-domain distances by the point
        # scale factor: r = factor * D with D in original units (radius mode)
        # or in the norm-scaled domain (per-call mode). Mirrors the Gaussian's
        # sigma' = factor * sigma coefficient scaling (kernel.py:90-94).
        factor = self.factor

        def prof(rr, _p=self.profile, _f=factor):
            return _p(np.asarray(rr, dtype=np.float64) / _f)

        p, eps = self.reg_degree, self.reg_width
        if p >= 0:
            if eps <= 0.0:
                raise ValueError(
                    "Regularized radial coefficients (reg_degree >= 0) "
                    "require reg_width > 0"
                )
            coefs = _hermite_boundary_polynomial(prof, float(eps), int(p))
            t_poly = np.polynomial.polynomial.polyval(r, coefs)
            t_edge = float(np.polynomial.polynomial.polyval(0.5, coefs))
            vals = np.asarray(prof(r), dtype=np.float64)
            vals = np.where(r > 0.5 - eps, t_poly, vals)
            vals = np.where(r >= 0.5, t_edge, vals)
        else:
            vals = np.asarray(prof(r), dtype=np.float64)

        return interpolated_kernel_coeffs(jnp.asarray(vals, dtype=jnp.float32))

    # -- operator construction (same surface as GaussianKernel) --------------
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
        """Gram matrix operator for the given point sets.

        Reference workflow: kernel.py:99-116.
        """
        if batch is not None:
            source_batch = batch
            target_batch = batch

        symmetric = targets is None

        if self.shift_by_center:
            sources, targets = shift_points_by_center(
                sources, targets, source_batch, target_batch,
                num_segments=batch_size,
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
        """Graph adjacency operator. Reference surface: kernel.py:123-126."""
        return AdjacencyMatrix(
            self.gram_matrix(sources, batch=batch, batch_size=batch_size),
            diagonal_offset=loop_weight - 1,
            normalization=normalization,
            shift=shift,
            degree_threshold=degree_threshold,
        )

    # -- pytree protocol ------------------------------------------------------
    def tree_flatten(self):
        children = (self.coeffs,)
        aux = (
            self.profile,
            self.dim,
            self.bandwidth,
            self.cutoff,
            self.shift_by_center,
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
            obj.profile,
            obj.dim,
            obj.bandwidth,
            obj.cutoff,
            obj.shift_by_center,
            obj.reg_degree,
            obj.reg_width,
            obj.scale_by_norm,
            obj.factor,
            obj.window,
        ) = aux
        obj.coeffs = coeffs
        return obj


class _SigmaRadialKernel(RadialKernel):
    """Shared plumbing for one-parameter (sigma) radial profiles."""

    def __init__(self, sigma, **kwargs):
        self.sigma = float(sigma)
        super().__init__(self._profile, **kwargs)

    def _profile(self, r):
        raise NotImplementedError

    def tree_flatten(self):
        children, aux = super().tree_flatten()
        return children, (self.sigma,) + aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = super().tree_unflatten(aux[1:], children)
        obj.sigma = aux[0]
        return obj


class LaplaceKernel(_SigmaRadialKernel):
    r"""Exponential (Laplace) kernel ``K(r) = exp(-r / sigma)``."""

    def _profile(self, r):
        return np.exp(-np.asarray(r, dtype=np.float64) / self.sigma)


class MaternKernel(_SigmaRadialKernel):
    r"""Matern kernel with smoothness ``nu`` in {0.5, 1.5, 2.5}.

    nu=0.5 is the Laplace kernel; nu=1.5 / 2.5 use the standard closed forms
    ``(1 + a) exp(-a)`` with ``a = sqrt(3) r / sigma`` and
    ``(1 + a + a^2/3) exp(-a)`` with ``a = sqrt(5) r / sigma``.
    """

    def __init__(self, sigma, nu=1.5, **kwargs):
        if nu not in (0.5, 1.5, 2.5):
            raise ValueError("MaternKernel supports nu in {0.5, 1.5, 2.5}")
        self.nu = float(nu)
        super().__init__(sigma, **kwargs)

    def _profile(self, r):
        r = np.asarray(r, dtype=np.float64)
        if self.nu == 0.5:
            return np.exp(-r / self.sigma)
        if self.nu == 1.5:
            a = math.sqrt(3.0) * r / self.sigma
            return (1.0 + a) * np.exp(-a)
        a = math.sqrt(5.0) * r / self.sigma
        return (1.0 + a + a * a / 3.0) * np.exp(-a)

    def tree_flatten(self):
        children, aux = super().tree_flatten()
        return children, (self.nu,) + aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = super().tree_unflatten(aux[1:], children)
        obj.nu = aux[0]
        return obj


class InverseMultiquadricKernel(_SigmaRadialKernel):
    r"""Inverse multiquadric kernel ``K(r) = 1 / sqrt(1 + (r / sigma)^2)``."""

    def _profile(self, r):
        a = np.asarray(r, dtype=np.float64) / self.sigma
        return 1.0 / np.sqrt(1.0 + a * a)
