"""PyTorch-facing compatibility layer: the reference's exact API on torch
tensors, executed by this package's JAX/TPU pipelines.

Migration aid for users of ``dominikbuenger/torch_nfft``: every public
function of the reference's functional layer (``torch_nfft/nfft.py:31,57,91``,
``coeffs.py:10-27``, ``ndft.py:5-117``) is available here with the same
signature, taking and returning ``torch.Tensor``s, **including torch
autograd**: the transforms are wrapped in ``torch.autograd.Function``s with
the reference's backward pairing (adjoint's backward is the forward
transform and vice versa, fastsum's backward swaps sources and targets —
reference ``nfft.py:23-28,49-54,83-88``). Gradients flow to the coefficient
tensor ``x`` only, exactly like the reference (``nfft.py:28,54,88``); for
position gradients use the native JAX API (``torch_nfft_tpu.nfft_adjoint``
under ``jax.grad``), which the reference does not offer.

Tensors are bridged host-side via numpy (CPU torch <-> JAX on whatever
backend JAX selected), so the JAX side may run on TPU while the user code
stays in torch. The bridge is a copy; for zero-copy pipelines use the JAX
API directly.
"""

from __future__ import annotations

import numpy as np

try:
    import torch
except ImportError as _e:  # pragma: no cover - torch is baked into CI images
    raise ImportError(
        "torch_nfft_tpu.torch_compat requires PyTorch; install torch or use "
        "the JAX-native API (torch_nfft_tpu.nfft_adjoint etc.)"
    ) from _e

from .ops import coeffs as _coeffs
from .ops import ndft as _ndft
from .ops import nfft as _nfft

__all__ = [
    "nfft_adjoint",
    "nfft_forward",
    "nfft_fastsum",
    "gaussian_analytic_coeffs",
    "gaussian_interpolated_coeffs",
    "interpolation_grid",
    "radial_interpolation_grid",
    "interpolated_kernel_coeffs",
    "ndft_adjoint",
    "ndft_forward",
    "ndft_fastsum",
    "exact_trigonometric_matrix",
    "exact_gaussian_matrix",
    "GramMatrix",
    "AdjacencyMatrix",
    "GaussianKernel",
    "RadialKernel",
    "LaplaceKernel",
    "MaternKernel",
    "InverseMultiquadricKernel",
]


def _to_jax(t):
    """torch.Tensor (CPU or CUDA) | array-like -> host numpy array."""
    if t is None:
        return None
    if isinstance(t, torch.Tensor):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def _to_torch(a) -> "torch.Tensor":
    """JAX array -> torch CPU tensor (copying, breaks no autograd tape).

    np.array (not asarray): jax device arrays export read-only numpy views,
    which torch.from_numpy would wrap with a non-writable warning."""
    return torch.from_numpy(np.array(a))


class _NfftAdjointFunction(torch.autograd.Function):
    """Mirror of the reference ``NfftAdjointFunction`` (nfft.py:8-28)."""

    @staticmethod
    def forward(ctx, x, pos, batch, bandwidth, cutoff, real_output):
        y = _nfft.nfft_adjoint(
            _to_jax(x), _to_jax(pos), _to_jax(batch),
            bandwidth=bandwidth, cutoff=cutoff, real_output=real_output,
        )
        ctx.pos_np = _to_jax(pos)
        ctx.batch_np = _to_jax(batch)
        ctx.cutoff = cutoff
        ctx.real_input = not x.is_complex()
        return _to_torch(y)

    @staticmethod
    def backward(ctx, dy):
        dx = _nfft.nfft_forward(
            _to_jax(dy), ctx.pos_np, ctx.batch_np,
            cutoff=ctx.cutoff, real_output=ctx.real_input,
        )
        return _to_torch(dx), None, None, None, None, None


def nfft_adjoint(x, pos, batch=None, bandwidth=16, cutoff=3, real_output=False):
    """Reference-parity adjoint NFFT on torch tensors (nfft.py:31)."""
    return _NfftAdjointFunction.apply(x, pos, batch, bandwidth, cutoff, real_output)


class _NfftForwardFunction(torch.autograd.Function):
    """Mirror of the reference ``NfftForwardFunction`` (nfft.py:34-54)."""

    @staticmethod
    def forward(ctx, x, pos, batch, cutoff, real_output):
        y = _nfft.nfft_forward(
            _to_jax(x), _to_jax(pos), _to_jax(batch),
            cutoff=cutoff, real_output=real_output,
        )
        ctx.pos_np = _to_jax(pos)
        ctx.batch_np = _to_jax(batch)
        ctx.cutoff = cutoff
        ctx.bandwidth = x.size(1)
        ctx.real_input = not x.is_complex()
        return _to_torch(y)

    @staticmethod
    def backward(ctx, dy):
        dx = _nfft.nfft_adjoint(
            _to_jax(dy), ctx.pos_np, ctx.batch_np,
            bandwidth=ctx.bandwidth, cutoff=ctx.cutoff,
            real_output=ctx.real_input,
        )
        return _to_torch(dx), None, None, None, None


def nfft_forward(x, pos, batch=None, cutoff=3, real_output=False):
    """Reference-parity forward NFFT on torch tensors (nfft.py:57)."""
    return _NfftForwardFunction.apply(x, pos, batch, cutoff, real_output)


class _NfftFastsumFunction(torch.autograd.Function):
    """Mirror of the reference ``NfftFastsumFunction`` (nfft.py:62-88)."""

    @staticmethod
    def forward(ctx, x, coeffs, sources, targets, source_batch, target_batch,
                cutoff):
        for t, what in (
            (coeffs, "coefficients"),
            (sources, "sources"),
            (targets, "targets"),
            (source_batch, "batches"),
            (target_batch, "batches"),
        ):
            assert not (isinstance(t, torch.Tensor) and t.requires_grad), (
                f"NfftFastsum: Gradient computation w.r.t. {what} is not "
                "possible through torch_compat; use the JAX API for "
                "position/coefficient gradients"
            )
        args = tuple(
            _to_jax(t)
            for t in (x, coeffs, sources, targets, source_batch, target_batch)
        )
        y = _nfft.nfft_fastsum(*args, cutoff=cutoff)
        (ctx.coeffs_np, ctx.sources_np, ctx.targets_np,
         ctx.source_batch_np, ctx.target_batch_np) = args[1:]
        ctx.cutoff = cutoff
        return _to_torch(y)

    @staticmethod
    def backward(ctx, dy):
        dx = _nfft.nfft_fastsum(
            _to_jax(dy), ctx.coeffs_np, ctx.targets_np, ctx.sources_np,
            ctx.target_batch_np, ctx.source_batch_np, cutoff=ctx.cutoff,
        )
        return _to_torch(dx), None, None, None, None, None, None


def nfft_fastsum(x, coeffs, sources, targets=None, source_batch=None,
                 target_batch=None, /, batch=None, cutoff=3):
    """Reference-parity fast kernel summation on torch tensors (nfft.py:91);
    arg normalization mirrors nfft.py:171-177."""
    if targets is None:
        targets = sources
        target_batch = source_batch
    if batch is not None:
        source_batch = batch
        target_batch = batch
    return _NfftFastsumFunction.apply(
        x, coeffs, sources, targets, source_batch, target_batch, cutoff
    )


def gaussian_analytic_coeffs(sigma, dim=3, N=16):
    """Reference coeffs.py:10, torch output."""
    return _to_torch(_coeffs.gaussian_analytic_coeffs(sigma, dim=dim, N=N))


def gaussian_interpolated_coeffs(sigma, dim=3, N=16, p=-1, eps=0.0):
    """Reference coeffs.py:14, torch output."""
    return _to_torch(
        _coeffs.gaussian_interpolated_coeffs(sigma, dim=dim, N=N, p=p, eps=eps)
    )


def interpolation_grid(dim=3, N=16):
    """Reference coeffs.py:18, torch output."""
    return _to_torch(_coeffs.interpolation_grid(dim=dim, N=N))


def radial_interpolation_grid(dim=3, N=16):
    """Reference coeffs.py:22, torch output."""
    return _to_torch(_coeffs.radial_interpolation_grid(dim=dim, N=N))


def interpolated_kernel_coeffs(grid_values):
    """Reference coeffs.py:26, torch in/out."""
    return _to_torch(_coeffs.interpolated_kernel_coeffs(_to_jax(grid_values)))


def ndft_adjoint(x, pos, batch=None, N=16):
    """Dense oracle, reference ndft.py:4 (torch in/out, no autograd)."""
    return _to_torch(
        _ndft.ndft_adjoint(_to_jax(x), _to_jax(pos), _to_jax(batch), N=N)
    )


def ndft_forward(x, pos, batch=None):
    """Dense oracle, reference ndft.py:26 (torch in/out, no autograd)."""
    return _to_torch(
        _ndft.ndft_forward(_to_jax(x), _to_jax(pos), _to_jax(batch))
    )


def ndft_fastsum(x, coeffs, sources, targets=None, source_batch=None,
                 target_batch=None, batch=None, N=16):
    """Dense oracle, reference ndft.py:48 (torch in/out, no autograd)."""
    return _to_torch(
        _ndft.ndft_fastsum(
            _to_jax(x), _to_jax(coeffs), _to_jax(sources), _to_jax(targets),
            _to_jax(source_batch), _to_jax(target_batch), N=N,
        )
    )


def exact_trigonometric_matrix(coeffs, sources, targets=None,
                               source_batch=None, target_batch=None, /,
                               batch=None):
    """Dense oracle, reference ndft.py:66 (torch in/out)."""
    return _to_torch(
        _ndft.exact_trigonometric_matrix(
            _to_jax(coeffs), _to_jax(sources), _to_jax(targets),
            _to_jax(source_batch), _to_jax(target_batch), batch=_to_jax(batch),
        )
    )


def exact_gaussian_matrix(sigma, sources, targets=None, source_batch=None,
                          target_batch=None, batch=None):
    """Dense oracle, reference ndft.py:98 (torch in/out)."""
    return _to_torch(
        _ndft.exact_gaussian_matrix(
            sigma, _to_jax(sources), _to_jax(targets),
            _to_jax(source_batch), _to_jax(target_batch), batch=_to_jax(batch),
        )
    )


# ---------------------------------------------------------------------------
# Class layer: GramMatrix / AdjacencyMatrix / GaussianKernel on torch tensors.
#
# Thin veneers over the JAX operator classes (torch_nfft_tpu.models), which
# own the math: plan caching across matvecs, degree computation with the
# negative-degree warning, the reference's two fixed bugs (is_symmetric,
# apply_shift — SURVEY.md section 2.4). The torch side adds autograd: every
# operator is linear, so the backward of `A @ x` is `A.T @ dy`, applied
# through the same JAX pipelines (reference matrices.py:5-175, kernel.py:69-126).
# ---------------------------------------------------------------------------


class _OperatorMatvec(torch.autograd.Function):
    """Autograd through a matvec with a (linear) JAX operator."""

    @staticmethod
    def forward(ctx, x, jax_op, jax_op_T):
        ctx.jax_op_T = jax_op_T
        return _to_torch(jax_op.apply(_to_jax(x)))

    @staticmethod
    def backward(ctx, dy):
        return _to_torch(ctx.jax_op_T.apply(_to_jax(dy))), None, None


class _TorchMatrix:
    """Torch-facing mirror of the reference AbstractMatrix (matrices.py:5-37),
    delegating to a JAX operator held in ``_jax``."""

    def __init__(self, jax_op, device=None):
        self._jax = jax_op
        self._jax_T = None  # cached transposed operator (shares plan reuse)
        self.shape = tuple(jax_op.shape)
        self.device = torch.device("cpu") if device is None else device

    def _transposed_jax(self):
        if self._jax_T is None:
            self._jax_T = self._jax.T
        return self._jax_T

    def apply(self, x):
        return _OperatorMatvec.apply(x, self._jax, self._transposed_jax())

    def __matmul__(self, x):
        return self.apply(x)

    def is_symmetric(self):
        return self._jax.is_symmetric()

    def transpose(self):
        if self.is_symmetric():
            return self
        # a generic transposed view (matvec + sums); subclass-specific
        # attributes (sources/targets, ...) live on the original operator
        return _TorchMatrix(self._transposed_jax(), self.device)

    @property
    def T(self):
        return self.transpose()

    def row_sums(self):
        return self.apply(torch.ones(self.shape[1]))

    def column_sums(self):
        return self.T.row_sums()

    def to_dense(self):
        return self.apply(torch.eye(self.shape[1]))


class GramMatrix(_TorchMatrix):
    """Reference-parity lazy Gram matrix on torch tensors (matrices.py:40-70).

    ``(matrix @ x)[t] ~= sum_s K(sources[s] - targets[t]) x[s]`` via the
    NFFT fastsum; matvecs carry torch autograd (backward applies the
    transposed operator, i.e. sources/targets swapped — nfft.py:82-88)."""

    def __init__(self, coeffs, sources, targets=None, source_batch=None,
                 target_batch=None, /, batch=None, cutoff=3):
        from .models.matrices import GramMatrix as _JaxGram

        # torch-identity symmetry, like the C++ sources.is_same(targets)
        # (core_cuda.cu:552); the reference's Python check is the known
        # always-True bug (matrices.py:65).
        if targets is sources:
            targets = None
            target_batch = source_batch
        jax_op = _JaxGram(
            _to_jax(coeffs), _to_jax(sources), _to_jax(targets),
            _to_jax(source_batch), _to_jax(target_batch),
            batch=_to_jax(batch), cutoff=cutoff,
        )
        device = sources.device if isinstance(sources, torch.Tensor) else None
        super().__init__(jax_op, device)
        self.coeffs = coeffs
        self.sources = sources
        self.targets = sources if targets is None else targets
        self.source_batch = source_batch
        self.target_batch = target_batch if targets is not None else source_batch
        self.cutoff = cutoff


class AdjacencyMatrix(_TorchMatrix):
    """Reference-parity graph adjacency operator (matrices.py:74-175):
    diagonal (self-loop) offset, "sym"/"left"/"right"/"rw" degree
    normalization, Laplacian / signless shift, degree threshold warning."""

    def __init__(self, gram_matrix, diagonal_offset=0, normalization=None,
                 shift=None, degree_threshold=0):
        from .models.matrices import AdjacencyMatrix as _JaxAdj

        if not isinstance(gram_matrix, GramMatrix):
            raise TypeError(
                "AdjacencyMatrix expects a torch_compat.GramMatrix; build one "
                "via GramMatrix(...) or GaussianKernel(...).gram_matrix(...)"
            )
        jax_op = _JaxAdj(
            gram_matrix._jax, diagonal_offset=diagonal_offset,
            normalization=normalization, shift=shift,
            degree_threshold=degree_threshold,
        )
        super().__init__(jax_op, gram_matrix.device)
        self.gram_matrix = gram_matrix
        self.diagonal_offset = diagonal_offset
        self.normalization = jax_op.normalization
        self.shift = jax_op.shift


class _KernelFrontend:
    """Shared torch veneer over a JAX kernel front-end: wraps the JAX object
    in ``self._jax`` and produces torch GramMatrix / AdjacencyMatrix."""

    def _adopt(self, jax_kernel):
        self._jax = jax_kernel
        self.cutoff = jax_kernel.cutoff
        self.shift_by_center = jax_kernel.shift_by_center
        self.scale_by_norm = jax_kernel.scale_by_norm
        self.factor = jax_kernel.factor
        self.coeffs = _to_torch(jax_kernel.coeffs)
        for attr in ("sigma", "nu", "profile"):
            if hasattr(jax_kernel, attr):
                setattr(self, attr, getattr(jax_kernel, attr))

    def gram_matrix(self, sources, targets=None, source_batch=None,
                    target_batch=None, /, batch=None):
        """kernel.py:99-116 on torch tensors; returns a torch GramMatrix."""
        if targets is sources:
            targets = None
            target_batch = source_batch
        jax_op = self._jax.gram_matrix(
            _to_jax(sources), _to_jax(targets), _to_jax(source_batch),
            _to_jax(target_batch), batch=_to_jax(batch),
        )
        device = sources.device if isinstance(sources, torch.Tensor) else None
        out = GramMatrix.__new__(GramMatrix)
        _TorchMatrix.__init__(out, jax_op, device)
        out.coeffs = self.coeffs
        out.sources = sources
        out.targets = sources if targets is None else targets
        out.source_batch = batch if batch is not None else source_batch
        out.target_batch = batch if batch is not None else (
            target_batch if targets is not None else source_batch)
        out.cutoff = self.cutoff
        return out

    def __call__(self, *args, **kwargs):
        return self.gram_matrix(*args, **kwargs)

    def adjacency_matrix(self, sources, batch=None, loop_weight=1,
                         normalization=None, shift=None, degree_threshold=0):
        """kernel.py:123-126 on torch tensors."""
        return AdjacencyMatrix(
            self.gram_matrix(sources, batch=batch),
            diagonal_offset=loop_weight - 1, normalization=normalization,
            shift=shift, degree_threshold=degree_threshold,
        )


class GaussianKernel(_KernelFrontend):
    """Reference-parity Gaussian kernel front-end (kernel.py:69-126) on torch
    tensors: precomputes coefficients once, produces GramMatrix /
    AdjacencyMatrix per point set, with both scaling modes (a-priori radius
    vs per-call scale-by-norm) and center shifting."""

    def __init__(self, sigma, dim=3, bandwidth=16, cutoff=3,
                 shift_by_center=True, max_euclidean_norm=None,
                 max_infinity_norm=None, analytic=False, reg_degree=-1,
                 reg_width=0.0, window="gaussian"):
        from .models.kernel import GaussianKernel as _JaxKernel

        self._adopt(_JaxKernel(
            sigma, dim=dim, bandwidth=bandwidth, cutoff=cutoff,
            shift_by_center=shift_by_center,
            max_euclidean_norm=max_euclidean_norm,
            max_infinity_norm=max_infinity_norm, analytic=analytic,
            reg_degree=reg_degree, reg_width=reg_width, window=window,
        ))


class RadialKernel(_KernelFrontend):
    """Arbitrary radial profile on torch tensors (extension; see
    models/radial.py): same operator surface as GaussianKernel."""

    _jax_factory_name = "RadialKernel"

    def __init__(self, *args, **kwargs):
        from .models import radial as _radial

        self._adopt(getattr(_radial, self._jax_factory_name)(*args, **kwargs))


class LaplaceKernel(RadialKernel):
    """exp(-r / sigma) on torch tensors."""

    _jax_factory_name = "LaplaceKernel"


class MaternKernel(RadialKernel):
    """Matern kernel (nu in {0.5, 1.5, 2.5}) on torch tensors."""

    _jax_factory_name = "MaternKernel"


class InverseMultiquadricKernel(RadialKernel):
    """1 / sqrt(1 + (r/sigma)^2) on torch tensors."""

    _jax_factory_name = "InverseMultiquadricKernel"
