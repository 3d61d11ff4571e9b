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
