"""A sharded end-to-end training step on the flagship model.

The flagship workload of this framework is the Gaussian-kernel Gram operator
(``GaussianKernel`` -> ``GramMatrix @ x``, reference kernel.py:99-116). The
canonical learning task on it is kernel regression: fit per-source weights
``w`` so that the fast Gram matvec reproduces targets ``y``. This module
builds that full training step (forward fastsum, MSE loss, grads, SGD update)
as one ``shard_map`` over a 2-axis mesh:

* ``data_axis`` — data parallelism over independent point sets (the grid is
  block-diagonal over point sets, so shards never interact: zero comms beyond
  the scalar loss psum);
* ``points_axis`` — sharding of the points *within* every set (the
  NFFT-specific axis): each chip spreads its point shard, one ``lax.psum``
  over ICI reduces the oversampled grid, gathers stay local.

Gradients flow through spread/FFT/gather *and* the psum (its transpose is a
psum of the cotangents), so the update is exactly the single-chip gradient.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..ops.nfft import DEFAULT_SIGMA
from .sharded import fastsum_local

__all__ = ["make_fastsum_train_step"]


def make_fastsum_train_step(
    mesh,
    coeffs,
    *,
    batch_size,
    n_per_set,
    cutoff=3,
    learning_rate=0.1,
    optimizer=None,
    data_axis="data",
    points_axis="points",
    sigma=DEFAULT_SIGMA,
    strategy="auto",
    window="gaussian",
):
    """Build ``step(w, pos, y[, opt_state]) -> (w_new, loss[, opt_state])``
    jitted over ``mesh``.

    Arrays are laid out (batch_size, n_per_set, ...): ``w`` and ``y`` with a
    trailing column dim C, ``pos`` with trailing dim d. ``batch_size`` must
    divide by the data-axis size and ``n_per_set`` by the points-axis size.

    ``optimizer``: an optax ``GradientTransformation``; when given, the step
    takes and returns an ``opt_state`` (initialize with ``optimizer.init(w)``)
    instead of applying plain SGD with ``learning_rate``.

    Returns (step_fn, in_shardings) where in_shardings = (w, pos, y)
    NamedShardings suitable for ``jax.device_put``.
    """
    coeffs = jnp.asarray(coeffs)
    N = coeffs.shape[0]
    m = int(cutoff)
    dd = mesh.shape[data_axis]
    pp = mesh.shape[points_axis]
    if batch_size % dd:
        raise ValueError(f"batch_size {batch_size} not divisible by {data_axis}={dd}")
    if n_per_set % pp:
        raise ValueError(f"n_per_set {n_per_set} not divisible by {points_axis}={pp}")
    B_local = batch_size // dd
    n_local = n_per_set // pp
    denom = float(batch_size * n_per_set)

    def local_step(w, pos, y, coeffs):
        # local shapes: w/y (B_local, n_local, C), pos (B_local, n_local, d)
        C = w.shape[-1]
        dim = pos.shape[-1]
        posf = pos.reshape(B_local * n_local, dim)
        bvec = jnp.repeat(
            jnp.arange(B_local, dtype=jnp.int32), n_local, total_repeat_length=B_local * n_local
        )

        def loss_fn(w):
            wf = w.reshape(B_local * n_local, C)
            pred = fastsum_local(
                wf,
                posf,
                bvec,
                posf,
                bvec,
                coeffs,
                batch_size=B_local,
                N=N,
                m=m,
                sigma=sigma,
                window=window,
                strategy=strategy,
                points_axis=points_axis,
            )
            local = jnp.sum((pred.reshape(w.shape) - y) ** 2)
            return jax.lax.psum(local, (data_axis, points_axis)) / denom

        loss, grad = jax.value_and_grad(loss_fn)(w)
        return grad, loss

    spec3 = P(data_axis, points_axis, None)
    grad_step = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(spec3, spec3, spec3, P(*([None] * coeffs.ndim))),
        out_specs=(spec3, P()),
    )

    if optimizer is None:

        @jax.jit
        def step_fn(w, pos, y):
            grad, loss = grad_step(w, pos, y, coeffs)
            return w - learning_rate * grad, loss

    else:
        import optax

        @jax.jit
        def step_fn(w, pos, y, opt_state):
            grad, loss = grad_step(w, pos, y, coeffs)
            updates, opt_state = optimizer.update(grad, opt_state, w)
            return optax.apply_updates(w, updates), loss, opt_state

    shardings = tuple(NamedSharding(mesh, spec3) for _ in range(3))
    return step_fn, shardings
