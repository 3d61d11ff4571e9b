"""Mesh construction and point-padding helpers."""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

__all__ = ["make_mesh", "pad_points"]


def make_mesh(axes: dict[str, int] | None = None, devices=None) -> Mesh:
    """Build a named device mesh.

    ``axes`` maps axis name -> size; the product must equal the device count.
    A value of ``-1`` (at most one) absorbs the remaining devices. With no
    arguments, all devices land on a single ``"points"`` axis — the natural
    axis for NFFT work (SURVEY.md section 5, long-context row).
    """
    devices = jax.devices() if devices is None else list(devices)
    n = len(devices)
    if axes is None:
        axes = {"points": n}
    names = list(axes.keys())
    sizes = list(axes.values())
    if sizes.count(-1) > 1:
        raise ValueError("at most one mesh axis may be -1")
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1]))
        if n % known:
            raise ValueError(f"{n} devices not divisible by fixed axes {known}")
        sizes[sizes.index(-1)] = n // known
    if int(np.prod(sizes)) != n:
        raise ValueError(f"mesh axes {dict(zip(names, sizes))} != {n} devices")
    arr = np.asarray(devices).reshape(sizes)
    return Mesh(arr, tuple(names))


def pad_points(pos, x=None, batch=None, *, multiple: int):
    """Pad a point set so n divides the point-axis mesh size.

    The sharded transforms require equal local shards. Padding appends
    zero-weight points at the origin of the LAST batch: spreading a zero
    contributes nothing (adjoint/fastsum are exact), and padded rows of a
    forward/gather output should be sliced away with the returned count.

    Returns (pos, x, batch, n_valid); x/batch stay None if not given.
    """
    pos = jnp.asarray(pos)
    n = pos.shape[0]
    n_pad = (-n) % int(multiple)
    if n_pad == 0:
        return pos, x, batch, n
    pos = jnp.pad(pos, ((0, n_pad), (0, 0)))
    if x is not None:
        x = jnp.asarray(x)
        x = jnp.pad(x, ((0, n_pad),) + ((0, 0),) * (x.ndim - 1))
    if batch is not None:
        batch = jnp.asarray(batch)
        batch = jnp.concatenate([batch, jnp.full((n_pad,), batch[-1], batch.dtype)])
    return pos, x, batch, n
