"""Mesh construction helpers."""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh

__all__ = ["make_mesh"]


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
