"""Point-cloud preprocessing: centers, radii, shifting and scaling.

jnp re-implementation of the reference's ``torch_nfft/utils.py``. Batched
reductions use ``jax.ops.segment_min/max`` natively — no optional
``torch_scatter``-style dependency (the reference raises a RuntimeError
without it, utils.py:19-22).

All functions take ``num_segments`` (static batch size) optionally; when the
batch vector is concrete it is derived automatically, mirroring the
reference's ``batch[-1] + 1`` convention.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "compute_points_center",
    "shift_points_by_center",
    "compute_points_radius",
    "scale_points_by_norm",
]


def _num_segments(batch, num_segments):
    if num_segments is not None:
        return int(num_segments)
    if isinstance(batch, jax.core.Tracer):
        raise ValueError(
            "num_segments must be passed explicitly when `batch` is traced"
        )
    return int(jnp.asarray(batch)[-1]) + 1


def compute_points_center(
    sources,
    targets=None,
    source_batch=None,
    target_batch=None,
    /,
    batch=None,
    *,
    num_segments=None,
):
    """Bounding-box center of the point set(s). Reference: utils.py:6-30.

    Unbatched: shape (dim,). Batched: shape (batch_size, dim).
    """
    sources = jnp.asarray(sources)
    if batch is not None:
        source_batch = batch
        target_batch = batch

    if source_batch is None:
        min_c = sources.min(axis=0)
        max_c = sources.max(axis=0)
        if targets is not None:
            targets = jnp.asarray(targets)
            min_c = jnp.minimum(min_c, targets.min(axis=0))
            max_c = jnp.maximum(max_c, targets.max(axis=0))
    else:
        ns = _num_segments(source_batch, num_segments)
        min_c = jax.ops.segment_min(sources, source_batch, num_segments=ns)
        max_c = jax.ops.segment_max(sources, source_batch, num_segments=ns)
        if targets is not None:
            targets = jnp.asarray(targets)
            min_c = jnp.minimum(
                min_c, jax.ops.segment_min(targets, target_batch, num_segments=ns)
            )
            max_c = jnp.maximum(
                max_c, jax.ops.segment_max(targets, target_batch, num_segments=ns)
            )

    return 0.5 * (min_c + max_c)


def shift_points_by_center(
    sources,
    targets=None,
    source_batch=None,
    target_batch=None,
    /,
    batch=None,
    *,
    num_segments=None,
):
    """Translate point set(s) so their bounding-box center is the origin.

    Reference: utils.py:33-44. Returns (sources, targets) with targets None
    if not given.
    """
    sources = jnp.asarray(sources)
    if batch is not None:
        source_batch = batch
        target_batch = batch

    center = compute_points_center(
        sources, targets, source_batch, target_batch, num_segments=num_segments
    )

    sources = sources - (center if source_batch is None else center[source_batch])
    if targets is not None:
        targets = jnp.asarray(targets) - (
            center if target_batch is None else center[target_batch]
        )
    return sources, targets


def compute_points_radius(
    sources,
    targets=None,
    source_batch=None,
    target_batch=None,
    /,
    batch=None,
    norm="euclidean",
    *,
    num_segments=None,
):
    """Max point norm per point set. Reference: utils.py:47-83.

    Unbatched: scalar. Batched: shape (batch_size,).
    """
    sources = jnp.asarray(sources)
    if batch is not None:
        source_batch = batch
        target_batch = batch

    if norm == "euclidean":
        point_norm = lambda pts: jnp.sqrt(jnp.sum(pts**2, axis=1))
    elif norm == "infinity":
        point_norm = lambda pts: jnp.abs(pts).max(axis=1)
    else:
        raise ValueError(f"compute_points_radius received unknown norm: {norm}")

    if source_batch is None:
        radius = point_norm(sources).max()
        if targets is not None:
            radius = jnp.maximum(radius, point_norm(jnp.asarray(targets)).max())
    else:
        ns = _num_segments(source_batch, num_segments)
        radius = jax.ops.segment_max(
            point_norm(sources), source_batch, num_segments=ns
        )
        if targets is not None:
            radius = jnp.maximum(
                radius,
                jax.ops.segment_max(
                    point_norm(jnp.asarray(targets)), target_batch, num_segments=ns
                ),
            )
    return radius


def scale_points_by_norm(
    sources,
    targets=None,
    source_batch=None,
    target_batch=None,
    /,
    batch=None,
    factor=1,
    norm="euclidean",
    *,
    num_segments=None,
):
    """Scale point set(s) so the max norm becomes ``factor``.

    Reference: utils.py:86-99. Returns (sources, targets).
    """
    sources = jnp.asarray(sources)
    if batch is not None:
        source_batch = batch
        target_batch = batch

    radius = compute_points_radius(
        sources, targets, source_batch, target_batch,
        norm=norm, num_segments=num_segments,
    )
    scale = factor / radius

    sources = sources * (scale if source_batch is None else scale[source_batch, None])
    if targets is not None:
        targets = jnp.asarray(targets) * (
            scale if target_batch is None else scale[target_batch, None]
        )
    return sources, targets
