"""Point preprocessing: centers, radii, shift and scale — batched and not
(reference torch_nfft/utils.py, without the torch_scatter dependency)."""

import numpy as np
import pytest

import torch_nfft_tpu as tn

from helpers import make_points


def test_center_unbatched(rng):
    pts = rng.random((50, 3), dtype=np.float32) * 4 - 1
    c = np.asarray(tn.compute_points_center(pts))
    exp = 0.5 * (pts.min(0) + pts.max(0))
    np.testing.assert_allclose(c, exp, rtol=1e-6)


def test_center_with_targets(rng):
    src = rng.random((30, 2), dtype=np.float32)
    tgt = rng.random((20, 2), dtype=np.float32) + 2.0
    c = np.asarray(tn.compute_points_center(src, tgt))
    allpts = np.concatenate([src, tgt])
    exp = 0.5 * (allpts.min(0) + allpts.max(0))
    np.testing.assert_allclose(c, exp, rtol=1e-6)


def test_center_batched(rng):
    pts, batch = make_points(rng, 25, 2, batches=3)
    c = np.asarray(tn.compute_points_center(pts, None, batch, batch))
    assert c.shape == (3, 2)
    for b in range(3):
        p = pts[batch == b]
        np.testing.assert_allclose(c[b], 0.5 * (p.min(0) + p.max(0)), rtol=1e-5)


def test_shift_by_center_batched(rng):
    pts, batch = make_points(rng, 25, 2, batches=3)
    shifted, _ = tn.shift_points_by_center(pts, None, batch, batch)
    shifted = np.asarray(shifted)
    for b in range(3):
        p = shifted[batch == b]
        np.testing.assert_allclose(
            0.5 * (p.min(0) + p.max(0)), np.zeros(2), atol=1e-6
        )


@pytest.mark.parametrize("norm", ["euclidean", "infinity"])
def test_radius(rng, norm):
    pts = rng.random((40, 3), dtype=np.float32) * 2 - 1
    r = float(tn.compute_points_radius(pts, norm=norm))
    if norm == "euclidean":
        exp = np.sqrt((pts**2).sum(1)).max()
    else:
        exp = np.abs(pts).max()
    assert abs(r - exp) < 1e-6


def test_radius_batched(rng):
    pts, batch = make_points(rng, 20, 2, batches=4)
    r = np.asarray(tn.compute_points_radius(pts, None, batch, batch))
    assert r.shape == (4,)
    for b in range(4):
        exp = np.sqrt((pts[batch == b] ** 2).sum(1)).max()
        assert abs(r[b] - exp) < 1e-6


def test_scale_by_norm(rng):
    pts = rng.random((40, 2), dtype=np.float32) * 10
    scaled, _ = tn.scale_points_by_norm(pts, factor=0.25, norm="infinity")
    assert abs(np.abs(np.asarray(scaled)).max() - 0.25) < 1e-6


def test_scale_by_norm_batched_independent(rng):
    pts, batch = make_points(rng, 20, 2, batches=3)
    pts[batch == 1] *= 10  # one batch much larger
    scaled, _ = tn.scale_points_by_norm(pts, None, batch, batch, factor=0.25)
    scaled = np.asarray(scaled)
    for b in range(3):
        r = np.sqrt((scaled[batch == b] ** 2).sum(1)).max()
        assert abs(r - 0.25) < 1e-5


def test_scale_with_targets(rng):
    src = rng.random((30, 2), dtype=np.float32)
    tgt = rng.random((20, 2), dtype=np.float32) * 5
    s, t = tn.scale_points_by_norm(src, tgt, factor=1.0)
    joint_max = max(
        np.sqrt((np.asarray(s) ** 2).sum(1)).max(),
        np.sqrt((np.asarray(t) ** 2).sum(1)).max(),
    )
    assert abs(joint_max - 1.0) < 1e-5


def test_unknown_norm_raises(rng):
    pts = rng.random((10, 2), dtype=np.float32)
    with pytest.raises(ValueError):
        tn.compute_points_radius(pts, norm="manhattan")


def test_accuracy_check(rng):
    import torch_nfft_tpu as tn

    pos = (rng.random((500, 2)) - 0.5).astype(np.float32) / 2
    err = tn.accuracy_check(pos, bandwidth=16, cutoff=4, sample_points=128)
    assert err < 1e-3
    err3 = tn.accuracy_check(pos, bandwidth=16, cutoff=2, sample_points=128)
    assert err3 > err  # smaller cutoff, larger error
