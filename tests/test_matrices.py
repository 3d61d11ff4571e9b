"""GramMatrix / AdjacencyMatrix operator semantics, including the two
reference bugs that are fixed here (SURVEY.md section 2.4)."""

import numpy as np
import pytest

import torch_nfft_tpu as tn

from helpers import make_points


def _gram(rng, n=50, dim=2, targets=False):
    pos, _ = make_points(rng, n, dim)
    coeffs = tn.gaussian_analytic_coeffs(0.3, dim=dim, N=16)
    if targets:
        tgt, _ = make_points(rng, n // 2, dim)
        return tn.GramMatrix(coeffs, pos, tgt, cutoff=4), pos, tgt
    return tn.GramMatrix(coeffs, pos, cutoff=4), pos, pos


def test_gram_symmetric_detection(rng):
    sym, _, _ = _gram(rng)
    assert sym.is_symmetric()
    asym, _, _ = _gram(rng, targets=True)
    # Fixed vs the reference: matrices.py:65 always returned True.
    assert not asym.is_symmetric()


def test_gram_transpose_roundtrip(rng):
    mat, pos, tgt = _gram(rng, targets=True)
    matT = mat.T
    assert matT.shape == (mat.shape[1], mat.shape[0])
    x = rng.random(mat.shape[1], dtype=np.float32)
    y = np.asarray(mat @ x)
    # <y0, M x> == <M^T y0, x> for real kernels
    y0 = rng.random(mat.shape[0], dtype=np.float32)
    lhs = float(y0 @ y)
    rhs = float(np.asarray(matT @ y0) @ x)
    assert abs(lhs - rhs) / abs(lhs) < 1e-4


def test_gram_to_dense_matches_trigonometric(rng):
    mat, pos, _ = _gram(rng)
    A = np.asarray(mat.to_dense())
    A_ref = np.asarray(tn.exact_trigonometric_matrix(mat.coeffs, pos).real)
    assert np.abs(A - A_ref).max() < 1e-3


def test_gram_row_and_column_sums(rng):
    mat, _, _ = _gram(rng)
    A = np.asarray(mat.to_dense())
    np.testing.assert_allclose(np.asarray(mat.row_sums()), A.sum(1), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(mat.column_sums()), A.sum(0), rtol=1e-3, atol=1e-4
    )


def test_adjacency_requires_symmetric(rng):
    asym, _, _ = _gram(rng, targets=True)
    with pytest.raises(ValueError):
        tn.AdjacencyMatrix(asym)


@pytest.mark.parametrize("normalization", [None, "sym", "left", "right", "rw"])
def test_adjacency_normalizations(rng, normalization):
    gram, pos, _ = _gram(rng)
    adj = tn.AdjacencyMatrix(gram, diagonal_offset=1, normalization=normalization)
    n = gram.shape[0]
    x = rng.random(n, dtype=np.float32)
    y = np.asarray(adj @ x)

    A = np.asarray(gram.to_dense()) + np.eye(n)
    deg = A.sum(1)
    if normalization is None:
        y_exp = A @ x
    elif normalization == "sym":
        d = 1 / np.sqrt(deg)
        y_exp = d * (A @ (d * x))
    elif normalization in ("left", "rw"):
        y_exp = (A @ x) / deg
    else:  # right
        y_exp = A @ (x / deg)
    assert np.abs(y - y_exp).max() / np.abs(y_exp).max() < 1e-3


@pytest.mark.parametrize("shift", ["laplacian", "signless"])
def test_adjacency_shifts(rng, shift):
    """apply_shift worked for no input in the reference (NameError,
    matrices.py:149); here both shifts are exercised."""
    gram, pos, _ = _gram(rng)
    adj = tn.AdjacencyMatrix(gram, normalization="sym", shift=shift)
    n = gram.shape[0]
    x = rng.random(n, dtype=np.float32)
    y = np.asarray(adj @ x)

    A = np.asarray(gram.to_dense())
    deg = A.sum(1)
    d = 1 / np.sqrt(deg)
    norm_y = d * (A @ (d * x))
    y_exp = x + norm_y if shift == "signless" else x - norm_y
    assert np.abs(y - y_exp).max() / np.abs(y_exp).max() < 1e-3


def test_adjacency_unnormalized_laplacian(rng):
    gram, _, _ = _gram(rng)
    adj = tn.AdjacencyMatrix(gram, shift="laplacian")
    n = gram.shape[0]
    x = rng.random(n, dtype=np.float32)
    y = np.asarray(adj @ x)
    A = np.asarray(gram.to_dense())
    deg = A.sum(1)
    y_exp = deg * x - A @ x
    assert np.abs(y - y_exp).max() / np.abs(y_exp).max() < 1e-3


def test_adjacency_degree_threshold_warning(rng):
    pos, _ = make_points(rng, 30, 2)
    coeffs = tn.gaussian_analytic_coeffs(0.3, dim=2, N=16)
    gram = tn.GramMatrix(coeffs, pos, cutoff=4)
    with pytest.warns(RuntimeWarning):
        tn.AdjacencyMatrix(gram, normalization="sym", degree_threshold=1e9)


def test_adjacency_transpose_left_right(rng):
    gram, _, _ = _gram(rng)
    adj = tn.AdjacencyMatrix(gram, normalization="left")
    assert not adj.is_symmetric()
    adjT = adj.T
    assert adjT.normalization == "right"
    n = gram.shape[0]
    x = rng.random(n, dtype=np.float32)
    y0 = rng.random(n, dtype=np.float32)
    lhs = float(y0 @ np.asarray(adj @ x))
    rhs = float(np.asarray(adjT @ y0) @ x)
    assert abs(lhs - rhs) / abs(lhs) < 1e-4


def test_gram_plan_cache_matches_unplanned(rng):
    """GramMatrix plan caching (binned path) gives identical matvecs."""
    import torch_nfft_tpu as tn
    from torch_nfft_tpu.models.matrices import GramMatrix

    n, dim, N, m = 96, 2, 8, 3
    pos = (rng.random((n, dim)) - 0.5).astype(np.float32) / 2
    coeffs = tn.gaussian_analytic_coeffs(0.25, dim=dim, N=N)
    x = rng.standard_normal((n, 2)).astype(np.float32)

    mat = GramMatrix(coeffs, pos, cutoff=m)
    ref = mat @ x
    assert mat._plan_cache == (None, None)  # below threshold: no plans

    mat2 = GramMatrix(coeffs, pos, cutoff=m)
    mat2._PLAN_THRESHOLD = 1  # force planning
    got = mat2 @ x
    assert mat2._plan_cache[0] is not None
    assert mat2._plan_cache[1] is mat2._plan_cache[0]  # symmetric: shared
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def _gram_planned(rng, n=3000, dim=2, C=2):
    """A Gram matrix large enough that plans are built (slot-layout API)."""
    pos, _ = make_points(rng, n, dim)
    coeffs = tn.gaussian_analytic_coeffs(0.3, dim=dim, N=16)
    gram = tn.GramMatrix(coeffs, pos, cutoff=4)
    x = rng.random((n, C), dtype=np.float32)
    return gram, x


def test_gram_apply_slot_matches_apply(rng):
    gram, x = _gram_planned(rng)
    y = np.asarray(gram @ x)
    v = gram.to_slot(x)
    back = np.asarray(gram.from_slot(gram.apply_slot(v)))
    assert np.abs(back - y).max() / np.abs(y).max() < 1e-5


def test_gram_solve_kernel_ridge(rng):
    """solve() returns z with (G + reg I) z ~= b (CG in slot layout)."""
    gram, _ = _gram_planned(rng, C=1)
    n = gram.shape[0]
    b = rng.random(n, dtype=np.float32)
    reg = 0.5
    z = gram.solve(b, reg=reg, tol=1e-6, maxiter=200)
    assert z.shape == (n,)
    resid = np.asarray(gram @ z) + reg * np.asarray(z) - b
    assert np.linalg.norm(resid) / np.linalg.norm(b) < 1e-4


@pytest.mark.parametrize(
    "normalization,shift",
    [(None, None), ("sym", None), ("left", None), ("right", None),
     (None, "laplacian"), ("sym", "signless")],
)
def test_adjacency_apply_slot_matches(rng, normalization, shift):
    gram, x = _gram_planned(rng)
    adj = tn.AdjacencyMatrix(
        gram, diagonal_offset=1, normalization=normalization, shift=shift
    )
    y = np.asarray(adj @ x)
    v = gram.to_slot(x)
    back = np.asarray(gram.from_slot(adj.apply_slot(v)))
    assert np.abs(back - y).max() / np.abs(y).max() < 1e-5
