"""Debug-mode validation + checkify wrapper + AdjacencyMatrix pytree."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import torch_nfft_tpu as tn
from torch_nfft_tpu.utils.debug import validate_inputs, with_checkify


def _points(rng, n, dim):
    pos = (rng.random((n, dim)) - 0.5).astype(np.float32)
    pos /= 4 * np.abs(pos).max()
    return pos


def test_validate_inputs_catches_bad_inputs(rng):
    pos = _points(rng, 50, 2)
    validate_inputs(pos, np.zeros(50, np.int32), 1)  # clean passes

    bad = pos.copy()
    bad[3, 1] = np.nan
    with pytest.raises(ValueError, match="finite"):
        validate_inputs(bad)
    with pytest.raises(ValueError, match="1/2"):
        validate_inputs(pos * 3.0)
    with pytest.raises(ValueError, match="sorted"):
        validate_inputs(pos, np.array([1, 0] * 25, np.int32), 2)
    with pytest.raises(ValueError, match="lie in"):
        validate_inputs(pos, np.full(50, 5, np.int32), 2)


def test_debug_env_hooks_wrappers(rng, monkeypatch):
    monkeypatch.setenv("TORCH_NFFT_TPU_DEBUG", "1")
    pos = _points(rng, 50, 2)
    x = rng.standard_normal((50, 1)).astype(np.float32)
    with pytest.raises(ValueError, match="sorted"):
        tn.nfft_adjoint(x, pos, np.array([1, 0] * 25, np.int32), 16, 4, batch_size=2)
    # clean inputs still work with debug on
    tn.nfft_adjoint(x, pos, bandwidth=16, cutoff=4)


def test_with_checkify_passes_clean_transform(rng):
    pos = jnp.asarray(_points(rng, 60, 2))
    x = jnp.asarray(rng.standard_normal((60, 2)).astype(np.float32))

    fn = with_checkify(
        lambda x, p: tn.nfft_adjoint(x, p, bandwidth=16, cutoff=4, strategy="scatter")
    )
    out = fn(x, pos)
    ref = tn.nfft_adjoint(x, pos, bandwidth=16, cutoff=4, strategy="scatter")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)


def test_with_checkify_catches_nan(rng):
    pos = _points(rng, 60, 2)
    pos[0, 0] = np.nan
    x = jnp.asarray(rng.standard_normal((60, 1)).astype(np.float32))

    fn = with_checkify(
        lambda x, p: tn.nfft_adjoint(
            x, p, bandwidth=16, cutoff=4, strategy="scatter", real_output=True
        )
    )
    with pytest.raises(Exception, match="nan"):
        fn(x, jnp.asarray(pos))


def test_adjacency_matrix_is_pytree(rng):
    pos = _points(rng, 80, 2)
    x = rng.standard_normal((80,)).astype(np.float32)
    k = tn.GaussianKernel(0.5, dim=2, bandwidth=16, cutoff=4, max_euclidean_norm=1.0)
    adj = k.adjacency_matrix(pos, normalization="sym", shift="laplacian")

    leaves, treedef = jax.tree.flatten(adj)
    adj2 = jax.tree.unflatten(treedef, leaves)
    np.testing.assert_allclose(
        np.asarray(adj2 @ x), np.asarray(adj @ x), rtol=1e-6
    )

    # degrees restored, not recomputed: mutate the leaf and see it stick
    leaves2 = [l * 0 if getattr(l, "ndim", None) == 1 and l.shape == (80,) else l for l in leaves]
    adj3 = jax.tree.unflatten(treedef, leaves2)
    assert hasattr(adj3, "d_inv_sqrt")
    assert float(jnp.sum(jnp.abs(adj3.d_inv_sqrt))) == 0.0
