"""Iterative solvers driven by matrix-free operators.

CG lives on ``GramMatrix.solve`` (jax.scipy.sparse.linalg.cg under the
hood); this module adds a Lanczos eigensolver for the symmetric operators
(``GramMatrix``, ``AdjacencyMatrix`` with "sym"/"none" normalization —
e.g. graph Laplacian spectra for spectral embeddings / Chebyshev filter
design). Matvecs run in the plan-native slot layout when the operator
provides ``apply_slot`` (ops/binned.py slot docs: the per-matvec
point-order permutations — the dominant non-math cost — are paid once per
solve instead of once per iteration).

The reference library has no solver layer; this is TPU-side value-add on
top of the reference's operator surface (``torch_nfft/matrices.py:5-37``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["lanczos", "eigsh_operator"]


def lanczos(matvec, v0, num_iters: int, *, reorthogonalize: bool = True,
            breakdown_tol: float = 1e-5):
    """Lanczos tridiagonalization of a symmetric matvec.

    matvec: v -> A v on vectors shaped like ``v0`` (any array; treated as a
    flat vector via vdot/norm). Returns ``(alphas, betas, V)`` — the
    tridiagonal diagonal (k,), off-diagonal (k-1,), and the Krylov basis
    stacked on axis 0 (k, *v0.shape).

    Full reorthogonalization (default) keeps the basis numerically
    orthogonal in f32 — at k <= ~100 the O(k^2 n) cost is dominated by the
    k matvecs for NFFT-sized operators.
    """
    v0 = jnp.asarray(v0)
    k = int(num_iters)
    sum_axes = tuple(range(v0.ndim))

    def gs(V, w, mask):
        # classical Gram-Schmidt, applied twice (CGS2): a single pass over a
        # basis that has stopped being orthogonal (post-breakdown) is not a
        # projection and can AMPLIFY w by ~||V V^T|| per step.
        for _ in range(2):
            coef = jnp.tensordot(
                V, w, axes=(tuple(range(1, V.ndim)), sum_axes)
            )
            w = w - jnp.tensordot(coef * mask, V, axes=(0, 0))
        return w

    def body(carry, _):
        V, v, beta_prev, scale, i = carry
        w = matvec(v)
        alpha = jnp.vdot(v, w).real.astype(v.dtype)
        w = w - alpha * v - beta_prev * _row(V, i - 1, v)
        if reorthogonalize:
            mask = (jnp.arange(V.shape[0]) <= i).astype(v.dtype)
            w = gs(V, w, mask)
        beta = jnp.sqrt(jnp.vdot(w, w).real).astype(v.dtype)
        # breakdown: once the Krylov space is exhausted, beta collapses to
        # f32 rounding noise relative to the operator scale — stop generating
        # directions (the recurrence then stays identically zero and the
        # tridiagonal's dead block decouples as exact zeros). The scale
        # tracks only the Rayleigh quotients (and the first beta), NOT later
        # betas: a runaway beta must not raise its own cutoff — recycled
        # noise makes the basis near-parallel, and Gram-Schmidt against a
        # near-parallel basis AMPLIFIES by ~||V V^T|| per step (observed
        # x15/step on a rank-deficient Gram operator).
        scale = jnp.maximum(scale, jnp.abs(alpha))
        scale = jnp.maximum(scale, jnp.where(i == 0, beta, 0.0))
        alive = beta > breakdown_tol * scale
        beta = jnp.where(alive, beta, 0.0)
        v_next = jnp.where(alive, 1.0, 0.0) * w / jnp.where(alive, beta, 1.0)
        V = jax.lax.dynamic_update_index_in_dim(V, v, i, 0)
        return (V, v_next, beta, scale, i + 1), (alpha, beta)

    nrm = jnp.sqrt(jnp.vdot(v0, v0).real).astype(v0.dtype)
    v = v0 / nrm
    V = jnp.zeros((k,) + v0.shape, v0.dtype)
    zero = jnp.zeros((), v0.dtype)
    (V, _, _, _, _), (alphas, betas) = jax.lax.scan(
        body, (V, v, zero, zero, 0), None, length=k
    )
    return alphas, betas[:-1], V


def _row(V, i, like):
    i = jnp.maximum(i, 0)
    return jax.lax.dynamic_index_in_dim(V, i, 0, keepdims=False)


def eigsh_operator(op, num_eigs: int, *, num_iters: int | None = None,
                   seed: int = 0, use_slot: bool = True):
    """Top eigenpairs of a symmetric matrix-free operator (GramMatrix /
    AdjacencyMatrix) via Lanczos + a dense solve of the tridiagonal system.

    Returns ``(eigenvalues, eigenvectors)`` with eigenvalues ascending,
    shapes (num_eigs,), (n, num_eigs). With ``use_slot`` (default) and an
    operator exposing ``apply_slot``, every matvec runs permutation-free in
    slot layout; falls back to ``op @ v`` otherwise.
    """
    if not op.is_symmetric():
        raise ValueError("eigsh_operator requires a symmetric operator")
    n = op.shape[1]
    k = int(num_iters) if num_iters is not None else max(2 * num_eigs + 10, 20)
    key = jax.random.PRNGKey(seed)

    gram = getattr(op, "gram_matrix", op)
    # Build plans eagerly in BOTH modes: a lazy plan build inside the scan
    # trace would capture tracer leaves in the operator's plan cache.
    plans_ok = False
    if hasattr(gram, "_plans"):
        try:
            plans_ok = gram._plans(require=True)[0] is not None
        except ValueError:
            plans_ok = False
    slot = use_slot and plans_ok and hasattr(op, "apply_slot")

    if slot:
        v0 = gram.to_slot(jax.random.normal(key, (n,), jnp.float32))
        mv = op.apply_slot
    else:
        v0 = jax.random.normal(key, (n, 1), jnp.float32)
        mv = lambda v: op @ v

    # one eager matvec before the scan: populates every operator-side cache
    # (plans, slotted degree vectors) with CONCRETE arrays — a cache filled
    # inside the scan trace would have to be rebuilt every iteration.
    mv(v0)

    alphas, betas, V = lanczos(mv, v0, k)
    tri = (
        jnp.diag(alphas)
        + jnp.diag(betas, 1)
        + jnp.diag(betas, -1)
    )
    evals, evecs = jnp.linalg.eigh(tri)  # ascending
    sel = slice(k - num_eigs, k)
    w = evals[sel]
    # Ritz vectors: columns of V^T @ evecs
    y = jnp.tensordot(evecs[:, sel], V, axes=(0, 0))  # (num_eigs, *vshape)
    if slot:
        y = jnp.stack(
            [gram.from_slot(yi)[:, 0] for yi in y], axis=1
        )  # (n, num_eigs)
    else:
        y = jnp.moveaxis(y[..., 0], 0, -1)
    return w, y
