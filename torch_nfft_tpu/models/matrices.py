"""Matrix-free linear operators built on the NFFT fastsum.

Re-design of the reference's ``torch_nfft/matrices.py`` with the two known
bugs fixed (SURVEY.md section 2.4):

* ``GramMatrix.is_symmetric`` compared ``self.sources is self.sources``
  (always True, matrices.py:65); here it correctly compares sources to
  targets, matching the C++ check ``sources.is_same(targets)``
  (core_cuda.cu:552).
* ``AdjacencyMatrix.apply_shift`` referenced an undefined bare ``shift``
  (NameError for any shift != "none", matrices.py:149); fixed to
  ``self.shift``.

All operators are registered as JAX pytrees so they can be passed through
``jit``/``grad``/checkpointing directly.
"""

from __future__ import annotations

import warnings

import jax
import jax.numpy as jnp

from ..ops.nfft import nfft_fastsum

__all__ = ["AbstractMatrix", "GramMatrix", "AdjacencyMatrix"]


def _has_tracers(tree) -> bool:
    return any(
        isinstance(leaf, jax.core.Tracer) for leaf in jax.tree.leaves(tree)
    )


class AbstractMatrix:
    """Minimal matrix-free operator interface. Reference: matrices.py:5-37."""

    def __init__(self, shape):
        self.shape = shape

    def apply(self, x):
        raise NotImplementedError()

    def __matmul__(self, x):
        return self.apply(x)

    def is_symmetric(self):
        return False

    def transpose(self):
        if self.is_symmetric():
            return self
        raise NotImplementedError()

    @property
    def T(self):
        return self.transpose()

    def row_sums(self):
        return self.apply(jnp.ones(self.shape[1], dtype=jnp.float32))

    def column_sums(self):
        return self.T.row_sums()

    def to_dense(self):
        return self.apply(jnp.eye(self.shape[1], dtype=jnp.float32))


@jax.tree_util.register_pytree_node_class
class GramMatrix(AbstractMatrix):
    """Kernel Gram matrix applied via nfft_fastsum.

    ``(matrix @ x)[t] ~= sum_s K(sources[s] - targets[t]) * x[s]``.
    Reference: matrices.py:40-70.
    """

    def __init__(
        self,
        coeffs,
        sources,
        targets=None,
        source_batch=None,
        target_batch=None,
        /,
        batch=None,
        cutoff=3,
        *,
        batch_size=None,
        window="gaussian",
        _symmetric=None,
    ):
        self._symmetric = (
            (targets is None or targets is sources) if _symmetric is None else _symmetric
        )
        if targets is None:
            targets = sources
            target_batch = source_batch
        if batch is not None:
            source_batch = batch
            target_batch = batch

        sources = jnp.asarray(sources)
        targets = jnp.asarray(targets)
        super().__init__((targets.shape[0], sources.shape[0]))

        self.coeffs = jnp.asarray(coeffs)
        self.sources = sources
        self.targets = targets
        self.source_batch = source_batch
        self.target_batch = target_batch
        self.cutoff = int(cutoff)
        self.batch_size = batch_size
        self.window = str(window)
        self._plan_cache = None

    # Matvecs reuse the same point sets, so the binned spread/gather plan
    # (ops/binned.py) is built once and amortized — the FFTW-plan pattern.
    # Small point sets skip planning (scatter/matmul are already fast there).
    _PLAN_THRESHOLD = 2048

    def _plans(self, require=False):
        cached = self._plan_cache
        if cached is None or (require and cached[0] is None):
            src, tgt = self.sources, self.targets
            traced = isinstance(src, jax.core.Tracer) or isinstance(
                tgt, jax.core.Tracer
            )
            small = max(src.shape[0], tgt.shape[0]) < self._PLAN_THRESHOLD
            if traced or (small and not require):
                if traced and require:
                    raise ValueError(
                        "the slot-layout operator API builds binned plans "
                        "from the point sets, which requires concrete "
                        "(non-traced) points — construct the operator "
                        "outside jit"
                    )
                self._plan_cache = (None, None)
            else:
                from ..ops.binned import build_plan

                N = self.coeffs.shape[0]
                kw = dict(N=N, m=self.cutoff, batch_size=self.batch_size,
                          window=self.window)
                sp = build_plan(src, self.source_batch, **kw)
                tp = (
                    sp
                    if (self._symmetric and self.source_batch is self.target_batch)
                    else build_plan(tgt, self.target_batch, **kw)
                )
                if _has_tracers((sp, tp)):
                    # built inside a jit/scan trace: the plan works for THIS
                    # trace, but caching it would leak tracers into later
                    # calls — rebuild next time instead.
                    return (sp, tp)
                self._plan_cache = (sp, tp)
        return self._plan_cache

    def apply(self, x):
        source_plan, target_plan = self._plans()
        return nfft_fastsum(
            x,
            self.coeffs,
            self.sources,
            self.targets,
            self.source_batch,
            self.target_batch,
            cutoff=self.cutoff,
            batch_size=self.batch_size,
            source_plan=source_plan,
            target_plan=target_plan,
            window=self.window,
        )

    # -- slot-layout (plan-native) API ---------------------------------------
    # Iterated solvers (CG, power/Lanczos iteration) apply the operator to a
    # vector many times on the SAME point sets. In user order every matvec
    # pays two issue-bound point-order permutations (ops/binned.py slot
    # docs); these methods let a solver convert once and iterate
    # permutation-free in the plan's native slot layout.

    def to_slot(self, x):
        """(n_src, C) or (n_src,) user-order values -> source-plan slot
        vector (C, S*K). See ``torch_nfft_tpu.to_slot_order``."""
        from ..ops.binned import to_slot_order

        sp, _ = self._plans(require=True)
        x = jnp.asarray(x)
        return to_slot_order(sp, x[:, None] if x.ndim == 1 else x)

    def from_slot(self, v):
        """Target-plan slot vector (C, S_tgt*K) -> (n_tgt, C) user order."""
        from ..ops.binned import from_slot_order

        _, tp = self._plans(require=True)
        return from_slot_order(tp, v)

    def apply_slot(self, v):
        """Gram matvec in slot layout: a (C, S_src*K) slot vector of the
        source plan -> (C, S_tgt*K) slot vector of the target plan, with no
        point-order permutation anywhere (``nfft_fastsum_real(slot_io=True)``
        on the plans this operator already caches)."""
        from ..ops.nfft import _normalize_batch
        from ..ops.planar import nfft_fastsum_real

        sp, tp = self._plans(require=True)
        N = self.coeffs.shape[0]
        sb, bs_s = _normalize_batch(
            self.source_batch, self.sources.shape[0], self.batch_size
        )
        tb, _ = _normalize_batch(
            self.target_batch, self.targets.shape[0], self.batch_size
        )
        # nfft_fastsum_real's contract is real even coefficients; the
        # interpolated-coeffs generators return a complex array whose
        # imaginary part is zero for radial kernels on complex-capable
        # backends — take the real plane (same as the user-order path's
        # trailing .real).
        coeffs = (
            self.coeffs.real
            if jnp.issubdtype(self.coeffs.dtype, jnp.complexfloating)
            else self.coeffs
        )
        return nfft_fastsum_real(
            v,
            coeffs,
            self.sources,
            self.targets,
            sb,
            tb,
            sp,
            tp,
            batch_size=bs_s,
            N=N,
            m=self.cutoff,
            slot_io=True,
            window=self.window,
        )

    def solve(self, b, *, reg=0.0, tol=1e-5, maxiter=100):
        """Solve ``(G + reg*I) z = b`` by conjugate gradients (kernel ridge
        regression / interpolation). Requires a symmetric Gram matrix; use
        ``reg > 0`` for a well-conditioned positive-definite system.

        When plans are available (concrete points), the CG iteration runs
        entirely in the slot layout — the point-order permutations are paid
        once at entry and exit instead of once per matvec (1.57x per matvec
        at n=4.2M, 3D N=256; examples/bench_fastsum_slot.py)."""
        if not self.is_symmetric():
            raise ValueError("GramMatrix.solve requires a symmetric operator")
        b = jnp.asarray(b)
        squeeze = b.ndim == 1
        b2 = b[:, None] if squeeze else b

        sp = None
        if not isinstance(self.sources, jax.core.Tracer):
            sp, _ = self._plans(require=True)
        z = None
        if sp is not None:
            from ..ops.binned import from_slot_order, to_slot_order

            try:
                vb = to_slot_order(sp, b2)
                z, _ = jax.scipy.sparse.linalg.cg(
                    lambda u: self.apply_slot(u) + reg * u, vb,
                    tol=tol, maxiter=maxiter,
                )
                z = from_slot_order(sp, z)
            except ValueError:
                # plan not fold-capable for this geometry (slot_io's loud
                # trace-time check) — iterate in user order instead.
                z = None
        if z is None:
            z, _ = jax.scipy.sparse.linalg.cg(
                lambda u: self.apply(u) + reg * u, b2,
                tol=tol, maxiter=maxiter,
            )
        return z[:, 0] if squeeze else z

    def is_symmetric(self):
        # Fixed vs the reference (matrices.py:65 compares sources to itself).
        return self._symmetric and self.source_batch is self.target_batch

    def transpose(self):
        if self.is_symmetric():
            return self
        return GramMatrix(
            self.coeffs,
            self.targets,
            self.sources,
            self.target_batch,
            self.source_batch,
            cutoff=self.cutoff,
            batch_size=self.batch_size,
            window=self.window,
        )

    # -- pytree protocol ----------------------------------------------------
    def tree_flatten(self):
        children = (
            self.coeffs,
            self.sources,
            self.targets,
            self.source_batch,
            self.target_batch,
        )
        aux = (self.cutoff, self.batch_size, self._symmetric, self.window)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        coeffs, sources, targets, source_batch, target_batch = children
        cutoff, batch_size, symmetric, window = aux
        return cls(
            coeffs,
            sources,
            targets,
            source_batch,
            target_batch,
            cutoff=cutoff,
            batch_size=batch_size,
            window=window,
            _symmetric=symmetric,
        )


@jax.tree_util.register_pytree_node_class
class AdjacencyMatrix(AbstractMatrix):
    """Graph adjacency operator on top of a symmetric GramMatrix.

    Supports a diagonal (self-loop) offset, degree normalization
    ("sym" | "left" | "right" | "rw"), Laplacian / signless shifts and a
    degree threshold with warning. Reference: matrices.py:74-175.

    Registered as a pytree like the other operators, so the one stateful
    operator (precomputed degrees) checkpoints/serializes too; unflattening
    restores the saved degree arrays instead of recomputing row sums.
    """

    def __init__(
        self,
        gram_matrix,
        diagonal_offset=0,
        normalization=None,
        shift=None,
        degree_threshold=0,
    ):
        if not gram_matrix.is_symmetric():
            raise ValueError(
                "The underlying Gram matrix of an AdjacencyMatrix must be symmetric"
            )

        super().__init__(gram_matrix.shape)

        self.gram_matrix = gram_matrix
        self.diagonal_offset = diagonal_offset

        normalization = "none" if normalization is None else normalization.lower()
        self.normalization = normalization

        shift = "none" if shift is None else shift.lower()
        if shift not in ("none", "laplacian", "signless"):
            raise ValueError(f"Unknown AdjacencyMatrix shift type: {shift}")
        self.shift = shift

        if shift != "none" or normalization != "none":
            degrees = gram_matrix.row_sums()
            if diagonal_offset != 0:
                degrees = degrees + diagonal_offset

            if normalization != "none":
                negative_nodes = degrees < degree_threshold
                num_negative = int(jnp.sum(negative_nodes))
                if num_negative:
                    warnings.warn(
                        "AdjacencyMatrix with normalization: {} out of {} node "
                        "degrees are smaller than the threshold {:.4g}".format(
                            num_negative, degrees.size, degree_threshold
                        ),
                        RuntimeWarning,
                        stacklevel=2,
                    )
                    degrees = jnp.where(negative_nodes, jnp.inf, degrees)

                if normalization == "rw":  # synonym for "left"
                    normalization = "left"
                    self.normalization = "left"

                if normalization == "sym":
                    self.d_inv_sqrt = jax.lax.rsqrt(degrees)
                elif normalization in ("left", "right"):
                    self.d_inv = 1.0 / degrees
                else:
                    raise ValueError(
                        f"Unknown AdjacencyMatrix normalization type: {normalization}"
                    )
            else:
                self.degrees = degrees

    def _bcast(self, v, x):
        return v[(...,) + (None,) * (x.ndim - 1)]

    def apply_left_normalization(self, x):
        if self.normalization == "sym":
            return self._bcast(self.d_inv_sqrt, x) * x
        if self.normalization == "left":
            return self._bcast(self.d_inv, x) * x
        return x

    def apply_right_normalization(self, x):
        if self.normalization == "sym":
            return self._bcast(self.d_inv_sqrt, x) * x
        if self.normalization == "right":
            return self._bcast(self.d_inv, x) * x
        return x

    def apply_shift(self, x, y):
        if self.shift == "none":
            return y
        if self.normalization == "none":
            x = self._bcast(self.degrees, x) * x
        # Fixed vs the reference (matrices.py:149 references bare `shift`).
        if self.shift == "signless":
            return x + y
        return x - y

    def apply(self, x):
        Dx = self.apply_right_normalization(x)
        y = self.gram_matrix @ Dx
        if self.diagonal_offset != 0:
            y = y + self.diagonal_offset * Dx
        y = self.apply_left_normalization(y)
        return self.apply_shift(x, y)

    # -- slot-layout API ------------------------------------------------------
    # Every non-Gram step of apply() is diagonal (degree scalings, the
    # diagonal offset, the shift combination), and diagonal scaling commutes
    # with slotting (a zero-padded permutation): slot the degree vectors once
    # and the whole adjacency/Laplacian matvec runs permutation-free — e.g.
    # for Lanczos eigensolves of graph Laplacians.

    def _slot_diag(self, name):
        cache = getattr(self, "_slot_cache", None)
        if cache is None:
            cache = self._slot_cache = {}
        if name not in cache:
            from ..ops.binned import to_slot_order

            sp, _ = self.gram_matrix._plans(require=True)
            val = to_slot_order(sp, getattr(self, name)[:, None])
            if _has_tracers(val):
                # computed inside a jit/scan trace — do not cache tracers
                return val
            cache[name] = val
        return cache[name]  # (1, S*K), broadcasts over columns

    def apply_slot(self, v):
        """apply() on a slot vector (C, S*K) of the Gram matrix's plan (the
        operator is symmetric, so source and target layouts coincide)."""
        norm = self.normalization
        if norm == "sym":
            Dx = self._slot_diag("d_inv_sqrt") * v
        elif norm == "right":
            Dx = self._slot_diag("d_inv") * v
        else:
            Dx = v
        y = self.gram_matrix.apply_slot(Dx)
        if self.diagonal_offset != 0:
            y = y + self.diagonal_offset * Dx
        if norm == "sym":
            y = self._slot_diag("d_inv_sqrt") * y
        elif norm == "left":
            y = self._slot_diag("d_inv") * y
        if self.shift == "none":
            return y
        x = self._slot_diag("degrees") * v if norm == "none" else v
        return x + y if self.shift == "signless" else x - y

    def is_symmetric(self):
        return self.normalization not in ("left", "right")

    def transpose(self):
        if self.normalization in ("left", "right"):
            transposed = AdjacencyMatrix(
                self.gram_matrix, self.diagonal_offset, normalization=None, shift=None
            )
            transposed.normalization = (
                "right" if self.normalization == "left" else "left"
            )
            transposed.shift = self.shift
            transposed.d_inv = self.d_inv
            return transposed
        return self

    # -- pytree protocol ----------------------------------------------------
    _DEGREE_FIELDS = ("d_inv_sqrt", "d_inv", "degrees")

    def tree_flatten(self):
        arrays = {
            name: getattr(self, name)
            for name in self._DEGREE_FIELDS
            if hasattr(self, name)
        }
        children = (self.gram_matrix, arrays)
        aux = (self.shape, self.diagonal_offset, self.normalization, self.shift)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        gram_matrix, arrays = children
        obj = object.__new__(cls)
        obj.shape, obj.diagonal_offset, obj.normalization, obj.shift = aux
        obj.gram_matrix = gram_matrix
        for name, value in arrays.items():
            setattr(obj, name, value)
        return obj
