"""Multi-chip SPMD execution of the NFFT transforms.

The reference is single-process, single-GPU (SURVEY.md section 2.3); its only
"communication" is intra-GPU atomicAdd contention on the shared oversampled
grid. The TPU-native scaling design replaces that with explicit SPMD over a
``jax.sharding.Mesh``:

* the **point axis** shards the irregular points: every chip spreads its local
  points into a local replica of the oversampled grid and a single
  ``lax.psum`` over ICI reduces the replicas (adjoint / fastsum); the forward
  gather is purely local once the grid is replicated;
* the **column axis** shards the trailing coefficient columns: fully
  independent signals, zero communication;
* independent point-set groups (data parallelism) ride a leading axis, see
  :func:`make_fastsum_train_step`;
* the **grid axis** shards the oversampled grid itself (axis-0 tile slabs)
  end to end — spread, overlap-add, DFT and gather all operate on one slab
  per chip with a single halo ``ppermute`` — for N^dim beyond one chip's
  HBM, see :mod:`grid_sharded`.
"""

from .grid_sharded import (
    GridShardedLayout,
    build_grid_sharded_layout,
    nfft_adjoint_grid_sharded,
    nfft_fastsum_grid_sharded,
    nfft_forward_grid_sharded,
    spectral_adjoint_pruned_dft_sharded0,
    spectral_forward_pruned_dft_sharded0,
)
from .mesh import make_mesh, pad_points
from .sharded import (
    build_sharded_plans,
    nfft_adjoint_sharded,
    nfft_fastsum_sharded,
    nfft_forward_sharded,
    spectral_adjoint_pruned_dft_sharded,
    spectral_forward_pruned_dft_sharded,
)
from .training import make_fastsum_train_step

__all__ = [
    "make_mesh",
    "pad_points",
    "build_sharded_plans",
    "nfft_adjoint_sharded",
    "nfft_forward_sharded",
    "nfft_fastsum_sharded",
    "spectral_adjoint_pruned_dft_sharded",
    "spectral_forward_pruned_dft_sharded",
    "GridShardedLayout",
    "build_grid_sharded_layout",
    "nfft_adjoint_grid_sharded",
    "nfft_fastsum_grid_sharded",
    "nfft_forward_grid_sharded",
    "spectral_adjoint_pruned_dft_sharded0",
    "spectral_forward_pruned_dft_sharded0",
    "make_fastsum_train_step",
]
