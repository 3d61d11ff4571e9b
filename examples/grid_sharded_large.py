"""Grid-sharded 3D adjoint at bandwidths beyond one chip's HBM.

At N=512 (oversampled grid M=1024) the planar oversampled grid alone is
2 x 1024^3 x 4 B = 8.6 GiB and the dense halo-tile array ~2.1x more — no
single 16 GiB chip can hold the working set (the reference's single
allocation, core_cuda.cu:216, is equally impossible). Sharded over 8 chips,
each slab is ~1/8th: grid slab 1.07 GiB + tile slab ~2.3 GiB per chip, which
fits comfortably.

This script runs the REAL sharded program (same geometry, collectives and
shardings as on an 8-chip TPU mesh) on an 8-virtual-CPU-device mesh and
verifies sampled frequencies of the output against an exact float64 oracle.

Usage:  python examples/grid_sharded_large.py [N] [n_points_log2]
        (defaults N=512, n=2^20; CPU wall time is minutes at N=512 on one
        core — the DFT matmuls dominate)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DEV = 8
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + f" --xla_force_host_platform_device_count={N_DEV}"
)
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

from torch_nfft_tpu.parallel import (
    build_grid_sharded_layout,
    make_mesh,
    nfft_adjoint_grid_sharded,
)


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    logn = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    n, dim, m = 1 << logn, 3, 4
    M = 2 * N
    mesh = make_mesh({"grid": -1})
    P = mesh.shape["grid"]

    grid_gib = 2 * M**3 * 4 / (1 << 30)
    print(
        f"N={N} M={M}: full planar grid {grid_gib:.2f} GiB "
        f"(+ ~2.1x dense tiles) — per-shard 1/{P}th of that", flush=True,
    )

    rng = np.random.default_rng(5)
    pos = (rng.random((n, dim)).astype(np.float32) - 0.5) / 2.0
    x = rng.standard_normal((n, 1)).astype(np.float32)

    t0 = time.perf_counter()
    lay = build_grid_sharded_layout(pos, n_shards=P, N=N, m=m)
    print(f"layout+plans: {time.perf_counter()-t0:.1f}s "
          f"(T={lay.T}, A0_loc={lay.A0_loc})", flush=True)

    t0 = time.perf_counter()
    yr, yi = nfft_adjoint_grid_sharded(x, lay, mesh)
    jax.block_until_ready((yr, yi))
    print(f"grid-sharded adjoint: {time.perf_counter()-t0:.1f}s "
          f"out={yr.shape}", flush=True)

    # sampled-frequency check vs exact float64 oracle
    k = rng.integers(-(N // 2), N // 2, size=(32, dim))
    idx = tuple((k[:, d] + N // 2) for d in range(dim))
    got = np.asarray(yr[(0,) + idx + (0,)]) + 1j * np.asarray(yi[(0,) + idx + (0,)])
    ref = np.zeros((32,), np.complex128)
    kT = k.astype(np.float64).T
    for lo in range(0, n, 1 << 20):
        p = pos[lo : lo + (1 << 20)].astype(np.float64)
        w = x[lo : lo + (1 << 20), 0].astype(np.float64)
        ref += np.exp(2j * np.pi * (p @ kT)).T @ w
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    print(f"rel_l2 (32 sampled freqs vs f64 oracle): {rel:.3e}", flush=True)
    assert rel < 1e-3, rel
    print("ok", flush=True)


if __name__ == "__main__":
    main()
