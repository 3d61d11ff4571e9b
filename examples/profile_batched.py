"""Stage-level timing of the batched driver configuration (BASELINE.json #3):
B=16 members, N=256, C=2 columns, n total points — one group of Gm members,
one column, per stage; the full pair is (B/Gm) * (C/Cc) such pipelines.

Usage: python examples/profile_batched.py [n_total_log2]
Env: BENCH_WINDOW, BENCH_CUTOFF, BENCH_SIGMA, BATCH_GROUP, BATCH_T, BATCH_K.
"""

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from torch_nfft_tpu.ops.binned import (
    build_plan_device,
    spread_binned_dft,
    gather_binned_dft,
)
from torch_nfft_tpu.ops.fft import (
    spectral_adjoint_pruned_dft,
    spectral_forward_pruned_dft,
)
from torch_nfft_tpu.ops.tilefold import compact_cells


def timeit(fn, *args, iters=3):
    jfn = jax.jit(lambda *a: jnp.sum(fn(*a)))
    float(jfn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(jfn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    logn = int(sys.argv[1]) if len(sys.argv) > 1 else 21
    n, B, N, dim, C = 1 << logn, 16, 256, 3, 2
    window = os.environ.get("BENCH_WINDOW", "gaussian")
    m = int(os.environ.get("BENCH_CUTOFF", 4))
    sigma = float(os.environ.get("BENCH_SIGMA", 2.0))
    Gm = int(os.environ.get("BATCH_GROUP", 8))
    T = os.environ.get("BATCH_T")
    T = int(T) if T else None
    K = os.environ.get("BATCH_K")
    K = int(K) if K else None
    M = int(round(sigma * N))
    rng = np.random.default_rng(7)
    pos = (rng.random((n, dim), dtype=np.float32) - 0.5) / 2.0
    batch = np.sort(rng.integers(0, B, n)).astype(np.int32)
    batch[0], batch[-1] = 0, B - 1
    x = rng.standard_normal((n, C)).astype(np.float32)

    # first group only; pair cost ~= (B/Gm)*(C/Cc) * (sum of stages)
    sel = batch < Gm
    pos_g = jnp.asarray(pos[sel])
    batch_g = jnp.asarray(batch[sel])
    x_g = jnp.asarray(x[sel][:, :1])
    n_g = int(sel.sum())

    t0 = time.perf_counter()
    plan = build_plan_device(pos_g, batch_g, N=N, m=m, sigma=sigma,
                             batch_size=Gm, window=window, T=T, K=K)
    float(jnp.sum(plan.row_count))
    cells = compact_cells(plan)
    ca = cells is not None
    print(f"plan: {time.perf_counter()-t0:.2f}s rows={plan.slot_pt.shape[0]} "
          f"K={plan.K} T={plan.T} active={plan.active} window={window} m={m} "
          f"n_group={n_g}", flush=True)

    spread_j = jax.jit(
        lambda pl_, x, p: spread_binned_dft(pl_, x, p, batch_size=Gm, compact=ca)
    )
    t_spread = timeit(spread_j, plan, x_g, pos_g)
    g = spread_j(plan, x_g, pos_g)
    gb = math.prod(g.shape) * 4 / 2**30
    print(f"spread_dft:  {t_spread*1e3:8.1f} ms  out={g.shape} ({gb:.2f} GiB)",
          flush=True)

    adj_j = jax.jit(lambda g: spectral_adjoint_pruned_dft(
        g, None, dim, N, m, sigma, M=M, cells=cells, window=window)[0])
    t_adj = timeit(adj_j, g)
    y = adj_j(g)
    print(f"adj_dft:     {t_adj*1e3:8.1f} ms  out={y.shape}", flush=True)

    fwd_j = jax.jit(lambda a: spectral_forward_pruned_dft(
        a, jnp.zeros_like(a), dim, M, m, sigma, cells=cells, real_only=True,
        window=window)[0])
    t_fwd = timeit(fwd_j, y)
    g2 = fwd_j(y)
    print(f"fwd_dft:     {t_fwd*1e3:8.1f} ms  out={g2.shape}", flush=True)

    gath_j = jax.jit(lambda pl_, g, p: gather_binned_dft(pl_, g, p, compact=ca))
    t_gath = timeit(gath_j, plan, g2, pos_g)
    print(f"gather_dft:  {t_gath*1e3:8.1f} ms", flush=True)

    per_pipe = t_spread + t_adj + t_fwd + t_gath
    n_pipes = (B // Gm) * C
    print(f"one group x one column: {per_pipe*1e3:.1f} ms; "
          f"x{n_pipes} pipelines ~= {per_pipe*n_pipes:.3f} s/pair", flush=True)


if __name__ == "__main__":
    main()
