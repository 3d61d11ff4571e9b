"""Stage-level timing of the batched driver config (BASELINE.json #3) on the
attached TPU: 3D, batch_size=16, N=256, m=4, C=2 columns, run as groups of
``BATCH_GROUP`` members directly in the grid's batch dimension (the
bench_batched.py "global" mode).

Decomposes one group x one column pipeline into spread / adjoint DFT /
forward DFT / gather so the 1.7 s/pair budget can be attributed.
Usage: python examples/profile_batched.py [n_total_log2]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
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
    jfn = jax.jit(lambda *a: jnp.sum(fn(*a).real))
    float(jfn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(jfn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    logn = int(sys.argv[1]) if len(sys.argv) > 1 else 21
    n, B, N, dim, m = 1 << logn, 16, 256, 3, 4
    M = 2 * N
    Gm = int(os.environ.get("BATCH_GROUP", 8))
    rng = np.random.default_rng(7)
    pos = (rng.random((n, dim), dtype=np.float32) - 0.5) / 2.0
    batch = np.sort(rng.integers(0, B, n)).astype(np.int32)
    batch[0], batch[-1] = 0, B - 1
    x = rng.standard_normal((n, 1)).astype(np.float32)

    sel = batch < Gm  # first group stands in for all (uniform occupancy)
    pos_g = jnp.asarray(pos[sel])
    batch_g = jnp.asarray(batch[sel])
    x_g = jnp.asarray(x[sel])
    n_g = int(sel.sum())

    t0 = time.perf_counter()
    plan = build_plan_device(pos_g, batch_g, N=N, m=m, batch_size=Gm)
    float(jnp.sum(plan.row_count))  # force
    cells = compact_cells(plan)
    ca = cells is not None
    print(f"plan: {time.perf_counter()-t0:.1f}s rows={plan.slot_pt.shape[0]} "
          f"K={plan.K} T={plan.T} active={plan.active} n_group={n_g}",
          flush=True)

    spread_j = jax.jit(
        lambda pl_, x, p: spread_binned_dft(pl_, x, p, batch_size=Gm, compact=ca)
    )
    t_spread = timeit(spread_j, plan, x_g, pos_g)
    g = spread_j(plan, x_g, pos_g)
    print(f"spread_dft:  {t_spread*1e3:8.1f} ms  out={g.shape}", flush=True)

    adj_j = jax.jit(lambda g: spectral_adjoint_pruned_dft(
        g, None, dim, N, m, 2.0, M=M, cells=cells)[0])
    t_adj = timeit(adj_j, g)
    y = adj_j(g)
    print(f"adj_dft:     {t_adj*1e3:8.1f} ms  out={y.shape}", flush=True)

    yi = jnp.zeros_like(y)
    fwd_j = jax.jit(lambda a, b: spectral_forward_pruned_dft(
        a, b, dim, M, m, 2.0, cells=cells)[0])
    t_fwd = timeit(fwd_j, y, yi)
    g2 = fwd_j(y, yi)
    print(f"fwd_dft:     {t_fwd*1e3:8.1f} ms  out={g2.shape}", flush=True)

    gath_j = jax.jit(lambda pl_, g, p: gather_binned_dft(pl_, g, p, compact=ca))
    t_gath = timeit(gath_j, plan, g2, pos_g)
    print(f"gather_dft:  {t_gath*1e3:8.1f} ms", flush=True)

    per_pipe = t_spread + t_adj + t_fwd + t_gath
    n_pipes = (B // Gm) * 2  # groups x columns
    print(f"per-pipeline sum: {per_pipe*1e3:.1f} ms; x{n_pipes} pipelines "
          f"~ {per_pipe*n_pipes:.3f} s/pair (separately-staged; fused pair "
          f"avoids per-call dispatch)", flush=True)

    if os.environ.get("PROFILE_SPREAD_STAGES"):
        import math

        from torch_nfft_tpu.ops.binned import _dense_tiles_pallas
        from torch_nfft_tpu.ops.pallas.contract import (
            _slot_values,
            _unslot_values,
            gather_points_pallas,
        )
        from torch_nfft_tpu.ops.tilefold import (
            active_axes,
            fold_tiles_to_grid_dft,
            row_tile_ids,
            unfold_grid_to_tiles_dft,
        )

        sv_j = jax.jit(lambda pl_, x: _slot_values(pl_, x))
        print(f"  slot_values:  {timeit(sv_j, plan, x_g)*1e3:8.1f} ms", flush=True)

        dt_j = jax.jit(
            lambda pl_, x, p: _dense_tiles_pallas(pl_, x, p, Gm, ca)
        )
        print(f"  dense_tiles:  {timeit(dt_j, plan, x_g, pos_g)*1e3:8.1f} ms",
              flush=True)
        acc = dt_j(plan, x_g, pos_g)
        print(f"    tiles shape {acc.shape} = "
              f"{acc.size*4/2**30:.2f} GiB", flush=True)

        fold_j = jax.jit(lambda pl_, a: fold_tiles_to_grid_dft(a, pl_, Gm, 1, ca))
        print(f"  fold_dft:     {timeit(fold_j, plan, acc)*1e3:8.1f} ms", flush=True)

        unf_j = jax.jit(lambda pl_, g: unfold_grid_to_tiles_dft(g, pl_, Gm, ca))
        print(f"  unfold_dft:   {timeit(unf_j, plan, g2)*1e3:8.1f} ms", flush=True)
        td = unf_j(plan, g2)

        gp_j = jax.jit(
            lambda pl_, t, p: gather_points_pallas(
                pl_, t, p, C=1, tile_index=row_tile_ids(pl_, ca)
            )
        )
        print(f"  gather_pts:   {timeit(gp_j, plan, td, pos_g)*1e3:8.1f} ms",
              flush=True)
        yv = gp_j(plan, td, pos_g)
        S, K = plan.slot_pt.shape
        us_j = jax.jit(
            lambda pl_, y: _unslot_values(
                pl_, jnp.swapaxes(y, 1, 2).reshape(S * K, 1), n_g
            )
        )
        print(f"  unslot:       {timeit(us_j, plan, yv)*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
