"""Stage-level timing of the 3D headline pipeline on the attached TPU.

Times each pipeline stage as its own jitted call (device-synchronized via a
scalar reduction), so stage costs include their own boundary transfers but
not each other. Usage: python examples/profile_stages.py [n_points_log2]
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


def timeit(fn, *args, iters=3):
    # Force execution with a host read of a scalar: block_until_ready alone
    # is unreliable on lazy backends (see bench.py).
    jfn = jax.jit(lambda *a: jnp.sum(fn(*a).real))
    float(jfn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(jfn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    logn = int(sys.argv[1]) if len(sys.argv) > 1 else 22
    window = os.environ.get("PROFILE_WINDOW", "gaussian")
    m = int(os.environ.get("PROFILE_M", 2 if window == "es" else 4))
    n, N, dim = 1 << logn, 256, 3
    M = 2 * N
    rng = np.random.default_rng(7)
    pos_np = (rng.random((n, dim), dtype=np.float32) - 0.5) / 2.0
    pos = jnp.asarray(pos_np)
    x = jnp.asarray(rng.standard_normal((n, 1)).astype(np.float32))

    from torch_nfft_tpu.ops.tilefold import compact_cells

    t0 = time.perf_counter()
    plan = build_plan_device(pos, None, N=N, m=m, batch_size=1,
                             window=window)
    float(jnp.sum(plan.row_count))  # force
    if os.environ.get("PROFILE_BENES", "0") != "0":
        t0b = time.perf_counter()
        plan = plan.with_benes_tables()
        jax.block_until_ready(plan.benes.local_words)
        print(f"benes tables: {time.perf_counter()-t0b:.1f}s", flush=True)
    cells = compact_cells(plan)
    ca = cells is not None
    print(f"plan: {time.perf_counter()-t0:.2f}s rows={plan.slot_pt.shape[0]} "
          f"K={plan.K} active={plan.active} window={window} m={m}",
          flush=True)

    # plan passed as an ARGUMENT: closing over it would bake its arrays
    # into the jaxpr as constants (shipped with every tunnel compile request)
    spread_j = jax.jit(
        lambda pl_, x, p: spread_binned_dft(pl_, x, p, batch_size=1, compact=ca)
    )
    t_spread = timeit(spread_j, plan, x, pos)
    g = spread_j(plan, x, pos)
    print(f"spread_dft:  {t_spread*1e3:8.1f} ms  out={g.shape}", flush=True)

    adj_j = jax.jit(lambda g: spectral_adjoint_pruned_dft(
        g, None, dim, N, m, 2.0, M=M, cells=cells, window=window)[0])
    t_adj = timeit(adj_j, g)
    y = adj_j(g)
    yr = y
    yi = jnp.zeros_like(y)
    print(f"adj_dft:     {t_adj*1e3:8.1f} ms  out={y.shape}", flush=True)

    fwd_j = jax.jit(lambda a, b: spectral_forward_pruned_dft(
        a, b, dim, M, m, 2.0, cells=cells, real_only=True,
        window=window)[0])
    t_fwd = timeit(fwd_j, yr, yi)
    g2 = fwd_j(yr, yi)
    print(f"fwd_dft:     {t_fwd*1e3:8.1f} ms  out={g2.shape}", flush=True)

    gath_j = jax.jit(lambda pl_, g, p: gather_binned_dft(pl_, g, p, compact=ca))
    t_gath = timeit(gath_j, plan, g2, pos)
    print(f"gather_dft:  {t_gath*1e3:8.1f} ms", flush=True)

    total = t_spread + t_adj + t_fwd + t_gath
    print(f"sum (spread + adj + fwd + gather ~ pair): {total*1e3:.1f} ms", flush=True)

    if os.environ.get("PROFILE_SPREAD_STAGES"):
        from torch_nfft_tpu.ops import binned as _b
        from torch_nfft_tpu.ops.pallas.contract import (
            spread_tiles_pallas,
            gather_points_pallas,
        )
        from torch_nfft_tpu.ops.tilefold import (
            fold_tiles_to_grid_dft,
            unfold_grid_to_tiles_dft,
            row_tile_ids,
        )

        tiles_j = jax.jit(lambda pl_, x, p: spread_tiles_pallas(pl_, x, p, C=1))
        print(f"  tiles_pallas: {timeit(tiles_j, plan, x, pos)*1e3:8.1f} ms", flush=True)
        tiles = tiles_j(plan, x, pos)
        S = tiles.shape[0]
        F = plan.H**3

        from torch_nfft_tpu.ops.tilefold import active_axes
        import math as _math

        NT = _math.prod(a for _, a in active_axes(plan, ca))

        def scat(t):
            return (
                jnp.zeros((NT, F), jnp.float32)
                .at[row_tile_ids(plan, ca)]
                .add(t.reshape(S, F), mode="drop", indices_are_sorted=True)
            )

        def scat2(pl_, t):
            return (
                jnp.zeros((NT, F), jnp.float32)
                .at[row_tile_ids(pl_, ca)]
                .add(t.reshape(S, F), mode="drop")
            )

        scat_j = jax.jit(scat2)
        print(f"  tile_scatter: {timeit(scat_j, plan, tiles)*1e3:8.1f} ms", flush=True)
        acc = scat_j(plan, tiles)
        fold_j = jax.jit(lambda pl_, a: fold_tiles_to_grid_dft(a, pl_, 1, 1, ca))
        print(f"  fold_dft:     {timeit(fold_j, plan, acc)*1e3:8.1f} ms", flush=True)
        unf_j = jax.jit(lambda pl_, g: unfold_grid_to_tiles_dft(g, pl_, 1, ca))
        print(f"  unfold_dft:   {timeit(unf_j, plan, g2)*1e3:8.1f} ms", flush=True)
        td = unf_j(plan, g2)
        gp_j = jax.jit(
            lambda pl_, t, p: gather_points_pallas(
                pl_, t, p, C=1, tile_index=row_tile_ids(pl_, ca)
            )
        )
        print(f"  gather_pts:   {timeit(gp_j, plan, td, pos)*1e3:8.1f} ms", flush=True)

    if os.environ.get("PROFILE_XLA_PATH"):
        from torch_nfft_tpu.ops import binned as _b

        sx = jax.jit(lambda x, p: _b._spread_dft_xla(plan, x, p, 1))
        print(f"spread_xla:  {timeit(sx, x, pos)*1e3:8.1f} ms", flush=True)
        gx = jax.jit(lambda g, p: _b._gather_dft_xla(plan, g, p))
        print(f"gather_xla:  {timeit(gx, g2, pos)*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
