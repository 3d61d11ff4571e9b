"""Round-5 sub-stage probe at the 3D headline config (es m=2 sigma=1.625,
n=2^24, Benes plan): times each pipeline piece as its own jitted call and
A/Bs the round-5 levers — row-batched kernels vs per-row, Hermitian half
DFTs vs full. Usage: python examples/probe_r5.py [logn] [stages...]
Stages: perm spread dft gather  (default: all)
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
os.environ.setdefault(
    "TORCH_NFFT_TPU_BENES_CACHE",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "artifacts", "benes_cache"),
)

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from torch_nfft_tpu.ops import binned as B
from torch_nfft_tpu.ops.fft import (
    spectral_adjoint_half_dft,
    spectral_adjoint_pruned_dft,
    spectral_forward_half_dft,
    spectral_forward_pruned_dft,
)
from torch_nfft_tpu.ops.tilefold import (
    compact_cells,
    fold_tiles_to_grid_dft,
    row_tile_ids,
    unfold_grid_to_tiles_dft,
)


def timeit(label, fn, *args, iters=3):
    jfn = jax.jit(lambda *a: jnp.sum(fn(*a)))
    t0 = time.perf_counter()
    float(jfn(*args))
    tc = time.perf_counter() - t0
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(jfn(*args))
        ts.append(time.perf_counter() - t0)
    t = float(np.median(ts))
    print(f"{label:34s} {t*1e3:8.1f} ms   (first {tc:6.1f}s)", flush=True)
    return t


def main():
    logn = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    stages = set(sys.argv[2:]) or {"perm", "spread", "dft", "gather"}
    n, N, dim, C = 1 << logn, 256, 3, 1
    window = os.environ.get("PROBE_WINDOW", "es")
    m = int(os.environ.get("PROBE_M", 2))
    sigma = float(os.environ.get("PROBE_SIGMA", 1.625))
    M = int(round(sigma * N))
    rng = np.random.default_rng(7)
    pos_np = (rng.random((n, dim), dtype=np.float32) - 0.5) / 2.0
    pos = jnp.asarray(pos_np)
    x = jnp.asarray(rng.standard_normal((n, C)).astype(np.float32))

    t0 = time.perf_counter()
    plan = B.build_plan_device(pos, None, N=N, m=m, sigma=sigma,
                               batch_size=1, window=window)
    float(jnp.sum(plan.row_count))
    plan = plan.with_benes_tables(pos=pos_np)
    jax.block_until_ready(plan.benes.local_words)
    cells = compact_cells(plan)
    ca = cells is not None
    S, K = plan.slot_pt.shape
    print(f"plan+benes: {time.perf_counter()-t0:.1f}s rows={S} K={K} "
          f"T={plan.T} S_occ={plan.S_occ} M={M}", flush=True)

    from torch_nfft_tpu.ops.pallas.contract import (
        _slot_values,
        gather_points_pallas,
        gather_points_rb_pallas,
        spread_tiles_dense_pallas,
        spread_tiles_rb_pallas,
    )

    xs = jax.jit(lambda p_, v: _slot_values(p_, v))(plan, x)  # (C, S*K)
    tid = row_tile_ids(plan, ca)
    import math as _math

    from torch_nfft_tpu.ops.tilefold import active_axes

    NT = 1 * _math.prod(a for _, a in active_axes(plan, ca))

    if "perm" in stages:
        timeit("slot_values (benes)", lambda p_, v: jnp.sum(
            _slot_values(p_, v)), plan, x)

    R = B._row_batch(plan, C)
    print(f"row batch R={R}", flush=True)

    if "spread" in stages:
        def rb_rows(p_, v):
            return spread_tiles_rb_pallas(p_, None, None, C=C, R=R, x_slot=v)

        rows = jax.jit(rb_rows)(plan, xs)
        timeit("rb spread kernel (slot in)", lambda p_, v: jnp.sum(
            rb_rows(p_, v)), plan, xs)
        timeit("dense compose (take+ovf)", lambda p_, r_: jnp.sum(
            B._dense_from_rowtiles(p_, r_, tid, NT)), plan, rows)

        def old_dense(p_, v):
            valid = p_.row_count > 0
            pv = jax.lax.cummax(jnp.where(
                valid, jnp.arange(S, dtype=jnp.int32), 0))
            t2 = jnp.take(tid, pv)
            return spread_tiles_dense_pallas(
                p_, None, None, C=C, tile_index=t2, NT=NT, x_slot=v)

        timeit("old dense kernel (slot in)", lambda p_, v: jnp.sum(
            old_dense(p_, v)), plan, xs)

        dense = jax.jit(lambda p_, v: old_dense(p_, v))(plan, xs)
        d2 = dense.reshape(NT, C * plan.H ** dim)
        timeit("fold -> dft grid", lambda p_, d_: jnp.sum(
            fold_tiles_to_grid_dft(d_, p_, 1, C, ca)), plan, d2)

    g = jax.jit(lambda p_, x_, pp_: B.spread_binned_dft(
        p_, x_, pp_, batch_size=1, compact=ca))(plan, x, pos)

    if "dft" in stages:
        timeit("adj dft FULL", lambda g_: jnp.sum(
            spectral_adjoint_pruned_dft(
                g_, None, dim, N, m, sigma, M=M, cells=cells,
                window=window)[0]), g)
        timeit("adj dft HALF", lambda g_: jnp.sum(
            spectral_adjoint_half_dft(
                g_, dim, N, m, sigma, M=M, cells=cells, window=window)[0]), g)

        hr, hi = jax.jit(lambda g_: spectral_adjoint_half_dft(
            g_, dim, N, m, sigma, M=M, cells=cells, window=window))(g)
        fr, fi = jax.jit(lambda g_: spectral_adjoint_pruned_dft(
            g_, None, dim, N, m, sigma, M=M, cells=cells, window=window))(g)
        timeit("fwd dft FULL (real_only)", lambda a, b: jnp.sum(
            spectral_forward_pruned_dft(
                a, b, dim, M, m, sigma, cells=cells, real_only=True,
                window=window)[0]), fr, fi)
        timeit("fwd dft HALF", lambda a, b: jnp.sum(
            spectral_forward_half_dft(
                a, b, dim, M, m, sigma, cells=cells, window=window)[0]),
            hr, hi)

    if "gather" in stages:
        tiles = jax.jit(lambda p_, g_: unfold_grid_to_tiles_dft(
            g_, p_, 1, ca))(plan, g)
        timeit("unfold", lambda p_, g_: jnp.sum(
            unfold_grid_to_tiles_dft(g_, p_, 1, ca)), plan, g)

        def rb_g(p_, t_):
            S_pad = -(-S // R) * R
            tp = jnp.pad(tid, (0, S_pad - S))
            rows_t = jnp.take(t_.astype(jnp.float32), tp, axis=0)
            return gather_points_rb_pallas(p_, rows_t, C=C, R=R)

        timeit("rb gather kernel (slot out)", lambda p_, t_: jnp.sum(
            rb_g(p_, t_)), plan, tiles)
        timeit("old gather kernel (slot out)", lambda p_, t_: jnp.sum(
            gather_points_pallas(p_, t_.astype(jnp.float32), None, C=C,
                                 tile_index=tid)), plan, tiles)

        y = jax.jit(lambda p_, t_: rb_g(p_, t_))(plan, tiles)
        from torch_nfft_tpu.ops.pallas.contract import _unslot_values

        timeit("unslot (benes rev)", lambda p_, y_: jnp.sum(
            _unslot_values(p_, jnp.swapaxes(y_, 1, 2).reshape(S * K, C),
                           n)), plan, y)


if __name__ == "__main__":
    main()
