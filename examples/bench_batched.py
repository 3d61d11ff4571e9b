"""Timed run of the driver's batched 3D configuration (BASELINE.json #3):
batch_size=16, N=256, m=4, trailing columns — at FULL size, on one chip.

The reference allocates batch*cols*(2N)^3 complex in one go
(core_cuda.cu:216) = 16 GiB here; this runs the grid-streamed pipeline
(ops/streaming.py): one (active-slab) grid buffer reused across members.
Usage: python examples/bench_batched.py [n_total_log2]
Env: BENCH_WINDOW (gaussian|es), BENCH_CUTOFF, BATCH_GROUP, BATCH_COLS.
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

from torch_nfft_tpu.ops.streaming import (
    make_streamed_layout,
    nfft_adjoint_streamed,
    nfft_forward_streamed,
)


def _run_pairs(pair, label, n):
    t0 = time.perf_counter()
    pair()
    print(f"first pair (compile): {time.perf_counter()-t0:.1f}s", flush=True)
    ts = []
    for i in range(3):
        t0 = time.perf_counter()
        pair()
        ts.append(time.perf_counter() - t0)
        print(f"iter {i}: {ts[-1]:.3f}s", flush=True)
    t = float(np.median(ts))
    print(f"{label}: {t:.3f} s/pair = {n/t/1e6:.2f} M points/s", flush=True)

    # Steady-state: enqueue BATCH_PIPELINE pairs back-to-back, pull after the
    # last enqueue (same protocol as bench.py) — host dispatch of the many
    # per-group/per-column calls overlaps device execution.
    pipe = int(os.environ.get("BATCH_PIPELINE", "3"))
    if pipe > 1:
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            outs = [pair(defer=True) for _ in range(pipe)]
            for o in outs:
                for v in o:
                    float(jnp.sum(v))
            dt = (time.perf_counter() - t0) / pipe
            best = dt if best is None else min(best, dt)
        print(
            f"{label} pipelined x{pipe}: {best:.3f} s/pair = "
            f"{n/best/1e6:.2f} M points/s",
            flush=True,
        )


def main():
    logn = int(sys.argv[1]) if len(sys.argv) > 1 else 21
    mode = sys.argv[2] if len(sys.argv) > 2 else "global"
    n, B, N, dim, C = 1 << logn, 16, 256, 3, 2
    window = os.environ.get("BENCH_WINDOW", "gaussian")
    m = int(os.environ.get("BENCH_CUTOFF", 4))
    sigma = float(os.environ.get("BENCH_SIGMA", 2.0))
    T_env = os.environ.get("BATCH_T")
    T_plan = int(T_env) if T_env else None
    print(f"window={window} m={m} sigma={sigma} T={T_plan}", flush=True)
    rng = np.random.default_rng(7)
    pos = (rng.random((n, dim), dtype=np.float32) - 0.5) / 2.0
    batch = np.sort(rng.integers(0, B, n)).astype(np.int32)
    batch[0], batch[-1] = 0, B - 1
    x = rng.standard_normal((n, C)).astype(np.float32)

    if mode == "stream":
        t0 = time.perf_counter()
        layout = make_streamed_layout(pos, batch, batch_size=B, N=N, m=m,
                                      window=window)
        print(f"layout+plans: {time.perf_counter()-t0:.1f}s "
              f"(n_max={layout.n_max})", flush=True)

        def pair(defer=False):
            yr, yi = nfft_adjoint_streamed(x, layout)
            zr, _ = nfft_forward_streamed(yr, yi, layout)
            if defer:
                return [zr]
            return float(jnp.sum(zr))

        _run_pairs(pair, f"stream B={B} N={N} C={C} n={n}", n)
        return

    # "global": batch members run in GROUPS of Gm directly in the grid's
    # leading dim (active-slab compaction makes multi-member grids fit);
    # columns run one at a time to keep the dense tile array inside the
    # fold budget. Far fewer, bigger pipelines than one-member streaming.
    from torch_nfft_tpu.ops.binned import build_plan_device
    from torch_nfft_tpu.ops.planar import nfft_adjoint_planar, nfft_pair_planar

    Gm = int(os.environ.get("BATCH_GROUP", 8))
    Kf = os.environ.get("BATCH_K")
    Kf = int(Kf) if Kf else None
    t0 = time.perf_counter()
    groups = []
    for g0 in range(0, B, Gm):
        sel = (batch >= g0) & (batch < g0 + Gm)
        pos_g, batch_g, x_g = pos[sel], batch[sel] - g0, x[sel]
        # device-side builder: every O(n) step stays on-chip (the host
        # builder ships ~8 B/point over the tunnel — 65 s for this config)
        plan_g = build_plan_device(
            jnp.asarray(pos_g), jnp.asarray(batch_g), N=N, m=m, sigma=sigma,
            batch_size=Gm, K=Kf, T=T_plan, window=window,
        )
        if os.environ.get("BATCH_BENES", "0") != "0":
            # routed Benes permutation masks per group plan (host routing of
            # the group's rank space + bit upload, like bench.py's upgrade)
            plan_g = plan_g.with_benes_tables(pos=pos_g, batch=batch_g)
        groups.append((jnp.asarray(pos_g), jnp.asarray(batch_g),
                       jnp.asarray(x_g), plan_g))
    print(f"plans: {time.perf_counter()-t0:.1f}s groups={len(groups)} "
          f"rows={groups[0][3].slot_pt.shape[0]} K={groups[0][3].K} "
          f"active={groups[0][3].active}", flush=True)

    # columns run in chunks of BATCH_COLS (default 1). Both columns DO fit
    # the 6 GiB fold budget together at Gm=8 (~4.1 GiB tile array), but
    # measured SLOWER (1.59 vs 1.43 s/pair): the doubled tile-array traffic
    # costs more than the per-row window/Khatri-Rao sharing saves.
    Cc = int(os.environ.get("BATCH_COLS", 1))

    def pair(defer=False):
        # enqueue every group x column pipeline before pulling anything:
        # TPU executes in order, so the per-call host dispatch (~30 ms on
        # the bench tunnel) overlaps device execution of the previous call
        outs = []
        for posj, batchj, xj, plan in groups:
            for c in range(0, C, Cc):
                # half-spectrum pair: the full two-plane N^3 spectrum never
                # materializes between the DFTs (ops/planar.py)
                zr = nfft_pair_planar(
                    xj[:, c : c + Cc], posj, batchj, plan, batch_size=Gm,
                    N=N, m=m, sigma=sigma, window=window,
                )
                outs.append(zr)
        if defer:
            return outs
        return sum(float(jnp.sum(zr)) for zr in outs)

    _run_pairs(
        pair,
        f"global B={B} (groups of {Gm}, cols of {Cc}) N={N} C={C} n={n}", n,
    )

    # Accuracy gate: adjoint output of member 0, column 0 vs an exact-phase
    # oracle on 64 sampled frequencies (same pattern as bench.py's headline
    # check; member points are few enough for a host float64 oracle).
    posj, batchj, xj, plan = groups[0]
    yr, yi = nfft_adjoint_planar(
        xj[:, :1], posj, batchj, plan, batch_size=Gm, N=N, m=m, sigma=sigma,
        window=window,
    )
    sel0 = np.asarray(batchj) == 0
    p0 = np.asarray(posj)[sel0].astype(np.float64)
    x0 = np.asarray(xj)[sel0, 0].astype(np.float64)
    rng2 = np.random.default_rng(11)
    k = rng2.integers(-(N // 2), N // 2, size=(64, dim))
    idx = tuple((k[:, d] + N // 2) for d in range(dim))
    got = (np.asarray(yr[(0,) + idx + (0,)])
           + 1j * np.asarray(yi[(0,) + idx + (0,)]))
    ref = np.exp(2j * np.pi * (k @ p0.T)) @ x0
    rel = float(np.linalg.norm(got - ref) / np.linalg.norm(ref))
    print(f"accuracy (member 0, 64 sampled freqs) rel-L2 = {rel:.2e} "
          f"ok={rel < 1e-3}", flush=True)


if __name__ == "__main__":
    main()
