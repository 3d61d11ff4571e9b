"""Training-step cost on the attached TPU: the flagship kernel-regression
workload (fit fastsum weights w so the Gaussian Gram matvec reproduces y).

Two levels:

* plan-aware single-device step — `ops.planar.nfft_fastsum_real` with a
  prebuilt device plan (the binned Pallas engines + fused Pallas backward):
  the hot-path number for production training on one chip.
* the `parallel.training.make_fastsum_train_step` step on a 1-device mesh —
  the deployment-path construct (shard_map + psum; planar branch on
  complex-free runtimes), plan-free strategies.

Reference semantics: kernel regression over `GaussianKernel`
(`torch_nfft/kernel.py:99-116`); the reference has no training benchmark.

Usage: python examples/bench_train.py [n_points_log2 (default 21)]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import torch_nfft_tpu as tn
from torch_nfft_tpu.ops.binned import build_plan_device
from torch_nfft_tpu.ops.planar import nfft_fastsum_real


def bench(jfn, *args, iters=3):
    out = jfn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0]))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = jfn(*args)
        float(jnp.sum(jax.tree.leaves(out)[0]))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    logn = int(sys.argv[1]) if len(sys.argv) > 1 else 21
    n, dim, N, m = 1 << logn, 3, 64, 4
    rng = np.random.default_rng(11)
    pos = jnp.asarray((rng.random((n, dim), dtype=np.float32) - 0.5) / 2.0)
    w = jnp.asarray(rng.standard_normal((n, 1)).astype(np.float32) * 0.01)
    y = jnp.asarray(rng.standard_normal((n, 1)).astype(np.float32))
    batch = jnp.zeros((n,), jnp.int32)
    coeffs = jnp.asarray(tn.gaussian_analytic_coeffs(0.3, dim=dim, N=N))

    t0 = time.perf_counter()
    plan = build_plan_device(pos, None, N=N, m=m, batch_size=1)
    float(jnp.sum(plan.inv_slot))
    print(f"plan: {time.perf_counter()-t0:.1f}s", flush=True)

    def loss(w):
        pred = nfft_fastsum_real(
            w, coeffs, pos, pos, batch, batch, plan, plan,
            batch_size=1, N=N, m=m,
        )
        return jnp.mean((pred - y) ** 2)

    lv = jax.jit(loss)
    t_f = bench(lv, w)
    print(f"fastsum loss forward:   {t_f*1e3:8.1f} ms "
          f"({n/t_f/1e6:.1f} M pts/s)", flush=True)

    @jax.jit
    def sgd_step(w):
        l, g = jax.value_and_grad(loss)(w)
        return w - 0.05 * g, l

    t_s = bench(sgd_step, w)
    print(f"train step (loss+grad+update): {t_s*1e3:8.1f} ms "
          f"({t_s/t_f:.2f}x forward, {n/t_s/1e6:.1f} M pts/s)", flush=True)

    # descent sanity on-device
    wk, l0 = sgd_step(w)
    for _ in range(4):
        wk, lk = sgd_step(wk)
    print(f"loss {float(l0):.4f} -> {float(lk):.4f} over 5 steps", flush=True)

    # deployment-path construct: shard_map step on a 1-device mesh
    from torch_nfft_tpu.parallel import make_fastsum_train_step, make_mesh

    mesh = make_mesh({"data": 1, "points": 1})
    B2, n2 = 1, min(n, 1 << 18)
    step, shardings = make_fastsum_train_step(
        mesh, coeffs, batch_size=B2, n_per_set=n2, cutoff=m, learning_rate=0.05
    )
    w2 = jnp.zeros((B2, n2, 1), jnp.float32)
    pos2 = jnp.asarray(np.asarray(pos)[:n2][None])
    y2 = jnp.asarray(np.asarray(y)[:n2][None])
    t_m = bench(step, w2, pos2, y2)
    print(f"shard_map step (n={n2}, plan-free): {t_m*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
