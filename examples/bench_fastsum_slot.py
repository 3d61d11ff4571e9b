"""Iterated Gram matvecs: user-order vs slot-layout fastsum on the TPU.

A CG / power-iteration workload applies the Gaussian Gram matrix to a
vector on a FIXED point set many times. In user order every matvec pays
the two point-order permutations (issue-bound scatters, the dominant
non-math cost of a transform); the slot-layout API
(``ops.binned.to_slot_order`` + ``nfft_fastsum_real(slot_io=True)``)
pays them once per solve. This measures ITERS power-iteration steps both
ways at the 3D N=256 m=4 geometry.

Usage: python examples/bench_fastsum_slot.py [n_log2] [iters]
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

import torch_nfft_tpu as tn
from torch_nfft_tpu.ops.planar import nfft_fastsum_real


def main():
    logn = int(sys.argv[1]) if len(sys.argv) > 1 else 22
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    N = int(os.environ.get("BENCH_BANDWIDTH", 256))
    window = os.environ.get("BENCH_WINDOW", "gaussian")
    m = int(os.environ.get("BENCH_CUTOFF", 2 if window == "es" else 4))
    sigma = float(os.environ.get("BENCH_SIGMA", 2.0))
    n, dim, B = 1 << logn, 3, 1
    print(f"window={window} m={m} sigma={sigma}", flush=True)
    rng = np.random.default_rng(11)
    pos = (rng.random((n, dim), dtype=np.float32) - 0.5) / 2.0
    batch = np.zeros((n,), np.int32)
    x0 = rng.standard_normal((n, 1)).astype(np.float32)
    coeffs = tn.gaussian_analytic_coeffs(0.1, dim=dim, N=N)

    t0 = time.perf_counter()
    plan = tn.build_plan_device(pos, batch, N=N, m=m, sigma=sigma,
                                batch_size=B, window=window)
    float(jnp.sum(plan.row_count))
    print(f"plan: {time.perf_counter()-t0:.1f}s rows={plan.slot_pt.shape[0]} "
          f"K={plan.K} T={plan.T}", flush=True)
    if os.environ.get("BENCH_BENES", "0") != "0":
        t0b = time.perf_counter()
        plan = plan.with_benes_tables()
        jax.block_until_ready(plan.benes.local_words)
        print(f"benes tables: {time.perf_counter()-t0b:.1f}s", flush=True)

    posj, batchj = jnp.asarray(pos), jnp.asarray(batch)

    # plan/positions as ARGUMENTS: closing over them would bake their
    # arrays (incl. ~50 MB of Benes bit tables) into the jaxpr as
    # constants — the tunnel's remote-compile request then exceeds the
    # relay's body limit (HTTP 413)
    def step_user(y, pl_, posj, batchj):
        z = nfft_fastsum_real(y, coeffs, posj, posj, batchj, batchj, pl_,
                              pl_, batch_size=B, N=N, m=m,
                              sigma=sigma, window=window)
        return z * jax.lax.rsqrt(jnp.vdot(z, z))

    def step_slot(v, pl_, posj, batchj):
        z = nfft_fastsum_real(
            v, coeffs, posj, posj, batchj, batchj, pl_, pl_,
            batch_size=B, N=N, m=m, sigma=sigma,
            window=window, slot_io=True
        )
        return z * jax.lax.rsqrt(jnp.vdot(z, z))

    @jax.jit
    def run_user(y, pl_, posj, batchj):
        return jax.lax.fori_loop(
            0, iters, lambda _, a: step_user(a, pl_, posj, batchj), y
        )

    @jax.jit
    def run_slot(y, pl_, posj, batchj):
        v = tn.to_slot_order(pl_, y)
        v = jax.lax.fori_loop(
            0, iters, lambda _, a: step_slot(a, pl_, posj, batchj), v
        )
        return tn.from_slot_order(pl_, v)

    def timeit(fn, y):
        out = fn(y, plan, posj, batchj)
        float(jnp.sum(out))  # force (compile + run)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(jnp.sum(fn(y, plan, posj, batchj)))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts)), out

    xj = jnp.asarray(x0)
    t_user, y_user = timeit(run_user, xj)
    print(f"user order: {t_user:.3f}s for {iters} matvecs "
          f"({t_user/iters*1e3:.1f} ms/matvec)", flush=True)
    t_slot, y_slot = timeit(run_slot, xj)
    print(f"slot order: {t_slot:.3f}s for {iters} matvecs "
          f"({t_slot/iters*1e3:.1f} ms/matvec)  speedup x{t_user/t_slot:.2f}",
          flush=True)
    rel = float(jnp.linalg.norm(y_user - y_slot) / jnp.linalg.norm(y_user))
    print(f"agreement rel-L2: {rel:.2e}", flush=True)


if __name__ == "__main__":
    main()
