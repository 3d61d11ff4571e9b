"""Gradient-path cost on the attached TPU: jax.grad through the headline
adjoint.

The Pallas window kernels carry a FUSED Pallas backward (ops/binned.py:
_spread/_gather_*_cv_bwd): the value cotangent rides the transpose-direction
kernel and the position cotangent runs the derivative-window kernel
(pallas/contract.py:pos_grad_pallas) — nothing materializes the XLA
backward's (R, K, dim, H) window residuals. Set TORCH_NFFT_TPU_FUSED_BWD=0
to measure the old differentiate-the-XLA-engine fallback. Reference
semantics: test/test_grad.py:23-46 (which prints finite-difference errors,
never cost).

Usage: python examples/bench_grad.py [n_points_log2]
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

from torch_nfft_tpu.ops.binned import build_plan_device
from torch_nfft_tpu.ops.planar import nfft_adjoint_planar


def bench(jfn, *args, iters=3):
    out = jfn(*args)
    jax.block_until_ready(out)
    float(jnp.sum(jax.tree.leaves(out)[0]))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = jfn(*args)
        float(jnp.sum(jax.tree.leaves(out)[0]))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    logn = int(sys.argv[1]) if len(sys.argv) > 1 else 22
    n, N, dim = 1 << logn, 256, 3
    window = os.environ.get("BENCH_WINDOW", "gaussian")
    m = int(os.environ.get("BENCH_CUTOFF", 2 if window == "es" else 4))
    sigma = float(os.environ.get("BENCH_SIGMA", 2.0))
    print(f"window={window} m={m} sigma={sigma}", flush=True)
    rng = np.random.default_rng(7)
    pos_np = (rng.random((n, dim), dtype=np.float32) - 0.5) / 2.0
    pos = jnp.asarray(pos_np)
    x = jnp.asarray(rng.standard_normal((n, 1)).astype(np.float32))
    batch = jnp.zeros((n,), jnp.int32)

    t0 = time.perf_counter()
    plan = build_plan_device(pos, None, N=N, m=m, sigma=sigma, batch_size=1,
                             window=window)
    float(jnp.sum(plan.inv_slot))
    print(f"plan: {time.perf_counter()-t0:.1f}s", flush=True)
    if os.environ.get("BENCH_BENES", "0") != "0":
        t0b = time.perf_counter()
        plan = plan.with_benes_tables()
        jax.block_until_ready(plan.benes.local_words)
        print(f"benes tables: {time.perf_counter()-t0b:.1f}s", flush=True)

    def loss(x, pos, batch, plan):
        yr, yi = nfft_adjoint_planar(x, pos, batch, plan, batch_size=1, N=N,
                                     m=m, sigma=sigma, window=window)
        return jnp.sum(yr * yr + yi * yi)

    fwd = jax.jit(loss)
    t_f = bench(fwd, x, pos, batch, plan)
    print(f"adjoint loss forward:      {t_f*1e3:8.1f} ms", flush=True)

    gx = jax.jit(jax.grad(loss, argnums=0))
    t_gx = bench(gx, x, pos, batch, plan)
    print(f"grad wrt values x:         {t_gx*1e3:8.1f} ms "
          f"({t_gx/t_f:.2f}x forward)", flush=True)

    gxp = jax.jit(jax.grad(loss, argnums=(0, 1)))
    t_gp = bench(gxp, x, pos, batch, plan)
    print(f"grad wrt (x, positions):   {t_gp*1e3:8.1f} ms "
          f"({t_gp/t_f:.2f}x forward)", flush=True)


if __name__ == "__main__":
    main()
