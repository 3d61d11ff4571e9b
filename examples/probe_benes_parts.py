"""Split the user<->slot permutation cost into its parts at the headline
plan: the Benes network apply (forward + reverse) on the compact rank
space vs the ragged expand/compact streaming passes. Identifies where the
measured ~36 ms/pair of permutation time goes. Also A/Bs NFFT_BENES_CHUNK.
Usage: python examples/probe_benes_parts.py [logn]
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
from torch_nfft_tpu.ops.pallas.benes import apply_benes
from torch_nfft_tpu.ops.pallas.ragged import (
    compact_rows,
    expand_rows,
    row_start_from_counts,
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
    n, N, dim = 1 << logn, 256, 3
    window, m, sigma = "es", 2, 1.625
    rng = np.random.default_rng(7)
    pos_np = (rng.random((n, dim), dtype=np.float32) - 0.5) / 2.0
    pos = jnp.asarray(pos_np)

    t0 = time.perf_counter()
    plan = B.build_plan_device(pos, None, N=N, m=m, sigma=sigma,
                               batch_size=1, window=window)
    float(jnp.sum(plan.row_count))
    plan = plan.with_benes_tables(pos=pos_np)
    jax.block_until_ready(plan.benes.local_words)
    bt = plan.benes
    S, K = plan.slot_pt.shape
    print(f"plan+benes: {time.perf_counter()-t0:.1f}s rows={S} K={K} "
          f"bt.n={bt.n} b={bt.b}", flush=True)

    v = jnp.asarray(rng.standard_normal((bt.n,)).astype(np.float32))

    timeit("network fwd (alone)", lambda bt_, v_: jnp.sum(apply_benes(
        v_, bt_.cross_words, bt_.local_words, block_log2=bt_.b)), bt, v)
    timeit("network rev (alone)", lambda bt_, v_: jnp.sum(apply_benes(
        v_, bt_.cross_words, bt_.local_words, block_log2=bt_.b,
        reverse=True)), bt, v)

    rs = row_start_from_counts(plan.row_count)
    need = ((n - 1) // K + 2) * K
    vv = v[:need]
    timeit("ragged expand (alone)", lambda p_, v_: jnp.sum(expand_rows(
        v_, row_start_from_counts(p_.row_count), p_.row_count, K=K)),
        plan, vv)
    padded = jnp.asarray(
        rng.standard_normal((S, K)).astype(np.float32))
    timeit("ragged compact (alone)", lambda p_, t_: jnp.sum(compact_rows(
        t_, row_start_from_counts(p_.row_count), p_.row_count, n)),
        plan, padded)


if __name__ == "__main__":
    main()
