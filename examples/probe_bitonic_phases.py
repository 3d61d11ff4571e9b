"""Compile each bitonic phase kernel separately with timing (tunnel triage).

Usage: python -u examples/probe_bitonic_phases.py [q] [b]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from torch_nfft_tpu.ops.pallas import bitonic as B

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    args = [int(a) for a in sys.argv[1:]]
    q = args[0] if args else 24
    b = args[1] if len(args) > 1 else 18
    R = (1 << b) // B.LANES
    G = (1 << q) // (1 << b)
    print(f"q={q} b={b} R={R} G={G}", flush=True)

    k2 = jnp.zeros((G * R, 128), jnp.int32)
    v2 = jnp.zeros((G * R, 128), jnp.float32)
    in_specs, out_specs = B._block_specs(R)

    def chunk_call(k2, v2, lo, hi):
        return pl.pallas_call(
            functools.partial(B._local_rounds_kernel, jj_lo=lo, jj_hi=hi,
                              b=b, interpret=False),
            grid=(G,), in_specs=in_specs, out_specs=out_specs,
            out_shape=[jax.ShapeDtypeStruct(k2.shape, k2.dtype),
                       jax.ShapeDtypeStruct(v2.shape, v2.dtype)],
            input_output_aliases={0: 0, 1: 1},
            compiler_params=B._compiler_params(),
        )(k2, v2)

    def merge_call(bit, k2, v2):
        return pl.pallas_call(
            functools.partial(B._local_merge_kernel, b=b, interpret=False),
            grid=(G,),
            in_specs=[pl.BlockSpec(memory_space=B.pltpu.SMEM)] + in_specs,
            out_specs=out_specs,
            out_shape=[jax.ShapeDtypeStruct(k2.shape, k2.dtype),
                       jax.ShapeDtypeStruct(v2.shape, v2.dtype)],
            input_output_aliases={1: 0, 2: 1},
            compiler_params=B._compiler_params(),
        )(bit, k2, v2)

    for lo, hi in B._round_chunks(b):
        t0 = time.perf_counter()
        k2, v2 = jax.block_until_ready(
            jax.jit(functools.partial(chunk_call, lo=lo, hi=hi))(k2, v2))
        print(f"local rounds {lo}-{hi}: {time.perf_counter()-t0:.1f}s",
              flush=True)

    bit = jnp.full((1,), 1, jnp.int32)
    t0 = time.perf_counter()
    k2, v2 = jax.block_until_ready(jax.jit(merge_call)(bit, k2, v2))
    print(f"merge kernel: {time.perf_counter()-t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    f = jax.jit(functools.partial(B.sort_pairs, block_log2=b))
    k = jax.random.PRNGKey(0)
    dest = jax.random.permutation(k, 1 << q).astype(jnp.int32)
    vals = jax.random.normal(k, (1 << q,), jnp.float32)
    sk, sv = jax.block_until_ready(f(dest, vals))
    print(f"full sort_pairs compile+run: {time.perf_counter()-t0:.1f}s",
          flush=True)
    ok = bool(jnp.all(sk == jnp.arange(1 << q, dtype=jnp.int32)))
    print(f"keys sorted ok={ok}", flush=True)

    REPS = 8
    t0 = time.perf_counter()
    for _ in range(REPS):
        sk, sv = jax.block_until_ready(f(dest, vals))
    dt = (time.perf_counter() - t0) / REPS
    print(f"sort_pairs: {dt*1e3:.2f} ms  {dt/(1<<q)*1e9:.2f} ns/elem",
          flush=True)


if __name__ == "__main__":
    main()
