"""Microbenchmark: fused Pallas bitonic sort_pairs vs XLA alternatives.

The permutation-apply candidates at n = 2^24 (the headline point count):
XLA unique-index scatter measures ~113 ms (~6.8 ns/elem) and is the round-3
engine's formulation; this probe times the self-routing bitonic sorter
(ops/pallas/bitonic.py) and jax.lax.sort_key_val on the same inputs.

Usage: python examples/probe_bitonic.py [log2_n] [block_log2 ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)


def main():
    import jax
    import jax.numpy as jnp
    from torch_nfft_tpu.ops.pallas.bitonic import sort_pairs

    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    args = [int(a) for a in sys.argv[1:]]
    q = args[0] if args else 24
    blocks = args[1:] or [18]
    Q = 1 << q
    REPS = 8

    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)

    @jax.jit
    def make_inputs():
        dest = jax.random.permutation(k1, Q).astype(jnp.int32)
        vals = jax.random.normal(k2, (Q,), jnp.float32)
        return dest, vals

    t0 = time.perf_counter()
    dest, vals = jax.block_until_ready(make_inputs())
    print(f"Q=2^{q} inputs on device in {time.perf_counter()-t0:.1f}s "
          f"backend={jax.default_backend()}", flush=True)

    def timed(name, fn, *a):
        f = jax.jit(fn)
        t0 = time.perf_counter()
        out = jax.block_until_ready(f(*a))
        print(f"  [compile+warm {time.perf_counter()-t0:.1f}s]", flush=True)
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = jax.block_until_ready(f(*a))
        dt = (time.perf_counter() - t0) / REPS
        print(f"{name:40s} {dt*1e3:9.2f} ms  {dt/Q*1e9:7.2f} ns/elem",
              flush=True)
        return out

    # correctness first (once): sorted keys must be arange
    for b in blocks:
        sk, sv = jax.block_until_ready(
            sort_pairs(dest, vals, block_log2=b))
        ok = bool(jnp.all(sk == jnp.arange(Q, dtype=jnp.int32)))
        ref = jnp.zeros((Q,), jnp.float32).at[dest].set(
            vals, unique_indices=True)
        okv = bool(jnp.all(sv == ref))
        print(f"b={b}: keys ok={ok} vals ok={okv}", flush=True)

    timed("scatter .at[dest].set (today)",
          lambda v, i: jnp.zeros_like(v).at[i].set(v, unique_indices=True),
          vals, dest)
    for b in blocks:
        timed(f"bitonic sort_pairs b={b}",
              lambda kk, vv, b=b: sort_pairs(kk, vv, block_log2=b)[1],
              dest, vals)
    timed("lax.sort_key_val",
          lambda kk, vv: jax.lax.sort_key_val(kk, vv)[1], dest, vals)


if __name__ == "__main__":
    main()
