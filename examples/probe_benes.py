"""TPU timing of the Benes permutation apply vs lax.sort_key_val.

Mask CONTENT doesn't affect timing, so random packed words suffice for the
speed question (correctness is pinned by tests/test_benes.py). The engine's
sorts run over S*K ~= 18M elements at the headline; Benes pads to 2^25.

Usage: python examples/probe_benes.py [q] [block_log2]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from torch_nfft_tpu.ops.pallas.benes import apply_benes

    q = int(sys.argv[1]) if len(sys.argv) > 1 else 25
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 18
    sbs = [int(s) for s in os.environ.get("PROBE_SB", "").split(",") if s]
    n = 1 << q
    qc = q - b
    Wc = max(1, -(-(2 * qc) // 32))
    W = -(-(2 * b - 1) // 32)
    REPS = 8

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)

    @jax.jit
    def make():
        vals = jax.random.normal(ks[0], (n,), jnp.float32)
        cw = jax.random.randint(ks[1], (Wc, n), -(1 << 31), (1 << 31) - 1,
                                jnp.int32)
        lw = jax.random.randint(ks[3], (W, n), -(1 << 31), (1 << 31) - 1,
                                jnp.int32)
        dest = jax.random.permutation(ks[2], n).astype(jnp.int32)
        return vals, cw, lw, dest

    t0 = time.perf_counter()
    vals, cw, lw, dest = jax.block_until_ready(make())
    print(f"q={q} b={b} inputs in {time.perf_counter()-t0:.1f}s "
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
        print(f"{name:40s} {dt*1e3:9.2f} ms  {dt/n*1e9:6.2f} ns/elem",
              flush=True)
        return out

    if sbs:
        # superblock scan: how the fused/cross split prices out on hardware
        for sb in sbs:
            for rev in (False, True):
                timed(f"apply_benes b={b} sb={sb} rev={rev}",
                      lambda v, c, l, sb=sb, rev=rev: apply_benes(
                          v, c, l, block_log2=b, reverse=rev,
                          super_log2=sb),
                      vals, cw, lw)
        return
    for mode in ("unrolled", "loop"):
        for rev in (False, True):
            timed(f"apply_benes b={b} {mode} rev={rev}",
                  lambda v, c, l, mode=mode, rev=rev: apply_benes(
                      v, c, l, block_log2=b, mode=mode, reverse=rev),
                  vals, cw, lw)
    timed("lax.sort_key_val",
          lambda k, v: jax.lax.sort_key_val(k, v)[1], dest, vals)


if __name__ == "__main__":
    main()
