"""Sweep apply_benes execution parameters at 2^24 on the real TPU to locate
the fixed cost (measured ~36 ms at both 2^24 and 2^25 — NOT payload-bound):
super_log2 (number of cross-block HBM passes), LOCAL_CHUNK (number of fused
VMEM kernels), and mode="loop". Run after bench.py (warm cache, solo TPU)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from torch_nfft_tpu.ops.pallas import benes as B


def timeit(f, *a, iters=3):
    out = jax.tree_util.tree_leaves(f(*a))[0]
    float(jnp.sum(out[..., :1].astype(jnp.float32)))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = jax.tree_util.tree_leaves(f(*a))[0]
        float(jnp.sum(out[..., :1].astype(jnp.float32)))
        ts.append(time.perf_counter() - t0)
    return min(ts)


q = int(os.environ.get("PROBE_Q", 24))
n = 1 << q
rng = np.random.default_rng(q)
bits = rng.integers(0, 1 << 32, size=(2 * q - 1, n // 64),
                    dtype=np.uint64).astype(np.uint32)
cw, lw = B.expand_pair_bits(jnp.asarray(bits.view(np.int32)), q, 18)
v = jnp.asarray(rng.standard_normal(n).astype(np.float32))

for chunk in (18, 41):
    B.LOCAL_CHUNK = chunk
    for sb in (18, 21, 22):
        fn = jax.jit(lambda v, cw, lw, sb=sb: B._apply_benes_super(
            v, cw, lw, q=q, b=18, sb=max(18, min(q, sb)), reverse=False,
            interpret=False))
        try:
            t = timeit(fn, v, cw, lw)
            print(f"chunk={chunk} sb={sb}: {t*1e3:.1f} ms", flush=True)
        except Exception as e:
            print(f"chunk={chunk} sb={sb}: FAIL {type(e).__name__} "
                  f"{str(e)[:120]}", flush=True)

fn = jax.jit(lambda v, cw, lw: B.apply_benes(v, cw, lw, mode="loop"))
try:
    t = timeit(fn, v, cw, lw)
    print(f"mode=loop: {t*1e3:.1f} ms", flush=True)
except Exception as e:
    print(f"mode=loop: FAIL {str(e)[:120]}", flush=True)

# single cross pass in isolation (distance 2^23): fixed-cost floor of one
# full-array pallas pass
v2 = v.reshape(-1, 128)
w3 = cw.reshape(cw.shape[0], -1, 128)
fn = jax.jit(lambda v2, w3: B._cross_stage_pallas(
    v2, w3, 0, 0, (1 << 23) // (1 << 21), (1 << 21) // 128, False))
t = timeit(fn, v2, w3)
print(f"single cross pass (sb=21 blocks): {t*1e3:.2f} ms", flush=True)
