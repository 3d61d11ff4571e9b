"""Marginal (in-jit) cost of apply_benes / expand_rows / compact_rows at
headline scale — repetition slopes cancel the ~15-30 ms per-call tunnel
dispatch that contaminates single-call timings on axon.

Each measurement jits k chained applications and reports
(t_k - t_1) / (k - 1). Run solo on the TPU, after bench.py (warm cache).
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
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from torch_nfft_tpu.ops.pallas import benes as B
from torch_nfft_tpu.ops.pallas.ragged import compact_rows, expand_rows


def timed(fn, *a, iters=3):
    out = jax.tree_util.tree_leaves(fn(*a))[0]
    float(jnp.sum(out[..., :1].astype(jnp.float32)))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = jax.tree_util.tree_leaves(fn(*a))[0]
        float(jnp.sum(out[..., :1].astype(jnp.float32)))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def slope(make_f, x, k=5):
    f1 = jax.jit(lambda x: make_f(x))
    def chain(x):
        for _ in range(k):
            x = make_f(x)
        return x
    fk = jax.jit(chain)
    t1, tk = timed(f1, x), timed(fk, x)
    return (tk - t1) / (k - 1), t1


def tables(q):
    rng = np.random.default_rng(q)
    bits = rng.integers(0, 1 << 32, size=(2 * q - 1, (1 << q) // 64),
                        dtype=np.uint64).astype(np.uint32)
    return B.expand_pair_bits(jnp.asarray(bits.view(np.int32)), q, 18)


rng = np.random.default_rng(0)
for q in (24, 25):
    cw, lw = tables(q)
    v = jnp.asarray(rng.standard_normal(1 << q).astype(np.float32))
    for sb, chunk in ((21, 18), (21, 41), (19, 18), (22, 18)):
        B.LOCAL_CHUNK = chunk
        try:
            s, t1 = slope(lambda x: B._apply_benes_super(
                x, cw, lw, q=q, b=18, sb=sb, reverse=False,
                interpret=False), v)
            print(f"apply 2^{q} sb={sb} chunk={chunk}: marginal {s*1e3:.1f} "
                  f"ms (single call {t1*1e3:.1f})", flush=True)
        except Exception as e:
            print(f"apply 2^{q} sb={sb} chunk={chunk}: FAIL "
                  f"{str(e)[:100]}", flush=True)
    B.LOCAL_CHUNK = 18
    del cw, lw, v

# ragged passes at the headline row layout (expand∘compact chained so the
# shapes round-trip inside one jit)
S, K = 35191, 512
n = 1 << 24
w = rng.random(S)
cnt = np.maximum(1, np.minimum(K, (w / w.sum() * n).astype(np.int64)))
diff = n - int(cnt.sum())
i = 0
while diff != 0:
    step = 1 if diff > 0 else -1
    if 1 <= cnt[i] + step <= K:
        cnt[i] += step
        diff -= step
    i = (i + 1) % S
cnt = cnt.astype(np.int32)
rs = jnp.asarray(np.concatenate([[0], np.cumsum(cnt)[:-1]]).astype(np.int32))
cnt_d = jnp.asarray(cnt)
NB = -(-n // K)
stream = jnp.asarray(rng.standard_normal(NB * K).astype(np.float32))

for R in (8, 16, 32):
    def pair(x, R=R):
        p = expand_rows(x, rs, cnt_d, K=K, rows_per_step=R)
        return compact_rows(p, rs, cnt_d, n, rows_per_step=R)
    s, t1 = slope(pair, stream)
    print(f"expand+compact R={R}: marginal {s*1e3:.1f} ms "
          f"(single call {t1*1e3:.1f})", flush=True)
