"""Time apply_benes (2^24 vs 2^25) and the ragged expand/compact passes at
headline scale on the real TPU — decide whether compact-space routing pays.
Run AFTER bench.py (warm compile cache, no other TPU client)."""
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

from torch_nfft_tpu.ops.pallas.benes import (
    BenesTables, apply_benes, expand_pair_bits, stage_distances,
)
from torch_nfft_tpu.ops.pallas.ragged import (
    compact_rows, expand_rows, row_start_from_counts,
)


def timeit(f, *a, iters=3, **kw):
    out = f(*a, **kw)
    out = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(out[..., :1].astype(jnp.float32)))  # force
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = f(*a, **kw)
        out = jax.tree_util.tree_leaves(out)[0]
        float(jnp.sum(out[..., :1].astype(jnp.float32)))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def rand_tables(q):
    """Random-bit tables (timing only — content doesn't affect cost)."""
    n = 1 << q
    rng = np.random.default_rng(q)
    bits = rng.integers(0, 1 << 32, size=(2 * q - 1, n // 64),
                        dtype=np.uint64).astype(np.uint32)
    cw, lw = expand_pair_bits(jnp.asarray(bits.view(np.int32)), q,
                              min(q, 18))
    return BenesTables(cw, lw, n, min(q, 18))


for q in (24, 25):
    bt = rand_tables(q)
    v = jnp.asarray(np.random.default_rng(0)
                    .standard_normal(1 << q).astype(np.float32))
    import functools as _ft
    fwd = jax.jit(_ft.partial(apply_benes, block_log2=bt.b))
    t = timeit(fwd, v, bt.cross_words, bt.local_words)
    print(f"apply_benes 2^{q}: {t*1e3:.1f} ms", flush=True)

# headline-like row layout: S=35191 rows, K=512, counts ~ Zipf-ish
S, K = 35191, 512
n = 1 << 24
rng = np.random.default_rng(1)
w = rng.random(S)
cnt = np.maximum(1, np.minimum(K, (w / w.sum() * n).astype(np.int64)))
# fix the total to exactly n by adjusting from the largest rows
diff = n - int(cnt.sum())
i = 0
while diff != 0:
    step = 1 if diff > 0 else -1
    if 1 <= cnt[i] + step <= K:
        cnt[i] += step
        diff -= step
    i = (i + 1) % S
cnt = cnt.astype(np.int32)
rs = np.concatenate([[0], np.cumsum(cnt)[:-1]]).astype(np.int32)
rs_d, cnt_d = jnp.asarray(rs), jnp.asarray(cnt)

stream = jnp.asarray(rng.standard_normal(n).astype(np.float32))
padded = jnp.asarray(rng.standard_normal((S, K)).astype(np.float32))

for R in (8, 16, 32):
    ex = jax.jit(lambda s, rs, c, R=R: expand_rows(
        s, rs, c, K=K, rows_per_step=R))
    t = timeit(ex, stream, rs_d, cnt_d)
    print(f"expand_rows R={R}: {t*1e3:.1f} ms", flush=True)
    co = jax.jit(lambda p, rs, c, R=R: compact_rows(
        p, rs, c, n, rows_per_step=R))
    t = timeit(co, padded, rs_d, cnt_d)
    print(f"compact_rows R={R}: {t*1e3:.1f} ms", flush=True)
