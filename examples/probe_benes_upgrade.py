"""Break down plan.with_benes_tables() wall time at the headline config.

Phases: (1) rank-permutation pull (fill_keys[:n] device->host through the
tunnel), (2) host perm construction, (3) sequential C++ routing,
(4) packed-bit upload + device mask expansion. Run AFTER bench.py so the
compile cache is warm (the expansion kernels compile once per shape).
"""
import os
import sys
import time

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

from torch_nfft_tpu.ops.binned import build_plan_device
from torch_nfft_tpu.ops.pallas import benes as B

n = int(os.environ.get("PROBE_N", 1 << 24))
N, dim, m = 256, 3, 2

rng = np.random.default_rng(7)
pos = jnp.asarray((rng.random((n, dim), dtype=np.float32) - 0.5) / 2.0)

t0 = time.perf_counter()
plan = build_plan_device(pos, None, N=N, m=m, batch_size=1, window="es")
float(jnp.sum(plan.row_count))
print(f"plan build: {time.perf_counter()-t0:.1f}s", flush=True)

S, K = plan.slot_pt.shape
t0 = time.perf_counter()
slot_head = np.asarray(plan.fill_keys[: plan.n], dtype=np.int64)
print(f"fill_keys[:n] pull ({plan.n*4/1e6:.0f} MB): "
      f"{time.perf_counter()-t0:.1f}s", flush=True)

t0 = time.perf_counter()
row_count = np.asarray(plan.row_count, dtype=np.int64)
q = max(6, int(max(plan.n, K) - 1).bit_length())
npad = 1 << q
row_start = np.concatenate([np.zeros(1, np.int64), np.cumsum(row_count)[:-1]])
perm_ext = np.empty(npad, dtype=np.int32)
perm_ext[: plan.n] = (row_start[slot_head // K] + slot_head % K).astype(np.int32)
perm_ext[plan.n:] = np.arange(plan.n, npad, dtype=np.int32)
print(f"host perm construction: {time.perf_counter()-t0:.1f}s", flush=True)

t0 = time.perf_counter()
from torch_nfft_tpu.native import benes_route
bits = benes_route(perm_ext)
print(f"C++ routing (2^{q}): {time.perf_counter()-t0:.1f}s", flush=True)

t0 = time.perf_counter()
cw, lw = B.expand_pair_bits(jnp.asarray(bits.view(np.int32)), q,
                            min(q, B.DEFAULT_BLOCK_LOG2))
for w in jax.tree_util.tree_leaves((cw, lw)):
    jax.block_until_ready(w)
float(jnp.sum(jax.tree_util.tree_leaves(lw)[0][:8].astype(jnp.float32)))
print(f"bit upload + device expansion ({bits.nbytes/1e6:.0f} MB): "
      f"{time.perf_counter()-t0:.1f}s", flush=True)
