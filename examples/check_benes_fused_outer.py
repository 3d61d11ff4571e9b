"""Device correctness check of the fused outer Benes pass (_outer_fused).

Routes a random permutation at n=2^22 (native C++ router, seconds) and
applies it on the real TPU with super_log2 splits that leave 2 and 3
outer stages per side — exercising the fused cross-block kernel under
Mosaic, which interpret-mode tests cannot. Compares forward against the
permutation and reverse against the identity round trip.
"""
import os
import sys

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

rng = np.random.default_rng(0)
q = 22
n = 1 << q
perm = rng.permutation(n).astype(np.int32)
tables = B.route_tables(perm, block_log2=18)
x = rng.standard_normal(n).astype(np.float32)
ref = np.empty_like(x)
ref[perm] = x

for sb in (19, 20, 21):
    out = B.apply_benes(jnp.asarray(x), tables.cross_words,
                        tables.local_words, block_log2=18, super_log2=sb)
    got = np.asarray(out)
    fwd_ok = np.array_equal(got, ref)
    back = B.apply_benes(out, tables.cross_words, tables.local_words,
                         block_log2=18, super_log2=sb, reverse=True)
    rev_ok = np.array_equal(np.asarray(back), x)
    print(f"sb={sb} (outer/side={q - sb}): forward "
          f"{'OK' if fwd_ok else 'MISMATCH'}, reverse "
          f"{'OK' if rev_ok else 'MISMATCH'}", flush=True)
    if not (fwd_ok and rev_ok):
        sys.exit(1)
print("fused outer pass verified on device")
