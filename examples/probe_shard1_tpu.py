"""1-device-mesh sharded FASTSUM on the REAL TPU with a binned plan:
exercises compiled Mosaic pallas_call inside shard_map (vma annotations)
on the complex-free planar branch — the path the CPU mesh can only run
in interpret mode."""
import sys, time
sys.path.insert(0, '/root/repo')
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
from jax.sharding import Mesh
from torch_nfft_tpu.ops.binned import build_plan, _use_pallas
from torch_nfft_tpu.ops.plan_stack import stack_plans, pad_plan_rows
from torch_nfft_tpu.parallel.sharded import nfft_fastsum_sharded
from torch_nfft_tpu.ops.planar import nfft_fastsum_real
from torch_nfft_tpu.ops.coeffs import gaussian_analytic_coeffs

n, dim, N, m = 200000, 3, 32, 2
rng = np.random.default_rng(3)
pos = ((rng.random((n, dim)) - 0.5) / 2).astype(np.float32)
x = rng.standard_normal((n, 2)).astype(np.float32)
batch = np.zeros((n,), np.int32)
coeffs = gaussian_analytic_coeffs(0.3, dim, N)
p = build_plan(pos, batch, N=N, m=m, batch_size=1, K=256)
assert _use_pallas(p, 2, jnp.float32), "pallas must engage on TPU for this plan"
plans = stack_plans([p])
mesh = Mesh(np.array(jax.devices()[:1]), ("points",))
t0 = time.time()
y = nfft_fastsum_sharded(x, coeffs, pos, cutoff=m, mesh=mesh, source_plans=plans, target_plans=plans)
print("sharded fastsum ok", y.shape, "in", round(time.time()-t0,1), "s", flush=True)
ref = nfft_fastsum_real(jnp.asarray(x), coeffs, jnp.asarray(pos), jnp.asarray(pos),
                        jnp.zeros((n,), jnp.int32), jnp.zeros((n,), jnp.int32),
                        batch_size=1, N=N, m=m)
rel = float(np.linalg.norm(np.asarray(y) - np.asarray(ref)) / np.linalg.norm(np.asarray(ref)))
print("rel vs planar fastsum:", rel, flush=True)
assert rel < 1e-4
print("PASS: compiled pallas under shard_map on TPU", flush=True)
