import sys, re
sys.path.insert(0, '/root/repo')
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import numpy as np, jax, jax.numpy as jnp
from jax.sharding import Mesh
from torch_nfft_tpu.ops.binned import build_plan
from torch_nfft_tpu.ops.plan_stack import stack_plans
from torch_nfft_tpu.ops.coeffs import gaussian_analytic_coeffs
from torch_nfft_tpu.parallel.sharded import nfft_fastsum_sharded

n, dim, N, m = 200000, 3, 32, 2
rng = np.random.default_rng(3)
pos = ((rng.random((n, dim)) - 0.5) / 2).astype(np.float32)
x = rng.standard_normal((n, 2)).astype(np.float32)
coeffs = gaussian_analytic_coeffs(0.3, dim, N)
p = build_plan(pos, np.zeros((n,), np.int32), N=N, m=m, batch_size=1, K=256)
plans = stack_plans([p])
mesh = Mesh(np.array(jax.devices()[:1]), ("points",))

orig_jit = jax.jit
class Stop(Exception):
    pass
def spy_jit(f, *a, **k):
    j = orig_jit(f, *a, **k)
    def call(*args, **kw):
        lowered = j.lower(*args, **kw)
        txt = lowered.as_text(debug_info=True)
        cnt = txt.count("43200000")
        print("43200000 count:", cnt, flush=True)
        lines = txt.splitlines()
        shown = 0
        for i, line in enumerate(lines):
            if "43200000" in line and shown < 3:
                print(">>", line.strip()[:300], flush=True)
                shown += 1
        raise Stop()
    return call
jax.jit = spy_jit
try:
    nfft_fastsum_sharded(x, coeffs, pos, cutoff=m, mesh=mesh,
                         source_plans=plans, target_plans=plans)
except Stop:
    print("done (lowering captured, compile skipped)")
finally:
    jax.jit = orig_jit
