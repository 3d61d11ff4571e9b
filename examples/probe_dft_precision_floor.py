"""On-TPU pipeline floor at HIGHEST DFT precision: sigma=3 (window
truncation ~1e-9) isolates the matmul rounding floor. A/Bs
TORCH_NFFT_TPU_DFT_PRECISION high vs highest at 2D/3D."""
import os, sys, time
sys.path.insert(0, '/root/repo')
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
from torch_nfft_tpu.ops.planar import nfft_adjoint_planar

def measure(sigma, N, m, dim, n=4000, n_freq=96, seed=3):
    rng = np.random.default_rng(seed)
    pos = ((rng.random((n, dim)) - 0.5) / 2).astype(np.float32)
    x = rng.standard_normal((n, 1)).astype(np.float32)
    t0 = time.time()
    yr, yi = nfft_adjoint_planar(jnp.asarray(x), jnp.asarray(pos),
                                 jnp.zeros((n,), jnp.int32), batch_size=1,
                                 N=N, m=m, sigma=sigma, window="es")
    k = rng.integers(-(N // 2), N // 2, size=(n_freq, dim))
    idx = tuple((k[:, d] + N // 2) for d in range(dim))
    got = np.asarray(yr[(0,) + idx + (0,)]).astype(np.float64) \
        + 1j * np.asarray(yi[(0,) + idx + (0,)])
    ph = (k.astype(np.float64) @ pos.astype(np.float64).T)
    ref = np.exp(2j * np.pi * ph) @ x[:, 0].astype(np.float64)
    return float(np.linalg.norm(got - ref) / np.linalg.norm(ref)), time.time() - t0

for prec in ("high", "highest"):
    os.environ["TORCH_NFFT_TPU_DFT_PRECISION"] = prec
    jax.clear_caches()
    for dim, N in ((2, 64), (3, 64), (3, 128)):
        rel, dt = measure(3.0, N, 4, dim)
        print(f"prec={prec:7s} {dim}D N={N:4d} sigma=3 m=4: rel-L2 "
              f"{rel:.2e}  ({dt:.1f}s incl compile)", flush=True)
