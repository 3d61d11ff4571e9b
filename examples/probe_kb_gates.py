"""On-TPU accuracy gates for the kb window vs es across sigma: the dense
2D N=16 / 3D N=32 oracles (bench.py's gate pattern) decide whether kb at
m=2 clears the 1.2e-4 reference-parity bar at sigma <= 1.5 (round-4
VERDICT task 8). Usage: python examples/probe_kb_gates.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from torch_nfft_tpu.ops.planar import nfft_adjoint_planar


def gate(dim, N, window, sigma, m, n=400):
    rng = np.random.default_rng(0)
    pos = (rng.random((n, dim), dtype=np.float32) - 0.5)
    pos /= 4 * np.abs(pos).max()
    x = rng.standard_normal((n, 2)).astype(np.float32)
    batch = np.zeros((n,), np.int32)
    yr, yi = nfft_adjoint_planar(
        jnp.asarray(x), jnp.asarray(pos), jnp.asarray(batch), batch_size=1,
        N=N, m=m, sigma=sigma, window=window,
    )
    got = np.asarray(yr)[0] + 1j * np.asarray(yi)[0]
    k = np.arange(N) - N // 2
    grids = np.meshgrid(*([k] * dim), indexing="ij")
    phase = np.zeros((N**dim, n))
    for d in range(dim):
        phase = phase + grids[d].reshape(-1, 1) * pos[:, d]
    ref = (np.exp(2j * np.pi * phase) @ x.astype(np.complex128))
    ref = ref.reshape(got.shape)
    return float(np.linalg.norm(got - ref) / np.linalg.norm(ref))


def main():
    for window in ("es", "kb"):
        for sigma in (1.625, 1.5, 1.375):
            for m in (2, 3):
                g2 = gate(2, 16, window, sigma, m)
                g3 = gate(3, 32, window, sigma, m)
                bar = "PASS" if g3 < 1.2e-4 else "fail"
                print(f"{window:3s} sigma={sigma:6} m={m}: 2D N=16 "
                      f"{g2:.2e}  3D N=32 {g3:.2e}  [{bar}]", flush=True)


if __name__ == "__main__":
    main()
