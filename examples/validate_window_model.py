"""Validate the es-window error model where it extrapolates.

``ops/window.py:_es_error_model`` was calibrated on a 15-point 2D N=32
dense-oracle sweep; ``suggest_window_parameters`` then applies it at any
(N, dim). This sweep measures 3D rel-L2 at sigma in {1.25, 3.0} and
N in {64, 256} (the extrapolation directions round-3 VERDICT weak #7 called
out) and asserts the model stays an UPPER bound on the measured error.

Measurement: full 3D adjoint of n=4000 safe-box points, compared on 96
random centered frequencies against an exact float64 host oracle (n is
small, so the host sum is exact to ~1e-15 — the same oracle pattern as
/root/reference/test/test_adjoint.py:38-49, sampled instead of dense
because N=256^3 cannot be materialized).

Run on any backend; a TPU run takes ~2 min warm. Results are recorded in
BASELINE.md ("Window model validation").
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from torch_nfft_tpu.ops.planar import nfft_adjoint_planar
from torch_nfft_tpu.ops.window import _es_error_model


def measure(sigma, N, m, dim=3, n=4000, n_freq=96, seed=3):
    rng = np.random.default_rng(seed)
    pos = (rng.random((n, dim), dtype=np.float32) - 0.5)
    pos /= 4 * np.abs(pos).max()
    x = rng.standard_normal((n, 1)).astype(np.float32)
    batch = jnp.zeros((n,), jnp.int32)

    yr, yi = nfft_adjoint_planar(
        jnp.asarray(x), jnp.asarray(pos), batch, batch_size=1,
        N=N, m=m, sigma=sigma, window="es",
    )
    k = rng.integers(-(N // 2), N // 2, size=(n_freq, dim))
    idx = tuple((k[:, d] + N // 2) for d in range(dim))
    got = (np.asarray(yr[(0,) + idx + (0,)])
           + 1j * np.asarray(yi[(0,) + idx + (0,)]))

    ph = 2.0 * np.pi * (k.astype(np.float64) @ pos.astype(np.float64).T)
    ref = np.exp(1j * ph) @ x[:, 0].astype(np.float64)
    return float(np.linalg.norm(got - ref) / np.linalg.norm(ref))


def main():
    rows = []
    ok = True
    for sigma in (1.25, 3.0):
        for N in (64, 256):
            for m in (2, 3, 4):
                model = _es_error_model(m, sigma)
                meas = measure(sigma, N, m)
                bound = meas <= model
                ok &= bound
                rows.append((sigma, N, m, meas, model, bound))
                print(f"sigma={sigma:<4} N={N:<3} m={m}: measured "
                      f"{meas:.2e}  model {model:.2e}  "
                      f"{'OK' if bound else 'VIOLATION'}", flush=True)
    print()
    print("| sigma | N | m | measured rel-L2 | model bound | upper bound? |")
    print("|---|---|---|---|---|---|")
    for sigma, N, m, meas, model, bound in rows:
        print(f"| {sigma} | {N} | {m} | {meas:.2e} | {model:.2e} | "
              f"{'yes' if bound else 'NO'} |")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
