"""Scattered-data RBF interpolation with the radial kernel family.

End-to-end demo of three round-3/4 extensions working together:

* ``MaternKernel`` (models/radial.py) — a non-Gaussian kernel through the
  interpolated-coeffs workflow the reference only documents,
* ``GramMatrix.solve`` — kernel-ridge CG that iterates in the plan's slot
  layout (permutation-free matvecs),
* ``suggest_window_parameters`` — accuracy-targeted window/cutoff choice
  (the es window reaches Gaussian-m=4 accuracy at m=2).

Fits f(x) = sum_s K(||x - s||) z_s to noisy samples of a smooth target on
scattered 2D points, then evaluates on held-out points via one asymmetric
fastsum — no dense matrix anywhere.

Usage: python examples/rbf_interpolation.py [n_train] [n_test]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

import torch_nfft_tpu as tn


def target(p):
    return np.sin(3.0 * p[:, 0]) * np.cos(2.0 * p[:, 1]) + 0.5 * p[:, 0] * p[:, 1]


def main():
    n_train = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    n_test = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    rng = np.random.default_rng(3)

    pts = rng.random((n_train + n_test, 2)).astype(np.float32) * 2 - 1
    y = target(pts).astype(np.float32)
    y_train = y[:n_train] + 0.01 * rng.standard_normal(n_train).astype(np.float32)
    train, test = pts[:n_train], pts[n_train:]

    # Accuracy-targeted window configuration (es m=2 for 1e-4).
    wp = tn.suggest_window_parameters(1e-4)
    print(f"window parameters for tol 1e-4: {wp}", flush=True)

    radius = float(np.abs(pts - pts.mean(0)).max()) * 1.01
    kernel = tn.MaternKernel(
        0.35, nu=1.5, dim=2, bandwidth=64, cutoff=wp["m"],
        max_infinity_norm=radius, window=wp["window"],
    )

    # Fit: (G + reg I) z = y_train, CG in slot layout.
    G = kernel(train)
    t0 = time.time()
    z = G.solve(jnp.asarray(y_train), reg=1e-2, tol=1e-6, maxiter=200)
    z = np.asarray(z)
    print(f"CG solve: {time.time()-t0:.2f}s, |z|_inf={np.abs(z).max():.3f}",
          flush=True)

    # Predict on held-out points: one asymmetric Gram matvec
    # (sources=train, targets=test).
    G_xt = kernel.gram_matrix(train, test)
    pred = np.asarray(G_xt @ jnp.asarray(z))

    rmse = float(np.sqrt(np.mean((pred - y[n_train:]) ** 2)))
    base = float(np.sqrt(np.mean((y[n_train:] - y_train.mean()) ** 2)))
    print(f"held-out RMSE {rmse:.4f} (constant-predictor baseline {base:.4f})",
          flush=True)
    assert rmse < 0.25 * base, "interpolation failed to beat the baseline"
    print("OK", flush=True)


if __name__ == "__main__":
    main()
