"""Learn a kernel's spectral coefficients from operator observations.

The reference hard-blocks this workload: its fastsum asserts that the
coefficient tensor requires no gradient (reference nfft.py:66-73). Here the
transforms are plain differentiable JAX compositions, so the spectral
coefficients of the kernel are a trainable parameter like any other — this
example recovers an unknown (Matern) kernel purely from input/output pairs
of its Gram operator, i.e. it learns `K` such that `y = K_coeffs @ x`
matches observed matvecs, without ever materializing an O(n^2) matrix.

Parameterization: coeffs = softplus(theta) on the centered spectral grid —
positivity keeps the learned Gram operator positive semidefinite (a
trigonometric kernel with nonnegative coefficients is PSD by construction).

Run on any backend:  python examples/learn_kernel.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import torch_nfft_tpu as tn


def main():
    rng = np.random.default_rng(3)
    n, dim, N, m = 2000, 2, 16, 4
    n_probe = 16  # observed matvec pairs (columns)

    pos = (rng.random((n, dim), dtype=np.float32) - 0.5)
    pos /= 4 * np.abs(pos).max()  # NFFT safe box
    pos = jnp.asarray(pos)

    # --- ground truth: a Matern(nu=1.5) kernel the learner never sees ----
    true_kernel = tn.MaternKernel(
        sigma=0.6, nu=1.5, dim=dim, bandwidth=N, cutoff=m,
        shift_by_center=False, max_infinity_norm=0.25,
    )
    true_coeffs = true_kernel.coeffs

    x_probe = jnp.asarray(rng.standard_normal((n, n_probe)).astype(np.float32))
    y_probe = tn.nfft_fastsum(
        x_probe, true_coeffs, true_kernel.factor * pos, cutoff=m
    )

    # --- learnable spectral filter --------------------------------------
    def coeffs_of(theta):
        return jax.nn.softplus(theta)

    def loss(theta):
        y = tn.nfft_fastsum(
            x_probe, coeffs_of(theta), true_kernel.factor * pos, cutoff=m
        )
        return jnp.mean((y - y_probe) ** 2)

    # init: a broad Gaussian guess (wrong family, wrong width)
    init = tn.gaussian_analytic_coeffs(0.05, dim=dim, N=N)
    theta = jnp.log(jnp.expm1(jnp.maximum(init, 1e-6)))  # softplus^-1

    value_and_grad = jax.jit(jax.value_and_grad(loss))

    try:
        import optax

        opt = optax.adam(0.05)
        state = opt.init(theta)

        @jax.jit
        def step(theta, state):
            val, g = jax.value_and_grad(loss)(theta)
            updates, state = opt.update(g, state)
            return optax.apply_updates(theta, updates), state, val

        for it in range(200):
            theta, state, val = step(theta, state)
            if it % 40 == 0:
                print(f"iter {it:3d}  mse {float(val):.3e}")
    except ImportError:  # plain gradient descent fallback
        lr = 0.05
        for it in range(400):
            val, g = value_and_grad(theta)
            theta = theta - lr * g
            if it % 80 == 0:
                print(f"iter {it:3d}  mse {float(val):.3e}")

    learned = coeffs_of(theta)

    # --- evaluation ------------------------------------------------------
    # held-out matvecs vs the true operator
    x_test = jnp.asarray(rng.standard_normal((n, 8)).astype(np.float32))
    y_true = tn.nfft_fastsum(x_test, true_coeffs, true_kernel.factor * pos, cutoff=m)
    y_learn = tn.nfft_fastsum(x_test, learned, true_kernel.factor * pos, cutoff=m)
    op_err = float(jnp.linalg.norm(y_learn - y_true) / jnp.linalg.norm(y_true))

    coeff_err = float(
        jnp.linalg.norm(learned - true_coeffs) / jnp.linalg.norm(true_coeffs)
    )
    print(f"held-out operator rel-L2 error: {op_err:.3e}")
    print(f"spectral coefficient rel-L2 error: {coeff_err:.3e}")
    assert op_err < 3e-2, "learned operator should match held-out matvecs"
    return 0


if __name__ == "__main__":
    sys.exit(main())
