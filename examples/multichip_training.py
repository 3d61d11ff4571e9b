"""Sharded kernel-regression training over a device mesh.

Runs the full distributed training step (fastsum forward, MSE loss, grads
through the ICI grid-psum, Adam update) on a (data x points) mesh. Works on
any host — with no real multi-chip hardware it demonstrates on 8 virtual CPU
devices, which is also how the test suite validates the sharding.

    python examples/multichip_training.py
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
# Demo default: 8 virtual CPU devices. On a real multi-chip TPU pod, run with
# MULTICHIP_EXAMPLE_PLATFORM=tpu to use the actual mesh.
os.environ["JAX_PLATFORMS"] = os.environ.get("MULTICHIP_EXAMPLE_PLATFORM", "cpu")
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

import jax

# jax may already be imported (site customizations); force the platform the
# reliable way too
jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
import jax.numpy as jnp
import optax

import torch_nfft_tpu as tn
from torch_nfft_tpu.parallel import make_fastsum_train_step, make_mesh


def main():
    mesh = make_mesh({"data": 2, "points": -1})
    print(f"mesh: {dict(mesh.shape)} over {len(jax.devices())} devices")

    B, n, dim, N, m, C = 4, 512, 2, 16, 4, 1
    rng = np.random.default_rng(0)
    coeffs = tn.gaussian_analytic_coeffs(0.3, dim=dim, N=N)
    pos = (rng.random((B, n, dim)) - 0.5).astype(np.float32) / 4
    # target: values of a smooth function at the points
    y = np.sin(6 * pos[..., :1].sum(-1, keepdims=True)).astype(np.float32)
    w = jnp.zeros((B, n, C), jnp.float32)

    opt = optax.adam(0.02)
    step, shardings = make_fastsum_train_step(
        mesh, coeffs, batch_size=B, n_per_set=n, cutoff=m, optimizer=opt
    )
    w = jax.device_put(w, shardings[0])
    pos_d = jax.device_put(jnp.asarray(pos), shardings[1])
    y_d = jax.device_put(jnp.asarray(y), shardings[2])
    state = opt.init(w)

    first = None
    for i in range(80):
        w, loss, state = step(w, pos_d, y_d, state)
        first = float(loss) if first is None else first
        if i % 10 == 0:
            print(f"step {i:3d}  loss {float(loss):.5f}")
    final = float(loss)
    print(f"final loss {final:.5f} (from {first:.5f})")
    assert final < 0.05 * first
    print("ok")


if __name__ == "__main__":
    main()
