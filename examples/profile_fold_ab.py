"""Single-process A/B of 3D fold structures on the TPU.

Cross-process timings on the tunnel drift by 20-30%, so this times every
variant in ONE process on the same buffers:
  A: axis-0-major linearization, 6-pass structure (pre-reorder)
  B: (B, A1, A2, A0) linearization, 4-pass structure (reorder)
each with two _pair_fold formulations:
  1: slice + at[...].add of the rolled small tail
  2: pad tail to T + roll the full array + add (pure elementwise)

Usage: python examples/profile_fold_ab.py [batched|headline]
"""

import os
import sys
import time

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


def pf_sliceadd(a, T, H, M, E):
    P, nb, _, Z, W = a.shape
    body = jax.lax.slice_in_dim(a, 0, T, axis=2)
    tail = jax.lax.slice_in_dim(a, T, H, axis=2)
    body = body.at[:, :, :E].add(jnp.roll(tail, 1, axis=1))
    return body.reshape(P, M, Z, W)


def pf_padroll(a, T, H, M, E):
    P, nb, _, Z, W = a.shape
    body = jax.lax.slice_in_dim(a, 0, T, axis=2).reshape(P, M, Z, W)
    tail = jax.lax.slice_in_dim(a, T, H, axis=2)
    tail = jnp.pad(tail, ((0, 0), (0, 0), (0, T - E), (0, 0), (0, 0)))
    return body + jnp.roll(tail.reshape(P, M, Z, W), T, axis=1)


def pf_concat(a, T, H, M, E):
    # pure elementwise + concat: no scatter anywhere
    P, nb, _, Z, W = a.shape
    body_e = jax.lax.slice_in_dim(a, 0, E, axis=2)
    body_rest = jax.lax.slice_in_dim(a, E, T, axis=2)
    tail = jax.lax.slice_in_dim(a, T, H, axis=2)
    merged = body_e + jnp.roll(tail, 1, axis=1)
    return jnp.concatenate([merged, body_rest], axis=2).reshape(P, M, Z, W)


def fold_axis_major(t, pf, B, A, T, H, L, E, C):
    a = t.reshape(B, A, A * A * C, H, H * H)
    a = a.transpose(0, 1, 3, 2, 4)
    g = pf(a, T, H, L, E)
    g = g.transpose(0, 2, 3, 1)
    a = g.reshape(B, A, A * C, H, H * L)
    a = a.transpose(0, 1, 3, 2, 4)
    g = pf(a, T, H, L, E)
    a = g.reshape(B * L, A, C, H, L)
    a = a.transpose(0, 1, 3, 2, 4)
    g = pf(a, T, H, L, E)
    return g.reshape(B, L, L, C, L)


def fold_dft_lin(t, pf, B, A, T, H, L, E, C):
    a = t.reshape(B * A * A, A, C, H, H * H)
    a = a.transpose(0, 1, 3, 2, 4)
    g = pf(a, T, H, L, E)
    a = g.reshape(B, A, A, L, C, H, H)
    a = a.transpose(0, 1, 5, 2, 6, 4, 3)
    a = a.reshape(B, A, H, A, H * C * L)
    g = pf(a, T, H, L, E)
    a = g.reshape(B * L, A, H, C, L)
    g = pf(a, T, H, L, E)
    return g.reshape(B, L, L, C, L)


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "batched"
    if mode == "batched":
        B, A, T, H, C = 8, 10, 32, 41, 1
    else:
        B, A, T, H, C = 1, 18, 16, 25, 1
    E, L = H - T, A * T
    rng = np.random.default_rng(5)
    NT = B * A**3
    tiles = jnp.asarray(rng.standard_normal((NT, C * H**3)).astype(np.float32))
    print(f"{mode}: NT={NT} H={H} T={T} L={L} "
          f"tiles={tiles.size*4/2**30:.2f} GiB", flush=True)

    variants = {
        "A1 axis-major + slice-add": lambda t: fold_axis_major(t, pf_sliceadd, B, A, T, H, L, E, C),
        "A3 axis-major + concat   ": lambda t: fold_axis_major(t, pf_concat, B, A, T, H, L, E, C),
        "B1 dft-lin    + slice-add": lambda t: fold_dft_lin(t, pf_sliceadd, B, A, T, H, L, E, C),
        "B3 dft-lin    + concat   ": lambda t: fold_dft_lin(t, pf_concat, B, A, T, H, L, E, C),
        "Z0 copy baseline         ": lambda t: t + 1.0,
        "Z1 transpose baseline    ": lambda t: t.reshape(B, A, A * A * C, H, H * H).transpose(0, 1, 3, 2, 4),
        "Z2 one pair_fold (slice) ": lambda t: pf_sliceadd(
            t.reshape(B * A * A, A, C, H, H * H).transpose(0, 1, 3, 2, 4), T, H, L, E),
        "Z3 one pair_fold (concat)": lambda t: pf_concat(
            t.reshape(B * A * A, A, C, H, H * H).transpose(0, 1, 3, 2, 4), T, H, L, E),
    }
    # two interleaved rounds so tunnel drift shows up as round-to-round delta
    jfns = {k: jax.jit(lambda t, f=f: jnp.sum(f(t))) for k, f in variants.items()}
    for k, jf in jfns.items():
        float(jf(tiles))  # compile
    for rnd in range(2):
        for k, jf in jfns.items():
            ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                float(jf(tiles))
                ts.append(time.perf_counter() - t0)
            print(f"  round{rnd} {k}: {np.median(ts)*1e3:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
