"""Microbenchmark: point-order permutation formulations on TPU.

The two per-pair point-order permutations (user->slot on the way in,
slot->user on the way out) are ~250 ms of the 497 ms headline pair at
n=16.7M — issue-bound at ~11 ns/element in every element-indexed
formulation measured so far (gather, unique-index scatter, 1D/2D, bf16).
This probe measures one more formulation: applying the permutation as
``lax.sort_key_val`` by destination key — an O(n log n) pass structure,
but vectorized (TPU sorts run on the VPU), so it can beat an O(n) scalar
issue bound. Keys are static per plan, so the plan can precompute them.

Timing pattern: k dependent applications inside one jit (output feeds the
next input), so tunnel dispatch (~33 ms/call) amortizes away.

Usage: python examples/profile_permute.py [log2_n]
"""

import os
import sys
import time

import numpy as np

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    log2n = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    n = 1 << log2n
    pad = int(0.6 * n)  # slot arrays carry ~1.6x padding at K=1024
    ns = n + pad

    rng = np.random.default_rng(0)
    perm_n = rng.permutation(n).astype(np.int32)     # n -> n permutation
    perm_s = rng.permutation(ns).astype(np.int32)    # ns -> ns (slot-sized)
    x = rng.standard_normal(n).astype(np.float32)
    xs = rng.standard_normal(ns).astype(np.float32)

    d_perm_n = jnp.asarray(perm_n)
    d_perm_s = jnp.asarray(perm_s)
    d_x = jnp.asarray(x)
    d_xs = jnp.asarray(xs)

    REPS = 8

    def timed(name, fn, *args):
        f = jax.jit(fn)
        out = f(*args)
        jax.block_until_ready(out)
        float(jnp.sum(out))  # force on lazy backends
        t0 = time.perf_counter()
        out = f(*args)
        float(jnp.sum(out))
        dt = (time.perf_counter() - t0 - 0.033) / REPS
        print(f"{name:34s} {dt*1e3:8.2f} ms  {dt/n*1e9:6.2f} ns/elem")
        return dt

    def loop(body):
        def fn(v, idx):
            def step(i, v):
                return body(v, idx) + 0.0
            return jax.lax.fori_loop(0, REPS, step, v)
        return fn

    print(f"n={n} ({n/1e6:.1f}M), slot-sized ns={ns} ({ns/1e6:.1f}M), "
          f"REPS={REPS}, backend={jax.default_backend()}")

    # 1. gather (take): y[i] = x[idx[i]]
    timed("take n->n", loop(lambda v, idx: jnp.take(v, idx)), d_x, d_perm_n)

    # 2. unique-index scatter (current engine): y[idx[i]] = x[i]
    timed(
        "unique scatter n->n",
        loop(lambda v, idx: jnp.zeros_like(v).at[idx].set(
            v, unique_indices=True)),
        d_x, d_perm_n,
    )

    # 3. sort_key_val by destination key (keys static per plan)
    timed(
        "sort_key_val n",
        loop(lambda v, idx: jax.lax.sort_key_val(idx, v)[1]),
        d_x, d_perm_n,
    )

    # 4. slot-sized variants (the real sizes in the pair)
    timed("take ns->ns", loop(lambda v, idx: jnp.take(v, idx)), d_xs, d_perm_s)
    timed(
        "unique scatter ns->ns",
        loop(lambda v, idx: jnp.zeros_like(v).at[idx].set(
            v, unique_indices=True)),
        d_xs, d_perm_s,
    )
    timed(
        "sort_key_val ns",
        loop(lambda v, idx: jax.lax.sort_key_val(idx, v)[1]),
        d_xs, d_perm_s,
    )

    # 5. the REAL engine shapes (asymmetric): in = scatter n values into an
    #    ns-sized slot array (issues n); out = today's ns->n drop-scatter
    #    (issues ns) vs the candidate n<-ns gather (issues only n).
    #    Each variant loops REPS times with the source perturbed by a scalar
    #    carried from the previous output, so nothing hoists out of the loop
    #    (the perturbation pass is bandwidth-trivial next to the permutation).
    d_in_idx = jnp.asarray(rng.permutation(ns)[:n].astype(np.int32))  # n -> ns
    drop_np = rng.permutation(ns).astype(np.int32)
    drop_np[drop_np >= n] = n  # ns -> n: n unique targets, rest dropped
    d_drop_idx = jnp.asarray(drop_np)
    d_gather_idx = jnp.asarray(rng.permutation(ns)[:n].astype(np.int32))

    def timed_chain(name, make_out, src):
        def fn(src):
            def step(i, acc):
                out = make_out(src * (1.0 + 0.0 * acc))
                return out[0] * 0.0 + 1.0

            return jax.lax.fori_loop(0, REPS, step, jnp.float32(0.0))

        f = jax.jit(fn)
        float(f(src))  # compile + warm
        t0 = time.perf_counter()
        float(f(src))
        dt = (time.perf_counter() - t0 - 0.033) / REPS
        print(f"{name:34s} {dt*1e3:8.2f} ms  {dt/n*1e9:6.2f} ns/elem")

    timed_chain(
        "scatter n->ns (engine in)",
        lambda v: jnp.zeros((ns,), v.dtype).at[d_in_idx].set(
            v, unique_indices=True),
        d_x,
    )
    timed_chain(
        "drop-scatter ns->n (engine out)",
        lambda v: jnp.zeros((n,), v.dtype).at[d_drop_idx].set(
            v, mode="drop", unique_indices=True),
        d_xs,
    )
    timed_chain(
        "take n<-ns (engine out cand)",
        lambda v: jnp.take(v, d_gather_idx),
        d_xs,
    )

    # 6. LOCAL permutation stages. Any global permutation routes through a
    #    3-stage Clos decomposition (Slepian-Duguid): within-column perm ->
    #    (r, c) transpose -> within-row perm -> transpose -> within-column
    #    perm, with the routing computed once per plan on the host. Each
    #    stage is a LOCAL gather (take_along_axis); if those vectorize
    #    better than flat element gathers, the 3-stage route wins even
    #    paying two transposes. Measure the building blocks:
    for c in (128, 256, 1024):
        r = n // c
        x2 = d_x.reshape(r, c)
        idx_row = jnp.asarray(
            np.argsort(rng.random((r, c)), axis=1).astype(np.int32))
        timed(
            f"take_along rows (r,{c}) axis=1",
            loop(lambda v, idx: jnp.take_along_axis(v, idx, axis=1)),
            x2, idx_row,
        )
        idx_col = jnp.asarray(
            np.argsort(rng.random((r, c)), axis=0).astype(np.int32))
        timed(
            f"take_along cols ({r},c) axis=0",
            loop(lambda v, idx: jnp.take_along_axis(v, idx, axis=0)),
            x2, idx_col,
        )
    r = n // 128
    timed(
        "transpose (r,128)->(128,r)",
        loop(lambda v, idx: v.reshape(r, 128).T.reshape(r, 128) * 1.0),
        d_x.reshape(r, 128), d_perm_n[:128],
    )

    # 7. within-row permutation as a batched ONE-HOT matmul (MXU route):
    #    y[b] = P_b @ x[b] with P_b a c x c one-hot matrix, bf16 operands.
    #    Storage n*c bytes per stage — only viable for small c; measures
    #    whether the MXU formulation escapes the gather issue bound.
    for c in (128,):
        r = n // c
        perm_rows = np.argsort(
            rng.random((r, c)), axis=1).astype(np.int32)  # (r, c)
        # one-hot built ON DEVICE (the bench tunnel ships ~2 MB/s; only the
        # (r, c) int32 index table crosses the link): oh[b, k, j] = 1 iff
        # k == perm_rows[b, j], so contracting x's lane axis with oh's k
        # axis applies the within-row gather on the MXU.
        d_oh = jax.jit(
            lambda p: jax.nn.one_hot(p, c, axis=1, dtype=jnp.bfloat16)
        )(jnp.asarray(perm_rows))
        x2 = d_x.reshape(r, 1, c).astype(jnp.bfloat16)

        def oh_apply(v, oh):
            y = jax.lax.dot_general(
                v, oh,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # (r, 1, c)
            return y.astype(jnp.bfloat16)

        timed(f"one-hot bmm rows (r,{c}) bf16", loop(oh_apply), x2, d_oh)

    # 8. single fused (key, val) sort via 64-bit packing: key in high 32
    #    bits. i64 may not be supported on all TPU runtimes; guarded.
    try:
        def packed(v, idx):
            packed = (idx.astype(jnp.int64) << 32) | jnp.abs(
                v.view(jnp.int32)).astype(jnp.int64)
            s = jnp.sort(packed)
            return (s & 0xFFFFFFFF).astype(jnp.int32).view(jnp.float32)
        timed("packed i64 sort n", loop(packed), d_x, d_perm_n)
    except Exception as e:  # noqa: BLE001
        print(f"packed i64 sort n: unsupported ({type(e).__name__})")


if __name__ == "__main__":
    main()
