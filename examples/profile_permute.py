"""Microbenchmark: point-order permutation formulations on TPU.

The two per-pair point-order permutations (user->slot on the way in,
slot->user on the way out) are ~250 ms of the 497 ms headline pair at
n=16.7M — issue-bound at ~11 ns/element in every element-indexed
formulation measured so far (gather, unique-index scatter, 1D/2D, bf16).
This probe measures the remaining candidate formulations. Everything is
generated ON DEVICE (the bench tunnel ships ~1.6 MB/s — host-built index
tables of hundreds of MB never finish transferring).

Timing pattern: REPS dependent applications inside one jit (output feeds
the next input through a scalar perturbation so nothing hoists), so tunnel
dispatch (~33 ms/call) amortizes away.

Usage: python examples/profile_permute.py [group ...] [log2_n]
  groups: base engine sort local onehot  (default: base engine)
"""

import os
import sys
import time

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

    args = sys.argv[1:]
    log2n = 24
    groups = []
    for a in args:
        if a.isdigit():
            log2n = int(a)
        else:
            groups.append(a)
    if not groups:
        groups = ["base", "engine"]

    n = 1 << log2n
    pad = int(0.6 * n)  # slot arrays carry ~1.6x padding at K=1024
    ns = n + pad
    REPS = 8

    def p(msg):
        print(msg, flush=True)

    p(f"n={n} ({n/1e6:.1f}M), slot ns={ns} ({ns/1e6:.1f}M), REPS={REPS}, "
      f"backend={jax.default_backend()}, groups={groups}")

    # --- device-side inputs: only PRNG keys cross the link -----------------
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)

    @jax.jit
    def make_inputs():
        perm_n = jax.random.permutation(ks[0], n).astype(jnp.int32)
        perm_s = jax.random.permutation(ks[1], ns).astype(jnp.int32)
        x = jax.random.normal(ks[2], (n,), jnp.float32)
        xs = jax.random.normal(ks[3], (ns,), jnp.float32)
        return perm_n, perm_s, x, xs

    t0 = time.perf_counter()
    d_perm_n, d_perm_s, d_x, d_xs = jax.block_until_ready(make_inputs())
    p(f"inputs built on device in {time.perf_counter()-t0:.1f}s")

    def timed(name, fn, *args):
        f = jax.jit(fn)
        t0 = time.perf_counter()
        out = f(*args)
        float(jnp.sum(out))  # force (block_until_ready lies on axon)
        p(f"  [compile+warm {time.perf_counter()-t0:.1f}s]")
        t0 = time.perf_counter()
        out = f(*args)
        float(jnp.sum(out))
        dt = (time.perf_counter() - t0 - 0.033) / REPS
        p(f"{name:34s} {dt*1e3:8.2f} ms  {dt/n*1e9:6.2f} ns/elem")
        return dt

    def loop(body):
        # REPS dependent applications: input perturbed by a scalar carried
        # from the previous output so the loop body cannot hoist.
        def fn(v, idx):
            def step(i, carry):
                acc, v = carry
                out = body(v * (1.0 + 0.0 * acc.astype(v.dtype)), idx)
                return out.reshape(-1)[0].astype(jnp.float32) * 0.0, out
            return jax.lax.fori_loop(
                0, REPS, step, (jnp.float32(0.0), v))[1]
        return fn

    if "base" in groups:
        p("-- base: square formulations --")
        timed("take n->n", loop(lambda v, i: jnp.take(v, i)), d_x, d_perm_n)
        timed(
            "unique scatter n->n",
            loop(lambda v, i: jnp.zeros_like(v).at[i].set(
                v, unique_indices=True)),
            d_x, d_perm_n,
        )
        timed("take ns->ns", loop(lambda v, i: jnp.take(v, i)),
              d_xs, d_perm_s)

    if "engine" in groups:
        p("-- engine: real asymmetric shapes --")
        # in = scatter n values into an ns slot array (issues n);
        # out = today's ns->n drop-scatter (issues ns) vs n<-ns gather
        # (issues n).
        d_in_idx = jax.random.permutation(ks[4], ns)[:n].astype(jnp.int32)
        d_gather_idx = jax.random.permutation(ks[5], ns)[:n].astype(jnp.int32)

        @jax.jit
        def make_drop():
            dperm = jax.random.permutation(ks[6], ns).astype(jnp.int32)
            return jnp.where(dperm >= n, n, dperm)

        d_drop_idx = make_drop()
        timed(
            "scatter n->ns (engine in)",
            lambda v, i: loop(lambda w, j: jnp.zeros(
                (ns,), w.dtype).at[j].set(w, unique_indices=True)[:n])(v, i),
            d_x, d_in_idx,
        )
        timed(
            "drop-scatter ns->n (engine out)",
            lambda v, i: loop(lambda w, j: jnp.pad(
                jnp.zeros((n,), w.dtype).at[j].set(
                    w, mode="drop", unique_indices=True),
                (0, ns - n)))(v, i),
            d_xs, d_drop_idx,
        )
        timed(
            "take n<-ns (engine out cand)",
            lambda v, i: loop(lambda w, j: jnp.pad(
                jnp.take(w, j), (0, ns - n)))(v, i),
            d_xs, d_gather_idx,
        )

    if "sort" in groups:
        p("-- sort: vectorized O(n log n) routes --")
        timed(
            "sort_key_val n",
            loop(lambda v, i: jax.lax.sort_key_val(i, v)[1]),
            d_x, d_perm_n,
        )

    if "local" in groups:
        p("-- local: Clos building blocks --")
        for c in (256, 1024):
            r = n // c
            x2 = d_x.reshape(r, c)

            idx_row = jax.jit(
                lambda kk, rr=r, cc=c: jnp.argsort(
                    jax.random.uniform(kk, (rr, cc)), axis=1
                ).astype(jnp.int32)
            )(ks[6])
            timed(
                f"take_along rows (r,{c}) axis=1",
                loop(lambda v, i: jnp.take_along_axis(v, i, axis=1)),
                x2, idx_row,
            )

            idx_col = jax.jit(
                lambda kk, rr=r, cc=c: jnp.argsort(
                    jax.random.uniform(kk, (rr, cc)), axis=0
                ).astype(jnp.int32)
            )(ks[7])
            timed(
                f"take_along cols ({r},c) axis=0",
                loop(lambda v, i: jnp.take_along_axis(v, i, axis=0)),
                x2, idx_col,
            )
        r = n // 128
        timed(
            "transpose (r,128)->(128,r)",
            loop(lambda v, i: v.reshape(r, 128).T.reshape(r, 128) * 1.0),
            d_x.reshape(r, 128), d_perm_n[:128],
        )

    if "clos" in groups:
        p("-- clos: full 3-stage row/col/row chain (one jit) --")
        # Any permutation of an (R, C) matrix factors as (within-row) o
        # (within-column) o (within-row) — classic 3-stage Clos routing. The
        # stage index tables here are random (the apply cost is identical to
        # the routed decomposition; only construction differs), timed as one
        # fused chain so XLA can overlap the stages.
        for c in (128, 256, 1024):
            r = n // c

            @jax.jit
            def make_stages(kk, rr=r, cc=c):
                k1, k2, k3 = jax.random.split(kk, 3)
                row1 = jnp.argsort(jax.random.uniform(k1, (rr, cc)), axis=1)
                col = jnp.argsort(jax.random.uniform(k2, (rr, cc)), axis=0)
                row2 = jnp.argsort(jax.random.uniform(k3, (rr, cc)), axis=1)
                return (row1.astype(jnp.int32), col.astype(jnp.int32),
                        row2.astype(jnp.int32))

            st = jax.block_until_ready(make_stages(ks[6]))
            x2 = d_x.reshape(r, c)

            def chain(v, stages):
                row1, col, row2 = stages
                v = jnp.take_along_axis(v, row1, axis=1)
                v = jnp.take_along_axis(v, col, axis=0)
                return jnp.take_along_axis(v, row2, axis=1)

            timed(
                f"clos chain (r,{c})",
                lambda v, s: loop(lambda w, ss: chain(w, ss))(v, s),
                x2, st,
            )

    if "onehot" in groups:
        p("-- onehot: within-row permutation on the MXU --")
        for c in (128, 256):
            r = n // c

            d_oh = jax.jit(
                lambda kk, rr=r, cc=c: jax.nn.one_hot(
                    jnp.argsort(
                        jax.random.uniform(kk, (rr, cc)), axis=1
                    ).astype(jnp.int32),
                    cc, axis=1, dtype=jnp.bfloat16,
                )
            )(ks[6])
            x2 = d_x.reshape(r, 1, c).astype(jnp.bfloat16)

            def oh_apply(v, oh):
                y = jax.lax.dot_general(
                    v, oh,
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )  # (r, 1, c)
                return y.astype(jnp.bfloat16)

            timed(f"one-hot bmm rows (r,{c}) bf16", loop(oh_apply), x2, d_oh)


if __name__ == "__main__":
    main()
