"""In-engine probe: slot/unslot permutations as scatters vs lax.sort_key_val.

probe_bitonic.py showed lax.sort_key_val applies a full 2^24 permutation in
~75 ms where the engine's unique-index scatter takes ~113-140 ms. This probe
measures the same trade on the REAL plan geometry of the headline config:
the slot layout is (S, K) with padding slots, so the sort runs over S*K
elements while the slot-direction scatter only touches n — the ratio decides
the winner.

Usage: python examples/probe_permute_sort.py [log2_n] [window] [m]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from torch_nfft_tpu.ops.binned import build_plan_device
    from torch_nfft_tpu.ops.pallas.contract import _slot_values, _unslot_values

    q = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    window = sys.argv[2] if len(sys.argv) > 2 else "es"
    m = int(sys.argv[3]) if len(sys.argv) > 3 else (2 if window == "es" else 4)
    n, N, dim = 1 << q, 256, 3
    REPS = 8

    rng = np.random.default_rng(7)
    pos = jnp.asarray((rng.random((n, dim), dtype=np.float32) - 0.5) / 2.0)
    x = jnp.asarray(rng.standard_normal((n, 1)).astype(np.float32))

    t0 = time.perf_counter()
    plan = build_plan_device(pos, None, N=N, m=m, batch_size=1, window=window)
    jax.block_until_ready(plan.inv_slot)
    S, K = plan.slot_pt.shape
    print(f"plan {time.perf_counter()-t0:.1f}s: S={S} K={K} S*K={S*K} "
          f"n={n} fill={n/(S*K):.2f} backend={jax.default_backend()}",
          flush=True)

    # --- static per-plan tables for the sort formulations ---------------
    k_iota = jnp.arange(K, dtype=jnp.int32)[None, :]
    valid = (k_iota < plan.row_count[:, None]).reshape(-1)
    # slot direction: keys = destination slot of every element of
    # [x (n), zeros (S*K - n)] — a permutation of [0, S*K)
    invalid_ids = jnp.nonzero(~valid, size=S * K - n)[0].astype(jnp.int32)
    fill_keys = jnp.concatenate([plan.inv_slot, invalid_ids])
    # unslot direction: keys = user index per slot, sentinel for padding
    unslot_keys = jnp.where(
        valid, plan.slot_pt.reshape(-1), jnp.int32(n)
    )

    def timed(name, fn, *a):
        f = jax.jit(fn)
        out = jax.block_until_ready(f(*a))
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = jax.block_until_ready(f(*a))
        dt = (time.perf_counter() - t0) / REPS
        print(f"{name:44s} {dt*1e3:9.2f} ms", flush=True)
        return out

    # --- slot direction: user (n, 1) -> slot-ordered (1, S*K) -----------
    ref_slot = timed("slot: scatter .at[inv_slot].set (today)",
                     lambda v: _slot_values(plan, v), x)

    def slot_sorted(v):
        vals = jnp.concatenate([v[:, 0], jnp.zeros((S * K - n,), v.dtype)])
        _, sv = jax.lax.sort_key_val(fill_keys, vals)
        return sv[None, :]

    got_slot = timed("slot: sort_key_val over S*K", slot_sorted, x)
    print(f"  slot agree: {bool(jnp.all(ref_slot == got_slot))}", flush=True)

    # --- unslot direction: slot-ordered (S*K, 1) -> user (n, 1) ---------
    vflat = jnp.asarray(
        rng.standard_normal((S * K, 1)).astype(np.float32))

    ref_un = timed("unslot: scatter .at[target].set (today)",
                   lambda v: _unslot_values(plan, v, n), vflat)

    def unslot_sorted(v):
        _, sv = jax.lax.sort_key_val(unslot_keys, v[:, 0])
        return sv[:n, None]

    got_un = timed("unslot: sort_key_val over S*K", unslot_sorted, vflat)
    print(f"  unslot agree: {bool(jnp.all(ref_un == got_un))}", flush=True)


if __name__ == "__main__":
    main()
