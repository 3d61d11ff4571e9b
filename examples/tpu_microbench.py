"""One-process TPU measurement sweep for the binned engine.

Runs, in ONE process (the axon tunnel wedges under process churn):
  1. device plan build timing (build_plan_device) at the requested size
  2. dense in-kernel-accumulation spread correctness vs the XLA path (small n)
  3. stage timings: spread_dft / adjoint DFT / forward DFT / gather_dft
  4. spread-kernel VARIANT microbenchmarks (what the 14 us/row is made of):
     full HIGHEST dot | DEFAULT dot | no dot | no KR | windows only
  5. slot-value gather cost (the per-call x -> slot-order take)

Usage: python examples/tpu_microbench.py [logn] [--variants]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from torch_nfft_tpu.ops.binned import (
    build_plan_device,
    _spread_dft_xla,
    spread_binned_dft,
    gather_binned_dft,
)
from torch_nfft_tpu.ops.fft import (
    spectral_adjoint_pruned_dft,
    spectral_forward_pruned_dft,
)
from torch_nfft_tpu.ops.tilefold import compact_cells
from torch_nfft_tpu.ops.pallas.contract import (
    _windows_fused,
    _khatri_rao,
    _chunks,
    _origin_args,
    _slot_values,
)
from torch_nfft_tpu.ops.window import window_inv_b, window_inv_sqrt_b_pi


def timeit(fn, *args, iters=3):
    jfn = jax.jit(lambda *a: jnp.sum(fn(*a)))
    float(jfn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(jfn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def variant_kernel(
    row_count_ref, org0_ref, org1_ref, org2_ref,
    data_ref, tile_ref, *, K, H, M, m, inv_b, amp, dim, variant,
):
    s = pl.program_id(0)
    count = row_count_ref[s]
    n_chunks, KC = _chunks(K)
    W2 = H ** (dim - 1)
    acc = jnp.zeros((H, W2), jnp.float32)
    for j in range(n_chunks):
        sl = j * KC
        kmask = (
            jax.lax.broadcasted_iota(jnp.int32, (1, KC), 1) + sl < count
        ).astype(jnp.float32)
        orgs = (org0_ref[s], org1_ref[s], org2_ref[s])[:dim]
        A = _windows_fused(
            data_ref[1 : 1 + dim, pl.ds(sl, KC)], orgs, M, m, H, inv_b, amp
        )
        if variant == "windows":
            a0 = A[0]  # (H, KC)
            if KC < W2:
                a0 = jnp.pad(a0, ((0, 0), (0, W2 - KC)))
            acc = acc + a0[:, :W2]
            continue
        xw = data_ref[0:1, pl.ds(sl, KC)] * kmask
        if variant == "nokr":
            t2s = A[2] * xw  # (H, KC)
            if KC < W2:
                t2s = jnp.pad(t2s, ((0, 0), (0, W2 - KC)))
            acc = acc + t2s[:, :W2]
            continue
        t2 = _khatri_rao(A[1], A[2] * xw, H)  # (W2, KC)
        if variant == "nodot":
            acc = acc + jnp.sum(t2, axis=1, keepdims=True).T[:H]
            continue
        prec = (
            jax.lax.Precision.HIGHEST
            if variant == "full"
            else jax.lax.Precision.DEFAULT
        )
        a0 = A[0]
        if variant == "bf16dot":
            a0 = a0.astype(jnp.bfloat16)
            t2 = t2.astype(jnp.bfloat16)
            prec = jax.lax.Precision.DEFAULT
        acc = acc + jax.lax.dot_general(
            a0, t2, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
    tile_ref[0] = acc


def run_variant(plan, data, variant):
    S = plan.slot_pt.shape[0]
    K, H, M, m = plan.K, plan.H, plan.M, plan.m
    W2 = H ** (plan.dim - 1)
    inv_b = window_inv_b(m, plan.sigma)
    amp = window_inv_sqrt_b_pi(m, plan.sigma)
    F = data.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(S,),
        in_specs=[pl.BlockSpec((F, K), lambda s, *_: (0, s), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, H, W2), lambda s, *_: (s, 0, 0), memory_space=pltpu.VMEM),
    )
    kernel = functools.partial(
        variant_kernel, K=K, H=H, M=M, m=m, inv_b=inv_b, amp=amp,
        dim=plan.dim, variant=variant,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((S, H, W2), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(plan.row_count, *_origin_args(plan), data)


def main():
    logn = int(sys.argv[1]) if len(sys.argv) > 1 else 22
    do_variants = "--variants" in sys.argv
    n, N, dim, m = 1 << logn, 256, 3, 4
    M = 2 * N
    rng = np.random.default_rng(7)
    pos_np = (rng.random((n, dim), dtype=np.float32) - 0.5) / 2.0
    pos = jnp.asarray(pos_np)
    x = jnp.asarray(rng.standard_normal((n, 1)).astype(np.float32))
    print(f"backend={jax.default_backend()} n={n} N={N} m={m}", flush=True)

    # 1. device plan build
    t0 = time.perf_counter()
    plan = build_plan_device(pos, None, N=N, m=m, batch_size=1)
    float(jnp.sum(plan.inv_slot))  # force
    t_plan = time.perf_counter() - t0
    cells = compact_cells(plan)
    ca = cells is not None
    print(
        f"plan_device: {t_plan:.2f}s rows={plan.slot_pt.shape[0]} K={plan.K} "
        f"T={plan.T} active={plan.active}", flush=True,
    )
    t0 = time.perf_counter()
    plan2 = build_plan_device(pos, None, N=N, m=m, batch_size=1)
    float(jnp.sum(plan2.inv_slot))
    print(f"plan_device warm: {time.perf_counter()-t0:.2f}s", flush=True)

    # 2. dense-accumulation correctness vs XLA (small n, same process)
    ns = 200_000
    poss = jnp.asarray(pos_np[:ns])
    xs = jnp.asarray(np.asarray(x)[:ns])
    plans = build_plan_device(poss, None, N=64, m=m, batch_size=1)
    g_p = spread_binned_dft(plans, xs, poss, batch_size=1, compact=False)
    g_x = _spread_dft_xla(plans, xs, poss, 1)
    dmax = float(jnp.max(jnp.abs(g_p - g_x)))
    gmax = float(jnp.max(jnp.abs(g_x)))
    print(f"dense-accum spread vs XLA: max abs diff {dmax:.3e} (scale {gmax:.3e})", flush=True)

    # 3. stage timings
    spread_j = jax.jit(
        lambda pl_, x, p: spread_binned_dft(pl_, x, p, batch_size=1, compact=ca)
    )
    t_spread = timeit(spread_j, plan, x, pos)
    g = spread_j(plan, x, pos)
    print(f"spread_dft:  {t_spread*1e3:8.1f} ms  out={g.shape}", flush=True)

    adj_j = jax.jit(lambda g: spectral_adjoint_pruned_dft(g, None, dim, N, m, 2.0, M=M, cells=cells)[0])
    t_adj = timeit(adj_j, g)
    yr = adj_j(g)
    yi = jnp.zeros_like(yr)
    print(f"adj_dft:     {t_adj*1e3:8.1f} ms", flush=True)

    fwd_j = jax.jit(
        lambda a, b: spectral_forward_pruned_dft(a, b, dim, M, m, 2.0, cells=cells, real_only=True)[0]
    )
    t_fwd = timeit(fwd_j, yr, yi)
    g2 = fwd_j(yr, yi)
    print(f"fwd_dft(real_only): {t_fwd*1e3:8.1f} ms", flush=True)

    gath_j = jax.jit(lambda pl_, g, p: gather_binned_dft(pl_, g, p, compact=ca))
    t_gath = timeit(gath_j, plan, g2, pos)
    print(f"gather_dft:  {t_gath*1e3:8.1f} ms", flush=True)
    print(f"sum ~ pair: {(t_spread+t_adj+t_fwd+t_gath)*1e3:.1f} ms", flush=True)

    # 5. slot-value gather cost
    sv_j = jax.jit(lambda pl_, x: _slot_values(pl_, x))
    t_sv = timeit(sv_j, plan, x)
    print(f"slot_values take: {t_sv*1e3:8.1f} ms", flush=True)

    if do_variants and dim == 3:
        data = jnp.concatenate([sv_j(plan, x), plan.slot_pos], axis=0)
        S = plan.slot_pt.shape[0]
        for v in ("full", "default", "bf16dot", "nodot", "nokr", "windows"):
            t = timeit(lambda d: run_variant(plan, d, v), data)
            print(
                f"variant {v:8s}: {t*1e3:8.1f} ms  ({t/S*1e6:.2f} us/row)",
                flush=True,
            )


if __name__ == "__main__":
    main()
