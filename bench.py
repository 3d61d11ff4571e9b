"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline (BASELINE.json): nonuniform points/sec through one adjoint+forward
NFFT pair, 3D, N=256, m=4-accuracy-class, with relative-L2 accuracy gates vs
dense NDFT oracles first. Runs the pure-real (planar matmul-FFT) pipeline so
it executes on TPU runtimes without complex/FFT support.

The reference publishes no numbers, so ``vs_baseline`` compares against the
modelled throughput of the reference CUDA code on an H100 SXM (see
BASELINE.md "H100 baseline model"): 30 M points/s for the headline pair,
dominated by its 2*(2m+2)^3 = 2000 unsorted global float atomicAdds per
point (spatial_window_operations.cu:103-211).

``vs_baseline`` is accuracy-matched, not parameter-matched: the modelled H100
reference runs its only window (truncated Gaussian, m=4, sigma=2) at ~1e-4
rel-L2; any run of this harness on the same (dim, N) problem whose measured
accuracy is at least as good compares against the same 30 M points/s bar.
The es window reaches that accuracy at m=2 (see ops/window.py), which is the
default configuration; the asserted gates guarantee the comparison can only
be conservative.

Timeout-proofness (round-3 failure mode: the driver capture died rc=124 with
no JSON): the harness now
  - runs a tunnel doctor + device probe in a SUBPROCESS first: the axon
    relay serializes clients, and a client killed mid-RPC wedges the tunnel
    for every later client until the stale PID dies. The doctor detects
    foreign PIDs holding established connections to the relay ports and
    kills them (bench must be the only device client); the probe bounds
    first-device-contact (~70-80 s healthy) with a hard subprocess timeout.
  - tracks a global time budget (BENCH_TIME_BUDGET, default 1620 s vs the
    driver's 30 min cap) and gates every optional stage (Benes upgrade,
    headline accuracy, pipelined protocol) on the time remaining;
  - keeps a best-so-far result that a watchdog thread emits (and exits)
    if the budget expires mid-device-call — device calls on a wedged
    tunnel hang uninterruptibly, so the watchdog is the only way out;
  - guarantees EXACTLY one JSON line on stdout on every path (success,
    watchdog, exception).

Environment overrides: BENCH_N_POINTS, BENCH_BANDWIDTH, BENCH_DIM,
BENCH_CUTOFF, BENCH_STRATEGY, BENCH_WINDOW (gaussian|es), BENCH_SIGMA,
BENCH_K (plan row capacity), BENCH_T (plan tile edge), BENCH_BENES
(0 = keep sort permutations), BENCH_PIPELINE (steady-state depth;
1 = serial-latency only), BENCH_TIME_BUDGET (s), BENCH_PROBE (0 = skip
device probe), BENCH_PROBE_TIMEOUT (s), BENCH_FIX_TUNNEL (0 = report
stale tunnel clients but do not kill them).
"""

import json
import os
import sys
import threading
import time

import numpy as np

_T0 = time.time()
_BUDGET = float(os.environ.get("BENCH_TIME_BUDGET", "1620"))


def _left():
    return _BUDGET - (time.time() - _T0)


def _log(msg):
    print(f"[bench] {time.strftime('%H:%M:%S')} [+{time.time()-_T0:6.1f}s] {msg}",
          file=sys.stderr, flush=True)


# ---------------------------------------------------------------------------
# Single-emission result channel + watchdog
# ---------------------------------------------------------------------------

_EMIT_LOCK = threading.Lock()
_EMITTED = False
_BEST = {"result": None, "exit_code": 1}


def _emit(result, exit_code):
    """Print the ONE stdout JSON line (idempotent across threads)."""
    global _EMITTED
    with _EMIT_LOCK:
        if _EMITTED:
            return False
        _EMITTED = True
    print(json.dumps(result), flush=True)
    return exit_code


def _set_best(result, exit_code):
    _BEST["result"] = result
    _BEST["exit_code"] = exit_code


def _watchdog():
    """Emit the best-so-far result when the budget expires.

    Device calls through a wedged axon tunnel hang uninterruptibly (no
    signal reaches the blocked RPC), so the only reliable bound is a thread
    that force-exits the process after emitting whatever has been measured.
    """
    while True:
        left = _left()
        if left <= 0:
            break
        time.sleep(min(left, 5.0))
    res = _BEST["result"]
    if res is None:
        res = {
            "metric": "nonuniform points/sec (benchmark incomplete)",
            "value": None,
            "unit": "points/sec",
            "vs_baseline": None,
            "extra": {"error": "time budget expired before any measurement",
                      "budget_seconds": _BUDGET},
        }
        code = _emit(res, 1)
    else:
        res = dict(res)
        res.setdefault("extra", {})["watchdog_fired"] = True
        code = _emit(res, _BEST["exit_code"])
    if code is False:       # main thread already emitted; let it finish
        return
    os._exit(code)


# ---------------------------------------------------------------------------
# Tunnel doctor + device probe
# ---------------------------------------------------------------------------

def _relay_ports():
    """The axon relay's loopback ports (parsed from the relay script when
    readable; device clients connect to these per-RPC)."""
    try:
        with open("/root/.tpu_init.py") as f:
            first = f.readline()
        if first.startswith("PORTS"):
            return set(eval(first.split("=", 1)[1].strip()))
    except Exception:
        pass
    return {8082, 8083, 8087, 8092, 8093, 8097, 8102, 8103, 8107, 8112,
            8113, 8117}


def _stale_tunnel_clients():
    """PIDs (not us / our ancestors) holding ESTABLISHED connections to the
    relay ports. Healthy clients hold connections only for the duration of
    one RPC (measured: sub-second bursts); a foreign PID parked on one when
    the bench starts is a wedged client blocking the serialized tunnel."""
    import glob
    import re

    ports = _relay_ports()
    inodes = set()
    for path in ("/proc/net/tcp", "/proc/net/tcp6"):
        try:
            with open(path) as f:
                lines = f.readlines()[1:]
        except OSError:
            continue
        for line in lines:
            p = line.split()
            try:
                rport = int(p[2].split(":")[1], 16)
                state = p[3]
                inode = int(p[9])
            except (IndexError, ValueError):
                continue
            if rport in ports and state == "01" and inode:
                inodes.add(inode)
    if not inodes:
        return []
    ancestors = set()
    pid = os.getpid()
    while pid > 1:
        ancestors.add(pid)
        try:
            with open(f"/proc/{pid}/stat") as f:
                pid = int(f.read().split(")")[-1].split()[1])
        except OSError:
            break
    owners = set()
    for fd in glob.glob("/proc/[0-9]*/fd/*"):
        try:
            tgt = os.readlink(fd)
        except OSError:
            continue
        mm = re.match(r"socket:\[(\d+)\]", tgt)
        if mm and int(mm.group(1)) in inodes:
            owner = int(fd.split("/")[2])
            if owner not in ancestors:
                owners.add(owner)
    return sorted(owners)


def _tunnel_doctor(kill=True):
    """Detect (and by default kill, by exact PID) wedged tunnel clients.

    Healthy clients connect per-RPC for sub-second bursts, so a PID must be
    seen holding a relay connection across a short re-check before it is
    treated as wedged — a concurrent healthy session mid-RPC is not killed.
    """
    import signal

    stale = set(_stale_tunnel_clients())
    if not stale:
        return []
    time.sleep(3.0)
    persistent = stale & set(_stale_tunnel_clients())
    for pid in sorted(stale - persistent):
        _log(f"tunnel doctor: pid={pid} released its connection on re-check "
             "(healthy mid-RPC client) — not killed")
    stale = sorted(persistent)
    if not stale:
        return []
    for pid in stale:
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as f:
                cmd = f.read().replace(b"\0", b" ").decode()[:120]
        except OSError:
            cmd = "?"
        _log(f"tunnel doctor: stale client pid={pid} cmd={cmd!r}")
        if kill:
            try:
                os.kill(pid, signal.SIGKILL)
                _log(f"tunnel doctor: killed pid={pid}")
            except OSError as e:
                _log(f"tunnel doctor: kill({pid}) failed: {e}")
    return stale


_PROBE_CODE = """
import time, sys
t0 = time.time()
import jax, jax.numpy as jnp
d = jax.devices()
x = jnp.ones((256, 256))
y = (x @ x).block_until_ready()
print(f"probe ok: {d} init+matmul {time.time()-t0:.1f}s", file=sys.stderr)
"""


def _probe_device(timeout):
    """First device contact in a SUBPROCESS with a hard timeout, so a wedged
    tunnel cannot hang the harness (in-process device init is uninterruptible
    and first contact takes ~70-80 s even when healthy)."""
    import subprocess

    t0 = time.time()
    try:
        subprocess.run([sys.executable, "-c", _PROBE_CODE], check=True,
                       timeout=timeout,
                       stdout=subprocess.DEVNULL)
        dt = time.time() - t0
        _log(f"device probe ok in {dt:.1f}s")
        return True, dt
    except subprocess.TimeoutExpired:
        _log(f"device probe TIMED OUT after {timeout:.0f}s")
        return False, time.time() - t0
    except subprocess.CalledProcessError as e:
        _log(f"device probe failed rc={e.returncode}")
        return False, time.time() - t0


# ---------------------------------------------------------------------------
# Accuracy gates (small dense-oracle configs; same window/m/sigma as the
# headline, both 2D and dim-matched 3D so a budget-truncated run still
# carries a defensible accuracy-matched vs_baseline)
# ---------------------------------------------------------------------------

def _gate(dim, N, window, sigma, m, n=400):
    """Small-config rel-L2 error of the planar pipeline vs a numpy NDFT."""
    import jax.numpy as jnp

    from torch_nfft_tpu.ops.planar import nfft_adjoint_planar

    rng = np.random.default_rng(0)
    pos = (rng.random((n, dim), dtype=np.float32) - 0.5)
    pos /= 4 * np.abs(pos).max()
    x = rng.standard_normal((n, 2)).astype(np.float32)
    batch = np.zeros((n,), np.int32)

    yr, yi = nfft_adjoint_planar(
        jnp.asarray(x), jnp.asarray(pos), jnp.asarray(batch), batch_size=1,
        N=N, m=m, sigma=sigma, window=window,
    )
    got = np.asarray(yr)[0] + 1j * np.asarray(yi)[0]  # (N,)*dim + (2,)

    # dense NDFT oracle in numpy (float64):
    # y[k, c] = sum_i x[i, c] * exp(+2 pi i k . pos_i), k in [-N/2, N/2)^dim
    k = np.arange(N) - N // 2
    grids = np.meshgrid(*([k] * dim), indexing="ij")
    phase = np.zeros((N**dim, pos.shape[0]))
    for d in range(dim):
        phase = phase + grids[d].reshape(-1, 1) * pos[:, d]
    ref = (np.exp(2j * np.pi * phase) @ x.astype(np.complex128))
    ref = ref.reshape(got.shape)
    return float(np.linalg.norm(got - ref) / np.linalg.norm(ref))


def _headline_accuracy(pos_np, x_np, plan, N, m, dim, batch, n_freq=96,
                       window="gaussian", sigma=2.0):
    """Accuracy of the ACTUAL headline transform (full n, full N, m) vs an
    exact-phase oracle on a random sample of frequencies.

    The dense oracle at 3D N=256 cannot be materialized (the reference
    validates only small configs for the same reason, test_adjoint.py:21-31),
    but single frequencies can be summed over ALL points:
    y[k, c] = sum_i x[i, c] exp(2 pi i k . pos_i). We draw ``n_freq`` random
    centered frequencies, read just those entries of the device adjoint
    output, and compare with a device-evaluated direct sum whose PHASE is
    computed exactly: pos splits into p_hi (12 fractional bits, so k*p_hi
    with |k| <= N/2 <= 2^11 is exact in f32 and its mod-1 reduction is
    exact) plus a tiny p_lo correction — the angle carries ~1e-7 rad error,
    and the tree-reduced f32 sums add ~1e-6 relative, two orders below the
    ~1e-4 NFFT window error being measured. This is the per-config
    oracle-comparison pattern of /root/reference/test/test_adjoint.py:38-49
    at headline scale (a float64 host oracle agrees to ~1e-6 but costs
    minutes of single-core numpy).
    """
    import jax
    import jax.numpy as jnp

    from torch_nfft_tpu.ops.planar import nfft_adjoint_planar

    rng = np.random.default_rng(11)
    k = rng.integers(-(N // 2), N // 2, size=(n_freq, dim))  # centered freqs

    yr, yi = nfft_adjoint_planar(
        jnp.asarray(x_np), jnp.asarray(pos_np), batch, plan,
        batch_size=1, N=N, m=m, sigma=sigma, window=window,
    )
    idx = tuple((k[:, d] + N // 2) for d in range(dim))
    got_r = np.asarray(yr[(0,) + idx + (0,)])
    got_i = np.asarray(yi[(0,) + idx + (0,)])
    got = got_r + 1j * got_i

    n = pos_np.shape[0]
    chunk = min(n, 1 << 21)
    n_chunks = -(-n // chunk)
    n_pad = n_chunks * chunk
    pos_d = jnp.asarray(np.pad(pos_np, ((0, n_pad - n), (0, 0))))
    w_d = jnp.asarray(np.pad(x_np[:, 0], (0, n_pad - n)))
    k_d = jnp.asarray(k.astype(np.float32))  # (F, dim)
    scale = 4096.0

    @jax.jit
    def oracle(pos_d, w_d):
        def body(i, acc):
            p = jax.lax.dynamic_slice_in_dim(pos_d, i * chunk, chunk, 0)
            w = jax.lax.dynamic_slice_in_dim(w_d, i * chunk, chunk, 0)
            p_hi = jnp.round(p * scale) / scale
            p_lo = p - p_hi
            ph_hi = jnp.zeros((chunk, n_freq), jnp.float32)
            ph_lo = jnp.zeros((chunk, n_freq), jnp.float32)
            for d in range(dim):  # elementwise products: exact f32 (no MXU)
                ph_hi = ph_hi + p_hi[:, d : d + 1] * k_d[None, :, d]
                ph_lo = ph_lo + p_lo[:, d : d + 1] * k_d[None, :, d]
            ang = 2.0 * jnp.pi * (ph_hi - jnp.floor(ph_hi) + ph_lo)
            cr = jnp.sum(w[:, None] * jnp.cos(ang), axis=0)
            ci = jnp.sum(w[:, None] * jnp.sin(ang), axis=0)
            return acc[0] + cr, acc[1] + ci

        z = jnp.zeros((n_freq,), jnp.float32)
        return jax.lax.fori_loop(0, n_chunks, body, (z, z))

    ref_r, ref_i = oracle(pos_d, w_d)
    ref = np.asarray(ref_r).astype(np.float64) + 1j * np.asarray(ref_i)
    return float(np.linalg.norm(got - ref) / np.linalg.norm(ref))


# ---------------------------------------------------------------------------
# Main
# ---------------------------------------------------------------------------

def _run(state):
    # Persistent compile cache: axon remote-compiles through the tunnel
    # (~25 min cold for the full bench); cached executables make reruns
    # minutes. The cache directory is committed to the repo for exactly
    # this reason — a fresh checkout must not pay the cold compile inside
    # the driver's timeout.
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    cache_dir = os.environ["JAX_COMPILATION_CACHE_DIR"]
    n_cached = len(os.listdir(cache_dir)) if os.path.isdir(cache_dir) else 0
    warm = n_cached >= 10
    _log(f"compile cache: {cache_dir} ({n_cached} entries, "
         f"{'warm' if warm else 'COLD — expect remote compiles'})")
    # drift guard: Pallas cache entries embed source locations, so a stamp
    # mismatch means the committed cache will MISS on the hot programs
    from torch_nfft_tpu.utils.cache_guard import check as _cache_check

    cache_ok, cache_msg = _cache_check(cache_dir)
    _log(("" if cache_ok else "WARNING: ") + cache_msg)
    if not cache_ok:
        warm = False  # budget the stages as a cold run

    n = int(os.environ.get("BENCH_N_POINTS", 1 << 24))
    N = int(os.environ.get("BENCH_BANDWIDTH", 256))
    dim = int(os.environ.get("BENCH_DIM", 3))
    strategy = os.environ.get("BENCH_STRATEGY", "auto")
    # Default = the recommended fast configuration: the exp-sqrt window at
    # m=2 measures 3.3e-5 headline rel-L2 (3x better than the reference's
    # gaussian m=4 at ~1.1e-4) — the vs_baseline comparison stays
    # accuracy-matched and is asserted below. Reference parity config:
    # BENCH_WINDOW=gaussian BENCH_CUTOFF=4.
    window = os.environ.get("BENCH_WINDOW", "es")
    m = int(os.environ.get("BENCH_CUTOFF", 2 if window == "es" else 4))
    # es default sigma=1.625: every grid-side stage scales with
    # M^3 = (sigma*N)^3 while the halo stays H=13, and the measured headline
    # accuracy (5.6e-5) keeps a 2.1x margin under the reference-parity
    # 1.2e-4 bar (BASELINE.md round-4). sigma=2 remains the gaussian
    # default (reference parity) and available via BENCH_SIGMA.
    sigma = float(os.environ.get("BENCH_SIGMA", 1.625 if window == "es" else 2.0))
    K_env = os.environ.get("BENCH_K")
    K_plan = int(K_env) if K_env else None
    T_env = os.environ.get("BENCH_T")
    T_plan = int(T_env) if T_env else None

    _log(f"config: n={n} N={N} dim={dim} m={m} strategy={strategy} "
         f"window={window} sigma={sigma} budget={_BUDGET:.0f}s")

    # --- stage 0: tunnel doctor + bounded device probe (subprocess) ------
    killed = []
    probe_s = 0.0
    if os.environ.get("BENCH_PROBE", "1") != "0":
        killed = _tunnel_doctor(
            kill=os.environ.get("BENCH_FIX_TUNNEL", "1") != "0")
        probe_timeout = float(os.environ.get("BENCH_PROBE_TIMEOUT", "300"))
        ok, probe_s = _probe_device(probe_timeout)
        if not ok:
            killed += _tunnel_doctor(
                kill=os.environ.get("BENCH_FIX_TUNNEL", "1") != "0")
            ok, dt2 = _probe_device(probe_timeout)
            probe_s += dt2
        if not ok:
            return _emit({
                "metric": "nonuniform points/sec (device unreachable)",
                "value": None,
                "unit": "points/sec",
                "vs_baseline": None,
                "extra": {
                    "error": ("device probe timed out twice — axon tunnel "
                              "wedged or TPU unreachable; stale client PIDs "
                              "killed: " + repr(killed)),
                    "probe_seconds": round(probe_s, 1),
                },
            }, 2)

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from torch_nfft_tpu.ops.planar import nfft_pair_planar

    # --- stage 1: accuracy gates (dense-oracle small configs) ------------
    # 2D N=16 (continuity with earlier rounds) + dim-matched 3D N=32: the
    # window truncation error is set by (window, m, sigma, dim) and depends
    # only weakly on N, so the 3D gate certifies the accuracy class of the
    # 3D headline even if the budget later truncates the sampled-frequency
    # headline check.
    _log("accuracy gates (2D N=16, 3D N=32) ...")
    rel_2d = _gate(2, 16, window, sigma, m)
    _log(f"gate 2D N=16 rel_l2={rel_2d:.2e}")
    rel_3d = _gate(3, 32, window, sigma, m) if dim == 3 else None
    if rel_3d is not None:
        _log(f"gate 3D N=32 rel_l2={rel_3d:.2e}")
    gate_ok = rel_2d < 1e-3 and (rel_3d is None or rel_3d < 1e-3)

    rng = np.random.default_rng(7)
    pos_np = (rng.random((n, dim), dtype=np.float32) - 0.5) / 2.0
    pos = jnp.asarray(pos_np)
    x = jnp.asarray(rng.standard_normal((n, 1)).astype(np.float32))
    batch = jnp.zeros((n,), jnp.int32)

    # Modelled H100 throughput of the reference for THIS problem
    # (BASELINE.md): only the headline 3D N=256 problem carries a defensible
    # model. The comparison is ACCURACY-matched: the reference's one
    # configuration (gaussian window, m=4) delivers ~1.1e-4 rel-L2 there; a
    # run with a better window qualifies iff its measured accuracy is at
    # least as good (the dim-matched 3D gate first, upgraded to the
    # headline sampled-frequency check when the budget allows).
    ref_parity_rel = 1.2e-4

    def _acc_match(rel_headline):
        """(accuracy_matched, basis) from the BEST available measurement:
        the headline sampled-frequency check when it ran (it measures the
        benched configuration itself and overrides the gates — a headline
        miss must also revoke the parity claim), else the dim-matched gate."""
        if rel_headline is not None:
            basis = "headline"
            matched = (window == "gaussian" and m == 4) or (
                rel_headline <= ref_parity_rel)
        else:
            basis = "gate3d" if rel_3d is not None else "gate2d"
            matched = (window == "gaussian" and m == 4) or (
                (rel_3d if rel_3d is not None else rel_2d) <= ref_parity_rel)
        return matched, basis

    # --- stage 2: plan -----------------------------------------------------
    # Plan once (amortized across transforms, like an FFTW plan). "binned"
    # turns the irregular scatter into dense MXU contractions. The DEVICE
    # builder keeps every O(n) step (sort, gathers, permutation inverse) on
    # the chip — no O(n) host-link transfers (the host builder ships ~8B/pt).
    plan = None
    t_plan = 0.0
    t_benes = 0.0
    benes_done = False
    if strategy in ("auto", "binned"):
        from torch_nfft_tpu.ops.binned import build_plan_device

        _log(f"building plan (device builder; warm ~8 s, cold ~63 s) ...")
        t0 = time.perf_counter()
        plan = build_plan_device(pos, None, N=N, m=m, sigma=sigma,
                                 batch_size=1, window=window, K=K_plan,
                                 T=T_plan)
        jax.block_until_ready(plan.inv_slot)
        float(jnp.sum(plan.row_count))
        t_plan = time.perf_counter() - t0
        _log(f"plan built in {t_plan:.3f}s: rows={plan.slot_pt.shape[0]} "
             f"K={plan.K} T={plan.T}")
        # Routed Benes permutation masks: one-time host routing (the looping
        # algorithm is sequential C++) + a packed-bit upload; each transform
        # pair then saves ~120 ms of lax.sort permutations. Warm ~21 s, cold
        # ~90 s — budget-gated; BENCH_BENES=0 keeps the sort path.
        want_benes = os.environ.get("BENCH_BENES", "1") != "0"
        # content-keyed routing cache: the fixed-seed point set routes once,
        # later runs load the packed bits (ops/pallas/benes.py:route_tables)
        os.environ.setdefault(
            "TORCH_NFFT_TPU_BENES_CACHE",
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "artifacts", "benes_cache"),
        )
        benes_budget = 300 if (warm and t_plan < 20) else 600
        if want_benes and _left() > benes_budget:
            t0 = time.perf_counter()
            plan = plan.with_benes_tables(pos=pos_np)
            jax.block_until_ready(plan.benes.local_words)
            t_benes = time.perf_counter() - t0
            benes_done = True
            _log(f"benes permutation tables in {t_benes:.1f}s "
                 f"(n={plan.benes.n}, host route + bit upload)")
        elif want_benes:
            _log(f"SKIPPING benes upgrade: {_left():.0f}s left < "
                 f"{benes_budget}s needed (sort permutations instead)")

    def pair(x, pos, batch, plan):
        # adjoint + real-output forward with the spectrum in the Hermitian
        # half representation end to end (numerically identical to the
        # adjoint->forward composition; tests/test_hermitian.py)
        zr = nfft_pair_planar(
            x, pos, batch, plan, batch_size=1, N=N, m=m, sigma=sigma,
            strategy=strategy, window=window,
        )
        # scalar so timing can force a host read (lazy backends make
        # block_until_ready unreliable)
        return jnp.sum(zr)

    # --- stage 3: compile + serial measurement ---------------------------
    fn = jax.jit(pair)
    _log("compiling + first run (warm: seconds-1 min; cold: up to ~25 min "
         "remote compile — watchdog emits partial JSON if over budget) ...")
    t0 = time.perf_counter()
    _ = float(fn(x, pos, batch, plan))  # compile + warm up + execute
    _log(f"first run done in {time.perf_counter()-t0:.1f}s")

    times = []
    for i in range(3):
        t0 = time.perf_counter()
        _ = float(fn(x, pos, batch, plan))
        times.append(time.perf_counter() - t0)
        _log(f"iter {i}: {times[-1]:.3f}s")
    t_serial = float(np.median(times))
    t = t_serial

    wtag = "" if window == "gaussian" else f" {window}"

    def make_result(t, t_pipe, rel_headline, headline_ok, basis=None):
        matched, derived_basis = _acc_match(rel_headline)
        basis = derived_basis if basis is None else basis
        h100_model = 30e6 if ((dim, N) == (3, 256) and matched) else None
        vs = None if h100_model is None else round(n / t / h100_model, 3)
        return {
            "metric": (
                f"nonuniform points/sec, {dim}D N={N} m={m}{wtag} "
                "adjoint+forward (planar)"
            ),
            "value": round(n / t, 1),
            "unit": "points/sec",
            "vs_baseline": vs,
            "extra": {
                "n_points": n,
                "seconds_per_pair": round(t, 4),
                "seconds_per_pair_serial": round(t_serial, 4),
                # steady-state: BENCH_PIPELINE pairs enqueued back-to-back,
                # host dispatch overlapped with device execution
                "seconds_per_pair_pipelined": (
                    None if t_pipe is None else round(t_pipe, 4)
                ),
                "plan_seconds": round(t_plan, 4),
                # one-time OPTIONAL plan upgrade (routed permutation
                # masks); amortized at ~120 ms saved per pair
                "benes_upgrade_seconds": round(t_benes, 4),
                "benes": benes_done,
                "accuracy_gate_rel_l2_2d_n16": rel_2d,
                "accuracy_gate_rel_l2_3d_n32": rel_3d,
                "accuracy_gate_ok": gate_ok,
                "headline_rel_l2_sampled_freqs": rel_headline,
                "headline_accuracy_ok": headline_ok,
                # what the accuracy-matched vs_baseline claim rests on:
                # "headline" = sampled-frequency check of the measured
                # config itself; "gate3d"/"gate2d" = dim-matched dense-
                # oracle gate at the same (window, m, sigma)
                "accuracy_basis": basis,
                "strategy": strategy,
                "window": window,
                "sigma": sigma,
                "backend": jax.default_backend(),
                "probe_seconds": round(probe_s, 1),
                "stale_clients_killed": killed,
                "elapsed_seconds": round(time.time() - _T0, 1),
            },
        }

    _set_best(make_result(t, None, None, None), 0 if gate_ok else 1)
    _log(f"serial: {t_serial:.4f}s/pair = {n/t_serial/1e6:.1f} M pts/s "
         f"(partial result recorded)")

    # --- stage 4: headline accuracy (budget-gated) -----------------------
    # Sampled-frequency comparison of the full-n adjoint output vs an exact
    # device oracle — upgrades the accuracy basis from the 3D gate to the
    # measured config itself.
    rel_headline = None
    headline_ok = None
    if _left() > (120 if warm else 400):
        _log("headline accuracy check (sampled frequencies vs exact "
             "oracle) ...")
        t0 = time.perf_counter()
        x_np = np.asarray(x)
        rel_headline = _headline_accuracy(pos_np, x_np, plan, N, m, dim,
                                          batch, window=window, sigma=sigma)
        headline_ok = rel_headline < 1e-3
        _log(f"headline rel_l2 (96 sampled freqs) = {rel_headline:.2e} "
             f"ok={headline_ok} ({time.perf_counter()-t0:.1f}s)")
        _set_best(make_result(t, None, rel_headline, headline_ok),
                  0 if (gate_ok and headline_ok) else 1)
    else:
        _log(f"SKIPPING headline accuracy check ({_left():.0f}s left); "
             f"vs_baseline rests on the dim-matched 3D gate")

    # --- stage 5: pipelined steady-state (budget-gated) ------------------
    # Enqueue BENCH_PIPELINE pairs back-to-back (distinct inputs) and pull
    # every result after the last enqueue. TPU executes in order, so
    # per-call host dispatch (~30 ms each on the bench tunnel) overlaps
    # device execution instead of adding to it — the rate a production host
    # driving back-to-back transforms sees; seconds_per_pair_serial is
    # single-call latency (one dispatch included).
    # depth 8 measures 0.110 s/pair vs depth 4's 0.113 at the headline
    # (more dispatch overlapped); inputs are 8 x 67 MB device copies
    pipe = int(os.environ.get("BENCH_PIPELINE", "8"))
    t_pipe = None
    if pipe > 1 and _left() > (60 if warm else 200):
        mk = jax.jit(lambda x, s: x * s)
        xs = [mk(x, 1.0 + 1e-6 * i) for i in range(pipe)]
        _ = [float(jnp.sum(v)) for v in xs]
        best = None
        for _i in range(2):
            t0 = time.perf_counter()
            outs = [fn(v, pos, batch, plan) for v in xs]
            _ = [float(o) for o in outs]
            dt = (time.perf_counter() - t0) / pipe
            best = dt if best is None else min(best, dt)
        t_pipe = best
        _log(f"pipelined x{pipe}: {t_pipe:.4f}s/pair steady-state "
             f"(serial {t_serial:.4f})")
        t = min(t_serial, t_pipe)
    elif pipe > 1:
        _log(f"SKIPPING pipelined protocol ({_left():.0f}s left)")

    # successful run: the cache now holds executables for exactly these
    # sources — stamp it so the drift guard can certify freshness
    try:
        from torch_nfft_tpu.utils.cache_guard import write_stamp

        write_stamp(cache_dir)
    except OSError as e:
        _log(f"cache stamp write failed: {e}")

    ok = gate_ok and (headline_ok is None or headline_ok)
    result = make_result(t, t_pipe, rel_headline, headline_ok)
    _set_best(result, 0 if ok else 1)
    return _emit(result, 0 if ok else 1)


def main():
    threading.Thread(target=_watchdog, daemon=True).start()
    try:
        code = _run({})
    except BaseException as e:  # noqa: BLE001 — must still emit the JSON line
        import traceback

        traceback.print_exc()
        res = _BEST["result"]
        if res is None:
            res = {
                "metric": "nonuniform points/sec (benchmark crashed)",
                "value": None,
                "unit": "points/sec",
                "vs_baseline": None,
                "extra": {"error": f"{type(e).__name__}: {e}"},
            }
            code = _emit(res, 1)
        else:
            res = dict(res)
            res.setdefault("extra", {})["late_error"] = f"{type(e).__name__}: {e}"
            code = _emit(res, _BEST["exit_code"])
    if code is False:
        code = _BEST["exit_code"]
    return code


if __name__ == "__main__":
    sys.exit(main())
