"""Exp-sqrt ("es") window: accuracy, engine parity, gradients, plan checks.

The es window (ops/window.py) is an extension over the reference's fixed
truncated Gaussian (spatial_window_operations.cu:3-28): at equal support
width it is orders of magnitude more accurate, so the same accuracy comes at
a smaller cutoff m — (2m+2)^dim less window work — and it tolerates lower
oversampling sigma."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import torch_nfft_tpu as tn


def _safe_points(rng, n, dim):
    pos = (rng.random((n, dim), dtype=np.float32) - 0.5)
    return pos / (4 * np.abs(pos).max())


def _rel(a, b):
    a = np.asarray(a)
    b = np.asarray(b)
    return float(np.linalg.norm(a - b) / np.linalg.norm(b))


def test_es_beats_gaussian_at_equal_m(rng):
    """es at m=2 reaches better accuracy than the Gaussian at m=4."""
    n, dim, N = 1500, 2, 32
    pos = _safe_points(rng, n, dim)
    x = rng.standard_normal((n, 2)).astype(np.float32)
    yr = np.asarray(tn.ndft_adjoint(x, pos, N=N))
    err_es2 = _rel(tn.nfft_adjoint(x, pos, bandwidth=N, cutoff=2,
                                   window="es", strategy="scatter"), yr)
    err_g4 = _rel(tn.nfft_adjoint(x, pos, bandwidth=N, cutoff=4,
                                  strategy="scatter"), yr)
    err_es4 = _rel(tn.nfft_adjoint(x, pos, bandwidth=N, cutoff=4,
                                   window="es", strategy="scatter"), yr)
    assert err_es2 < err_g4 < 2e-4
    assert err_es4 < 1e-5  # f32-floor class


@pytest.mark.parametrize("strategy", ["scatter", "matmul", "binned"])
def test_es_adjoint_engines_agree_with_oracle(rng, strategy):
    n, dim, N, m = 1200, 2, 32, 2
    pos = _safe_points(rng, n, dim)
    x = rng.standard_normal((n, 3)).astype(np.float32)
    y = tn.nfft_adjoint(x, pos, bandwidth=N, cutoff=m, window="es",
                        strategy=strategy)
    yr = tn.ndft_adjoint(x, pos, N=N)
    assert _rel(y, yr) < 3e-5


def test_es_forward_vs_oracle(rng):
    n, dim, N, m = 800, 2, 32, 2
    pos = _safe_points(rng, n, dim)
    x = (rng.standard_normal((1, N, N, 2))
         + 1j * rng.standard_normal((1, N, N, 2))).astype(np.complex64)
    y = tn.nfft_forward(x, pos, cutoff=m, window="es", strategy="scatter")
    yr = tn.ndft_forward(x, pos)
    assert _rel(y, yr) < 3e-5


def test_es_lower_oversampling(rng):
    """es keeps ~1e-4-class accuracy at sigma=1.5 where the grid has
    (1.5/2)^dim the volume; the Gaussian window degrades badly there."""
    n, dim, N = 1200, 2, 32
    pos = _safe_points(rng, n, dim)
    x = rng.standard_normal((n, 2)).astype(np.float32)
    yr = np.asarray(tn.ndft_adjoint(x, pos, N=N))
    err_es = _rel(tn.nfft_adjoint(x, pos, bandwidth=N, cutoff=3, sigma=1.5,
                                  window="es", strategy="scatter"), yr)
    err_g = _rel(tn.nfft_adjoint(x, pos, bandwidth=N, cutoff=3, sigma=1.5,
                                 strategy="scatter"), yr)
    assert err_es < 1e-5
    assert err_es < err_g / 50


def test_es_fastsum_vs_trig_oracle(rng):
    n, dim, N, m = 200, 2, 16, 2
    pos = _safe_points(rng, n, dim)
    x = rng.standard_normal((n, 2)).astype(np.float32)
    coeffs = np.asarray(tn.gaussian_analytic_coeffs(0.3, dim=dim, N=N))
    y = np.asarray(tn.nfft_fastsum(x, coeffs, pos, cutoff=m, window="es",
                                   strategy="scatter"))
    A = np.asarray(tn.exact_trigonometric_matrix(coeffs, pos)).real
    assert _rel(y, A @ x) < 2e-5


def test_es_planar_fold_plan(rng):
    """The fold/pruned-DFT pipeline (the TPU hot path) with an es plan."""
    n, dim, N, m = 1500, 2, 32, 2
    pos = _safe_points(rng, n, dim)
    x = rng.standard_normal((n, 2)).astype(np.float32)
    plan = tn.build_plan(pos, None, N=N, m=m, window="es")
    yr, yi = tn.nfft_adjoint_planar(
        x, pos, np.zeros(n, np.int32), plan, batch_size=1, N=N, m=m,
        window="es",
    )
    o = np.asarray(tn.ndft_adjoint(x, pos, N=N))
    assert _rel(np.asarray(yr) + 1j * np.asarray(yi), o) < 3e-5
    # round trip back through the forward pipeline
    zr, _ = tn.nfft_forward_planar(
        yr, yi, pos, np.zeros(n, np.int32), plan, batch_size=1, dim=dim, m=m,
        real_output=True, window="es",
    )
    zo = np.asarray(tn.ndft_forward(np.asarray(yr) + 1j * np.asarray(yi), pos)).real
    assert _rel(zr, zo) < 3e-5


def test_es_pallas_interpret_matches_xla(rng, monkeypatch):
    """The fused Pallas kernels evaluate the es window identically to the
    XLA fold engine (interpret mode on CPU)."""
    monkeypatch.setenv("TORCH_NFFT_TPU_KERNEL_PRECISION", "highest")
    from torch_nfft_tpu.ops.binned import (
        _gather_pallas,
        _gather_xla,
        _spread_pallas,
        _spread_xla,
        build_plan,
    )
    from torch_nfft_tpu.ops.pallas.contract import pallas_supported

    n, dim, N, m, B, C = 200, 3, 8, 2, 2, 2
    pos = (rng.random((n, dim), dtype=np.float32) - 0.5) / 2.0
    batch = np.sort(rng.integers(0, B, n)).astype(np.int32)
    plan = build_plan(pos, batch, N=N, m=m, batch_size=B, K=128, window="es")
    assert pallas_supported(plan, C)
    x = rng.standard_normal((n, C)).astype(np.float32)

    g_p = _spread_pallas(plan, jnp.asarray(x), jnp.asarray(pos), B)
    g_x = _spread_xla(plan, jnp.asarray(x), jnp.asarray(pos), B)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x), rtol=1e-5, atol=1e-5)

    y_p = _gather_pallas(plan, g_x, jnp.asarray(pos))
    y_x = _gather_xla(plan, g_x, jnp.asarray(pos))
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_x), rtol=1e-5, atol=1e-5)


def test_es_gradients_match_fd(rng):
    n, dim, N, m = 40, 2, 16, 2
    pos = ((rng.random((n, dim), dtype=np.float32) - 0.5) / 2.5)
    x = rng.standard_normal((n, 1)).astype(np.float32)

    def loss(x_, pos_):
        y = tn.nfft_adjoint(x_, pos_, bandwidth=N, cutoff=m, window="es",
                            strategy="scatter")
        return jnp.sum(jnp.abs(y) ** 2)

    g_x, g_p = jax.grad(loss, argnums=(0, 1))(jnp.asarray(x), jnp.asarray(pos))
    eps = 1e-3
    for arr, g, ij, wrt in [(x, g_x, (3, 0), "x"), (pos, g_p, (5, 1), "pos")]:
        ap = arr.copy(); ap[ij] += eps
        am = arr.copy(); am[ij] -= eps
        if wrt == "x":
            fd = (loss(jnp.asarray(ap), jnp.asarray(pos))
                  - loss(jnp.asarray(am), jnp.asarray(pos))) / (2 * eps)
        else:
            fd = (loss(jnp.asarray(x), jnp.asarray(ap))
                  - loss(jnp.asarray(x), jnp.asarray(am))) / (2 * eps)
        assert abs(float(fd) - float(g[ij])) < 2e-2 * max(1.0, abs(float(fd)))


def test_window_plan_mismatch_fails_loudly(rng):
    n, dim, N, m = 300, 2, 16, 2
    pos = _safe_points(rng, n, dim)
    x = rng.standard_normal((n, 1)).astype(np.float32)
    plan = tn.build_plan(pos, None, N=N, m=m, window="es")
    with pytest.raises(ValueError, match="window"):
        tn.nfft_adjoint(x, pos, bandwidth=N, cutoff=m, plan=plan)
    with pytest.raises(ValueError, match="window"):
        tn.nfft_adjoint_planar(x, pos, np.zeros(n, np.int32), plan,
                               batch_size=1, N=N, m=m)


def test_unknown_window_rejected(rng):
    pos = _safe_points(rng, 50, 2)
    x = np.ones((50, 1), np.float32)
    with pytest.raises(ValueError, match="unknown window"):
        tn.nfft_adjoint(x, pos, bandwidth=16, cutoff=2, window="kaiser",
                        strategy="scatter")


def test_es_streamed_and_sharded(rng):
    """Streamed batched path and the point-sharded path both honor es."""
    n, dim, N, m, B = 600, 2, 16, 2, 2
    pos = _safe_points(rng, n, dim)
    batch = np.sort(rng.integers(0, B, n)).astype(np.int32)
    x = rng.standard_normal((n, 2)).astype(np.float32)

    layout = tn.make_streamed_layout(pos, batch, batch_size=B, N=N, m=m,
                                     window="es")
    yr, yi = tn.nfft_adjoint_streamed(x, layout)
    o = np.asarray(tn.ndft_adjoint(x, pos, batch, N=N))
    assert _rel(np.asarray(yr) + 1j * np.asarray(yi), o) < 3e-5

    mesh = tn.parallel.make_mesh({"points": -1})
    n_pad = tn.parallel.pad_points  # noqa: F841 (API presence)
    plans = tn.parallel.build_sharded_plans(
        pos, batch, n_shards=mesh.shape["points"], N=N, m=m, window="es"
    )
    y_sh = tn.parallel.nfft_adjoint_sharded(
        x, pos, batch, bandwidth=N, cutoff=m, mesh=mesh, plans=plans,
        window="es",
    )
    assert _rel(np.asarray(y_sh), o) < 3e-5


def test_es_operator_layer(rng):
    """GaussianKernel/GramMatrix honor window=: es at m=2 reproduces the
    gaussian m=4 operator (both approximate the same kernel), the CG solve
    runs in slot layout with complex interpolated coeffs coerced real, and
    the window survives pytree round-trips."""
    pos = ((rng.random((80, 2)) * 2 - 1) * 3.0).astype(np.float32)
    kg = tn.GaussianKernel(1.0, dim=2, bandwidth=16, cutoff=4)
    ke = tn.GaussianKernel(1.0, dim=2, bandwidth=16, cutoff=2, window="es")
    Ag = np.asarray(kg(pos).to_dense())
    Ae = np.asarray(ke(pos).to_dense())
    assert np.abs(Ag - Ae).max() < 5e-5

    G = ke(pos)
    b = rng.standard_normal(80).astype(np.float32)
    z = np.asarray(G.solve(b, reg=1e-1))
    resid = np.asarray(G @ z) + 1e-1 * z - b
    assert np.linalg.norm(resid) / np.linalg.norm(b) < 1e-4

    k2 = jax.tree.map(lambda a: a, ke)
    assert k2.window == "es"
    G2 = jax.tree.map(lambda a: a, G)
    assert G2.window == "es"


def test_suggest_window_parameters(rng):
    """The suggested configuration actually reaches the requested accuracy
    (measured against the dense oracle), and is monotone in tol."""
    n, dim, N = 1200, 2, 32
    pos = _safe_points(rng, n, dim)
    x = rng.standard_normal((n, 2)).astype(np.float32)
    yr = np.asarray(tn.ndft_adjoint(x, pos, N=N))
    ms = []
    for tol in (1e-3, 1e-4):
        p = tn.suggest_window_parameters(tol)
        ms.append(p["m"])
        err = _rel(
            tn.nfft_adjoint(x, pos, bandwidth=N, cutoff=p["m"],
                            sigma=p["sigma"], window=p["window"],
                            strategy="scatter"),
            yr,
        )
        assert err <= tol, (tol, p, err)
        assert err <= p["predicted_rel_l2"], (p, err)  # the bound is honest
    assert ms == sorted(ms)
    # tolerances below the ~4e-5 TPU HIGH-matmul pipeline floor warn and
    # return the most accurate config (CPU backends measure lower, but the
    # model bounds the production TPU path — see _es_error_model)
    with pytest.warns(UserWarning, match="reachable"):
        assert tn.suggest_window_parameters(1e-5)["m"] <= 8
    with pytest.warns(UserWarning, match="reachable"):
        assert tn.suggest_window_parameters(1e-12)["m"] <= 8


def test_suggest_window_parameters_low_sigma(rng):
    """At sigma=1.25 the f32 deconvolution floor is ~5e-5; the chooser must
    not promise tolerances below it (it used to suggest m=4 for tol=1e-5
    where the measured error is ~4e-5), and what it does promise must be
    met against the dense oracle."""
    sigma = 1.25
    # tol below the sigma-1.25 floor: warn instead of a false promise
    with pytest.warns(UserWarning, match="Raising sigma"):
        tn.suggest_window_parameters(1e-5, sigma=sigma)

    # a feasible tolerance is actually met at this sigma
    n, dim, N = 1200, 2, 32
    pos = _safe_points(rng, n, dim)
    x = rng.standard_normal((n, 2)).astype(np.float32)
    yr = np.asarray(tn.ndft_adjoint(x, pos, N=N))
    tol = 1e-3
    p = tn.suggest_window_parameters(tol, sigma=sigma)
    err = _rel(
        tn.nfft_adjoint(x, pos, bandwidth=N, cutoff=p["m"], sigma=p["sigma"],
                        window=p["window"], strategy="scatter"),
        yr,
    )
    assert err <= tol, (p, err)


def test_es_error_model_upper_bound_3d(rng):
    """The es error model must stay an upper bound where it extrapolates
    from its 2D N=32 calibration: 3D, sigma at both ends (1.25 / 3.0).
    CPU-sized subset of examples/validate_window_model.py (the full sweep
    incl. N=256 runs there; results in BASELINE.md)."""
    from torch_nfft_tpu.ops.planar import nfft_adjoint_planar
    from torch_nfft_tpu.ops.window import _es_error_model

    n, dim, N = 1500, 3, 32
    pos = _safe_points(rng, n, dim)
    x = rng.standard_normal((n, 1)).astype(np.float32)
    batch = jnp.zeros((n,), jnp.int32)
    ref = np.asarray(tn.ndft_adjoint(x, pos, N=N))[..., 0]

    for sigma in (1.25, 3.0):
        for m in (2, 3):
            yr, yi = nfft_adjoint_planar(
                jnp.asarray(x), jnp.asarray(pos), batch, batch_size=1,
                N=N, m=m, sigma=sigma, window="es",
            )
            got = (np.asarray(yr)[0, ..., 0]
                   + 1j * np.asarray(yi)[0, ..., 0])
            err = np.linalg.norm(got - ref) / np.linalg.norm(ref)
            model = _es_error_model(m, sigma)
            assert err <= model, (sigma, m, err, model)


def test_es_grid_sharded(rng):
    """Grid-sharded adjoint with an es layout matches the es planar path
    on the 8-virtual-device CPU mesh."""
    from torch_nfft_tpu.parallel import (
        build_grid_sharded_layout,
        make_mesh,
        nfft_adjoint_grid_sharded,
    )

    n, dim, N, m, T, C = 3000, 2, 64, 2, 16, 2
    pos = _safe_points(rng, n, dim)
    x = rng.standard_normal((n, C)).astype(np.float32)
    mesh = make_mesh({"grid": -1})
    P = mesh.devices.size

    lay = build_grid_sharded_layout(pos, n_shards=P, N=N, m=m, T=T,
                                    window="es")
    yr, yi = nfft_adjoint_grid_sharded(x, lay, mesh)

    rr, ri = tn.nfft_adjoint_planar(
        jnp.asarray(x), jnp.asarray(pos), jnp.zeros((n,), jnp.int32),
        batch_size=1, N=N, m=m, window="es",
    )
    np.testing.assert_allclose(np.asarray(yr), np.asarray(rr), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(yi), np.asarray(ri), rtol=2e-4, atol=2e-4)
    # and the result is actually accurate vs the oracle
    o = np.asarray(tn.ndft_adjoint(x, pos, N=N))
    assert _rel(np.asarray(yr) + 1j * np.asarray(yi), o) < 3e-5


def test_es_fused_backward_matches_xla_vjp(rng, monkeypatch):
    """The fused Pallas VJP (derivative-window kernel) evaluates the es
    window derivative identically to differentiating the XLA engine."""
    monkeypatch.setenv("TORCH_NFFT_TPU_KERNEL_PRECISION", "highest")
    monkeypatch.setenv("TORCH_NFFT_TPU_FUSED_BWD", "1")
    from torch_nfft_tpu.ops.binned import (
        _gather_pallas_cv,
        _gather_xla,
        _spread_pallas_cv,
        _spread_xla,
        build_plan,
    )

    n, dim, N, m, B, C = 200, 3, 8, 2, 2, 2
    pos = (rng.random((n, dim), dtype=np.float32) - 0.5) / 2.0
    batch = np.sort(rng.integers(0, B, n)).astype(np.int32)
    plan = build_plan(pos, batch, N=N, m=m, batch_size=B, K=128, window="es")
    x = jnp.asarray(rng.standard_normal((n, C)).astype(np.float32))
    M = 2 * N
    g = jnp.asarray(rng.standard_normal((B * M**dim, C)).astype(np.float32))
    p = jnp.asarray(pos)

    def check(got, ref):
        for a, b in zip(got, ref):
            sc = max(1e-6, float(jnp.abs(b).max()))
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-5 * sc
            )

    check(
        jax.grad(
            lambda a, b: jnp.vdot(_spread_pallas_cv(B, plan, a, b), g),
            argnums=(0, 1),
        )(x, p),
        jax.grad(
            lambda a, b: jnp.vdot(_spread_xla(plan, a, b, B), g),
            argnums=(0, 1),
        )(x, p),
    )
    check(
        jax.grad(
            lambda a, b: jnp.vdot(_gather_pallas_cv(plan, a, b), x),
            argnums=(0, 1),
        )(g, p),
        jax.grad(
            lambda a, b: jnp.vdot(_gather_xla(plan, a, b), x),
            argnums=(0, 1),
        )(g, p),
    )


@pytest.mark.parametrize("dim,N", [(1, 64), (3, 16)])
def test_es_other_dims(rng, dim, N):
    """es parity in 1D (four-step planar territory) and 3D."""
    n, m = 900, 2
    pos = _safe_points(rng, n, dim)
    x = rng.standard_normal((n, 2)).astype(np.float32)
    y = tn.nfft_adjoint(x, pos, bandwidth=N, cutoff=m, window="es",
                        strategy="binned")
    yr = tn.ndft_adjoint(x, pos, N=N)
    assert _rel(y, yr) < 5e-5


# ---------------------------------------------------------------------------
# Kaiser-Bessel window family
# ---------------------------------------------------------------------------


def test_kb_beats_es_at_m2():
    """The draw of kb: ~2x better accuracy than es at m=2 across sigma
    (CPU oracle; the sigma lever's enabling fact for sigma <= 1.5)."""
    import jax.numpy as jnp

    from torch_nfft_tpu.ops.planar import nfft_adjoint_planar

    def gate(window, sigma, m, dim=2, N=32, n=400):
        rng = np.random.default_rng(0)
        pos = (rng.random((n, dim), dtype=np.float32) - 0.5)
        pos /= 4 * np.abs(pos).max()
        x = rng.standard_normal((n, 2)).astype(np.float32)
        batch = np.zeros((n,), np.int32)
        yr, yi = nfft_adjoint_planar(
            jnp.asarray(x), jnp.asarray(pos), jnp.asarray(batch),
            batch_size=1, N=N, m=m, sigma=sigma, window=window,
        )
        got = np.asarray(yr)[0] + 1j * np.asarray(yi)[0]
        k = np.arange(N) - N // 2
        grids = np.meshgrid(*([k] * dim), indexing="ij")
        phase = np.zeros((N**dim, n))
        for d in range(dim):
            phase = phase + grids[d].reshape(-1, 1) * pos[:, d]
        ref = (np.exp(2j * np.pi * phase) @ x.astype(np.complex128))
        ref = ref.reshape(got.shape)
        return float(np.linalg.norm(got - ref) / np.linalg.norm(ref))

    for sigma in (2.0, 1.5):
        kb = gate("kb", sigma, 2)
        es = gate("es", sigma, 2)
        assert kb < es  # sharper spectral decay
        assert kb < 5e-5


def test_kb_i0_i1_match_reference():
    import jax.numpy as jnp
    from scipy import special  # available transitively? fall back below

    from torch_nfft_tpu.ops.window import _i0, _i1

    # f32 evaluation (the kernels' dtype): A&S approximation error ~1e-7
    # plus f32 rounding of exp(x) for x up to ~30
    x = np.linspace(0.0, 30.0, 200)
    got0 = np.asarray(_i0(jnp.asarray(x, jnp.float32))).astype(np.float64)
    ref0 = np.i0(x)
    np.testing.assert_allclose(got0, ref0, rtol=1e-5)
    got1 = np.asarray(_i1(jnp.asarray(x, jnp.float32))).astype(np.float64)
    ref1 = special.i1(x)
    np.testing.assert_allclose(got1, ref1, rtol=1e-5, atol=1e-12)


def test_kb_deriv_matches_finite_difference():
    import jax.numpy as jnp

    from torch_nfft_tpu.ops.window import (
        window_value_and_deriv_fn,
        window_value_fn,
    )

    from scipy import special

    from torch_nfft_tpu.ops.window import kb_beta

    m, sigma, M = 3, 1.5, 48
    w = m + 1.0
    beta = kb_beta(m, sigma)
    pair = window_value_and_deriv_fn(m, sigma, "kb", M=M)
    t64 = np.linspace(-m - 0.8, m + 0.8, 301)
    vals, dvals = pair(jnp.asarray(t64, jnp.float32))

    # float64 numpy reference of the same formulas
    s = np.sqrt(np.maximum(1.0 - (t64 / w) ** 2, 0.0))
    inside = 1.0 - (t64 / w) ** 2 > 0
    ref_v = np.where(inside, np.i0(beta * s) / np.i0(beta), 0.0)
    ref_d = np.where(
        inside,
        -beta * M * t64 / (w * w * np.maximum(s, 1e-12))
        * special.i1(beta * s) / np.i0(beta),
        0.0,
    )
    # the analytic formula itself, checked by f64 finite differences
    eps = 1e-7
    sp = np.sqrt(np.maximum(1.0 - ((t64 + eps) / w) ** 2, 0.0))
    sm = np.sqrt(np.maximum(1.0 - ((t64 - eps) / w) ** 2, 0.0))
    fd = (np.i0(beta * sp) - np.i0(beta * sm)) / (2 * eps) / np.i0(beta) * M
    np.testing.assert_allclose(ref_d[inside], fd[inside], rtol=5e-4,
                               atol=1e-5)
    # the f32 jnp implementation against the f64 reference
    np.testing.assert_allclose(np.asarray(vals), ref_v, rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(dvals), ref_d, rtol=2e-4,
                               atol=2e-3)


def test_kb_through_binned_engines(monkeypatch):
    """kb threads through the plan + Pallas engines (interpret mode) like
    any other family."""
    import jax.numpy as jnp

    from torch_nfft_tpu.ops.binned import (
        _spread_pallas,
        _spread_xla,
        build_plan,
    )

    monkeypatch.setenv("TORCH_NFFT_TPU_KERNEL_PRECISION", "highest")
    rng = np.random.default_rng(2)
    n, dim, N, m = 250, 3, 8, 2
    pos = (rng.random((n, dim), dtype=np.float32) - 0.5)
    pos /= 4 * np.abs(pos).max()
    batch = np.zeros((n,), np.int32)
    plan = build_plan(pos, batch, N=N, m=m, batch_size=1, K=128, window="kb")
    x = rng.standard_normal((n, 1)).astype(np.float32)
    g_p = _spread_pallas(plan, jnp.asarray(x), jnp.asarray(pos), 1)
    g_x = _spread_xla(plan, jnp.asarray(x), jnp.asarray(pos), 1)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x),
                               rtol=1e-5, atol=1e-5)


def test_suggest_considers_kb():
    from torch_nfft_tpu.ops.window import suggest_window_parameters

    p = suggest_window_parameters(1e-4, sigma=1.5)
    assert p["window"] in ("es", "kb")
    assert p["predicted_rel_l2"] <= 1e-4
    # at low sigma + small m the kb model is strictly better than es's, so
    # a tolerance only kb can meet at m=2 must select kb
    from torch_nfft_tpu.ops.window import _pipeline_floor, _window_error_model

    floor = _pipeline_floor()
    e_es = _window_error_model("es", 2, 1.5, floor)
    e_kb = _window_error_model("kb", 2, 1.5, floor)
    assert e_kb < e_es
