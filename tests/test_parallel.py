"""Multi-chip shard_map paths vs the single-device transforms.

Runs on the 8-virtual-CPU-device mesh from conftest.py. The sharded results
must match the unsharded ones to float tolerance (same math, one psum).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import torch_nfft_tpu as tn
from torch_nfft_tpu.parallel import (
    make_fastsum_train_step,
    make_mesh,
    nfft_adjoint_sharded,
    nfft_fastsum_sharded,
    nfft_forward_sharded,
)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh({"points": -1})


@pytest.fixture(scope="module")
def mesh2d():
    return make_mesh({"data": 2, "points": -1})


def _points(rng, n, dim, batch_size):
    pos = (rng.random((n, dim)) - 0.5).astype(np.float32)
    pos /= 4 * np.abs(pos).max()
    batch = np.sort(rng.integers(0, batch_size, n)).astype(np.int32)
    batch[: batch_size] = np.arange(batch_size)  # every batch non-empty
    batch = np.sort(batch)
    return pos, batch


def test_mesh_helper():
    mesh = make_mesh()
    assert mesh.shape["points"] == len(jax.devices())
    mesh = make_mesh({"data": 2, "points": -1})
    assert mesh.shape["data"] * mesh.shape["points"] == len(jax.devices())
    with pytest.raises(ValueError):
        make_mesh({"data": 3, "points": -1})


@pytest.mark.parametrize("dim", [1, 2])
def test_adjoint_sharded_matches(mesh, rng, dim):
    n, N, m, B, C = 64, 8, 3, 2, 3
    pos, batch = _points(rng, n, dim, B)
    x = rng.standard_normal((n, C)).astype(np.float32)
    ref = tn.nfft_adjoint(x, pos, batch, bandwidth=N, cutoff=m, batch_size=B)
    got = nfft_adjoint_sharded(
        x, pos, batch, bandwidth=N, cutoff=m, mesh=mesh, batch_size=B
    )
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("dim", [1, 2])
def test_forward_sharded_matches(mesh, rng, dim):
    n, N, m, B, C = 64, 8, 3, 2, 3
    pos, batch = _points(rng, n, dim, B)
    x = (
        rng.standard_normal((B,) + (N,) * dim + (C,))
        + 1j * rng.standard_normal((B,) + (N,) * dim + (C,))
    ).astype(np.complex64)
    ref = tn.nfft_forward(x, pos, batch, cutoff=m, batch_size=B)
    got = nfft_forward_sharded(x, pos, batch, cutoff=m, mesh=mesh, batch_size=B)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_fastsum_sharded_matches(mesh, rng):
    n, N, m, B, C, dim = 64, 8, 3, 2, 2, 2
    pos, batch = _points(rng, n, dim, B)
    x = rng.standard_normal((n, C)).astype(np.float32)
    coeffs = tn.gaussian_analytic_coeffs(0.25, dim=dim, N=N)
    ref = tn.nfft_fastsum(x, coeffs, pos, batch=batch, cutoff=m, batch_size=B)
    got = nfft_fastsum_sharded(
        x, coeffs, pos, batch=batch, cutoff=m, mesh=mesh, batch_size=B
    )
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_fastsum_sharded_cols_axis(mesh2d, rng):
    # Column axis sharded over "data": zero-communication parallelism.
    n, N, m, C, dim = 32, 8, 3, 4, 2
    pos, batch = _points(rng, n, dim, 1)
    x = rng.standard_normal((n, C)).astype(np.float32)
    coeffs = tn.gaussian_analytic_coeffs(0.25, dim=dim, N=N)
    ref = tn.nfft_fastsum(x, coeffs, pos, batch=batch, cutoff=m, batch_size=1)
    got = nfft_fastsum_sharded(
        x, coeffs, pos, batch=batch, cutoff=m,
        mesh=mesh2d, cols_axis="data", batch_size=1,
    )
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_train_step_runs_and_descends(mesh2d, rng):
    B, n, dim, N, m, C = 4, 16, 2, 8, 3, 2
    coeffs = tn.gaussian_analytic_coeffs(0.3, dim=dim, N=N)
    pos = (rng.random((B, n, dim)) - 0.5).astype(np.float32) / 4
    w = jnp.zeros((B, n, C), jnp.float32)
    y = rng.standard_normal((B, n, C)).astype(np.float32)

    lr = 0.02
    step, shardings = make_fastsum_train_step(
        mesh2d, coeffs, batch_size=B, n_per_set=n, cutoff=m, learning_rate=lr
    )
    w = jax.device_put(w, shardings[0])
    pos_d = jax.device_put(jnp.asarray(pos), shardings[1])
    y_d = jax.device_put(jnp.asarray(y), shardings[2])

    w, loss0 = step(w, pos_d, y_d)
    losses = [float(loss0)]
    for _ in range(5):
        w, loss = step(w, pos_d, y_d)
        losses.append(float(loss))
    assert losses[-1] < losses[0]

    # gradient parity vs single-device computation
    def single_loss(w):
        wf = w.reshape(B * n, C)
        posf = jnp.asarray(pos).reshape(B * n, dim)
        bvec = jnp.repeat(jnp.arange(B, dtype=jnp.int32), n)
        pred = tn.nfft_fastsum(
            wf, coeffs, posf, batch=bvec, cutoff=m, batch_size=B
        )
        return jnp.mean((pred.reshape(B, n, C) - jnp.asarray(y)) ** 2) * C

    w0 = jnp.zeros((B, n, C), jnp.float32)
    g_single = jax.grad(single_loss)(w0)
    w1, _ = step(jax.device_put(w0, shardings[0]), pos_d, y_d)
    g_sharded = (w0 - w1) / lr
    np.testing.assert_allclose(np.asarray(g_sharded), np.asarray(g_single), rtol=1e-4, atol=1e-6)


def test_pad_points_roundtrip(mesh, rng):
    from torch_nfft_tpu.parallel import pad_points

    n, dim, N, m = 61, 2, 8, 3  # 61 not divisible by 8 devices
    pos = (rng.random((n, dim)) - 0.5).astype(np.float32) / 4
    x = rng.standard_normal((n, 2)).astype(np.float32)
    batch = np.zeros((n,), np.int32)

    pos_p, x_p, batch_p, n_valid = pad_points(
        pos, x, batch, multiple=mesh.shape["points"]
    )
    assert pos_p.shape[0] % mesh.shape["points"] == 0 and n_valid == n

    ref = tn.nfft_adjoint(x, pos, batch, bandwidth=N, cutoff=m, batch_size=1)
    got = nfft_adjoint_sharded(
        x_p, pos_p, batch_p, bandwidth=N, cutoff=m, mesh=mesh, batch_size=1
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_train_step_with_optax(mesh2d, rng):
    import optax

    B, n, dim, N, m, C = 4, 16, 2, 8, 3, 2
    coeffs = tn.gaussian_analytic_coeffs(0.3, dim=dim, N=N)
    pos = (rng.random((B, n, dim)) - 0.5).astype(np.float32) / 4
    w = jnp.zeros((B, n, C), jnp.float32)
    y = rng.standard_normal((B, n, C)).astype(np.float32)

    opt = optax.adam(5e-2)
    step, shardings = make_fastsum_train_step(
        mesh2d, coeffs, batch_size=B, n_per_set=n, cutoff=m, optimizer=opt
    )
    w = jax.device_put(w, shardings[0])
    pos_d = jax.device_put(jnp.asarray(pos), shardings[1])
    y_d = jax.device_put(jnp.asarray(y), shardings[2])
    state = opt.init(w)

    w, loss0, state = step(w, pos_d, y_d, state)
    for _ in range(8):
        w, loss, state = step(w, pos_d, y_d, state)
    assert float(loss) < float(loss0)


# ---------------------------------------------------------------------------
# Per-shard plans (round 2): the binned engine under shard_map
# ---------------------------------------------------------------------------


def test_adjoint_sharded_with_plans_matches(mesh, rng):
    from torch_nfft_tpu.parallel import build_sharded_plans

    n_dev = mesh.shape["points"]
    n, N, m, B, C, dim = 16 * n_dev, 8, 3, 2, 2, 2
    pos, batch = _points(rng, n, dim, B)
    x = rng.standard_normal((n, C)).astype(np.float32)
    plans = build_sharded_plans(pos, batch, n_shards=n_dev, N=N, m=m, batch_size=B)

    ref = tn.nfft_adjoint(x, pos, batch, bandwidth=N, cutoff=m, batch_size=B)
    got = nfft_adjoint_sharded(
        x, pos, batch, bandwidth=N, cutoff=m, mesh=mesh, batch_size=B, plans=plans
    )
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_forward_sharded_with_plans_matches(mesh, rng):
    from torch_nfft_tpu.parallel import build_sharded_plans

    n_dev = mesh.shape["points"]
    n, N, m, B, C, dim = 16 * n_dev, 8, 3, 2, 2, 2
    pos, batch = _points(rng, n, dim, B)
    x = (
        rng.standard_normal((B,) + (N,) * dim + (C,))
        + 1j * rng.standard_normal((B,) + (N,) * dim + (C,))
    ).astype(np.complex64)
    plans = build_sharded_plans(pos, batch, n_shards=n_dev, N=N, m=m, batch_size=B)

    ref = tn.nfft_forward(x, pos, batch, cutoff=m, batch_size=B)
    got = nfft_forward_sharded(
        x, pos, batch, cutoff=m, mesh=mesh, batch_size=B, plans=plans
    )
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_fastsum_sharded_with_plans_matches(mesh, rng):
    from torch_nfft_tpu.parallel import build_sharded_plans

    n_dev = mesh.shape["points"]
    n, N, m, B, C, dim = 16 * n_dev, 8, 3, 2, 2, 2
    pos, batch = _points(rng, n, dim, B)
    x = rng.standard_normal((n, C)).astype(np.float32)
    coeffs = tn.gaussian_analytic_coeffs(0.25, dim=dim, N=N)
    plans = build_sharded_plans(pos, batch, n_shards=n_dev, N=N, m=m, batch_size=B)

    ref = tn.nfft_fastsum(x, coeffs, pos, batch=batch, cutoff=m, batch_size=B)
    got = nfft_fastsum_sharded(
        x, coeffs, pos, batch=batch, cutoff=m, mesh=mesh, batch_size=B,
        source_plans=plans, target_plans=plans,
    )
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_sharded_plans_gradient_flows(mesh, rng):
    """x-gradient through the planned sharded fastsum (psum included)."""
    from torch_nfft_tpu.parallel import build_sharded_plans

    n_dev = mesh.shape["points"]
    n, N, m, dim = 8 * n_dev, 8, 3, 2
    pos, batch = _points(rng, n, dim, 1)
    x0 = rng.standard_normal((n, 1)).astype(np.float32)
    coeffs = tn.gaussian_analytic_coeffs(0.3, dim=dim, N=N)
    plans = build_sharded_plans(pos, batch, n_shards=n_dev, N=N, m=m, batch_size=1)

    def loss(x):
        y = nfft_fastsum_sharded(
            x, coeffs, pos, batch=batch, cutoff=m, mesh=mesh, batch_size=1,
            source_plans=plans, target_plans=plans,
        )
        return jnp.sum(y**2)

    def loss_ref(x):
        return jnp.sum(tn.nfft_fastsum(x, coeffs, pos, batch=batch, cutoff=m) ** 2)

    g = np.asarray(jax.grad(loss)(jnp.asarray(x0)))
    g_ref = np.asarray(jax.grad(loss_ref)(jnp.asarray(x0)))
    np.testing.assert_allclose(g, g_ref, rtol=1e-3, atol=1e-4)


def test_grid_sharded_spectral_matches_unsharded(rng):
    """Grid-sharded pruned DFT (M1 axis over 8 chips): the adjoint stage
    needs one psum of the N^dim spectrum, the forward stage no collective;
    both must equal the single-device pruned transforms."""
    from jax.sharding import PartitionSpec as P

    from torch_nfft_tpu.ops.fft import (
        spectral_adjoint_pruned_dft,
        spectral_forward_pruned_dft,
    )
    from torch_nfft_tpu.parallel.sharded import (
        spectral_adjoint_pruned_dft_sharded,
        spectral_forward_pruned_dft_sharded,
    )

    dim, N, m, sigma, B, C = 3, 8, 3, 2.0, 2, 2
    M = int(round(sigma * N))
    P_SH = 8
    mesh = jax.make_mesh((P_SH,), ("grid",))

    g = jnp.asarray(
        rng.standard_normal((B, M, M, C, M)).astype(np.float32)
    )  # DFT layout (B, M1, M2, C, M0)

    ref_r, ref_i = spectral_adjoint_pruned_dft(g, None, dim, N, m, sigma, M=M)

    def adj_local(gr):
        return spectral_adjoint_pruned_dft_sharded(
            gr, None, dim, N, m, sigma, "grid", M
        )

    yr, yi = jax.jit(
        jax.shard_map(
            adj_local, mesh=mesh,
            in_specs=(P(None, "grid"),),
            out_specs=(P(), P()),
        )
    )(g)
    np.testing.assert_allclose(np.asarray(yr), np.asarray(ref_r), rtol=2e-4, atol=2e-3)
    np.testing.assert_allclose(np.asarray(yi), np.asarray(ref_i), rtol=2e-4, atol=2e-3)

    xr = jnp.asarray(rng.standard_normal((B,) + (N,) * dim + (C,)).astype(np.float32))
    xi = jnp.asarray(rng.standard_normal(xr.shape).astype(np.float32))
    er, ei = spectral_forward_pruned_dft(xr, xi, dim, M, m, sigma)

    def fwd_local(ar, ai):
        return spectral_forward_pruned_dft_sharded(
            ar, ai, dim, M, m, sigma, "grid", P_SH
        )

    gr_s, gi_s = jax.jit(
        jax.shard_map(
            fwd_local, mesh=mesh,
            in_specs=(P(), P()),
            out_specs=(P(None, "grid"), P(None, "grid")),
        )
    )(xr, xi)
    np.testing.assert_allclose(np.asarray(gr_s), np.asarray(er), rtol=2e-4, atol=2e-3)
    np.testing.assert_allclose(np.asarray(gi_s), np.asarray(ei), rtol=2e-4, atol=2e-3)


# ---------------------------------------------------------------------------
# End-to-end GRID-sharded transforms (grid axis-0 slabs + halo ppermute)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def gmesh():
    return make_mesh({"grid": -1})


@pytest.mark.parametrize("dim,N,m,T", [(2, 64, 4, 16), (3, 32, 3, 8), (3, 64, 4, 16)])
def test_grid_sharded_adjoint_matches_planar(rng, gmesh, dim, N, m, T):
    from torch_nfft_tpu.ops.planar import nfft_adjoint_planar
    from torch_nfft_tpu.parallel import (
        build_grid_sharded_layout,
        nfft_adjoint_grid_sharded,
    )

    n, C = 3000, 2
    pos = (rng.random((n, dim)) - 0.5).astype(np.float32)
    pos /= 4 * np.abs(pos).max()
    x = rng.standard_normal((n, C)).astype(np.float32)
    P = gmesh.devices.size

    lay = build_grid_sharded_layout(pos, n_shards=P, N=N, m=m, T=T)
    yr, yi = nfft_adjoint_grid_sharded(x, lay, gmesh)

    rr, ri = nfft_adjoint_planar(
        jnp.asarray(x), jnp.asarray(pos), jnp.zeros((n,), jnp.int32),
        batch_size=1, N=N, m=m,
    )
    np.testing.assert_allclose(np.asarray(yr), np.asarray(rr), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(yi), np.asarray(ri), rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("dim,N,m,T,real_out", [(2, 64, 4, 16, False), (3, 32, 3, 8, True)])
def test_grid_sharded_forward_matches_planar(rng, gmesh, dim, N, m, T, real_out):
    from torch_nfft_tpu.ops.planar import nfft_forward_planar
    from torch_nfft_tpu.parallel import (
        build_grid_sharded_layout,
        nfft_forward_grid_sharded,
    )

    n, C = 2500, 2
    pos = (rng.random((n, dim)) - 0.5).astype(np.float32)
    pos /= 4 * np.abs(pos).max()
    xr = rng.standard_normal((1,) + (N,) * dim + (C,)).astype(np.float32)
    xi = rng.standard_normal((1,) + (N,) * dim + (C,)).astype(np.float32)
    P = gmesh.devices.size

    lay = build_grid_sharded_layout(pos, n_shards=P, N=N, m=m, T=T)
    yr, yi = nfft_forward_grid_sharded(
        jnp.asarray(xr), jnp.asarray(xi), lay, gmesh, real_output=real_out
    )

    rr, ri = nfft_forward_planar(
        jnp.asarray(xr), jnp.asarray(xi), jnp.asarray(pos),
        jnp.zeros((n,), jnp.int32), batch_size=1, dim=dim, m=m,
    )
    np.testing.assert_allclose(np.asarray(yr), np.asarray(rr), rtol=2e-4, atol=2e-4)
    if real_out:
        assert yi is None
    else:
        np.testing.assert_allclose(np.asarray(yi), np.asarray(ri), rtol=2e-4, atol=2e-4)


def test_grid_sharded_roundtrip_vs_oracle(rng, gmesh):
    """adjoint -> forward through the grid-sharded pair vs the dense NDFT."""
    from torch_nfft_tpu.parallel import (
        build_grid_sharded_layout,
        nfft_adjoint_grid_sharded,
        nfft_forward_grid_sharded,
    )

    n, dim, N, m, T = 1200, 2, 64, 4, 16
    pos = (rng.random((n, dim)) - 0.5).astype(np.float32)
    pos /= 4 * np.abs(pos).max()
    x = rng.standard_normal((n, 1)).astype(np.float32)
    P = gmesh.devices.size

    lay = build_grid_sharded_layout(pos, n_shards=P, N=N, m=m, T=T)
    yr, yi = nfft_adjoint_grid_sharded(x, lay, gmesh)
    zr, _ = nfft_forward_grid_sharded(yr, yi, lay, gmesh, real_output=True)

    spec = tn.ndft_adjoint(x, pos, N=N)
    ref = np.asarray(tn.ndft_forward(np.asarray(spec), pos)).real
    rel = np.linalg.norm(np.asarray(zr) - ref) / np.linalg.norm(ref)
    assert rel < 5e-4, rel


def test_grid_sharded_layout_validation(rng):
    from torch_nfft_tpu.parallel import build_grid_sharded_layout

    pos1d = (rng.random((100, 1)) - 0.5).astype(np.float32) / 2
    with pytest.raises(ValueError, match="dim >= 2"):
        build_grid_sharded_layout(pos1d, n_shards=4, N=32, m=3)

    pos2d = (rng.random((100, 2)) - 0.5).astype(np.float32) / 2
    with pytest.raises(ValueError, match="not divisible"):
        # N=32 -> M=64, T=32 -> nb=2 tiles per axis, not divisible by 8
        build_grid_sharded_layout(pos2d, n_shards=8, N=32, m=4, T=32)

    with pytest.raises(ValueError, match="window halo"):
        # T=8 < E=2m+1=9: the overlap-add spill would cross two tiles
        build_grid_sharded_layout(pos2d, n_shards=4, N=16, m=4, T=8)


def test_grid_sharded_empty_shard(rng, gmesh):
    """A slab with zero points must still produce correct (zero-contribution)
    results via its synthetic filler point."""
    from torch_nfft_tpu.ops.planar import nfft_adjoint_planar
    from torch_nfft_tpu.parallel import (
        build_grid_sharded_layout,
        nfft_adjoint_grid_sharded,
    )

    n, dim, N, m, T = 400, 2, 64, 4, 16
    # confine all points to the first half of axis 0 -> several empty slabs
    pos = (rng.random((n, dim)) - 0.5).astype(np.float32)
    pos /= 4 * np.abs(pos).max()
    pos[:, 0] = -np.abs(pos[:, 0])
    x = rng.standard_normal((n, 1)).astype(np.float32)
    P = gmesh.devices.size

    lay = build_grid_sharded_layout(pos, n_shards=P, N=N, m=m, T=T)
    yr, yi = nfft_adjoint_grid_sharded(x, lay, gmesh)
    rr, ri = nfft_adjoint_planar(
        jnp.asarray(x), jnp.asarray(pos), jnp.zeros((n,), jnp.int32),
        batch_size=1, N=N, m=m,
    )
    np.testing.assert_allclose(np.asarray(yr), np.asarray(rr), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(yi), np.asarray(ri), rtol=2e-4, atol=2e-4)


def test_grid_sharded_fastsum_matches_planar(rng, gmesh):
    from torch_nfft_tpu.ops.planar import nfft_fastsum_real
    from torch_nfft_tpu.parallel import (
        build_grid_sharded_layout,
        nfft_fastsum_grid_sharded,
    )

    n, dim, N, m, T = 1500, 2, 64, 4, 16
    pos = (rng.random((n, dim)) - 0.5).astype(np.float32)
    pos /= 4 * np.abs(pos).max()
    x = rng.standard_normal((n, 2)).astype(np.float32)
    coeffs = np.asarray(tn.gaussian_analytic_coeffs(0.3, dim=dim, N=N))
    P = gmesh.devices.size

    lay = build_grid_sharded_layout(pos, n_shards=P, N=N, m=m, T=T)
    y = nfft_fastsum_grid_sharded(x, coeffs, lay, gmesh)

    batch = jnp.zeros((n,), jnp.int32)
    ref = nfft_fastsum_real(
        jnp.asarray(x), jnp.asarray(coeffs), jnp.asarray(pos),
        jnp.asarray(pos), batch, batch, batch_size=1, N=N, m=m,
    )
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_grid_sharded_fastsum_3d_matches_planar(rng, gmesh):
    """3D N=32 fastsum through the grid-sharded slabs vs the single-device
    planar fastsum (round-3 VERDICT item 5: the 3D fastsum path was only
    2D-tested; the dryrun covers it compile-side, this covers values)."""
    from torch_nfft_tpu.ops.planar import nfft_fastsum_real
    from torch_nfft_tpu.parallel import (
        build_grid_sharded_layout,
        nfft_fastsum_grid_sharded,
    )

    n, dim, N, m, T = 1200, 3, 32, 3, 8
    pos = (rng.random((n, dim)) - 0.5).astype(np.float32)
    pos /= 4 * np.abs(pos).max()
    x = rng.standard_normal((n, 2)).astype(np.float32)
    coeffs = np.asarray(tn.gaussian_analytic_coeffs(0.3, dim=dim, N=N))
    P = gmesh.devices.size

    lay = build_grid_sharded_layout(pos, n_shards=P, N=N, m=m, T=T,
                                    window="es")
    y = nfft_fastsum_grid_sharded(x, coeffs, lay, gmesh)

    batch = jnp.zeros((n,), jnp.int32)
    ref = nfft_fastsum_real(
        jnp.asarray(x), jnp.asarray(coeffs), jnp.asarray(pos),
        jnp.asarray(pos), batch, batch, batch_size=1, N=N, m=m, window="es",
    )
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=2e-4,
                               atol=2e-4)


def test_batch_axis_shards_trivially(rng, mesh):
    """DCN-analogue batch axis: independent point sets sharded over a mesh
    axis, each device transforming locally with ZERO collectives, must match
    the per-member unsharded transforms exactly (block-diagonal batch
    semantics, docs/source/theory/kernelmatrices.rst:32-39)."""
    from jax.sharding import Mesh, PartitionSpec as P

    from torch_nfft_tpu.ops.planar import (
        nfft_adjoint_planar,
        nfft_forward_planar,
    )

    devs = np.asarray(jax.devices())
    bmesh = Mesh(devs, ("batch",))
    B, n_per, dim, N, m = devs.size, 40, 2, 16, 3
    pos = jnp.asarray((rng.random((B, n_per, dim)) - 0.5).astype(np.float32) / 4.0)
    x = jnp.asarray(rng.standard_normal((B, n_per, 1)).astype(np.float32))

    def body(x_l, pos_l):
        zb = jnp.zeros((n_per,), jnp.int32)
        yr, yi = nfft_adjoint_planar(x_l[0], pos_l[0], zb, batch_size=1,
                                     N=N, m=m)
        zr, _ = nfft_forward_planar(yr, yi, pos_l[0], zb, batch_size=1,
                                    dim=dim, m=m, real_output=True)
        return zr[None]

    fn = jax.jit(jax.shard_map(
        body, mesh=bmesh, in_specs=(P("batch"), P("batch")),
        out_specs=P("batch"),
    ))
    got = np.asarray(fn(x, pos))

    for b in range(B):
        zb = jnp.zeros((n_per,), jnp.int32)
        yr, yi = nfft_adjoint_planar(x[b], pos[b], zb, batch_size=1, N=N, m=m)
        zr, _ = nfft_forward_planar(yr, yi, pos[b], zb, batch_size=1,
                                    dim=dim, m=m, real_output=True)
        np.testing.assert_allclose(got[b], np.asarray(zr), rtol=1e-5,
                                   atol=1e-5)


def test_grid_sharded_value_gradients(rng, gmesh):
    """jax.grad flows through the grid-sharded adjoint (shard_map + halo
    ppermute + spectral psum) and matches the single-device planar grad.
    Positions are frozen into the layout (plans + slab packing), so only
    value gradients are defined through this entry point."""
    from torch_nfft_tpu.ops.planar import nfft_adjoint_planar
    from torch_nfft_tpu.parallel import (
        build_grid_sharded_layout,
        nfft_adjoint_grid_sharded,
    )

    n, dim, N, m, T = 800, 2, 64, 4, 16
    pos = (rng.random((n, dim)) - 0.5).astype(np.float32)
    pos /= 4 * np.abs(pos).max()
    x = jnp.asarray(rng.standard_normal((n, 1)).astype(np.float32))
    P = gmesh.devices.size
    lay = build_grid_sharded_layout(pos, n_shards=P, N=N, m=m, T=T)

    def loss_sharded(x_):
        yr, yi = nfft_adjoint_grid_sharded(x_, lay, gmesh)
        return jnp.sum(yr**2 + yi**2)

    batch = jnp.zeros((n,), jnp.int32)

    def loss_planar(x_):
        yr, yi = nfft_adjoint_planar(
            x_, jnp.asarray(pos), batch, batch_size=1, N=N, m=m
        )
        return jnp.sum(yr**2 + yi**2)

    g_s = jax.grad(loss_sharded)(x)
    g_p = jax.grad(loss_planar)(x)
    sc = float(jnp.abs(g_p).max())
    np.testing.assert_allclose(np.asarray(g_s), np.asarray(g_p), atol=2e-4 * sc)


def test_train_step_planar_matches_complex(mesh2d, rng):
    """The complex-free (planar) training-step path — what the axon TPU
    runtime executes — produces the same loss and update as the complex
    path on a backend that supports both."""
    from torch_nfft_tpu.ops.nfft import set_complex_override

    B, n, dim, N, m, C = 4, 16, 2, 8, 3, 2
    coeffs = tn.gaussian_analytic_coeffs(0.3, dim=dim, N=N)
    pos = (rng.random((B, n, dim)) - 0.5).astype(np.float32) / 4
    w0 = jnp.asarray(rng.standard_normal((B, n, C)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((B, n, C)).astype(np.float32))

    def one_step():
        step, shardings = make_fastsum_train_step(
            mesh2d, coeffs, batch_size=B, n_per_set=n, cutoff=m,
            learning_rate=0.05,
        )
        w = jax.device_put(w0, shardings[0])
        pos_d = jax.device_put(jnp.asarray(pos), shardings[1])
        y_d = jax.device_put(y, shardings[2])
        w1, loss = step(w, pos_d, y_d)
        return np.asarray(w1), float(loss)

    try:
        set_complex_override(False)
        w_p, loss_p = one_step()
    finally:
        set_complex_override(None)
    w_c, loss_c = one_step()

    assert abs(loss_p - loss_c) < 1e-5 * max(1.0, abs(loss_c))
    np.testing.assert_allclose(w_p, w_c, rtol=1e-4, atol=1e-6)


def test_sharded_plan_window_mismatch_fails_loudly(mesh, rng):
    """A plan whose window geometry disagrees with the transform's would
    spread with one window and deconvolve with the other — before round 3's
    fix this silently produced rel-L2 ~0.7 garbage; now every sharded entry
    point validates the stacked plans' geometry up front."""
    from torch_nfft_tpu.parallel import build_sharded_plans
    from torch_nfft_tpu.parallel.sharded import fastsum_local

    n_dev = mesh.shape["points"]
    n, N, m, B, C, dim = 16 * n_dev, 8, 2, 1, 1, 2
    pos, batch = _points(rng, n, dim, B)
    x = rng.standard_normal((n, C)).astype(np.float32)
    plans = build_sharded_plans(pos, batch, n_shards=n_dev, N=N, m=m,
                                batch_size=B)  # default gaussian window

    with pytest.raises(ValueError, match="window"):
        nfft_adjoint_sharded(
            x, pos, batch, bandwidth=N, cutoff=m, mesh=mesh, batch_size=B,
            plans=plans, window="es",
        )
    xs = (rng.standard_normal((B,) + (N,) * dim + (C,))).astype(np.complex64)
    with pytest.raises(ValueError, match="window"):
        nfft_forward_sharded(
            xs, pos, batch, cutoff=m, mesh=mesh, batch_size=B,
            plans=plans, window="es",
        )
    coeffs = tn.gaussian_analytic_coeffs(0.3, dim=dim, N=N)
    with pytest.raises(ValueError, match="window"):
        nfft_fastsum_sharded(
            x, coeffs, pos, batch=batch, cutoff=m, mesh=mesh, batch_size=B,
            source_plans=plans, target_plans=plans, window="es",
        )
    # the standalone per-shard body checks too (what shard_map bodies call)
    sp = tn.build_plan(pos, batch, N=N, m=m, batch_size=B)
    with pytest.raises(ValueError, match="window"):
        fastsum_local(
            jnp.asarray(x), jnp.asarray(pos), jnp.asarray(batch),
            jnp.asarray(pos), jnp.asarray(batch), coeffs,
            batch_size=B, N=N, m=m, window="es", source_plan=sp,
        )
    # a sigma mismatch is caught by the same check
    with pytest.raises(ValueError, match="sigma"):
        nfft_adjoint_sharded(
            x, pos, batch, bandwidth=N, cutoff=m, mesh=mesh, batch_size=B,
            plans=plans, sigma=1.5,
        )


@pytest.mark.parametrize("transform", ["adjoint", "forward", "fastsum"])
def test_grid_sharded_pallas_engine_parity(rng, gmesh, monkeypatch, transform):
    """The fused Pallas engines inside the grid-sharded shard bodies
    (TORCH_NFFT_TPU_SHARD_PALLAS=1 forces them in interpret mode on the CPU
    mesh) must match the portable XLA engine exactly (same math, different
    schedule)."""
    monkeypatch.setenv("TORCH_NFFT_TPU_KERNEL_PRECISION", "highest")
    from torch_nfft_tpu.ops.coeffs import gaussian_analytic_coeffs
    from torch_nfft_tpu.parallel import (
        build_grid_sharded_layout,
        nfft_adjoint_grid_sharded,
        nfft_fastsum_grid_sharded,
        nfft_forward_grid_sharded,
    )

    dim, N, m, T = 3, 32, 3, 8
    n, C = 2500, 2
    pos = (rng.random((n, dim)) - 0.5).astype(np.float32)
    pos /= 4 * np.abs(pos).max()
    x = rng.standard_normal((n, C)).astype(np.float32)
    P = gmesh.devices.size
    # K=128 so pallas_supported holds for the per-shard plans
    lay = build_grid_sharded_layout(pos, n_shards=P, N=N, m=m, T=T, K=128)

    def run():
        if transform == "adjoint":
            yr, yi = nfft_adjoint_grid_sharded(x, lay, gmesh)
            return np.asarray(yr), np.asarray(yi)
        if transform == "forward":
            rng2 = np.random.default_rng(3)
            xr = jnp.asarray(
                rng2.standard_normal((1,) + (N,) * dim + (C,))
                .astype(np.float32))
            xi = jnp.asarray(
                rng2.standard_normal((1,) + (N,) * dim + (C,))
                .astype(np.float32))
            yr, yi = nfft_forward_grid_sharded(xr, xi, lay, gmesh)
            return np.asarray(yr), np.asarray(yi)
        coeffs = gaussian_analytic_coeffs(0.35, dim, N)
        return (np.asarray(nfft_fastsum_grid_sharded(x, coeffs, lay, gmesh)),)

    monkeypatch.setenv("TORCH_NFFT_TPU_SHARD_PALLAS", "1")
    got = run()
    monkeypatch.setenv("TORCH_NFFT_TPU_SHARD_PALLAS", "0")
    ref = run()
    for g, r in zip(got, ref):
        np.testing.assert_allclose(g, r, rtol=1e-4, atol=1e-4)
