"""Planar matmul DFT vs numpy's FFT (both directions, direct + four-step)."""

import numpy as np
import pytest

from torch_nfft_tpu.ops.fft import DIRECT_MAX, dft_planar, fftn_planar


@pytest.mark.parametrize("M", [8, 32, 128, 256, 512])  # >128 exercises four-step
def test_dft_1d_matches_numpy(rng, M):
    x = (rng.standard_normal((3, M)) + 1j * rng.standard_normal((3, M))).astype(
        np.complex64
    )
    yr, yi = dft_planar(x.real.copy(), x.imag.copy(), axis=1, sign=-1)
    ref = np.fft.fft(x, axis=1)
    np.testing.assert_allclose(np.asarray(yr) + 1j * np.asarray(yi), ref, rtol=1e-4, atol=1e-3)

    yr, yi = dft_planar(x.real.copy(), x.imag.copy(), axis=1, sign=+1)
    ref = np.fft.ifft(x, axis=1) * M  # unnormalized inverse
    np.testing.assert_allclose(np.asarray(yr) + 1j * np.asarray(yi), ref, rtol=1e-4, atol=1e-3)


def test_dft_real_input(rng):
    x = rng.standard_normal((4, 160)).astype(np.float32)  # 160 = 10*16 four-step
    yr, yi = dft_planar(x, None, axis=1, sign=-1)
    ref = np.fft.fft(x, axis=1)
    np.testing.assert_allclose(np.asarray(yr) + 1j * np.asarray(yi), ref, rtol=1e-4, atol=1e-3)


def test_dft_middle_axis(rng):
    x = (rng.standard_normal((2, 64, 3)) + 1j * rng.standard_normal((2, 64, 3))).astype(
        np.complex64
    )
    yr, yi = dft_planar(x.real.copy(), x.imag.copy(), axis=1, sign=-1)
    ref = np.fft.fft(x, axis=1)
    np.testing.assert_allclose(np.asarray(yr) + 1j * np.asarray(yi), ref, rtol=1e-4, atol=1e-3)


def test_fftn_planar_2d(rng):
    x = (rng.standard_normal((2, 32, 32, 2)) + 1j * rng.standard_normal((2, 32, 32, 2))).astype(
        np.complex64
    )
    yr, yi = fftn_planar(x.real.copy(), x.imag.copy(), axes=(1, 2), sign=-1)
    ref = np.fft.fftn(x, axes=(1, 2))
    np.testing.assert_allclose(np.asarray(yr) + 1j * np.asarray(yi), ref, rtol=1e-4, atol=1e-3)


def test_roundtrip(rng):
    x = (rng.standard_normal((256,)) + 1j * rng.standard_normal((256,))).astype(np.complex64)
    yr, yi = dft_planar(x.real.copy(), x.imag.copy(), axis=0, sign=-1)
    zr, zi = dft_planar(yr, yi, axis=0, sign=+1)
    np.testing.assert_allclose(np.asarray(zr) / 256, x.real, rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(zi) / 256, x.imag, rtol=1e-4, atol=1e-3)
