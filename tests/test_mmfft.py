"""Matmul-FFT (MXU path) correctness vs numpy/the rfft2 reference."""

import jax.numpy as jnp
import numpy as np
import pytest
from numpy.testing import assert_allclose

from pfb_tpu.ops.fft import make_psfhat, psf_convolve_cube
from pfb_tpu.ops.mmfft import (fft2_mm, fft_mm_last, make_full_psfhat,
                               psf_convolve_mm)

pmp = pytest.mark.parametrize


@pmp("N", [64, 120, 1024])
def test_fft1d_vs_numpy(N):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(3, N)).astype(np.float32)
    yr, yi = fft_mm_last(jnp.asarray(x), jnp.zeros((3, N), jnp.float32),
                         N)
    ref = np.fft.fft(x, axis=-1)
    scale = np.abs(ref).max()
    assert np.abs(np.asarray(yr) - ref.real).max() / scale < 1e-6
    assert np.abs(np.asarray(yi) - ref.imag).max() / scale < 1e-6


def test_fft1d_inverse_roundtrip():
    rng = np.random.default_rng(1)
    N = 512
    x = rng.normal(size=(2, N)).astype(np.float32)
    yr, yi = fft_mm_last(jnp.asarray(x), jnp.zeros((2, N), jnp.float32),
                         N)
    br, bi = fft_mm_last(yr, yi, N, inverse=True)
    assert_allclose(np.asarray(br), x, atol=1e-5)
    assert np.abs(np.asarray(bi)).max() < 1e-5


def test_fft2_vs_numpy():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 64, 128)).astype(np.float32)
    zr, zi = fft2_mm(jnp.asarray(x), jnp.zeros_like(jnp.asarray(x)))
    ref = np.fft.fft2(x)
    scale = np.abs(ref).max()
    assert np.abs(np.asarray(zr) - ref.real).max() / scale < 1e-6
    assert np.abs(np.asarray(zi) - ref.imag).max() / scale < 1e-6


def test_psf_convolve_mm_matches_fft_path():
    rng = np.random.default_rng(3)
    nband, nx = 2, 64
    psf = rng.normal(size=(nband, 2 * nx, 2 * nx))
    img = rng.normal(size=(nband, nx, nx))
    ref = np.asarray(psf_convolve_cube(
        jnp.asarray(img), make_psfhat(jnp.asarray(psf)), 2 * nx))
    phr, phi = make_full_psfhat(jnp.asarray(psf, jnp.float32))
    got = np.asarray(psf_convolve_mm(jnp.asarray(img, jnp.float32),
                                     phr, phi, nx, nx))
    assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-5
