"""PSF convolution parity tests.

The reference validates its padded-FFT PSF convolution implicitly through
klean/spotless integration tests; here we test it directly against a
brute-force linear convolution (the reference's semantics: PSF of size
(nx_psf, ny_psf) >= image, image corner-embedded, circular FFT conv with
ifftshift'd PSF reproduces the linear convolution restricted to the image
support — pfb/operators/psf.py:11-56)."""

import numpy as np
import pytest
from numpy.testing import assert_allclose

from pfb_tpu.ops.fft import (fft2d, good_even_size, good_size, make_psfhat,
                             psf_convolve_cube, psf_convolve_slice)


def test_good_size():
    for n, expect in [(1, 1), (2, 2), (3, 3), (7, 8), (11, 12), (13, 15),
                      (100, 100), (101, 108)]:
        assert good_size(n) == expect
    assert good_size(3, even=True) == 4
    assert good_even_size(7) == 8
    assert good_even_size(15) == 16


def _direct_conv(x, psf):
    """Brute-force: out[p] = sum_q psf[c + p - q] * x[q] with c the PSF
    centre pixel (nx_psf//2, ny_psf//2) — what CLEAN-style PSF
    subtraction assumes."""
    nx, ny = x.shape
    nx_psf, ny_psf = psf.shape
    cx, cy = nx_psf // 2, ny_psf // 2
    out = np.zeros_like(x)
    for p in range(nx):
        for q in range(ny):
            acc = 0.0
            for i in range(nx):
                for j in range(ny):
                    dx = cx + p - i
                    dy = cy + q - j
                    if 0 <= dx < nx_psf and 0 <= dy < ny_psf:
                        acc += psf[dx, dy] * x[i, j]
            out[p, q] = acc
    return out


@pytest.mark.parametrize("nx,ny,osf", [(16, 16, 2), (12, 16, 2)])
def test_psf_convolve_slice_vs_direct(nx, ny, osf):
    rng = np.random.default_rng(42)
    nx_psf, ny_psf = osf * nx, osf * ny
    psf = rng.normal(size=(nx_psf, ny_psf))
    x = rng.normal(size=(nx, ny))
    psfhat = np.asarray(make_psfhat(psf))
    out = np.asarray(psf_convolve_slice(x, psfhat, ny_psf))
    expected = _direct_conv(x, psf)
    assert_allclose(out, expected, atol=1e-10, rtol=1e-10)


def test_psf_convolve_cube_matches_slices():
    rng = np.random.default_rng(0)
    nband, nx, ny = 3, 16, 16
    psf = rng.normal(size=(nband, 2 * nx, 2 * ny))
    x = rng.normal(size=(nband, nx, ny))
    psfhat = np.asarray(make_psfhat(psf))
    out = np.asarray(psf_convolve_cube(x, psfhat, 2 * ny))
    for b in range(nband):
        outb = np.asarray(psf_convolve_slice(x[b], psfhat[b], 2 * ny))
        assert_allclose(out[b], outb, rtol=1e-12, atol=1e-12)


def test_fft2d_matches_numpy():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(16, 16))
    out = np.asarray(fft2d(x))
    expected = np.fft.rfft2(np.fft.ifftshift(x))
    assert_allclose(out, expected, rtol=1e-12, atol=1e-12)
