"""Parity of the c2c Pallas four-step FFT (ops/pallas_cfft.py) against
numpy, interpret mode: full transforms, the roll-crop-absorbed output
pruning (grid_to_image) and input pruning (image_to_grid)."""

import numpy as np
import pytest
from numpy.testing import assert_allclose

import jax.numpy as jnp

from pfb_tpu.ops.pallas_cfft import (cfft_supported, fft2_c2c_pruned,
                                     fftx_c2c)


def _rand(shape, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.normal(size=shape).astype(np.float32),
            rng.normal(size=shape).astype(np.float32))


@pytest.mark.parametrize("N", [256, 512])
@pytest.mark.parametrize("inverse", [False, True])
def test_fftx_full(N, inverse):
    assert cfft_supported(N)
    xr, xi = _rand((2, N, 128), seed=N)
    yr, yi = fftx_c2c(jnp.asarray(xr), jnp.asarray(xi), N=N,
                      inverse=inverse, interpret=True)
    x = xr.astype(np.float64) + 1j * xi.astype(np.float64)
    ref = np.fft.ifft(x, axis=-2) * N if inverse else \
        np.fft.fft(x, axis=-2)
    scale = np.abs(ref).max()
    assert_allclose(np.asarray(yr), ref.real, atol=2e-4 * scale)
    assert_allclose(np.asarray(yi), ref.imag, atol=2e-4 * scale)


@pytest.mark.parametrize("inverse", [False, True])
def test_fftx_out_rolled(inverse):
    N = 256
    xr, xi = _rand((1, N, 128), seed=3)
    yr, yi = fftx_c2c(jnp.asarray(xr), jnp.asarray(xi), N=N,
                      inverse=inverse, out_rolled=True, interpret=True)
    x = xr.astype(np.float64) + 1j * xi.astype(np.float64)
    full = np.fft.ifft(x, axis=-2) * N if inverse else \
        np.fft.fft(x, axis=-2)
    # image rows i of the rolled-crop: full[(i - nx/2) mod N]
    nx = N // 2
    idx = (np.arange(nx) - nx // 2) % N
    ref = full[:, idx, :]
    scale = np.abs(ref).max()
    assert_allclose(np.asarray(yr), ref.real, atol=2e-4 * scale)
    assert_allclose(np.asarray(yi), ref.imag, atol=2e-4 * scale)


@pytest.mark.parametrize("inverse", [False, True])
def test_fftx_in_rolled(inverse):
    N = 256
    nx = N // 2
    pr, pi = _rand((1, nx, 128), seed=4)
    yr, yi = fftx_c2c(jnp.asarray(pr), jnp.asarray(pi), N=N,
                      inverse=inverse, in_rolled=True, interpret=True)
    # embed image rows at (i - nx/2) mod N
    x = np.zeros((1, N, 128), np.complex128)
    idx = (np.arange(nx) - nx // 2) % N
    x[:, idx, :] = pr.astype(np.float64) + 1j * pi.astype(np.float64)
    ref = np.fft.ifft(x, axis=-2) * N if inverse else \
        np.fft.fft(x, axis=-2)
    scale = np.abs(ref).max()
    assert_allclose(np.asarray(yr), ref.real, atol=2e-4 * scale)
    assert_allclose(np.asarray(yi), ref.imag, atol=2e-4 * scale)


def test_fft2_pruned_out_matches_roll_crop():
    Nx = Ny = 256
    nx, ny = Nx // 2, Ny // 2
    gr, gi = _rand((2, Nx, Ny), seed=5)
    yr, yi = fft2_c2c_pruned(jnp.asarray(gr), jnp.asarray(gi), Nx=Nx,
                             Ny=Ny, inverse=True, pruned_out=True,
                             interpret=True)
    g = gr.astype(np.float64) + 1j * gi.astype(np.float64)
    full = np.fft.ifft2(g) * (Nx * Ny)
    ref = np.roll(full, (nx // 2, ny // 2),
                  axis=(-2, -1))[:, :nx, :ny]
    scale = np.abs(ref).max()
    assert_allclose(np.asarray(yr), ref.real, atol=5e-4 * scale)
    assert_allclose(np.asarray(yi), ref.imag, atol=5e-4 * scale)


def test_fft2_pruned_in_matches_pad_roll():
    Nx = Ny = 256
    nx, ny = Nx // 2, Ny // 2
    pr, pi = _rand((2, nx, ny), seed=6)
    yr, yi = fft2_c2c_pruned(jnp.asarray(pr), jnp.asarray(pi), Nx=Nx,
                             Ny=Ny, inverse=False, pruned_in=True,
                             interpret=True)
    f = np.zeros((2, Nx, Ny), np.complex128)
    f[:, :nx, :ny] = pr.astype(np.float64) + 1j * pi.astype(np.float64)
    f = np.roll(f, (-(nx // 2), -(ny // 2)), axis=(-2, -1))
    ref = np.fft.fft2(f)
    scale = np.abs(ref).max()
    assert_allclose(np.asarray(yr), ref.real, atol=5e-4 * scale)
    assert_allclose(np.asarray(yi), ref.imag, atol=5e-4 * scale)


def test_wgridder_cfft_engine_parity():
    """vis2dirty/dirty2vis with fft_engine='cfft' (pruned Pallas
    pipeline, interpret mode) match the default mm path on f32, w-on
    and w-off."""
    rng = np.random.default_rng(11)
    nrow, nchan = 800, 2
    uvw = rng.normal(scale=60.0, size=(nrow, 3))
    uvw[:, 2] *= 0.2
    freq = np.linspace(0.9e9, 1.1e9, nchan)
    umax = np.abs(uvw[:, :2]).max() * freq[-1] / 299792458.0
    nx = 128
    cell = 1.0 / (2.0 * umax * 2.0)
    vis = (rng.normal(size=(nrow, nchan))
           + 1j * rng.normal(size=(nrow, nchan))).astype(np.complex64)

    from pfb_tpu.ops.wgridder import dirty2vis_wgrid, vis2dirty_wgrid

    uvw_d = jnp.asarray(uvw, jnp.float32)
    freq_d = jnp.asarray(freq, jnp.float32)
    for do_w in (True, False):
        a = vis2dirty_wgrid(uvw_d, freq_d, jnp.asarray(vis), nx=nx,
                            ny=nx, cellx=cell, celly=cell,
                            epsilon=1e-5, do_wgridding=do_w,
                            fft_engine="mm")
        b = vis2dirty_wgrid(uvw_d, freq_d, jnp.asarray(vis), nx=nx,
                            ny=nx, cellx=cell, celly=cell,
                            epsilon=1e-5, do_wgridding=do_w,
                            fft_engine="cfft")
        scale = float(jnp.abs(a).max())
        assert_allclose(np.asarray(b), np.asarray(a),
                        atol=2e-5 * scale)

    img = np.asarray(a, np.float32)
    for do_w in (True, False):
        va = dirty2vis_wgrid(uvw_d, freq_d, jnp.asarray(img), cell,
                             cell, epsilon=1e-5, do_wgridding=do_w,
                             fft_engine="mm")
        vb = dirty2vis_wgrid(uvw_d, freq_d, jnp.asarray(img), cell,
                             cell, epsilon=1e-5, do_wgridding=do_w,
                             fft_engine="cfft")
        vscale = float(jnp.abs(va).max())
        assert_allclose(np.asarray(vb), np.asarray(va),
                        atol=2e-5 * vscale)
