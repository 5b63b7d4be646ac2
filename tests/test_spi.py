"""SPI fitting + convolve-to-common-resolution preservation (upstream
tests/test_convolve2gaussres.py: the fit must recover alpha to 5e-4)."""

import numpy as np
from numpy.testing import assert_allclose

from pfb_tpu.utils.misc import Gaussian2D, convolve2gaussres
from pfb_tpu.utils.spi import fit_spi, fit_spi_components


def test_fit_spi_components_recovers_alpha():
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    nchan, ncomp = 8, 5
    freqs = 1e9 + np.arange(nchan) * 1e8
    freq0 = freqs.mean()
    alpha = -0.7 + 0.1 * rng.standard_normal(ncomp)
    i0 = 1.0 + rng.random(ncomp)
    data = i0[:, None] * (freqs[None, :] / freq0) ** alpha[:, None]
    a, aerr, i0f, ierr = fit_spi_components(
        jnp.asarray(data), jnp.ones(nchan), jnp.asarray(freqs), freq0)
    assert_allclose(np.asarray(a), alpha, atol=1e-6)
    assert_allclose(np.asarray(i0f), i0, rtol=1e-6)


def test_convolve2gaussres_preserves_spi():
    """Convolving each band to a common resolution preserves the
    spectral index of a power-law Gaussian source (upstream
    test_convolve2gaussres.py:13-44, tol 5e-4)."""
    nband, nx, ny = 4, 64, 64
    freqs = 1e9 + np.arange(nband) * 2e8
    freq0 = freqs.mean()
    alpha = -0.7
    x = np.arange(-(nx // 2), nx - nx // 2)
    xx, yy = np.meshgrid(x, x, indexing="ij")

    # per-band Gaussian source with frequency-dependent resolution
    gausspari = [(3.0 * freqs[0] / f, 3.0 * freqs[0] / f, 0.0)
                 for f in freqs]
    image = np.zeros((nband, nx, ny))
    for b in range(nband):
        image[b] = (freqs[b] / freq0) ** alpha * \
            Gaussian2D(xx, yy, gausspari[b], normalise=False)

    gaussparf = (5.0, 5.0, 0.0)
    out = convolve2gaussres(image, xx, yy, gaussparf,
                            gausspari=gausspari, norm_kernel=False)
    # at the source peak the flux ratio across bands gives back alpha
    peak = out[:, nx // 2, ny // 2]
    alpha_fit = np.polyfit(np.log(freqs / freq0), np.log(peak), 1)[0]
    assert_allclose(alpha_fit, alpha, atol=5e-4)


def test_fit_spi_map():
    nband, nx = 3, 16
    freqs = 1e9 + np.arange(nband) * 1e8
    cube = np.zeros((nband, nx, nx))
    cube[:, 8, 8] = 2.0 * (freqs / freqs.mean()) ** -0.5
    amap, i0map = fit_spi(cube, freqs, threshold=0.1)
    assert_allclose(amap[8, 8], -0.5, atol=1e-6)
    assert np.isnan(amap[0, 0])
