"""Fused Pallas FFT-convolution pipeline (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pfb_tpu.ops.fft import make_psfhat, psf_convolve_cube
from pfb_tpu.ops.mmfft import make_full_psfhat
from pfb_tpu.ops.pallas_fft import (psf_convolve_pallas,
                                    psf_convolve_pallas_cube)


def test_pallas_convolve_matches_fft_path():
    rng = np.random.default_rng(0)
    nx = 64
    psf = rng.normal(size=(2 * nx, 2 * nx))
    img = rng.normal(size=(nx, nx)).astype(np.float32)
    ref = np.asarray(psf_convolve_cube(
        jnp.asarray(img, jnp.float64)[None],
        make_psfhat(jnp.asarray(psf)[None]), 2 * nx))[0]
    phr, phi = make_full_psfhat(jnp.asarray(psf, jnp.float32)[None])
    got = np.asarray(psf_convolve_pallas(
        jnp.asarray(img), phr[0].T, phi[0].T, nx, nx, lane_block=64,
        row_block=64, interpret=True))
    assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-5


def test_pallas_convolve_cube():
    rng = np.random.default_rng(1)
    nband, nx = 2, 32
    psf = rng.normal(size=(nband, 2 * nx, 2 * nx))
    img = rng.normal(size=(nband, nx, nx)).astype(np.float32)
    ref = np.asarray(psf_convolve_cube(
        jnp.asarray(img, jnp.float64),
        make_psfhat(jnp.asarray(psf)), 2 * nx))
    phr, phi = make_full_psfhat(jnp.asarray(psf, jnp.float32))
    got = np.asarray(psf_convolve_pallas_cube(
        jnp.asarray(img), jnp.swapaxes(phr, -1, -2),
        jnp.swapaxes(phi, -1, -2), nx, nx, lane_block=32,
        row_block=32, interpret=True))
    assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-5


def test_pallas_convolve_opt_matches():
    from pfb_tpu.ops.pallas_fft import psf_convolve_pallas_opt
    rng = np.random.default_rng(2)
    nx = 64
    psf = rng.normal(size=(2 * nx, 2 * nx))
    img = rng.normal(size=(nx, nx)).astype(np.float32)
    ref = np.asarray(psf_convolve_cube(
        jnp.asarray(img, jnp.float64)[None],
        make_psfhat(jnp.asarray(psf)[None]), 2 * nx))[0]
    phr, phi = make_full_psfhat(jnp.asarray(psf, jnp.float32)[None])
    got = np.asarray(psf_convolve_pallas_opt(
        jnp.asarray(img), phr[0].T, phi[0].T, nx, nx, lane_block=64,
        row_block=64, interpret=True))
    assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-5


def test_pallas_convolve_v2_matches():
    from pfb_tpu.ops.pallas_fft import (psf_convolve_pallas_v2,
                                        scramble_HT)
    rng = np.random.default_rng(3)
    nx = 128  # NY = 256 -> lane factorisation (2, 128)
    psf = rng.normal(size=(2 * nx, 2 * nx))
    img = rng.normal(size=(nx, nx)).astype(np.float32)
    ref = np.asarray(psf_convolve_cube(
        jnp.asarray(img, jnp.float64)[None],
        make_psfhat(jnp.asarray(psf)[None]), 2 * nx))[0]
    phr, phi = make_full_psfhat(jnp.asarray(psf, jnp.float32)[None])
    got = np.asarray(psf_convolve_pallas_v2(
        jnp.asarray(img), scramble_HT(phr[0].T), scramble_HT(phi[0].T),
        nx, nx, interpret=True))
    assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-5


def test_pallas_convolve_v3_matches():
    """v3 (Hermitian-aware, transpose-free) pipeline == reference FFT
    convolve; the kept half-spectrum + analytic mirror reconstruction
    must be exact up to f32 matmul error."""
    from pfb_tpu.ops.pallas_fft import (prep_H_v3,
                                        psf_convolve_pallas_v3)
    rng = np.random.default_rng(7)
    nx = 128  # NX = 256 -> factor (16, 16), NXH = 144
    psf = rng.normal(size=(2 * nx, 2 * nx))
    img = rng.normal(size=(nx, nx)).astype(np.float32)
    ref = np.asarray(psf_convolve_cube(
        jnp.asarray(img, jnp.float64)[None],
        make_psfhat(jnp.asarray(psf)[None]), 2 * nx))[0]
    phr, phi = make_full_psfhat(jnp.asarray(psf, jnp.float32)[None])
    got = np.asarray(psf_convolve_pallas_v3(
        jnp.asarray(img), prep_H_v3(phr[0].T), prep_H_v3(phi[0].T),
        nx, nx, row_block=48, interpret=True))
    assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-5


def test_make_psf_convolve_pallas_v3_cube():
    """The cube-level wrapper (used by bench + spotless engine=pallas)
    through the v3 pipeline."""
    import jax

    from pfb_tpu.ops.psf import make_psf_convolve_pallas
    if jax.default_backend() == "tpu":
        pytest.skip("interpret-mode test")
    rng = np.random.default_rng(8)
    nx, nband = 128, 2
    psf = rng.normal(size=(nband, 2 * nx, 2 * nx))
    img = rng.normal(size=(nband, nx, nx)).astype(np.float32)
    ref = np.asarray(psf_convolve_cube(
        jnp.asarray(img, jnp.float64),
        make_psfhat(jnp.asarray(psf)), 2 * nx))
    import pfb_tpu.ops.pallas_fft as pf
    # interpret-mode monkeypatch: the wrapper passes interpret=False
    orig = pf.psf_convolve_pallas_v3_cube

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    pf.psf_convolve_pallas_v3_cube = patched
    try:
        from pfb_tpu.ops import psf as psfmod
        hess = psfmod.make_psf_convolve_pallas(
            jnp.asarray(psf, jnp.float32), nx, nx)
        got = np.asarray(hess(jnp.asarray(img)))
    finally:
        pf.psf_convolve_pallas_v3_cube = orig
    assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-5


def _even_psf(rng, N):
    """A PSF that is even in the FFT sense (q[k] == q[-k mod N] after
    ifftshift) — the symmetry every self-adjoint convolution kernel
    has; its transfer function is real."""
    q = rng.normal(size=(N, N))
    idx = (-np.arange(N)) % N
    q = 0.5 * (q + q[idx][:, idx])
    return np.fft.fftshift(q)


def test_pallas_convolve_v3_real_transfer():
    """Even PSF -> real transfer function: the Hsi=None K2 path must
    match the complex path and the reference convolve."""
    from pfb_tpu.ops.pallas_fft import (prep_H_v3,
                                        psf_convolve_pallas_v3)
    rng = np.random.default_rng(13)
    nx = 128
    psf = _even_psf(rng, 2 * nx)
    img = rng.normal(size=(nx, nx)).astype(np.float32)
    ref = np.asarray(psf_convolve_cube(
        jnp.asarray(img, jnp.float64)[None],
        make_psfhat(jnp.asarray(psf)[None]), 2 * nx))[0]
    phr, phi = make_full_psfhat(jnp.asarray(psf, jnp.float32)[None])
    assert float(jnp.max(jnp.abs(phi)) / jnp.max(jnp.abs(phr))) < 1e-5
    got = np.asarray(psf_convolve_pallas_v3(
        jnp.asarray(img), prep_H_v3(phr[0].T), None,
        nx, nx, row_block=48, interpret=True))
    assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-5


def test_make_psf_convolve_pallas_auto_real_transfer():
    """The auto mode drops Im H for an even PSF cube and the matvec
    still matches the XLA-FFT reference."""
    import jax

    if jax.default_backend() == "tpu":
        pytest.skip("interpret-mode test")
    rng = np.random.default_rng(14)
    nx, nband = 128, 2
    psf = np.stack([_even_psf(rng, 2 * nx) for _ in range(nband)])
    img = rng.normal(size=(nband, nx, nx)).astype(np.float32)
    ref = np.asarray(psf_convolve_cube(
        jnp.asarray(img, jnp.float64),
        make_psfhat(jnp.asarray(psf)), 2 * nx))
    import pfb_tpu.ops.pallas_fft as pf
    orig = pf.psf_convolve_pallas_v3_cube

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    pf.psf_convolve_pallas_v3_cube = patched
    try:
        from pfb_tpu.ops import psf as psfmod
        hess = psfmod.make_psf_convolve_pallas(
            jnp.asarray(psf, jnp.float32), nx, nx)
        assert hess.real_transfer is True
        got = np.asarray(hess(jnp.asarray(img)))
    finally:
        pf.psf_convolve_pallas_v3_cube = orig
    assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-5


def test_pallas_convolve_v3_odd_factorisation():
    """A second size with an asymmetric factorisation: NX = 512
    factors (32, 16) with NXH = 288 — exercises the k2-block cropping
    and mirror-row bookkeeping away from the square (128, 64) case
    (sizes must stay 128-aligned in y for the lane four-step)."""
    from pfb_tpu.ops.pallas_fft import (prep_H_v3,
                                        psf_convolve_pallas_v3)
    rng = np.random.default_rng(11)
    nx = 256
    psf = rng.normal(size=(2 * nx, 2 * nx))
    img = rng.normal(size=(nx, nx)).astype(np.float32)
    ref = np.asarray(psf_convolve_cube(
        jnp.asarray(img, jnp.float64)[None],
        make_psfhat(jnp.asarray(psf)[None]), 2 * nx))[0]
    phr, phi = make_full_psfhat(jnp.asarray(psf, jnp.float32)[None])
    got = np.asarray(psf_convolve_pallas_v3(
        jnp.asarray(img), prep_H_v3(phr[0].T), prep_H_v3(phi[0].T),
        nx, nx, lane_block=128, row_block=96, interpret=True))
    assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-5
