"""Solver correctness tests (CG/PCG/power method/FISTA).

The reference exercises pcg/power_method only through integration tests
(test_fwdbwd is fully commented out upstream); we test them directly on
small SPD systems and on the PSF Hessian (BASELINE config 1: single-band
128x128 PCG solve of the PSF-Hessian via FFT-convolution matvec)."""

import jax.numpy as jnp
import numpy as np
from numpy.testing import assert_allclose

from pfb_tpu.ops.fft import make_psfhat
from pfb_tpu.ops.psf import make_psf_convolve
from pfb_tpu.opt.fista import fista
from pfb_tpu.opt.pcg import cg, norm_diff, pcg, pcg_bands, pcg_psf
from pfb_tpu.opt.power_method import power_method


def _spd_system(n, seed=0):
    rng = np.random.default_rng(seed)
    B = rng.normal(size=(n, n))
    A = B @ B.T + n * np.eye(n)
    b = rng.normal(size=n)
    return A, b


def test_cg_solves_spd():
    A, b = _spd_system(32)
    x = np.asarray(cg(lambda v: jnp.asarray(A) @ v, jnp.asarray(b),
                      tol=1e-14, maxit=500))
    assert_allclose(A @ x, b, atol=1e-6)


def test_pcg_solves_spd():
    A, b = _spd_system(32, seed=1)
    x = np.asarray(pcg(lambda v: jnp.asarray(A) @ v, jnp.asarray(b),
                       tol=1e-10, maxit=500, minit=5))
    assert_allclose(A @ x, b, atol=1e-6)


def test_pcg_preconditioned_matches():
    A, b = _spd_system(24, seed=2)
    Amat = jnp.asarray(A)
    Minv = jnp.asarray(1.0 / np.diag(A))
    x = np.asarray(pcg(lambda v: Amat @ v, jnp.asarray(b),
                       M=lambda v: Minv * v, tol=1e-12, maxit=500, minit=5))
    assert_allclose(A @ x, b, atol=1e-6)


def _psf_setup(nband=2, nx=64, ny=64, seed=3):
    """Well-conditioned PSF cube (delta peak + Gaussian sidelobes) + its
    psfhat. A pure Gaussian PSF would make the Hessian numerically
    singular; the delta keeps the spectrum bounded below so PCG can
    actually invert it."""
    rng = np.random.default_rng(seed)
    nx_psf, ny_psf = 2 * nx, 2 * ny
    x = np.arange(nx_psf) - nx_psf // 2
    y = np.arange(ny_psf) - ny_psf // 2
    xx, yy = np.meshgrid(x, y, indexing="ij")
    psf = np.zeros((nband, nx_psf, ny_psf))
    for b in range(nband):
        s = 2.0 + b
        psf[b] = 0.5 * np.exp(-0.5 * (xx**2 + yy**2) / s**2)
        psf[b, nx_psf // 2, ny_psf // 2] += 0.5
    psfhat = np.asarray(make_psfhat(psf))
    return psf, psfhat, ny_psf


def test_pcg_bands_psf_hessian():
    """Per-band batched PCG on the PSF Hessian recovers model from dirty
    (BASELINE config 1 semantics)."""
    nband, nx, ny = 2, 64, 64
    psf, psfhat, lastsize = _psf_setup(nband, nx, ny)
    rng = np.random.default_rng(4)
    model = np.zeros((nband, nx, ny))
    for _ in range(5):
        model[:, rng.integers(0, nx), rng.integers(0, ny)] = 1.0

    sigmainv = 1e-3
    hess = make_psf_convolve(jnp.asarray(psfhat), lastsize,
                             sigmainv=sigmainv)
    b = hess(jnp.asarray(model))
    x = np.asarray(pcg_psf(jnp.asarray(psfhat), b,
                           jnp.zeros_like(b), sigmainv=sigmainv,
                           tol=1e-8, maxit=500, minit=10))
    assert norm_diff(jnp.asarray(x), jnp.asarray(model)) < 1e-3


def test_power_method_matches_eigh():
    A, _ = _spd_system(32, seed=5)
    Amat = jnp.asarray(A)
    beta, bvec = power_method(lambda v: Amat @ v, (32,), tol=1e-12,
                              maxit=2000, dtype=jnp.float64)
    expected = np.linalg.eigvalsh(A).max()
    assert_allclose(float(beta), expected, rtol=1e-6)


def test_power_method_psf_hessian():
    nband, nx, ny = 2, 32, 32
    psf, psfhat, lastsize = _psf_setup(nband, nx, ny)
    hess = make_psf_convolve(jnp.asarray(psfhat), lastsize)
    beta, b = power_method(hess, (nband, nx, ny), tol=1e-10, maxit=500,
                           dtype=jnp.float64)
    # Hessian here is convolution by a Gaussian: spectral norm equals the
    # max of |fft(psf)| over modes supported on the image
    assert float(beta) > 0
    # Rayleigh quotient at the returned vector should equal beta
    r = float(jnp.vdot(b, hess(b)).real / jnp.vdot(b, b).real)
    assert_allclose(r, float(beta), rtol=1e-4)


def test_fista_lasso():
    """FISTA on a tiny lasso problem: min 0.5|Ax-b|^2 + lam |x|_1."""
    rng = np.random.default_rng(6)
    m, n = 40, 20
    A = rng.normal(size=(m, n))
    xtrue = np.zeros(n)
    xtrue[[2, 7, 11]] = [1.0, -2.0, 3.0]
    b = A @ xtrue
    lam = 1e-3
    Aj = jnp.asarray(A)
    bj = jnp.asarray(b)

    def fprime(x):
        r = Aj @ x - bj
        return 0.5 * jnp.vdot(r, r).real, Aj.T @ r

    def prox(x, step):
        t = lam * step
        return jnp.sign(x) * jnp.maximum(jnp.abs(x) - t, 0.0)

    L = np.linalg.eigvalsh(A.T @ A).max()
    x = np.asarray(fista(fprime, prox, jnp.zeros(n), L, tol=1e-10,
                         maxit=2000))
    assert_allclose(x, xtrue, atol=1e-2)
