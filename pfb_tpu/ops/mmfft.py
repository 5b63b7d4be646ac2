"""Matmul-based FFT for the TPU MXU.

XLA's built-in TPU FFT runs ~20x off the HBM roofline at the 8192^2
sizes the PSF Hessian needs (measured on v5e: 26 ms for a 1D batch pass
worth 1.3 ms of memory traffic). The MXU-native alternative is the
four-step (Cooley-Tukey N = N1*N2) factorisation where both stages are
dense DFT matmuls:

    X[k1 + N1 k2] = sum_{n2} W2[k2, n2] * T[k1, n2]
    T[k1, n2]     = tw[k1, n2] * sum_{n1} W1[k1, n1] x[n1 N2 + n2]

with W1 (N1 x N1), W2 (N2 x N2) DFT matrices and tw the twiddle
factors. Complex arithmetic is carried as separate real/imag float32
arrays (this also sidesteps TPU runtimes that cannot transfer complex
constants), and matmuls run at Precision.HIGHEST so the factorisation
is float32-accurate.

~12.6 MFLOP per length-8192 transform -> a full 8-band 4096^2 PSF
Hessian matvec is ~3.3 TFLOP of MXU work, an order of magnitude faster
than the built-in FFT at v5e matmul rates.
"""

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_HI = jax.lax.Precision.HIGHEST


def _factor(N):
    """Split N into (N1, N2), N1 >= N2, both as close to sqrt(N) as
    possible over divisors."""
    best = None
    for n2 in range(int(np.sqrt(N)), 0, -1):
        if N % n2 == 0:
            best = (N // n2, n2)
            break
    return best


@lru_cache(maxsize=None)
def _plan(N, inverse):
    """(W1r, W1i, W2r, W2i, twr, twi) numpy float32 constants."""
    N1, N2 = _factor(N)
    sign = 2.0 if inverse else -2.0
    n1 = np.arange(N1)
    n2 = np.arange(N2)
    W1 = np.exp(sign * 1j * np.pi * np.outer(n1, n1) / N1)
    W2 = np.exp(sign * 1j * np.pi * np.outer(n2, n2) / N2)
    # twiddle: omega_N^{k1 n2} with omega_N = exp(sign*1j*pi*2/N)
    tw = np.exp(sign * 1j * np.pi * np.outer(n1, n2) / N)
    f32 = np.float32
    return (N1, N2, W1.real.astype(f32), W1.imag.astype(f32),
            W2.real.astype(f32), W2.imag.astype(f32),
            tw.real.astype(f32), tw.imag.astype(f32))


def _cmatmul_left(Wr, Wi, xr, xi):
    """(Wr + i Wi) @ (xr + i xi) along the second-to-last axis of x:
    x has shape (..., n, m), W (k, n)."""
    def mm(A, B):
        return jnp.einsum("kn,...nm->...km", A, B, precision=_HI)

    yr = mm(Wr, xr) - mm(Wi, xi)
    yi = mm(Wr, xi) + mm(Wi, xr)
    return yr, yi


def _cmatmul_right(xr, xi, Wr, Wi):
    """(xr + i xi) @ (Wr + i Wi)^T along the last axis: x (..., k, n),
    W (m, n) -> (..., k, m)."""
    def mm(A, B):
        return jnp.einsum("...kn,mn->...km", A, B, precision=_HI)

    yr = mm(xr, Wr) - mm(xi, Wi)
    yi = mm(xi, Wr) + mm(xr, Wi)
    return yr, yi


def fft_mm_last(xr, xi, N, inverse=False):
    """Complex FFT along the last axis via four-step matmuls.

    xr, xi: (..., N) float32 real/imag parts. Returns (yr, yi).
    Unnormalised forward; inverse scales by 1/N.
    """
    N1, N2, W1r, W1i, W2r, W2i, twr, twi = _plan(N, inverse)
    lead = xr.shape[:-1]
    xr = xr.reshape(*lead, N1, N2)
    xi = xi.reshape(*lead, N1, N2)
    # stage 1: DFT over n1 (second-to-last axis)
    ar, ai = _cmatmul_left(jnp.asarray(W1r), jnp.asarray(W1i), xr, xi)
    # twiddle
    twr_j = jnp.asarray(twr)
    twi_j = jnp.asarray(twi)
    br = ar * twr_j - ai * twi_j
    bi = ar * twi_j + ai * twr_j
    # stage 2: DFT over n2 (last axis)
    cr, ci = _cmatmul_right(br, bi, jnp.asarray(W2r), jnp.asarray(W2i))
    # output index k1 + N1*k2 -> transpose (k1, k2) -> (k2, k1)
    yr = jnp.swapaxes(cr, -1, -2).reshape(*lead, N)
    yi = jnp.swapaxes(ci, -1, -2).reshape(*lead, N)
    if inverse:
        yr = yr / N
        yi = yi / N
    return yr, yi


def fft2_mm(xr, xi, inverse=False):
    """2D complex FFT over the last two axes via matmul FFTs."""
    n_last = xr.shape[-1]
    n_prev = xr.shape[-2]
    yr, yi = fft_mm_last(xr, xi, n_last, inverse=inverse)
    yr = jnp.swapaxes(yr, -1, -2)
    yi = jnp.swapaxes(yi, -1, -2)
    yr, yi = fft_mm_last(yr, yi, n_prev, inverse=inverse)
    return jnp.swapaxes(yr, -1, -2), jnp.swapaxes(yi, -1, -2)


@partial(jax.jit, static_argnames=("nx", "ny", "band_chunk"))
def psf_convolve_mm(x, psfhat_r, psfhat_i, nx, ny, band_chunk=None):
    """PSF Hessian matvec with matmul FFTs.

    x: (nband, nx, ny) float32; psfhat_r/i: (nband, nx_psf, ny_psf)
    float32 real/imag of the FULL (not rfft) transform of the
    ifftshift'd PSF. Same semantics as
    pfb_tpu.ops.fft.psf_convolve_cube.
    """
    nxp = psfhat_r.shape[-2]
    nyp = psfhat_r.shape[-1]

    def one(args):
        xb, phr, phi = args
        xpad = jnp.pad(xb, [(0, 0)] * (xb.ndim - 2)
                       + [(0, nxp - nx), (0, nyp - ny)])
        zr, zi = fft2_mm(xpad, jnp.zeros_like(xpad))
        wr = zr * phr - zi * phi
        wi = zr * phi + zi * phr
        yr, _ = fft2_mm(wr, wi, inverse=True)
        return yr[..., :nx, :ny]

    if band_chunk is None or x.shape[0] <= band_chunk:
        return one((x, psfhat_r, psfhat_i))
    nband = x.shape[0]
    nchunk = -(-nband // band_chunk)
    npad = nchunk * band_chunk - nband
    xr = jnp.pad(x, [(0, npad), (0, 0), (0, 0)])
    pr = jnp.pad(psfhat_r, [(0, npad), (0, 0), (0, 0)])
    pi = jnp.pad(psfhat_i, [(0, npad), (0, 0), (0, 0)])
    out = lax.map(one, (xr.reshape(nchunk, band_chunk, nx, ny),
                        pr.reshape(nchunk, band_chunk, nxp, nyp),
                        pi.reshape(nchunk, band_chunk, nxp, nyp)))
    return out.reshape(nchunk * band_chunk, nx, ny)[:nband]


@partial(jax.jit, static_argnames=("band_chunk",))
def make_full_psfhat(psf, band_chunk=None):
    """Full (fft2, not rfft2) transform of ifftshift(psf) as real/imag
    float32 arrays, built from the rfft2 half-spectrum by Hermitian
    extension: for real input, X[N-k1 mod N, N-k2 mod N] = conj(X[k1,
    k2]). ``band_chunk`` bounds FFT workspace for big cubes."""
    sh = jnp.fft.ifftshift(psf, axes=(-2, -1)).astype(jnp.float32)
    N2 = sh.shape[-1]
    H2 = N2 // 2 + 1

    def one(p):
        half = jnp.fft.rfft2(p, axes=(-2, -1))  # (..., N1, H2)
        hr = half.real
        hi = half.imag
        # missing columns k2 = H2..N2-1 mirror k2' = N2-k2 in 1..N2-H2
        # with rows reversed mod N: row 0 stays, rows 1..N1-1 flip
        src = hr[..., :, 1:N2 - H2 + 1][..., :, ::-1]
        srci = hi[..., :, 1:N2 - H2 + 1][..., :, ::-1]
        row0r = src[..., :1, :]
        row0i = srci[..., :1, :]
        restr = src[..., 1:, :][..., ::-1, :]
        resti = srci[..., 1:, :][..., ::-1, :]
        mr = jnp.concatenate([row0r, restr], axis=-2)
        mi = -jnp.concatenate([row0i, resti], axis=-2)
        return (jnp.concatenate([hr, mr], axis=-1),
                jnp.concatenate([hi, mi], axis=-1))

    if band_chunk is None or sh.ndim == 2 or \
            sh.shape[0] <= band_chunk:
        return one(sh)
    nband = sh.shape[0]
    nchunk = -(-nband // band_chunk)
    npad = nchunk * band_chunk - nband
    pr = jnp.pad(sh, [(0, npad), (0, 0), (0, 0)])
    pr = pr.reshape(nchunk, band_chunk, *sh.shape[-2:])
    zr, zi = lax.map(one, pr)
    out_shape = (nchunk * band_chunk, *sh.shape[-2:])
    return (zr.reshape(out_shape)[:nband],
            zi.reshape(out_shape)[:nband])
