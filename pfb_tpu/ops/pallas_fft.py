"""Fused Pallas PSF-convolution pipeline for TPU.

XLA's TPU FFT runs ~20x off the HBM roofline at 8192^2 (measured; see
ops/mmfft.py docstring), and an einsum-based matmul FFT is no better
because every stage round-trips HBM. This module fuses the whole
convolution into three Pallas kernels, each reading/writing HBM once:

  K1: forward four-step FFT along the sublane (row) axis per lane strip
      — DFT factor matmuls entirely in VMEM
  K2: forward FFT along the lane axis, multiply by the PSF transfer
      function, inverse FFT along lanes — one VMEM residency
  K3: inverse FFT along sublanes (+ output crop by the caller)

All transforms are four-step factorisations N = N1*N2 with the stage
matmuls on the MXU; complex data is carried as separate float32
real/imag arrays; complex-by-complex stages run as THREE real matmuls
(Gauss/Karatsuba, see _cmm); the inverse stages use conjugated
constants. Measured on v5e the kernels are neither HBM- nor
MXU-flop-bound but VPU/pipeline-bound, so the v3 kernels eliminate
every elementwise twiddle pass by folding the twiddle factors into
the stage matrices: K2's into per-n1 batched stage-2 matrices
(consts_lane_tw_for), K1/K3's into per-n2 batched stage-1 matrices
(consts_k1t_for / consts_k3t_for, the latter with the Hermitian
mirror pass and its row mask stitched into the same batch). HBM
traffic per band ~4.8 GB vs ~8 GB+ for the unfused paths.
"""

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HI = jax.lax.Precision.HIGHEST


def _factor(N):
    for n2 in range(int(np.sqrt(N)), 0, -1):
        if N % n2 == 0:
            return N // n2, n2
    return N, 1


@lru_cache(maxsize=None)
def _consts_np(N):
    """Forward-transform constants (W1, W2, twiddle) as float32
    real/imag numpy pairs; the inverse uses their conjugates."""
    N1, N2 = _factor(N)
    n1 = np.arange(N1)
    n2 = np.arange(N2)
    W1 = np.exp(-2j * np.pi * np.outer(n1, n1) / N1)
    W2 = np.exp(-2j * np.pi * np.outer(n2, n2) / N2)
    tw = np.exp(-2j * np.pi * np.outer(n1, n2) / N)
    f32 = np.float32
    return (N1, N2,
            W1.real.astype(f32), W1.imag.astype(f32),
            W2.real.astype(f32), W2.imag.astype(f32),
            tw.real.astype(f32), tw.imag.astype(f32))


def consts_for(N):
    """Device arrays of the forward constants for transform length N."""
    N1, N2, w1r, w1i, w2r, w2i, twr, twi = _consts_np(N)
    return tuple(jnp.asarray(a) for a in (w1r, w1i, w2r, w2i, twr, twi))


def _mm(A, B, prec=None):
    return jax.lax.dot_general(A, B, (((1,), (0,)), ((), ())),
                               precision=prec or _HI,
                               preferred_element_type=jnp.float32)


def _cmm(dot, wr, wi, xr, xi, prec):
    """Complex matmul (wr + i wi)(xr + i xi) via THREE real matmuls
    (Karatsuba / Gauss): t1 = wr x_r, t2 = wi x_i,
    t3 = (wr + wi)(x_r + x_i); real = t1 - t2,
    imag = t3 - t1 - t2. The MXU stages dominate the v3 pipeline
    (K2 is MXU-bound), so trading one matmul for three VPU adds is a
    ~25% cut on every complex-by-complex stage. ``dot(A, B, prec)``
    supplies the contraction (the W operand may be on either side —
    the identity is symmetric)."""
    t1 = dot(wr, xr, prec)
    t2 = dot(wi, xi, prec)
    t3 = dot(wr + wi, xr + xi, prec)
    return t1 - t2, t3 - t1 - t2


def _mmr(B, A, prec=None):
    """B (..., n) contracted with A (k, n) -> (..., k)."""
    return jax.lax.dot_general(B, A, (((1,), (1,)), ((), ())),
                               precision=prec or _HI,
                               preferred_element_type=jnp.float32)


def _fft_sublane_block(xr, xi, C, N, L, inverse, zero_frac=1,
                       keep_frac=1, prec=None, real_output=False):
    """Four-step FFT of an (N, L) block along axis 0 using constants C
    = (w1r, w1i, w2r, w2i, twr, twi); inverse conjugates + scales.

    zero_frac > 1: only the first N/zero_frac input rows are nonzero
    (zero-padded transform) — the stage-1 matmul contracts only those
    rows (the block passed in has N//zero_frac rows).
    keep_frac > 1: only the first N/keep_frac output rows are needed
    (cropped inverse) — stage 2 computes only those.
    """
    w1r, w1i, w2r, w2i, twr, twi = C
    N1, N2 = w1r.shape[0], w2r.shape[0]
    if inverse:
        w1i, w2i, twi = -w1i, -w2i, -twi
    twr3 = twr[:, :, None]
    twi3 = twi[:, :, None]

    n1_in = N1 // zero_frac
    xr = xr.reshape(n1_in, N2 * L)
    w1r_c = w1r[:, :n1_in]
    w1i_c = w1i[:, :n1_in]
    if xi is None:  # real input: skip the zero-imag matmuls
        ar = _mm(w1r_c, xr, prec)
        ai = _mm(w1i_c, xr, prec)
    else:
        xi = xi.reshape(n1_in, N2 * L)
        ar, ai = _cmm(_mm, w1r_c, w1i_c, xr, xi, prec)
    ar = ar.reshape(N1, N2, L)
    ai = ai.reshape(N1, N2, L)
    br = ar * twr3 - ai * twi3
    bi = ar * twi3 + ai * twr3
    br = br.transpose(1, 0, 2).reshape(N2, N1 * L)
    bi = bi.transpose(1, 0, 2).reshape(N2, N1 * L)
    # output row n = n1 + N1*n2 ... laid out (k2-major): keeping the
    # first N/keep_frac rows means keeping all k1 but only
    # k2 < N2/keep_frac? No: k = k1 + N1 k2, rows laid (k2, k1):
    # row r = k2*N1 + k1 = k. Keeping r < N/keep_frac means
    # k2 < N2/keep_frac.
    k2_out = N2 // keep_frac
    w2r_c = w2r[:k2_out]
    w2i_c = w2i[:k2_out]
    if real_output:  # caller discards the imaginary part: 2 matmuls
        cr = _mm(w2r_c, br, prec) - _mm(w2i_c, bi, prec)
        yr = cr.reshape(k2_out * N1, L)
        return (yr / N, None) if inverse else (yr, None)
    cr, ci = _cmm(_mm, w2r_c, w2i_c, br, bi, prec)
    yr = cr.reshape(k2_out * N1, L)
    yi = ci.reshape(k2_out * N1, L)
    if inverse:
        yr = yr / N
        yi = yi / N
    return yr, yi


def _k1_kernel(xr_ref, w1r, w1i, w2r, w2i, twr, twi, or_ref, oi_ref,
               *, N, L):
    C = (w1r[...], w1i[...], w2r[...], w2i[...], twr[...], twi[...])
    xr = xr_ref[...]
    yr, yi = _fft_sublane_block(xr, jnp.zeros_like(xr), C, N, L, False)
    or_ref[...] = yr
    oi_ref[...] = yi


def _k2_kernel(xr_ref, xi_ref, hrT_ref, hiT_ref, w1r, w1i, w2r, w2i,
               twr, twi, or_ref, oi_ref, *, N, M):
    """Lane-axis FFT via in-VMEM 2D transpose + sublane four-step —
    Mosaic rejects minor-axis shape casts, but 2D transposes and
    transposes that keep the lane dim fixed are supported."""
    C = (w1r[...], w1i[...], w2r[...], w2i[...], twr[...], twi[...])
    xr = xr_ref[...].T  # (N, M)
    xi = xi_ref[...].T
    ar, ai = _fft_sublane_block(xr, xi, C, N, M, False)
    hr = hrT_ref[...]   # (N, M) tile of H transposed
    hi = hiT_ref[...]
    br = ar * hr - ai * hi
    bi = ar * hi + ai * hr
    yr, yi = _fft_sublane_block(br, bi, C, N, M, True)
    or_ref[...] = yr.T
    oi_ref[...] = yi.T


def _k3_kernel(xr_ref, xi_ref, w1r, w1i, w2r, w2i, twr, twi, or_ref,
               *, N, L):
    C = (w1r[...], w1i[...], w2r[...], w2i[...], twr[...], twi[...])
    yr, _ = _fft_sublane_block(xr_ref[...], xi_ref[...], C, N, L, True)
    or_ref[...] = yr


def _k1o_kernel(xr_ref, w1r, w1i, w2r, w2i, twr, twi, or_ref, oi_ref,
                *, N, L, prec=None):
    """Zero-aware K1: input block has only the top N/2 (nonzero) rows;
    the stage-1 matmul contracts just those."""
    C = (w1r[...], w1i[...], w2r[...], w2i[...], twr[...], twi[...])
    xr = xr_ref[...]
    yr, yi = _fft_sublane_block(xr, None, C, N, L, False,
                                zero_frac=2, prec=prec)
    or_ref[...] = yr
    oi_ref[...] = yi


def _k2o_kernel(xr_ref, xi_ref, hrT_ref, hiT_ref, w1r, w1i, w2r, w2i,
                twr, twi, or_ref, oi_ref, *, N, M):
    """Zero/crop-aware K2: input tiles carry only the ny nonzero lanes
    (transposed: top N/2 rows); the inverse computes only the rows the
    final crop keeps."""
    C = (w1r[...], w1i[...], w2r[...], w2i[...], twr[...], twi[...])
    xr = xr_ref[...].T  # (N/2, M)
    xi = xi_ref[...].T
    ar, ai = _fft_sublane_block(xr, xi, C, N, M, False, zero_frac=2)
    hr = hrT_ref[...]   # (N, M)
    hi = hiT_ref[...]
    br = ar * hr - ai * hi
    bi = ar * hi + ai * hr
    yr, yi = _fft_sublane_block(br, bi, C, N, M, True, keep_frac=2)
    or_ref[...] = yr.T  # (M, N/2)
    oi_ref[...] = yi.T


def _k3o_kernel(xr_ref, xi_ref, w1r, w1i, w2r, w2i, twr, twi, or_ref,
                *, N, L, prec=None):
    """Crop-aware K3: inverse computes only the top N/2 output rows."""
    C = (w1r[...], w1i[...], w2r[...], w2i[...], twr[...], twi[...])
    yr, _ = _fft_sublane_block(xr_ref[...], xi_ref[...], C, N, L, True,
                               keep_frac=2, prec=prec,
                               real_output=True)
    or_ref[...] = yr


def _const_specs(N):
    N1, N2 = _factor(N)
    full = lambda shape: pl.BlockSpec(shape, lambda *_: tuple(
        0 for _ in shape), memory_space=pltpu.VMEM)
    return [full((N1, N1)), full((N1, N1)), full((N2, N2)),
            full((N2, N2)), full((N1, N2)), full((N1, N2))]


# ---------------------------------------------------------------------
# v2 lane-axis transform: transpose-free. The lane FFT is factorised
# with N2 = 128 (the lane tile width) so every stage is a dot_general
# whose output keeps a 128-wide minor dim; the spectrum lives in a
# scrambled (k1, m, k2) layout that only K2 ever sees — H is
# pre-scrambled to match (scramble_HT) and the inverse consumes the
# scrambled order directly, emitting natural layout via a leading-dims
# transpose + lane join (both Mosaic-supported).
# ---------------------------------------------------------------------

def _factor_lane(N):
    assert N % 128 == 0
    return N // 128, 128


@lru_cache(maxsize=None)
def _consts_lane_np(N):
    N1, N2 = _factor_lane(N)
    n1 = np.arange(N1)
    n2 = np.arange(N2)
    W1 = np.exp(-2j * np.pi * np.outer(n1, n1) / N1)
    W2 = np.exp(-2j * np.pi * np.outer(n2, n2) / N2)
    tw = np.exp(-2j * np.pi * np.outer(n1, n2) / N)
    f32 = np.float32
    return (N1, N2,
            W1.real.astype(f32), W1.imag.astype(f32),
            W2.real.astype(f32), W2.imag.astype(f32),
            tw.real.astype(f32), tw.imag.astype(f32))


def consts_lane_for(N):
    N1, N2, w1r, w1i, w2r, w2i, twr, twi = _consts_lane_np(N)
    return tuple(jnp.asarray(a) for a in (w1r, w1i, w2r, w2i, twr, twi))


def _const_specs_lane(N):
    N1, N2 = _factor_lane(N)
    full = lambda shape: pl.BlockSpec(shape, lambda *_: tuple(
        0 for _ in shape), memory_space=pltpu.VMEM)
    return [full((N1, N1)), full((N1, N1)), full((N2, N2)),
            full((N2, N2)), full((N1, N2)), full((N1, N2))]


# -- twiddle-absorbed lane constants: the four-step's twiddle factors
# fold into per-n1 BATCHED stage-2 matrices, WTf[n1, n2, k2] =
# W2[k2, n2] tw[n1, n2] (forward) and its conjugate-transpose
# (inverse) — two full VPU elementwise passes per K2 grid step move
# onto the MXU (same flop count: batched matmuls with a different
# 128-point matrix per n1) where the pipeline has headroom.

@lru_cache(maxsize=None)
def _consts_lane_tw_np(N):
    N1, N2 = _factor_lane(N)
    n1 = np.arange(N1)
    n2 = np.arange(N2)
    W1 = np.exp(-2j * np.pi * np.outer(n1, n1) / N1)
    W2 = np.exp(-2j * np.pi * np.outer(n2, n2) / N2)
    tw = np.exp(-2j * np.pi * np.outer(n1, n2) / N)
    # WTf[n1, n2, k2] = W2[k2, n2] * tw[n1, n2]
    WTf = W2.T[None, :, :] * tw[:, :, None]
    # WTi[n1, k2, n2] = conj(WTf[n1, n2, k2])
    WTi = np.conj(WTf).transpose(0, 2, 1)
    f32 = np.float32
    return (W1.real.astype(f32), W1.imag.astype(f32),
            WTf.real.astype(f32), WTf.imag.astype(f32),
            WTi.real.astype(f32), WTi.imag.astype(f32))


def consts_lane_tw_for(N):
    return tuple(jnp.asarray(a) for a in _consts_lane_tw_np(N))


def _const_specs_lane_tw(N):
    N1, N2 = _factor_lane(N)
    full = lambda shape: pl.BlockSpec(shape, lambda *_: tuple(
        0 for _ in shape), memory_space=pltpu.VMEM)
    return [full((N1, N1)), full((N1, N1)), full((N1, N2, N2)),
            full((N1, N2, N2)), full((N1, N2, N2)),
            full((N1, N2, N2))]


# -- twiddle-absorbed SUBLANE constants (K1/K3): with input rows
# grouped n = n1*N2 + n2 and output k = k1 + N1*k2, the four-step
# phase splits as k1*n1/N1 (stage 1) + k1*n2/N (twiddle) + k2*n2/N2
# (stage 2). The twiddle depends on (k1, n2), so it folds into a
# per-n2 BATCH of stage-1 matrices; stage 2 then contracts the
# leading n2 axis with one 2D matmul whose output rows come out in
# the natural k2-major order — no twiddle pass and no relayouts.

@lru_cache(maxsize=None)
def _consts_k1t_np(N):
    """K1 (forward, real input, Hermitian crop): W1tw[n2, k1, n1] =
    W1[k1, n1] tw[k1, n2] sliced to the nonzero n1 < N1/2, plus the
    cropped W2[:N2/2+1]."""
    N1, N2 = _factor(N)
    n1 = np.arange(N1)
    n2 = np.arange(N2)
    W1 = np.exp(-2j * np.pi * np.outer(n1, n1) / N1)
    tw = np.exp(-2j * np.pi * np.outer(n1, n2) / N)
    W2 = np.exp(-2j * np.pi * np.outer(n2, n2) / N2)
    n1_in = N1 // 2
    W1tw = W1[None, :, :n1_in] * tw.T[:, :, None]   # (N2, N1, n1_in)
    W2c = W2[:N2 // 2 + 1]
    f32 = np.float32
    return (W1tw.real.astype(f32), W1tw.imag.astype(f32),
            W2c.real.astype(f32), W2c.imag.astype(f32))


def consts_k1t_for(N):
    return tuple(jnp.asarray(a) for a in _consts_k1t_np(N))


@lru_cache(maxsize=None)
def _consts_k3t_np(N):
    """K3 (inverse, Hermitian reconstruction, real output): conjugated
    constants with the mirror pass STITCHED into the stage-1 batch
    (columns n1A..n1C) and the mirror row mask (1 <= r <= N/2 - N1)
    folded into those columns — the kernel needs no iota/where and no
    second stage-1 pass."""
    N1, N2 = _factor(N)
    n1 = np.arange(N1)
    n2 = np.arange(N2)
    W1c = np.exp(+2j * np.pi * np.outer(n1, n1) / N1)   # (j, a)
    twc = np.exp(+2j * np.pi * np.outer(n1, n2) / N)    # (j, b)
    W2c = np.exp(+2j * np.pi * np.outer(n2, n2) / N2)   # (m, b)
    n1A = N1 // 2 + N1 // N2
    n1B = N1 // 2 - N1 // N2 + 1
    A = W1c[None, :, :n1A] * twc.T[:, :, None]          # (N2, N1, n1A)
    aB, bB = np.meshgrid(np.arange(n1B), np.arange(N2), indexing="ij")
    r = aB * N2 + bB
    M = ((r >= 1) & (r <= N // 2 - N1)).astype(float)   # (n1B, N2)
    B = (W1c[None, :, :n1B] * twc.T[:, :, None]
         * M.T[:, None, :])                             # (N2, N1, n1B)
    W1tw3 = np.concatenate([A, B], axis=2)              # (N2, N1, n1C)
    W2k = W2c[:N2 // 2]
    f32 = np.float32
    return (W1tw3.real.astype(f32), W1tw3.imag.astype(f32),
            W2k.real.astype(f32), W2k.imag.astype(f32))


def consts_k3t_for(N):
    return tuple(jnp.asarray(a) for a in _consts_k3t_np(N))


def _const_specs_k1t(N):
    N1, N2 = _factor(N)
    full = lambda shape: pl.BlockSpec(shape, lambda *_: tuple(
        0 for _ in shape), memory_space=pltpu.VMEM)
    return [full((N2, N1, N1 // 2)), full((N2, N1, N1 // 2)),
            full((N2 // 2 + 1, N2)), full((N2 // 2 + 1, N2))]


def _const_specs_k3t(N):
    N1, N2 = _factor(N)
    n1C = N1 + 1
    full = lambda shape: pl.BlockSpec(shape, lambda *_: tuple(
        0 for _ in shape), memory_space=pltpu.VMEM)
    return [full((N2, N1, n1C)), full((N2, N1, n1C)),
            full((N2 // 2, N2)), full((N2 // 2, N2))]


def _dotg_b1(W, x, prec=None):
    """(B, K, n) x (B, n, L) -> (B, K, L): leading-dim batch B,
    contract n (Mosaic's tpu.matmul requires the batch dims at the
    SAME index in both operands — the mixed-position form compiles in
    interpret mode but is rejected on the chip)."""
    return jax.lax.dot_general(W, x, (((2,), (1,)), ((0,), (0,))),
                               precision=prec or _HI,
                               preferred_element_type=jnp.float32)


def _k1t_core(xr, wtr, wti, w2r, w2i, L, prec=None):
    """Twiddle-absorbed K1 body on a 2D (nx, L) real strip: batched
    stage-1 (per-n2 matrices) -> (N2, N1, L), then one 2D stage-2
    matmul over the leading n2 emitting the Hermitian-cropped spectrum
    rows k = k1 + N1*k2 in natural order."""
    N2, N1, n1_in = wtr.shape
    # (n1, N2, L) -> (N2, n1, L): leading-dims transpose, lane fixed
    x3 = xr.reshape(n1_in, N2, L).transpose(1, 0, 2)
    cr = _dotg_b1(wtr, x3, prec)
    ci = _dotg_b1(wti, x3, prec)
    cr = cr.reshape(N2, N1 * L)
    ci = ci.reshape(N2, N1 * L)
    return _cmm(_mm, w2r, w2i, cr, ci, prec)


def _k1t_kernel(xr_ref, wtr_, wti_, w2r_, w2i_, or_ref, oi_ref, *,
                N, L, prec=None):
    xr = xr_ref[...].reshape(xr_ref.shape[-2:])
    yr, yi = _k1t_core(xr, wtr_[...], wti_[...], w2r_[...], w2i_[...],
                       L, prec)
    or_ref[...] = yr.reshape(or_ref.shape)
    oi_ref[...] = yi.reshape(oi_ref.shape)


def _k1t_cg_kernel(pr_ref, rr_ref, be_ref, wtr_, wti_, w2r_, w2i_,
                   pn_ref, or_ref, oi_ref, *, N, L, prec=None):
    """CG-fused K1: computes the search-direction update
    p = beta*p_prev - r IN the kernel (the standalone axpy pass of the
    CG iteration rides the strips K1 already streams), emits p and its
    x-spectrum."""
    beta = be_ref[0, 0, 0]
    pp = pr_ref[...].reshape(pr_ref.shape[-2:])
    rr = rr_ref[...].reshape(rr_ref.shape[-2:])
    pn = beta * pp - rr
    pn_ref[...] = pn.reshape(pn_ref.shape)
    yr, yi = _k1t_core(pn, wtr_[...], wti_[...], w2r_[...], w2i_[...],
                       L, prec)
    or_ref[...] = yr.reshape(or_ref.shape)
    oi_ref[...] = yi.reshape(oi_ref.shape)


def _k3t_core(xr, xi, wtr, wti, w2r, w2i, N, prec=None):
    """Twiddle-absorbed K3 body on 2D spectrum strips: the stitched
    (main + masked-mirror) batched stage-1 consumes the NXH kept
    spectrum rows; the real-output stage-2 is one pair of 2D matmuls
    over the leading n2 emitting the cropped image rows in natural
    order."""
    N2, N1, n1C = wtr.shape
    n1B = n1C - (N1 // 2 + N1 // N2)
    L_ = xr.shape[-1]
    xrC = jnp.concatenate([xr, xr[:n1B * N2]], axis=0).reshape(
        n1C, N2, L_).transpose(1, 0, 2)
    xiC = jnp.concatenate([xi, xi[:n1B * N2]], axis=0).reshape(
        n1C, N2, L_).transpose(1, 0, 2)
    cr, ci = _cmm(_dotg_b1, wtr, wti, xrC, xiC, prec)
    cr = cr.reshape(N2, N1 * L_)
    ci = ci.reshape(N2, N1 * L_)
    yr = _mm(w2r, cr, prec) - _mm(w2i, ci, prec)
    return yr * (1.0 / N)


def _k3t_kernel(xr_ref, xi_ref, wtr_, wti_, w2r_, w2i_, or_ref, *,
                N, L, prec=None):
    xr = xr_ref[...].reshape(xr_ref.shape[-2:])
    xi = xi_ref[...].reshape(xi_ref.shape[-2:])
    yr = _k3t_core(xr, xi, wtr_[...], wti_[...], w2r_[...], w2i_[...],
                   N, prec)
    or_ref[...] = yr.reshape(or_ref.shape)


def _k3t_cg_kernel(xr_ref, xi_ref, p_ref, wtr_, wti_, w2r_, w2i_,
                   or_ref, pap_ref, *, N, L, prec=None):
    """CG-fused K3: besides the conv output, accumulates the CG
    scalars [p . conv(p), p . p] per band into a (1, 1, 2) output
    block (constant block index over the lane-strip grid axis -> the
    accumulator stays VMEM-resident per band and is flushed once)."""
    xr = xr_ref[...].reshape(xr_ref.shape[-2:])
    xi = xi_ref[...].reshape(xi_ref.shape[-2:])
    yr = _k3t_core(xr, xi, wtr_[...], wti_[...], w2r_[...], w2i_[...],
                   N, prec).reshape(or_ref.shape[-2:])
    or_ref[...] = yr.reshape(or_ref.shape)
    p2 = p_ref[...].reshape(p_ref.shape[-2:])
    pap = jnp.sum(p2 * yr)
    pp = jnp.sum(p2 * p2)
    j = pl.program_id(1)
    # Mosaic cannot store SCALARS to VMEM — build the (1, 1, 2)
    # vector [pap, pp] with an iota select and store whole-block
    lane = lax.broadcasted_iota(jnp.int32, (1, 1, 2), 2)
    vals = jnp.where(lane == 0, pap, pp)

    @pl.when(j == 0)
    def _():
        pap_ref[...] = vals

    @pl.when(j != 0)
    def _():
        pap_ref[...] += vals


def v3_supported(nx, ny):
    """Shape constraints of the v3 pipeline: NY must factor with
    N2 = 128 lanes and an even N1 (the zero-aware stages assume the
    nonzero half is whole factor blocks); NX's factorisation must
    split evenly AND have N2 | N1 — K3's kept-row bookkeeping
    (n1A = N1/2 + N1/N2 stage-1 blocks) requires NXH = N1*(N2/2+1) to
    be whole N2-row blocks."""
    NX, NY = 2 * nx, 2 * ny
    if NY % 128 or (NY // 128) % 2:
        return False
    N1x, N2x = _factor(NX)
    return N1x % 2 == 0 and N2x % 2 == 0 and N1x % N2x == 0


def prep_H_v3(HT):
    """Half-height scrambled transfer function for the v3 pipeline:
    keep only the x-spectrum rows K1 emits (k < NXH, whole k2 blocks
    covering the Nyquist row), then scramble for the K2 multiply."""
    NX = HT.shape[-1]
    N1x, N2x = _factor(NX)
    return scramble_HT(HT[..., :N1x * (N2x // 2 + 1)])


def scramble_HT(HT):
    """(..., NY, NX) transposed transfer function -> the
    (..., N1y, NX, N2y) scrambled layout the v2 K2 kernel multiplies
    in: spectrum index k = k1 + N1*k2 maps to [..., k1, :, k2]."""
    NY, NX = HT.shape[-2:]
    N1, N2 = _factor_lane(NY)
    lead = HT.shape[:-2]
    h = HT.reshape(*lead, N2, N1, NX)  # axes: (..., k2, k1, NX)
    nl = len(lead)
    perm = tuple(range(nl)) + (nl + 1, nl + 2, nl + 0)
    return jnp.transpose(h, perm)


def _dotg_left1(W, x, prec=None):
    """(K, n) x (M, n, L) -> (K, M, L), contracting n."""
    return jax.lax.dot_general(W, x, (((1,), (1,)), ((), ())),
                               precision=prec or _HI,
                               preferred_element_type=jnp.float32)


def _dotg_left0(W, x, prec=None):
    """(K, n) x (n, M, L) -> (K, M, L), contracting n."""
    return jax.lax.dot_general(W, x, (((1,), (0,)), ((), ())),
                               precision=prec or _HI,
                               preferred_element_type=jnp.float32)


def _dotg_right(x, W, prec=None):
    """(A, M, n) x (K, n) -> (A, M, K), contracting n (lanes)."""
    return jax.lax.dot_general(x, W, (((2,), (1,)), ((), ())),
                               precision=prec or _HI,
                               preferred_element_type=jnp.float32)


def _k2v_core(xr_ref, xi_ref, hsr_ref, hsi_ref, consts, or_ref, oi_ref,
              N, M, prec):
    """Transpose-free K2 body: forward lane FFT (zero-aware), multiply
    by the pre-scrambled H, inverse lane FFT (crop-aware), natural
    output. ``hsi_ref is None`` selects the real-transfer-function
    path (even PSF -> H real): half the H traffic and multiply work."""
    w1r_, w1i_, w2r_, w2i_, twr_, twi_ = consts
    w1r, w1i = w1r_[...], w1i_[...]
    w2r, w2i = w2r_[...], w2i_[...]
    twr = twr_[...][:, None, :]
    twi = twi_[...][:, None, :]
    N1 = w1r.shape[0]
    N2 = w2r.shape[0]
    n1_in = N1 // 2  # nonzero lanes n < N/2

    xr = xr_ref[...].reshape(M, n1_in, N2)
    xi = xi_ref[...].reshape(M, n1_in, N2)
    # forward stage 1 over n1 (zero-aware): (N1, M, N2)
    w1r_c = w1r[:, :n1_in]
    w1i_c = w1i[:, :n1_in]
    ar, ai = _cmm(_dotg_left1, w1r_c, w1i_c, xr, xi, prec)
    br = ar * twr - ai * twi
    bi = ar * twi + ai * twr
    # forward stage 2 over n2 (lanes): scrambled spectrum (N1, M, K2)
    dotR = lambda w, x, p: _dotg_right(x, w, p)
    sr, si = _cmm(dotR, w2r, w2i, br, bi, prec)
    # multiply pre-scrambled H (reshape drops a leading unit band dim)
    hr = hsr_ref[...].reshape(hsr_ref.shape[-3:])
    if hsi_ref is None:
        pr = sr * hr
        pi_ = si * hr
    else:
        hi = hsi_ref[...].reshape(hsi_ref.shape[-3:])
        pr = sr * hr - si * hi
        pi_ = sr * hi + si * hr
    # inverse stage A over k2 (lanes), conjugated W2
    cr, ci = _cmm(dotR, w2r, -w2i, pr, pi_, prec)
    dr = cr * twr + ci * twi
    di = ci * twr - cr * twi
    # inverse stage B over k1, conjugated W1, crop-aware (n1 < N1/2)
    w1r_k = w1r[:n1_in]
    w1i_k = w1i[:n1_in]
    er, ei = _cmm(_dotg_left0, w1r_k, -w1i_k, dr, di, prec)
    inv = 1.0 / N
    # natural layout: (n1, M, N2) -> (M, n1, N2) -> (M, ny)
    or_ref[...] = (er * inv).transpose(1, 0, 2).reshape(or_ref.shape)
    oi_ref[...] = (ei * inv).transpose(1, 0, 2).reshape(oi_ref.shape)


def _k2v_kernel(xr_ref, xi_ref, hsr_ref, hsi_ref, w1r_, w1i_, w2r_,
                w2i_, twr_, twi_, or_ref, oi_ref, *, N, M, prec=None):
    _k2v_core(xr_ref, xi_ref, hsr_ref, hsi_ref,
              (w1r_, w1i_, w2r_, w2i_, twr_, twi_), or_ref, oi_ref,
              N, M, prec)


def _k2vr_kernel(xr_ref, xi_ref, hsr_ref, w1r_, w1i_, w2r_, w2i_,
                 twr_, twi_, or_ref, oi_ref, *, N, M, prec=None):
    """K2 with a REAL transfer function (even PSF)."""
    _k2v_core(xr_ref, xi_ref, hsr_ref, None,
              (w1r_, w1i_, w2r_, w2i_, twr_, twi_), or_ref, oi_ref,
              N, M, prec)


def _dotg_batch(x, W, prec=None):
    """(B, M, n) x (B, n, K) -> (B, M, K), batching B, contracting n
    (x's lane dim against W's middle dim — Mosaic-friendly on both
    sides)."""
    return jax.lax.dot_general(x, W, (((2,), (1,)), ((0,), (0,))),
                               precision=prec or _HI,
                               preferred_element_type=jnp.float32)


def _k2t_core(xr_ref, xi_ref, hsr_ref, hsi_ref, consts, or_ref, oi_ref,
              N, M, prec):
    """Twiddle-absorbed K2 body: identical math to :func:`_k2v_core`
    but stage 2 / inverse stage A run as per-n1 batched matmuls
    against the WTf/WTi constants (twiddles pre-multiplied in), so the
    kernel has NO elementwise twiddle passes — the VPU work that
    bounded the v3 K2 moves onto the MXU at the same flop count."""
    w1r_, w1i_, wtfr_, wtfi_, wtir_, wtii_ = consts
    w1r, w1i = w1r_[...], w1i_[...]
    wtfr, wtfi = wtfr_[...], wtfi_[...]
    wtir, wtii = wtir_[...], wtii_[...]
    N1 = w1r.shape[0]
    N2 = wtfr.shape[1]
    n1_in = N1 // 2  # nonzero lanes n < N/2

    xr = xr_ref[...].reshape(M, n1_in, N2)
    xi = xi_ref[...].reshape(M, n1_in, N2)
    # forward stage 1 over n1 (zero-aware): (N1, M, N2)
    w1r_c = w1r[:, :n1_in]
    w1i_c = w1i[:, :n1_in]
    ar, ai = _cmm(_dotg_left1, w1r_c, w1i_c, xr, xi, prec)
    # forward stage 2 + twiddle in one batched matmul: (N1, M, K2)
    dotB = lambda w, x, p: _dotg_batch(x, w, p)
    sr, si = _cmm(dotB, wtfr, wtfi, ar, ai, prec)
    # multiply pre-scrambled H (reshape drops a leading unit band dim)
    hr = hsr_ref[...].reshape(hsr_ref.shape[-3:])
    if hsi_ref is None:
        pr = sr * hr
        pi_ = si * hr
    else:
        hi = hsi_ref[...].reshape(hsi_ref.shape[-3:])
        pr = sr * hr - si * hi
        pi_ = sr * hi + si * hr
    # inverse stage A + inverse twiddle, batched conj: (N1, M, N2)
    cr, ci = _cmm(dotB, wtir, wtii, pr, pi_, prec)
    # inverse stage B over k1, conjugated W1, crop-aware (n1 < N1/2)
    w1r_k = w1r[:n1_in]
    w1i_k = w1i[:n1_in]
    er, ei = _cmm(_dotg_left0, w1r_k, -w1i_k, cr, ci, prec)
    inv = 1.0 / N
    # natural layout: (n1, M, N2) -> (M, n1, N2) -> (M, ny)
    or_ref[...] = (er * inv).transpose(1, 0, 2).reshape(or_ref.shape)
    oi_ref[...] = (ei * inv).transpose(1, 0, 2).reshape(oi_ref.shape)


def _k2t_kernel(xr_ref, xi_ref, hsr_ref, hsi_ref, w1r_, w1i_, wtfr_,
                wtfi_, wtir_, wtii_, or_ref, oi_ref, *, N, M,
                prec=None):
    _k2t_core(xr_ref, xi_ref, hsr_ref, hsi_ref,
              (w1r_, w1i_, wtfr_, wtfi_, wtir_, wtii_), or_ref,
              oi_ref, N, M, prec)


def _k2tr_kernel(xr_ref, xi_ref, hsr_ref, w1r_, w1i_, wtfr_, wtfi_,
                 wtir_, wtii_, or_ref, oi_ref, *, N, M, prec=None):
    """Twiddle-absorbed K2 with a REAL transfer function."""
    _k2t_core(xr_ref, xi_ref, hsr_ref, None,
              (w1r_, w1i_, wtfr_, wtfi_, wtir_, wtii_), or_ref,
              oi_ref, N, M, prec)


# ---------------------------------------------------------------------
# v3 sublane transforms: transpose-free AND Hermitian-aware.
# The sublane four-step's stage-2 contraction runs as a 3D dot_general
# (W2 against the (k1, n2, L) tensor) so the (1,0,2) relayout of
# v1/v2's K1/K3 disappears, and because the image is real its
# x-spectrum obeys Z(NX-k) = conj(Z(k)): K1 emits only the rows
# k <= NX/2 (padded to whole k2 blocks, NXH = N1*(N2/2+1)), K2 runs on
# HALF the row strips against a half-height H, and K3 reconstructs the
# missing rows analytically — the mirror sum collapses to a second
# stage-1 pass added BEFORE the (linear) stage 2:
#   y(n) = Re[ sum_{k<NXH} W(k) e^{2pi i kn/N}
#            + sum_{1<=m<=N/2-N1} W(m) e^{2pi i mn/N} ] / N
# ---------------------------------------------------------------------

def _stage12_dotg(xr, xi, C, n1_in, L, prec):
    """Stage 1 + twiddle of the four-step with constants C (caller
    conjugates for inverse); input (n1_in*N2, L) -> (N1, N2, L)."""
    w1r, w1i, w2r, w2i, twr, twi = C
    N2 = w2r.shape[0]
    xr = xr.reshape(n1_in, N2 * L)
    w1r_c = w1r[:, :n1_in]
    w1i_c = w1i[:, :n1_in]
    if xi is None:
        ar = _mm(w1r_c, xr, prec)
        ai = _mm(w1i_c, xr, prec)
    else:
        xi = xi.reshape(n1_in, N2 * L)
        ar, ai = _cmm(_mm, w1r_c, w1i_c, xr, xi, prec)
    N1 = w1r.shape[0]
    ar = ar.reshape(N1, N2, L)
    ai = ai.reshape(N1, N2, L)
    br = ar * twr[:, :, None] - ai * twi[:, :, None]
    bi = ar * twi[:, :, None] + ai * twr[:, :, None]
    return br, bi


def _stage2_dotg(br, bi, C, k2_keep, L, prec, real_output=False):
    """Transpose-free stage 2: contract n2 with the (cropped) W2 via a
    3D dot_general; output rows k = k1 + N1*k2 in natural order."""
    w2r, w2i = C[2][:k2_keep], C[3][:k2_keep]
    N1 = br.shape[0]
    if real_output:  # 2 matmuls beat the 3-mult form here
        cr = _dotg_left1(w2r, br, prec) - _dotg_left1(w2i, bi, prec)
        return cr.reshape(k2_keep * N1, L), None
    cr, ci = _cmm(_dotg_left1, w2r, w2i, br, bi, prec)
    return (cr.reshape(k2_keep * N1, L),
            ci.reshape(k2_keep * N1, L))


def _k1h_kernel(xr_ref, w1r, w1i, w2r, w2i, twr, twi, or_ref, oi_ref,
                *, N, L, prec=None):
    """Hermitian-cropped forward K1: real input strip of nx = N/2
    nonzero rows; emits only the spectrum rows k < N1*(N2/2+1).
    Blocks may carry a leading unit band dim (cube pipeline)."""
    C = (w1r[...], w1i[...], w2r[...], w2i[...], twr[...], twi[...])
    N1, N2 = C[0].shape[0], C[2].shape[0]
    xr = xr_ref[...].reshape(xr_ref.shape[-2:])
    br, bi = _stage12_dotg(xr, None, C, N1 // 2, L, prec)
    yr, yi = _stage2_dotg(br, bi, C, N2 // 2 + 1, L, prec)
    or_ref[...] = yr.reshape(or_ref.shape)
    oi_ref[...] = yi.reshape(oi_ref.shape)


def _k3h_kernel(xr_ref, xi_ref, w1r, w1i, w2r, w2i, twr, twi, or_ref,
                *, N, L, prec=None):
    """Hermitian-reconstructing real-output inverse K3: consumes the
    NXH = N1*(N2/2+1) kept spectrum rows; the conjugate-mirror rows'
    contribution (rows 1..N/2-N1, same conjugated constants) rides in
    the SAME stage-1 matmul by stitching the mirror rows and their W1
    column slice onto the main pass — the twiddle is linear and
    shared, so one pass replaces the former two (one twiddle + one
    add pass fewer on the VPU)."""
    Cf = (w1r[...], w1i[...], w2r[...], w2i[...], twr[...], twi[...])
    C = (Cf[0], -Cf[1], Cf[2], -Cf[3], Cf[4], -Cf[5])  # inverse
    N1, N2 = C[0].shape[0], C[2].shape[0]
    assert N1 % N2 == 0, (N1, N2)  # see v3_supported
    xr = xr_ref[...].reshape(xr_ref.shape[-2:])
    xi = xi_ref[...].reshape(xi_ref.shape[-2:])
    n1A = N1 // 2 + N1 // N2          # NXH / N2 blocks
    # mirror term: rows m in [1, N/2 - N1], zero-masked within blocks
    n1B = N1 // 2 - N1 // N2 + 1
    m_max = N // 2 - N1
    rows = lax.broadcasted_iota(jnp.int32, (n1B * N2, L), 0)
    keep = (rows >= 1) & (rows <= m_max)
    xrB = jnp.where(keep, xr[:n1B * N2], 0.0)
    xiB = jnp.where(keep, xi[:n1B * N2], 0.0)
    n1C = n1A + n1B
    xrC = jnp.concatenate([xr, xrB], axis=0).reshape(n1C, N2 * L)
    xiC = jnp.concatenate([xi, xiB], axis=0).reshape(n1C, N2 * L)
    w1r_c = jnp.concatenate([C[0][:, :n1A], C[0][:, :n1B]], axis=1)
    w1i_c = jnp.concatenate([C[1][:, :n1A], C[1][:, :n1B]], axis=1)
    ar, ai = _cmm(_mm, w1r_c, w1i_c, xrC, xiC, prec)
    ar = ar.reshape(N1, N2, L)
    ai = ai.reshape(N1, N2, L)
    br = ar * C[4][:, :, None] - ai * C[5][:, :, None]
    bi = ar * C[5][:, :, None] + ai * C[4][:, :, None]
    yr, _ = _stage2_dotg(br, bi, C, N2 // 2, L, prec, real_output=True)
    or_ref[...] = (yr * (1.0 / N)).reshape(or_ref.shape)


@partial(jax.jit, static_argnames=("nx", "ny", "lane_block",
                                   "row_block", "interpret",
                                   "vmem_mb", "precision"))
def psf_convolve_pallas_v3(x, Hsr, Hsi, nx, ny, lane_block=128,
                           row_block=128, interpret=False,
                           vmem_mb=100, precision="default"):
    """Hermitian-aware transpose-free fused PSF convolution
    (psf_oversize=2 only): K2 runs on the NXH = NX/2 + N1x kept
    x-spectrum rows against the half-height scrambled H from
    ``scramble_HT(HT[..., :NXH])`` — ~half the MXU work and half the
    H traffic of v2. ``Hsi=None`` selects the real-transfer-function
    K2 (even PSF -> H real), halving the H traffic again."""
    prec = {"highest": jax.lax.Precision.HIGHEST,
            "default": jax.lax.Precision.DEFAULT}[precision]
    N1y, NXH, N2y = Hsr.shape
    NY = N1y * N2y
    NX = 2 * nx
    N1x, N2x = _factor(NX)
    assert NXH == N1x * (N2x // 2 + 1), (NXH, N1x, N2x)
    assert NY == 2 * ny
    assert NXH % row_block == 0, (NXH, row_block)
    CK1 = consts_k1t_for(NX)
    CK3 = consts_k3t_for(NX)
    CYt = consts_lane_tw_for(NY)
    kw = dict(interpret=interpret)
    if not interpret:
        kw["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb * 1024 * 1024)

    in_strip = lambda L: pl.BlockSpec((nx, L), lambda j: (0, j),
                                      memory_space=pltpu.VMEM)
    h_strip = lambda L: pl.BlockSpec((NXH, L), lambda j: (0, j),
                                     memory_space=pltpu.VMEM)
    rows_half = lambda M: pl.BlockSpec((M, ny), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM)
    hspec = lambda M: pl.BlockSpec((N1y, M, N2y), lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM)

    zr, zi = pl.pallas_call(
        partial(_k1t_kernel, N=NX, L=lane_block, prec=prec),
        grid=(ny // lane_block,),
        in_specs=[in_strip(lane_block)] + _const_specs_k1t(NX),
        out_specs=(h_strip(lane_block), h_strip(lane_block)),
        out_shape=(jax.ShapeDtypeStruct((NXH, ny), jnp.float32),
                   jax.ShapeDtypeStruct((NXH, ny), jnp.float32)),
        **kw,
    )(x, *CK1)

    if Hsi is None:
        k2 = partial(_k2tr_kernel, N=NY, M=row_block, prec=prec)
        h_in = [hspec(row_block)]
        h_args = (Hsr,)
    else:
        k2 = partial(_k2t_kernel, N=NY, M=row_block, prec=prec)
        h_in = [hspec(row_block)] * 2
        h_args = (Hsr, Hsi)
    wr, wi = pl.pallas_call(
        k2,
        grid=(NXH // row_block,),
        in_specs=[rows_half(row_block)] * 2 + h_in
        + _const_specs_lane_tw(NY),
        out_specs=(rows_half(row_block), rows_half(row_block)),
        out_shape=(jax.ShapeDtypeStruct((NXH, ny), jnp.float32),
                   jax.ShapeDtypeStruct((NXH, ny), jnp.float32)),
        **kw,
    )(zr, zi, *h_args, *CYt)

    out = pl.pallas_call(
        partial(_k3t_kernel, N=NX, L=lane_block, prec=prec),
        grid=(ny // lane_block,),
        in_specs=[h_strip(lane_block)] * 2 + _const_specs_k3t(NX),
        out_specs=in_strip(lane_block),
        out_shape=jax.ShapeDtypeStruct((nx, ny), jnp.float32),
        **kw,
    )(wr, wi, *CK3)
    return out


@partial(jax.jit, static_argnames=("nx", "ny", "lane_block",
                                   "row_block", "interpret",
                                   "vmem_mb", "precision"))
def psf_convolve_pallas_v3_cube(x, Hsr, Hsi, nx, ny, lane_block=128,
                                row_block=128, interpret=False,
                                vmem_mb=100, precision="default"):
    """Whole-cube v3 pipeline: the band axis is a leading grid
    dimension of every kernel, so an (nband, nx, ny) Hessian matvec is
    THREE pallas dispatches total — no per-band host slicing (which
    cost as much as the kernels themselves: ~3 ms/band of
    dynamic-slice/squeeze/copy dispatches on the remote runtime)."""
    prec = {"highest": jax.lax.Precision.HIGHEST,
            "default": jax.lax.Precision.DEFAULT}[precision]
    nband = x.shape[0]
    _, NXH, N2y = Hsr.shape[-3:]
    N1y = Hsr.shape[-3]
    NY = N1y * N2y
    NX = 2 * nx
    N1x, N2x = _factor(NX)
    assert Hsr.shape == (nband, N1y, NXH, N2y)
    assert NXH == N1x * (N2x // 2 + 1), (NXH, N1x, N2x)
    assert NY == 2 * ny
    assert NXH % row_block == 0, (NXH, row_block)
    CK1 = consts_k1t_for(NX)
    CK3 = consts_k3t_for(NX)
    CYt = consts_lane_tw_for(NY)
    kw = dict(interpret=interpret)
    if not interpret:
        kw["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb * 1024 * 1024)

    in_strip = lambda L: pl.BlockSpec((1, nx, L),
                                      lambda b, j: (b, 0, j),
                                      memory_space=pltpu.VMEM)
    h_strip = lambda L: pl.BlockSpec((1, NXH, L),
                                     lambda b, j: (b, 0, j),
                                     memory_space=pltpu.VMEM)
    rows_half = lambda M: pl.BlockSpec((1, M, ny),
                                       lambda b, i: (b, i, 0),
                                       memory_space=pltpu.VMEM)
    hspec = lambda M: pl.BlockSpec((1, N1y, M, N2y),
                                   lambda b, i: (b, 0, i, 0),
                                   memory_space=pltpu.VMEM)

    zr, zi = pl.pallas_call(
        partial(_k1t_kernel, N=NX, L=lane_block, prec=prec),
        grid=(nband, ny // lane_block),
        in_specs=[in_strip(lane_block)] + _const_specs_k1t(NX),
        out_specs=(h_strip(lane_block), h_strip(lane_block)),
        out_shape=(jax.ShapeDtypeStruct((nband, NXH, ny), jnp.float32),
                   jax.ShapeDtypeStruct((nband, NXH, ny),
                                        jnp.float32)),
        **kw,
    )(x, *CK1)

    if Hsi is None:
        k2 = partial(_k2tr_kernel, N=NY, M=row_block, prec=prec)
        h_in = [hspec(row_block)]
        h_args = (Hsr,)
    else:
        k2 = partial(_k2t_kernel, N=NY, M=row_block, prec=prec)
        h_in = [hspec(row_block)] * 2
        h_args = (Hsr, Hsi)
    wr, wi = pl.pallas_call(
        k2,
        grid=(nband, NXH // row_block),
        in_specs=[rows_half(row_block)] * 2 + h_in
        + _const_specs_lane_tw(NY),
        out_specs=(rows_half(row_block), rows_half(row_block)),
        out_shape=(jax.ShapeDtypeStruct((nband, NXH, ny), jnp.float32),
                   jax.ShapeDtypeStruct((nband, NXH, ny),
                                        jnp.float32)),
        **kw,
    )(zr, zi, *h_args, *CYt)

    out = pl.pallas_call(
        partial(_k3t_kernel, N=NX, L=lane_block, prec=prec),
        grid=(nband, ny // lane_block),
        in_specs=[h_strip(lane_block)] * 2 + _const_specs_k3t(NX),
        out_specs=in_strip(lane_block),
        out_shape=jax.ShapeDtypeStruct((nband, nx, ny), jnp.float32),
        **kw,
    )(wr, wi, *CK3)
    return out


@partial(jax.jit, static_argnames=("nx", "ny", "lane_block",
                                   "row_block", "interpret",
                                   "vmem_mb", "precision"))
def psf_convolve_pallas_v3_cube_cg(p_prev, r, beta, Hsr, Hsi, nx, ny,
                                   lane_block=128, row_block=128,
                                   interpret=False, vmem_mb=100,
                                   precision="default"):
    """CG-fused v3 pipeline: one call runs the CG direction update
    p = beta*p_prev - r (K1 prologue), the PSF convolution, and the
    per-band CG reductions [p.conv(p), p.p] (K3 epilogue) — the
    standalone axpy and vdot passes of a CG iteration ride the strips
    the kernels already stream (round-3 VERDICT item 4: ~11 ms/iter of
    vector work on a 16.6 ms matvec). ``beta`` is (nband, 1, 1) f32
    — the beta block's last two dims must EQUAL the array's (Mosaic's
    divisible-by-(8,128)-or-equal rule rejects a (nband, 1) array
    with (1, 1) blocks on the chip).
    Returns ``(p, conv, pap)`` with ``pap`` (nband, 2) =
    [p . conv(p), p . p]; the caller folds wsum/sigmainv into
    alpha and the r update (one fused XLA pass). Reference CG loop:
    /root/reference/pfb/opt/pcg.py:53-136."""
    prec = {"highest": jax.lax.Precision.HIGHEST,
            "default": jax.lax.Precision.DEFAULT}[precision]
    nband = p_prev.shape[0]
    _, NXH, N2y = Hsr.shape[-3:]
    N1y = Hsr.shape[-3]
    NY = N1y * N2y
    NX = 2 * nx
    N1x, N2x = _factor(NX)
    assert Hsr.shape == (nband, N1y, NXH, N2y), (Hsr.shape, nband)
    assert p_prev.shape == r.shape == (nband, nx, ny), \
        (p_prev.shape, r.shape, nband, nx, ny)
    assert beta.shape == (nband, 1, 1), beta.shape
    assert NXH == N1x * (N2x // 2 + 1), (NXH, N1x, N2x)
    assert NY == 2 * ny
    assert NXH % row_block == 0, (NXH, row_block)
    CK1 = consts_k1t_for(NX)
    CK3 = consts_k3t_for(NX)
    CYt = consts_lane_tw_for(NY)
    kw = dict(interpret=interpret)
    if not interpret:
        kw["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb * 1024 * 1024)

    in_strip = lambda L: pl.BlockSpec((1, nx, L),
                                      lambda b, j: (b, 0, j),
                                      memory_space=pltpu.VMEM)
    h_strip = lambda L: pl.BlockSpec((1, NXH, L),
                                     lambda b, j: (b, 0, j),
                                     memory_space=pltpu.VMEM)
    rows_half = lambda M: pl.BlockSpec((1, M, ny),
                                       lambda b, i: (b, i, 0),
                                       memory_space=pltpu.VMEM)
    hspec = lambda M: pl.BlockSpec((1, N1y, M, N2y),
                                   lambda b, i: (b, 0, i, 0),
                                   memory_space=pltpu.VMEM)
    be_spec = pl.BlockSpec((1, 1, 1), lambda b, j: (b, 0, 0),
                           memory_space=pltpu.VMEM)

    pn, zr, zi = pl.pallas_call(
        partial(_k1t_cg_kernel, N=NX, L=lane_block, prec=prec),
        grid=(nband, ny // lane_block),
        in_specs=[in_strip(lane_block), in_strip(lane_block), be_spec]
        + _const_specs_k1t(NX),
        out_specs=(in_strip(lane_block), h_strip(lane_block),
                   h_strip(lane_block)),
        out_shape=(jax.ShapeDtypeStruct((nband, nx, ny), jnp.float32),
                   jax.ShapeDtypeStruct((nband, NXH, ny), jnp.float32),
                   jax.ShapeDtypeStruct((nband, NXH, ny),
                                        jnp.float32)),
        **kw,
    )(p_prev, r, beta, *CK1)

    if Hsi is None:
        k2 = partial(_k2tr_kernel, N=NY, M=row_block, prec=prec)
        h_in = [hspec(row_block)]
        h_args = (Hsr,)
    else:
        k2 = partial(_k2t_kernel, N=NY, M=row_block, prec=prec)
        h_in = [hspec(row_block)] * 2
        h_args = (Hsr, Hsi)
    wr, wi = pl.pallas_call(
        k2,
        grid=(nband, NXH // row_block),
        in_specs=[rows_half(row_block)] * 2 + h_in
        + _const_specs_lane_tw(NY),
        out_specs=(rows_half(row_block), rows_half(row_block)),
        out_shape=(jax.ShapeDtypeStruct((nband, NXH, ny), jnp.float32),
                   jax.ShapeDtypeStruct((nband, NXH, ny),
                                        jnp.float32)),
        **kw,
    )(zr, zi, *h_args, *CYt)

    pap_spec = pl.BlockSpec((1, 1, 2), lambda b, j: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    out, pap = pl.pallas_call(
        partial(_k3t_cg_kernel, N=NX, L=lane_block, prec=prec),
        grid=(nband, ny // lane_block),
        in_specs=[h_strip(lane_block)] * 2 + [in_strip(lane_block)]
        + _const_specs_k3t(NX),
        out_specs=(in_strip(lane_block), pap_spec),
        out_shape=(jax.ShapeDtypeStruct((nband, nx, ny), jnp.float32),
                   jax.ShapeDtypeStruct((nband, 1, 2), jnp.float32)),
        **kw,
    )(wr, wi, pn, *CK3)
    return pn, out, pap


def _stage_kw(interpret, vmem_mb):
    kw = dict(interpret=interpret)
    if not interpret:
        kw["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb * 1024 * 1024)
    return kw


def psf_v3_stage_k1(x, nx, lane_block=128, interpret=False,
                    vmem_mb=100, precision="default"):
    """K1 of the v3 pipeline on a (possibly column-sharded) cube:
    ``x`` (nband, nx, nyl) -> (zr, zi) each (nband, NXH, nyl). The
    X-direction transform is whole per lane strip, so a shard owning
    only nyl of the ny columns runs K1 unmodified — the distributed
    composition (parallel/dist.py:_space_pallas_conv_local) inserts
    all_to_all transposes between the stages."""
    prec = {"highest": jax.lax.Precision.HIGHEST,
            "default": jax.lax.Precision.DEFAULT}[precision]
    nband, nx_, nyl = x.shape
    assert nx_ == nx and nyl % lane_block == 0, (x.shape, lane_block)
    NX = 2 * nx
    N1x, N2x = _factor(NX)
    NXH = N1x * (N2x // 2 + 1)
    CK1 = consts_k1t_for(NX)
    in_strip = pl.BlockSpec((1, nx, lane_block),
                            lambda b, j: (b, 0, j),
                            memory_space=pltpu.VMEM)
    h_strip = pl.BlockSpec((1, NXH, lane_block),
                           lambda b, j: (b, 0, j),
                           memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_k1t_kernel, N=NX, L=lane_block, prec=prec),
        grid=(nband, nyl // lane_block),
        in_specs=[in_strip] + _const_specs_k1t(NX),
        out_specs=(h_strip, h_strip),
        out_shape=(jax.ShapeDtypeStruct((nband, NXH, nyl),
                                        jnp.float32),
                   jax.ShapeDtypeStruct((nband, NXH, nyl),
                                        jnp.float32)),
        **_stage_kw(interpret, vmem_mb),
    )(x, *CK1)


def psf_v3_stage_k2(zr, zi, Hsr, Hsi, row_block=128, interpret=False,
                    vmem_mb=100, precision="default"):
    """K2 of the v3 pipeline on a (possibly row-sharded) spectrum:
    ``zr``/``zi`` (nband, NXHl, ny) x-spectrum rows against the
    matching H rows (nband, N1y, NXHl, N2y) -> (wr, wi). Row blocks
    are independent, so a shard owning NXHl of the (padded) NXH rows
    runs K2 unmodified; zero-padded H rows yield zero output rows."""
    prec = {"highest": jax.lax.Precision.HIGHEST,
            "default": jax.lax.Precision.DEFAULT}[precision]
    nband, NXHl, ny = zr.shape
    N1y, N2y = Hsr.shape[1], Hsr.shape[3]
    NY = N1y * N2y
    assert NY == 2 * ny, (NY, ny)
    assert Hsr.shape == (nband, N1y, NXHl, N2y), (Hsr.shape, zr.shape)
    assert NXHl % row_block == 0, (NXHl, row_block)
    CYt = consts_lane_tw_for(NY)
    rows_half = pl.BlockSpec((1, row_block, ny),
                             lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM)
    hspec = pl.BlockSpec((1, N1y, row_block, N2y),
                         lambda b, i: (b, 0, i, 0),
                         memory_space=pltpu.VMEM)
    if Hsi is None:
        k2 = partial(_k2tr_kernel, N=NY, M=row_block, prec=prec)
        h_in = [hspec]
        h_args = (Hsr,)
    else:
        k2 = partial(_k2t_kernel, N=NY, M=row_block, prec=prec)
        h_in = [hspec] * 2
        h_args = (Hsr, Hsi)
    return pl.pallas_call(
        k2,
        grid=(nband, NXHl // row_block),
        in_specs=[rows_half] * 2 + h_in + _const_specs_lane_tw(NY),
        out_specs=(rows_half, rows_half),
        out_shape=(jax.ShapeDtypeStruct((nband, NXHl, ny),
                                        jnp.float32),
                   jax.ShapeDtypeStruct((nband, NXHl, ny),
                                        jnp.float32)),
        **_stage_kw(interpret, vmem_mb),
    )(zr, zi, *h_args, *CYt)


def psf_v3_stage_k3(wr, wi, nx, lane_block=128, interpret=False,
                    vmem_mb=100, precision="default"):
    """K3 of the v3 pipeline on a (possibly column-sharded) spectrum:
    ``wr``/``wi`` (nband, NXH, nyl) -> (nband, nx, nyl)."""
    prec = {"highest": jax.lax.Precision.HIGHEST,
            "default": jax.lax.Precision.DEFAULT}[precision]
    nband, NXH, nyl = wr.shape
    NX = 2 * nx
    N1x, N2x = _factor(NX)
    assert NXH == N1x * (N2x // 2 + 1), (NXH, N1x, N2x)
    assert nyl % lane_block == 0, (nyl, lane_block)
    CK3 = consts_k3t_for(NX)
    h_strip = pl.BlockSpec((1, NXH, lane_block),
                           lambda b, j: (b, 0, j),
                           memory_space=pltpu.VMEM)
    out_strip = pl.BlockSpec((1, nx, lane_block),
                             lambda b, j: (b, 0, j),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_k3t_kernel, N=NX, L=lane_block, prec=prec),
        grid=(nband, nyl // lane_block),
        in_specs=[h_strip] * 2 + _const_specs_k3t(NX),
        out_specs=out_strip,
        out_shape=jax.ShapeDtypeStruct((nband, nx, nyl),
                                       jnp.float32),
        **_stage_kw(interpret, vmem_mb),
    )(wr, wi, *CK3)


@partial(jax.jit, static_argnames=("nx", "ny", "lane_block",
                                   "row_block", "interpret",
                                   "vmem_mb", "precision"))
def psf_convolve_pallas_v2(x, Hsr, Hsi, nx, ny, lane_block=128,
                           row_block=128, interpret=False,
                           vmem_mb=100, precision="default"):
    """Transpose-free fused PSF convolution (psf_oversize=2 only).

    Hsr/Hsi: the SCRAMBLED transfer function from
    ``scramble_HT(make_full_psfhat(psf).T)`` — shape (N1y, NX, N2y).

    precision: 'highest' (float32-exact DFT matmuls, ~19 ms/band at
    4096^2 on v5e) or 'default' (single-pass MXU dots, ~7.4 ms/band,
    ~1e-5 relative operator error — fine for inner-loop Hessians whose
    residuals are recomputed exactly each major cycle).
    """
    prec = {"highest": jax.lax.Precision.HIGHEST,
            "default": jax.lax.Precision.DEFAULT}[precision]
    N1y, NX, N2y = Hsr.shape
    NY = N1y * N2y
    assert NX == 2 * nx and NY == 2 * ny
    CX = consts_for(NX)
    CYl = consts_lane_for(NY)
    cparams = pltpu.CompilerParams(
        vmem_limit_bytes=vmem_mb * 1024 * 1024)
    kw = dict(interpret=interpret)
    if not interpret:
        kw["compiler_params"] = cparams

    in_strip = lambda L: pl.BlockSpec((nx, L), lambda j: (0, j),
                                      memory_space=pltpu.VMEM)
    half_strip = lambda L: pl.BlockSpec((NX, L), lambda j: (0, j),
                                        memory_space=pltpu.VMEM)
    rows_half = lambda M: pl.BlockSpec((M, ny), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM)
    hspec = lambda M: pl.BlockSpec((N1y, M, N2y), lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM)

    zr, zi = pl.pallas_call(
        partial(_k1o_kernel, N=NX, L=lane_block, prec=prec),
        grid=(ny // lane_block,),
        in_specs=[in_strip(lane_block)] + _const_specs(NX),
        out_specs=(half_strip(lane_block), half_strip(lane_block)),
        out_shape=(jax.ShapeDtypeStruct((NX, ny), jnp.float32),
                   jax.ShapeDtypeStruct((NX, ny), jnp.float32)),
        **kw,
    )(x, *CX)

    wr, wi = pl.pallas_call(
        partial(_k2v_kernel, N=NY, M=row_block, prec=prec),
        grid=(NX // row_block,),
        in_specs=[rows_half(row_block)] * 2 + [hspec(row_block)] * 2
        + _const_specs_lane(NY),
        out_specs=(rows_half(row_block), rows_half(row_block)),
        out_shape=(jax.ShapeDtypeStruct((NX, ny), jnp.float32),
                   jax.ShapeDtypeStruct((NX, ny), jnp.float32)),
        **kw,
    )(zr, zi, Hsr, Hsi, *CYl)

    out = pl.pallas_call(
        partial(_k3o_kernel, N=NX, L=lane_block, prec=prec),
        grid=(ny // lane_block,),
        in_specs=[half_strip(lane_block)] * 2 + _const_specs(NX),
        out_specs=in_strip(lane_block),
        out_shape=jax.ShapeDtypeStruct((nx, ny), jnp.float32),
        **kw,
    )(wr, wi, *CX)
    return out


@partial(jax.jit, static_argnames=("nx", "ny", "lane_block",
                                   "row_block", "interpret",
                                   "vmem_mb"))
def psf_convolve_pallas_opt(x, Hr, Hi, nx, ny, lane_block=128,
                            row_block=128, interpret=False,
                            vmem_mb=100):
    """Zero/crop-aware fused PSF convolution for the psf_oversize=2
    case (NX = 2 nx, NY = 2 ny): the padded input's zero half and the
    cropped output's discarded half are never computed or moved —
    ~2.2 GB HBM traffic per band vs ~4.8 GB for
    :func:`psf_convolve_pallas`.

    Hr/Hi: TRANSPOSED (NY, NX) full transfer function.
    """
    NY, NX = Hr.shape
    assert NX == 2 * nx and NY == 2 * ny, \
        "psf_convolve_pallas_opt requires psf_oversize == 2"
    prec = _HI
    CX = consts_for(NX)
    CY = consts_for(NY)
    cparams = pltpu.CompilerParams(
        vmem_limit_bytes=vmem_mb * 1024 * 1024)
    kw = dict(interpret=interpret)
    if not interpret:
        kw["compiler_params"] = cparams

    in_strip = lambda L: pl.BlockSpec((nx, L), lambda j: (0, j),
                                      memory_space=pltpu.VMEM)
    half_strip = lambda L: pl.BlockSpec((NX, L), lambda j: (0, j),
                                        memory_space=pltpu.VMEM)
    rows_half = lambda M: pl.BlockSpec((M, ny), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM)
    colsT = lambda M: pl.BlockSpec((NY, M), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)

    # K1: (nx, ny) real input -> (NX, ny) spectrum-along-rows
    zr, zi = pl.pallas_call(
        partial(_k1o_kernel, N=NX, L=lane_block),
        grid=(ny // lane_block,),
        in_specs=[in_strip(lane_block)] + _const_specs(NX),
        out_specs=(half_strip(lane_block), half_strip(lane_block)),
        out_shape=(jax.ShapeDtypeStruct((NX, ny), jnp.float32),
                   jax.ShapeDtypeStruct((NX, ny), jnp.float32)),
        **kw,
    )(x, *CX)

    # K2: tiles (M, ny) -> full-lane spectrum, xH, cropped inverse
    wr, wi = pl.pallas_call(
        partial(_k2o_kernel, N=NY, M=row_block),
        grid=(NX // row_block,),
        in_specs=[rows_half(row_block)] * 2 + [colsT(row_block)] * 2
        + _const_specs(NY),
        out_specs=(rows_half(row_block), rows_half(row_block)),
        out_shape=(jax.ShapeDtypeStruct((NX, ny), jnp.float32),
                   jax.ShapeDtypeStruct((NX, ny), jnp.float32)),
        **kw,
    )(zr, zi, Hr, Hi, *CY)

    # K3: cropped inverse along rows -> (nx, ny) real output
    out = pl.pallas_call(
        partial(_k3o_kernel, N=NX, L=lane_block, prec=prec),
        grid=(ny // lane_block,),
        in_specs=[half_strip(lane_block)] * 2 + _const_specs(NX),
        out_specs=in_strip(lane_block),
        out_shape=jax.ShapeDtypeStruct((nx, ny), jnp.float32),
        **kw,
    )(wr, wi, *CX)
    return out


@partial(jax.jit, static_argnames=("nx", "ny", "lane_block",
                                   "row_block", "interpret",
                                   "vmem_mb"))
def psf_convolve_pallas(x, Hr, Hi, nx, ny, lane_block=128,
                        row_block=128, interpret=False, vmem_mb=100):
    """Fused PSF convolution of one band.

    x: (nx, ny) float32; Hr/Hi: the TRANSPOSED (NY, NX) float32 full
    transfer function (fft2 of ifftshift(psf), then .T — the K2 kernel
    consumes it in transposed orientation). Returns the (nx, ny)
    convolution.
    """
    NY, NX = Hr.shape
    xpad = jnp.pad(x, ((0, NX - nx), (0, NY - ny)))
    CX = consts_for(NX)
    CY = consts_for(NY)

    cparams = pltpu.CompilerParams(
        vmem_limit_bytes=vmem_mb * 1024 * 1024)
    strip = lambda L: pl.BlockSpec((NX, L), lambda j: (0, j),
                                   memory_space=pltpu.VMEM)
    rows = lambda M: pl.BlockSpec((M, NY), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)

    zr, zi = pl.pallas_call(
        partial(_k1_kernel, N=NX, L=lane_block),
        grid=(NY // lane_block,),
        in_specs=[strip(lane_block)] + _const_specs(NX),
        out_specs=(strip(lane_block), strip(lane_block)),
        out_shape=(jax.ShapeDtypeStruct((NX, NY), jnp.float32),
                   jax.ShapeDtypeStruct((NX, NY), jnp.float32)),
        interpret=interpret,
        compiler_params=None if interpret else cparams,
    )(xpad, *CX)

    colsT = lambda M: pl.BlockSpec((NY, M), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)
    wr, wi = pl.pallas_call(
        partial(_k2_kernel, N=NY, M=row_block),
        grid=(NX // row_block,),
        in_specs=[rows(row_block)] * 2 + [colsT(row_block)] * 2
        + _const_specs(NY),
        out_specs=(rows(row_block), rows(row_block)),
        out_shape=(jax.ShapeDtypeStruct((NX, NY), jnp.float32),
                   jax.ShapeDtypeStruct((NX, NY), jnp.float32)),
        interpret=interpret,
        compiler_params=None if interpret else cparams,
    )(zr, zi, Hr, Hi, *CY)

    out = pl.pallas_call(
        partial(_k3_kernel, N=NX, L=lane_block),
        grid=(NY // lane_block,),
        in_specs=[strip(lane_block)] * 2 + _const_specs(NX),
        out_specs=strip(lane_block),
        out_shape=jax.ShapeDtypeStruct((NX, NY), jnp.float32),
        interpret=interpret,
        compiler_params=None if interpret else cparams,
    )(wr, wi, *CX)
    return out[:nx, :ny]


def psf_convolve_pallas_cube(x, Hr, Hi, nx, ny, lane_block=128,
                             row_block=128, interpret=False):
    """Band loop over the fused single-band pipeline."""
    def one(args):
        xb, hr, hi = args
        return psf_convolve_pallas(xb, hr, hi, nx, ny,
                                   lane_block=lane_block,
                                   row_block=row_block,
                                   interpret=interpret)

    return lax.map(one, (x, Hr, Hi))
