"""Batched c2c four-step FFT Pallas kernels for the wgridder's
w-plane transforms (reference semantics: ducc0 wgridder's per-plane
grid<->image FFTs, pfb/operators/hessian.py:73-101 call path).

The mm/XLA c2c stacks run at ~13 % of the HBM roofline at the 2048^2+
sizes the gridder needs (BASELINE.md round-3/4 labs); the v3 PSF
pipeline showed the fix: twiddle-absorbed BATCHED stage matrices in a
Pallas kernel, no elementwise twiddle passes, lane-blocked streaming.
This module is the c2c sibling of ops/pallas_fft.py's K1t/K3t with one
extra trick — the wgridder's pad/roll/crop passes are absorbed into
the stage CONSTANTS:

- ``out_rolled``: grid_to_image needs only the centre (nx = Nx/2)
  image rows of the full inverse transform, rolled by nx/2. Output
  rows k = k1 + N1*k2 prune to k2 in [3 N2/4, N2) + [0, N2/4); taking
  the stage-2 rows in that order emits the CROPPED IMAGE-ORDERED rows
  directly — no roll pass, no crop pass, half the stage-2 work.
- ``in_rolled``: image_to_grid embeds nx image rows at (i - nx/2) mod
  Nx. Those are whole n1-blocks [3 N1/4, N1) + [0, N1/4) of the input
  grouping n = n1*N2 + n2; slicing the stage-1 batch columns to that
  order consumes the raw (nx, L) image strip — no pad, no roll, half
  the stage-1 work.

Transforms run along the SUBLANE axis (axis -2) of (P, N, L-lanes)
stacks; the y-axis pass runs on an XLA-transposed view (see
fft2_c2c_pruned). f32 only — the f64 CPU-parity path keeps jnp.fft.
"""

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pfb_tpu.ops.pallas_fft import (_cmm, _dotg_b1, _dotg_left0,
                                    _factor)

__all__ = ["fftx_c2c", "fft2_c2c_pruned", "cfft_supported"]


def cfft_supported(N):
    """Both the input and output roll-crops need quarter-aligned
    factor blocks."""
    N1, N2 = _factor(N)
    return N % 128 == 0 and N1 % 4 == 0 and N2 % 4 == 0


@lru_cache(maxsize=None)
def _cfft_consts_np(N, sign, in_rolled, out_rolled):
    N1, N2 = _factor(N)
    n1 = np.arange(N1)
    n2 = np.arange(N2)
    W1 = np.exp(sign * 2j * np.pi * np.outer(n1, n1) / N1)
    tw = np.exp(sign * 2j * np.pi * np.outer(n1, n2) / N)
    W2 = np.exp(sign * 2j * np.pi * np.outer(n2, n2) / N2)
    # W1tw[n2, k1, n1] = W1[k1, n1] tw[k1, n2]
    W1tw = W1[None, :, :] * tw.T[:, :, None]
    if in_rolled:
        n1_sel = np.concatenate([np.arange(3 * N1 // 4, N1),
                                 np.arange(0, N1 // 4)])
        W1tw = W1tw[:, :, n1_sel]
    if out_rolled:
        k2_sel = np.concatenate([np.arange(3 * N2 // 4, N2),
                                 np.arange(0, N2 // 4)])
        W2 = W2[k2_sel]
    f32 = np.float32
    return (W1tw.real.astype(f32), W1tw.imag.astype(f32),
            W2.real.astype(f32), W2.imag.astype(f32))


def _cfft_consts(N, sign, in_rolled, out_rolled):
    return tuple(jnp.asarray(a) for a in
                 _cfft_consts_np(N, sign, in_rolled, out_rolled))


def _split_bf16(a):
    """Two-bf16-component split: a ~= hi + lo with hi = bf16(a) and
    lo = bf16(a - hi) — 16 mantissa bits total."""
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot_split3(dot):
    """Split-f32 matmul: both operands split into two bf16 components,
    A@B ~= A1B1 + A1B2 + A2B1 (the A2B2 term is ~2^-16 relative and
    dropped) — THREE single-pass MXU matmuls where HIGHEST runs six
    (the 'bf16_3x' scheme; Mosaic rejects Precision.HIGH, round-4
    VERDICT item 4). Error ~1e-5 relative per stage; the epsilon-aware
    dispatch in the gridder only selects this path when the requested
    gridding accuracy tolerates it."""
    def dot3(A, B, _prec=None):
        A1, A2 = _split_bf16(A)
        B1, B2 = _split_bf16(B)
        d = jax.lax.Precision.DEFAULT
        return dot(A1, B1, d) + dot(A1, B2, d) + dot(A2, B1, d)

    return dot3


def _kx_kernel(xr_ref, xi_ref, w1r_, w1i_, w2r_, w2i_, or_ref, oi_ref,
               *, prec=None):
    """One (plane, lane-block) step: batched stage-1 over the n2-minor
    blocks, one 2D stage-2 matmul emitting the (selected) output rows
    k2-major = natural/image order. ``prec="split"`` selects the
    split-f32 three-pass dots (see :func:`_dot_split3`)."""
    w1r, w1i = w1r_[...], w1i_[...]
    w2r, w2i = w2r_[...], w2i_[...]
    N2, N1, n1_in = w1r.shape
    L = xr_ref.shape[-1]
    xr = xr_ref[...].reshape(n1_in, N2, L).transpose(1, 0, 2)
    xi = xi_ref[...].reshape(n1_in, N2, L).transpose(1, 0, 2)
    if prec == "split":
        dot_b1, dot_l0, prec = (_dot_split3(_dotg_b1),
                                _dot_split3(_dotg_left0), None)
    else:
        dot_b1, dot_l0 = _dotg_b1, _dotg_left0
    cr, ci = _cmm(dot_b1, w1r, w1i, xr, xi, prec)   # (N2, N1, L)
    # stage 2 contracts the LEADING n2 dim directly ((K2, N2) x
    # (N2, N1, L) -> (K2, N1, L)): the former (N2, N1*L) view merged a
    # sublane dim into the lanes — a Mosaic relayout on every step
    yr, yi = _cmm(dot_l0, w2r, w2i, cr, ci, prec)
    or_ref[...] = yr.reshape(or_ref.shape)
    oi_ref[...] = yi.reshape(oi_ref.shape)


@partial(jax.jit, static_argnames=("N", "inverse", "in_rolled",
                                   "out_rolled", "lane_block",
                                   "interpret", "precision"))
def fftx_c2c(xr, xi, *, N, inverse=False, in_rolled=False,
             out_rolled=False, lane_block=128, interpret=False,
             precision=None):
    """Unnormalised c2c DFT along axis -2 of a (P, Nin, Ny) stack
    (Nin = N, or N/2 image rows when ``in_rolled``); output (P, Nout,
    Ny) with Nout = N or N/2 (``out_rolled``). Sign convention matches
    ops/wgridder._fft2_stack: forward e^-, inverse e^+ (no 1/N)."""
    assert cfft_supported(N), N
    P, Nin, Ny = xr.shape
    assert Nin == (N // 2 if in_rolled else N), (Nin, N)
    assert Ny % lane_block == 0, (Ny, lane_block)
    sign = 1 if inverse else -1
    C = _cfft_consts(N, sign, in_rolled, out_rolled)
    N1, N2 = _factor(N)
    Nout = N // 2 if out_rolled else N
    n1_in = C[0].shape[-1]
    k2 = C[2].shape[0]

    L = lane_block
    full = lambda shape: pl.BlockSpec(shape, lambda *_: tuple(
        0 for _ in shape), memory_space=pltpu.VMEM)
    strip_in = pl.BlockSpec((1, Nin, L), lambda p, j: (p, 0, j),
                            memory_space=pltpu.VMEM)
    strip_out = pl.BlockSpec((1, Nout, L), lambda p, j: (p, 0, j),
                             memory_space=pltpu.VMEM)
    kw = dict(interpret=interpret)
    if not interpret:
        kw["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    return pl.pallas_call(
        partial(_kx_kernel, prec=precision),
        grid=(P, Ny // L),
        in_specs=[strip_in, strip_in,
                  full((N2, N1, n1_in)), full((N2, N1, n1_in)),
                  full((k2, N2)), full((k2, N2))],
        out_specs=(strip_out, strip_out),
        out_shape=(jax.ShapeDtypeStruct((P, Nout, Ny), jnp.float32),
                   jax.ShapeDtypeStruct((P, Nout, Ny), jnp.float32)),
        **kw)(xr, xi, *C)


def fft2_c2c_pruned(xr, xi, *, Nx, Ny, inverse, pruned_in=False,
                    pruned_out=False, lane_block=128, interpret=False,
                    precision=None):
    """2D c2c transform of a (P, ., .) plane stack with the wgridder's
    roll-crops absorbed (sigma=2 layout: image = centre half in both
    axes, rolled). pruned_out (grid_to_image): (P, Nx, Ny) grids ->
    (P, nx, ny) image-ordered planes. pruned_in (image_to_grid):
    (P, nx, ny) image planes -> (P, Nx, Ny) grids. The y-axis pass
    runs the same sublane kernel on an XLA-transposed view (one
    HBM-roofline pass each way — cheap next to the former per-plane
    pad/roll/crop chains)."""
    if pruned_out:
        assert not pruned_in
        yr, yi = fftx_c2c(xr, xi, N=Nx, inverse=inverse,
                          out_rolled=True, lane_block=lane_block,
                          interpret=interpret, precision=precision)
        yr = jnp.swapaxes(yr, -1, -2)
        yi = jnp.swapaxes(yi, -1, -2)
        yr, yi = fftx_c2c(yr, yi, N=Ny, inverse=inverse,
                          out_rolled=True, lane_block=lane_block,
                          interpret=interpret, precision=precision)
        return jnp.swapaxes(yr, -1, -2), jnp.swapaxes(yi, -1, -2)
    if pruned_in:
        yr, yi = fftx_c2c(xr, xi, N=Nx, inverse=inverse,
                          in_rolled=True, lane_block=lane_block,
                          interpret=interpret, precision=precision)
        yr = jnp.swapaxes(yr, -1, -2)
        yi = jnp.swapaxes(yi, -1, -2)
        yr, yi = fftx_c2c(yr, yi, N=Ny, inverse=inverse,
                          in_rolled=True, lane_block=lane_block,
                          interpret=interpret, precision=precision)
        return jnp.swapaxes(yr, -1, -2), jnp.swapaxes(yi, -1, -2)
    yr, yi = fftx_c2c(xr, xi, N=Nx, inverse=inverse,
                      lane_block=lane_block, interpret=interpret,
                      precision=precision)
    yr = jnp.swapaxes(yr, -1, -2)
    yi = jnp.swapaxes(yi, -1, -2)
    yr, yi = fftx_c2c(yr, yi, N=Ny, inverse=inverse,
                      lane_block=lane_block, interpret=interpret,
                      precision=precision)
    return jnp.swapaxes(yr, -1, -2), jnp.swapaxes(yi, -1, -2)
