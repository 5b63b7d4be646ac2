"""Exact-DFT measurement operator R (image -> vis) and adjoint R.H
(vis -> image), with the w-term evaluated exactly.

This is the correctness oracle for the ES-kernel wgridder (and the
production path for small problems): the reference delegates both
directions to ducc0.wgridder vis2dirty/dirty2vis
(pfb/operators/gridder.py:10,153-167,258-294); here they are chunked
cos/sin matmuls that ride the MXU.

Conventions (matching ducc0/the reference's usage):
- pixel centres: l_i = (i - nx//2)*cellx + x0, m_j likewise
  (reference: pfb/workers/grid.py:397-398, utils/misc.py:1254-1255)
- degrid:  vis(u,v,w) = sum_lm I(l,m) exp(-2 pi i (u l + v m + w(n-1)) f/c)
- grid:    I(l,m) = sum_{r,c} wgt mask Re[ vis exp(+2 pi i (...)) ]
- divide_by_n=False everywhere by default (hardcoded in the reference,
  gridder.py:601,653): images are I/n, consumers correct for n
  (tests/test_klean.py:252-256).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

LIGHTSPEED = 299792458.0  # m/s


def _lm_grid(nx, ny, cellx, celly, x0, y0, dtype):
    l = (jnp.arange(nx, dtype=dtype) - nx // 2) * cellx + x0
    m = (jnp.arange(ny, dtype=dtype) - ny // 2) * celly + y0
    ll, mm = jnp.meshgrid(l, m, indexing="ij")
    return ll, mm


def nterm(ll, mm):
    """n - 1 = -eps/(sqrt(1-eps)+1), the numerically stable form the
    reference uses (tests/test_klean.py:256)."""
    eps = ll**2 + mm**2
    return -eps / (jnp.sqrt(1.0 - eps) + 1.0)


def _row_chunks(nrow, chunk):
    return -(-nrow // chunk)


@partial(jax.jit, static_argnames=("nx", "ny", "do_wterm", "row_chunk",
                                   "divide_by_n"))
def dirty2vis_dft(uvw, freq, image, cellx, celly, x0=0.0, y0=0.0, *,
                  nx=None, ny=None, do_wterm=True, divide_by_n=False,
                  row_chunk=128):
    """R: (nx, ny) image -> (nrow, nchan) complex visibilities."""
    nx, ny = image.shape
    dtype = image.dtype
    ll, mm = _lm_grid(nx, ny, cellx, celly, x0, y0, dtype)
    nm1 = nterm(ll, mm)
    img = image
    if divide_by_n:
        img = img / (nm1 + 1.0)
    img_flat = img.reshape(-1)
    lmn = jnp.stack([ll.reshape(-1), mm.reshape(-1), nm1.reshape(-1)])

    nrow = uvw.shape[0]
    nchan = freq.shape[0]
    nchunk = _row_chunks(nrow, row_chunk)
    npad = nchunk * row_chunk - nrow
    uvw_p = jnp.pad(uvw, ((0, npad), (0, 0)))
    scale = freq / LIGHTSPEED  # (nchan,)

    if not do_wterm:
        lmn = lmn.at[2].set(0.0)

    def chunk_fn(uvw_c):
        # (R, 3) x (nchan,) -> (R, nchan, 3)
        uvw_l = uvw_c[:, None, :] * scale[None, :, None]
        phase = jnp.einsum("rcx,xp->rcp", uvw_l, lmn,
                           preferred_element_type=dtype)
        phase = (-2.0 * jnp.pi) * phase
        vr = jnp.cos(phase) @ img_flat
        vi = jnp.sin(phase) @ img_flat
        return vr + 1j * vi

    vis = lax.map(chunk_fn, uvw_p.reshape(nchunk, row_chunk, 3))
    return vis.reshape(nchunk * row_chunk, nchan)[:nrow]


@partial(jax.jit, static_argnames=("nx", "ny", "do_wterm", "row_chunk",
                                   "divide_by_n"))
def vis2dirty_dft(uvw, freq, vis, wgt=None, mask=None, *, nx, ny,
                  cellx, celly, x0=0.0, y0=0.0, do_wterm=True,
                  divide_by_n=False, row_chunk=128):
    """R.H: (nrow, nchan) visibilities -> (nx, ny) dirty image."""
    rdtype = jnp.finfo(vis.dtype).dtype
    ll, mm = _lm_grid(nx, ny, cellx, celly, x0, y0, rdtype)
    nm1 = nterm(ll, mm)
    lmn = jnp.stack([ll.reshape(-1), mm.reshape(-1), nm1.reshape(-1)])
    if not do_wterm:
        lmn = lmn.at[2].set(0.0)

    nrow = uvw.shape[0]
    nchan = freq.shape[0]
    w = jnp.ones((nrow, nchan), rdtype) if wgt is None else wgt
    if mask is not None:
        w = w * mask
    nchunk = _row_chunks(nrow, row_chunk)
    npad = nchunk * row_chunk - nrow
    uvw_p = jnp.pad(uvw, ((0, npad), (0, 0)))
    wv = jnp.pad(w * vis.real, ((0, npad), (0, 0)))
    wi = jnp.pad(w * vis.imag, ((0, npad), (0, 0)))
    scale = freq / LIGHTSPEED

    def chunk_fn(carry, args):
        uvw_c, wvr, wvi = args
        uvw_l = uvw_c[:, None, :] * scale[None, :, None]
        phase = jnp.einsum("rcx,xp->rcp", uvw_l, lmn,
                           preferred_element_type=rdtype)
        phase = (2.0 * jnp.pi) * phase
        # Re[vis * e^{i phase}] = vr cos - vi sin
        acc = jnp.einsum("rc,rcp->p", wvr, jnp.cos(phase),
                         preferred_element_type=rdtype)
        acc -= jnp.einsum("rc,rcp->p", wvi, jnp.sin(phase),
                          preferred_element_type=rdtype)
        return carry + acc, None

    dirty0 = jnp.zeros((nx * ny,), rdtype)
    dirty, _ = lax.scan(chunk_fn, dirty0,
                        (uvw_p.reshape(nchunk, row_chunk, 3),
                         wv.reshape(nchunk, row_chunk, nchan),
                         wi.reshape(nchunk, row_chunk, nchan)))
    dirty = dirty.reshape(nx, ny)
    if divide_by_n:
        dirty = dirty / (nm1 + 1.0)
    return dirty
