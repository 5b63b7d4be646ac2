"""Measurement-operator products: dirty/PSF/PSFHAT/residual/weights in
one pass, and the vis-space Hessian.

TPU-native equivalent of pfb/operators/gridder.py:551-740
(image_data_products) and pfb/operators/hessian.py:11-126 (hessian_xds).
The (de)gridding backend is pluggable: 'dft' (exact, the oracle —
default) or 'wgrid' (ES-kernel w-stacking FFT gridder in
pfb_tpu/ops/wgridder.py).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from pfb_tpu.ops.dft import dirty2vis_dft, vis2dirty_dft
from pfb_tpu.ops.fft import make_psfhat
from pfb_tpu.ops.weighting import counts_to_weights


def get_backend(backend):
    if backend == "dft":
        return dirty2vis_dft, vis2dirty_dft
    if backend == "wgrid":
        from pfb_tpu.ops.wgridder import dirty2vis_wgrid, vis2dirty_wgrid
        return dirty2vis_wgrid, vis2dirty_wgrid
    if backend == "mm":
        from pfb_tpu.ops.mmgridder import dirty2vis_mm, vis2dirty_mm
        return dirty2vis_mm, vis2dirty_mm
    if backend == "pg":
        from pfb_tpu.ops.pgridder import dirty2vis_pg, vis2dirty_pg
        return dirty2vis_pg, vis2dirty_pg
    raise ValueError(f"Unknown gridder backend {backend}")


def row_bucket(nrow, minimum=64):
    """Round a row count up to the next power of two so datasets with
    different row counts share one compiled program (remote TPU
    compiles cost minutes; see .claude/skills/verify/SKILL.md)."""
    n = minimum
    while n < nrow:
        n *= 2
    return n


def pad_rows(nrow_to, uvw, *arrays):
    """Zero-pad the row axis of uvw and per-(row, chan) arrays to
    ``nrow_to``. Padded rows carry zero weight/mask so they contribute
    nothing to gridded products; degrid callers must crop the output
    back to the true row count."""
    npad = nrow_to - uvw.shape[0]
    if npad == 0:
        return (uvw,) + arrays
    out = [jnp.pad(uvw, ((0, npad), (0, 0)))]
    for a in arrays:
        if a is None:
            out.append(None)
        else:
            out.append(jnp.pad(a, ((0, npad), (0, 0))))
    return tuple(out)


def image_data_products(uvw, freq, vis, wgt, mask, counts,
                        nx, ny, nx_psf, ny_psf, cellx, celly,
                        model=None, robustness=None, x0=0.0, y0=0.0,
                        l2reweight_dof=None, do_psf=True, do_weight=True,
                        do_residual=True, backend="dft"):
    """Compute DIRTY, WSUM, PSF(+PSFHAT), RESIDUAL and effective WEIGHT
    for one (time, band) dataset in one go
    (reference: pfb/operators/gridder.py:551-740).

    All inputs are arrays for one dataset: uvw (nrow,3), freq (nchan,),
    vis/wgt/mask (nrow, nchan), counts (nx, ny) or None.
    Returns a dict keyed with the reference's dds field names.

    Rows are zero-padded to a power-of-two bucket so different datasets
    share one compiled program (padded rows have zero weight/mask).
    """
    d2v, v2d = get_backend(backend)
    out = {}

    nrow = uvw.shape[0]
    uvw, vis, wgt, mask = pad_rows(row_bucket(nrow), uvw, vis, wgt,
                                   mask)

    residual_vis = None
    if model is not None:
        model_vis = d2v(uvw, freq, jnp.asarray(model), cellx, celly,
                        x0=x0, y0=y0)
        residual_vis = (vis - model_vis) * mask

    if l2reweight_dof:
        if residual_vis is None:
            raise ValueError(
                "Requested l2 reweight but no model passed in.")
        ressq = (residual_vis * residual_vis.conj()).real
        wcount = mask.sum()
        ovar = ressq.sum() / wcount
        wgt = (l2reweight_dof + 1) / (l2reweight_dof + ressq / ovar) / ovar

    if robustness is not None:
        if counts is None:
            raise ValueError(
                "counts are None but robustness specified.")
        imwgt = counts_to_weights(counts, uvw, freq, nx, ny,
                                  cellx, celly, robustness)
        wgt = imwgt if wgt is None else wgt * imwgt

    if do_weight:
        out["WEIGHT"] = wgt[:nrow]

    mb = mask.astype(bool)
    wsum = jnp.where(mb, wgt, 0.0).sum()
    out["WSUM"] = jnp.atleast_1d(wsum)

    out["DIRTY"] = v2d(uvw, freq, vis, wgt=wgt, mask=mask, nx=nx, ny=ny,
                       cellx=cellx, celly=celly, x0=x0, y0=y0)

    if do_psf:
        # real-valued unit visibilities (imag = 0); avoids materialising
        # a complex constant, which some TPU runtimes cannot transfer
        psf_vis = jnp.ones(vis.shape, jnp.finfo(vis.dtype).dtype)
        if x0 or y0:
            # PSF visibilities at the shifted phase centre: transform of
            # a unit delta at (x0, y0) (reference gridder.py:659-687)
            delta = jnp.zeros((128, 128), out["DIRTY"].dtype)
            delta = delta.at[64, 64].set(1.0)
            psf_vis = d2v(uvw, freq, delta, cellx, celly, x0=x0, y0=y0)
        psf = v2d(uvw, freq, psf_vis, wgt=wgt, mask=mask, nx=nx_psf,
                  ny=ny_psf, cellx=cellx, celly=celly, x0=x0, y0=y0)
        out["PSF"] = psf
        out["PSFHAT"] = make_psfhat(psf)

    if model is not None and do_residual:
        out["RESIDUAL"] = v2d(uvw, freq, residual_vis, wgt=wgt, mask=mask,
                              nx=nx, ny=ny, cellx=cellx, celly=celly,
                              x0=x0, y0=y0)

    return out


def hessian_slice(x, uvw, freq, wgt, mask, cellx, celly, x0=0.0, y0=0.0,
                  beam=None, backend="dft"):
    """One-dataset vis-space Hessian: beam * R.H W R (beam * x)
    (reference: pfb/operators/hessian.py:62-106, divide_by_n=False)."""
    d2v, v2d = get_backend(backend)
    uvw, wgt, mask = pad_rows(row_bucket(uvw.shape[0]), uvw, wgt, mask)
    xin = x * beam if beam is not None else x
    mvis = d2v(uvw, freq, xin, cellx, celly, x0=x0, y0=y0)
    conv = v2d(uvw, freq, mvis * mask, wgt=wgt, mask=mask,
               nx=x.shape[0], ny=x.shape[1], cellx=cellx, celly=celly,
               x0=x0, y0=y0)
    if beam is not None:
        conv = conv * beam
    return conv


def hessian_dds(x, dds, wsum, sigmainv=0.0, mask_image=None,
                use_beam=True, backend="dft"):
    """Vis-space Hessian reduced over datasets: the exact residual
    operator of the major cycle (reference: hessian.py:11-59).

    ``x`` is the (nband, nx, ny) model cube; ``dds`` a list of dataset
    dicts each holding UVW/FREQ/WEIGHT/MASK (+ attrs bandid, cell_rad,
    x0, y0, optionally BEAM).
    """
    nband = x.shape[0]
    conv = [jnp.zeros_like(x[0]) for _ in range(nband)]
    for ds in dds:
        b = ds["bandid"]
        beam = None
        if use_beam and "BEAM" in ds:
            beam = jnp.asarray(ds["BEAM"])
            if mask_image is not None:
                beam = beam * mask_image
        elif mask_image is not None:
            beam = mask_image
        conv[b] = conv[b] + hessian_slice(
            x[b], jnp.asarray(ds["UVW"]), jnp.asarray(ds["FREQ"]),
            jnp.asarray(ds["WEIGHT"]), jnp.asarray(ds["MASK"]),
            ds["cell_rad"], ds["cell_rad"], x0=ds.get("x0", 0.0),
            y0=ds.get("y0", 0.0), beam=beam, backend=backend)
    out = jnp.stack(conv) / wsum
    if sigmainv:
        out = out + x * sigmainv**2
    return out
