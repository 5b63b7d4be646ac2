"""Image-space PSF Hessian approximation.

The reference computes ``F.H PSFHAT F`` with padded real FFTs in
preallocated buffers (pfb/operators/psf.py, pfb/operators/hessian.py:129-158).
Here the whole Hessian matvec is one fused jitted function; XLA fuses the
pad/multiply/crop elementwise work into the FFTs so no manual buffer
management is needed.
"""

from functools import partial

import jax
import jax.numpy as jnp

from pfb_tpu.ops.fft import psf_convolve_cube, psf_convolve_slice


def hessian_psf_slice(x, psfhat, beam=None, lastsize=None, sigmainv=0.0,
                      wsum=None):
    """Tikhonov-regularised PSF Hessian for one band
    (reference: pfb/operators/hessian.py:129-158).

    Computes ``beam * (PSF conv (beam * x)) / wsum + sigmainv * x``.
    """
    if lastsize is None:
        lastsize = psfhat.shape[-2]
    xin = x * beam if beam is not None else x
    xout = psf_convolve_slice(xin, psfhat, lastsize)
    if beam is not None:
        xout = xout * beam
    if wsum is not None:
        xout = xout / wsum
    return xout + x * sigmainv


def hessian_psf_cube(x, psfhat, beam=None, lastsize=None, sigmainv=0.0,
                     wsum=None, band_chunk=None):
    """Cube (nband, nx, ny) variant
    (reference: pfb/operators/hessian.py:254-281)."""
    if lastsize is None:
        lastsize = psfhat.shape[-2]
    xin = x * beam if beam is not None else x
    xout = psf_convolve_cube(xin, psfhat, lastsize, band_chunk=band_chunk)
    if beam is not None:
        xout = xout * beam
    if wsum is not None:
        xout = xout / wsum
    return xout + x * sigmainv


@partial(jax.jit, static_argnames=("lastsize", "band_chunk"))
def _hess_cube_jit(x, psfhat, beam, lastsize, sigmainv, wsum, band_chunk):
    return hessian_psf_cube(x, psfhat, beam=beam, lastsize=lastsize,
                            sigmainv=sigmainv, wsum=wsum,
                            band_chunk=band_chunk)


def prep_pallas_hessian(psf, nx, ny, real_transfer="auto"):
    """Transfer-function operands for the v3 fused Pallas pipeline
    (:func:`pfb_tpu.ops.pallas_fft.psf_convolve_pallas_v3_cube`).

    Returns ``(phrT, phiT, row_block)`` with ``phrT`` the
    (nband, N1y, NXH, N2y) scrambled half-height real part, ``phiT``
    the matching imaginary part or None when the transfer function is
    real (even PSF), and ``row_block`` the K2 row tile. Raises
    ValueError when the shapes don't support v3 (psf_oversize must be
    2 and nx/ny must satisfy :func:`v3_supported`).

    real_transfer: an even PSF (psf[k] == psf[-k mod N], which is what
    any self-adjoint ``R.H W R`` convolution kernel must be) has a REAL
    transfer function; the v3 K2 kernel then skips the imaginary-H
    traffic and multiplies. "auto" measures ``max|Im H| / max|Re H|``
    and drops Im H below 1e-5; True forces the even-symmetrised
    operator (the self-adjoint part — what PCG assumes anyway); False
    keeps the full complex transfer function."""
    from pfb_tpu.ops.mmfft import make_full_psfhat
    from pfb_tpu.ops.pallas_fft import _factor, prep_H_v3, v3_supported

    nx_psf, ny_psf = psf.shape[-2:]
    if not (nx_psf == 2 * nx and ny_psf == 2 * ny
            and v3_supported(nx, ny)):
        raise ValueError(
            f"v3 pipeline unsupported for psf {psf.shape} on "
            f"({nx}, {ny}) images")
    phr, phi = make_full_psfhat(jnp.asarray(psf, jnp.float32),
                                band_chunk=1)
    phrT = prep_H_v3(jnp.swapaxes(phr, -1, -2))
    phiT = prep_H_v3(jnp.swapaxes(phi, -1, -2))
    del phr, phi
    if real_transfer == "auto":
        rel = float(jnp.max(jnp.abs(phiT)) / jnp.max(jnp.abs(phrT)))
        use_real = rel < 1e-5
    else:
        use_real = bool(real_transfer)
    if use_real:
        phiT = None
    N1x, N2x = _factor(2 * nx)
    nxh = N1x * (N2x // 2 + 1)
    row_block = 128 if nxh % 128 == 0 else \
        max(b for b in range(8, 129, 8) if nxh % b == 0)
    return phrT, phiT, row_block


def v3_space_supported(nx, ny, nspace):
    """Shape constraints of the space-sharded v3 pipeline: v3 itself,
    plus ny splittable into nspace lane-aligned column shards and nx
    splittable into nspace row shards."""
    from pfb_tpu.ops.pallas_fft import v3_supported
    return (v3_supported(nx, ny) and ny % (nspace * 128) == 0
            and nx % nspace == 0)


def prep_pallas_hessian_space(psf, nx, ny, nspace,
                              real_transfer="auto"):
    """Transfer-function operands for the SPACE-SHARDED v3 pipeline
    (parallel/dist.py:_space_pallas_conv_local): the v3 operands with
    the NXH row axis zero-padded to a multiple of nspace*128 so the
    all_to_all between K1 and K2 splits evenly into K2-row-block-
    aligned shards. Shard the returned arrays
    P('band', None, 'space', None). Returns (Hsr, Hsi-or-None, NXH)
    with NXH the unpadded row count K3 consumes."""
    phrT, phiT, _ = prep_pallas_hessian(psf, nx, ny,
                                        real_transfer=real_transfer)
    NXH = phrT.shape[2]
    step = nspace * 128
    NXH_pad = -(-NXH // step) * step
    pad = [(0, 0), (0, 0), (0, NXH_pad - NXH), (0, 0)]
    phrT = jnp.pad(phrT, pad)
    if phiT is not None:
        phiT = jnp.pad(phiT, pad)
    return phrT, phiT, NXH


def make_psf_convolve_pallas(psf, nx, ny, beam=None, sigmainv=0.0,
                             wsum=None, real_transfer="auto"):
    """PSF-Hessian matvec on the fused Pallas FFT pipeline
    (ops/pallas_fft.py) — ~1.7x the throughput of the XLA-FFT path on
    TPU v5e at 4096^2. ``psf`` is the (nband, nx_psf, ny_psf) PSF cube;
    sizes must be 128-aligned. See :func:`prep_pallas_hessian` for the
    ``real_transfer`` semantics."""
    import jax.numpy as jnp

    from jax import lax

    from pfb_tpu.ops.pallas_fft import (psf_convolve_pallas,
                                        psf_convolve_pallas_v3_cube,
                                        v3_supported)

    nx_psf, ny_psf = psf.shape[-2:]
    sigmainv = jnp.asarray(sigmainv, jnp.float32)
    # the Hermitian-aware transpose-free whole-cube pipeline (v3) for
    # psf_oversize == 2: the band axis rides the pallas grid, so one
    # matvec is three dispatches regardless of nband
    use_v3 = (nx_psf == 2 * nx and ny_psf == 2 * ny
              and v3_supported(nx, ny))
    nband = psf.shape[0]
    if use_v3:
        phrT, phiT, row_block = prep_pallas_hessian(
            psf, nx, ny, real_transfer=real_transfer)
        use_real = phiT is None
        interpret = jax.default_backend() != "tpu"

        # whole matvec as ONE jitted program (H passed as arguments —
        # closures would bake the GB-scale transfer function into the
        # compile payload, see make_psf_convolve's docstring)
        @partial(jax.jit, static_argnames=("nx", "ny", "row_block",
                                           "has_beam", "has_sig"))
        def _mv(x, hr, hi, beam_a, sig, ws, *, nx, ny, row_block,
                has_beam, has_sig):
            xin = x * beam_a if has_beam else x
            out = psf_convolve_pallas_v3_cube(xin, hr, hi, nx, ny,
                                              row_block=row_block,
                                              interpret=interpret)
            if has_beam:
                out = out * beam_a
            if ws is not None:
                out = out / ws
            if has_sig:  # skip a full extra HBM pass when sigmainv=0
                out = out + x * sig
            return out

        beam_a = beam if beam is not None else jnp.zeros(
            (), jnp.float32)
        has_sig = bool(float(sigmainv) != 0.0)

        def matvec(x):
            return _mv(x, phrT, phiT, beam_a, sigmainv, wsum, nx=nx,
                       ny=ny, row_block=row_block,
                       has_beam=beam is not None, has_sig=has_sig)

        # fused-solver hooks: `apply(x, consts)` is the same matvec
        # with the GB-scale operands as explicit (pytree) arguments, so
        # a whole solver can be jitted with `consts` passed per call.
        # Baking H as HLO constants blows the compile payload, and an
        # EAGER while_loop that closes over H (consts become loop
        # operands) deoptimises the Pallas pipeline ~40x on TPU — jit
        # arguments are the only layout that is both compilable and
        # fast (measured: 36.5 ms/PCG-iter at 4096^2 x 8 vs 1130 for
        # the eager path).
        def apply(x, consts):
            hr, hi, beam_c = consts["hr"], consts["hi"], consts["beam"]
            xin = x * beam_c if beam_c is not None else x
            out = psf_convolve_pallas_v3_cube(xin, hr, hi, nx, ny,
                                              row_block=row_block,
                                              interpret=interpret)
            if beam_c is not None:
                out = out * beam_c
            if wsum is not None:
                out = out / wsum
            if has_sig:
                out = out + x * sigmainv
            return out

        matvec.apply = apply
        matvec.consts = {"hr": phrT, "hi": phiT, "beam": beam}
        matvec.real_transfer = use_real

        if beam is None:
            from pfb_tpu.ops.pallas_fft import \
                psf_convolve_pallas_v3_cube_cg

            def apply_cg(p_prev, r, beta, consts):
                """CG-fused matvec (see make_pcg_bands_fused): one
                pipeline call computes p = beta*p_prev - r, conv(p)
                and the [p.conv(p), p.p] reductions; wsum/sigmainv
                are folded in by the solver's update pass."""
                return psf_convolve_pallas_v3_cube_cg(
                    p_prev, r, beta, consts["hr"], consts["hi"], nx,
                    ny, row_block=row_block, interpret=interpret)

            matvec.apply_cg = apply_cg
            matvec.cg_scale = (wsum, sigmainv if has_sig else None)
        return matvec
    else:
        from pfb_tpu.ops.mmfft import make_full_psfhat
        phr, phi = make_full_psfhat(jnp.asarray(psf, jnp.float32),
                                    band_chunk=1)
        phrT = jnp.swapaxes(phr, -1, -2)
        phiT = jnp.swapaxes(phi, -1, -2)
        del phr, phi
        interpret = jax.default_backend() != "tpu"

        def convolve(xin):
            # unrolled band loop: wrapping the pallas pipeline in
            # lax.map makes XLA build an oversized output fusion that
            # blows scoped VMEM
            return jnp.stack([
                psf_convolve_pallas(xin[b], phrT[b], phiT[b], nx, ny,
                                    interpret=interpret)
                for b in range(nband)])

    def matvec(x):
        xin = x * beam if beam is not None else x
        out = convolve(xin)
        if beam is not None:
            out = out * beam
        if wsum is not None:
            out = out / wsum
        return out + x * sigmainv

    return matvec


def make_psf_convolve(psfhat, lastsize, beam=None, sigmainv=0.0, wsum=None,
                      band_chunk=None):
    """Return a jitted cube Hessian matvec closure, the unit used by the
    deconvolvers (reference: pfb/workers/spotless.py:182-183).

    The closed-over arrays are passed into jit as *arguments* rather than
    captured as trace-time constants: baking a device array into the
    program forces a device->host copy at lowering (which the axon TPU
    backend cannot even do for complex dtypes) and bloats the executable.
    """
    real_dtype = jnp.finfo(psfhat.dtype).dtype  # dtype only — no .real
    sigmainv = jnp.asarray(sigmainv, real_dtype)
    wsum = None if wsum is None else jnp.asarray(wsum)

    def matvec(x):
        return _hess_cube_jit(x, psfhat, beam, lastsize, sigmainv, wsum,
                              band_chunk)

    return matvec
