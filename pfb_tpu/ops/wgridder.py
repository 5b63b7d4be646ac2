"""ES-kernel w-stacking (de)gridder — the FFT-based measurement
operator for large visibility counts.

A from-scratch TPU-native implementation of the semantics the reference
gets from ducc0.wgridder (pfb/operators/gridder.py:10): type-1/type-2
NUFFT on an oversampled uv grid using the "exponential of semicircle"
kernel

    C(x) = exp(beta * k * (sqrt(1 - x^2) - 1)),  |x| <= 1

with w-stacking for the non-coplanar term: visibilities are spread along
a third (w) axis with the same kernel, each w-plane is transformed and
phased by exp(+/- 2 pi i w (n-1)), and the final image is corrected by
the kernel's Fourier transform ("grid correction") in l, m and n-1.

Conventions identical to pfb_tpu.ops.dft (the exact oracle):
    degrid: vis = sum_lm I(l,m) exp(-2 pi i (u l + v m + w (n-1)) f/c)
    grid:   I   = sum_rc  wgt mask Re[vis exp(+2 pi i (...))]
with pixel centres l_i = (i - nx//2) cell.

The scatter/gather is XLA scatter-add over (row*chan, k, k) stencils,
chunked over rows to bound memory. A Pallas kernel can replace the
scatter without changing this interface.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from pfb_tpu.ops.dft import LIGHTSPEED, nterm


# per-support ES shape parameter and the max relative error it
# achieves vs the exact-DFT oracle at oversampling sigma=2 with
# w-gridding on (scripts/calibrate_beta.py). Odd supports land the
# nearest grid point at |offset| <= 0.5 and gain ~1.5 decades over the
# adjacent even support, so the ladder uses odd k beyond 4.
_BETA_TABLE = (
    (4, 2.40, 1.5e-02),
    (5, 2.25, 1.6e-04),
    (7, 2.30, 2.5e-06),
    (9, 2.25, 4.0e-08),
    (11, 2.27, 5.0e-10),
    (13, 2.30, 6.0e-12),
)


def kernel_params(epsilon):
    """(support k, beta) for a target accuracy at oversampling 2.0:
    the smallest calibrated support whose measured oracle error clears
    the requested epsilon with a 2x margin (the calibration is one
    random uv case; the margin absorbs case-to-case variation)."""
    for k, beta, err in _BETA_TABLE:
        if err <= 0.5 * epsilon:
            return k, beta
    return _BETA_TABLE[-1][0], _BETA_TABLE[-1][1]


def es_kernel(x, beta, k):
    arg = jnp.maximum(1.0 - x * x, 0.0)
    return jnp.where(jnp.abs(x) <= 1.0,
                     jnp.exp(beta * k * (jnp.sqrt(arg) - 1.0)), 0.0)


def _es_kernel_ft(theta, beta, k, nquad=64):
    """Continuous Fourier transform of the ES kernel (support [-k/2,
    k/2] grid cells): c_hat(theta) = int C(2x/k) e^{2 pi i x theta} dx,
    computed by Gauss-Legendre quadrature (real, even)."""
    # integrate over x in [0, k/2], doubled (even kernel)
    xq, wq = np.polynomial.legendre.leggauss(nquad)
    xq = 0.5 * (xq + 1.0) * (k / 2.0)  # [0, k/2]
    wq = wq * (k / 4.0)
    xq = jnp.asarray(xq)
    wq = jnp.asarray(wq)
    cx = es_kernel(xq / (k / 2.0), beta, k)
    # theta (...,) -> (..., nquad)
    ph = 2.0 * jnp.pi * theta[..., None] * xq
    return 2.0 * jnp.sum(wq * cx * jnp.cos(ph), axis=-1)


def _grid_setup(nx, ny, cellx, celly, sigma):
    N_x = int(sigma * nx)
    N_y = int(sigma * ny)
    # make even for clean rolls
    N_x += N_x % 2
    N_y += N_y % 2
    return N_x, N_y


@partial(jax.jit, static_argnames=("nx", "ny", "k", "Nx", "Ny",
                                   "row_chunk", "nw", "do_wgridding"))
def _spread(uvw, freq, vis_w, nx, ny, cellx, celly, k, beta, Nx, Ny,
            row_chunk, do_wgridding, nw, w0, dw):
    """Scatter visibilities onto the (nw, Nx, Ny) oversampled grid
    stack. vis_w = wgt * mask * vis (complex)."""
    nrow, nchan = vis_w.shape
    scale = freq / LIGHTSPEED

    nchunk = -(-nrow // row_chunk)
    npad = nchunk * row_chunk - nrow
    uvw_p = jnp.pad(uvw, ((0, npad), (0, 0)))
    vr = jnp.pad(vis_w.real, ((0, npad), (0, 0)))
    vi = jnp.pad(vis_w.imag, ((0, npad), (0, 0)))

    ko2 = k / 2.0
    korig = (k - 1) // 2
    offs = jnp.arange(-korig, k - korig)  # k offsets around rounded pos

    def chunk_fn(carry, args):
        gr, gi = carry
        uvw_c, vr_c, vi_c = args
        # continuous grid positions (cycles per pixel * N)
        ul = uvw_c[:, 0:1] * scale[None, :] * cellx * Nx  # (R, nchan)
        vl = uvw_c[:, 1:2] * scale[None, :] * celly * Ny
        wl = uvw_c[:, 2:3] * scale[None, :]

        u0 = jnp.round(ul).astype(jnp.int32)
        v0 = jnp.round(vl).astype(jnp.int32)
        xi = u0[..., None] + offs  # (R, nchan, k)
        yi = v0[..., None] + offs
        cu = es_kernel((xi - ul[..., None]) / ko2, beta, k)
        cv = es_kernel((yi - vl[..., None]) / ko2, beta, k)

        xim = jnp.mod(xi, Nx)
        yim = jnp.mod(yi, Ny)

        if do_wgridding:
            wpos = (wl - w0) / dw  # (R, nchan)
            p0 = jnp.round(wpos).astype(jnp.int32)
            woffs = offs
            pi = p0[..., None] + woffs  # (R, nchan, k)
            cw = es_kernel((pi - wpos[..., None]) / ko2, beta, k)
            pic = jnp.clip(pi, 0, nw - 1)
            # combined stencil (R, nchan, k, k, k) would be huge;
            # loop the w support in Python (k is small & static)
            for t in range(k):
                cwt = cw[..., t]
                pit = pic[..., t]
                val = (cwt[..., None, None] * cu[..., :, None] *
                       cv[..., None, :])
                vr_s = val * vr_c[..., None, None]
                vi_s = val * vi_c[..., None, None]
                pidx = jnp.broadcast_to(pit[..., None, None],
                                        vr_s.shape).reshape(-1)
                xidx = jnp.broadcast_to(xim[..., :, None],
                                        vr_s.shape).reshape(-1)
                yidx = jnp.broadcast_to(yim[..., None, :],
                                        vr_s.shape).reshape(-1)
                gr = gr.at[pidx, xidx, yidx].add(vr_s.reshape(-1),
                                                 mode="drop")
                gi = gi.at[pidx, xidx, yidx].add(vi_s.reshape(-1),
                                                 mode="drop")
        else:
            val = cu[..., :, None] * cv[..., None, :]
            vr_s = val * vr_c[..., None, None]
            vi_s = val * vi_c[..., None, None]
            xidx = jnp.broadcast_to(xim[..., :, None],
                                    vr_s.shape).reshape(-1)
            yidx = jnp.broadcast_to(yim[..., None, :],
                                    vr_s.shape).reshape(-1)
            zidx = jnp.zeros_like(xidx)
            gr = gr.at[zidx, xidx, yidx].add(vr_s.reshape(-1),
                                             mode="drop")
            gi = gi.at[zidx, xidx, yidx].add(vi_s.reshape(-1),
                                             mode="drop")
        return (gr, gi), None

    rdtype = vis_w.real.dtype
    grid0 = (jnp.zeros((nw, Nx, Ny), rdtype),
             jnp.zeros((nw, Nx, Ny), rdtype))
    (gr, gi), _ = lax.scan(
        chunk_fn, grid0,
        (uvw_p.reshape(nchunk, row_chunk, 3),
         vr.reshape(nchunk, row_chunk, nchan),
         vi.reshape(nchunk, row_chunk, nchan)))
    return gr, gi


def _w_params(uvw, freq, nm1_min, sigma, k):
    """w-stacking plane setup (host side, needs concrete values)."""
    wvals = np.abs(np.asarray(uvw[:, 2]))[:, None] * \
        (np.asarray(freq)[None, :] / LIGHTSPEED)
    wmax = wvals.max()
    wmin = -wmax  # symmetric since |exp phase| depends on sign
    # actual signed range:
    wsigned = np.asarray(uvw[:, 2])[:, None] * \
        (np.asarray(freq)[None, :] / LIGHTSPEED)
    wmin = wsigned.min()
    wmax = wsigned.max()
    dnmax = abs(nm1_min)  # max |n-1| on the image
    if dnmax == 0 or wmax == wmin:
        return 1, float(wmin), 1.0
    dw = 1.0 / (2.0 * sigma * dnmax)
    nw = int(np.ceil((wmax - wmin) / dw)) + k + 1
    w0 = wmin - (k / 2.0) * dw
    return nw, float(w0), float(dw)


def _centre_shift(uvw, freq, x0, y0, sign):
    """Phase factor e^{sign*2 pi i (u x0 + v y0)} per (row, chan) —
    moves the image centre without touching the uv kernel positions."""
    scale = freq / LIGHTSPEED
    ph = (uvw[:, 0:1] * x0 + uvw[:, 1:2] * y0) * scale[None, :]
    ph = sign * 2.0 * jnp.pi * (ph - jnp.round(ph))
    return jax.lax.complex(jnp.cos(ph), jnp.sin(ph))


def vis2dirty_wgrid(uvw, freq, vis, wgt=None, mask=None, *, nx, ny,
                    cellx, celly, x0=0.0, y0=0.0, epsilon=1e-7,
                    do_wgridding=True, sigma=2.0, row_chunk=2048,
                    divide_by_n=False, double_accum=False,
                    fft_engine="auto"):
    """R.H: visibilities -> dirty image via w-stacked ES gridding.
    ``vis`` may be a (real, imag) pair (assembled eagerly — this is
    the CPU-parity engine; on-accelerator paths use the pg/dft
    backends which stay split throughout)."""
    import jax

    if isinstance(vis, (tuple, list)):
        vis = jnp.asarray(vis[0]) + 1j * jnp.asarray(vis[1])

    k, beta = kernel_params(epsilon)
    Nx, Ny = _grid_setup(nx, ny, cellx, celly, sigma)
    rdtype = jnp.finfo(vis.dtype).dtype

    w = jnp.ones(vis.shape, rdtype) if wgt is None else wgt
    if mask is not None:
        w = w * mask
    vis_w = vis * w
    # gridding.yml double-accum: spread/accumulate in f64 for f32
    # inputs (CPU/x64 only — TPU has no f64)
    if (double_accum and jax.config.jax_enable_x64
            and rdtype == jnp.float32):
        vis_w = vis_w.astype(jnp.complex128)
        rdtype_out = jnp.float32
    else:
        rdtype_out = None
    if x0 or y0:
        vis_w = vis_w * _centre_shift(uvw, freq, x0, y0, +1.0)

    # n-1 over the image (host-side scalars for plane setup)
    l = (np.arange(nx) - nx // 2) * cellx + x0
    m = (np.arange(ny) - ny // 2) * celly + y0
    eps_max = max(abs(l.min()), l.max()) ** 2 + \
        max(abs(m.min()), m.max()) ** 2
    nm1_min = -eps_max / (np.sqrt(max(1.0 - eps_max, 0.0)) + 1.0)

    if do_wgridding:
        nw, w0, dw = _w_params(np.asarray(uvw), np.asarray(freq),
                               nm1_min, sigma, k)
    else:
        nw, w0, dw = 1, 0.0, 1.0

    gr, gi = _spread(uvw, freq, vis_w, nx, ny, cellx, celly, k,
                     beta, Nx, Ny, row_chunk, do_wgridding and nw > 1,
                     nw, w0, dw)
    if rdtype_out is not None:  # double-accum: back to f32 post-spread
        gr = gr.astype(rdtype_out)
        gi = gi.astype(rdtype_out)
    return _grid_to_image(gr, gi, nx, ny, cellx, celly, k, beta, Nx, Ny,
                          do_wgridding and nw > 1, nw, w0, dw,
                          divide_by_n, x0, y0, fft_engine=fft_engine)


def _ifft2_stack(gr, gi):
    """Unnormalised inverse 2D FFT of a (..., N, N) real/imag pair.

    f32 runs on the MXU via the four-step matmul FFT (XLA's TPU FFT is
    far off the roofline at these sizes — see ops/mmfft.py); f64 (the
    CPU-parity path) keeps the exact jnp.fft."""
    if gr.dtype == jnp.float32:
        from pfb_tpu.ops.mmfft import fft2_mm
        # unnormalised inverse = conj(forward(conj(.)))
        yr, yi = fft2_mm(gr, -gi, inverse=False)
        return yr, -yi
    full = jnp.fft.ifft2(lax.complex(gr, gi)) * \
        (gr.shape[-2] * gr.shape[-1])
    return full.real, full.imag


def _fft2_stack(xr, xi):
    """Forward 2D FFT of a (..., N, N) real/imag pair (f32 on the MXU,
    f64 exact)."""
    if xr.dtype == jnp.float32:
        from pfb_tpu.ops.mmfft import fft2_mm
        return fft2_mm(xr, xi, inverse=False)
    full = jnp.fft.fft2(lax.complex(xr, xi))
    return full.real, full.imag


def _resolve_cfft(fft_engine, rdtype, nx, ny, Nx, Ny):
    """Pick the w-plane FFT engine: the pruned c2c Pallas pipeline
    (ops/pallas_cfft.py — pad/roll/crop absorbed into the stage
    constants) on f32 sigma=2 layouts, else the mm/jnp stack. Returns
    None (legacy path) or the pallas interpret flag."""
    import jax

    from pfb_tpu.ops.pallas_cfft import cfft_supported
    ok = (rdtype == jnp.float32 and Nx == 2 * nx and Ny == 2 * ny
          and nx % 128 == 0 and ny % 128 == 0 and cfft_supported(Nx)
          and cfft_supported(Ny))
    if fft_engine == "mm" or not ok:
        return None
    on_tpu = jax.default_backend() == "tpu"
    if fft_engine == "cfft":
        return not on_tpu
    return False if on_tpu else None  # auto


@partial(jax.jit, static_argnames=("nx", "ny", "k", "Nx", "Ny",
                                   "do_w", "x0", "y0", "rdtype"))
def gi_consts(nx, ny, cellx, celly, k, beta, Nx, Ny, do_w, dw,
              x0=0.0, y0=0.0, rdtype=jnp.float32):
    """Plan-invariant grid-correction / w-screen constants shared by
    :func:`_grid_to_image` and :func:`_image_to_grid`. These depend on
    the plan geometry only (NOT on the per-block w0), and the cw
    kernel-FT quadrature alone costs ~20 ms per call at 4096^2
    (64-point Gauss-Legendre over the full image) — precompute once
    per plan and hoist out of w-block scans (round-4 g2i lab:
    grid_to_image 60.1 ms of which only ~27 ms was the FFT)."""
    li = (jnp.arange(nx) - nx // 2)
    mi = (jnp.arange(ny) - ny // 2)
    cx = _es_kernel_ft(li / Nx, beta, k).astype(rdtype)
    cy = _es_kernel_ft(mi / Ny, beta, k).astype(rdtype)
    ll = li * cellx + x0
    mm = mi * celly + y0
    llg, mmg = jnp.meshgrid(ll, mm, indexing="ij")
    nm1 = nterm(llg, mmg).astype(rdtype)
    out = dict(cx=cx, cy=cy, nm1=nm1)
    if do_w:
        # f32: 24-point quadrature (|theta| <= ~0.3 by the w-plane
        # sampling -> error ~1e-10, far below the f32 eps floor; the
        # 64-point default costs ~20 ms at 4096^2)
        nq = 24 if rdtype == jnp.float32 else 64
        out["cw"] = _es_kernel_ft(nm1 * dw, beta, k,
                                  nquad=nq).astype(rdtype)
        if rdtype == jnp.float32:
            tpi = jnp.asarray(2.0 * jnp.pi, rdtype)
            out["cd"] = jnp.cos(tpi * dw * nm1)
            out["sd"] = jnp.sin(tpi * dw * nm1)
    return out


@partial(jax.jit, static_argnames=("nx", "ny", "k", "Nx", "Ny", "nw",
                                   "do_w", "divide_by_n", "x0", "y0",
                                   "wchunk", "fft_engine",
                                   "cfft_precision"))
def _grid_to_image(gr, gi, nx, ny, cellx, celly, k, beta, Nx, Ny, do_w,
                   nw, w0, dw, divide_by_n, x0=0.0, y0=0.0, wchunk=4,
                   fft_engine="auto", consts=None,
                   cfft_precision=None):
    rdtype = gr.dtype
    cfft_interp = _resolve_cfft(fft_engine, rdtype, nx, ny, Nx, Ny)

    if consts is None:
        consts = gi_consts(nx, ny, cellx, celly, k, beta, Nx, Ny,
                           do_w, dw, x0, y0, rdtype=rdtype)
    cx, cy, nm1 = consts["cx"], consts["cy"], consts["nm1"]

    def plane_images(grp, gip):
        # inverse DFT of a plane batch: sum_p G(p) e^{+2 pi i p s / N}
        ir, ii = _ifft2_stack(grp, gip)
        ir = jnp.roll(ir, (nx // 2, ny // 2), axis=(-2, -1))[..., :nx,
                                                            :ny]
        ii = jnp.roll(ii, (nx // 2, ny // 2), axis=(-2, -1))[..., :nx,
                                                            :ny]
        return ir, ii

    if do_w:
        # batches of wchunk planes: batched MXU FFTs, then only the
        # REAL part of sum_p img_p e^{+2 pi i w_p (n-1)} is accumulated
        # (the imaginary part of the final image is discarded anyway)
        wc = min(wchunk, nw)
        nc = -(-nw // wc)
        npad = nc * wc - nw
        grp = jnp.pad(gr, ((0, npad), (0, 0), (0, 0)))
        gip = jnp.pad(gi, ((0, npad), (0, 0), (0, 0)))
        wp = w0 + dw * jnp.arange(nc * wc, dtype=rdtype)
        img0 = jnp.zeros((nx, ny), rdtype)

        if rdtype == jnp.float32 and cfft_interp is not None:
            # pruned c2c Pallas pipeline: ALL planes in one batched
            # dispatch, crop/roll absorbed into the stage constants
            # (ops/pallas_cfft.py), then the phasor-rotation screen
            # recurrence over the (nw, nx, ny) stack
            from pfb_tpu.ops.pallas_cfft import fft2_c2c_pruned
            ir, ii = fft2_c2c_pruned(gr, gi, Nx=Nx, Ny=Ny,
                                     inverse=True, pruned_out=True,
                                     interpret=cfft_interp,
                                     precision=cfft_precision)
            tpi = jnp.asarray(2.0 * jnp.pi, rdtype)
            c0 = jnp.cos(tpi * w0 * nm1)
            s0 = jnp.sin(tpi * w0 * nm1)
            cd, sd = consts["cd"], consts["sd"]

            if nw <= 8:
                # unrolled: XLA fuses the whole accumulation into ~one
                # pass over the plane stack (a lax.scan carry of the
                # full image forced a round trip per plane: 7.6 ms at
                # 8192^2 B=4, round-4 g2i lab)
                img, c, sn = img0, c0, s0
                for p_ in range(nw):
                    img = img + ir[p_] * c - ii[p_] * sn
                    c, sn = c * cd - sn * sd, sn * cd + c * sd
            else:
                def accum_c(carry, args):
                    img_a, c, sn = carry
                    irp, iip = args
                    img_a = img_a + irp * c - iip * sn
                    return (img_a, c * cd - sn * sd,
                            sn * cd + c * sd), None

                (img, _, _), _ = lax.scan(accum_c, (img0, c0, s0),
                                          (ir, ii))
        elif rdtype == jnp.float32:
            # f32 chip path: the per-plane w-screen cos/sin over the
            # image (nw transcendental passes) is replaced by a phasor
            # ROTATION recurrence — two cos/sin images total (w0 and
            # dw), then 4 mul + 2 add per plane on the VPU. Rotation
            # drift is ~nw*2^-24 ~ 2e-6 relative at nw~30, below the
            # f32 gridder accuracy floor (eps>=1e-5 on chip); the
            # f64/CPU parity path below keeps exact per-plane phases.
            tpi = jnp.asarray(2.0 * jnp.pi, rdtype)
            c0 = jnp.cos(tpi * w0 * nm1)
            s0 = jnp.sin(tpi * w0 * nm1)
            cd, sd = consts["cd"], consts["sd"]

            def accum(carry, args):
                img_a, c, s = carry
                grb, gib = args
                ir, ii = plane_images(grb, gib)
                tot = jnp.zeros_like(img_a)
                for j in range(wc):
                    tot = tot + ir[j] * c - ii[j] * s
                    c, s = c * cd - s * sd, s * cd + c * sd
                return (img_a + tot, c, s), None

            (img, _, _), _ = lax.scan(
                accum, (img0, c0, s0),
                (grp.reshape(nc, wc, Nx, Ny),
                 gip.reshape(nc, wc, Nx, Ny)))
        else:
            def accum(carry, args):
                grb, gib, wpb = args
                ir, ii = plane_images(grb, gib)
                ph = (2.0 * jnp.pi) * wpb[:, None, None] * nm1[None]
                contrib = ir * jnp.cos(ph) - ii * jnp.sin(ph)
                return carry + jnp.sum(contrib, axis=0), None

            img, _ = lax.scan(
                accum, img0,
                (grp.reshape(nc, wc, Nx, Ny),
                 gip.reshape(nc, wc, Nx, Ny), wp.reshape(nc, wc)))
        img = img / consts["cw"]
    elif cfft_interp is not None:
        from pfb_tpu.ops.pallas_cfft import fft2_c2c_pruned
        ir, _ = fft2_c2c_pruned(gr[:1], gi[:1], Nx=Nx, Ny=Ny,
                                inverse=True, pruned_out=True,
                                interpret=cfft_interp,
                                     precision=cfft_precision)
        img = ir[0]
    else:
        img, _ = plane_images(gr[0], gi[0])

    out = img / (cx[:, None] * cy[None, :])
    if divide_by_n:
        out = out / (nm1 + 1.0)
    return out


def dirty2vis_wgrid(uvw, freq, image, cellx, celly, x0=0.0, y0=0.0, *,
                    epsilon=1e-7, do_wgridding=True, sigma=2.0,
                    row_chunk=2048, divide_by_n=False,
                    fft_engine="auto", **kw):
    """R: image -> visibilities (adjoint chain of vis2dirty_wgrid with
    the conjugate kernel: e^{-2 pi i(...)})."""
    nx, ny = image.shape
    k, beta = kernel_params(epsilon)
    Nx, Ny = _grid_setup(nx, ny, cellx, celly, sigma)

    l = (np.arange(nx) - nx // 2) * cellx + x0
    m = (np.arange(ny) - ny // 2) * celly + y0
    eps_max = max(abs(l.min()), l.max()) ** 2 + \
        max(abs(m.min()), m.max()) ** 2
    nm1_min = -eps_max / (np.sqrt(max(1.0 - eps_max, 0.0)) + 1.0)
    if do_wgridding:
        nw, w0, dw = _w_params(np.asarray(uvw), np.asarray(freq),
                               nm1_min, sigma, k)
    else:
        nw, w0, dw = 1, 0.0, 1.0

    grids = _image_to_grid(image, nx, ny, cellx, celly, k, beta, Nx, Ny,
                           do_wgridding and nw > 1, nw, w0, dw,
                           divide_by_n, x0, y0, fft_engine=fft_engine)
    vis = _interp(grids, uvw, freq, cellx, celly, k, beta, Nx, Ny,
                  row_chunk, do_wgridding and nw > 1, nw, w0, dw)
    if x0 or y0:
        vis = vis * _centre_shift(uvw, freq, x0, y0, -1.0)
    if kw.get("split"):
        return vis.real, vis.imag
    return vis


@partial(jax.jit, static_argnames=("nx", "ny", "k", "Nx", "Ny", "nw",
                                   "do_w", "divide_by_n", "x0", "y0",
                                   "split", "wchunk", "fft_engine",
                                   "cfft_precision"))
def _image_to_grid(image, nx, ny, cellx, celly, k, beta, Nx, Ny, do_w,
                   nw, w0, dw, divide_by_n, x0=0.0, y0=0.0,
                   split=False, wchunk=4, fft_engine="auto",
                   consts=None, cfft_precision=None):
    """split=True returns (real, imag) grids as two real arrays (the
    native representation — complex is only assembled on request for
    the wgrid backend's _interp)."""
    rdtype = image.dtype
    cfft_interp = _resolve_cfft(fft_engine, rdtype, nx, ny, Nx, Ny)

    if consts is None:
        consts = gi_consts(nx, ny, cellx, celly, k, beta, Nx, Ny,
                           do_w, dw, x0, y0, rdtype=rdtype)
    cx, cy, nm1 = consts["cx"], consts["cy"], consts["nm1"]

    img = image / (cx[:, None] * cy[None, :])
    if divide_by_n:
        img = img / (nm1 + 1.0)

    def plane_grids(pr, pi):
        # embed at s = i - nx//2 (inverse of the roll+crop) and forward
        # DFT: G(p) = sum_s f(s) e^{-2 pi i p s / N}; batched over the
        # leading plane axis
        shape = pr.shape[:-2] + (Nx, Ny)
        fr = jnp.zeros(shape, rdtype).at[..., :nx, :ny].set(pr)
        fi = jnp.zeros(shape, rdtype).at[..., :nx, :ny].set(pi)
        fr = jnp.roll(fr, (-(nx // 2), -(ny // 2)), axis=(-2, -1))
        fi = jnp.roll(fi, (-(nx // 2), -(ny // 2)), axis=(-2, -1))
        return _fft2_stack(fr, fi)

    if do_w:
        img = img / consts["cw"]
        wc = min(wchunk, nw)
        nc = -(-nw // wc)
        wp = w0 + dw * jnp.arange(nc * wc, dtype=rdtype)

        # batches of wchunk planes: phase the image onto each plane and
        # run one batched MXU FFT per chunk
        if rdtype == jnp.float32 and cfft_interp is not None:
            # build all nw phasored planes by rotation recurrence,
            # then ONE input-pruned batched c2c Pallas FFT (the
            # embed+roll is absorbed into the stage constants)
            from pfb_tpu.ops.pallas_cfft import fft2_c2c_pruned
            tpi = jnp.asarray(2.0 * jnp.pi, rdtype)
            c0 = jnp.cos(tpi * w0 * nm1)
            s0 = jnp.sin(tpi * w0 * nm1)
            cd, sd = consts["cd"], consts["sd"]

            def one_c(carry, _):
                c, s = carry
                return (c * cd - s * sd, s * cd + c * sd), \
                    (img * c, img * (-s))

            _, (prs, pis) = lax.scan(one_c, (c0, s0), None, length=nw)
            gr, gi = fft2_c2c_pruned(prs, pis, Nx=Nx, Ny=Ny,
                                     inverse=False, pruned_in=True,
                                     interpret=cfft_interp,
                                     precision=cfft_precision)
        elif rdtype == jnp.float32:
            # phasor-rotation recurrence (see _grid_to_image): phase
            # here is e^{-2 pi i w_p (n-1)} = (c_p, -s_p)
            tpi = jnp.asarray(2.0 * jnp.pi, rdtype)
            c0 = jnp.cos(tpi * w0 * nm1)
            s0 = jnp.sin(tpi * w0 * nm1)
            cd, sd = consts["cd"], consts["sd"]

            def one(carry, _):
                c, s = carry
                prs, pis = [], []
                for _j in range(wc):
                    prs.append(img * c)
                    pis.append(img * (-s))
                    c, s = c * cd - s * sd, s * cd + c * sd
                gr, gi = plane_grids(jnp.stack(prs), jnp.stack(pis))
                return (c, s), (gr, gi)

            _, (gr, gi) = lax.scan(one, (c0, s0), None, length=nc)
        else:
            def one(carry, wpb):
                ph = (-2.0 * jnp.pi) * wpb[:, None, None] * nm1[None]
                gr, gi = plane_grids(img[None] * jnp.cos(ph),
                                     img[None] * jnp.sin(ph))
                return carry, (gr, gi)

            _, (gr, gi) = lax.scan(one, 0, wp.reshape(nc, wc))
        if gr.ndim == 4:  # chunked scans emit (nc, wc, Nx, Ny)
            gr = gr.reshape(nc * wc, Nx, Ny)[:nw]
            gi = gi.reshape(nc * wc, Nx, Ny)[:nw]
    elif cfft_interp is not None:
        from pfb_tpu.ops.pallas_cfft import fft2_c2c_pruned
        gr, gi = fft2_c2c_pruned(img[None], jnp.zeros_like(img)[None],
                                 Nx=Nx, Ny=Ny, inverse=False,
                                 pruned_in=True,
                                 interpret=cfft_interp,
                                     precision=cfft_precision)
    else:
        gr, gi = plane_grids(img[None], jnp.zeros_like(img)[None])

    if split:
        return gr, gi
    return lax.complex(gr, gi)


@partial(jax.jit, static_argnames=("k", "Nx", "Ny", "row_chunk", "nw",
                                   "do_w"))
def _interp(grids, uvw, freq, cellx, celly, k, beta, Nx, Ny, row_chunk,
            do_w, nw, w0, dw):
    nrow = uvw.shape[0]
    nchan = freq.shape[0]
    scale = freq / LIGHTSPEED
    ko2 = k / 2.0
    korig = (k - 1) // 2
    offs = jnp.arange(-korig, k - korig)

    nchunk = -(-nrow // row_chunk)
    npad = nchunk * row_chunk - nrow
    uvw_p = jnp.pad(uvw, ((0, npad), (0, 0)))

    def chunk_fn(uvw_c):
        ul = uvw_c[:, 0:1] * scale[None, :] * cellx * Nx
        vl = uvw_c[:, 1:2] * scale[None, :] * celly * Ny
        wl = uvw_c[:, 2:3] * scale[None, :]
        u0 = jnp.round(ul).astype(jnp.int32)
        v0 = jnp.round(vl).astype(jnp.int32)
        xi = u0[..., None] + offs
        yi = v0[..., None] + offs
        cu = es_kernel((xi - ul[..., None]) / ko2, beta, k)
        cv = es_kernel((yi - vl[..., None]) / ko2, beta, k)
        xim = jnp.mod(xi, Nx)
        yim = jnp.mod(yi, Ny)

        if do_w:
            wpos = (wl - w0) / dw
            p0 = jnp.round(wpos).astype(jnp.int32)
            pi = p0[..., None] + offs
            cw = es_kernel((pi - wpos[..., None]) / ko2, beta, k)
            pic = jnp.clip(pi, 0, nw - 1)
            acc = None
            for t in range(k):
                patch = grids[pic[..., t][..., None, None],
                              xim[..., :, None], yim[..., None, :]]
                contrib = jnp.sum(
                    patch * (cu[..., :, None] * cv[..., None, :]),
                    axis=(-2, -1)) * cw[..., t]
                acc = contrib if acc is None else acc + contrib
            return acc
        patch = grids[0][xim[..., :, None], yim[..., None, :]]
        return jnp.sum(patch * (cu[..., :, None] * cv[..., None, :]),
                       axis=(-2, -1))

    vis = lax.map(chunk_fn, uvw_p.reshape(nchunk, row_chunk, 3))
    return vis.reshape(nchunk * row_chunk, nchan)[:nrow]
