"""Matmul-formulation ES gridder — scatter-free (de)gridding for the
MXU.

Each visibility's k x k spreading stencil is RANK-1: patch = cu (x)
cv with cu/cv the 1-D ES kernel evaluated at the grid offsets. So a
whole tile's accumulation is a single dense matmul:

    A[x, y] = sum_c w_c cu_c[x] cv_c[y]  =  (CU * w).T @ CV

with CU[c, x] = es(x - u_c) evaluated DENSELY over the tile's x range
(the kernel's compact support makes all but k entries zero). No
scatter, no sort-within-tile — visibilities are binned to tiles on the
host, padded to a fixed per-tile capacity, and the whole grid pass is a
batch of (C x Tx+k) x (C x Ty+k) matmuls followed by an overlap-add of
the halo'd tiles.

Degridding is the transpose: V_c = sum_xy CU[c, x] A[x, y] CV[c, y]
= rowwise-dot(CU @ A_tile, CV).

This replaces the XLA scatter path of ops/wgridder.py for the uv plane
(measured ~0.03 Mvis/s on v5e); the matmul formulation has no
sequential hazards and rides the MXU. w-stacking composes on top: the
caller loops the k w-support taps, weighting each pass by the w-axis
kernel (visibilities binned by base w-plane).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from pfb_tpu.ops.dft import LIGHTSPEED, nterm
from pfb_tpu.ops.wgridder import (_es_kernel_ft, _grid_setup, _w_params,
                                  es_kernel, kernel_params)


def _choose_tile(N, want):
    """Largest divisor of N that is <= want (tiles must cover the grid
    exactly)."""
    t = min(want, N)
    while N % t:
        t -= 1
    return t


def _bin_to_tiles(ug, vg, wplane, tx_size, ty_size, Nx, Ny, nw):
    """Host-side binning: tile id per (vis, w-plane-base); returns
    (order, tile_ids, counts) with tiles keyed (wplane, tx, ty)."""
    ntx = Nx // tx_size
    nty = Ny // ty_size
    tx = (np.mod(np.round(ug).astype(np.int64), Nx)) // tx_size
    ty = (np.mod(np.round(vg).astype(np.int64), Ny)) // ty_size
    tid = (wplane * ntx + tx) * nty + ty
    order = np.argsort(tid, kind="stable")
    return order, tid[order], ntx, nty


@partial(jax.jit, static_argnames=("tx_size", "ty_size", "k", "C",
                                   "ntiles", "tile_chunk"))
def _grid_tiles_mm(upos, vpos, wr, wi, beta, k, tx_size, ty_size, C,
                   ntiles, tile_chunk=32):
    """Batched rank-1 accumulation: inputs are per-tile padded arrays
    (ntiles, C) of positions (relative to the tile origin minus halo)
    and weighted vis real/imag; returns halo'd tiles
    (ntiles, tile+k, tile+k) x2. Batched einsums over tile chunks."""
    ko2 = k // 2
    Thx = tx_size + k
    Thy = ty_size + k
    xsx = jnp.arange(Thx, dtype=upos.dtype)
    xsy = jnp.arange(Thy, dtype=upos.dtype)

    def chunk(args):
        u, v, vr, vi = args  # (B, C)
        CU = es_kernel((xsx[None, None, :] - u[..., None]) / ko2, beta,
                       k)
        CV = es_kernel((xsy[None, None, :] - v[..., None]) / ko2, beta,
                       k)
        ar = jnp.einsum("bcx,bcy->bxy", CU * vr[..., None], CV,
                        precision=lax.Precision.HIGHEST)
        ai = jnp.einsum("bcx,bcy->bxy", CU * vi[..., None], CV,
                        precision=lax.Precision.HIGHEST)
        return ar, ai

    B = min(tile_chunk, ntiles)
    nchunk = -(-ntiles // B)
    npad = nchunk * B - ntiles
    def pad(a):
        return jnp.pad(a, ((0, npad), (0, 0))).reshape(nchunk, B, C)
    ar, ai = lax.map(chunk, (pad(upos), pad(vpos), pad(wr), pad(wi)))
    ar = ar.reshape(nchunk * B, Thx, Thy)[:ntiles]
    ai = ai.reshape(nchunk * B, Thx, Thy)[:ntiles]
    return ar, ai


@partial(jax.jit, static_argnames=("tx_size", "ty_size", "k", "C",
                                   "ntiles", "tile_chunk"))
def _degrid_tiles_mm(upos, vpos, tr, ti, beta, k, tx_size, ty_size, C,
                     ntiles, tile_chunk=32):
    """Transpose: per-tile gather of visibilities from halo'd tiles
    (ntiles, tile+k, tile+k)."""
    ko2 = k // 2
    Thx = tx_size + k
    Thy = ty_size + k
    xsx = jnp.arange(Thx, dtype=upos.dtype)
    xsy = jnp.arange(Thy, dtype=upos.dtype)

    def chunk(args):
        u, v, ar, ai = args
        CU = es_kernel((xsx[None, None, :] - u[..., None]) / ko2, beta,
                       k)
        CV = es_kernel((xsy[None, None, :] - v[..., None]) / ko2, beta,
                       k)
        t1 = jnp.einsum("bcx,bxy->bcy", CU, ar,
                        precision=lax.Precision.HIGHEST)
        vr = jnp.sum(t1 * CV, axis=-1)
        t2 = jnp.einsum("bcx,bxy->bcy", CU, ai,
                        precision=lax.Precision.HIGHEST)
        vi = jnp.sum(t2 * CV, axis=-1)
        return vr, vi

    B = min(tile_chunk, ntiles)
    nchunk = -(-ntiles // B)
    npad = nchunk * B - ntiles
    def pad2(a):
        return jnp.pad(a, ((0, npad), (0, 0))).reshape(nchunk, B, C)
    def pad3(a):
        return jnp.pad(a, ((0, npad), (0, 0), (0, 0))).reshape(
            nchunk, B, Thx, Thy)
    vr, vi = lax.map(chunk, (pad2(upos), pad2(vpos), pad3(tr),
                             pad3(ti)))
    vr = vr.reshape(nchunk * B, C)[:ntiles]
    vi = vi.reshape(nchunk * B, C)[:ntiles]
    return vr, vi


def _overlap_add(grid0, tiles, tids_dev, ntx, nty, tx_size, ty_size,
                 k, Nx, Ny, nw):
    """Scatter the halo'd tiles back onto the (nw, Nx+k, Ny+k) extended
    grid (centered-halo indexing; wrap handled by the caller),
    accumulating duplicates. tiles: (ntiles, Thx, Thy); tids_dev:
    (ntiles,) tile keys (wplane*ntx + tx)*nty + ty."""
    Thx = tx_size + k
    Thy = ty_size + k

    def body(grid, args):
        t, tid = args
        ty = tid % nty
        tx = (tid // nty) % ntx
        p = tid // (ntx * nty)
        block = lax.dynamic_slice(
            grid, (p, tx * tx_size, ty * ty_size), (1, Thx, Thy))
        return lax.dynamic_update_slice(
            grid, block + t[None], (p, tx * tx_size, ty * ty_size)), \
            None

    grid, _ = lax.scan(body, grid0, (tiles, tids_dev))
    return grid


def _wrap(grid_ext, Nx, Ny, k):
    """Fold the centered k/2-per-side halos of the extended grid back
    periodically. Extended index i maps to global i - k/2 (mod N)."""
    h = k // 2
    g = grid_ext
    # axis -2
    core = g[..., h:Nx + h, :]
    core = core.at[..., Nx - h:, :].add(g[..., :h, :])
    core = core.at[..., :h, :].add(g[..., Nx + h:Nx + k, :])
    # axis -1
    out = core[..., :, h:Ny + h]
    out = out.at[..., :, Ny - h:].add(core[..., :, :h])
    out = out.at[..., :, :h].add(core[..., :, Ny + h:Ny + k])
    return out


def _unwrap(grid, k):
    """Extend periodically by k/2 per side (degrid gathers near
    edges); extended index i maps to global i - k/2."""
    h = k // 2
    g = jnp.concatenate([grid[..., -h:, :], grid, grid[..., :h, :]],
                        axis=-2)
    return jnp.concatenate([g[..., :, -h:], g, g[..., :, :h]], axis=-1)


def _prepare(uvw, freq, nx, ny, cellx, celly, epsilon, sigma, tile,
             do_wgridding):
    """Host-side geometry + binning; returns everything static the
    device passes need."""
    k, beta = kernel_params(epsilon)
    Nx, Ny = _grid_setup(nx, ny, cellx, celly, sigma)
    uvw_np = np.asarray(uvw)
    freq_np = np.asarray(freq)
    scale = freq_np / LIGHTSPEED
    ug = (uvw_np[:, 0:1] * scale[None, :]) * cellx * Nx  # (nrow, nchan)
    vg = (uvw_np[:, 1:2] * scale[None, :]) * celly * Ny
    wl = uvw_np[:, 2:3] * scale[None, :]

    l = (np.arange(nx) - nx // 2) * cellx
    m = (np.arange(ny) - ny // 2) * celly
    eps_max = max(abs(l.min()), l.max()) ** 2 + \
        max(abs(m.min()), m.max()) ** 2
    nm1_min = -eps_max / (np.sqrt(max(1.0 - eps_max, 0.0)) + 1.0)
    if do_wgridding:
        nw, w0, dw = _w_params(uvw_np, freq_np, nm1_min, sigma, k)
    else:
        nw, w0, dw = 1, 0.0, 1.0
    wpos = (wl - w0) / dw
    p0 = np.round(wpos).astype(np.int64) if nw > 1 else \
        np.zeros_like(wl, dtype=np.int64)

    ugf = ug.ravel()
    vgf = vg.ravel()
    wposf = wpos.ravel()
    p0f = p0.ravel()
    tx_size = _choose_tile(Nx, tile)
    ty_size = _choose_tile(Ny, tile)
    order, tids, ntx, nty = _bin_to_tiles(ugf, vgf, p0f, tx_size,
                                          ty_size, Nx, Ny, nw)
    return (k, beta, Nx, Ny, nw, w0, dw, ugf, vgf, wposf, p0f, order,
            tids, ntx, nty, tx_size, ty_size)


def _pad_tiles(order, tids, values, C):
    """Group sorted per-vis arrays into (nentries, C) padded blocks.
    Tiles holding more than C visibilities are split into multiple
    entries with the same tile id (the overlap-add accumulates
    duplicates), so C caps the matmul width without capacity errors.
    Returns (padded arrays, entry tile ids, scatter map, mask)."""
    utid, starts = np.unique(tids, return_index=True)
    counts = np.diff(np.append(starts, tids.size))
    entry_tid = []
    entry_start = []
    entry_count = []
    for t in range(utid.size):
        s0 = starts[t]
        remaining = counts[t]
        while remaining > 0:
            c = min(remaining, C)
            entry_tid.append(utid[t])
            entry_start.append(s0)
            entry_count.append(c)
            s0 += c
            remaining -= c
    nentries = len(entry_tid)
    idx = np.zeros((nentries, C), dtype=np.int64)
    mask = np.zeros((nentries, C), dtype=bool)
    for e in range(nentries):
        c = entry_count[e]
        idx[e, :c] = order[entry_start[e]:entry_start[e] + c]
        mask[e, :c] = True
    out = []
    for v in values:
        pv = v[idx]
        pv[~mask] = 0.0
        out.append(pv)
    return out, np.asarray(entry_tid), idx, mask, np.asarray(
        entry_count)


def vis2dirty_mm(uvw, freq, vis, wgt=None, mask=None, *, nx, ny,
                 cellx, celly, epsilon=1e-7, do_wgridding=True,
                 sigma=2.0, tile=128, capacity=None,
                 divide_by_n=False):
    """R.H via the matmul gridder. Semantics identical to
    ops.wgridder.vis2dirty_wgrid (validated against the DFT oracle)."""
    (k, beta, Nx, Ny, nw, w0, dw, ug, vg, wpos, p0, order, tids, ntx,
     nty, tx_size, ty_size) = _prepare(uvw, freq, nx, ny, cellx, celly,
                                       epsilon, sigma, tile,
                                       do_wgridding)
    rdtype = jnp.finfo(vis.dtype).dtype

    w = np.ones(vis.shape, np.float64) if wgt is None else \
        np.asarray(wgt, np.float64)
    if mask is not None:
        w = w * np.asarray(mask)
    visw = np.asarray(vis) * w
    vr = visw.real.ravel()
    vi = visw.imag.ravel()

    if capacity is None:
        capacity = 128
    C = capacity

    (pu, pv, pwpos, pvr, pvi), utid, idx, pmask, counts = _pad_tiles(
        order, tids, [ug, vg, wpos, vr, vi], C)
    ntiles = utid.size
    # tile-local positions including the halo offset k/2
    ty = utid % nty
    tx = (utid // nty) % ntx
    pu_loc = np.mod(pu, Nx) - (tx * tx_size)[:, None] + k // 2
    pv_loc = np.mod(pv, Ny) - (ty * ty_size)[:, None] + k // 2
    # wrap vis whose mod position landed a full grid away from its tile
    pu_loc = np.where(pu_loc < -tx_size, pu_loc + Nx, pu_loc)
    pu_loc = np.where(pu_loc > 2 * tx_size + k, pu_loc - Nx, pu_loc)
    pv_loc = np.where(pv_loc < -ty_size, pv_loc + Ny, pv_loc)
    pv_loc = np.where(pv_loc > 2 * ty_size + k, pv_loc - Ny, pv_loc)

    ext_r = jnp.zeros((nw, Nx + k, Ny + k), rdtype)
    ext_i = jnp.zeros((nw, Nx + k, Ny + k), rdtype)
    wsupport = range(-(k // 2) + 1, k // 2 + 1) if nw > 1 else (0,)
    for t in wsupport:
        if nw > 1:
            cw = es_kernel((np.round(pwpos) + t - pwpos) / (k // 2),
                           beta, k)
            twr = pvr * cw
            twi = pvi * cw
            ptile = np.clip(np.round(pwpos).astype(np.int64) + t, 0,
                            nw - 1)
            # all vis in a padded tile share the same base plane p0
            tid_t = (ptile[:, 0] * ntx + tx) * nty + ty
        else:
            twr, twi = pvr, pvi
            tid_t = utid
        # process entries in chunks: the per-entry halo'd tile images
        # are the big temporary (nentries x Thx x Thy), so emit and
        # overlap-add a bounded number at a time
        echunk = 2048
        for e0 in range(0, ntiles, echunk):
            e1 = min(e0 + echunk, ntiles)
            ne = e1 - e0
            tr, ti = _grid_tiles_mm(
                jnp.asarray(pu_loc[e0:e1], rdtype),
                jnp.asarray(pv_loc[e0:e1], rdtype),
                jnp.asarray(twr[e0:e1], rdtype),
                jnp.asarray(twi[e0:e1], rdtype),
                beta, k, tx_size, ty_size, C, ne)
            ext_r = _overlap_add(ext_r, tr, jnp.asarray(tid_t[e0:e1]),
                                 ntx, nty, tx_size, ty_size, k, Nx, Ny,
                                 nw)
            ext_i = _overlap_add(ext_i, ti, jnp.asarray(tid_t[e0:e1]),
                                 ntx, nty, tx_size, ty_size, k, Nx, Ny,
                                 nw)
            # serialise so chunk temporaries are freed before the next
            # allocates (the async queue otherwise keeps them all live)
            float(jnp.sum(ext_i[0, 0, :8]))

    grids_r = _wrap(ext_r, Nx, Ny, k)
    grids_i = _wrap(ext_i, Nx, Ny, k)

    from pfb_tpu.ops.wgridder import _grid_to_image
    return _grid_to_image(grids_r, grids_i, nx, ny, cellx, celly, k,
                          beta, Nx, Ny, nw > 1, nw, w0, dw,
                          divide_by_n)


def dirty2vis_mm(uvw, freq, image, cellx, celly, *, epsilon=1e-7,
                 do_wgridding=True, sigma=2.0, tile=128, capacity=None,
                 divide_by_n=False, **kw):
    """R via the matmul degridder (gather twin of vis2dirty_mm)."""
    nx, ny = image.shape
    (k, beta, Nx, Ny, nw, w0, dw, ug, vg, wpos, p0, order, tids, ntx,
     nty, tx_size, ty_size) = _prepare(uvw, freq, nx, ny, cellx, celly,
                                       epsilon, sigma, tile,
                                       do_wgridding)
    rdtype = image.dtype

    if capacity is None:
        capacity = 128
    C = capacity

    (pu, pv, pwpos), utid, idx, pmask, counts = _pad_tiles(
        order, tids, [ug, vg, wpos], C)
    ntiles = utid.size
    ty = utid % nty
    tx = (utid // nty) % ntx
    pu_loc = np.mod(pu, Nx) - (tx * tx_size)[:, None] + k // 2
    pv_loc = np.mod(pv, Ny) - (ty * ty_size)[:, None] + k // 2
    pu_loc = np.where(pu_loc < -tx_size, pu_loc + Nx, pu_loc)
    pu_loc = np.where(pu_loc > 2 * tx_size + k, pu_loc - Nx, pu_loc)
    pv_loc = np.where(pv_loc < -ty_size, pv_loc + Ny, pv_loc)
    pv_loc = np.where(pv_loc > 2 * ty_size + k, pv_loc - Ny, pv_loc)

    from pfb_tpu.ops.wgridder import _image_to_grid
    grids = _image_to_grid(jnp.asarray(image), nx, ny, cellx, celly, k,
                           beta, Nx, Ny, nw > 1, nw, w0, dw,
                           divide_by_n)
    gr = _unwrap(grids.real.astype(rdtype), k)
    gi = _unwrap(grids.imag.astype(rdtype), k)

    Thx = tx_size + k
    Thy = ty_size + k
    nrow = np.asarray(uvw).shape[0]
    nchan = np.asarray(freq).shape[0]
    accr = np.zeros(nrow * nchan)
    acci = np.zeros(nrow * nchan)
    wsupport = range(-(k // 2) + 1, k // 2 + 1) if nw > 1 else (0,)
    for t in wsupport:
        if nw > 1:
            cw = es_kernel((np.round(pwpos) + t - pwpos) / (k // 2),
                           beta, k)
            ptile = np.clip(np.round(pwpos).astype(np.int64) + t, 0,
                            nw - 1)[:, 0]
        else:
            cw = np.ones_like(pu_loc)
            ptile = np.zeros(ntiles, dtype=np.int64)
        # gather each tile's halo'd block from the extended grid
        # (vectorised advanced-index gather, stays on device)
        xi = (tx * tx_size)[:, None, None] + \
            np.arange(Thx)[None, :, None]
        yi = (ty * ty_size)[:, None, None] + \
            np.arange(Thy)[None, None, :]
        pidx = ptile[:, None, None]
        blocks_r = gr[jnp.asarray(pidx), jnp.asarray(xi),
                      jnp.asarray(yi)]
        blocks_i = gi[jnp.asarray(pidx), jnp.asarray(xi),
                      jnp.asarray(yi)]
        vr, vi = _degrid_tiles_mm(
            jnp.asarray(pu_loc, jnp.float32),
            jnp.asarray(pv_loc, jnp.float32),
            blocks_r.astype(jnp.float32), blocks_i.astype(jnp.float32),
            beta, k, tx_size, ty_size, C, ntiles)
        vr = np.asarray(vr) * cw
        vi = np.asarray(vi) * cw
        np.add.at(accr, idx.ravel(), (vr * pmask).ravel())
        np.add.at(acci, idx.ravel(), (vi * pmask).ravel())
    return (accr + 1j * acci).reshape(nrow, nchan)