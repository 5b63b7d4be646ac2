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


def _centre_shift_np(uvw, freq, x0, y0, sign):
    """Host twin of ops.wgridder._centre_shift: e^{sign 2 pi i (u x0
    + v y0) f/c} per (row, chan)."""
    scale = freq / LIGHTSPEED
    ph = (uvw[:, 0:1] * x0 + uvw[:, 1:2] * y0) * scale[None, :]
    return np.exp(sign * 2j * np.pi * ph)


def _tile_geometry(Nx, Ny, k, tile_u=None, tile_v=None):
    """Pick (txs, tys): tile sizes need NOT divide the grid (the
    overlap-add folds an extended grid back mod N), so they are chosen
    for the hardware instead:

    - u (sublane) axis: smallest txs >= k with txs + k a multiple of 8
      — minimises the dense matmul height at zero sublane padding.
    - v (lane) axis: tys = 128 - k so the halo'd width txs + k is
      exactly one 128-lane block.

    Each axis requires tile >= k (a tile's halo must land entirely on
    its immediate neighbour for the quadrant fold).
    """
    if tile_u is None:
        tile_u = k + (-2 * k) % 8
    if tile_v is None:
        tile_v = max(128 - k, k)
    txs = max(min(tile_u, Nx), k)
    tys = max(min(tile_v, Ny), k)
    return txs, tys


def _bin_to_tiles(ug, vg, wplane, tx_size, ty_size, Nx, Ny, nw):
    """Host-side binning: tile id per (vis, w-plane-base); returns
    (order, tile_ids, counts) with tiles keyed (wplane, tx, ty)."""
    ntx = -(-Nx // tx_size)
    nty = -(-Ny // ty_size)
    tx = (np.mod(np.round(ug).astype(np.int64), Nx)) // tx_size
    ty = (np.mod(np.round(vg).astype(np.int64), Ny)) // ty_size
    tid = (wplane * ntx + tx) * nty + ty
    order = np.argsort(tid, kind="stable")
    return order, tid[order], ntx, nty


@partial(jax.jit, static_argnames=("k", "nw", "ntx", "nty", "txs",
                                   "tys", "C", "precision",
                                   "accum64"))
def _grid_all_taps(pu, pv, vflat, idxc, pmc, pw, txv, tyv, beta, k,
                   nw, ntx, nty, txs, tys, C,
                   precision=lax.Precision.HIGHEST, accum64=False):
    """The whole gridding accumulation — w-support taps x entry chunks
    — as ONE XLA program for one of the real/imag components. The
    chunked host loop this replaces spent ~100x the device time on
    per-call dispatch + transfer over the remote runtime; real and
    imag run as separate programs because a joint (Yr, Yi) scan carry
    double-buffers to 2x the accumulator footprint.

    pu, pv, pw: (nchunk, echunk, C) tile-local u/v positions (halo
    offset included) and fractional w-plane coordinate (zeros when
    nw == 1); vflat: (nrow*nchan,) weighted vis component, gathered
    on device by idxc (plan-resident entry indices) and masked by pmc
    — uploading the raw component (4 MB) instead of the padded
    host-gathered entries (14 MB) cut ~700 ms/component of host +
    transfer time; txv, tyv: (nchunk, echunk) int32 tile coordinates.
    Padded entries carry zero mask.

    Returns the dense per-(plane, tile) halo'd accumulator
    (nw*ntx*nty, txs+k, tys+k) for _dense_overlap. (A window
    scatter_add into a wrap-padded grid — the exact twin of the
    degrid gathers — measured 3x slower: XLA serialises overlapping
    window updates.)"""
    ko2 = k / 2.0
    korig = (k - 1) // 2
    Thx = txs + k
    Thy = tys + k
    rdtype = vflat.dtype
    nseg = nw * ntx * nty
    xsx = jnp.arange(Thx, dtype=rdtype)
    xsy = jnp.arange(Thy, dtype=rdtype)
    ntaps = k if nw > 1 else 1

    def chunk_body(Y, args):
        u, v, ix, pm, w0c, txc, tyc = args
        w = vflat[ix] * pm
        # kernel factors are shared by every w tap — evaluate once
        CU = es_kernel((xsx[None, None, :] - u[..., None]) / ko2,
                       beta, k)
        CV = es_kernel((xsy[None, None, :] - v[..., None]) / ko2,
                       beta, k)
        p0 = jnp.round(w0c)
        pbase = jnp.round(w0c[:, 0]).astype(jnp.int32)
        for i in range(ntaps):
            t = i - korig if nw > 1 else 0
            if nw > 1:
                # w-axis ES tap weight
                cw = es_kernel((p0 + t - w0c) / ko2, beta, k)
                wt = w * cw
            else:
                wt = w
            ptile = jnp.clip(pbase + t, 0, nw - 1)
            tid = (ptile * ntx + txc) * nty + tyc
            tiles = jnp.einsum("ecx,ecy->exy", CU * wt[..., None], CV,
                               precision=precision)
            if accum64:  # double-precision grid accumulation
                tiles = tiles.astype(jnp.float64)
            Y = Y.at[tid].add(tiles, indices_are_sorted=True)
        return Y, None

    # gridding.yml double-accum: the ducc0 double_precision_accumulation
    # analogue — the dense accumulator is f64 even for f32 inputs (CPU/
    # x64 only; TPU has no f64 and uses HIGHEST-precision dots instead)
    Y0 = jnp.zeros((nseg, Thx, Thy),
                   jnp.float64 if accum64 else rdtype)
    Y, _ = lax.scan(chunk_body, Y0,
                    (pu, pv, idxc, pmc, pw, txv, tyv))
    return Y.astype(rdtype)


@partial(jax.jit, static_argnames=("k", "nw", "ntx", "nty", "txs",
                                   "tys", "C", "Nx", "Ny", "nvis",
                                   "precision"))
def _degrid_all_taps(gr, gi, pu, pv, idxc, pmc, pw, txv, tyv, beta,
                     k, nw, ntx, nty, txs, tys, C, Nx, Ny, nvis,
                     precision=lax.Precision.HIGHEST):
    """Gather twin of _grid_all_taps: the whole degrid — w-support
    taps x entry chunks, block gathers included — as ONE XLA program.

    gr, gi: (nw, Nx, Ny) wrapped grids; per-entry halo'd blocks are
    vmapped lax.dynamic_slice windows (one start index per entry —
    structured like the grid direction's row scatter; dense block
    materialisation OOM'd from (8,128)-tiling padding + relayout
    copies, and elementwise 3-index gathers crashed the TPU runtime).
    Wraparound is handled by wrap-padding the grids by one window at
    the high edges so every mod-reduced start is in bounds.
    pu, pv, pw: (nchunk, echunk, C) tile-local positions / fractional
    w coordinate; txv, tyv: (nchunk, echunk) int32 tile coordinates.
    Padded entries (u = -2k) evaluate to zero kernel weight.

    Returns flat per-visibility components (nvis,) x2 summed over the
    w taps, scattered on device by idxc/pmc (the host np.add.at +
    14 MB readbacks cost more than the whole device pass)."""
    ko2 = k / 2.0
    korig = (k - 1) // 2
    h = k // 2
    Thx = txs + k
    Thy = tys + k
    rdtype = gr.dtype
    xsx = jnp.arange(Thx, dtype=rdtype)
    xsy = jnp.arange(Thy, dtype=rdtype)
    ntaps = k if nw > 1 else 1

    ger = jnp.pad(gr, ((0, 0), (0, Thx), (0, Thy)), mode="wrap")
    gei = jnp.pad(gi, ((0, 0), (0, Thx), (0, Thy)), mode="wrap")

    def slice_window(pt, x, y):
        # ONE (ntaps, Thx, Thy) window per entry spanning the entry's
        # whole w support (the w planes a vis touches are contiguous;
        # k separate 12KB slices were DMA-latency-bound)
        return (lax.dynamic_slice(ger, (pt, x, y), (ntaps, Thx, Thy)),
                lax.dynamic_slice(gei, (pt, x, y), (ntaps, Thx, Thy)))

    def chunk_body(_, args):
        u, v, w0c, txc, tyc = args
        # kernel factors shared by every w tap — evaluate once
        CU = es_kernel((xsx[None, None, :] - u[..., None]) / ko2,
                       beta, k)
        CV = es_kernel((xsy[None, None, :] - v[..., None]) / ko2,
                       beta, k)
        p0 = jnp.round(w0c)
        pbase = jnp.round(w0c[:, 0]).astype(jnp.int32)
        pstart = jnp.clip(pbase - korig if nw > 1 else pbase,
                          0, nw - ntaps)
        sx = jnp.mod(txc * txs - h, Nx)
        sy = jnp.mod(tyc * tys - h, Ny)
        br, bi = jax.vmap(slice_window)(pstart, sx, sy)
        vr = jnp.zeros(u.shape[:2], rdtype)
        vi = jnp.zeros(u.shape[:2], rdtype)
        for i in range(ntaps):
            t = i - korig if nw > 1 else 0
            cw = (es_kernel((p0 + t - w0c) / ko2, beta, k)
                  if nw > 1 else 1.0)
            t1 = jnp.einsum("ecx,exy->ecy", CU, br[:, i],
                            precision=precision)
            t2 = jnp.einsum("ecx,exy->ecy", CU, bi[:, i],
                            precision=precision)
            vr = vr + jnp.sum(t1 * CV, axis=-1) * cw
            vi = vi + jnp.sum(t2 * CV, axis=-1) * cw
        return None, (vr, vi)

    _, (accr, acci) = lax.scan(chunk_body, None,
                               (pu, pv, pw, txv, tyv))
    fr = jnp.zeros((nvis,), rdtype).at[idxc.reshape(-1)].add(
        (accr * pmc).reshape(-1))
    fi = jnp.zeros((nvis,), rdtype).at[idxc.reshape(-1)].add(
        (acci * pmc).reshape(-1))
    return fr, fi


@partial(jax.jit, static_argnums=(1, 2, 3, 4, 5, 6, 7),
         donate_argnums=0)
def _fold_tiles(X, ntx, nty, txs, tys, k, Nx, Ny):
    """Vectorised overlap-add + fold of a halo'd tile stack back onto
    the periodic (Nx, Ny) grid.

    X is (nplane, ntx, nty, txs+k, tys+k); tile-local (i, j) sits at
    extended coordinate (tx*txs + i, ty*tys + j), which maps to global
    ((tx*txs + i - k/2) mod Nx, ...). Tile sizes need not divide the
    grid: tiles cover an extended (ntx+1)*txs x (nty+1)*tys plane
    (one spare tile row/column receives the last tiles' halos), which
    is folded back mod N afterwards. Each halo'd tile splits into 4
    quadrants — base (txs, tys), x-strip (k, tys), y-strip (txs, k)
    and corner (k, k) — landing on the base region of the tile one
    step over: pure reshapes, no scatter, no scan. Requires k <= txs
    and k <= tys (guaranteed by _tile_geometry)."""
    Mx, My = (ntx + 1) * txs, (nty + 1) * tys

    def fold_rows(G, N):
        # add extended rows [N:] back onto [0:] (extended coords are
        # periodic mod N); at most a few static iterations
        while G.shape[0] > N:
            take = min(G.shape[0] - N, N)
            head = G[:N].at[:take].add(G[N:N + take])
            G = head if G.shape[0] <= 2 * N else \
                jnp.concatenate([head, G[2 * N:]], axis=0)
        return G

    def one(xp):
        # one w-plane: (ntx, nty, txs+k, tys+k) -> (Nx, Ny); keeping
        # the fold per-plane bounds the transpose temporaries
        # (full-stack they are multi-GB at many w-planes)
        def place(a, dx, dy):
            Z = jnp.zeros((ntx + 1, nty + 1, txs, tys), X.dtype)
            Z = Z.at[dx:ntx + dx, dy:nty + dy,
                     :a.shape[-2], :a.shape[-1]].set(a)
            return Z.transpose(0, 2, 1, 3).reshape(Mx, My)

        G = place(xp[..., :txs, :tys], 0, 0)
        G = G + place(xp[..., txs:, :tys], 1, 0)
        G = G + place(xp[..., :txs, tys:], 0, 1)
        G = G + place(xp[..., txs:, tys:], 1, 1)
        G = fold_rows(G, Nx)
        G = fold_rows(G.T, Ny).T
        # global offset: extended coordinate e maps to global e - k/2
        return jnp.roll(G, (-(k // 2), -(k // 2)), axis=(-2, -1))

    return lax.map(one, X)


def _dense_overlap(Y, nw, ntx, nty, txs, tys, k, Nx, Ny):
    """Fold the dense per-(w-plane, tile) accumulator
    (nw*ntx*nty, txs+k, tys+k), segment id (p*ntx + tx)*nty + ty,
    onto the periodic grid stack (nw, Nx, Ny)."""
    return _fold_tiles(Y.reshape(nw, ntx, nty, txs + k, tys + k),
                       ntx, nty, txs, tys, k, Nx, Ny)


def _prepare(uvw, freq, nx, ny, cellx, celly, epsilon, sigma, tile_u,
             tile_v, do_wgridding, x0=0.0, y0=0.0):
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

    l = (np.arange(nx) - nx // 2) * cellx + x0
    m = (np.arange(ny) - ny // 2) * celly + y0
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
    tx_size, ty_size = _tile_geometry(Nx, Ny, k, tile_u, tile_v)
    order, tids, ntx, nty = _bin_to_tiles(ugf, vgf, p0f, tx_size,
                                          ty_size, Nx, Ny, nw)
    return (k, beta, Nx, Ny, nw, w0, dw, ugf, vgf, wposf, p0f, order,
            tids, ntx, nty, tx_size, ty_size)


def _pad_tiles(order, tids, values, C):
    """Group sorted per-vis arrays into (nentries, C) padded blocks.
    Tiles holding more than C visibilities are split into multiple
    entries with the same tile id (the overlap-add accumulates
    duplicates), so C caps the matmul width without capacity errors.
    Fully vectorised (the loop version cost seconds at ~25k entries).
    Returns (padded arrays, entry tile ids, scatter map, mask)."""
    utid, starts = np.unique(tids, return_index=True)
    counts = np.diff(np.append(starts, tids.size))
    nsplit = -(-counts // C)
    nentries = int(nsplit.sum())
    # per-entry index within its tile's group of split entries
    gstart = np.cumsum(np.append(0, nsplit[:-1]))
    oi = np.arange(nentries) - np.repeat(gstart, nsplit)
    entry_tid = np.repeat(utid, nsplit)
    entry_start = np.repeat(starts, nsplit) + oi * C
    entry_count = np.minimum(np.repeat(counts, nsplit) - oi * C, C)
    pos = entry_start[:, None] + np.arange(C)[None, :]
    mask = np.arange(C)[None, :] < entry_count[:, None]
    idx = order[np.minimum(pos, tids.size - 1)]
    idx[~mask] = 0
    out = []
    for v in values:
        pv = v[idx]
        pv[~mask] = 0.0
        out.append(pv)
    return out, entry_tid, idx, mask, entry_count


def mm_plan(uvw, freq, *, nx, ny, cellx, celly, epsilon=1e-7,
            do_wgridding=True, sigma=2.0, tile=None, tile_u=None,
            tile_v=None, capacity=128, echunk=2048, dtype=None,
            x0=0.0, y0=0.0, precision=lax.Precision.HIGHEST):
    """Build the reusable gridding plan: geometry, tile binning, entry
    padding and the device-resident position arrays. Everything here
    depends only on (uvw, freq, image geometry) — imaging reuses one
    plan across every major-cycle matvec (the ducc0 wgridder exposes
    the same concept; reference pfb/operators/gridder.py re-plans per
    call because ducc hides the cache internally).

    tile_u/tile_v override the MXU-shaped tile defaults (see
    _tile_geometry); tile sets both (legacy square tiles)."""
    if tile is not None:
        tile_u = tile_u or tile
        tile_v = tile_v or tile
    (k, beta, Nx, Ny, nw, w0, dw, ug, vg, wpos, p0, order, tids, ntx,
     nty, txs, tys) = _prepare(uvw, freq, nx, ny, cellx, celly,
                               epsilon, sigma, tile_u, tile_v,
                               do_wgridding, x0, y0)
    C = capacity
    (pu, pv, pwpos), utid, idx, pmask, counts = _pad_tiles(
        order, tids, [ug, vg, wpos], C)
    ntiles = utid.size
    # tile-local positions including the halo offset k/2
    ty = utid % nty
    tx = (utid // nty) % ntx
    pu_loc = np.mod(pu, Nx) - (tx * txs)[:, None] + k // 2
    pv_loc = np.mod(pv, Ny) - (ty * tys)[:, None] + k // 2
    # wrap vis whose mod position landed a full grid away from its tile
    # legit local coords lie in [h-0.5, t+h+0.5); anything outside
    # got there via the mod wrap (e.g. pos in (-0.5, 0) rounds into
    # tile 0 but mods to N-eps) — unwrap by one period. Thresholds
    # must stay < N or the test never fires on small grids.
    pu_loc = np.where(pu_loc < 0, pu_loc + Nx, pu_loc)
    pu_loc = np.where(pu_loc > txs + k, pu_loc - Nx, pu_loc)
    pv_loc = np.where(pv_loc < 0, pv_loc + Ny, pv_loc)
    pv_loc = np.where(pv_loc > tys + k, pv_loc - Ny, pv_loc)

    nchunk = -(-ntiles // echunk)
    npad = nchunk * echunk - ntiles
    if dtype is None:
        dtype = jnp.zeros(0).dtype  # honours jax_enable_x64

    # padded entries: zero weight; u/v at -2k so the kernel support
    # mask kills them; tile/plane coords at their MAXIMUM (tid clips to
    # nseg-1) so per-chunk tile ids stay sorted — the grid scatter
    # promises indices_are_sorted
    def chunked(a, dt, fill=0.0):
        a = np.asarray(a)
        if npad:
            pad = np.full((npad,) + a.shape[1:], fill, a.dtype)
            a = np.concatenate([a, pad])
        return jnp.asarray(a.reshape((nchunk, echunk)
                                     + a.shape[1:]).astype(dt))

    return dict(
        k=k, beta=beta, Nx=Nx, Ny=Ny, nw=nw, w0=w0, dw=dw, ntx=ntx,
        nty=nty, txs=txs, tys=tys, C=C, ntiles=ntiles, nchunk=nchunk,
        echunk=echunk, npad=npad, idx=idx, pmask=pmask, rdtype=dtype,
        precision=precision,
        nx=nx, ny=ny, cellx=cellx, celly=celly, x0=x0, y0=y0,
        uvw=np.asarray(uvw), freq=np.asarray(freq),
        nrow=np.asarray(uvw).shape[0], nchan=np.asarray(freq).shape[0],
        chunked=chunked,
        pu_c=chunked(pu_loc, dtype, -2.0 * k),
        pv_c=chunked(pv_loc, dtype, -2.0 * k),
        pw_c=chunked(pwpos if nw > 1 else np.zeros_like(pu_loc),
                     dtype, fill=float(nw + k)),
        tx_c=chunked(tx, np.int32, fill=ntx - 1),
        ty_c=chunked(ty, np.int32, fill=nty - 1),
        idx_c=chunked(idx, np.int32), pm_c=chunked(pmask, dtype))


def vis2dirty_mm(uvw, freq, vis, wgt=None, mask=None, *, nx, ny,
                 cellx, celly, epsilon=1e-7, do_wgridding=True,
                 sigma=2.0, tile=None, capacity=None,
                 divide_by_n=False, plan=None, x0=0.0, y0=0.0,
                 double_accum=False):
    """R.H via the matmul gridder. Semantics identical to
    ops.wgridder.vis2dirty_wgrid (validated against the DFT oracle).
    Pass plan=mm_plan(...) to amortise binning across calls."""
    if plan is None:
        plan = mm_plan(uvw, freq, nx=nx, ny=ny, cellx=cellx,
                       celly=celly, epsilon=epsilon,
                       do_wgridding=do_wgridding, sigma=sigma,
                       tile=tile, capacity=capacity or 128, x0=x0,
                       y0=y0)
    p = plan
    k, nw, ntx, nty, txs, tys, C = (p["k"], p["nw"], p["ntx"],
                                    p["nty"], p["txs"], p["tys"],
                                    p["C"])
    rdtype = p["rdtype"]

    w = np.ones(vis.shape, np.float64) if wgt is None else \
        np.asarray(wgt, np.float64)
    if mask is not None:
        w = w * np.asarray(mask)
    if isinstance(vis, (tuple, list)):
        vis = np.asarray(vis[0]) + 1j * np.asarray(vis[1])
    visw = np.asarray(vis) * w
    if p["x0"] or p["y0"]:
        visw = visw * _centre_shift_np(p["uvw"], p["freq"], p["x0"],
                                       p["y0"], +1.0)
    vr_flat = jnp.asarray(visw.real.ravel().astype(rdtype))
    vi_flat = jnp.asarray(visw.imag.ravel().astype(rdtype))

    # real / imag as separate program runs, each accumulator folded and
    # released before the next allocates: at many w-planes each dense
    # accumulator copy is GBs and the FFT stage needs the headroom
    # (a joint program's (Yr, Yi) scan carry double-buffers to 2x)
    prec = p.get("precision", lax.Precision.HIGHEST)
    # double-accum is only realisable with x64 available (CPU); on TPU
    # the f32 path already runs HIGHEST-precision dots
    accum64 = bool(double_accum and jax.config.jax_enable_x64
                   and np.dtype(rdtype) == np.float32)
    Yr = _grid_all_taps(p["pu_c"], p["pv_c"], vr_flat, p["idx_c"],
                        p["pm_c"], p["pw_c"], p["tx_c"], p["ty_c"],
                        p["beta"], k, nw, ntx, nty, txs, tys, C,
                        precision=prec, accum64=accum64)
    float(jnp.sum(Yr[0, 0, :8]))
    grids_r = _dense_overlap(Yr, nw, ntx, nty, txs, tys, k, p["Nx"],
                             p["Ny"])
    del Yr
    float(jnp.sum(grids_r[0, 0, :8]))
    Yi = _grid_all_taps(p["pu_c"], p["pv_c"], vi_flat, p["idx_c"],
                        p["pm_c"], p["pw_c"], p["tx_c"], p["ty_c"],
                        p["beta"], k, nw, ntx, nty, txs, tys, C,
                        precision=prec, accum64=accum64)
    float(jnp.sum(Yi[0, 0, :8]))
    grids_i = _dense_overlap(Yi, nw, ntx, nty, txs, tys, k, p["Nx"],
                             p["Ny"])
    del Yi
    float(jnp.sum(grids_i[0, 0, :8]))

    from pfb_tpu.ops.wgridder import _grid_to_image
    return _grid_to_image(grids_r, grids_i, p["nx"], p["ny"],
                          p["cellx"], p["celly"], k, p["beta"],
                          p["Nx"], p["Ny"], nw > 1, nw, p["w0"],
                          p["dw"], divide_by_n, p["x0"], p["y0"])


def dirty2vis_mm(uvw, freq, image, cellx, celly, *, epsilon=1e-7,
                 do_wgridding=True, sigma=2.0, tile=None, capacity=None,
                 divide_by_n=False, plan=None, x0=0.0, y0=0.0,
                 split=False, **kw):
    """R via the matmul degridder (gather twin of vis2dirty_mm).
    Pass plan=mm_plan(...) to amortise binning across calls."""
    nx, ny = image.shape
    if plan is None:
        plan = mm_plan(uvw, freq, nx=nx, ny=ny, cellx=cellx,
                       celly=celly, epsilon=epsilon,
                       do_wgridding=do_wgridding, sigma=sigma,
                       tile=tile, capacity=capacity or 128, x0=x0,
                       y0=y0)
    p = plan
    k, nw, ntx, nty, txs, tys, C = (p["k"], p["nw"], p["ntx"],
                                    p["nty"], p["txs"], p["tys"],
                                    p["C"])

    from pfb_tpu.ops.wgridder import _image_to_grid
    gr, gi = _image_to_grid(
        jnp.asarray(image).astype(p["rdtype"]), nx, ny, p["cellx"],
        p["celly"], k, p["beta"], p["Nx"], p["Ny"], nw > 1, nw,
        p["w0"], p["dw"], divide_by_n, p["x0"], p["y0"], split=True)
    float(jnp.sum(gi[0, 0, :8]))

    fr, fi = _degrid_all_taps(
        gr, gi, p["pu_c"], p["pv_c"], p["idx_c"], p["pm_c"],
        p["pw_c"], p["tx_c"], p["ty_c"], p["beta"], k, nw, ntx, nty,
        txs, tys, C, p["Nx"], p["Ny"], p["nrow"] * p["nchan"],
        precision=p.get("precision", lax.Precision.HIGHEST))
    out = (np.asarray(fr).astype(np.float64) +
           1j * np.asarray(fi).astype(np.float64)).reshape(
               p["nrow"], p["nchan"])
    if p["x0"] or p["y0"]:
        out = out * _centre_shift_np(p["uvw"], p["freq"], p["x0"],
                                     p["y0"], -1.0)
    if split:
        return (np.ascontiguousarray(out.real),
                np.ascontiguousarray(out.imag))
    return out