"""Fused Pallas ES gridder — the speed-of-light uv (de)gridding pass.

The mm gridder (ops/mmgridder.py) already removed the scatter hazard by
turning each uv tile's accumulation into dense matmuls, but in XLA the
pass is HBM-bound: the (C, Thy) kernel factors spill to HBM and are
re-read for every w tap, and the accumulator round-trips through a
scatter per tap (~6-7 GB of traffic per component at the 1M-vis bench).
This module fuses the whole pass into ONE Pallas kernel:

- visibilities are binned per uv TILE only (not per w plane); one
  kernel invocation owns an output block holding the tile's FULL w
  column for both components, shape (2, nw, Thx, Thy), resident in
  VMEM across consecutive entries of the same tile (Pallas
  revisit-accumulate: the block is flushed to HBM only when the
  scalar-prefetched tile id changes),
- the 1-D kernel factors CU (Thx, C), CV (C, Thy) and the per-plane w
  taps CW (nw, C) are evaluated on the VPU and never touch HBM,
- each component's spread is ONE MXU matmul per entry:
  (nw*Thx, C) @ (C, Thy), M = nw*Thx ~ 100+ rows — good systolic-array
  utilisation,
- every uv tile gets at least one (possibly all-padding) entry so
  every output block is written: no donated-zeros aliasing tricks.

The full adjoint (pack -> spread -> tile fold -> w-plane iFFTs -> grid
corrections) and forward (grid -> gather/contract -> vis) run as ONE
jitted program each — a single dispatch over the remote runtime, no
host round trips; `make_hessian_pg` chains them into a device-resident
R.H W R. Semantics identical to ducc0 vis2dirty/dirty2vis (reference
pfb/operators/gridder.py:10), validated against the exact-DFT oracle.
"""

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Read once at import time: _fold_pallas runs under jit, so an env var
# read at trace time would not participate in the jit cache key —
# flipping it mid-process would silently keep the first-traced variant
# (round-4 advisor finding).
PG_FOLD_PIPE = os.environ.get("PG_FOLD_PIPE", "0") == "1"

from pfb_tpu.ops.dft import LIGHTSPEED
from pfb_tpu.ops.mmgridder import (_bin_to_tiles, _fold_tiles,
                                   _pad_tiles, _tile_geometry)
from pfb_tpu.ops.wgridder import (_grid_setup, _grid_to_image,
                                  _image_to_grid, _w_params,
                                  kernel_params)


def _es(x, beta, k):
    arg = jnp.maximum(1.0 - x * x, 0.0)
    return jnp.where(jnp.abs(x) <= 1.0,
                     jnp.exp(beta * k * (jnp.sqrt(arg) - 1.0)), 0.0)


def w_geometry(uvw, freq, nx, ny, cellx, celly, x0, y0, sigma, k,
               do_wgridding):
    """(nw, w0, dw) w-plane geometry for an observation — shared by
    pgrid_plan and the row-distributed planner, which must agree
    exactly (row shards see only their rows but need the GLOBAL w
    grid)."""
    uvw = np.asarray(uvw)
    freq = np.asarray(freq)
    if not do_wgridding:
        return 1, 0.0, 1.0
    l = (np.arange(nx) - nx // 2) * cellx + x0
    m = (np.arange(ny) - ny // 2) * celly + y0
    eps_max = max(abs(l.min()), l.max()) ** 2 + \
        max(abs(m.min()), m.max()) ** 2
    nm1_min = -eps_max / (np.sqrt(max(1.0 - eps_max, 0.0)) + 1.0)
    return _w_params(uvw, freq, nm1_min, sigma, k)


def _pg_plan_numpy(uvw_np, freq_np, Nx, Ny, cellx, celly, txs, tys,
                   ntx, nty, w0, dw, nw, C, k):
    """Pure-numpy plan binning/packing (fallback for
    pfb_tpu/native/plan.cc; same outputs bit-for-bit)."""
    scale = freq_np / LIGHTSPEED
    ug = (uvw_np[:, 0:1] * scale[None, :]) * cellx * Nx
    vg = (uvw_np[:, 1:2] * scale[None, :]) * celly * Ny
    wl = uvw_np[:, 2:3] * scale[None, :]
    wpos = ((wl - w0) / dw).ravel() if nw > 1 else \
        np.zeros(ug.size)

    ugf, vgf = ug.ravel(), vg.ravel()
    order, tids, _, _ = _bin_to_tiles(
        ugf, vgf, np.zeros(ugf.size, np.int64), txs, tys, Nx, Ny, 1)
    (pu, pv, pw), utid, idx, pmask, _ = _pad_tiles(order, tids,
                                                   [ugf, vgf, wpos], C)

    # one all-padding entry for every uv tile with no visibilities so
    # the kernel writes every output block (u=-2k keeps CU identically
    # zero; w position mid-range keeps the plane taps finite)
    ntiles = ntx * nty
    missing = np.setdiff1d(np.arange(ntiles), utid)
    if missing.size:
        nm = missing.size
        pu = np.concatenate([pu, np.full((nm, C), -2.0 * k)])
        pv = np.concatenate([pv, np.full((nm, C), -2.0 * k)])
        pw = np.concatenate([pw, np.zeros((nm, C))])
        idx = np.concatenate([idx, np.zeros((nm, C), idx.dtype)])
        pmask = np.concatenate([pmask, np.zeros((nm, C), bool)])
        utid = np.concatenate([utid, missing])
        order2 = np.argsort(utid, kind="stable")
        pu, pv, pw = pu[order2], pv[order2], pw[order2]
        idx, pmask, utid = idx[order2], pmask[order2], utid[order2]

    nentries = utid.size
    ty = utid % nty
    tx = utid // nty
    h = k // 2
    pu_loc = np.mod(pu, Nx) - (tx * txs)[:, None] + h
    pv_loc = np.mod(pv, Ny) - (ty * tys)[:, None] + h
    # legit local coords lie in [h-0.5, t+h+0.5); anything outside got
    # there via the mod wrap (e.g. pos in (-0.5, 0) rounds into tile 0
    # but mods to N-eps) — unwrap by one period. Thresholds must stay
    # < N or the test never fires on small grids.
    pu_loc = np.where(pu_loc < 0, pu_loc + Nx, pu_loc)
    pu_loc = np.where(pu_loc > txs + k, pu_loc - Nx, pu_loc)
    pv_loc = np.where(pv_loc < 0, pv_loc + Ny, pv_loc)
    pv_loc = np.where(pv_loc > tys + k, pv_loc - Ny, pv_loc)

    # (nentries, 8, C) position pack: rows 0-2 = tile-local u, v and
    # fractional w-plane coordinate (adjoint spread); rows 3-4 =
    # window-local u, v and rows 5-6 the window start for the degrid
    # side, where the window start is aligned DOWN to the f32 (8, 128)
    # HBM tile so Mosaic can DMA the slice; row 7 pads the sublane dim
    sx = np.mod(tx * txs - h, Nx)
    sy = np.mod(ty * tys - h, Ny)
    ax, ay = (sx // 8) * 8, (sy // 128) * 128
    pos = np.zeros((nentries, 8, C), np.float64)
    pos[:, 0] = pu_loc
    pos[:, 1] = pv_loc
    pos[:, 2] = pw
    pos[:, 3] = pu_loc + (sx - ax)[:, None]
    pos[:, 4] = pv_loc + (sy - ay)[:, None]
    pos[:, 5] = ax[:, None]
    pos[:, 6] = ay[:, None]
    return pos, utid, idx, pmask, nentries


def _auto_tiles(uvw_np, freq_np, Nx, Ny, cellx, celly, k, C):
    """Pick (tile_u, tile_v) from a small ladder by a measured cost
    model: the spread kernel is bound by the serial per-entry
    dependency chain (round-4 lab), cost ~ entries x (3.2 us + 1e-4 us
    per halo'd-tile element). Sparse coverage (4096^2+: ~1 entry per
    live tile) prefers bigger tiles (-18% measured at (25,121));
    dense coverage is vis-bound and keeps the default. Entry counts
    are exact via per-tile bincounts — O(nvis), no sort."""
    from pfb_tpu.ops.mmgridder import _tile_geometry
    scale = freq_np / LIGHTSPEED
    ug = np.mod(np.round((uvw_np[:, 0:1] * scale[None, :]) * cellx
                         * Nx).ravel().astype(np.int64), Nx)
    vg = np.mod(np.round((uvw_np[:, 1:2] * scale[None, :]) * celly
                         * Ny).ravel().astype(np.int64), Ny)
    txs0, tys0 = _tile_geometry(Nx, Ny, k, None, None)
    best = None
    for dtx, dty in ((0, 0), (16, 0), (16, 128), (48, 128)):
        txs, tys = txs0 + dtx, tys0 + dty
        if txs > Nx or tys > Ny:
            continue
        nty = -(-Ny // tys)
        tid = (ug // txs) * nty + vg // tys
        cnt = np.bincount(tid)
        cnt = cnt[cnt > 0]
        entries = int(np.ceil(cnt / C).sum())
        cost = entries * (3.2 + 1e-4 * ((txs + k) * (tys + k)))
        if best is None or cost < best[0]:
            best = (cost, txs, tys)
    return best[1], best[2]


def pgrid_plan(uvw, freq, *, nx, ny, cellx, celly, epsilon=1e-7,
               do_wgridding=True, sigma=2.0, capacity=128, tile_u=None,
               tile_v=None, dtype=None, x0=0.0, y0=0.0, w_params=None,
               nentries_to=None):
    """Reusable plan for the Pallas gridder: geometry + per-uv-tile
    binning (all w planes of a tile belong to the same entry stream).
    Reuse one plan across every matvec of a major cycle.

    ``w_params=(nw, w0, dw)`` overrides the w-plane geometry (row
    shards of one observation must agree on it); ``nentries_to`` pads
    the entry stream with no-op entries so shards share one compiled
    program shape."""
    k, beta = kernel_params(epsilon)
    Nx, Ny = _grid_setup(nx, ny, cellx, celly, sigma)
    uvw_np = np.asarray(uvw)
    freq_np = np.asarray(freq)

    if w_params is not None:
        nw, w0, dw = w_params
    else:
        nw, w0, dw = w_geometry(uvw_np, freq_np, nx, ny, cellx, celly,
                                x0, y0, sigma, k, do_wgridding)
    if tile_u is None and tile_v is None and \
            uvw_np.shape[0] * freq_np.shape[0] >= (1 << 18):
        tile_u, tile_v = _auto_tiles(uvw_np, freq_np, Nx, Ny, cellx,
                                     celly, k, capacity)
    txs, tys = _tile_geometry(Nx, Ny, k, tile_u, tile_v)
    ntx = -(-Nx // txs)
    nty = -(-Ny // tys)
    C = capacity
    if dtype is None:
        dtype = jnp.zeros(0).dtype  # honours jax_enable_x64

    # native C++ plan builder (two O(N) passes, stable counting sort;
    # the numpy path below costs ~25x the device gridding time at 1M
    # vis) — bit-identical output, numpy fallback when no toolchain
    from pfb_tpu.native import pg_plan_native
    nat = pg_plan_native(uvw_np, freq_np, Nx=Nx, Ny=Ny, cellx=cellx,
                         celly=celly, txs=txs, tys=tys, ntx=ntx,
                         nty=nty, w0=w0, dw=dw, nw=nw, C=C, k=k)
    if nat is not None:
        pos, utid, idx, pmask = nat
        nentries = utid.size
    else:
        pos, utid, idx, pmask, nentries = _pg_plan_numpy(
            uvw_np, freq_np, Nx, Ny, cellx, celly, txs, tys, ntx,
            nty, w0, dw, nw, C, k)

    # drop all-padding entries (one per EMPTY uv tile): the kernel's
    # cost is per grid STEP (~2 us fixed, round-4 profiling), so empty
    # tiles are excluded from the entry stream entirely; their
    # never-written output blocks are zeroed by the tile-validity mask
    # in _spread_fold. At 4096^2 w-blocked plans 85% of entries were
    # empty-tile padding.
    live = pmask.any(axis=1)
    if not live.any():
        live[0] = True  # keep one entry so shapes stay non-empty
    if not live.all():
        pos, utid = pos[live], utid[live]
        idx, pmask = idx[live], pmask[live]
        nentries = utid.size

    if nentries_to is not None:
        if nentries_to < nentries:
            raise ValueError(
                f"nentries_to={nentries_to} < nentries={nentries}")
        npe = nentries_to - nentries
        if npe:
            # no-op entries: same tile id as the last entry (revisit,
            # so no fresh block zeroing is skipped), kernel coordinates
            # at -2k (identically zero ES factors), zero mask
            pade = np.repeat(pos[-1:], npe, axis=0)
            pade[:, 0:2] = -2.0 * k
            pade[:, 3:5] = -2.0 * k
            pos = np.concatenate([pos, pade])
            utid = np.concatenate([utid, np.full(npe, utid[-1])])
            idx = np.concatenate([idx, np.zeros((npe, C), idx.dtype)])
            pmask = np.concatenate([pmask, np.zeros((npe, C), bool)])
            nentries = nentries_to
    return dict(
        k=k, beta=float(beta), Nx=Nx, Ny=Ny, nw=nw, w0=w0, dw=dw,
        ntx=ntx, nty=nty, txs=txs, tys=tys, C=C, nentries=nentries,
        rdtype=dtype, nx=nx, ny=ny, cellx=cellx, celly=celly, x0=x0,
        y0=y0, nrow=uvw_np.shape[0], nchan=freq_np.shape[0],
        pos=jnp.asarray(pos.astype(dtype)),
        tid=jnp.asarray(utid.astype(np.int32)),
        idx=jnp.asarray(idx.astype(np.int32)),
        pm=jnp.asarray(pmask.astype(dtype)),
        uvw_d=jnp.asarray(uvw_np.astype(dtype)),
        freq_d=jnp.asarray(freq_np.astype(dtype)))


def _grid_kernel(tp_ref, pk_ref, vis_ref, out_ref, *, k,
                 beta, nw, Thx, Thy, C, prec):
    # tp packs (tile id << 1) | live: ONE scalar-prefetch array —
    # separate tid/pflag arrays at production entry counts overflow
    # the 1 MB SMEM (6 x 61948 i32 = 1.43 MB measured at 4096^2/1M
    # rows)
    e = pl.program_id(0)
    ep = jnp.maximum(e - 1, 0)
    first = jnp.logical_or(e == 0,
                           (tp_ref[e] >> 1) != (tp_ref[ep] >> 1))

    # NO live gate: a round-4 chip lab showed the whole-body
    # pl.when(live) predication costs ~2.5x on every entry (the
    # probe-structure kernel ran the SAME entries in 8.5 ms vs 20.9).
    # Padding entries (shard-alignment no-ops, empty-tile fillers)
    # are harmless without it: their kernel coordinates are -2k, the
    # ES factors evaluate to exactly zero, and a first-visit padding
    # entry then writes a zero block — which is precisely the
    # initialisation the old zero-pass did. Since plans prune
    # empty-tile entries (padding is 0-6% of the stream), computing
    # them beats predicating everything.
    dt = out_ref.dtype
    kh = k / 2.0
    u = pk_ref[0, 0, :]
    v = pk_ref[0, 1, :]
    wf = pk_ref[0, 2, :]
    # Mosaic iota is integer-only; cast to the compute dtype after
    xs = lax.broadcasted_iota(jnp.int32, (Thx, C), 0).astype(dt)
    CUT = _es((xs - u[None, :]) / kh, beta, k)      # (Thx, C)
    ys = lax.broadcasted_iota(jnp.int32, (C, Thy), 1).astype(dt)
    CV = _es((ys - v[:, None]) / kh, beta, k)       # (C, Thy)
    ps = lax.broadcasted_iota(jnp.int32, (nw, C), 0).astype(dt)
    CW = _es((ps - wf[None, :]) / kh, beta, k) if nw > 1 else \
        jnp.ones((nw, C), dt)                       # (nw, C)

    # one matmul for BOTH components: out[p,x,y] factors as
    # (CW CUT)[px, c] @ (val CV)[c, y]; the components share the
    # A-matrix and stack along the OUTPUT lanes.
    A = (CW[:, None, :] * CUT[None, :, :]).reshape(nw * Thx, C)
    vr = vis_ref[0, 0, :]
    vi = vis_ref[0, 1, :]
    CVv = jnp.concatenate([CV * vr[:, None], CV * vi[:, None]],
                          axis=1)                   # (C, 2*Thy)
    res = lax.dot_general(A, CVv, (((1,), (0,)), ((), ())),
                          precision=prec,
                          preferred_element_type=dt)
    res = res.reshape(nw, Thx, 2 * Thy)

    @pl.when(first)
    def _():
        out_ref[0, :, 0] = res[..., :Thy]
        out_ref[1, :, 0] = res[..., Thy:]

    @pl.when(~first)
    def _():
        out_ref[0, :, 0] += res[..., :Thy]
        out_ref[1, :, 0] += res[..., Thy:]


def _grid_pallas(tid, pos, vispack, beta, k, nw, ntiles, Thx, Thy, C,
                 interpret=False, precision=lax.Precision.HIGHEST,
                 pflag=None):
    dt = vispack.dtype
    if pflag is None:
        # entry has any live visibility (cheap one-off on device)
        pflag = (jnp.sum(vispack[:, 0, :] != 0, axis=-1)
                 + jnp.sum(vispack[:, 1, :] != 0, axis=-1) > 0
                 ).astype(jnp.int32)
    tp = tid.astype(jnp.int32) * 2 + pflag.astype(jnp.int32)
    kern = partial(_grid_kernel, k=k, beta=beta, nw=nw, Thx=Thx,
                   Thy=Thy, C=C, prec=precision)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(pos.shape[0],),
        in_specs=[pl.BlockSpec((1, 8, C), lambda e, *_: (e, 0, 0)),
                  pl.BlockSpec((1, 2, C), lambda e, *_: (e, 0, 0))],
        out_specs=pl.BlockSpec((2, nw, 1, Thx, Thy),
                               lambda e, tp_: (0, 0, tp_[e] // 2, 0,
                                               0)),
    )
    kw = dict(interpret=interpret)
    if not interpret:
        kw["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    return pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((2, nw, ntiles, Thx, Thy), dt),
        **kw)(tp, pos, vispack)


def _droll(a, shift, axis):
    """Dynamic rotate inside a kernel (Mosaic DynamicRotate when
    available, jnp.roll in interpret mode)."""
    try:
        return pltpu.roll(a, shift, axis)
    except Exception:
        return jnp.roll(a, shift, axis=axis)


def _fold_geom(Thx, Thy, txs, tys):
    """Extended-window sizes and the colour strides that make same-
    colour windows provably disjoint: window x-span is [ax, ax+EX)
    with ax in (xs-7, xs], so two tiles are x-disjoint when their
    origins differ by >= EX+7; colours repeat every Sx tiles."""
    EX = -(-(Thx + 8) // 8) * 8
    EY = -(-(Thy + 128) // 128) * 128
    Sx = max(1, -(-(EX + 7) // txs))
    Sy = max(1, -(-(EY + 127) // tys))
    return EX, EY, Sx, Sy


def _fold_kernel(xs_ref, ys_ref, y_ref, bin_ref, bout_ref, win_ref,
                 sem_ref, *, Thx, Thy, EX, EY, nw2):
    """DMA read-modify-write fold: accumulate one live tile's halo'd
    (nw2, Thx, Thy) block into the extended grid at its true offset.
    Scalar prefetch is TWO packed arrays (xs with the live flag in the
    sign, ys) — six separate NE-length arrays overflowed the 1 MB SMEM
    at production entry counts (1.43 MB measured at 4096^2/1M rows).
    Window starts are re-derived in-kernel with syntactic /8*8 so
    Mosaic can prove the HBM slice is tile-aligned; the sub-tile
    offset is applied by rolling the block inside the (nw2, EX, EY)
    staging window. Steps run synchronously (wait-read, add,
    wait-write) — neighbouring tiles' windows overlap by the halo, so
    a later read must see the earlier write."""
    del bin_ref  # aliased with bout_ref; all access goes through out
    e = pl.program_id(0)

    @pl.when(xs_ref[e] >= 0)
    def _():
        ax = (xs_ref[e] // 8) * 8
        ay = (ys_ref[e] // 128) * 128
        rd = pltpu.make_async_copy(
            bout_ref.at[:, pl.ds(ax, EX), pl.ds(ay, EY)], win_ref,
            sem_ref.at[0])
        rd.start()
        rd.wait()
        blk = y_ref[...].reshape(nw2, Thx, Thy)
        st = jnp.pad(blk, ((0, 0), (0, EX - Thx), (0, EY - Thy)))
        st = _droll(st, xs_ref[e] - ax, 1)
        st = _droll(st, ys_ref[e] - ay, 2)
        win_ref[...] = win_ref[...] + st
        wr = pltpu.make_async_copy(
            win_ref, bout_ref.at[:, pl.ds(ax, EX), pl.ds(ay, EY)],
            sem_ref.at[1])
        wr.start()
        wr.wait()


def _fold_kernel_pipe(xs_ref, ys_ref, y_ref, bin_ref, bout_ref,
                      win0, win1, rsem, wsem, pend_ref, *,
                      Thx, Thy, EX, EY, nw2, txs, tys, Sx, Sy, NE):
    """Double-buffered DMA fold. Requires the compact slots in
    COLOUR-major order (see ``_spread_fold``): consecutive live slots
    of the same colour have disjoint windows, so write(e) can overlap
    read(e+1) — the synchronous kernel's rd.wait/add/wr.wait chain
    serialised every step on the DMA round trip (~26 ms of the 64 ms
    per-w-block spread at 4096^2, round-4 lab). At a colour boundary
    the outstanding writes are drained before the next read (pend_ref
    SMEM flags keep every start matched by exactly one wait)."""
    del bin_ref  # aliased with bout_ref; all access goes through out
    e = pl.program_id(0)

    def rd(i, win, sem):
        ax = (xs_ref[i] // 8) * 8
        ay = (ys_ref[i] // 128) * 128
        return pltpu.make_async_copy(
            bout_ref.at[:, pl.ds(ax, EX), pl.ds(ay, EY)], win, sem)

    def wr(i, win, sem):
        ax = (xs_ref[i] // 8) * 8
        ay = (ys_ref[i] // 128) * 128
        return pltpu.make_async_copy(
            win, bout_ref.at[:, pl.ds(ax, EX), pl.ds(ay, EY)], sem)

    def color(i):
        return ((xs_ref[i] // txs) % Sx) * Sy + (ys_ref[i] // tys) % Sy

    live = xs_ref[e] >= 0

    @pl.when(live & (e == 0))
    def _():
        pend_ref[0] = 0
        pend_ref[1] = 0
        rd(0, win0, rsem.at[0]).start()

    def body(wb, wn, ib, inb):
        rd(e, wb, rsem.at[ib]).wait()
        blk = y_ref[...].reshape(nw2, Thx, Thy)
        st = jnp.pad(blk, ((0, 0), (0, EX - Thx), (0, EY - Thy)))
        ax = (xs_ref[e] // 8) * 8
        ay = (ys_ref[e] // 128) * 128
        st = _droll(st, xs_ref[e] - ax, 1)
        st = _droll(st, ys_ref[e] - ay, 2)
        wb[...] = wb[...] + st
        wr(e, wb, wsem.at[ib]).start()
        pend_ref[ib] = 1
        if NE > 1:
            en = jnp.minimum(e + 1, NE - 1)
            nxt_live = (e + 1 < NE) & (xs_ref[en] >= 0)

            @pl.when(nxt_live)
            def _():
                @pl.when(pend_ref[inb] == 1)
                def _():
                    wr(e - 1, wn, wsem.at[inb]).wait()
                    pend_ref[inb] = 0

                @pl.when(color(en) != color(e))
                def _():
                    wr(e, wb, wsem.at[ib]).wait()
                    pend_ref[ib] = 0

                rd(en, wn, rsem.at[inb]).start()

            @pl.when(~nxt_live)
            def _():
                @pl.when(pend_ref[inb] == 1)
                def _():
                    wr(e - 1, wn, wsem.at[inb]).wait()
                    pend_ref[inb] = 0

                @pl.when(pend_ref[ib] == 1)
                def _():
                    wr(e, wb, wsem.at[ib]).wait()
                    pend_ref[ib] = 0
        else:
            wr(e, wb, wsem.at[ib]).wait()
            pend_ref[ib] = 0

    par = lax.rem(e, jnp.asarray(2, e.dtype))

    @pl.when(live & (par == 0))
    def _():
        body(win0, win1, 0, 1)

    @pl.when(live & (par == 1))
    def _():
        body(win1, win0, 1, 0)


def _fold_pallas(Yc, ltid, lflag, *, ntx, nty, txs, tys, k, Nx, Ny,
                 nw, interpret=False):
    """Compact-Y fold: (2nw, NE, Thx, Thy) live-tile blocks -> the
    (2nw, Nx, Ny) periodic grids. Replaces the XLA reshape/pad/add
    fold (_fold_tiles), which materialised the DENSE (2nw, ntiles,
    Thx, Thy) buffer — 4 GB and ~120 ms per w-block at 4096^2 (round-4
    lab) versus ~10 ms of actual data movement."""
    nw2, NE, Thx, Thy = Yc.shape
    EX, EY, Sx, Sy = _fold_geom(Thx, Thy, txs, tys)
    pipe = PG_FOLD_PIPE
    h = k // 2

    if pipe:
        # pipelined variant (measured neutral vs sync on v5e — kept
        # for A/B): needs UNSHIFTED origins so same-colour windows
        # stay provably disjoint; pays a full-grid roll afterwards
        xs = jnp.where(lflag > 0, (ltid // nty) * txs,
                       -1).astype(jnp.int32)  # sign carries the flag
        ys = jnp.where(lflag > 0, (ltid % nty) * tys,
                       0).astype(jnp.int32)
        MxE = ((ntx - 1) * txs // 8) * 8 + EX
        MyE = ((nty - 1) * tys // 128) * 128 + EY
        kern = partial(_fold_kernel_pipe, Thx=Thx, Thy=Thy, EX=EX,
                       EY=EY, nw2=nw2, txs=txs, tys=tys, Sx=Sx,
                       Sy=Sy, NE=NE)
        scratch = [pltpu.VMEM((nw2, EX, EY), Yc.dtype),
                   pltpu.VMEM((nw2, EX, EY), Yc.dtype),
                   pltpu.SemaphoreType.DMA((2,)),
                   pltpu.SemaphoreType.DMA((2,)),
                   pltpu.SMEM((2,), jnp.int32)]
    else:
        # default sync fold with the -k/2 half-kernel ROLL FUSED into
        # the window origins ((tx*txs - h) mod Nx): placement shifted
        # mod the period + the wrap pass is exactly roll(g, -h) of the
        # unshifted placement, and the full-grid roll was ~2 ms at
        # 1024^2 / ~5 ms per 4096^2 w-block of pure HBM traffic
        xs = jnp.where(
            lflag > 0,
            jnp.mod((ltid // nty) * txs - h, Nx),
            -1).astype(jnp.int32)
        ys = jnp.where(lflag > 0, jnp.mod((ltid % nty) * tys - h, Ny),
                       0).astype(jnp.int32)
        MxE = ((Nx - 1) // 8) * 8 + EX
        MyE = ((Ny - 1) // 128) * 128 + EY
        kern = partial(_fold_kernel, Thx=Thx, Thy=Thy, EX=EX, EY=EY,
                       nw2=nw2)
        scratch = [pltpu.VMEM((nw2, EX, EY), Yc.dtype),
                   pltpu.SemaphoreType.DMA((2,))]

    buf0 = jnp.zeros((nw2, MxE, MyE), Yc.dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(NE,),
        in_specs=[pl.BlockSpec((nw2, 1, Thx, Thy),
                               lambda e, *_: (0, e, 0, 0)),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=scratch,
    )
    kw = dict(interpret=interpret)
    if not interpret:
        kw["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    ext = pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nw2, MxE, MyE), Yc.dtype),
        input_output_aliases={3: 0},
        **kw)(xs, ys, Yc, buf0)

    # wrap the extended margins back mod (Nx, Ny) (static loop: tiny
    # grids can wrap more than once); the half-kernel shift (extended
    # coord e -> global e - k//2) is fused into the window origins on
    # the default path, or applied as a roll on the pipe path
    def wrap(g, N, axis):
        while g.shape[axis] > N:
            take = min(g.shape[axis] - N, N)
            head = lax.slice_in_dim(g, 0, N, axis=axis)
            tail = lax.slice_in_dim(g, N, N + take, axis=axis)
            pads = [(0, 0)] * g.ndim
            pads[axis] = (0, N - take)
            head = head + jnp.pad(tail, pads)
            if g.shape[axis] > 2 * N:
                rest = lax.slice_in_dim(g, 2 * N, None, axis=axis)
                g = jnp.concatenate([head, rest], axis=axis)
            else:
                g = head
        return g

    g = wrap(wrap(ext, Nx, 1), Ny, 2)
    if pipe:
        return jnp.roll(g, (-h, -h), axis=(-2, -1))
    return g


def _shift_phases(uvw, freq, x0, y0):
    """cos/sin of the centre-shift phase per (row, chan)."""
    scale = freq / LIGHTSPEED
    ph = (uvw[:, 0:1] * x0 + uvw[:, 1:2] * y0) * scale[None, :]
    ph = 2.0 * jnp.pi * (ph - jnp.round(ph))
    return jnp.cos(ph), jnp.sin(ph)


def _spread_fold(vr, vi, wflat, tid, pos, idx, pm, uvw, freq, *, beta,
                 k, nw, ntx, nty, txs, tys, C, x0, y0, Nx, Ny,
                 interpret, precision=lax.Precision.HIGHEST,
                 fold="dma"):
    """Weight+shift the vis components, gather-pack per tile entry,
    Pallas spread and tile fold -> the (2nw, Nx, Ny) extended grids
    (real planes then imag planes). The row-local half of the adjoint:
    summing these grids over row shards is exact, which is what
    vis2dirty_rowdist psums.

    fold="dma" (default): the spread writes a COMPACT Y (one block per
    live tile, indexed by a device-derived compact tile id) and the
    Pallas DMA fold (_fold_pallas) accumulates blocks straight into
    the extended grid — the dense (2nw, ntiles, Thx, Thy) buffer of
    the "xla" fold cost 4 GB and ~120 ms per w-block at 4096^2.
    fold="xla" keeps the dense-Y reshape/pad/add fold."""
    Thx, Thy = txs + k, tys + k
    if x0 or y0:
        cs, sn = _shift_phases(uvw, freq, x0, y0)
        vr, vi = vr * cs - vi * sn, vr * sn + vi * cs
    if wflat is not None:
        vr = vr * wflat
        vi = vi * wflat
    vr, vi = vr.reshape(-1), vi.reshape(-1)
    vispack = jnp.stack([vr[idx] * pm, vi[idx] * pm], axis=1)

    # live entries / tiles, derived on device from tid/pm so every
    # caller (sharded / stacked / no-op-padded plans) stays correct
    # with no plan-format change
    lv = (jnp.sum(pm, axis=1) > 0).astype(jnp.int32)
    tid = tid.astype(jnp.int32)

    if fold == "dma":
        # live tiles <= min(nentries, ntiles): at dense coverage
        # (1024^2: most tiles live, several entries each) nentries
        # overshoots the tile count and the per-entry bound would
        # allocate a compact Y LARGER than the dense one
        NE = min(tid.shape[0], ntx * nty)
        tval = jnp.zeros((ntx * nty,), jnp.int32).at[tid].max(lv)
        # compact slots in COLOUR-major order: tiles of one colour
        # have pairwise-disjoint fold windows, which lets the DMA
        # fold double-buffer (_fold_kernel_pipe). perm is static.
        _, _, Sx, Sy = _fold_geom(txs + k, tys + k, txs, tys)
        tt = np.arange(ntx * nty)
        col = (tt // nty % Sx) * Sy + (tt % nty % Sy)
        perm = jnp.asarray(np.lexsort((tt, col)).astype(np.int32))
        tp_ = tval[perm]
        cum = jnp.cumsum(tp_) - tp_
        rank = jnp.zeros((ntx * nty,), jnp.int32).at[perm].set(
            cum.astype(jnp.int32))
        ctid = rank[tid]
        Yc = _grid_pallas(ctid, pos, vispack, beta, k, nw, NE, Thx,
                          Thy, C, interpret=interpret,
                          precision=precision, pflag=lv)
        Yc = Yc.reshape(2 * nw, NE, Thx, Thy)
        ltid = jnp.zeros((NE,), jnp.int32).at[ctid].set(tid)
        lflag = jnp.zeros((NE,), jnp.int32).at[ctid].max(lv)
        return _fold_pallas(Yc, ltid, lflag, ntx=ntx, nty=nty,
                            txs=txs, tys=tys, k=k, Nx=Nx, Ny=Ny,
                            nw=nw, interpret=interpret)

    Y = _grid_pallas(tid, pos, vispack, beta, k, nw, ntx * nty, Thx,
                     Thy, C, interpret=interpret, precision=precision,
                     pflag=lv)
    # tiles with no live entry were never written — their blocks are
    # uninitialised memory; jnp.where (NOT multiply: NaN*0=NaN) zeroes
    # them.
    tval = jnp.zeros((ntx * nty,), jnp.int32).at[tid].max(lv) > 0
    Y = jnp.where(tval[None, :, None, None], Y, 0.0)
    return _fold_tiles(Y.reshape(2 * nw, ntx, nty, Thx, Thy), ntx,
                       nty, txs, tys, k, Nx, Ny)


@partial(jax.jit, static_argnames=(
    "beta", "k", "nw", "ntx", "nty", "txs", "tys", "C", "Nx", "Ny",
    "nx", "ny", "cellx", "celly", "w0", "dw", "x0", "y0",
    "divide_by_n", "interpret", "precision"))
def _pg_adjoint(vr, vi, wflat, tid, pos, idx, pm, uvw, freq, *, beta,
                k, nw, ntx, nty, txs, tys, C, Nx, Ny, nx, ny, cellx,
                celly, w0, dw, x0, y0, divide_by_n, interpret,
                precision=lax.Precision.HIGHEST):
    """The WHOLE adjoint as one XLA program: weight+shift the vis
    components, gather-pack per tile entry, Pallas spread, tile fold,
    w-plane iFFTs and grid corrections."""
    folded = _spread_fold(vr, vi, wflat, tid, pos, idx, pm, uvw, freq,
                          beta=beta, k=k, nw=nw, ntx=ntx, nty=nty,
                          txs=txs, tys=tys, C=C, x0=x0, y0=y0, Nx=Nx,
                          Ny=Ny, interpret=interpret,
                          precision=precision)
    return _grid_to_image(folded[:nw], folded[nw:], nx, ny, cellx,
                          celly, k, beta, Nx, Ny, nw > 1, nw, w0, dw,
                          divide_by_n, x0, y0)


def _spread_fold_from_plan(p, vr, vi, wflat, tid, pos, idx, pm, uvw,
                           interpret=False):
    """Row-local spread+fold with geometry from a plan but explicit
    (possibly sharded) binning arrays — the unit the row-distributed
    adjoint psums (parallel/dist.py:make_vis2dirty_rowdist)."""
    return _spread_fold(vr, vi, wflat, tid, pos, idx, pm, uvw,
                        p["freq_d"], beta=p["beta"], k=p["k"],
                        nw=p["nw"], ntx=p["ntx"], nty=p["nty"],
                        txs=p["txs"], tys=p["tys"], C=p["C"],
                        x0=p["x0"], y0=p["y0"], Nx=p["Nx"], Ny=p["Ny"],
                        interpret=interpret)


def _grid_to_image_from_plan(p, folded, divide_by_n=False):
    nw = p["nw"]
    return _grid_to_image(folded[:nw], folded[nw:], p["nx"], p["ny"],
                          p["cellx"], p["celly"], p["k"], p["beta"],
                          p["Nx"], p["Ny"], nw > 1, nw, float(p["w0"]),
                          float(p["dw"]), divide_by_n, p["x0"],
                          p["y0"])


def _adjoint_from_plan(p, vr, vi, wflat, interpret):
    return _pg_adjoint(
        vr, vi, wflat, p["tid"], p["pos"], p["idx"], p["pm"],
        p["uvw_d"], p["freq_d"], beta=p["beta"], k=p["k"], nw=p["nw"],
        ntx=p["ntx"], nty=p["nty"], txs=p["txs"], tys=p["tys"],
        C=p["C"], Nx=p["Nx"], Ny=p["Ny"], nx=p["nx"], ny=p["ny"],
        cellx=p["cellx"], celly=p["celly"], w0=float(p["w0"]),
        dw=float(p["dw"]), x0=p["x0"], y0=p["y0"], divide_by_n=False,
        interpret=interpret)


def vis2dirty_pg(uvw, freq, vis, wgt=None, mask=None, *, nx, ny,
                 cellx, celly, epsilon=1e-7, do_wgridding=True,
                 sigma=2.0, capacity=None, divide_by_n=False,
                 plan=None, x0=0.0, y0=0.0, interpret=None, **kw):
    """R.H via the fused Pallas gridder. Semantics identical to
    ops.wgridder.vis2dirty_wgrid (validated against the DFT oracle).
    Pass plan=pgrid_plan(...) to amortise binning across calls."""
    if plan is None:
        plan = pgrid_plan(uvw, freq, nx=nx, ny=ny, cellx=cellx,
                          celly=celly, epsilon=epsilon,
                          do_wgridding=do_wgridding, sigma=sigma,
                          capacity=capacity or 128, x0=x0, y0=y0)
    p = plan
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    rdtype = p["rdtype"]

    w = None
    if wgt is not None:
        w = jnp.asarray(np.asarray(wgt).astype(rdtype))
    if mask is not None:
        m = jnp.asarray(np.asarray(mask).astype(rdtype))
        w = m if w is None else w * m
    if isinstance(vis, (tuple, list)):
        vr = jnp.asarray(vis[0], rdtype)
        vi = jnp.asarray(vis[1], rdtype)
    else:
        vis = np.asarray(vis)
        vr = jnp.asarray(vis.real.astype(rdtype))
        vi = jnp.asarray(vis.imag.astype(rdtype))
    return _adjoint_from_plan(p, vr, vi, w, interpret)


def _degrid_kernel(tp_ref, sxy_ref, pk_ref,
                   gr_ref, gi_ref, out_ref, win_ref, sem_ref, *, k,
                   beta, nw, ThxA, ThyA, C, prec):
    """Gather twin of _grid_kernel: the tile's halo'd (nw, ThxA, ThyA)
    window for both components is DMA'd HBM->VMEM only when the
    scalar-prefetched tile id changes (window starts are (8, 128)-tile
    aligned so the HBM slice is legal); each entry then runs ONE MXU
    matmul per component, D = [win (nw*ThxA, ThyA)] @ [CVT (ThyA, C)],
    finished by a VPU contraction against CW (x) CUT.

    Padding entries (empty-tile writers / shard no-ops, pm all zero)
    skip both the DMA and the compute and just zero their output
    block; safe because a padding entry never precedes a LIVE entry of
    the same tile (empty-tile entries are singletons; shard no-ops
    reuse the last tile id and come after its live entries)."""
    # scalar prefetch: tp = (tid << 1) | live, sxy = (stx << 9) | sty
    # with stx/sty the (8, 128)-tile indices of the window start —
    # packed so the prefetch fits SMEM at production entry counts
    # (4 separate NE-length i32 arrays exceed the 1 MB SMEM)
    e = pl.program_id(0)
    ep = jnp.maximum(e - 1, 0)
    changed = jnp.logical_or(e == 0,
                             (tp_ref[e] >> 1) != (tp_ref[ep] >> 1))
    live = (tp_ref[e] & 1) != 0

    @pl.when(jnp.logical_and(changed, live))
    def _():
        # the explicit *8 / *128 lets Mosaic prove the HBM slice is
        # tile-aligned
        sx = (sxy_ref[e] >> 9) * 8
        sy = (sxy_ref[e] & 511) * 128
        cr = pltpu.make_async_copy(
            gr_ref.at[:, pl.ds(sx, ThxA), pl.ds(sy, ThyA)],
            win_ref.at[0], sem_ref.at[0])
        ci = pltpu.make_async_copy(
            gi_ref.at[:, pl.ds(sx, ThxA), pl.ds(sy, ThyA)],
            win_ref.at[1], sem_ref.at[1])
        cr.start()
        ci.start()
        cr.wait()
        ci.wait()

    @pl.when(jnp.logical_not(live))
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when(live)
    def _():
        dt = out_ref.dtype
        kh = k / 2.0
        u = pk_ref[0, 3, :]
        v = pk_ref[0, 4, :]
        wf = pk_ref[0, 2, :]
        xs = lax.broadcasted_iota(jnp.int32, (ThxA, C), 0).astype(dt)
        CUT = _es((xs - u[None, :]) / kh, beta, k)      # (ThxA, C)
        ys = lax.broadcasted_iota(jnp.int32, (ThyA, C), 0).astype(dt)
        CVT = _es((ys - v[None, :]) / kh, beta, k)      # (ThyA, C)
        ps = lax.broadcasted_iota(jnp.int32, (nw, C), 0).astype(dt)
        CW = _es((ps - wf[None, :]) / kh, beta, k) if nw > 1 else \
            jnp.ones((nw, C), dt)                       # (nw, C)
        # A[(p, x), c] = CW[p, c] * CUT[x, c]
        A = (CW[:, None, :] * CUT[None, :, :]).reshape(nw * ThxA, C)

        # both components in ONE matmul (stacked along M): per-entry
        # cost is MXU-issue-latency bound, so one issue of 2M rows
        # beats two of M (round-4 lab)
        Bb = win_ref[...].reshape(2 * nw * ThxA, ThyA)
        D = lax.dot_general(Bb, CVT, (((1,), (0,)), ((), ())),
                            precision=prec,
                            preferred_element_type=dt)
        D = D.reshape(2, nw * ThxA, C)
        out_ref[0, 0, :] = jnp.sum(A * D[0], axis=0)
        out_ref[0, 1, :] = jnp.sum(A * D[1], axis=0)


def _degrid_pallas(tid, stx, sty, pos, gr_pad, gi_pad, beta, k, nw,
                   ThxA, ThyA, C, interpret=False,
                   precision=lax.Precision.HIGHEST, pflag=None,
                   pm=None):
    dt = gr_pad.dtype
    if pflag is None:
        if pm is None:
            pflag = jnp.ones((pos.shape[0],), jnp.int32)
        else:
            pflag = (jnp.sum(pm, axis=1) > 0).astype(jnp.int32)
    tp = tid.astype(jnp.int32) * 2 + pflag.astype(jnp.int32)
    sxy = stx.astype(jnp.int32) * 512 + sty.astype(jnp.int32)
    kern = partial(_degrid_kernel, k=k, beta=beta, nw=nw, ThxA=ThxA,
                   ThyA=ThyA, C=C, prec=precision)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(pos.shape[0],),
        in_specs=[
            pl.BlockSpec((1, 8, C), lambda e, *_: (e, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, 2, C), lambda e, *_: (e, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, nw, ThxA, ThyA), dt),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kw = dict(interpret=interpret)
    if not interpret:
        kw["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    return pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((pos.shape[0], 2, C), dt),
        **kw)(tp, sxy, pos, gr_pad, gi_pad)


@partial(jax.jit, static_argnames=(
    "beta", "k", "nw", "txs", "tys", "C", "Nx", "Ny", "nx", "ny",
    "cellx", "celly", "w0", "dw", "x0", "y0", "divide_by_n", "nvis",
    "engine", "interpret", "precision"))
def _pg_forward(image, pos, idx, pm, uvw, freq, tid=None, *, beta, k,
                nw, txs, tys, C, Nx, Ny, nx, ny, cellx, celly, w0, dw,
                x0, y0, divide_by_n, nvis, engine="xla",
                interpret=False, precision=lax.Precision.HIGHEST):
    """The WHOLE forward (degrid) as one XLA program: grid corrections
    + per-w-plane FFTs, then per tile entry slice the full (nw, Thx,
    Thy) halo'd window from the wrap-padded grids and contract over all
    planes at once — V_c = sum_p cw[p,c] sum_xy CU[c,x] G[p,x,y]
    CV[c,y] — and scatter back to (nrow, nchan) components."""
    kh = k / 2.0
    Thx, Thy = txs + k, tys + k
    # degrid windows start at the (8, 128)-aligned tile boundary below
    # the true window start (alignment offset folded into pos rows 3-4)
    ThxA = -(-(Thx + 7) // 8) * 8
    ThyA = -(-(Thy + 127) // 128) * 128
    rdtype = image.dtype

    gr, gi = _image_to_grid(image, nx, ny, cellx, celly, k, beta, Nx,
                            Ny, nw > 1, nw, w0, dw, divide_by_n, x0,
                            y0, split=True)

    xsx = jnp.arange(ThxA, dtype=rdtype)
    xsy = jnp.arange(ThyA, dtype=rdtype)
    ger = jnp.pad(gr, ((0, 0), (0, ThxA), (0, ThyA)), mode="wrap")
    gei = jnp.pad(gi, ((0, 0), (0, ThxA), (0, ThyA)), mode="wrap")
    sx = pos[:, 5, 0].astype(jnp.int32)
    sy = pos[:, 6, 0].astype(jnp.int32)

    if engine == "pallas":
        # (8, 128)-tile indices of the aligned window starts
        out = _degrid_pallas(tid, sx // 8, sy // 128, pos, ger, gei,
                             beta, k, nw, ThxA, ThyA, C,
                             interpret=interpret, precision=precision,
                             pm=pm)
        accr, acci = out[:, 0, :], out[:, 1, :]
    else:
        def one(args):
            pk, x, y = args
            u, v, wf = pk[3], pk[4], pk[2]
            z = jnp.zeros((), x.dtype)
            br = lax.dynamic_slice(ger, (z, x, y), (nw, ThxA, ThyA))
            bi = lax.dynamic_slice(gei, (z, x, y), (nw, ThxA, ThyA))
            CU = _es((xsx[None, :] - u[:, None]) / kh, beta, k)
            CV = _es((xsy[None, :] - v[:, None]) / kh, beta, k)
            CW = _es((jnp.arange(nw, dtype=rdtype)[:, None]
                      - wf[None, :]) / kh, beta, k) if nw > 1 else \
                jnp.ones((nw, C), rdtype)
            # T[p, c, y] = sum_x CU[c, x] G[p, x, y]
            tr = jnp.einsum("cx,pxy->pcy", CU, br, precision=precision)
            ti = jnp.einsum("cx,pxy->pcy", CU, bi, precision=precision)
            # V[c] = sum_p CW[p, c] sum_y T[p, c, y] CV[c, y]
            fr = jnp.sum(jnp.sum(tr * CV[None], axis=-1) * CW, axis=0)
            fi = jnp.sum(jnp.sum(ti * CV[None], axis=-1) * CW, axis=0)
            return fr, fi

        accr, acci = lax.map(one, (pos, sx, sy), batch_size=512)
    fr = jnp.zeros((nvis,), rdtype).at[idx.reshape(-1)].add(
        (accr * pm).reshape(-1))
    fi = jnp.zeros((nvis,), rdtype).at[idx.reshape(-1)].add(
        (acci * pm).reshape(-1))
    nchan = freq.shape[0]
    fr = fr.reshape(-1, nchan)
    fi = fi.reshape(-1, nchan)
    if x0 or y0:
        cs, sn = _shift_phases(uvw, freq, x0, y0)
        fr, fi = fr * cs + fi * sn, fi * cs - fr * sn
    return fr, fi


def _forward_from_plan(p, image, engine="xla", interpret=False):
    return _pg_forward(
        image, p["pos"], p["idx"], p["pm"], p["uvw_d"], p["freq_d"],
        p["tid"], beta=p["beta"], k=p["k"], nw=p["nw"], txs=p["txs"],
        tys=p["tys"], C=p["C"], Nx=p["Nx"], Ny=p["Ny"], nx=p["nx"],
        ny=p["ny"], cellx=p["cellx"], celly=p["celly"],
        w0=float(p["w0"]), dw=float(p["dw"]), x0=p["x0"], y0=p["y0"],
        divide_by_n=False, engine=engine, interpret=interpret,
        nvis=int(p["nrow"]) * int(p["nchan"]))


def dirty2vis_pg(uvw, freq, image, cellx, celly, *, epsilon=1e-7,
                 do_wgridding=True, sigma=2.0, capacity=None,
                 divide_by_n=False, plan=None, x0=0.0, y0=0.0,
                 split=False, engine="pallas", interpret=None, **kw):
    """R via the all-planes degridder (gather twin of vis2dirty_pg).
    Pass plan=pgrid_plan(...) to amortise binning across calls;
    split=True returns device-resident (real, imag) components
    (complex device->host transfer is unsupported on some TPU
    runtimes). engine='pallas' uses the DMA-windowed gather kernel,
    'xla' the dynamic-slice lax.map formulation."""
    nx, ny = image.shape
    if plan is None:
        plan = pgrid_plan(uvw, freq, nx=nx, ny=ny, cellx=cellx,
                          celly=celly, epsilon=epsilon,
                          do_wgridding=do_wgridding, sigma=sigma,
                          capacity=capacity or 128, x0=x0, y0=y0)
    p = plan
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    fr, fi = _forward_from_plan(
        p, jnp.asarray(image).astype(p["rdtype"]),
        engine=engine, interpret=interpret)
    if split:
        return fr, fi
    return (np.asarray(fr).astype(np.float64) +
            1j * np.asarray(fi).astype(np.float64))








def w_geometry_union(dss, nx, ny, cellx, celly, x0, y0, sigma, k,
                     do_wgridding):
    """Shared (nw, w0, dw) covering EVERY dataset's w range: dw depends
    only on the image geometry, so the union grid is the single-dataset
    geometry evaluated on the pooled signed-w extrema (two synthetic
    rows at the global min/max)."""
    if not do_wgridding:
        return 1, 0.0, 1.0
    wmin, wmax = np.inf, -np.inf
    for uvw, freq in dss:
        ws = np.asarray(uvw)[:, 2:3] * (np.asarray(freq)[None, :]
                                        / LIGHTSPEED)
        wmin = min(wmin, ws.min())
        wmax = max(wmax, ws.max())
    uvw_syn = np.array([[0.0, 0.0, wmin], [0.0, 0.0, wmax]])
    return w_geometry(uvw_syn, np.array([LIGHTSPEED]), nx, ny, cellx,
                      celly, x0, y0, sigma, k, do_wgridding)


def stack_pg_plans(dds, nband, *, nx, ny, epsilon=1e-7,
                   do_wgridding=True, use_beam=True, mask_image=None,
                   capacity=128):
    """Stacked (nband, ndata, ...) pgrid plans with ONE shared static
    geometry (grid, tiles, w planes, entry count, row bucket), so the
    whole dataset-reduced Hessian runs as a single compiled program —
    a lax.scan over the dataset axis per band instead of one dispatch
    per dataset (the reference reduces hessian_xds in one dask graph,
    pfb/operators/hessian.py:11-59; a Python chain of fused programs
    pays ~ms of dispatch per dataset on a remote runtime).

    Rows are zero-padded to a common bucket BEFORE planning (padded
    rows carry zero weight so they grid nothing and their degridded
    values are discarded by the weight); ragged channel counts pad with
    unit frequency and zero weight; bands with fewer datasets pad with
    zero-weight dummy plans."""
    from pfb_tpu.ops.gridder import row_bucket

    by_band = [[] for _ in range(nband)]
    for ds in dds:
        by_band[ds["bandid"]].append(ds)
    ndata = max(len(g) for g in by_band)
    R = row_bucket(max(ds["UVW"].shape[0] for ds in dds))
    nchan = max(ds["FREQ"].shape[0] for ds in dds)
    cell = float(dds[0]["cell_rad"])
    x0 = float(dds[0].get("x0", 0.0))
    y0 = float(dds[0].get("y0", 0.0))
    for ds in dds:
        assert float(ds["cell_rad"]) == cell, "mixed cell sizes"
        assert float(ds.get("x0", 0.0)) == x0, "mixed phase centres"
        assert float(ds.get("y0", 0.0)) == y0, "mixed phase centres"

    k, _beta = kernel_params(epsilon)
    wp = w_geometry_union(
        [(ds["UVW"], ds["FREQ"]) for ds in dds], nx, ny, cell, cell,
        x0, y0, 2.0, k, do_wgridding)

    def pad_ds(ds):
        uvw = np.zeros((R, 3))
        frq = np.ones(nchan)
        wgt = np.zeros((R, nchan))
        if ds is not None:
            nr, nc = ds["UVW"].shape[0], ds["FREQ"].shape[0]
            uvw[:nr] = ds["UVW"]
            frq[:nc] = ds["FREQ"]
            wgt[:nr, :nc] = np.asarray(ds["WEIGHT"]) * \
                np.asarray(ds["MASK"])
        return uvw, frq, wgt

    padded = [[pad_ds(g[d] if d < len(g) else None)
               for d in range(ndata)] for g in by_band]
    # uniform tile geometry across datasets/bands (see
    # stack_pg_plans_wblocked)
    all_uvw = np.concatenate([np.asarray(ds["UVW"]) for ds in dds])
    if all_uvw.shape[0] * nchan >= (1 << 18):
        Nx_, Ny_ = _grid_setup(nx, ny, cell, cell, 2.0)
        tu, tv = _auto_tiles(all_uvw, np.asarray(dds[0]["FREQ"]),
                             Nx_, Ny_, cell, cell, k, capacity)
    else:
        tu = tv = None
    plans = [[pgrid_plan(u, f, nx=nx, ny=ny, cellx=cell, celly=cell,
                         epsilon=epsilon, do_wgridding=do_wgridding,
                         capacity=capacity, x0=x0, y0=y0, w_params=wp,
                         tile_u=tu, tile_v=tv)
              for (u, f, _) in row_]
             for row_ in padded]
    nent = max(p["nentries"] for row_ in plans for p in row_)
    for b in range(nband):
        for d in range(ndata):
            if plans[b][d]["nentries"] != nent:
                u, f, _ = padded[b][d]
                plans[b][d] = pgrid_plan(
                    u, f, nx=nx, ny=ny, cellx=cell, celly=cell,
                    epsilon=epsilon, do_wgridding=do_wgridding,
                    capacity=capacity, x0=x0, y0=y0, w_params=wp,
                    tile_u=tu, tile_v=tv, nentries_to=nent)
    p0 = plans[0][0]
    rdt = p0["rdtype"]

    def stk(key):
        return jnp.stack([jnp.stack([plans[b][d][key]
                                     for d in range(ndata)])
                          for b in range(nband)])

    beam = None
    has_beam = use_beam and any("BEAM" in ds for ds in dds)
    if has_beam or mask_image is not None:
        beam = np.ones((nband, ndata, nx, ny))
        for b, group in enumerate(by_band):
            for d in range(ndata):
                bm = 1.0
                if d < len(group) and use_beam and "BEAM" in group[d]:
                    bm = np.asarray(group[d]["BEAM"])
                if mask_image is not None:
                    bm = bm * np.asarray(mask_image)
                beam[b, d] = bm
        beam = jnp.asarray(beam.astype(rdt))

    wgt = jnp.asarray(np.stack(
        [np.stack([w for (_, _, w) in row_]) for row_ in padded])
        .astype(rdt))
    uvw = jnp.asarray(np.stack(
        [np.stack([u for (u, _, _) in row_]) for row_ in padded])
        .astype(rdt))
    frq = jnp.asarray(np.stack(
        [np.stack([f for (_, f, _) in row_]) for row_ in padded])
        .astype(rdt))
    return dict(p0=p0, pos=stk("pos"), tid=stk("tid"), idx=stk("idx"),
                pm=stk("pm"), wgt=wgt, uvw=uvw, freq=frq, beam=beam,
                ndata=ndata, R=R, nchan=nchan)


def _hessian_pg_cube_local(x, st_arrays, beam, p0, interpret):
    """Dataset-reduced R.H W R over a (nb, ndata, ...) stacked plan
    set as ONE lax.scan over the flattened (band, dataset) axis with
    the accumulator cube as carry: sequential evaluation bounds the
    working set to a single dataset's w-plane grids (an unrolled band
    loop let XLA keep several bands' multi-GB grids alive at once —
    measured 18 GB > 15.75 GB HBM at 4096^2 x 8 on v5e), and dispatch
    stays one program regardless of the dataset count."""
    pos, tid, idx, pm, wgt, uvw, frq = st_arrays
    nb, ndata = pos.shape[:2]
    statics = dict(beta=p0["beta"], k=p0["k"], nw=p0["nw"],
                   txs=p0["txs"], tys=p0["tys"], C=p0["C"],
                   Nx=p0["Nx"], Ny=p0["Ny"], nx=p0["nx"], ny=p0["ny"],
                   cellx=p0["cellx"], celly=p0["celly"],
                   w0=float(p0["w0"]), dw=float(p0["dw"]),
                   x0=p0["x0"], y0=p0["y0"], interpret=interpret)
    nvis = int(wgt.shape[-2] * wgt.shape[-1])

    def flat(a):
        return a.reshape((nb * ndata,) + a.shape[2:])

    bid = jnp.repeat(jnp.arange(nb, dtype=jnp.int32), ndata)

    def one(acc, args):
        if beam is None:
            b, pos_d, tid_d, idx_d, pm_d, w_d, uvw_d, frq_d = args
            bm = None
        else:
            (b, pos_d, tid_d, idx_d, pm_d, w_d, uvw_d, frq_d,
             bm) = args
        x_b = lax.dynamic_index_in_dim(x, b, keepdims=False)
        xin = x_b * bm if bm is not None else x_b
        fr, fi = _pg_forward(xin, pos_d, idx_d, pm_d, uvw_d, frq_d,
                             tid_d, divide_by_n=False, nvis=nvis,
                             engine="pallas", **statics)
        conv = _pg_adjoint(fr, fi, w_d, tid_d, pos_d, idx_d, pm_d,
                           uvw_d, frq_d, ntx=p0["ntx"], nty=p0["nty"],
                           divide_by_n=False, **statics)
        if bm is not None:
            conv = conv * bm
        acc = lax.dynamic_update_index_in_dim(
            acc, lax.dynamic_index_in_dim(acc, b, keepdims=False)
            + conv, b, 0)
        return acc, None

    xs = (bid,) + tuple(flat(a) for a in st_arrays)
    if beam is not None:
        xs = xs + (flat(beam),)
    out, _ = lax.scan(one, jnp.zeros_like(x), xs)
    return out






def make_hessian_pg_stacked(dds, nband, wsum, nx, ny, sigmainv=0.0,
                            use_beam=True, mask_image=None,
                            epsilon=1e-7, do_wgridding=True):
    """Dataset-reduced vis-space Hessian through the fused Pallas
    gridder as ONE jitted program: per band a lax.scan over that
    band's stacked datasets (stack_pg_plans), bands unrolled. Dispatch
    cost is flat in the dataset count — the stacked twin of reference
    hessian_xds's single-graph reduction (hessian.py:11-59)."""
    st = stack_pg_plans(dds, nband, nx=nx, ny=ny, epsilon=epsilon,
                        do_wgridding=do_wgridding, use_beam=use_beam,
                        mask_image=mask_image)
    p0 = st["p0"]
    interpret = jax.default_backend() != "tpu"
    has_beam = st["beam"] is not None
    wsum = float(wsum)

    @jax.jit
    def matvec_j(x, pos, tid, idx, pm, wgt, uvw, frq, beam):
        conv = _hessian_pg_cube_local(
            x, (pos, tid, idx, pm, wgt, uvw, frq),
            beam if has_beam else None, p0, interpret)
        out = conv / wsum
        if sigmainv:
            out = out + x * sigmainv**2
        return out

    def matvec(x):
        return matvec_j(x.astype(p0["rdtype"]), st["pos"], st["tid"],
                        st["idx"], st["pm"], st["wgt"], st["uvw"],
                        st["freq"], st["beam"])

    return matvec


def make_hessian_pg(plan, wgt=None, mask=None, engine="pallas"):
    """Device-resident R.H W R for one dataset through the Pallas
    gridder: x -> vis2dirty(wgt * dirty2vis(x)), one jitted program,
    nothing leaves the device between major iterations (the exact
    residual of reference hessian.py:62-106 with divide_by_n=False).
    """
    p = plan
    rdtype = p["rdtype"]
    w = None
    if wgt is not None:
        w = jnp.asarray(np.asarray(wgt).astype(rdtype))
    if mask is not None:
        m = jnp.asarray(np.asarray(mask).astype(rdtype))
        w = m if w is None else w * m
    interpret = jax.default_backend() != "tpu"

    def matvec(x):
        fr, fi = _forward_from_plan(p, x.astype(rdtype),
                                    engine=engine, interpret=interpret)
        return _adjoint_from_plan(p, fr, fi, w, interpret)

    return matvec


# The w-blocked engine moved to ops/pg_stream.py in round 5 (global
# entry stream + per-block entry maps); re-exported lazily (PEP 562)
# so existing import sites keep working without a circular import
# (pg_stream itself imports this module's kernels/helpers).
_PG_STREAM_EXPORTS = frozenset((
    "_WBLK_AKEYS", "_adjoint_wblocked_impl", "_forward_wblocked_impl",
    "_hessian_pg_cube_local_wblocked", "make_adjoint_pg_wblocked",
    "make_hessian_pg_wblocked", "pgrid_plan_wblocked",
    "stack_pg_plans_wblocked"))


def __getattr__(name):
    if name in _PG_STREAM_EXPORTS:
        from pfb_tpu.ops import pg_stream
        return getattr(pg_stream, name)
    raise AttributeError(name)
