"""Global-stream w-blocked Pallas gridder — the 4096^2+ w-ON engine.

The round-4 w-blocked design built an independent gridding plan per
w-plane block: every block re-gathered its visibilities from the
(nrow, nchan) arrays through a per-slot index (a TPU scalar gather at
~8 ns/slot — 70 ms per block at the 1M-row bench), re-derived the
compact-tile ids on device (~60 ms/block of plan-static scatter work),
and the forward scattered partial visibilities back per block. Round-5
measurement (scripts/profile_pg_bench.py, BASELINE.md) showed those
per-block passes — not the spread kernel — dominate the w-ON adjoint.

This module restructures the w-blocked path around ONE global entry
stream, so per-call cost scales with the data once, not once per
block:

* visibilities are weighted/phase-shifted and gathered into a single
  (tile, w)-sorted packed stream ONCE per call (``pos``/``gidx``/
  ``gpm``, built at plan time with a single lexsort);
* each w block selects its entries through a scalar-prefetched ENTRY
  MAP: the spread/degrid kernels' BlockSpec index_maps read
  ``gmap[e]`` so the per-block streams are views of the global pack —
  no per-block gather, no per-block pos arrays (the w coordinate is
  stored absolute and the block's plane offset enters as one
  prefetched integer);
* w-sorting within each tile makes per-entry w-support tight, so an
  entry is visited only by the 2-3 blocks its taps actually touch
  (the row-granularity selection visited ~1.4x more);
* compact-tile ids, fold colours and degrid window starts are all
  plan-time host arrays — nothing plan-static is recomputed on
  device;
* the forward accumulates per-entry visibilities in a global
  (NEg+1, 2, C) buffer carried through the block scan (Pallas
  input/output aliasing) and scatters back to (nrow, nchan) ONCE;
* the DMA fold processes G same-colour tiles per grid step (colour
  runs are G-aligned at plan time), overlapping the window DMA
  round-trips that serialised the one-tile-per-step fold
  (6.7 us/tile measured).

Semantics identical to ducc0 vis2dirty/dirty2vis with w-gridding
(reference pfb/operators/gridder.py:10), validated against the
exact-DFT oracle and the unblocked pg path in tests/test_pgridder.py.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pfb_tpu.ops.dft import LIGHTSPEED
from pfb_tpu.ops.mmgridder import _pad_tiles, _tile_geometry
from pfb_tpu.ops.pgridder import (_auto_tiles, _droll, _es, _fold_geom,
                                  _shift_phases, w_geometry)
from pfb_tpu.ops.wgridder import (_grid_setup, _grid_to_image,
                                  _image_to_grid, gi_consts,
                                  kernel_params)

FOLD_G = 8  # same-colour fold windows in flight per grid step


# --------------------------------------------------------------- plan

def _pg_plan_gs(uvw_np, freq_np, Nx, Ny, cellx, celly, txs, tys, ntx,
                nty, w0, dw, nw, C, k):
    """Global (tile, w)-sorted packed entry stream (numpy).

    Returns pos (NEg+1, 8, C) [rows 0-2: tile-local u, v and ABSOLUTE
    fractional w-plane coordinate; rows 3-6: degrid window-local u, v
    and the (8,128)-aligned window starts], gidx (NEg+1, C) global
    flat vis indices, gpm mask, utid (NEg,) tile ids, and per-entry
    first/last w-tap indices (pmin, pmax). The last row is the NULL
    entry (coords -2k, zero mask) that per-block maps pad with."""
    # native C++ builder (two counting-sort passes + per-tile stable
    # w-sorts + entry packing, pfb_tpu/native/plan.cc:pg_gs_fill):
    # bit-identical output, ~10x the numpy lexsort path at 1M rows;
    # numpy fallback when no toolchain is available
    from pfb_tpu.native import pg_gs_plan_native
    nat = pg_gs_plan_native(uvw_np, freq_np, Nx=Nx, Ny=Ny,
                            cellx=cellx, celly=celly, txs=txs,
                            tys=tys, ntx=ntx, nty=nty, w0=w0, dw=dw,
                            nw=nw, C=C, k=k)
    if nat is not None:
        return nat

    scale = freq_np / LIGHTSPEED
    ug = (uvw_np[:, 0:1] * scale[None, :]) * cellx * Nx
    vg = (uvw_np[:, 1:2] * scale[None, :]) * celly * Ny
    wl = uvw_np[:, 2:3] * scale[None, :]
    wpos = ((wl - w0) / dw).ravel() if nw > 1 else \
        np.zeros(ug.size)
    ugf, vgf = ug.ravel(), vg.ravel()

    tx_ = np.mod(np.round(ugf).astype(np.int64), Nx) // txs
    ty_ = np.mod(np.round(vgf).astype(np.int64), Ny) // tys
    tid_all = tx_ * nty + ty_
    order = np.lexsort((wpos, tid_all))  # tile-major, w-ascending
    tids = tid_all[order]
    (pu, pv, pw), utid, idx, pmask, _ = _pad_tiles(
        order, tids, [ugf, vgf, wpos], C)
    nent = utid.size

    ty = utid % nty
    tx = utid // nty
    h = k // 2
    pu_loc = np.mod(pu, Nx) - (tx * txs)[:, None] + h
    pv_loc = np.mod(pv, Ny) - (ty * tys)[:, None] + h
    pu_loc = np.where(pu_loc < 0, pu_loc + Nx, pu_loc)
    pu_loc = np.where(pu_loc > txs + k, pu_loc - Nx, pu_loc)
    pv_loc = np.where(pv_loc < 0, pv_loc + Ny, pv_loc)
    pv_loc = np.where(pv_loc > tys + k, pv_loc - Ny, pv_loc)

    sx = np.mod(tx * txs - h, Nx)
    sy = np.mod(ty * tys - h, Ny)
    ax, ay = (sx // 8) * 8, (sy // 128) * 128
    pos = np.zeros((nent + 1, 8, C), np.float64)
    pos[:nent, 0] = pu_loc
    pos[:nent, 1] = pv_loc
    pos[:nent, 2] = pw
    pos[:nent, 3] = pu_loc + (sx - ax)[:, None]
    pos[:nent, 4] = pv_loc + (sy - ay)[:, None]
    pos[:nent, 5] = ax[:, None]
    pos[:nent, 6] = ay[:, None]
    # null entry: identically-zero ES factors at every consumer
    pos[nent, 0:2] = -2.0 * k
    pos[nent, 3:5] = -2.0 * k

    gidx = np.zeros((nent + 1, C), np.int64)
    gidx[:nent] = idx
    gpm = np.zeros((nent + 1, C), bool)
    gpm[:nent] = pmask

    # per-entry w-tap support [pmin, pmax] (inclusive; ES support is
    # |p - wf| <= k/2 inclusive — _es is nonzero at |x| == 1)
    wmin = np.where(pmask, pw, np.inf).min(axis=1)
    wmax = np.where(pmask, pw, -np.inf).max(axis=1)
    pmin = np.maximum(np.ceil(wmin - k / 2.0), 0).astype(np.int64)
    pmax = np.minimum(np.floor(wmax + k / 2.0), nw - 1).astype(
        np.int64)
    sxy = (ax // 8) * 512 + (ay // 128)
    return pos, gidx, gpm, utid, pmin, pmax, sxy


def _block_maps(utid, pmin, pmax, sxy_g, nblocks, B, ntx, nty, txs,
                tys, k, G, shapes_to=None):
    """Per-block entry maps and compact-tile slot layouts (numpy).

    For each block: ``gmap`` (entry ids into the global stream, NULL-
    padded), ``tp`` ((compact tile slot << 1) | live), ``sxy`` degrid
    window starts, ``ltid``/``lflag`` fold slot -> tile id. Compact
    slots are colour-major with every colour run padded to a multiple
    of G so the batched DMA fold's G-windows-per-step batches never
    mix colours (same-colour windows are provably disjoint,
    pgridder._fold_geom)."""
    NEg = utid.size
    Thx, Thy = txs + k, tys + k
    _, _, Sx, Sy = _fold_geom(Thx, Thy, txs, tys)

    emaps, tps, sxys, ltids, lflags = [], [], [], [], []
    for b in range(nblocks):
        lo, hi = b * B, b * B + B - 1
        eb = np.flatnonzero((pmin <= hi) & (pmax >= lo))
        tb = utid[eb]
        ut, inv = np.unique(tb, return_inverse=True)
        col = (ut // nty % Sx) * Sy + (ut % nty) % Sy
        order2 = np.lexsort((ut, col))
        cs = col[order2]
        if ut.size:
            starts = np.flatnonzero(np.r_[True, cs[1:] != cs[:-1]])
            lens = np.diff(np.r_[starts, cs.size])
            pads = (-lens) % G
            offs = np.cumsum(np.r_[0, (lens + pads)[:-1]])
            within = np.arange(cs.size) - np.repeat(starts, lens)
            slot_sorted = np.repeat(offs, lens) + within
            NTb = int((lens + pads).sum())
            rank = np.empty(ut.size, np.int64)
            rank[order2] = slot_sorted
            ltid_b = np.zeros(NTb, np.int64)
            lflag_b = np.zeros(NTb, np.int64)
            ltid_b[slot_sorted] = ut[order2]
            lflag_b[slot_sorted] = 1
            ctid = rank[inv]
        else:
            NTb = 0
            ltid_b = np.zeros(0, np.int64)
            lflag_b = np.zeros(0, np.int64)
            ctid = np.zeros(0, np.int64)
        emaps.append(eb)
        tps.append(ctid * 2 + 1)
        sxys.append(sxy_g[eb])
        ltids.append(ltid_b)
        lflags.append(lflag_b)

    NEb = max(max((e.size for e in emaps), default=1), 1)
    NT = max(max((t.size for t in ltids), default=G), G)
    NT = -(-NT // G) * G
    if shapes_to is not None:
        if shapes_to.get("NEb", 0) < NEb or shapes_to.get("NT", 0) < NT:
            raise ValueError(f"shapes_to too small: need NEb>={NEb} "
                             f"NT>={NT}, got {shapes_to}")
        NEb = int(shapes_to["NEb"])
        NT = int(shapes_to["NT"])

    gmap = np.full((nblocks, NEb), NEg, np.int64)  # null entry
    tp = np.zeros((nblocks, NEb), np.int64)
    sxy = np.zeros((nblocks, NEb), np.int64)
    ltid = np.zeros((nblocks, NT), np.int64)
    lflag = np.zeros((nblocks, NT), np.int64)
    blive = np.zeros(nblocks, bool)
    nelive = np.zeros(nblocks, np.int64)
    for b in range(nblocks):
        ne = emaps[b].size
        gmap[b, :ne] = emaps[b]
        tp[b, :ne] = tps[b]
        sxy[b, :ne] = sxys[b]
        if ne:  # pad slots revisit the last live entry's out block
            tp[b, ne:] = (tps[b][-1] // 2) * 2
        nt = ltids[b].size
        ltid[b, :nt] = ltids[b]
        lflag[b, :nt] = lflags[b]
        blive[b] = ne > 0
        nelive[b] = ne
    return gmap, tp, sxy, ltid, lflag, blive, nelive, NEb, NT


def pgrid_plan_wblocked(uvw, freq, *, nx, ny, cellx, celly,
                        epsilon=1e-7, sigma=2.0, capacity=None,
                        x0=0.0, y0=0.0, plane_block=8, dtype=None,
                        w_params=None, shapes_to=None, tile_u=None,
                        tile_v=None):
    """W-plane-BLOCKED global-stream plan: grid memory is bounded at
    O(plane_block x padded grid) like the round-4 design (the
    all-planes layout exceeds v5e HBM at 4096^2), but the entry stream
    is global and per-block work is pure kernel time (see module
    docstring). ``w_params``/``shapes_to`` override geometry/shapes so
    plan sets for different datasets share one compiled program."""
    k, beta = kernel_params(epsilon)
    Nx, Ny = _grid_setup(nx, ny, cellx, celly, sigma)
    uvw_np = np.asarray(uvw)
    freq_np = np.asarray(freq)
    nrow, nchan = uvw_np.shape[0], freq_np.shape[0]
    if w_params is not None:
        nw, w0, dw = w_params
    else:
        nw, w0, dw = w_geometry(uvw_np, freq_np, nx, ny, cellx, celly,
                                x0, y0, sigma, k, True)
    if capacity is None:
        # wide entries amortise the per-step kernel overhead when
        # tiles hold many visibilities: C=256 measured 596 vs 622 ms
        # on the 4096^2 w-ON bench adjoint (round-5 A/B); small
        # problems keep C=128 (less padding waste)
        capacity = 256 if nrow * nchan >= (1 << 22) else 128
    if tile_u is None and tile_v is None and \
            nrow * nchan >= (1 << 18):
        tile_u, tile_v = _auto_tiles(uvw_np, freq_np, Nx, Ny, cellx,
                                     celly, k, capacity)
    txs, tys = _tile_geometry(Nx, Ny, k, tile_u, tile_v)
    ntx = -(-Nx // txs)
    nty = -(-Ny // tys)
    C = capacity
    if dtype is None:
        dtype = jnp.zeros(0).dtype
    # plane_block is the caller's grid-memory bound (planes per
    # block). Shrink B to the actual plane count (narrow w
    # distributions fold into one block — each block pays full-grid
    # FFT passes regardless of its entry count) and even the blocks
    # out (same block count, fewer padded planes, never exceeding the
    # caller's bound): nw=11 at plane_block=8 -> two blocks of 6
    # instead of 8+3.
    B = min(int(plane_block), nw)
    nblocks = max(1, -(-nw // B))
    B = -(-nw // nblocks)
    if shapes_to is not None and "nblocks" in shapes_to:
        assert shapes_to["nblocks"] >= nblocks
        nblocks = int(shapes_to["nblocks"])

    pos, gidx, gpm, utid, pmin, pmax, sxy_g = _pg_plan_gs(
        uvw_np, freq_np, Nx, Ny, cellx, celly, txs, tys, ntx, nty,
        w0, dw, nw, C, k)
    NEg = utid.size
    if shapes_to is not None and "NEg" in shapes_to:
        assert shapes_to["NEg"] >= NEg, (shapes_to, NEg)
        NEg_to = int(shapes_to["NEg"])
        if NEg_to > NEg:
            # grow with extra null rows (the real null stays last so
            # existing maps stay valid; pads map to index NEg_to)
            pad = NEg_to - NEg
            pos = np.concatenate([pos[:NEg],
                                  np.repeat(pos[NEg:], pad + 1, 0)])
            gidx = np.concatenate([gidx[:NEg],
                                   np.zeros((pad + 1, C), np.int64)])
            gpm = np.concatenate([gpm[:NEg],
                                  np.zeros((pad + 1, C), bool)])
            NEg = NEg_to

    gmap, tp, sxy, ltid, lflag, blive, nelive, NEb, NT = _block_maps(
        utid, pmin, pmax, sxy_g, nblocks, B, ntx, nty, txs, tys, k,
        FOLD_G, shapes_to)
    gmap = np.where(gmap == utid.size, NEg, gmap)  # repoint at null

    w0s = w0 + np.arange(nblocks) * B * dw
    woff = (np.arange(nblocks) * B).astype(np.int32)[:, None]
    # epsilon-aware cfft stage precision: split-f32 (three bf16 MXU
    # passes vs HIGHEST's six, ops/pallas_cfft.py:_dot_split3) when
    # the requested gridding accuracy tolerates its ~1e-5 stage error
    cfft_prec = "split" if epsilon >= 1e-5 else None
    p0 = dict(k=k, beta=float(beta), Nx=Nx, Ny=Ny, ntx=ntx, nty=nty,
              txs=txs, tys=tys, C=C, nx=nx, ny=ny, cellx=cellx,
              celly=celly, x0=x0, y0=y0, rdtype=dtype, nw=B,
              w0=float(w0), dw=float(dw), nentries=NEg,
              nrow=nrow, nchan=nchan, cfft_prec=cfft_prec)
    return dict(
        p0=p0, B=B, nblocks=nblocks, nw=nw, w0=float(w0),
        dw=float(dw), nrow=nrow, nchan=nchan, NEg=NEg, NEb=NEb,
        NT=NT, G=FOLD_G,
        pos=jnp.asarray(pos.astype(dtype)),
        gidx=jnp.asarray(gidx.astype(np.int32)),
        gpm=jnp.asarray(gpm.astype(dtype)),
        gmap=jnp.asarray(gmap.astype(np.int32)),
        tp=jnp.asarray(tp.astype(np.int32)),
        sxy=jnp.asarray(sxy.astype(np.int32)),
        ltid=jnp.asarray(ltid.astype(np.int32)),
        lflag=jnp.asarray(lflag.astype(np.int32)),
        blive=jnp.asarray(blive),
        nelive=jnp.asarray(nelive.astype(np.int32)),
        woff=jnp.asarray(woff),
        w0s=jnp.asarray(w0s.astype(dtype)),
        uvw_full=jnp.asarray(uvw_np.astype(dtype)),
        freq_d=jnp.asarray(freq_np.astype(dtype)))


# ------------------------------------------------------------ kernels

def _grid_kernel_gs(tp_ref, gmap_ref, woff_ref, pk_ref, vis_ref,
                    out_ref, *, k, beta, nw, Thx, Thy, C, prec):
    """Spread kernel over a block's entry-map view of the global
    stream. Identical math to pgridder._grid_kernel; the w coordinate
    is absolute and the block's plane offset is the single prefetched
    integer ``woff``."""
    e = pl.program_id(0)
    ep = jnp.maximum(e - 1, 0)
    first = jnp.logical_or(e == 0,
                           (tp_ref[e] >> 1) != (tp_ref[ep] >> 1))
    dt = out_ref.dtype
    kh = k / 2.0
    u = pk_ref[0, 0, :]
    v = pk_ref[0, 1, :]
    wf = pk_ref[0, 2, :] - woff_ref[0].astype(dt)
    xs = lax.broadcasted_iota(jnp.int32, (Thx, C), 0).astype(dt)
    CUT = _es((xs - u[None, :]) / kh, beta, k)
    ys = lax.broadcasted_iota(jnp.int32, (C, Thy), 1).astype(dt)
    CV = _es((ys - v[:, None]) / kh, beta, k)
    ps = lax.broadcasted_iota(jnp.int32, (nw, C), 0).astype(dt)
    CW = _es((ps - wf[None, :]) / kh, beta, k)

    A = (CW[:, None, :] * CUT[None, :, :]).reshape(nw * Thx, C)
    vr = vis_ref[0, 0, :]
    vi = vis_ref[0, 1, :]
    CVv = jnp.concatenate([CV * vr[:, None], CV * vi[:, None]],
                          axis=1)
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


def _grid_pallas_gs(tp, gmap, woff, pos_g, vispack_g, beta, k, nw, NT,
                    Thx, Thy, C, interpret=False,
                    precision=lax.Precision.HIGHEST):
    dt = vispack_g.dtype
    kern = partial(_grid_kernel_gs, k=k, beta=beta, nw=nw, Thx=Thx,
                   Thy=Thy, C=C, prec=precision)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(tp.shape[0],),
        in_specs=[pl.BlockSpec((1, 8, C),
                               lambda e, tp_, gm_, wo_: (gm_[e], 0, 0)),
                  pl.BlockSpec((1, 2, C),
                               lambda e, tp_, gm_, wo_: (gm_[e], 0,
                                                         0))],
        out_specs=pl.BlockSpec(
            (2, nw, 1, Thx, Thy),
            lambda e, tp_, gm_, wo_: (0, 0, tp_[e] // 2, 0, 0)),
    )
    kw = dict(interpret=interpret)
    if not interpret:
        kw["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    return pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((2, nw, NT, Thx, Thy), dt),
        **kw)(tp, gmap, woff, pos_g, vispack_g)


def _fold_kernel_batched(xs_ref, ys_ref, y_ref, bin_ref, bout_ref,
                         win_ref, sem_ref, *, Thx, Thy, EX, EY, nw2,
                         G):
    """DMA read-modify-write fold, G same-colour windows per grid
    step: all G reads are issued before any wait, so the ~2 us DMA
    round-trip latencies overlap instead of serialising per tile
    (6.7 us/tile measured for the one-at-a-time fold at the 4096^2
    bench). Same-colour windows are pairwise disjoint (plan pads
    colour runs to G) and every write completes before the step ends,
    so cross-colour overlap never happens."""
    del bin_ref  # aliased with bout_ref; all access goes through out
    e = pl.program_id(0)

    def rd(j):
        ax = (xs_ref[e * G + j] // 8) * 8
        ay = (ys_ref[e * G + j] // 128) * 128
        return pltpu.make_async_copy(
            bout_ref.at[:, pl.ds(ax, EX), pl.ds(ay, EY)],
            win_ref.at[j], sem_ref.at[j])

    def wr(j):
        ax = (xs_ref[e * G + j] // 8) * 8
        ay = (ys_ref[e * G + j] // 128) * 128
        return pltpu.make_async_copy(
            win_ref.at[j],
            bout_ref.at[:, pl.ds(ax, EX), pl.ds(ay, EY)],
            sem_ref.at[G + j])

    for j in range(G):
        @pl.when(xs_ref[e * G + j] >= 0)
        def _(j=j):
            rd(j).start()

    for j in range(G):
        @pl.when(xs_ref[e * G + j] >= 0)
        def _(j=j):
            rd(j).wait()
            blk = y_ref[:, j]
            st = jnp.pad(blk, ((0, 0), (0, EX - Thx),
                               (0, EY - Thy)))
            ax = (xs_ref[e * G + j] // 8) * 8
            ay = (ys_ref[e * G + j] // 128) * 128
            st = _droll(st, xs_ref[e * G + j] - ax, 1)
            st = _droll(st, ys_ref[e * G + j] - ay, 2)
            win_ref[j] = win_ref[j] + st
            wr(j).start()

    for j in range(G):
        @pl.when(xs_ref[e * G + j] >= 0)
        def _(j=j):
            wr(j).wait()


def _fold_finish(ext, Nx, Ny):
    """Wrap the extended margins back mod (Nx, Ny); static loop so
    tiny grids can wrap more than once."""
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

    return wrap(wrap(ext, Nx, 1), Ny, 2)


def _fold_pallas_gs(Yc, ltid, lflag, *, ntx, nty, txs, tys, k, Nx, Ny,
                    nw, G, interpret=False):
    """Batched compact-slot fold -> the (2nw, Nx, Ny) periodic grids.

    Origins are UNSHIFTED (the -k/2 half-kernel shift is a final
    roll): the same-colour disjointness proof (_fold_geom) holds for
    origins on the regular tile lattice, but NOT for mod-Nx-wrapped
    shifted origins — the tx==0 windows wrap to the far end of the
    extended buffer and can overlap a same-colour window mid-batch
    (lost-update bug caught by tests on small grids; same reason the
    round-4 pipelined fold used unshifted origins)."""
    nw2, NT, Thx, Thy = Yc.shape
    EX, EY, _, _ = _fold_geom(Thx, Thy, txs, tys)
    h = k // 2
    xs = jnp.where(lflag > 0, (ltid // nty) * txs,
                   -1).astype(jnp.int32)
    ys = jnp.where(lflag > 0, (ltid % nty) * tys,
                   0).astype(jnp.int32)
    MxE = ((ntx - 1) * txs // 8) * 8 + EX
    MyE = ((nty - 1) * tys // 128) * 128 + EY
    kern = partial(_fold_kernel_batched, Thx=Thx, Thy=Thy, EX=EX,
                   EY=EY, nw2=nw2, G=G)
    buf0 = jnp.zeros((nw2, MxE, MyE), Yc.dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(NT // G,),
        in_specs=[pl.BlockSpec((nw2, G, Thx, Thy),
                               lambda e, *_: (0, e, 0, 0)),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.VMEM((G, nw2, EX, EY), Yc.dtype),
                        pltpu.SemaphoreType.DMA((2 * G,))],
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
    return jnp.roll(_fold_finish(ext, Nx, Ny), (-h, -h),
                    axis=(-2, -1))


def _degrid_kernel_gs(tp_ref, gmap_ref, woff_ref, sxy_ref, pk_ref,
                      gr_ref, gi_ref, acc_ref, out_ref, win_ref,
                      sem_ref, *, k, beta, nw, ThxA, ThyA, C, prec):
    """Gather twin over a block's entry-map view: the tile's halo'd
    window is DMA'd when the compact tile id changes; results
    ACCUMULATE into the global per-entry visibility buffer (``acc``
    aliased to the output, so entries the block does not visit keep
    their value and the final scatter-back runs once, after the block
    scan)."""
    e = pl.program_id(0)
    ep = jnp.maximum(e - 1, 0)
    changed = jnp.logical_or(e == 0,
                             (tp_ref[e] >> 1) != (tp_ref[ep] >> 1))
    live = (tp_ref[e] & 1) != 0

    @pl.when(jnp.logical_and(changed, live))
    def _():
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
        out_ref[...] = acc_ref[...]

    @pl.when(live)
    def _():
        dt = out_ref.dtype
        kh = k / 2.0
        u = pk_ref[0, 3, :]
        v = pk_ref[0, 4, :]
        wf = pk_ref[0, 2, :] - woff_ref[0].astype(dt)
        xs = lax.broadcasted_iota(jnp.int32, (ThxA, C), 0).astype(dt)
        CUT = _es((xs - u[None, :]) / kh, beta, k)
        ys = lax.broadcasted_iota(jnp.int32, (ThyA, C), 0).astype(dt)
        CVT = _es((ys - v[None, :]) / kh, beta, k)
        ps = lax.broadcasted_iota(jnp.int32, (nw, C), 0).astype(dt)
        CW = _es((ps - wf[None, :]) / kh, beta, k)
        A = (CW[:, None, :] * CUT[None, :, :]).reshape(nw * ThxA, C)
        Bb = win_ref[...].reshape(2 * nw * ThxA, ThyA)
        D = lax.dot_general(Bb, CVT, (((1,), (0,)), ((), ())),
                            precision=prec,
                            preferred_element_type=dt)
        D = D.reshape(2, nw * ThxA, C)
        out_ref[0, 0, :] = acc_ref[0, 0, :] + jnp.sum(A * D[0],
                                                      axis=0)
        out_ref[0, 1, :] = acc_ref[0, 1, :] + jnp.sum(A * D[1],
                                                      axis=0)


def _degrid_pallas_gs(tp, gmap, woff, sxy, pos_g, gr_pad, gi_pad, acc,
                      beta, k, nw, ThxA, ThyA, C, interpret=False,
                      precision=lax.Precision.HIGHEST):
    dt = gr_pad.dtype
    kern = partial(_degrid_kernel_gs, k=k, beta=beta, nw=nw,
                   ThxA=ThxA, ThyA=ThyA, C=C, prec=precision)
    gm = lambda e, tp_, gm_, wo_, sx_: (gm_[e], 0, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(tp.shape[0],),
        in_specs=[
            pl.BlockSpec((1, 8, C), gm),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 2, C), gm),
        ],
        out_specs=pl.BlockSpec((1, 2, C), gm),
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
        out_shape=jax.ShapeDtypeStruct(acc.shape, dt),
        input_output_aliases={7: 0},
        **kw)(tp, gmap, woff, sxy, pos_g, gr_pad, gi_pad, acc)


# -------------------------------------------------------------- impls

_WBLK_AKEYS = ("pos", "gidx", "gpm", "gmap", "tp", "sxy", "ltid",
               "lflag", "blive", "nelive", "woff", "w0s", "uvw_full",
               "freq_d")
# stacked plans carry the per-dataset weights alongside
_WBLK_STACK_KEYS = _WBLK_AKEYS + ("wgt",)


def _bucket_sizes(NEb):
    """Kernel-grid size ladder NEb/8, NEb/4, NEb/2, NEb: per-block
    entry counts vary ~25x between edge and centre w blocks (the w
    distribution concentrates in the middle planes), but lax.scan
    forces one static stream length — truncating to the smallest
    bucket that holds the block's LIVE prefix skips the dead padded
    steps (~90 ms of ~0.6 us no-op kernel steps per adjoint at the 1M
    -row bench)."""
    out = sorted({max(1, -(-NEb // 8)), max(1, -(-NEb // 4)),
                  max(1, -(-NEb // 2)), NEb})
    return out


def _bucket_cond(nel, sizes, maker):
    """Nested lax.cond picking the smallest bucket >= nel (live
    entries are always the prefix of the stream, so truncation only
    drops no-op pad slots)."""
    def build(i):
        if i == len(sizes) - 1:
            return lambda _: maker(sizes[i])
        return lambda _: lax.cond(nel <= sizes[i],
                                  lambda __: maker(sizes[i]),
                                  build(i + 1), None)

    return build(0)(None)


def _weighted_vispack(bp, vr, vi, wflat):
    """Weight + centre-shift the components and gather them into the
    global packed stream — ONCE per call (the round-4 design paid
    this per block)."""
    p0 = bp["p0"]
    rdt = p0["rdtype"]
    vr = vr.astype(rdt)
    vi = vi.astype(rdt)
    if p0["x0"] or p0["y0"]:
        cs, sn = _shift_phases(bp["uvw_full"], bp["freq_d"],
                               p0["x0"], p0["y0"])
        vr, vi = vr * cs - vi * sn, vr * sn + vi * cs
    if wflat is not None:
        vr = vr * wflat
        vi = vi * wflat
    vrf, vif = vr.reshape(-1), vi.reshape(-1)
    gidx, gpm = bp["gidx"], bp["gpm"]
    return jnp.stack([vrf[gidx] * gpm, vif[gidx] * gpm], axis=1)


def _adjoint_wblocked_impl(bp, vr, vi, wflat, interpret):
    """Blocked adjoint: one global gather, then a scan over plane
    blocks (spread via entry map -> batched fold -> block FFTs)."""
    p0 = bp["p0"]
    B = bp["B"]
    dw = float(bp["dw"])
    rdt = p0["rdtype"]
    k, C = p0["k"], p0["C"]
    txs, tys = p0["txs"], p0["tys"]
    Thx, Thy = txs + k, tys + k
    NT = bp["NT"]
    vispack = _weighted_vispack(bp, vr, vi, wflat)
    gic = gi_consts(p0["nx"], p0["ny"], p0["cellx"], p0["celly"], k,
                    p0["beta"], p0["Nx"], p0["Ny"], True, dw,
                    p0["x0"], p0["y0"], rdtype=rdt)

    def live_step(args):
        tp, gmap, woff, ltid, lflag, w0b, nel = args
        Yc = _bucket_cond(
            nel, _bucket_sizes(tp.shape[0]),
            lambda n: _grid_pallas_gs(tp[:n], gmap[:n], woff,
                                      bp["pos"], vispack, p0["beta"],
                                      k, B, NT, Thx, Thy, C,
                                      interpret=interpret))
        folded = _fold_pallas_gs(
            Yc.reshape(2 * B, NT, Thx, Thy), ltid, lflag,
            ntx=p0["ntx"], nty=p0["nty"], txs=txs, tys=tys, k=k,
            Nx=p0["Nx"], Ny=p0["Ny"], nw=B, G=bp["G"],
            interpret=interpret)
        return _grid_to_image(folded[:B], folded[B:], p0["nx"],
                              p0["ny"], p0["cellx"], p0["celly"], k,
                              p0["beta"], p0["Nx"], p0["Ny"], True, B,
                              w0b, dw, False, p0["x0"], p0["y0"],
                              consts=gic,
                              cfft_precision=p0.get("cfft_prec"))

    def step(acc, args):
        lb = args[-1]
        img = lax.cond(
            lb, live_step,
            lambda a: jnp.zeros((p0["nx"], p0["ny"]), rdt), args[:-1])
        return acc + img, None

    xs = (bp["tp"], bp["gmap"], bp["woff"], bp["ltid"], bp["lflag"],
          bp["w0s"], bp["nelive"], bp["blive"])
    img0 = jnp.zeros((p0["nx"], p0["ny"]), rdt)
    img, _ = lax.scan(step, img0, xs)
    return img


def _forward_wblocked_impl(bp, image, interpret):
    """Blocked forward: scan over plane blocks accumulating per-entry
    visibilities in the global stream buffer; ONE scatter back to
    (nrow, nchan) at the end (the round-4 design scattered per
    block)."""
    p0 = bp["p0"]
    B = bp["B"]
    dw = float(bp["dw"])
    k, C = p0["k"], p0["C"]
    kh = k / 2.0
    del kh
    rdt = p0["rdtype"]
    Nx, Ny = p0["Nx"], p0["Ny"]
    txs, tys = p0["txs"], p0["tys"]
    Thx, Thy = txs + k, tys + k
    ThxA = -(-(Thx + 7) // 8) * 8
    ThyA = -(-(Thy + 127) // 128) * 128
    nrow, nchan = bp["nrow"], bp["nchan"]
    image = image.astype(rdt)
    gic = gi_consts(p0["nx"], p0["ny"], p0["cellx"], p0["celly"], k,
                    p0["beta"], Nx, Ny, True, dw, p0["x0"], p0["y0"],
                    rdtype=rdt)

    def live_step(acc, args):
        tp, gmap, woff, sxy, w0b, nel = args
        gr, gi = _image_to_grid(image, p0["nx"], p0["ny"],
                                p0["cellx"], p0["celly"], k,
                                p0["beta"], Nx, Ny, True, B, w0b, dw,
                                False, p0["x0"], p0["y0"], split=True,
                                consts=gic,
                                cfft_precision=p0.get("cfft_prec"))
        ger = jnp.pad(gr, ((0, 0), (0, ThxA), (0, ThyA)),
                      mode="wrap")
        gei = jnp.pad(gi, ((0, 0), (0, ThxA), (0, ThyA)),
                      mode="wrap")
        return _bucket_cond(
            nel, _bucket_sizes(tp.shape[0]),
            lambda n: _degrid_pallas_gs(tp[:n], gmap[:n], woff,
                                        sxy[:n], bp["pos"], ger, gei,
                                        acc, p0["beta"], k, B, ThxA,
                                        ThyA, C, interpret=interpret))

    def step(acc, args):
        lb = args[-1]
        acc = lax.cond(lb, live_step, lambda a, _: a, acc, args[:-1])
        return acc, None

    acc0 = jnp.zeros((bp["NEg"] + 1, 2, C), rdt)
    xs = (bp["tp"], bp["gmap"], bp["woff"], bp["sxy"], bp["w0s"],
          bp["nelive"], bp["blive"])
    acc, _ = lax.scan(step, acc0, xs)

    nvis = nrow * nchan
    gidx, gpm = bp["gidx"], bp["gpm"]
    fr = jnp.zeros((nvis,), rdt).at[gidx.reshape(-1)].add(
        (acc[:, 0, :] * gpm).reshape(-1))
    fi = jnp.zeros((nvis,), rdt).at[gidx.reshape(-1)].add(
        (acc[:, 1, :] * gpm).reshape(-1))
    fr = fr.reshape(nrow, nchan)
    fi = fi.reshape(nrow, nchan)
    if p0["x0"] or p0["y0"]:
        cs, sn = _shift_phases(bp["uvw_full"], bp["freq_d"],
                               p0["x0"], p0["y0"])
        fr, fi = fr * cs + fi * sn, fi * cs - fr * sn
    return fr, fi


def make_adjoint_pg_wblocked(bp, wgt=None, mask=None):
    """Jitted blocked adjoint with the plan arrays as jit ARGUMENTS
    (closed-over device arrays bake as HLO constants and blow the
    remote-compile payload at production sizes)."""
    p0 = bp["p0"]
    rdt = p0["rdtype"]
    w = None
    if wgt is not None:
        w = jnp.asarray(np.asarray(wgt).astype(rdt))
    if mask is not None:
        m = jnp.asarray(np.asarray(mask).astype(rdt))
        w = m if w is None else w * m
    interpret = jax.default_backend() != "tpu"
    arrs = {key: bp[key] for key in _WBLK_AKEYS}
    meta = {key: v for key, v in bp.items() if key not in _WBLK_AKEYS}

    @jax.jit
    def adj_j(vr, vi, w, arrs):
        bpx = dict(meta, **arrs)
        return _adjoint_wblocked_impl(bpx, vr, vi, w, interpret)

    def adjoint(vr, vi):
        return adj_j(vr.astype(rdt), vi.astype(rdt), w, arrs)

    return adjoint


def make_hessian_pg_wblocked(bp, wgt=None, mask=None):
    """Device-resident R.H W R through the global-stream w-blocked
    plan: one jitted program (two block scans), grid memory bounded at
    O(plane_block x padded grid)."""
    p0 = bp["p0"]
    rdt = p0["rdtype"]
    w = None
    if wgt is not None:
        w = jnp.asarray(np.asarray(wgt).astype(rdt))
    if mask is not None:
        m = jnp.asarray(np.asarray(mask).astype(rdt))
        w = m if w is None else w * m
    interpret = jax.default_backend() != "tpu"
    arrs = {key: bp[key] for key in _WBLK_AKEYS}
    meta = {key: v for key, v in bp.items() if key not in _WBLK_AKEYS}

    @jax.jit
    def matvec_j(x, w, arrs):
        bpx = dict(meta, **arrs)
        fr, fi = _forward_wblocked_impl(bpx, x, interpret)
        return _adjoint_wblocked_impl(bpx, fr, fi, w, interpret)

    def matvec(x):
        return matvec_j(x.astype(rdt), w, arrs)

    return matvec


# ------------------------------------------------------------ stacked

def stack_pg_plans_wblocked(dds, nband, *, nx, ny, epsilon=1e-7,
                            plane_block=8, use_beam=True,
                            mask_image=None, capacity=None):
    """Stacked (nband, ndata, ...) global-stream w-blocked plans with
    one shared static geometry (union w grid, common NEg/NEb/NT/block
    count), so the dataset-reduced Hessian runs as a single compiled
    program — the stacked twin of :func:`pgrid_plan_wblocked` for the
    distributed exact residual at 4096^2+ with w-gridding ON."""
    from pfb_tpu.ops.gridder import row_bucket
    from pfb_tpu.ops.pgridder import w_geometry_union

    by_band = [[] for _ in range(nband)]
    for ds in dds:
        by_band[ds["bandid"]].append(ds)
    ndata = max(len(g) for g in by_band)
    R = row_bucket(max(ds["UVW"].shape[0] for ds in dds))
    nchan = max(ds["FREQ"].shape[0] for ds in dds)
    if capacity is None:
        # one capacity for the whole stack (per-dataset auto-selection
        # would desync the stacked plan shapes), from the padded size
        capacity = 256 if R * nchan >= (1 << 22) else 128
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
        x0, y0, 2.0, k, True)

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

    all_uvw = np.concatenate([np.asarray(ds["UVW"]) for ds in dds])
    if all_uvw.shape[0] * nchan >= (1 << 18):
        Nx_, Ny_ = _grid_setup(nx, ny, cell, cell, 2.0)
        tu, tv = _auto_tiles(all_uvw, np.asarray(dds[0]["FREQ"]),
                             Nx_, Ny_, cell, cell, k, capacity)
    else:
        tu = tv = None

    def build(u, f, shapes_to=None):
        return pgrid_plan_wblocked(
            u, f, nx=nx, ny=ny, cellx=cell, celly=cell,
            epsilon=epsilon, plane_block=plane_block,
            capacity=capacity, x0=x0, y0=y0, w_params=wp,
            shapes_to=shapes_to, tile_u=tu, tile_v=tv)

    bps = [[build(u, f) for (u, f, _) in row_] for row_ in padded]
    shapes = dict(
        NEg=max(bp["NEg"] for row_ in bps for bp in row_),
        NEb=max(bp["NEb"] for row_ in bps for bp in row_),
        NT=max(bp["NT"] for row_ in bps for bp in row_),
        nblocks=max(bp["nblocks"] for row_ in bps for bp in row_))
    for b in range(nband):
        for d in range(ndata):
            bp = bps[b][d]
            if (bp["NEg"] != shapes["NEg"] or bp["NEb"] != shapes["NEb"]
                    or bp["NT"] != shapes["NT"]
                    or bp["nblocks"] != shapes["nblocks"]):
                u, f, _ = padded[b][d]
                bps[b][d] = build(u, f, shapes_to=shapes)

    bp0 = bps[0][0]
    p0 = bp0["p0"]
    rdt = p0["rdtype"]

    def stk(key):
        return jnp.stack([jnp.stack([bps[b][d][key]
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
    meta = {key: v for key, v in bp0.items() if key not in _WBLK_AKEYS}
    arrs = {key: stk(key) for key in _WBLK_AKEYS}
    arrs["wgt"] = wgt
    return dict(meta=meta, arrs=arrs, beam=beam, ndata=ndata, R=R,
                nchan=nchan, p0=p0)


def _hessian_pg_cube_local_wblocked(x, arrs, beam, meta, interpret):
    """Dataset-reduced R.H W R over stacked global-stream plans as one
    lax.scan over the flattened (band, dataset) axis."""
    pos = arrs[0]
    nb, ndata = pos.shape[:2]

    def flat(a):
        return a.reshape((nb * ndata,) + a.shape[2:])

    bid = jnp.repeat(jnp.arange(nb, dtype=jnp.int32), ndata)
    keys = _WBLK_STACK_KEYS

    def one(acc, args):
        b = args[0]
        named = dict(zip(keys, args[1:1 + len(keys)]))
        wgt_d = named.pop("wgt")
        bm = args[-1] if beam is not None else None
        bp = dict(meta, **named)
        x_b = lax.dynamic_index_in_dim(x, b, keepdims=False)
        xin = x_b * bm if bm is not None else x_b
        fr, fi = _forward_wblocked_impl(bp, xin, interpret)
        conv = _adjoint_wblocked_impl(bp, fr, fi, wgt_d, interpret)
        if bm is not None:
            conv = conv * bm
        acc = lax.dynamic_update_index_in_dim(
            acc, lax.dynamic_index_in_dim(acc, b, keepdims=False)
            + conv, b, 0)
        return acc, None

    xs = (bid,) + tuple(flat(arrs[i]) for i in range(len(keys)))
    if beam is not None:
        xs = xs + (flat(beam),)
    out, _ = lax.scan(one, jnp.zeros_like(x), xs)
    return out
