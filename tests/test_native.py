"""Native (C++) plan builder == numpy planner, bit for bit."""

import numpy as np
import pytest


def _geometry(nrow, nchan, nx, seed):
    rng = np.random.default_rng(seed)
    uvw = rng.normal(scale=nx, size=(nrow, 3))
    uvw[:, 2] *= 0.1
    freq = np.linspace(0.9e9, 1.1e9, nchan)
    umax = np.abs(uvw[:, :2]).max() * freq[-1] / 299792458.0
    cell = 1.0 / (2 * umax * 2.0)
    return uvw, freq, cell


@pytest.mark.parametrize("nrow,nchan,nx,do_w",
                         [(2000, 3, 128, True),
                          (5000, 2, 300, True),   # non-128-aligned
                          (3000, 1, 64, False)])  # nw == 1
def test_pg_plan_native_matches_numpy(nrow, nchan, nx, do_w):
    from pfb_tpu.native import get_lib, pg_plan_native
    from pfb_tpu.ops.mmgridder import _tile_geometry
    from pfb_tpu.ops.pgridder import _pg_plan_numpy, w_geometry
    from pfb_tpu.ops.wgridder import _grid_setup, kernel_params

    if get_lib() is None:
        pytest.skip("no C++ toolchain")
    uvw, freq, cell = _geometry(nrow, nchan, nx, seed=nx)
    k, _ = kernel_params(1e-5)
    Nx, Ny = _grid_setup(nx, nx, cell, cell, 2.0)
    nw, w0, dw = w_geometry(uvw, freq, nx, nx, cell, cell, 0.0, 0.0,
                            2.0, k, do_w)
    txs, tys = _tile_geometry(Nx, Ny, k, None, None)
    ntx, nty = -(-Nx // txs), -(-Ny // tys)
    C = 64

    pos_n, tid_n, idx_n, pm_n, ne = _pg_plan_numpy(
        uvw, freq, Nx, Ny, cell, cell, txs, tys, ntx, nty, w0, dw,
        nw, C, k)
    pos_c, tid_c, idx_c, pm_c = pg_plan_native(
        uvw, freq, Nx=Nx, Ny=Ny, cellx=cell, celly=cell, txs=txs,
        tys=tys, ntx=ntx, nty=nty, w0=w0, dw=dw, nw=nw, C=C, k=k)
    assert tid_c.size == ne
    assert np.array_equal(tid_n.astype(np.int32), tid_c)
    assert np.array_equal(idx_n.astype(np.int32), idx_c)
    assert np.array_equal(pm_n.astype(np.float64), pm_c)
    assert np.array_equal(pos_n, pos_c)


def test_pgrid_plan_uses_native_and_fallback(monkeypatch):
    """pgrid_plan produces the same plan through the native path and
    the PFB_TPU_NO_NATIVE fallback."""
    import pfb_tpu.native as native
    from pfb_tpu.ops.pgridder import pgrid_plan

    uvw, freq, cell = _geometry(1500, 2, 128, seed=9)
    kw = dict(nx=128, ny=128, cellx=cell, celly=cell, epsilon=1e-5,
              do_wgridding=True)
    p1 = pgrid_plan(uvw, freq, **kw)
    monkeypatch.setattr(native, "pg_plan_native",
                        lambda *a, **k: None)
    p2 = pgrid_plan(uvw, freq, **kw)
    for key in ("pos", "tid", "idx", "pm"):
        assert np.array_equal(np.asarray(p1[key]), np.asarray(p2[key]))
    assert p1["nentries"] == p2["nentries"]


def test_gs_plan_native_bit_identical():
    """The native global-stream plan builder (pg_gs_count/pg_gs_fill)
    must reproduce the numpy lexsort path bit-for-bit (same contract
    as pg_plan_native for the unblocked planner)."""
    import numpy as np

    from pfb_tpu.native import get_lib, pg_gs_plan_native
    from pfb_tpu.ops import pg_stream as gs
    from pfb_tpu.ops.mmgridder import _tile_geometry
    from pfb_tpu.ops.pgridder import w_geometry
    from pfb_tpu.ops.wgridder import _grid_setup, kernel_params

    if get_lib() is None:
        import pytest
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(7)
    nrow, nchan, nx = 5000, 3, 256
    uvw = rng.normal(scale=100.0, size=(nrow, 3))
    uvw[:, 2] *= 0.15
    freq = np.linspace(0.9e9, 1.1e9, nchan)
    umax = np.abs(uvw[:, :2]).max() * freq[-1] / 299792458.0
    cell = 1.0 / (2.0 * umax * 2.0)
    k, _ = kernel_params(1e-5)
    Nx, Ny = _grid_setup(nx, nx, cell, cell, 2.0)
    nw, w0, dw = w_geometry(uvw, freq, nx, nx, cell, cell, 0, 0, 2.0,
                            k, True)
    txs, tys = _tile_geometry(Nx, Ny, k, None, None)
    ntx, nty = -(-Nx // txs), -(-Ny // tys)
    args = dict(Nx=Nx, Ny=Ny, cellx=cell, celly=cell, txs=txs,
                tys=tys, ntx=ntx, nty=nty, w0=w0, dw=dw, nw=nw,
                C=128, k=k)
    nat = pg_gs_plan_native(uvw, freq, **args)
    ref = gs._pg_plan_gs.__wrapped__(uvw, freq, Nx, Ny, cell, cell,
                                     txs, tys, ntx, nty, w0, dw, nw,
                                     128, k) \
        if hasattr(gs._pg_plan_gs, "__wrapped__") else None
    if ref is None:
        # call the numpy body by disabling the native fast path
        import pfb_tpu.native as N
        lib, tried = N._lib, N._lib_tried
        N._lib, N._lib_tried = None, True
        try:
            ref = gs._pg_plan_gs(uvw, freq, Nx, Ny, cell, cell, txs,
                                 tys, ntx, nty, w0, dw, nw, 128, k)
        finally:
            N._lib, N._lib_tried = lib, tried
    for name, a, b in zip(("pos", "gidx", "gpm", "utid", "pmin",
                           "pmax", "sxy"), nat, ref):
        assert np.array_equal(np.asarray(a, np.float64),
                              np.asarray(b, np.float64)), name
