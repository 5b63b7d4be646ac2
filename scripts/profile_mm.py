"""Stage-level timing of the mm gridder on TPU."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from bench_gridder import make_case  # noqa: E402  (same dir)


def t(fn, *a, **k):
    out = fn(*a, **k)
    leaves = jax.tree_util.tree_leaves(out)
    float(jnp.sum(jnp.abs(leaves[0][(0,) * (leaves[0].ndim - 1)][:4])))
    t0 = time.perf_counter()
    out = fn(*a, **k)
    leaves = jax.tree_util.tree_leaves(out)
    float(jnp.sum(jnp.abs(leaves[0][(0,) * (leaves[0].ndim - 1)][:4])))
    return time.perf_counter() - t0, out


def main():
    from pfb_tpu.ops import mmgridder as mm
    from jax import lax

    uvw, freq, vis, wgt, nx, cell = make_case()
    prec = {"default": lax.Precision.DEFAULT,
            "high": lax.Precision.HIGH,
            "highest": lax.Precision.HIGHEST}[
                os.environ.get("MM_PREC", "highest")]
    kw = {}
    if os.environ.get("MM_CAP"):
        kw["capacity"] = int(os.environ["MM_CAP"])
    plan = mm.mm_plan(uvw, freq, nx=nx, ny=nx, cellx=cell, celly=cell,
                      epsilon=1e-5, do_wgridding=True, precision=prec,
                      **kw)
    p = plan
    print(f"k={p['k']} nw={p['nw']} Nx={p['Nx']} ntx={p['ntx']} "
          f"nty={p['nty']} txs={p['txs']} tys={p['tys']} C={p['C']} "
          f"ntiles={p['ntiles']} nchunk={p['nchunk']} prec={prec}",
          flush=True)

    visw = np.asarray(vis) * np.asarray(wgt)
    vr = jnp.asarray(visw.real.ravel().astype(np.float32))

    k, nw, ntx, nty, txs, tys, C = (p["k"], p["nw"], p["ntx"], p["nty"],
                                    p["txs"], p["tys"], p["C"])

    dt, Y = t(mm._grid_all_taps, p["pu_c"], p["pv_c"], vr, p["idx_c"],
              p["pm_c"], p["pw_c"], p["tx_c"], p["ty_c"], p["beta"], k,
              nw, ntx, nty, txs, tys, C, precision=prec)
    print(f"grid_all_taps (1 comp): {dt*1e3:.1f} ms", flush=True)

    dt, grids = t(mm._dense_overlap, Y, nw, ntx, nty, txs, tys, k,
                  p["Nx"], p["Ny"])
    print(f"dense_overlap: {dt*1e3:.1f} ms", flush=True)

    from pfb_tpu.ops.wgridder import _grid_to_image, _image_to_grid
    gz = jnp.zeros_like(grids)

    def g2i():
        return _grid_to_image(grids, gz, nx, nx, cell, cell, k,
                              p["beta"], p["Nx"], p["Ny"], nw > 1, nw,
                              p["w0"], p["dw"], False, 0.0, 0.0)
    dt, img = t(g2i)
    print(f"grid_to_image (nw={nw}): {dt*1e3:.1f} ms", flush=True)

    def i2g():
        return _image_to_grid(img.astype(jnp.float32), nx, nx, cell,
                              cell, k, p["beta"], p["Nx"], p["Ny"],
                              nw > 1, nw, p["w0"], p["dw"], False, 0.0,
                              0.0, split=True)
    dt, (gr, gi) = t(i2g)
    print(f"image_to_grid: {dt*1e3:.1f} ms", flush=True)

    dt, _ = t(mm._degrid_all_taps, gr, gi, p["pu_c"], p["pv_c"],
              p["idx_c"], p["pm_c"], p["pw_c"], p["tx_c"], p["ty_c"],
              p["beta"], k, nw, ntx, nty, txs, tys, C, p["Nx"], p["Ny"],
              int(p["nrow"]) * int(p["nchan"]), precision=prec)
    print(f"degrid_all_taps (both comps): {dt*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
