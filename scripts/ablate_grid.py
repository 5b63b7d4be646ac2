"""Ablate the grid pass stages to find the bottleneck on TPU."""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from bench_gridder import make_case  # noqa: E402


def run(mode, plan, vr, prec):
    from pfb_tpu.ops.wgridder import es_kernel

    p = plan
    k, nw, ntx, nty, txs, tys, C = (p["k"], p["nw"], p["ntx"], p["nty"],
                                    p["txs"], p["tys"], p["C"])
    beta = p["beta"]
    ko2 = k // 2
    Thx, Thy = txs + k, tys + k
    nseg = nw * ntx * nty
    xsx = jnp.arange(Thx, dtype=jnp.float32)
    xsy = jnp.arange(Thy, dtype=jnp.float32)
    ntaps = k if nw > 1 else 1

    @jax.jit
    def go(pu, pv, vflat, idxc, pmc, pw, txv, tyv):
        def chunk_body(Y, args):
            u, v, ix, pm, w0c, txc, tyc = args
            w = vflat[ix] * pm
            if mode == "nokern":
                CU = jnp.ones(u.shape + (Thx,), jnp.float32)
                CV = jnp.ones(v.shape + (Thy,), jnp.float32)
            else:
                CU = es_kernel((xsx[None, None, :] - u[..., None]) / ko2,
                               beta, k)
                CV = es_kernel((xsy[None, None, :] - v[..., None]) / ko2,
                               beta, k)
            p0 = jnp.round(w0c)
            pbase = jnp.round(w0c[:, 0]).astype(jnp.int32)
            for i in range(ntaps):
                t = i - (ko2 - 1)
                cw = es_kernel((p0 + t - w0c) / ko2, beta, k)
                wt = w * cw
                ptile = jnp.clip(pbase + t, 0, nw - 1)
                tid = (ptile * ntx + txc) * nty + tyc
                if mode == "noeinsum":
                    tiles = (CU * wt[..., None]).sum(1)[:, :, None] * \
                        CV.sum(1)[:, None, :]
                else:
                    tiles = jnp.einsum("ecx,ecy->exy",
                                       CU * wt[..., None], CV,
                                       precision=prec)
                if mode == "noscatter":
                    Y = Y.at[:tiles.shape[0]].add(tiles)
                else:
                    Y = Y.at[tid].add(tiles, indices_are_sorted=True)
            return Y, None

        Y0 = jnp.zeros((nseg, Thx, Thy), jnp.float32)
        Y, _ = lax.scan(chunk_body, Y0,
                        (pu, pv, idxc, pmc, pw, txv, tyv))
        return Y

    args = (p["pu_c"], p["pv_c"], vr, p["idx_c"], p["pm_c"], p["pw_c"],
            p["tx_c"], p["ty_c"])
    Y = go(*args)
    float(jnp.sum(Y[0, 0, :8]))
    t0 = time.perf_counter()
    Y = go(*args)
    float(jnp.sum(Y[0, 0, :8]))
    print(f"{mode}: {(time.perf_counter()-t0)*1e3:.1f} ms", flush=True)


def main():
    from pfb_tpu.ops import mmgridder as mm

    uvw, freq, vis, wgt, nx, cell = make_case()
    prec = lax.Precision.HIGH
    plan = mm.mm_plan(uvw, freq, nx=nx, ny=nx, cellx=cell, celly=cell,
                      epsilon=1e-5, do_wgridding=True, precision=prec)
    visw = np.asarray(vis) * np.asarray(wgt)
    vr = jnp.asarray(visw.real.ravel().astype(np.float32))
    for mode in ["full", "noscatter", "noeinsum", "nokern"]:
        run(mode, plan, vr, prec)


if __name__ == "__main__":
    main()
