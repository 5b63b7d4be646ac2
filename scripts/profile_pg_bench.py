"""Round-5 stage decomposition of the 4096^2 w-ON gridder at the
BENCH row count (1M rows x 8 chan), on chip. The 125k-row round-4
attribution does not transfer: at 1M rows the entry stream is 71k
entries/block (vs 9.4k) at ~118/128 occupancy, so the per-entry
spread kernel dominates in a different regime.

Stages per w block (block 2, the full-row one):
  sel-gather      vrp[sel] (Rb, nchan) x2
  vispack         vr[idx]*pm pack (NE, 2, C)
  spread kernel   _grid_pallas
  DMA fold        _fold_pallas
  g2i             w-plane iFFTs + correction (B=4)
  i2g             forward FFTs (B=4)
  degrid kernel   _degrid_pallas
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from pfb_tpu.ops.pgridder import (_adjoint_wblocked_impl,
                                  _degrid_pallas, _fold_geom,
                                  _fold_pallas, _grid_pallas,
                                  _grid_to_image, _image_to_grid,
                                  _spread_fold, pgrid_plan_wblocked)
from pfb_tpu.ops.wgridder import gi_consts

NREP = 4


def chain(fn, *args):
    @jax.jit
    def run(*a):
        def step(s, _):
            out = fn(*a, s)
            return out.reshape(-1)[0] * 0.0, None
        return lax.scan(step, jnp.float32(0.0), None, length=NREP)[0]

    return lambda: run(*args)


def timeit(jfn, label):
    float(jfn())
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jfn())
        ts.append((time.perf_counter() - t0) / NREP)
    print(f"{label}: {min(ts)*1e3:.1f} ms", flush=True)
    return min(ts)


def main():
    rng = np.random.default_rng(0)
    nrow, nchan = 1_000_000, 8
    uvw = rng.normal(scale=1000.0, size=(nrow, 3))
    uvw[:, 2] *= 0.1
    freq = np.linspace(0.9e9, 1.1e9, nchan)
    umax = np.abs(uvw[:, :2]).max() * freq[-1] / 299792458.0
    cell = 1.0 / (2.0 * umax * 2.0)
    vr = jnp.asarray(rng.normal(size=(nrow, nchan)).astype(np.float32))
    vi = jnp.asarray(rng.normal(size=(nrow, nchan)).astype(np.float32))

    t0 = time.time()
    bp = pgrid_plan_wblocked(uvw, freq, nx=4096, ny=4096, cellx=cell,
                             celly=cell, epsilon=1e-5, plane_block=4)
    print(f"plan: {time.time()-t0:.1f} s", flush=True)
    p0 = bp["p0"]
    B = bp["B"]
    k, beta, C = p0["k"], p0["beta"], p0["C"]
    ntx, nty = p0["ntx"], p0["nty"]
    txs, tys = p0["txs"], p0["tys"]
    Nx, Ny = p0["Nx"], p0["Ny"]
    Thx, Thy = txs + k, tys + k
    NEs = bp["tid"].shape[1]
    print(f"NE={NEs} ntiles={ntx*nty} Thx={Thx} Thy={Thy}", flush=True)

    z = jnp.zeros((1, nchan), jnp.float32)
    vrp = jnp.concatenate([vr, z])
    vip = jnp.concatenate([vi, z])
    b = 2
    selb = bp["sel"][b]
    pos, tid = bp["pos"][b], bp["tid"][b]
    idx, pm = bp["idx"][b], bp["pm"][b]
    uvw_b = bp["uvw_d"][b]

    # ---- sel gather ----
    def selg(vrp_, vip_, s):
        return (vrp_[selb] + s) + vip_[selb]

    timeit(chain(selg, vrp, vip), "sel-gather x2")

    # ---- vispack ----
    def vpack(vrp_, vip_, s):
        vrb = (vrp_[selb] + s).reshape(-1)
        vib = vip_[selb].reshape(-1)
        return jnp.stack([vrb[idx] * pm, vib[idx] * pm], axis=1)

    timeit(chain(vpack, vrp, vip), "vispack (sel+idx gather+pack)")

    vispack = jax.jit(vpack)(vrp, vip, jnp.float32(0.0))
    lv = (jnp.sum(pm, axis=1) > 0).astype(jnp.int32)

    # compact tid (copy of _spread_fold's fold="dma" prologue)
    NE = min(tid.shape[0], ntx * nty)
    tid32 = tid.astype(jnp.int32)
    tval = jnp.zeros((ntx * nty,), jnp.int32).at[tid32].max(lv)
    _, _, Sx, Sy = _fold_geom(Thx, Thy, txs, tys)
    tt = np.arange(ntx * nty)
    col = (tt // nty % Sx) * Sy + (tt % nty % Sy)
    perm = jnp.asarray(np.lexsort((tt, col)).astype(np.int32))
    tp_ = tval[perm]
    cum = jnp.cumsum(tp_) - tp_
    rank = jnp.zeros((ntx * nty,), jnp.int32).at[perm].set(
        cum.astype(jnp.int32))
    ctid = rank[tid32]
    ltid = jnp.zeros((NE,), jnp.int32).at[ctid].set(tid32)
    lflag = jnp.zeros((NE,), jnp.int32).at[ctid].max(lv)

    # ---- gather variants ----
    def g_raw(vrp_, s):
        vrb = (vrp_[selb] + s).reshape(-1)
        return vrb[idx]

    timeit(chain(g_raw, vrp), "gather one component, no pm/stack")

    def g_prep(vrp_, vip_, s):
        vrb = (vrp_[selb] + s).reshape(-1)
        vib = vip_[selb].reshape(-1)
        vcat = jnp.concatenate([vrb, vib])
        idx2 = jnp.stack([idx, idx + vrb.shape[0]], axis=1)
        return vcat[idx2] * pm[:, None, :]

    timeit(chain(g_prep, vrp, vip), "concat-gather (NE,2,C) + pm")

    gidx = selb[idx // nchan] * nchan + (idx % nchan)

    def g_glob(vrp_, vip_, s):
        vrf = vrp_.reshape(-1)
        vif = vip_.reshape(-1)
        vcat = jnp.concatenate([vrf + s, vif])
        idx2 = jnp.stack([gidx, gidx + vrf.shape[0]], axis=1)
        return vcat[idx2] * pm[:, None, :]

    timeit(chain(g_glob, vrp, vip), "global-idx concat-gather + pm")

    # ---- spread kernel only ----
    def spread(ctid_, pos_, vispack_, lv_, s):
        return _grid_pallas(ctid_, pos_, vispack_ + s, beta, k, B, NE,
                            Thx, Thy, C, interpret=False, pflag=lv_)

    timeit(chain(spread, ctid, pos, vispack, lv), "spread kernel")

    Yc = jax.jit(spread)(ctid, pos, vispack, lv, jnp.float32(0.0))
    Yc = Yc.reshape(2 * B, NE, Thx, Thy)

    # ---- fold only ----
    def fold(Yc_, ltid_, lflag_, s):
        return _fold_pallas(Yc_ + s, ltid_, lflag_, ntx=ntx, nty=nty,
                            txs=txs, tys=tys, k=k, Nx=Nx, Ny=Ny,
                            nw=B, interpret=False)

    timeit(chain(fold, Yc, ltid, lflag), "DMA fold")

    # ---- full spread_fold ----
    def sf(vrp_, vip_, tid_, pos_, idx_, pm_, s):
        return _spread_fold(
            vrp_[selb] + s, vip_[selb], None, tid_, pos_, idx_, pm_,
            uvw_b, bp["freq_d"], beta=beta, k=k, nw=B, ntx=ntx,
            nty=nty, txs=txs, tys=tys, C=C, x0=p0["x0"], y0=p0["y0"],
            Nx=Nx, Ny=Ny, interpret=False)

    timeit(chain(sf, vrp, vip, tid, pos, idx, pm), "spread_fold total")

    folded = jax.jit(sf)(vrp, vip, tid, pos, idx, pm, jnp.float32(0.0))
    dw = float(bp["dw"])
    w0b = float(np.asarray(bp["w0s"])[b])
    gic = gi_consts(p0["nx"], p0["ny"], p0["cellx"], p0["celly"], k,
                    beta, Nx, Ny, True, dw, p0["x0"], p0["y0"],
                    rdtype=jnp.float32)

    def g2i(folded_, gic_, s):
        return _grid_to_image(folded_[:B] + s, folded_[B:], p0["nx"],
                              p0["ny"], p0["cellx"], p0["celly"], k,
                              beta, Nx, Ny, True, B, w0b, dw, False,
                              p0["x0"], p0["y0"], consts=gic_)

    timeit(chain(g2i, folded, gic), "grid_to_image (B=4)")

    img = jax.jit(g2i)(folded, gic, jnp.float32(0.0))

    # ---- forward side ----
    def i2g(img_, gic_, s):
        gr, gi_ = _image_to_grid(img_ + s, p0["nx"], p0["ny"],
                                 p0["cellx"], p0["celly"], k, beta,
                                 Nx, Ny, True, B, w0b, dw, False,
                                 p0["x0"], p0["y0"], split=True,
                                 consts=gic_)
        return gr + gi_

    timeit(chain(i2g, img, gic), "image_to_grid (B=4)")

    ThxA = -(-(Thx + 7) // 8) * 8
    ThyA = -(-(Thy + 127) // 128) * 128
    gr, gi_ = jax.jit(lambda im, gic_: _image_to_grid(
        im, p0["nx"], p0["ny"], p0["cellx"], p0["celly"], k, beta,
        Nx, Ny, True, B, w0b, dw, False, p0["x0"], p0["y0"],
        split=True, consts=gic_))(img, gic)
    ger = jnp.pad(gr, ((0, 0), (0, ThxA), (0, ThyA)), mode="wrap")
    gei = jnp.pad(gi_, ((0, 0), (0, ThxA), (0, ThyA)), mode="wrap")
    sx = pos[:, 5, 0].astype(jnp.int32)
    sy = pos[:, 6, 0].astype(jnp.int32)

    def pad_grids(img_, gic_, s):
        grx, gix = _image_to_grid(img_ + s, p0["nx"], p0["ny"],
                                  p0["cellx"], p0["celly"], k, beta,
                                  Nx, Ny, True, B, w0b, dw, False,
                                  p0["x0"], p0["y0"], split=True,
                                  consts=gic_)
        a = jnp.pad(grx, ((0, 0), (0, ThxA), (0, ThyA)), mode="wrap")
        bb = jnp.pad(gix, ((0, 0), (0, ThxA), (0, ThyA)), mode="wrap")
        return a + bb

    timeit(chain(pad_grids, img, gic), "i2g + wrap-pad (B=4)")

    def degrid(tid_, pos_, pm_, ger_, gei_, s):
        return _degrid_pallas(tid_, sx // 8, sy // 128, pos_,
                              ger_ + s, gei_, beta, k, B, ThxA,
                              ThyA, C, interpret=False, pm=pm_)

    timeit(chain(degrid, tid, pos, pm, ger, gei), "degrid kernel")

    out = jax.jit(degrid)(tid, pos, pm, ger, gei, jnp.float32(0.0))

    def scatter(out_, idx_, pm_, s):
        accr, acci = out_[:, 0, :] + s, out_[:, 1, :]
        nvis_b = bp["Rb"] * nchan
        fr = jnp.zeros((nvis_b,), jnp.float32).at[
            idx_.reshape(-1)].add((accr * pm_).reshape(-1))
        fi = jnp.zeros((nvis_b,), jnp.float32).at[
            idx_.reshape(-1)].add((acci * pm_).reshape(-1))
        return fr.reshape(bp["Rb"], nchan) + fi.reshape(bp["Rb"],
                                                        nchan)

    timeit(chain(scatter, out, idx, pm), "vis scatter-back")


if __name__ == "__main__":
    main()
