"""Round-4 kernel lab: attribution A/Bs for the pg-gridder hot paths.

E_fold: 4096^2 w-block spread decomposition — Pallas kernel alone vs
        +tile-validity mask vs +fold (is the dense (2nw, ntiles, Thx,
        Thy) buffer the cost, or the entry stream?)
E_fft:  c2c stack FFT — mmfft four-step vs a twiddle-absorbed batched
        stage variant vs XLA fft2, at 2048^2 (1024-grid case) and
        8192^2 x4 planes (4096-w-block case).
E_es:   spread kernel with the ES evaluation replaced by constants
        (VPU-es share of the per-entry cost).
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pfb_tpu.ops import pgridder as pg
from pfb_tpu.ops.mmgridder import _fold_tiles

NREP = 8


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


def case():
    rng = np.random.default_rng(0)
    nrow, nchan = 125_000, 8
    uvw = rng.normal(scale=1000.0, size=(nrow, 3))
    uvw[:, 2] *= 0.1
    freq = np.linspace(0.9e9, 1.1e9, nchan)
    umax = np.abs(uvw[:, :2]).max() * freq[-1] / 299792458.0
    cell = 1.0 / (2.0 * umax * 2.0)
    vr = jnp.asarray(rng.normal(size=(nrow, nchan)).astype(np.float32))
    vi = jnp.asarray(rng.normal(size=(nrow, nchan)).astype(np.float32))
    return uvw, freq, cell, vr, vi


# ---------------- E_fft variants ----------------

def fft2_absorbed(xr, xi, inverse=False):
    """Four-step with the twiddle absorbed into a BATCHED stage-2:
    c[..., j(k1), k2] = sum_n2 W2tw[j, k2, n2] a[..., j, n2] — no
    elementwise twiddle pass over the data."""
    from pfb_tpu.ops.mmfft import _factor
    from functools import lru_cache

    def plan(N, inv):
        N1, N2 = _factor(N)
        sign = 2.0 if inv else -2.0
        n1 = np.arange(N1)
        n2 = np.arange(N2)
        W1 = np.exp(sign * 1j * np.pi * np.outer(n1, n1) / N1)
        W2 = np.exp(sign * 1j * np.pi * np.outer(n2, n2) / N2)
        tw = np.exp(sign * 1j * np.pi * np.outer(n1, n2) / N)
        W2tw = W2[None, :, :] * tw[:, None, :]   # (N1, N2, N2)
        f32 = np.float32
        return (N1, N2, W1.real.astype(f32), W1.imag.astype(f32),
                W2tw.real.astype(f32), W2tw.imag.astype(f32))

    def last(xr, xi, N, inv):
        N1, N2, W1r, W1i, W2r, W2i = plan(N, inv)
        lead = xr.shape[:-1]
        xr = xr.reshape(*lead, N1, N2)
        xi = xi.reshape(*lead, N1, N2)
        hi = jax.lax.Precision.HIGHEST

        def s1(A, B):
            return jnp.einsum("kn,...nm->...km", A, B, precision=hi)

        ar = s1(jnp.asarray(W1r), xr) - s1(jnp.asarray(W1i), xi)
        ai = s1(jnp.asarray(W1r), xi) + s1(jnp.asarray(W1i), xr)

        def s2(A, B):
            return jnp.einsum("jkn,...jn->...jk", A, B, precision=hi)

        cr = s2(jnp.asarray(W2r), ar) - s2(jnp.asarray(W2i), ai)
        ci = s2(jnp.asarray(W2r), ai) + s2(jnp.asarray(W2i), ar)
        # output index k = k1 + N1 k2: lay out (k2, k1)
        yr = jnp.swapaxes(cr, -1, -2).reshape(*lead, N)
        yi = jnp.swapaxes(ci, -1, -2).reshape(*lead, N)
        if inv:
            yr, yi = yr / N, yi / N
        return yr, yi

    n_last, n_prev = xr.shape[-1], xr.shape[-2]
    yr, yi = last(xr, xi, n_last, inverse)
    yr = jnp.swapaxes(yr, -1, -2)
    yi = jnp.swapaxes(yi, -1, -2)
    yr, yi = last(yr, yi, n_prev, inverse)
    return jnp.swapaxes(yr, -1, -2), jnp.swapaxes(yi, -1, -2)


def main():
    uvw, freq, cell, vr, vi = case()

    # ---------------- E_fft ----------------
    from pfb_tpu.ops.mmfft import fft2_mm
    rng = np.random.default_rng(1)
    for shape, label in ():
        xr = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        xi = jnp.asarray(rng.normal(size=shape).astype(np.float32))

        def f_mm(xr, xi, s):
            yr, yi = fft2_mm(xr + s, xi)
            return yr + yi

        def f_ab(xr, xi, s):
            yr, yi = fft2_absorbed(xr + s, xi)
            return yr + yi

        def f_xla(xr, xi, s):
            y = jnp.fft.fft2(lax.complex(xr + s, xi))
            return y.real + y.imag

        t1 = timeit(chain(f_mm, xr, xi), f"fft2_mm {label}")
        t2 = timeit(chain(f_ab, xr, xi), f"fft2_absorbed {label}")
        t3 = timeit(chain(f_xla, xr, xi), f"fft2_xla {label}")
        # accuracy of absorbed vs mm
        a = fft2_absorbed(xr[:1], xi[:1])
        b = fft2_mm(xr[:1], xi[:1])
        err = float(jnp.max(jnp.abs(a[0] - b[0])) /
                    jnp.max(jnp.abs(b[0])))
        print(f"  absorbed-vs-mm rel err: {err:.2e}", flush=True)
        del xr, xi

    # ---------------- E_fold (4096 block 2) ----------------
    bp = pg.pgrid_plan_wblocked(uvw, freq, nx=4096, ny=4096,
                                cellx=cell, celly=cell, epsilon=1e-5,
                                plane_block=4)
    p0 = bp["p0"]
    B = bp["B"]
    z = jnp.zeros((1, bp["nchan"]), jnp.float32)
    vrp = jnp.concatenate([vr, z])
    vip = jnp.concatenate([vi, z])
    Thx, Thy = p0["txs"] + p0["k"], p0["tys"] + p0["k"]
    ntiles = p0["ntx"] * p0["nty"]
    b2 = {k: bp[k][2] for k in ("pos", "tid", "idx", "pm", "uvw_d",
                                "sel")}
    print(f"block2: nentries={b2['pos'].shape[0]} ntiles={ntiles} "
          f"Y={8*ntiles*Thx*Thy*4/1e9:.2f} GB", flush=True)

    def pack(arrs, s):
        selb = arrs["sel"]
        vrb = vrp[selb] + s
        vib = vip[selb]
        vr_, vi_ = vrb.reshape(-1), vib.reshape(-1)
        return jnp.stack([vr_[arrs["idx"]] * arrs["pm"],
                          vi_[arrs["idx"]] * arrs["pm"]], axis=1)

    def kern_only(arrs, s):
        vp = pack(arrs, s)
        Y = pg._grid_pallas(arrs["tid"], arrs["pos"], vp, p0["beta"],
                            p0["k"], B, ntiles, Thx, Thy, p0["C"])
        return Y[:, :, 0]  # touch a slice only

    def kern_mask(arrs, s):
        vp = pack(arrs, s)
        Y = pg._grid_pallas(arrs["tid"], arrs["pos"], vp, p0["beta"],
                            p0["k"], B, ntiles, Thx, Thy, p0["C"])
        lv = (jnp.sum(arrs["pm"], axis=1) > 0).astype(jnp.int32)
        tval = jnp.zeros((ntiles,), jnp.int32).at[
            arrs["tid"]].max(lv) > 0
        Y = jnp.where(tval[None, :, None, None], Y, 0.0)
        return Y[:, :, 0]

    def kern_fold(arrs, s):
        vp = pack(arrs, s)
        Y = pg._grid_pallas(arrs["tid"], arrs["pos"], vp, p0["beta"],
                            p0["k"], B, ntiles, Thx, Thy, p0["C"])
        lv = (jnp.sum(arrs["pm"], axis=1) > 0).astype(jnp.int32)
        tval = jnp.zeros((ntiles,), jnp.int32).at[
            arrs["tid"]].max(lv) > 0
        Y = jnp.where(tval[None, :, None, None], Y, 0.0)
        return _fold_tiles(Y.reshape(2 * B, p0["ntx"], p0["nty"],
                                     Thx, Thy), p0["ntx"], p0["nty"],
                           p0["txs"], p0["tys"], p0["k"], p0["Nx"],
                           p0["Ny"])

    timeit(chain(kern_only, b2), "4096 block2 kernel only")
    timeit(chain(kern_fold, b2), "4096 block2 kernel+mask+fold(xla)")

    def sf_mode(mode):
        def f(arrs, s):
            selb = arrs["sel"]
            return pg._spread_fold(
                vrp[selb] + s, vip[selb], None, arrs["tid"],
                arrs["pos"], arrs["idx"], arrs["pm"], arrs["uvw_d"],
                bp["freq_d"], beta=p0["beta"], k=p0["k"], nw=B,
                ntx=p0["ntx"], nty=p0["nty"], txs=p0["txs"],
                tys=p0["tys"], C=p0["C"], x0=p0["x0"], y0=p0["y0"],
                Nx=p0["Nx"], Ny=p0["Ny"], interpret=False, fold=mode)
        return f

    timeit(chain(sf_mode("dma"), b2), "4096 block2 spread_fold DMA")
    a = jax.jit(sf_mode("dma"))(b2, jnp.float32(0.0))
    c = jax.jit(sf_mode("xla"))(b2, jnp.float32(0.0))
    err = float(jnp.max(jnp.abs(a - c)) / (1e-30 + jnp.max(jnp.abs(c))))
    print(f"  dma-vs-xla fold rel err: {err:.2e}", flush=True)

    # 1024^2 comparison
    p1 = pg.pgrid_plan(uvw, freq, nx=1024, ny=1024, cellx=cell,
                       celly=cell, epsilon=1e-5, do_wgridding=True)

    def sf1(mode):
        def f(s):
            return pg._spread_fold(
                vr + s, vi, None, p1["tid"], p1["pos"], p1["idx"],
                p1["pm"], p1["uvw_d"], p1["freq_d"], beta=p1["beta"],
                k=p1["k"], nw=p1["nw"], ntx=p1["ntx"], nty=p1["nty"],
                txs=p1["txs"], tys=p1["tys"], C=p1["C"], x0=p1["x0"],
                y0=p1["y0"], Nx=p1["Nx"], Ny=p1["Ny"],
                interpret=False, fold=mode)
        return f

    timeit(chain(sf1("xla")), "1024 spread_fold XLA")
    timeit(chain(sf1("dma")), "1024 spread_fold DMA")

    # ---------------- E_es: ES-eval share of the spread ----------
    # replace _es with a 2-op linear stand-in (keeps shapes/marts);
    # the delta vs the real kernel is the VPU-transcendental share
    fill = float(np.asarray(p1["pm"]).sum() / p1["pm"].size)
    print(f"1024 plan: nentries={p1['pos'].shape[0]} "
          f"fill={fill:.2f}", flush=True)
    real_es = pg._es
    try:
        pg._es = lambda x, beta, k: 0.25 * x + 0.5
        timeit(chain(sf1("dma")), "1024 spread_fold DMA (es=linear)")
    finally:
        pg._es = real_es

    # ---------------- E_C: capacity 256 ----------------
    p2 = pg.pgrid_plan(uvw, freq, nx=1024, ny=1024, cellx=cell,
                       celly=cell, epsilon=1e-5, do_wgridding=True,
                       capacity=256)
    print(f"1024 plan C=256: nentries={p2['pos'].shape[0]}",
          flush=True)

    def sf2(s):
        return pg._spread_fold(
            vr + s, vi, None, p2["tid"], p2["pos"], p2["idx"],
            p2["pm"], p2["uvw_d"], p2["freq_d"], beta=p2["beta"],
            k=p2["k"], nw=p2["nw"], ntx=p2["ntx"], nty=p2["nty"],
            txs=p2["txs"], tys=p2["tys"], C=p2["C"], x0=p2["x0"],
            y0=p2["y0"], Nx=p2["Nx"], Ny=p2["Ny"],
            interpret=False, fold="dma")

    timeit(chain(sf2), "1024 spread_fold DMA C=256")

    # ---------------- E_skel: all-padding skeleton ----------------
    # pflag=0 everywhere -> the kernel skips every body and only
    # zero-writes blocks on tile change: isolates per-step pipeline
    # overhead from the compute chain, at both scales.
    def skel(tid, pos, vp, nw_, ntiles_, thx, thy, cc, label):
        z = jnp.zeros((pos.shape[0],), jnp.int32)

        def f(s):
            Y = pg._grid_pallas(tid, pos + s, vp, p0["beta"],
                                p0["k"], nw_, ntiles_, thx, thy,
                                cc, pflag=z)
            return Y[:, :, 0]
        return timeit(chain(f), label)

    vp1 = jnp.zeros((p1["pos"].shape[0], 2, p1["C"]), jnp.float32)
    skel(p1["tid"], p1["pos"], vp1, p1["nw"],
         p1["ntx"] * p1["nty"], p1["txs"] + p1["k"],
         p1["tys"] + p1["k"], p1["C"],
         f"1024 spread SKELETON ({p1['pos'].shape[0]} entries)")
    vpb = jnp.zeros((b2["pos"].shape[0], 2, p0["C"]), jnp.float32)
    skel(b2["tid"], b2["pos"], vpb, B, ntiles, Thx, Thy, p0["C"],
         f"4096 block2 spread SKELETON ({b2['pos'].shape[0]} entries)")


if __name__ == "__main__":
    main()
