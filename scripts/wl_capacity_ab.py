"""Spread capacity A/B after the first-visit direct write: with the
per-tile zeroing pass gone, does doubling entry capacity (C=256, i.e.
the paired-entry formulation — two C=128 packets of one tile fused
into one kernel step) now deliver the probe's ~2x (round-4 lab:
0.86 us/entry paired vs 2.7 single, but capacity-256 only -11% when
every first visit paid a full-block zero)?"""
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

from pfb_tpu.ops.pgridder import _spread_fold, pgrid_plan

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


def probe(paired):
    """The round-4 pair_ilp_probe at pair width 1 or 2 (timing-only:
    results are wrong when a pair straddles tiles). If single-entry
    probe time ~= production spread time, pairing IS the lever and
    the production kernel should adopt the paired formulation; if the
    single-entry probe is already ~2x faster than production, the gap
    is kernel structure, not pairing."""
    from functools import partial

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from pfb_tpu.ops import pgridder as pg

    rng = np.random.default_rng(0)
    nrow, nchan = 125_000, 8
    uvw = rng.normal(scale=1000.0, size=(nrow, 3))
    uvw[:, 2] *= 0.1
    freq = np.linspace(0.9e9, 1.1e9, nchan)
    umax = np.abs(uvw[:, :2]).max() * freq[-1] / 299792458.0
    cell = 1.0 / (2.0 * umax * 2.0)
    p1 = pg.pgrid_plan(uvw, freq, nx=1024, ny=1024, cellx=cell,
                       celly=cell, epsilon=1e-5, do_wgridding=True)
    P = paired
    E = p1["pos"].shape[0] // P * P
    posP = p1["pos"][:E].reshape(E // P, P, 8, p1["C"])
    posP = jnp.concatenate([posP[:, i] for i in range(P)], axis=-1)
    tidP = p1["tid"][:E:P]
    visp = jnp.asarray(np.zeros((E // P, 2, P * p1["C"]), np.float32))
    k, beta, nw = p1["k"], p1["beta"], p1["nw"]
    Thx, Thy, C = p1["txs"] + k, p1["tys"] + k, P * p1["C"]

    def kern(tp_ref, pk_ref, vis_ref, out_ref, *, prec):
        dt = out_ref.dtype
        kh = k / 2.0
        u = pk_ref[0, 0, :]
        v = pk_ref[0, 1, :]
        wf = pk_ref[0, 2, :]
        xs = jax.lax.broadcasted_iota(jnp.int32, (Thx, C),
                                      0).astype(dt)
        CUT = pg._es((xs - u[None, :]) / kh, beta, k)
        ys = jax.lax.broadcasted_iota(jnp.int32, (C, Thy),
                                      1).astype(dt)
        CV = pg._es((ys - v[:, None]) / kh, beta, k)
        ps = jax.lax.broadcasted_iota(jnp.int32, (nw, C),
                                      0).astype(dt)
        CW = pg._es((ps - wf[None, :]) / kh, beta, k)
        A = (CW[:, None, :] * CUT[None, :, :]).reshape(nw * Thx, C)
        vr_ = vis_ref[0, 0, :]
        vi_ = vis_ref[0, 1, :]
        CVv = jnp.concatenate([CV * vr_[:, None], CV * vi_[:, None]],
                              axis=1)
        res = lax.dot_general(A, CVv, (((1,), (0,)), ((), ())),
                              precision=prec,
                              preferred_element_type=dt)
        res = res.reshape(nw, Thx, 2 * Thy)
        out_ref[0, :, 0] += res[..., :Thy]
        out_ref[1, :, 0] += res[..., Thy:]

    ntiles = int(p1["ntx"]) * int(p1["nty"])

    def f(posP, visp, s):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(E // P,),
            in_specs=[pl.BlockSpec((1, 8, C),
                                   lambda e, *_: (e, 0, 0)),
                      pl.BlockSpec((1, 2, C),
                                   lambda e, *_: (e, 0, 0))],
            out_specs=pl.BlockSpec((2, nw, 1, Thx, Thy),
                                   lambda e, t: (0, 0, t[e], 0, 0)),
        )
        Y = pl.pallas_call(
            partial(kern, prec=lax.Precision.HIGHEST),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((2, nw, ntiles, Thx, Thy),
                                           jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(tidP.astype(jnp.int32), posP + s, visp)
        return Y[:, :, 0]

    timeit(chain(f, posP, visp),
           f"1024 probe P={P} ({E // P} steps, timing-only)")


def main():
    rng = np.random.default_rng(0)
    nrow, nchan = 125_000, 8
    uvw = rng.normal(scale=1000.0, size=(nrow, 3))
    uvw[:, 2] *= 0.1
    freq = np.linspace(0.9e9, 1.1e9, nchan)
    umax = np.abs(uvw[:, :2]).max() * freq[-1] / 299792458.0
    cell = 1.0 / (2.0 * umax * 2.0)
    vr = jnp.asarray(rng.normal(size=(nrow, nchan)).astype(np.float32))
    vi = jnp.asarray(rng.normal(size=(nrow, nchan)).astype(np.float32))

    for cap in (128, 256, 512):
        p = pgrid_plan(uvw, freq, nx=1024, ny=1024, cellx=cell,
                       celly=cell, epsilon=1e-5, do_wgridding=True,
                       capacity=cap)

        def sf(s, p=p):
            return _spread_fold(
                vr + s, vi, None, p["tid"], p["pos"], p["idx"],
                p["pm"], p["uvw_d"], p["freq_d"], beta=p["beta"],
                k=p["k"], nw=p["nw"], ntx=p["ntx"], nty=p["nty"],
                txs=p["txs"], tys=p["tys"], C=p["C"], x0=p["x0"],
                y0=p["y0"], Nx=p["Nx"], Ny=p["Ny"], interpret=False)

        timeit(chain(sf),
               f"1024 spread+fold C={cap} ({p['nentries']} entries)")

    probe(1)
    probe(2)


if __name__ == "__main__":
    main()
