"""Gridder throughput bench (TPU): Mvis/s for vis2dirty / dirty2vis.

Case from BASELINE.md: 1M vis (125k rows x 8 chan), 1024^2 image,
w-gridding on, epsilon 1e-5. Timing forces a real-scalar readback
(block_until_ready does not block on the axon relay).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

# persistent compile cache (remote TPU compiles cost minutes)
os.makedirs("/root/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)


def make_case(nrow=125_000, nchan=8, nx=1024, seed=0):
    rng = np.random.default_rng(seed)
    # MeerKAT-ish uv distribution: gaussian ball + long tails
    uvw = rng.normal(scale=1000.0, size=(nrow, 3))
    uvw[:, 2] *= 0.1
    freq = np.linspace(0.9e9, 1.1e9, nchan)
    vis = (rng.normal(size=(nrow, nchan)) +
           1j * rng.normal(size=(nrow, nchan))).astype(np.complex64)
    wgt = rng.random((nrow, nchan)).astype(np.float32)
    umax = np.abs(uvw[:, :2]).max() * freq[-1] / 299792458.0
    cell = 1.0 / (2.0 * umax * 2.0)  # x2 oversampling of critical
    return uvw, freq, vis, wgt, nx, cell


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nrow", type=int, default=125_000)
    ap.add_argument("--nchan", type=int, default=8)
    ap.add_argument("--nx", type=int, default=1024)
    ap.add_argument("--epsilon", type=float, default=1e-5)
    ap.add_argument("--tile", type=int, default=0)
    ap.add_argument("--capacity", type=int, default=0)
    ap.add_argument("--no-w", action="store_true")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--backend", choices=("mm", "pg"), default="mm")
    ap.add_argument("--check", action="store_true",
                    help="validate vs DFT oracle on a small subset")
    args = ap.parse_args()

    if args.backend == "pg":
        from pfb_tpu.ops.pgridder import (dirty2vis_pg as dirty2vis_mm,
                                          pgrid_plan as mm_plan,
                                          vis2dirty_pg as vis2dirty_mm)
    else:
        from pfb_tpu.ops.mmgridder import (dirty2vis_mm, mm_plan,
                                           vis2dirty_mm)

    uvw, freq, vis, wgt, nx, cell = make_case(args.nrow, args.nchan,
                                              args.nx)
    nvis = args.nrow * args.nchan
    kw = {}
    if args.tile and args.backend == "mm":
        kw["tile"] = args.tile
    elif args.tile:
        kw["tile_u"] = kw["tile_v"] = args.tile
    if args.capacity:
        kw["capacity"] = args.capacity

    t0 = time.perf_counter()
    plan = mm_plan(uvw, freq, nx=nx, ny=nx, cellx=cell, celly=cell,
                   epsilon=args.epsilon, do_wgridding=not args.no_w,
                   **kw)
    t_plan = time.perf_counter() - t0
    print(f"plan: {t_plan:.2f}s  k={plan['k']} nw={plan['nw']} "
          f"Nx={plan['Nx']} ntx={plan['ntx']} nty={plan['nty']} "
          f"txs={plan['txs']} tys={plan['tys']} C={plan['C']} "
          f"ntiles={plan.get('ntiles')} "
          f"nentries={plan.get('nentries')}", flush=True)

    # vis2dirty
    img = None
    for r in range(args.reps):
        t0 = time.perf_counter()
        img = vis2dirty_mm(uvw, freq, vis, wgt=wgt, nx=nx, ny=nx,
                           cellx=cell, celly=cell, plan=plan)
        float(jnp.sum(img))
        dt = time.perf_counter() - t0
        print(f"vis2dirty rep{r}: {dt:.3f}s  {nvis/dt/1e6:.2f} Mvis/s",
              flush=True)
    v2d_t = dt

    # dirty2vis
    image = np.asarray(img).astype(np.float32)
    for r in range(args.reps):
        t0 = time.perf_counter()
        out = dirty2vis_mm(uvw, freq, jnp.asarray(image), cell, cell,
                           plan=plan)
        dt = time.perf_counter() - t0
        print(f"dirty2vis rep{r}: {dt:.3f}s  {nvis/dt/1e6:.2f} Mvis/s",
              flush=True)
    d2v_t = dt

    # device-resident paths (pg): what a major cycle actually pays —
    # vis components and model stay on device, no host round trips
    dev = {}
    if args.backend == "pg":
        from pfb_tpu.ops.pgridder import (_adjoint_from_plan,
                                          _forward_from_plan,
                                          make_hessian_pg)
        rdtype = plan["rdtype"]
        vr = jnp.asarray((vis.real * wgt).astype(rdtype))
        vi = jnp.asarray((vis.imag * wgt).astype(rdtype))
        float(jnp.sum(vr) + jnp.sum(vi))
        for r in range(args.reps):
            t0 = time.perf_counter()
            d = _adjoint_from_plan(plan, vr, vi, None, False)
            float(jnp.sum(d))
            dt = time.perf_counter() - t0
            print(f"adjoint(dev) rep{r}: {dt:.3f}s  "
                  f"{nvis/dt/1e6:.2f} Mvis/s", flush=True)
        dev["adjoint_dev"] = round(nvis / dt / 1e6, 3)
        x = jnp.asarray(image.astype(rdtype))
        for eng in ("xla", "pallas"):
            for r in range(args.reps):
                t0 = time.perf_counter()
                fr, fi = _forward_from_plan(plan, x, engine=eng)
                float(jnp.sum(fr) + jnp.sum(fi))
                dt = time.perf_counter() - t0
                print(f"forward(dev,{eng}) rep{r}: {dt:.3f}s  "
                      f"{nvis/dt/1e6:.2f} Mvis/s", flush=True)
            dev[f"forward_dev_{eng}"] = round(nvis / dt / 1e6, 3)
        hess = make_hessian_pg(plan, wgt=wgt)
        for r in range(args.reps):
            t0 = time.perf_counter()
            hx = hess(x)
            float(jnp.sum(hx))
            dt = time.perf_counter() - t0
            print(f"hessian rep{r}: {dt:.3f}s  "
                  f"{nvis/dt/1e6:.2f} Mvis/s RT", flush=True)
        dev["hessian_rt"] = round(nvis / dt / 1e6, 3)

    print(json.dumps({
        "metric": f"{args.backend}_gridder_Mvis_per_s",
        "vis2dirty": round(nvis / v2d_t / 1e6, 3),
        "dirty2vis": round(nvis / d2v_t / 1e6, 3),
        **dev,
        "nvis": nvis, "nx": nx, "epsilon": args.epsilon,
        "wgridding": not args.no_w}))

    if args.check:
        from pfb_tpu.ops.dft import vis2dirty_dft
        sel = slice(0, 2000)
        ref = np.asarray(vis2dirty_dft(
            jnp.asarray(uvw[sel]), jnp.asarray(freq),
            jnp.asarray(vis[sel]), wgt=jnp.asarray(wgt[sel]),
            nx=256, ny=256, cellx=cell, celly=cell, do_wterm=True))
        got = np.asarray(vis2dirty_mm(
            uvw[sel], freq, vis[sel], wgt=wgt[sel], nx=256, ny=256,
            cellx=cell, celly=cell, epsilon=args.epsilon,
            do_wgridding=True))
        err = np.abs(got - ref).max() / np.abs(ref).max()
        print(f"oracle check (2k rows, 256^2): rel err {err:.2e}")


if __name__ == "__main__":
    main()
