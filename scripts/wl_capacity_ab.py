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


if __name__ == "__main__":
    main()
