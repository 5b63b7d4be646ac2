"""Stage-level timing of the fused Pallas (pg) gridder on the chip.

Round-4 attribution run for the VERDICT items "push pg throughput into
ducc0's mid-range" and "make the w-ON exact residual fast at 4096^2":
splits the adjoint into spread(+fold) vs grid_to_image (w-plane FFT +
phase accumulation), counts padding entries (one per EMPTY uv tile —
at 4096^2 most tiles are empty and padding dominates the entry
stream), and A/Bs the kernel's MXU precision.

Timing: lax.scan chains with a scalar data dependency (one compiled
kernel instance, amortises the ~50 ms relay sync).
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

from pfb_tpu.ops.pgridder import (_adjoint_from_plan, _grid_to_image,
                                  _spread_fold, pgrid_plan)

NREP = 8


def chain(fn, *args):
    """fn(*args, s) -> array; scan NREP times with scalar carry.
    args are jit ARGUMENTS (a closure would bake GB-scale operands as
    HLO constants -> remote-compile HTTP 413)."""
    @jax.jit
    def run(*a):
        def step(s, _):
            out = fn(*a, s)
            return out.reshape(-1)[0] * 0.0, None
        return lax.scan(step, jnp.float32(0.0), None, length=NREP)[0]

    return lambda: run(*args)


def timeit(jfn, label):
    float(jfn())  # compile+warm
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jfn())
        ts.append((time.perf_counter() - t0) / NREP)
    print(f"{label}: {min(ts)*1e3:.1f} ms", flush=True)
    return min(ts)


def case(nxg):
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


def stats(p, label):
    pm = np.asarray(p["pm"])
    npad = int((pm.sum(axis=1) == 0).sum())
    print(f"{label}: k={p['k']} nw={p['nw']} Nx={p['Nx']} "
          f"ntx={p['ntx']} nty={p['nty']} txs={p['txs']} "
          f"tys={p['tys']} nentries={p['nentries']} "
          f"padding={npad} ({100*npad/p['nentries']:.0f}%)",
          flush=True)


def main():
    uvw, freq, cell, vr, vi = case(1024)

    # ---------- 1024^2, full plan ----------
    p = pgrid_plan(uvw, freq, nx=1024, ny=1024, cellx=cell, celly=cell,
                   epsilon=1e-5, do_wgridding=True)
    stats(p, "1024 plan")

    timeit(chain(lambda s: _adjoint_from_plan(
        p, vr + s, vi, None, False)), "1024 adjoint (full)")

    def sf(prec):
        def f(s):
            return _spread_fold(
                vr + s, vi, None, p["tid"], p["pos"], p["idx"],
                p["pm"], p["uvw_d"], p["freq_d"], beta=p["beta"],
                k=p["k"], nw=p["nw"], ntx=p["ntx"], nty=p["nty"],
                txs=p["txs"], tys=p["tys"], C=p["C"], x0=p["x0"],
                y0=p["y0"], Nx=p["Nx"], Ny=p["Ny"], interpret=False,
                precision=prec)
        return f

    t_hi = timeit(chain(sf(lax.Precision.HIGHEST)),
                  "1024 spread+fold HIGHEST")
    t_de = timeit(chain(sf(lax.Precision.DEFAULT)),
                  "1024 spread+fold DEFAULT")
    print(f"  -> MXU-extra-pass share ~ "
          f"{(t_hi-t_de)*1e3:.1f} ms", flush=True)

    folded = _spread_fold(vr, vi, None, p["tid"], p["pos"], p["idx"],
                          p["pm"], p["uvw_d"], p["freq_d"],
                          beta=p["beta"], k=p["k"], nw=p["nw"],
                          ntx=p["ntx"], nty=p["nty"], txs=p["txs"],
                          tys=p["tys"], C=p["C"], x0=p["x0"],
                          y0=p["y0"], Nx=p["Nx"], Ny=p["Ny"],
                          interpret=False)
    nw = p["nw"]

    def g2i(folded, s):
        return _grid_to_image(folded[:nw] + s, folded[nw:], p["nx"],
                              p["ny"], p["cellx"], p["celly"], p["k"],
                              p["beta"], p["Nx"], p["Ny"], nw > 1, nw,
                              float(p["w0"]), float(p["dw"]), False,
                              p["x0"], p["y0"])

    timeit(chain(g2i, folded), "1024 grid_to_image")

    # The w-blocked profiling moved to
    # scripts/profile_pg_bench.py (round 5: the blocked plan layout
    # changed to the global-stream design in ops/pg_stream.py).


if __name__ == "__main__":
    main()
