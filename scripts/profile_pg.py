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
                                  _spread_fold, pgrid_plan,
                                  pgrid_plan_wblocked,
                                  _adjoint_wblocked_impl)

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

    # ---------- 4096^2, w-blocked ----------
    bp = pgrid_plan_wblocked(uvw, freq, nx=4096, ny=4096, cellx=cell,
                             celly=cell, epsilon=1e-5, plane_block=4)
    stats(bp["p0"], "4096 block-0 plan")
    print(f"4096: nblocks={bp['nblocks']} nw={bp['nw']} Rb={bp['Rb']} "
          f"(nrow={bp['nrow']})", flush=True)
    sel = np.asarray(bp["sel"])
    print("  rows/block:", [int((sel[b] < bp["nrow"]).sum())
                            for b in range(bp["nblocks"])], flush=True)

    akeys = ("pos", "tid", "idx", "pm", "uvw_d", "sel", "w0s",
             "uvw_full", "freq_d")
    arrs = {k: bp[k] for k in akeys}

    def adj4(arrs, vr_, vi_, s):
        bp2 = dict(bp)
        bp2.update(arrs)
        return _adjoint_wblocked_impl(bp2, vr_ + s, vi_, None, False)

    timeit(chain(adj4, arrs, vr, vi), "4096 w-on adjoint (full)")

    p0 = bp["p0"]
    B = bp["B"]
    z = jnp.zeros((1, bp["nchan"]), jnp.float32)
    vrp = jnp.concatenate([vr, z])
    vip = jnp.concatenate([vi, z])

    def sf4(arrs, vrp_, vip_, s):
        b = 2  # a middle block
        selb = arrs["sel"][b]
        return _spread_fold(
            vrp_[selb] + s, vip_[selb], None, arrs["tid"][b],
            arrs["pos"][b], arrs["idx"][b], arrs["pm"][b],
            arrs["uvw_d"][b], arrs["freq_d"],
            beta=p0["beta"], k=p0["k"], nw=B, ntx=p0["ntx"],
            nty=p0["nty"], txs=p0["txs"], tys=p0["tys"], C=p0["C"],
            x0=p0["x0"], y0=p0["y0"], Nx=p0["Nx"], Ny=p0["Ny"],
            interpret=False)

    timeit(chain(sf4, arrs, vrp, vip), "4096 one-block spread+fold")

    folded4 = jax.jit(sf4)(arrs, vrp, vip, jnp.float32(0.0))
    w0b2 = float(np.asarray(bp["w0s"])[2])
    dwb = float(np.asarray(bp["dw"]))

    def g2i4(folded4, s):
        return _grid_to_image(folded4[:B] + s, folded4[B:], p0["nx"],
                              p0["ny"], p0["cellx"], p0["celly"],
                              p0["k"], p0["beta"], p0["Nx"], p0["Ny"],
                              True, B, w0b2, dwb, False, p0["x0"],
                              p0["y0"])

    timeit(chain(g2i4, folded4), "4096 one-block grid_to_image (B=4)")


if __name__ == "__main__":
    main()
