"""g2i/cfft decomposition lab: where does grid_to_image time go?

Times, at the 1024^2 (Nx=2048, nw=9) and 4096^2-w-block (Nx=8192,
B=4) shapes:
  - fftx pass 1 alone (x-axis, out_rolled)
  - the two XLA transposes alone
  - full fft2_c2c_pruned
  - the phasor-screen accumulation scan alone
  - full _grid_to_image
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

from pfb_tpu.ops.pallas_cfft import fft2_c2c_pruned, fftx_c2c
from pfb_tpu.ops.wgridder import _grid_to_image

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


def case(nw, Nx, label):
    nx = Nx // 2
    rng = np.random.default_rng(0)
    gr = jnp.asarray(rng.normal(size=(nw, Nx, Nx)).astype(np.float32))
    gi = jnp.asarray(rng.normal(size=(nw, Nx, Nx)).astype(np.float32))

    def p1(gr, gi, s):
        yr, yi = fftx_c2c(gr + s, gi, N=Nx, inverse=True,
                          out_rolled=True)
        return yr[:, 0] + yi[:, 0]

    timeit(chain(p1, gr, gi), f"{label} fftx pass1 (out_rolled)")

    half_r = jnp.asarray(rng.normal(size=(nw, nx, Nx)).astype(np.float32))
    half_i = jnp.asarray(rng.normal(size=(nw, nx, Nx)).astype(np.float32))

    def tr(a, b, s):
        return (jnp.swapaxes(a + s, -1, -2)
                + jnp.swapaxes(b, -1, -2))[:, 0]

    timeit(chain(tr, half_r, half_i), f"{label} transpose pair (half)")

    def full(gr, gi, s):
        yr, yi = fft2_c2c_pruned(gr + s, gi, Nx=Nx, Ny=Nx,
                                 inverse=True, pruned_out=True)
        return yr[:, 0] + yi[:, 0]

    timeit(chain(full, gr, gi), f"{label} fft2_c2c_pruned full")

    # screen scan alone on (nw, nx, nx)
    ir = jnp.asarray(rng.normal(size=(nw, nx, nx)).astype(np.float32))
    ii = jnp.asarray(rng.normal(size=(nw, nx, nx)).astype(np.float32))
    nm1 = jnp.asarray(rng.normal(size=(nx, nx)).astype(np.float32))

    def screen(ir, ii, nm1, s):
        c0 = jnp.cos(0.3 * nm1) + s
        s0 = jnp.sin(0.3 * nm1)
        cd = jnp.cos(0.01 * nm1)
        sd = jnp.sin(0.01 * nm1)

        def accum(carry, args):
            img_a, c, sn = carry
            irp, iip = args
            img_a = img_a + irp * c - iip * sn
            return (img_a, c * cd - sn * sd, sn * cd + c * sd), None

        (img, _, _), _ = lax.scan(
            accum, (jnp.zeros((nx, nx), jnp.float32), c0, s0),
            (ir, ii))
        return img

    timeit(chain(screen, ir, ii, nm1), f"{label} screen scan")

    def g2i(gr, gi, s):
        return _grid_to_image(gr + s, gi, nx, nx, 1e-5, 1e-5, 7,
                              2.3, Nx, Nx, True, nw, -0.5, 0.1,
                              False, 0.0, 0.0)

    timeit(chain(g2i, gr, gi), f"{label} _grid_to_image full")

    # lane-block sweep on pass 1 (per-step pipelining granularity)
    for L in (256, 512):
        if Nx % L:
            continue

        def p1L(gr, gi, s, L=L):
            yr, yi = fftx_c2c(gr + s, gi, N=Nx, inverse=True,
                              out_rolled=True, lane_block=L)
            return yr[:, 0] + yi[:, 0]

        try:
            timeit(chain(p1L, gr, gi),
                   f"{label} fftx pass1 L={L}")
        except Exception as e:
            print(f"{label} fftx pass1 L={L}: "
                  f"{type(e).__name__}: {str(e)[:90]}", flush=True)
    del gr, gi, half_r, half_i, ir, ii


def main():
    case(9, 2048, "2048^2 nw=9")
    case(4, 8192, "8192^2 B=4")


if __name__ == "__main__":
    main()
