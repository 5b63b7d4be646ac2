"""The actual solver wiring under test: EAGER pcg_bands (while_loop
with closure consts as runtime operands — no outer jit, no HLO
constant capture) driving the barrier-wrapped Pallas matvec, vs the
current pcg_bands_hostloop path, at the bench size."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

from pfb_tpu.ops.psf import make_psf_convolve_pallas  # noqa: E402
from pfb_tpu.opt.pcg import pcg_bands, pcg_bands_hostloop  # noqa: E402

nx, nband, niter = 4096, 8, 50

psf = np.zeros((nband, 2 * nx, 2 * nx), np.float32)
psf[:, nx, nx] = 0.5
hess = make_psf_convolve_pallas(jnp.asarray(psf), nx, nx,
                                real_transfer=False)


def hess_b(x):
    return lax.optimization_barrier(
        hess(lax.optimization_barrier(x)))


x = jnp.full((nband, nx, nx), 1e-3, jnp.float32)
b = hess(x)
x0 = jnp.zeros_like(b)


def sync(z):
    return float(jnp.sum(z))


def timeit(name, fn):
    t0 = time.time()
    r = sync(fn())
    print(f"{name}: compile+run {time.time() - t0:.1f}s "
          f"(sum {r:.6e})", flush=True)
    t0 = time.perf_counter()
    r = sync(fn())
    dt = time.perf_counter() - t0
    print(f"{name}: {niter / dt:.2f} iters/s  ({dt * 1e3 / niter:.2f} "
          f"ms/iter, sum {r:.6e})", flush=True)


timeit("hostloop", lambda: pcg_bands_hostloop(
    hess, b, x0=x0, tol=0.0, maxit=niter, minit=niter))
timeit("fused-wl", lambda: pcg_bands(
    hess_b, b, x0=x0, tol=0.0, maxit=niter, minit=niter,
    backtrack=False))
timeit("fused-wl-bt", lambda: pcg_bands(
    hess_b, b, x0=x0, tol=0.0, maxit=niter, minit=niter,
    backtrack=True))
timeit("fused-wl-nobarrier", lambda: pcg_bands(
    hess, b, x0=x0, tol=0.0, maxit=niter, minit=niter,
    backtrack=False))
print("done", flush=True)
