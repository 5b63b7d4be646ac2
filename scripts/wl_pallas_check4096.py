"""Confirm the while_loop+optimization_barrier Pallas result at the
bench size (4096^2 x 8): host-loop vs barrier while_loop only."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

from pfb_tpu.ops.psf import make_psf_convolve_pallas  # noqa: E402

nx, nband, niter = 4096, 8, 10

psf = np.zeros((nband, 2 * nx, 2 * nx), np.float32)
psf[:, nx, nx] = 1.0
hess = make_psf_convolve_pallas(jnp.asarray(psf), nx, nx,
                                real_transfer=False)
x = jnp.full((nband, nx, nx), 1e-3, jnp.float32)


def sync(z):
    return float(jnp.sum(z))


def timeit(name, fn, *args):
    t0 = time.time()
    sync(fn(*args))
    print(f"{name}: compile+run {time.time() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    sync(fn(*args))
    dt = time.perf_counter() - t0
    print(f"{name}: {dt * 1e3 / niter:.2f} ms/iter", flush=True)


def hostloop(x):
    z = x
    for _ in range(niter):
        z = hess(z)
    return z


timeit("A host-loop", hostloop, x)


@jax.jit
def wloop_ob(x):
    def body(state):
        z, k = state
        z = lax.optimization_barrier(z)
        z = hess(z)
        z = lax.optimization_barrier(z)
        return z, k + 1

    z, _ = lax.while_loop(lambda s: s[1] < niter, body,
                          (x, jnp.int32(0)))
    return z


timeit("C while_loop+barrier", wloop_ob, x)
print("done", flush=True)
