"""Why is the Pallas PSF pipeline ~60x slower inside lax.while_loop?

Round-2 finding: wrapping the v3 pipeline in while_loop bodies drops
the pallas calls' scoped-VMEM CompilerParams / disables pipelining
(see .claude/skills/verify/SKILL.md), so the pallas-engine solvers run
host loops. This experiment measures the candidates for fixing it ON
THE REAL CHIP:

  A. hostloop PCG (current baseline)
  B. pcg_bands (while_loop) -- known pathological
  C. while_loop + lax.optimization_barrier around the matvec
  D. while_loop with XLA_FLAGS=--xla_tpu_scoped_vmem_limit_kib=65536
     (a GLOBAL scoped-vmem ceiling that fusion cannot drop; set the
     env var before running to test this variant)
  E. fori_loop (fixed trip count)

Run: [XLA_FLAGS=--xla_tpu_scoped_vmem_limit_kib=65536] \
       python scripts/wl_pallas_experiment.py [nx] [nband] [niter]
"""

import sys
import time

import numpy as np

nx = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
nband = int(sys.argv[2]) if len(sys.argv) > 2 else 4
niter = int(sys.argv[3]) if len(sys.argv) > 3 else 20

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

from pfb_tpu.ops.psf import make_psf_convolve_pallas  # noqa: E402

print("devices:", jax.devices(), flush=True)
print("XLA_FLAGS:", __import__("os").environ.get("XLA_FLAGS"),
      flush=True)

psf = np.zeros((nband, 2 * nx, 2 * nx), np.float32)
psf[:, nx, nx] = 1.0
hess = make_psf_convolve_pallas(jnp.asarray(psf), nx, nx,
                                real_transfer=False)
x = jnp.full((nband, nx, nx), 1e-3, jnp.float32)


def sync(z):
    return float(jnp.sum(z))


def timeit(name, fn, *args):
    t0 = time.time()
    sync(fn(*args))  # compile + run
    print(f"{name}: compile+run {time.time() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    sync(fn(*args))
    dt = time.perf_counter() - t0
    print(f"{name}: {dt * 1e3 / niter:.2f} ms/iter", flush=True)
    return dt


# A. host loop
def hostloop(x):
    z = x
    for _ in range(niter):
        z = hess(z)
    return z


timeit("A host-loop", hostloop, x)


# B. plain while_loop
@jax.jit
def wloop(x):
    def body(state):
        z, k = state
        return hess(z), k + 1

    z, _ = lax.while_loop(lambda s: s[1] < niter, body,
                          (x, jnp.int32(0)))
    return z


timeit("B while_loop", wloop, x)


# C. while_loop + optimization_barrier
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


# E. fori_loop
@jax.jit
def floop(x):
    return lax.fori_loop(0, niter, lambda i, z: hess(z), x)


timeit("E fori_loop", floop, x)
print("done", flush=True)
