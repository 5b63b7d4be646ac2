"""Variant: H enters the fused PCG as JIT ARGUMENTS (tracers) — no
HLO constant capture (relay 413) and no eager-const while operands
(the 1130 ms/iter path). Run optionally with
XLA_FLAGS=--xla_tpu_scoped_vmem_limit_kib=65536 to test the global
scoped-VMEM ceiling as well."""

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

from pfb_tpu.ops.mmfft import make_full_psfhat  # noqa: E402
from pfb_tpu.ops.pallas_fft import (_factor, prep_H_v3,  # noqa: E402
                                    psf_convolve_pallas_v3_cube)
from pfb_tpu.opt.pcg import pcg_bands  # noqa: E402

nx, nband, niter = 4096, 8, 50
print("XLA_FLAGS:", os.environ.get("XLA_FLAGS"), flush=True)

psf = np.zeros((nband, 2 * nx, 2 * nx), np.float32)
psf[:, nx, nx] = 0.5
phr, phi = make_full_psfhat(jnp.asarray(psf), band_chunk=1)
hr = prep_H_v3(jnp.swapaxes(phr, -1, -2))
hi = prep_H_v3(jnp.swapaxes(phi, -1, -2))
del phr, phi

N1x, N2x = _factor(2 * nx)
nxh = N1x * (N2x // 2 + 1)
row_block = 128 if nxh % 128 == 0 else \
    max(b for b in range(8, 129, 8) if nxh % b == 0)


@partial(jax.jit, static_argnames=("barrier",))
def pcg50(b, x0, hr, hi, *, barrier=True):
    def A(z):
        if barrier:
            z = lax.optimization_barrier(z)
        y = psf_convolve_pallas_v3_cube(z, hr, hi, nx, nx,
                                        row_block=row_block)
        return lax.optimization_barrier(y) if barrier else y

    return pcg_bands(A, b, x0=x0, tol=0.0, maxit=niter, minit=niter,
                     backtrack=False)


x = jnp.full((nband, nx, nx), 1e-3, jnp.float32)
b = psf_convolve_pallas_v3_cube(x, hr, hi, nx, nx,
                                row_block=row_block)
x0 = jnp.zeros_like(b)


def sync(z):
    return float(jnp.sum(z))


for barrier in (True, False):
    name = f"jit-arg barrier={barrier}"
    t0 = time.time()
    r = sync(pcg50(b, x0, hr, hi, barrier=barrier))
    print(f"{name}: compile+run {time.time() - t0:.1f}s "
          f"(sum {r:.6e})", flush=True)
    t0 = time.perf_counter()
    r = sync(pcg50(b, x0, hr, hi, barrier=barrier))
    dt = time.perf_counter() - t0
    print(f"{name}: {niter / dt:.2f} iters/s  "
          f"({dt * 1e3 / niter:.2f} ms/iter, sum {r:.6e})", flush=True)
print("done", flush=True)
