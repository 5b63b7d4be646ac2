"""Round-5 PCG iteration-overhead lab: where do the ~8 ms of
non-matvec work per CG-fused iteration go? (BENCH_r04: 24.4 ms/iter
vs a 16.5 ms matvec; VERDICT item 3 wants >= 50 iters/s.)

Stages timed at the bench config (4096^2 x 8 bands, complex H):
  apply        plain v3 matvec (3 kernels)
  apply_cg     CG-fused matvec (K1 direction prologue + K3 reductions)
  xr-update    the fused x/r vector pass alone
  solve body   full scan body per iteration
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

from pfb_tpu.ops.psf import make_psf_convolve_pallas
from pfb_tpu.opt.pcg import make_pcg_bands_fused

NREP = 8


def timeit(fn, label, nrep=NREP):
    fn()
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn()
        ts.append((time.perf_counter() - t0) / nrep)
    print(f"{label}: {min(ts)*1e3:.2f} ms", flush=True)
    return min(ts)


def main():
    nband, nx = 8, 4096
    nxp = 2 * nx
    psf = jnp.zeros((nband, nxp, nxp), jnp.float32)
    psf = psf.at[:, nx, nx].set(0.5)
    hess = make_psf_convolve_pallas(psf, nx, nx, real_transfer=False)
    del psf
    x = jnp.full((nband, nx, nx), 1e-3, jnp.float32)

    consts = hess.consts
    apply = hess.apply
    apply_cg = hess.apply_cg

    @jax.jit
    def chain_apply(x, consts):
        def step(s, _):
            return apply(s, consts), None
        return lax.scan(step, x, None, length=NREP)[0]

    out = chain_apply(x, consts)
    timeit(lambda: float(jnp.sum(chain_apply(x, consts))),
           "apply (plain matvec)")

    beta0 = jnp.full((nband, 1, 1), 0.5, jnp.float32)

    @jax.jit
    def chain_cg(p, r, consts):
        def step(carry, _):
            p_, r_ = carry
            pn, conv, pap = apply_cg(p_, r_, beta0, consts)
            return (pn, conv), None
        (p_, r_), _ = lax.scan(step, (p, r), None, length=NREP)
        return p_ + r_

    timeit(lambda: float(jnp.sum(chain_cg(x, out, consts))),
           "apply_cg (fused matvec)")

    @jax.jit
    def chain_xr(x, r, p, conv):
        def step(carry, _):
            x_, r_ = carry
            alpha = jnp.float32(0.3)
            xn = x_ + alpha * p
            rn = r_ + alpha * conv
            rnorm = jnp.sum(rn * rn, axis=(-2, -1))
            return (xn, rn + rnorm[:, None, None] * 0.0), None
        (x_, r_), _ = lax.scan(step, (x, r), None, length=NREP)
        return x_ + r_

    timeit(lambda: float(jnp.sum(chain_xr(x, out, x, out))),
           "x/r update + rnorm pass")

    # full fused solve: per-iteration rate
    niter = 50
    solve = make_pcg_bands_fused(apply, tol=0.0, maxit=niter,
                                 minit=niter, backtrack=False,
                                 apply_cg=apply_cg,
                                 cg_scale=hess.cg_scale)
    b = jax.jit(lambda x, c: apply(x, c))(x, consts)
    x0 = jnp.zeros_like(b)
    sol = solve(b, x0, consts)
    float(jnp.sum(sol))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.sum(solve(b, x0, consts)))
        ts.append((time.perf_counter() - t0) / niter)
    print(f"solve_cg per-iter: {min(ts)*1e3:.2f} ms "
          f"({1.0/min(ts):.1f} iters/s)", flush=True)


if __name__ == "__main__":
    main()
