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


def pass1_variants():
    """E_pass1: decompose the x-axis kernel's cost at 8192^2 B=4 —
    full kernel vs stage1-only vs transpose-free (pre-permuted input
    rows, n2-major) vs memcpy skeleton."""
    import jax
    from functools import partial
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from pfb_tpu.ops.pallas_cfft import _cfft_consts, _kx_kernel
    from pfb_tpu.ops.pallas_fft import _cmm, _dotg_b1, _dotg_left0, \
        _factor

    N, P = 8192, 4
    rng = np.random.default_rng(0)
    xr = jnp.asarray(rng.normal(size=(P, N, N)).astype(np.float32))
    xi = jnp.asarray(rng.normal(size=(P, N, N)).astype(np.float32))
    C = _cfft_consts(N, 1, False, True)
    N1, N2 = _factor(N)
    L = 128
    Nout = N // 2
    full = lambda shape: pl.BlockSpec(shape, lambda *_: tuple(
        0 for _ in shape), memory_space=pltpu.VMEM)
    strip_in = pl.BlockSpec((1, N, L), lambda p, j: (p, 0, j),
                            memory_space=pltpu.VMEM)
    kw = dict(compiler_params=pltpu.CompilerParams(
        vmem_limit_bytes=100 * 1024 * 1024))

    def run(kern, nout, label, cs=C):
        so = pl.BlockSpec((1, nout, L), lambda p, j: (p, 0, j),
                          memory_space=pltpu.VMEM)

        def f(xr, xi, s):
            yr, yi = pl.pallas_call(
                kern, grid=(P, N // L),
                in_specs=[strip_in, strip_in] + [full(c.shape)
                                                 for c in cs],
                out_specs=(so, so),
                out_shape=(jax.ShapeDtypeStruct((P, nout, N),
                                                jnp.float32),) * 2,
                **kw)(xr + s, xi, *cs)
            return yr[:, 0] + yi[:, 0]
        timeit(chain(f, xr, xi), label)

    def k_full(xr_ref, xi_ref, w1r_, w1i_, w2r_, w2i_, or_, oi_):
        _kx_kernel(xr_ref, xi_ref, w1r_, w1i_, w2r_, w2i_, or_, oi_,
                   prec=None)

    run(k_full, Nout, "8192 pass1 full")

    def k_stage1(xr_ref, xi_ref, w1r_, w1i_, w2r_, w2i_, or_, oi_):
        w1r, w1i = w1r_[...], w1i_[...]
        N2_, N1_, n1_in = w1r.shape
        L_ = xr_ref.shape[-1]
        xr = xr_ref[...].reshape(n1_in, N2_, L_).transpose(1, 0, 2)
        xi = xi_ref[...].reshape(n1_in, N2_, L_).transpose(1, 0, 2)
        cr, ci = _cmm(_dotg_b1, w1r, w1i, xr, xi, None)
        or_[...] = cr[:N2_ // 2].reshape(or_.shape)
        oi_[...] = ci[:N2_ // 2].reshape(oi_.shape)

    run(k_stage1, N1 * (N2 // 2), "8192 pass1 stage1-only")

    def k_notr(xr_ref, xi_ref, w1r_, w1i_, w2r_, w2i_, or_, oi_):
        # input arrives pre-permuted n2-major: (N2, N1, L) directly
        w1r, w1i = w1r_[...], w1i_[...]
        N2_, N1_, n1_in = w1r.shape
        L_ = xr_ref.shape[-1]
        xr = xr_ref[...].reshape(N2_, n1_in, L_)
        xi = xi_ref[...].reshape(N2_, n1_in, L_)
        cr, ci = _cmm(_dotg_b1, w1r, w1i, xr, xi, None)
        yr, yi = _cmm(_dotg_left0, w2r_[...], w2i_[...], cr, ci, None)
        or_[...] = yr.reshape(or_.shape)
        oi_[...] = yi.reshape(oi_.shape)

    run(k_notr, Nout, "8192 pass1 NO-transpose (permuted input)")

    def k_skel(xr_ref, xi_ref, w1r_, w1i_, w2r_, w2i_, or_, oi_):
        or_[...] = xr_ref[0, :Nout][None]
        oi_[...] = xi_ref[0, :Nout][None]

    run(k_skel, Nout, "8192 pass1 memcpy skeleton")


if __name__ == "__main__":
    main()
    pass1_variants()
