"""Per-kernel timing lab for the v3 Pallas PSF pipeline at 4096^2 x 8
(TPU): times K1/K2/K3 separately and A/B-tests candidate levers
(lane_block, precision) so roofline work is measurement-driven.
"""
import sys
import time
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from pfb_tpu.ops.pallas_fft import (_const_specs, _const_specs_lane,
                                    _factor, _k1h_kernel, _k2v_kernel,
                                    _k3h_kernel, consts_for,
                                    consts_lane_for, prep_H_v3)
from pfb_tpu.ops.mmfft import make_full_psfhat

nband, nx = 8, 4096
ny = nx
NX = NY = 2 * nx
N1x, N2x = _factor(NX)
NXH = N1x * (N2x // 2 + 1)
row_block = 128
CX = consts_for(NX)
CYl = consts_lane_for(NY)
kw = dict(compiler_params=pltpu.CompilerParams(
    vmem_limit_bytes=100 * 1024 * 1024))

rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(nband, nx, ny)).astype(np.float32))
psf = np.zeros((nband, NX, NY), np.float32)
psf[:, nx, ny] = 1.0
psf[:, nx + 5, ny + 3] = 0.05
phr, phi = make_full_psfhat(jnp.asarray(psf), band_chunk=1)
Hsr = prep_H_v3(jnp.swapaxes(phr, -1, -2))
Hsi = prep_H_v3(jnp.swapaxes(phi, -1, -2))
del phr, phi
zr0 = jnp.asarray(rng.normal(size=(nband, NXH, ny)).astype(np.float32))
zi0 = jnp.asarray(rng.normal(size=(nband, NXH, ny)).astype(np.float32))


def timeit(name, fn, *args, nrep=10):
    """One jitted program chaining nrep applications with a scalar
    data dependency — per-call relay dispatch (~50 ms) would otherwise
    dominate kernel-scale timings."""
    @jax.jit
    def chain(*a):
        z = a
        for _ in range(nrep):
            out = fn(*z)
            o0 = out[0] if isinstance(out, tuple) else out
            z = (z[0] + o0[0, 0, 0] * 0.0,) + z[1:]
        return o0

    float(jnp.sum(chain(*args)))  # compile + warm
    t0 = time.perf_counter()
    float(jnp.sum(chain(*args)))
    dt = (time.perf_counter() - t0) / nrep
    print(f"{name}: {dt*1e3:.2f} ms", flush=True)
    return dt


def k1(lane_block=128, prec="highest"):
    p = {"highest": jax.lax.Precision.HIGHEST,
         "default": jax.lax.Precision.DEFAULT}[prec]
    in_strip = pl.BlockSpec((1, nx, lane_block),
                            lambda b, j: (b, 0, j),
                            memory_space=pltpu.VMEM)
    h_strip = pl.BlockSpec((1, NXH, lane_block),
                           lambda b, j: (b, 0, j),
                           memory_space=pltpu.VMEM)

    def run(x):
        return pl.pallas_call(
            partial(_k1h_kernel, N=NX, L=lane_block, prec=p),
            grid=(nband, ny // lane_block),
            in_specs=[in_strip] + _const_specs(NX),
            out_specs=(h_strip, h_strip),
            out_shape=(jax.ShapeDtypeStruct((nband, NXH, ny),
                                            jnp.float32),) * 2,
            **kw)(x, *CX)
    return run


def k3(lane_block=128, prec="highest"):
    p = {"highest": jax.lax.Precision.HIGHEST,
         "default": jax.lax.Precision.DEFAULT}[prec]
    in_strip = pl.BlockSpec((1, nx, lane_block),
                            lambda b, j: (b, 0, j),
                            memory_space=pltpu.VMEM)
    h_strip = pl.BlockSpec((1, NXH, lane_block),
                           lambda b, j: (b, 0, j),
                           memory_space=pltpu.VMEM)

    def run(zr, zi):
        return pl.pallas_call(
            partial(_k3h_kernel, N=NX, L=lane_block, prec=p),
            grid=(nband, ny // lane_block),
            in_specs=[h_strip] * 2 + _const_specs(NX),
            out_specs=in_strip,
            out_shape=jax.ShapeDtypeStruct((nband, nx, ny),
                                           jnp.float32),
            **kw)(zr, zi, *CX)
    return run


def k2(row_block=128, prec="highest"):
    p = {"highest": jax.lax.Precision.HIGHEST,
         "default": jax.lax.Precision.DEFAULT}[prec]
    N1y = NY // 128
    rows_half = pl.BlockSpec((1, row_block, ny),
                             lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM)
    hspec = pl.BlockSpec((1, N1y, row_block, 128),
                         lambda b, i: (b, 0, i, 0),
                         memory_space=pltpu.VMEM)

    def run(zr, zi, hr, hi):
        return pl.pallas_call(
            partial(_k2v_kernel, N=NY, M=row_block, prec=p),
            grid=(nband, NXH // row_block),
            in_specs=[rows_half] * 2 + [hspec] * 2
            + _const_specs_lane(NY),
            out_specs=(rows_half, rows_half),
            out_shape=(jax.ShapeDtypeStruct((nband, NXH, ny),
                                            jnp.float32),) * 2,
            **kw)(zr, zi, hr, hi, *CYl)
    return run


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "base"
    print("devices:", jax.devices(), flush=True)
    if which == "base":
        timeit("K1 L=128 HI", k1(128), x)
        timeit("K2 M=128 HI", k2(128), zr0, zi0, Hsr, Hsi)
        timeit("K3 L=128 HI", k3(128), zr0, zi0)
    elif which == "lane256":
        timeit("K1 L=256 HI", k1(256), x)
        timeit("K3 L=256 HI", k3(256), zr0, zi0)
    elif which == "lane512":
        timeit("K1 L=512 HI", k1(512), x)
    elif which == "default":
        timeit("K1 L=128 DEF", k1(128, "default"), x)
        timeit("K2 M=128 DEF", k2(128, "default"), zr0, zi0, Hsr, Hsi)
        timeit("K3 L=128 DEF", k3(128, "default"), zr0, zi0)
    elif which == "m256":
        timeit("K2 M=256 HI", k2(256), zr0, zi0, Hsr, Hsi)
    elif which == "sanity":
        from pfb_tpu.ops.pallas_fft import psf_convolve_pallas_v3_cube

        def full(xx):
            return psf_convolve_pallas_v3_cube(xx, Hsr, Hsi, nx, ny,
                                               row_block=128)
        timeit("full v3 matvec", full, x)
        timeit("K1 L=128 HI (again)", k1(128), x)
    elif which == "flow":
        # natural data-flow chains: K3(K1(x)) -> x' self-composes, and
        # K2 self-composes; no artificial scalar-add dependencies
        k1f, k2f, k3f = k1(128), k2(128), k3(128)

        @jax.jit
        def chain13(xx, n=10):
            for _ in range(n):
                zr, zi = k1f(xx)
                xx = k3f(zr, zi)
            return xx

        @jax.jit
        def chain2(zr, zi, hr, hi, n=10):
            for _ in range(n):
                zr, zi = k2f(zr, zi, hr, hi)
            return zr

        @jax.jit
        def chain_full(xx, hr, hi, n=10):
            from pfb_tpu.ops.pallas_fft import \
                psf_convolve_pallas_v3_cube as f
            for _ in range(n):
                xx = f(xx, hr, hi, nx, ny, row_block=128)
            return xx

        float(jnp.sum(chain13(x)))
        t0 = time.perf_counter()
        float(jnp.sum(chain13(x)))
        print(f"K1+K3 flow: {(time.perf_counter()-t0)*1e2:.2f} ms",
              flush=True)
        float(jnp.sum(chain2(zr0, zi0, Hsr, Hsi)))
        t0 = time.perf_counter()
        float(jnp.sum(chain2(zr0, zi0, Hsr, Hsi)))
        print(f"K2 flow: {(time.perf_counter()-t0)*1e2:.2f} ms",
              flush=True)
        float(jnp.sum(chain_full(x, Hsr, Hsi)))
        t0 = time.perf_counter()
        float(jnp.sum(chain_full(x, Hsr, Hsi)))
        print(f"full flow: {(time.perf_counter()-t0)*1e2:.2f} ms",
              flush=True)
