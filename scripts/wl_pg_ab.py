"""Round-4 kernel lab: attribution A/Bs for the pg-gridder hot paths.

E_fold: 4096^2 w-block spread decomposition — Pallas kernel alone vs
        +tile-validity mask vs +fold (is the dense (2nw, ntiles, Thx,
        Thy) buffer the cost, or the entry stream?)
E_fft:  c2c stack FFT — mmfft four-step vs a twiddle-absorbed batched
        stage variant vs XLA fft2, at 2048^2 (1024-grid case) and
        8192^2 x4 planes (4096-w-block case).
E_es:   spread kernel with the ES evaluation replaced by constants
        (VPU-es share of the per-entry cost).
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pfb_tpu.ops import pgridder as pg
from pfb_tpu.ops.mmgridder import _fold_tiles

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


def case():
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


# ---------------- E_fft variants ----------------

def fft2_absorbed(xr, xi, inverse=False):
    """Four-step with the twiddle absorbed into a BATCHED stage-2:
    c[..., j(k1), k2] = sum_n2 W2tw[j, k2, n2] a[..., j, n2] — no
    elementwise twiddle pass over the data."""
    from pfb_tpu.ops.mmfft import _factor
    from functools import lru_cache

    def plan(N, inv):
        N1, N2 = _factor(N)
        sign = 2.0 if inv else -2.0
        n1 = np.arange(N1)
        n2 = np.arange(N2)
        W1 = np.exp(sign * 1j * np.pi * np.outer(n1, n1) / N1)
        W2 = np.exp(sign * 1j * np.pi * np.outer(n2, n2) / N2)
        tw = np.exp(sign * 1j * np.pi * np.outer(n1, n2) / N)
        W2tw = W2[None, :, :] * tw[:, None, :]   # (N1, N2, N2)
        f32 = np.float32
        return (N1, N2, W1.real.astype(f32), W1.imag.astype(f32),
                W2tw.real.astype(f32), W2tw.imag.astype(f32))

    def last(xr, xi, N, inv):
        N1, N2, W1r, W1i, W2r, W2i = plan(N, inv)
        lead = xr.shape[:-1]
        xr = xr.reshape(*lead, N1, N2)
        xi = xi.reshape(*lead, N1, N2)
        hi = jax.lax.Precision.HIGHEST

        def s1(A, B):
            return jnp.einsum("kn,...nm->...km", A, B, precision=hi)

        ar = s1(jnp.asarray(W1r), xr) - s1(jnp.asarray(W1i), xi)
        ai = s1(jnp.asarray(W1r), xi) + s1(jnp.asarray(W1i), xr)

        def s2(A, B):
            return jnp.einsum("jkn,...jn->...jk", A, B, precision=hi)

        cr = s2(jnp.asarray(W2r), ar) - s2(jnp.asarray(W2i), ai)
        ci = s2(jnp.asarray(W2r), ai) + s2(jnp.asarray(W2i), ar)
        # output index k = k1 + N1 k2: lay out (k2, k1)
        yr = jnp.swapaxes(cr, -1, -2).reshape(*lead, N)
        yi = jnp.swapaxes(ci, -1, -2).reshape(*lead, N)
        if inv:
            yr, yi = yr / N, yi / N
        return yr, yi

    n_last, n_prev = xr.shape[-1], xr.shape[-2]
    yr, yi = last(xr, xi, n_last, inverse)
    yr = jnp.swapaxes(yr, -1, -2)
    yi = jnp.swapaxes(yi, -1, -2)
    yr, yi = last(yr, yi, n_prev, inverse)
    return jnp.swapaxes(yr, -1, -2), jnp.swapaxes(yi, -1, -2)


def main():
    uvw, freq, cell, vr, vi = case()

    # ---------------- E_fft ----------------
    from pfb_tpu.ops.mmfft import fft2_mm
    rng = np.random.default_rng(1)
    for shape, label in ():
        xr = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        xi = jnp.asarray(rng.normal(size=shape).astype(np.float32))

        def f_mm(xr, xi, s):
            yr, yi = fft2_mm(xr + s, xi)
            return yr + yi

        def f_ab(xr, xi, s):
            yr, yi = fft2_absorbed(xr + s, xi)
            return yr + yi

        def f_xla(xr, xi, s):
            y = jnp.fft.fft2(lax.complex(xr + s, xi))
            return y.real + y.imag

        t1 = timeit(chain(f_mm, xr, xi), f"fft2_mm {label}")
        t2 = timeit(chain(f_ab, xr, xi), f"fft2_absorbed {label}")
        t3 = timeit(chain(f_xla, xr, xi), f"fft2_xla {label}")
        # accuracy of absorbed vs mm
        a = fft2_absorbed(xr[:1], xi[:1])
        b = fft2_mm(xr[:1], xi[:1])
        err = float(jnp.max(jnp.abs(a[0] - b[0])) /
                    jnp.max(jnp.abs(b[0])))
        print(f"  absorbed-vs-mm rel err: {err:.2e}", flush=True)
        del xr, xi

    # ---------------- E_fold (4096 block 2) ----------------
    # The E_fold 4096^2 w-block section was removed in round 5: the
    # blocked plan layout changed to the global-stream design
    # (ops/pg_stream.py); see scripts/profile_pg_bench.py for the
    # current bench-scale decomposition.


if __name__ == "__main__":
    main()
