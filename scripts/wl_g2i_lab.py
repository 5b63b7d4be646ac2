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

    # bf16x3 (manual Precision.HIGH): can the ~7 ms stage-2 HIGHEST
    # cost halve without losing the eps=1e-5 regime? (Mosaic rejects
    # the HIGH enum; 3 DEFAULT bf16 passes implement it by hand)
    DE = jax.lax.Precision.DEFAULT

    def _d3(dot, A, B):
        ah = A.astype(jnp.bfloat16).astype(jnp.float32)
        al = A - ah
        bh = B.astype(jnp.bfloat16).astype(jnp.float32)
        bl = B - bh
        return (dot(ah, bh, DE) + dot(ah, bl, DE)
                + dot(al, bh, DE))

    def _cmm3(dot, wr_, wi_, xr_, xi_):
        rr = _d3(dot, wr_, xr_) - _d3(dot, wi_, xi_)
        ii = _d3(dot, wr_, xi_) + _d3(dot, wi_, xr_)
        return rr, ii

    def k_3x(xr_ref, xi_ref, w1r_, w1i_, w2r_, w2i_, or_, oi_):
        w1r, w1i = w1r_[...], w1i_[...]
        w2r, w2i = w2r_[...], w2i_[...]
        N2_, N1_, n1_in = w1r.shape
        L_ = xr_ref.shape[-1]
        xr = xr_ref[...].reshape(n1_in, N2_, L_).transpose(1, 0, 2)
        xi = xi_ref[...].reshape(n1_in, N2_, L_).transpose(1, 0, 2)
        cr, ci = _cmm3(_dotg_b1, w1r, w1i, xr, xi)
        yr, yi = _cmm3(_dotg_left0, w2r, w2i, cr, ci)
        or_[...] = yr.reshape(or_.shape)
        oi_[...] = yi.reshape(oi_.shape)

    try:
        run(k_3x, Nout, "8192 pass1 bf16x3 both stages")
    except Exception as e:
        print(f"8192 pass1 bf16x3: {type(e).__name__}: "
              f"{str(e)[:90]}", flush=True)

    # accuracy: bf16x3 vs HIGHEST on one strip batch
    def once(kern, nout, cs=C):
        so = pl.BlockSpec((1, nout, L), lambda p, j: (p, 0, j),
                          memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kern, grid=(P, N // L),
            in_specs=[strip_in, strip_in] + [full(c.shape)
                                             for c in cs],
            out_specs=(so, so),
            out_shape=(jax.ShapeDtypeStruct((P, nout, N),
                                            jnp.float32),) * 2,
            **kw)(xr, xi, *cs)

    try:
        ar, ai = once(k_full, Nout)
        br, bi = once(k_3x, Nout)
        num = float(jnp.max(jnp.abs(ar - br))
                    + jnp.max(jnp.abs(ai - bi)))
        den = float(jnp.max(jnp.abs(ar)) + jnp.max(jnp.abs(ai)))
        print(f"8192 pass1 bf16x3 rel err vs HIGHEST: "
              f"{num/den:.2e}", flush=True)
    except Exception as e:
        print(f"bf16x3 accuracy check: {type(e).__name__}: "
              f"{str(e)[:90]}", flush=True)


def memcpy_variants():
    """E_floor: what sets the 11.5 ms pass1 memcpy floor at 8192^2?
    single-in/single-out vs 2x2 streams vs plane-batched blocks."""
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, P = 8192, 4
    rng = np.random.default_rng(0)
    xr = jnp.asarray(rng.normal(size=(P, N, N)).astype(np.float32))
    xi = jnp.asarray(rng.normal(size=(P, N, N)).astype(np.float32))
    Nout = N // 2
    kw = dict(compiler_params=pltpu.CompilerParams(
        vmem_limit_bytes=110 * 1024 * 1024))

    def k1io(x_ref, o_ref):
        o_ref[...] = x_ref[:, :Nout]

    def f_single(xr, xi, s):
        y = pl.pallas_call(
            k1io, grid=(P, N // 128),
            in_specs=[pl.BlockSpec((1, N, 128),
                                   lambda p, j: (p, 0, j),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, Nout, 128),
                                   lambda p, j: (p, 0, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((P, Nout, N), jnp.float32),
            **kw)(xr + s)
        return y[:, 0]

    timeit(chain(f_single, xr, xi), "8192 memcpy 1-in/1-out")

    # contiguous row-strip blocks (1, S, N): full-width lane reads
    # (32 KB bursts) instead of the 512 B strided chunks of the
    # (1, N, 128) strips — the hypothesised fix for the 34%-of-peak
    # strip floor
    for S in (64, 128, 256):
        def krow(x_ref, o_ref):
            o_ref[...] = x_ref[..., :Nout]

        def f_row(xr, xi, s, S=S):
            y = pl.pallas_call(
                krow, grid=(P, N // S),
                in_specs=[pl.BlockSpec((1, S, N),
                                       lambda p, j: (p, j, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((1, S, Nout),
                                       lambda p, j: (p, j, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((P, N, Nout),
                                               jnp.float32),
                **kw)(xr + s)
            return y[:, 0]

        try:
            timeit(chain(f_row, xr, xi),
                   f"8192 memcpy contiguous rows S={S}")
        except Exception as e:
            print(f"8192 memcpy contiguous rows S={S}: "
                  f"{type(e).__name__}: {str(e)[:90]}", flush=True)

    # contiguous rows + in-VMEM lane-split/stack to (S*64, 128) and
    # back — the relayout a lane-axis four-step needs (is it cheap?)
    S = 128
    N1s = N // 128

    def ksplit(x_ref, o_ref):
        x = x_ref[0]                       # (S, N)
        parts = [x[:, j * 128:(j + 1) * 128] for j in range(N1s)]
        st = jnp.concatenate(parts, axis=0)    # (N1s*S, 128)
        st = st + 1.0
        outp = [st[j * S:(j + 1) * S] for j in range(N1s // 2)]
        o_ref[0] = jnp.concatenate(outp, axis=1)   # (S, Nout)

    def f_split(xr, xi, s):
        y = pl.pallas_call(
            ksplit, grid=(P, N // S),
            in_specs=[pl.BlockSpec((1, S, N),
                                   lambda p, j: (p, j, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, S, Nout),
                                   lambda p, j: (p, j, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((P, N, Nout), jnp.float32),
            **kw)(xr + s)
        return y[:, 0]

    try:
        timeit(chain(f_split, xr, xi),
               "8192 contiguous rows + lane-split/stack S=128")
    except Exception as e:
        print(f"8192 lane-split/stack: {type(e).__name__}: "
              f"{str(e)[:90]}", flush=True)

    def kbatch(x_ref, o_ref):
        o_ref[...] = x_ref[:, :Nout]

    def f_batch(xr, xi, s):
        y = pl.pallas_call(
            kbatch, grid=(N // 128,),
            in_specs=[pl.BlockSpec((P, N, 128),
                                   lambda j: (0, 0, j),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((P, Nout, 128),
                                   lambda j: (0, 0, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((P, Nout, N), jnp.float32),
            **kw)(xr + s)
        return y[:, 0]

    timeit(chain(f_batch, xr, xi), "8192 memcpy plane-batched blocks")


def pair_ilp_probe():
    """E_pair: TIMING-ONLY probe of inter-entry ILP in the spread —
    process two consecutive entries per grid step (results are WRONG
    when the pair straddles tiles; only the wall time matters)."""
    import jax
    from functools import partial
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from pfb_tpu.ops import pgridder as pg

    rng = np.random.default_rng(0)
    nrow, nchan = 125_000, 8
    uvw = rng.normal(scale=1000.0, size=(nrow, 3))
    uvw[:, 2] *= 0.1
    freq = np.linspace(0.9e9, 1.1e9, nchan)
    umax = np.abs(uvw[:, :2]).max() * freq[-1] / 299792458.0
    cell = 1.0 / (2.0 * umax * 2.0)
    p1 = pg.pgrid_plan(uvw, freq, nx=1024, ny=1024, cellx=cell,
                       celly=cell, epsilon=1e-5, do_wgridding=True)
    E = p1["pos"].shape[0] // 2 * 2
    pos2 = p1["pos"][:E].reshape(E // 2, 2, 8, p1["C"])
    pos2 = jnp.concatenate([pos2[:, 0], pos2[:, 1]], axis=-1)
    tid2 = p1["tid"][:E:2]
    vr = rng.normal(size=(nrow, nchan)).astype(np.float32)
    visp = jnp.asarray(
        np.zeros((E // 2, 2, 2 * p1["C"]), np.float32))
    k, beta, nw = p1["k"], p1["beta"], p1["nw"]
    Thx, Thy, C = p1["txs"] + k, p1["tys"] + k, p1["C"]

    def kern(tp_ref, pk_ref, vis_ref, out_ref, *, prec):
        e = pl.program_id(0)
        dt = out_ref.dtype
        kh = k / 2.0
        u = pk_ref[0, 0, :]          # (2C,) two entries' u
        v = pk_ref[0, 1, :]
        wf = pk_ref[0, 2, :]
        xs = lax.broadcasted_iota(jnp.int32, (Thx, 2 * C),
                                  0).astype(dt)
        CUT = pg._es((xs - u[None, :]) / kh, beta, k)
        ys = lax.broadcasted_iota(jnp.int32, (2 * C, Thy),
                                  1).astype(dt)
        CV = pg._es((ys - v[:, None]) / kh, beta, k)
        ps = lax.broadcasted_iota(jnp.int32, (nw, 2 * C),
                                  0).astype(dt)
        CW = pg._es((ps - wf[None, :]) / kh, beta, k)
        A = (CW[:, None, :] * CUT[None, :, :]).reshape(
            nw * Thx, 2 * C)
        vr_ = vis_ref[0, 0, :]
        vi_ = vis_ref[0, 1, :]
        CVv = jnp.concatenate([CV * vr_[:, None], CV * vi_[:, None]],
                              axis=1)
        res = lax.dot_general(A, CVv, (((1,), (0,)), ((), ())),
                              precision=prec,
                              preferred_element_type=dt)
        res = res.reshape(nw, Thx, 2 * Thy)
        out_ref[0, :, 0] += res[..., :Thy]
        out_ref[1, :, 0] += res[..., Thy:]

    ntiles = int(p1["ntx"]) * int(p1["nty"])

    def f(pos2, visp, s):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(E // 2,),
            in_specs=[pl.BlockSpec((1, 8, 2 * C),
                                   lambda e, *_: (e, 0, 0)),
                      pl.BlockSpec((1, 2, 2 * C),
                                   lambda e, *_: (e, 0, 0))],
            out_specs=pl.BlockSpec((2, nw, 1, Thx, Thy),
                                   lambda e, t: (0, 0, t[e], 0, 0)),
        )
        Y = pl.pallas_call(
            partial(kern, prec=lax.Precision.HIGHEST),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((2, nw, ntiles, Thx, Thy),
                                           jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(tid2.astype(jnp.int32), pos2 + s, visp)
        return Y[:, :, 0]

    timeit(chain(f, pos2, visp),
           f"1024 spread PAIRED entries ({E // 2} steps, timing-only)")


if __name__ == "__main__":
    import sys as _s
    if "--floor" in _s.argv:
        memcpy_variants()
        pair_ilp_probe()
    else:
        main()
        pass1_variants()
