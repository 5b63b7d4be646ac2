"""Jones-corrected Stokes visibilities and weights via sympy codegen.

The reference derives, per Stokes product and polarisation basis, the
weighted data and weight expressions

    W = T.H M.H Sinv M T          (Stokes-space inverse covariance)
    C = W^{-1} T.H M.H Sinv V     (corrected Stokes coherency)

symbolically and numba-compiles them per (row, chan)
(pfb/utils/stokes.py:13-232). Here the same sympy derivation is kept —
it IS the spec — but lambdified to jax.numpy and vmapped over (row,
chan), so the whole Jones application is one fused XLA program instead
of a scalar kernel.

Jones layout follows QuartiCal like the reference: diag mode jones has
shape (ntime, nant, nchan, ndir, 2); full mode (..., 2, 2) flattened to
4 correlations (gain_axes, utils/stokes2vis.py upstream).
"""

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
import sympy as sm
from sympy.physics.quantum import TensorProduct
from sympy.utilities.lambdify import lambdify

_JAXMOD = [{"conjugate": jnp.conj, "Abs": jnp.abs, "im": jnp.imag,
            "re": jnp.real, "sqrt": jnp.sqrt}, "numpy"]

_PRODUCTS = {"I": 0, "Q": 1, "U": 2, "V": 3}


@lru_cache(maxsize=None)
def stokes_funcs(product="I", pol="linear", mode="diag"):
    """Return (vis_fn, wgt_fn) operating elementwise on arrays.

    diag mode:
        wgt_fn(gp0, gp1, gq0, gq1, w0, w1, w2, w3) -> real weight
        vis_fn(gp0, gp1, gq0, gq1, w0, w1, w2, w3,
               v00, v01, v10, v11) -> complex corrected Stokes vis
    full mode: gp/gq take all four complex entries.

    Derivation identical to the reference (pfb/utils/stokes.py:13-70).
    """
    gp00, gp10, gp01, gp11 = sm.symbols("gp00 gp10 gp01 gp11", real=False)
    gq00, gq10, gq01, gq11 = sm.symbols("gq00 gq10 gq01 gq11", real=False)
    w0, w1, w2, w3 = sm.symbols("W0 W1 W2 W3", real=True)
    v00, v10, v01, v11 = sm.symbols("v00 v10 v01 v11", real=False)

    Gp = sm.Matrix([[gp00, gp01], [gp10, gp11]])
    Gq = sm.Matrix([[gq00, gq01], [gq10, gq11]])
    Mpq = TensorProduct(Gp, Gq.conjugate())
    Mpqinv = TensorProduct(Gp.inv(), Gq.conjugate().inv())

    Sinv = sm.diag(w0, w1, w2, w3)
    S = Sinv.inv()
    Vpq = sm.Matrix([[v00], [v01], [v10], [v11]])

    if pol == "linear":
        T = sm.Matrix([[1.0, 1.0, 0, 0],
                       [0, 0, 1.0, 1.0j],
                       [0, 0, 1.0, -1.0j],
                       [1.0, -1.0, 0, 0]])
    elif pol == "circular":
        T = sm.Matrix([[1.0, 0, 0, 1.0],
                       [0, 1.0, 1.0j, 0],
                       [0, 1.0, -1.0j, 0],
                       [1.0, 0, 0, -1.0]])
    else:
        raise ValueError(f"Unknown pol basis {pol}")
    Tinv = T.inv()

    W = T.H * Mpq.H * Sinv * Mpq * T
    Winv = Tinv * Mpqinv * S * Mpqinv.H * Tinv.H
    C = Winv * (T.H * (Mpq.H * (Sinv * Vpq)))

    i = _PRODUCTS[product]

    if mode == "diag":
        subs = [(gp10, 0), (gp01, 0), (gq10, 0), (gq01, 0)]
        Wii = sm.simplify(sm.expand(W[i, i].subs(subs)))
        Ci = sm.simplify(sm.expand(C[i].subs(subs)))
        wargs = (gp00, gp11, gq00, gq11, w0, w1, w2, w3)
        vargs = wargs + (v00, v01, v10, v11)
    elif mode == "full":
        Wii = sm.simplify(sm.expand(W[i, i]))
        Ci = sm.simplify(sm.expand(C[i]))
        wargs = (gp00, gp01, gp10, gp11, gq00, gq01, gq10, gq11,
                 w0, w1, w2, w3)
        vargs = wargs + (v00, v01, v10, v11)
    else:
        raise ValueError(f"Unknown jones mode {mode}")

    wfn = lambdify(wargs, Wii, modules=_JAXMOD)
    vfn = lambdify(vargs, Ci, modules=_JAXMOD)
    return vfn, wfn


@partial(jax.jit, static_argnames=("product", "pol", "mode"))
def weight_data(data, weight, flag, jones, tbin_map, ant1, ant2,
                product="I", pol="linear", mode="diag"):
    """Vectorised Jones-corrected Stokes visibilities + weights.

    data:   (nrow, nchan, ncorr) complex, ncorr in {1, 2, 4}
    weight: (nrow, nchan, ncorr) real
    flag:   (nrow, nchan) bool/int (True = flagged)
    jones:  (ntime, nant, nchan, ndir, 2) complex for diag mode
    tbin_map: (nrow,) time-bin index per row
    ant1/ant2: (nrow,)

    Returns (vis, wgt) each (nrow, nchan) — the TPU equivalent of
    _weight_data (pfb/utils/weighting.py:298-350).
    """
    ncorr = data.shape[-1]

    gp = jones[tbin_map, ant1, :, 0, :]  # (nrow, nchan, 2) diag
    gq = jones[tbin_map, ant2, :, 0, :]

    if ncorr == 1:
        # single-corr product (reference pfb/utils/correlations.py:
        # 220-234): scalar gains, measurement v = gp * C * conj(gq).
        # ML estimate C = v / (gp conj(gq)), weight = W |gp|^2 |gq|^2
        # — the reference's vis_func/wgt_func pair with the corrected
        # (weight-normalised) convention the other branches use.
        if product != "I":
            raise ValueError("single-corr data holds only product I")
        g_p, g_q = gp[..., 0], gq[..., 0]
        w0 = weight[..., 0]
        a2 = jnp.real(g_p * jnp.conj(g_p) * g_q * jnp.conj(g_q))
        wgt = w0 * a2
        vis = data[..., 0] * jnp.conj(g_p) * g_q / jnp.where(
            a2 > 0, a2, 1.0)
        ok = (flag == 0) & (a2 > 0)
        return jnp.where(ok, vis, 0.0), jnp.where(ok, wgt, 0.0)

    vfn, wfn = stokes_funcs(product, pol, mode)

    if ncorr == 4:
        w = [weight[..., 0], weight[..., 1], weight[..., 2],
             weight[..., 3]]
        v = [data[..., 0], data[..., 1], data[..., 2], data[..., 3]]
    elif ncorr == 2:
        one = jnp.ones_like(weight[..., 0])
        zero = jnp.zeros_like(data[..., 0])
        w = [weight[..., 0], one, one, weight[..., -1]]
        v = [data[..., 0], zero, zero, data[..., -1]]
    else:
        raise ValueError(f"ncorr={ncorr} not supported")

    if mode == "diag":
        gargs = (gp[..., 0], gp[..., 1], gq[..., 0], gq[..., 1])
    else:
        gargs = (gp[..., 0], gp[..., 1], gp[..., 2], gp[..., 3],
                 gq[..., 0], gq[..., 1], gq[..., 2], gq[..., 3])

    wgt = jnp.real(wfn(*gargs, *w))
    vis = vfn(*gargs, *w, *v)
    ok = (flag == 0)
    return jnp.where(ok, vis, 0.0), jnp.where(ok, wgt, 0.0)


def unity_jones(ntime, nant, nchan):
    """Identity diag Jones (no gain corruption)."""
    return np.ones((ntime, nant, nchan, 1, 2), dtype=np.complex128)
