"""Fit image cubes to continuous time/frequency models and evaluate
them (the sympy-parametrised mds model of the reference).

Equivalents of fit_image_cube (pfb/utils/misc.py:1084-1214),
eval_coeffs_to_cube (:1217-1235) and eval_coeffs_to_slice (:1238-1313).
Host-side numpy/sympy — these run once per major iteration on small
coefficient sets.
"""

import numpy as np
import sympy as sm
from scipy.interpolate import RegularGridInterpolator
from sympy.parsing.sympy_parser import parse_expr
from sympy.utilities.lambdify import lambdify


def fit_image_cube(time, freq, image, wgt=None, nbasist=None,
                   nbasisf=None, method="poly", sigmasq=0):
    """Weighted least-squares fit of the (ntime, nband, nx, ny) image
    cube onto monomial or Legendre time/freq bases.

    Returns (coeffs, Ix, Iy, expr, params, texpr, fexpr) exactly like
    the reference (misc.py:1084-1214): expr is the symbolic expression
    string in (t, f) with parameter symbols params; texpr/fexpr map raw
    time/freq to the scaled fit coordinates.
    """
    time = np.atleast_1d(np.asarray(time, dtype=float))
    freq = np.atleast_1d(np.asarray(freq, dtype=float))
    ntime = time.size
    nband = freq.size
    ref_time = time[0]
    ref_freq = freq[0]
    from sympy.abc import a, f, t

    if nbasist is None:
        nbasist = ntime
    else:
        assert nbasist <= ntime
    if nbasisf is None:
        nbasisf = nband
    else:
        assert nbasisf <= nband

    mask = np.any(image, axis=(0, 1))
    Ix, Iy = np.where(mask)
    ncomps = Ix.size

    beta = image[:, :, Ix, Iy].reshape(ntime * nband, ncomps)
    if wgt is not None:
        wgt = wgt.reshape(ntime * nband, 1)
    else:
        wgt = np.ones((ntime * nband, 1), dtype=float)

    tfunc = t
    ffunc = f
    if ntime == 1 and nband == 1:
        coeffs = beta
        expr = a
        params = (a,)
    elif method == "poly":
        wt = time / ref_time
        tfunc = t / ref_time
        Xfit = np.tile(wt[:, None], (nband, nbasist)) ** \
            np.arange(nbasist)
        params = sm.symbols(f"t(0:{nbasist})")
        expr = sum(co * t**i for i, co in enumerate(params))
        if nband > 1:
            wf = freq / ref_freq
            ffunc = f / ref_freq
            Xf = np.tile(wf[:, None], (ntime, nbasisf - 1)) ** \
                np.arange(1, nbasisf)
            Xfit = np.hstack((Xfit, Xf))
            paramsf = sm.symbols(f"f(1:{nbasisf})")
            expr += sum(co * f**(i + 1) for i, co in enumerate(paramsf))
            params += paramsf
    elif method == "Legendre":
        if ntime > 1:
            tmax, tmin = time.max(), time.min()
            wt = time - (tmax + tmin) / 2
            wtmax = wt.max()
            wt = wt / wtmax
            tfunc = (t - (tmax + tmin) / 2) / wtmax
        else:
            wt = time
            tfunc = t
        Xt = np.zeros((ntime, nbasist), dtype=float)
        params = sm.symbols(f"t(0:{nbasist})")
        if nbasist > 1:
            expr = 0
            for i in range(nbasist):
                Xt[:, i] = np.polynomial.Legendre.basis(i)(wt)
                expr += sm.polys.orthopolys.legendre_poly(i, t) * params[i]
        else:
            Xt[...] = 1.0
            expr = params[0]
        Xfit = np.tile(Xt, (nband, 1))
        if nband > 1:
            paramsf = sm.symbols(f"f(1:{nbasisf})")
            Xf = np.zeros((nband, nbasisf - 1))
            fmax, fmin = freq.max(), freq.min()
            wf = freq - (fmax + fmin) / 2
            wfmax = wf.max()
            wf = wf / wfmax
            ffunc = (f - (fmax + fmin) / 2) / wfmax
            for i in range(1, nbasisf):
                Xf[:, i - 1] = np.polynomial.Legendre.basis(i)(wf)
                expr += sm.polys.orthopolys.legendre_poly(i, f) * \
                    paramsf[i - 1]
            Xf = np.tile(Xf, (ntime, 1))
            Xfit = np.hstack((Xfit, Xf))
            params += paramsf
    else:
        raise NotImplementedError(f"Unknown fit method {method}")

    dirty_coeffs = Xfit.T.dot(wgt * beta)
    hess_coeffs = Xfit.T.dot(wgt * Xfit)
    if sigmasq:
        hess_coeffs += sigmasq * np.eye(hess_coeffs.shape[0])
    coeffs = np.linalg.solve(hess_coeffs, dirty_coeffs)

    return (coeffs, Ix, Iy, str(expr), list(map(str, params)),
            str(tfunc), str(ffunc))


def _model_funcs(expr, paramf, texpr, fexpr):
    params = sm.symbols(("t", "f"))
    params += sm.symbols(tuple(paramf))
    modelf = lambdify(params, parse_expr(expr))
    tfunc = lambdify(params[0], parse_expr(texpr))
    ffunc = lambdify(params[1], parse_expr(fexpr))
    return modelf, tfunc, ffunc


def eval_coeffs_to_cube(time, freq, nx, ny, coeffs, Ix, Iy, expr,
                        paramf, texpr, fexpr):
    """Render the fitted model onto an (ntime, nfreq, nx, ny) pixel cube
    (reference misc.py:1217-1235)."""
    time = np.atleast_1d(time)
    freq = np.atleast_1d(freq)
    image = np.zeros((time.size, freq.size, nx, ny), dtype=float)
    modelf, tfunc, ffunc = _model_funcs(expr, paramf, texpr, fexpr)
    for i, tval in enumerate(time):
        for j, fval in enumerate(freq):
            image[i, j, Ix, Iy] = modelf(tfunc(tval), ffunc(fval),
                                         *coeffs)
    return image


def eval_coeffs_to_slice(time, freq, coeffs, Ix, Iy, expr, paramf,
                         texpr, fexpr, nxi, nyi, cellxi, cellyi, x0i,
                         y0i, nxo, nyo, cellxo, cellyo, x0o, y0o):
    """Render the model at one (time, freq) onto a possibly different
    image grid, zero-padding + linear regridding as needed
    (reference misc.py:1238-1313)."""
    image_in = np.zeros((nxi, nyi), dtype=float)
    modelf, tfunc, ffunc = _model_funcs(expr, paramf, texpr, fexpr)
    image_in[Ix, Iy] = modelf(tfunc(time), ffunc(freq), *coeffs)

    xin = (-(nxi // 2) + np.arange(nxi)) * cellxi + x0i
    yin = (-(nyi // 2) + np.arange(nyi)) * cellyi + y0i
    xo = (-(nxo // 2) + np.arange(nxo)) * cellxo + x0o
    yo = (-(nyo // 2) + np.arange(nyo)) * cellyo + y0o

    def pad_amount(diff, cell):
        return int(np.ceil(diff / cell)) if diff > 0.0 else 0

    npadxl = pad_amount(xin.min() - xo.min(), cellxi)
    npadyl = pad_amount(yin.min() - yo.min(), cellyi)
    npadxu = pad_amount(xo.max() - xin.max(), cellxi)
    npadyu = pad_amount(yo.max() - yin.max(), cellyi)

    if npadxl or npadxu or npadyl or npadyu:
        image_in = np.pad(image_in, ((npadxl, npadxu), (npadyl, npadyu)),
                          mode="constant")
        xin = (-(nxi // 2 + npadxl) +
               np.arange(nxi + npadxl + npadxu)) * cellxi + x0i
        nxi = nxi + npadxl + npadxu
        yin = (-(nyi // 2 + npadyl) +
               np.arange(nyi + npadyl + npadyu)) * cellyi + y0i
        nyi = nyi + npadyl + npadyu

    do_interp = (cellxi != cellxo or cellyi != cellyo or x0i != x0o or
                 y0i != y0o or nxi != nxo or nyi != nyo)
    if do_interp:
        interpo = RegularGridInterpolator((xin, yin), image_in,
                                          bounds_error=True,
                                          method="linear")
        xx, yy = np.meshgrid(xo, yo, indexing="ij")
        return interpo((xx, yy))
    return image_in
