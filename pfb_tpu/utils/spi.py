"""Spectral-index fitting over image components.

Equivalent of pfb/utils/spi.py (africanus fit_spi_components): fit
I(nu) = I0 (nu/nu0)^alpha per component by weighted Gauss-Newton on
(log-linearised start + nonlinear refinement), vmapped over components
in JAX.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("maxiter",))
def fit_spi_components(data, weights, freqs, freq0, maxiter=100):
    """data (ncomp, nchan), weights (nchan,) or (ncomp, nchan).

    Returns (alpha, alpha_err, i0, i0_err) like africanus'
    fit_spi_components.
    """
    data = jnp.atleast_2d(data)
    if weights.ndim == 1:
        weights = jnp.broadcast_to(weights[None], data.shape)
    w = freqs / freq0
    logw = jnp.log(w)

    def fit_one(y, wgt):
        # initial guess from weighted log-linear fit (positive part)
        ypos = jnp.maximum(y, 1e-10)
        lw = wgt
        A = jnp.stack([jnp.ones_like(logw), logw], axis=1)
        WA = A * lw[:, None]
        coef = jnp.linalg.solve(A.T @ WA + 1e-12 * jnp.eye(2),
                                WA.T @ jnp.log(ypos))
        logi0, alpha = coef

        def gn_step(carry, _):
            logi0, alpha = carry
            model = jnp.exp(logi0) * w**alpha
            r = y - model
            # jacobian wrt (i0, alpha); parametrise i0 directly
            i0 = jnp.exp(logi0)
            J = jnp.stack([w**alpha, model * logw], axis=1)
            WJ = J * wgt[:, None]
            H = J.T @ WJ + 1e-12 * jnp.eye(2)
            g = WJ.T @ r
            di0, dalpha = jnp.linalg.solve(H, g)
            i0 = i0 + di0
            alpha = alpha + dalpha
            return (jnp.log(jnp.maximum(i0, 1e-10)), alpha), None

        (logi0, alpha), _ = jax.lax.scan(gn_step, (logi0, alpha),
                                         None, length=maxiter)
        i0 = jnp.exp(logi0)
        # errors from the final Hessian
        model = i0 * w**alpha
        J = jnp.stack([w**alpha, model * logw], axis=1)
        H = J.T @ (J * wgt[:, None]) + 1e-12 * jnp.eye(2)
        cov = jnp.linalg.inv(H)
        return alpha, jnp.sqrt(cov[1, 1]), i0, jnp.sqrt(cov[0, 0])

    alpha, aerr, i0, ierr = jax.vmap(fit_one)(data, weights)
    return alpha, aerr, i0, ierr


def fit_spi(image_cube, freqs, freq0=None, threshold=0.0, rms=None):
    """SPI map over pixels above threshold (reference utils/spi.py)."""
    nband, nx, ny = image_cube.shape
    if freq0 is None:
        freq0 = float(np.mean(freqs))
    mfs = image_cube.sum(axis=0)
    mask = mfs > threshold
    Ix, Iy = np.where(mask)
    comps = image_cube[:, Ix, Iy].T  # (ncomp, nchan)
    wgts = np.ones(nband) if rms is None else 1.0 / rms**2
    alpha, aerr, i0, ierr = fit_spi_components(
        jnp.asarray(comps), jnp.asarray(wgts), jnp.asarray(freqs),
        freq0)
    alpha_map = np.full((nx, ny), np.nan)
    i0_map = np.full((nx, ny), np.nan)
    alpha_map[Ix, Iy] = np.asarray(alpha)
    i0_map[Ix, Iy] = np.asarray(i0)
    return alpha_map, i0_map
