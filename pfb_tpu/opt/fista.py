"""FISTA: accelerated proximal gradient with backtracking.

Reference: pfb/opt/fista.py:11-100 (used by the legacy NNLS
initialisation). Solves min_x f(x) + lam * g(x) given grad(f) and
prox_g.
"""

import jax.numpy as jnp
from jax import lax

from pfb_tpu.opt.pcg import norm_diff


def fista(fprime, prox, x0, beta, tol=1e-5, maxit=500):
    """Accelerated proximal-gradient iteration.

    Parameters
    ----------
    fprime : callable x -> (fval, gradient) of the smooth term
    prox   : callable (x, step) -> prox step of the nonsmooth term
    x0     : initial guess
    beta   : Lipschitz estimate of grad f (step size 1/beta), grown by
             backtracking (factor 2) when the quadratic upper bound is
             violated, like the reference.
    """
    fidp, fprimep = fprime(x0)

    def cond(state):
        x, y, t, beta, eps, k = state
        return (eps > tol) & (k < maxit)

    def body(state):
        x, y, t, beta, eps, k = state
        xp = x
        fid, gradn = fprime(y)

        def bt_cond(bt):
            beta_, x_, fidn, flam = bt
            return fidn > flam

        def bt_body(bt):
            beta_, x_, fidn, flam = bt
            beta_ = beta_ * 2.0
            x_ = prox(y - gradn / beta_, 1.0 / beta_)
            fidn, _ = fprime(x_)
            delta = x_ - y
            flam = fid + jnp.vdot(gradn, delta).real + \
                0.5 * beta_ * jnp.vdot(delta, delta).real
            return beta_, x_, fidn, flam

        x = prox(y - gradn / beta, 1.0 / beta)
        fidn, _ = fprime(x)
        delta = x - y
        flam = fid + jnp.vdot(gradn, delta).real + \
            0.5 * beta * jnp.vdot(delta, delta).real
        beta, x, fidn, flam = lax.while_loop(
            bt_cond, bt_body, (beta, x, fidn, flam))

        tp = t
        t = (1.0 + jnp.sqrt(1.0 + 4.0 * tp**2)) / 2.0
        gamma = (tp - 1.0) / t
        y = x + gamma * (x - xp)
        eps = norm_diff(x, xp)
        return x, y, t, beta, eps, k + 1

    dt = jnp.result_type(x0.dtype, jnp.float32)
    state0 = (x0, x0, jnp.asarray(1.0, dt), jnp.asarray(beta, dt),
              jnp.asarray(1.0, dt), jnp.asarray(0, jnp.int32))
    x, y, t, beta, eps, k = lax.while_loop(cond, body, state0)
    return x
