"""Primal-dual solver tests.

Upstream has no direct unit test for primal_dual (covered via the
spotless integration test); here we verify it solves the SARA problem on
a synthetic deconvolution: with lam=0 it must match the unconstrained
positive solution, and with lam>0 it must reduce the objective and
respect positivity."""

import jax.numpy as jnp
import numpy as np
from numpy.testing import assert_allclose

from pfb_tpu.ops.fft import make_psfhat
from pfb_tpu.ops.psf import make_psf_convolve
from pfb_tpu.ops.psi import make_psi, psi_dot, psi_hdot
from pfb_tpu.opt.power_method import power_method
from pfb_tpu.opt.primal_dual import apply_positivity, primal_dual


def _setup(nband=2, nx=32, ny=32, seed=0):
    rng = np.random.default_rng(seed)
    nxp, nyp = 2 * nx, 2 * ny
    xg = np.arange(nxp) - nxp // 2
    xx, yy = np.meshgrid(xg, xg, indexing="ij")
    psf = np.zeros((nband, nxp, nyp))
    for b in range(nband):
        psf[b] = 0.4 * np.exp(-0.5 * (xx**2 + yy**2) / (1.5 + b) ** 2)
        psf[b, nxp // 2, nyp // 2] += 0.6
    psfhat = make_psfhat(jnp.asarray(psf))
    hess = make_psf_convolve(psfhat, nyp)

    model = np.zeros((nband, nx, ny))
    for _ in range(4):
        i, j = rng.integers(4, nx - 4), rng.integers(4, ny - 4)
        model[:, i, j] = 1.0 + rng.random()
    model_j = jnp.asarray(model)
    data = hess(model_j)
    return hess, model, data


def test_primal_dual_positivity_modes():
    x = jnp.asarray(np.array([[[1.0, -1.0], [0.5, 2.0]],
                              [[-2.0, 3.0], [1.0, 1.0]]]))
    x1 = np.asarray(apply_positivity(x, 1))
    assert (x1 >= 0).all()
    x2 = np.asarray(apply_positivity(x, 2))
    # pixel (0,0) has band1<0 -> all bands zeroed; (0,1) has band0<0
    assert x2[0, 0, 0] == 0 and x2[1, 0, 0] == 0
    assert x2[0, 0, 1] == 0 and x2[1, 0, 1] == 0
    assert x2[0, 1, 1] == 2.0 and x2[1, 1, 1] == 1.0


def test_primal_dual_recovers_model():
    """With a tiny lam the PD solution of
    min (1/2)|x - model|_A^2 + lam|Psi.H x|_21, x>=0 is ~model."""
    hess, model, data = _setup()
    nband, nx, ny = model.shape
    psi = make_psi(nx, ny, ("self", "db1", "db2"), 2)
    nbasis = psi.nbasis

    L, _ = power_method(hess, (nband, nx, ny), tol=1e-8, maxit=200,
                        dtype=jnp.float64)
    L = float(L) * 1.05

    def grad(x):
        return hess(x) - data

    def psiH_fn(x):
        return psi_dot(x, psi)

    def psi_fn(a):
        return psi_hdot(a, psi)

    v0 = jnp.zeros((nband, nbasis, psi.Nymax, psi.Nxmax))
    w = jnp.ones((nbasis, psi.Nymax, psi.Nxmax))
    x0 = jnp.zeros((nband, nx, ny))
    lam = 1e-8
    x, v, wf, k = primal_dual(x0, v0, lam, psiH_fn, psi_fn, L, w, grad,
                              nu=nbasis, tol=1e-7, maxit=2000,
                              positivity=1)
    x = np.asarray(x)
    assert int(k) < 2000
    assert_allclose(x, model, atol=5e-4)


def test_primal_dual_l21_shrinks():
    """Moderate lam shrinks the l21 norm of the solution vs lam~0 and
    keeps positivity."""
    hess, model, data = _setup(seed=1)
    nband, nx, ny = model.shape
    psi = make_psi(nx, ny, ("self", "db1"), 2)
    nbasis = psi.nbasis
    L, _ = power_method(hess, (nband, nx, ny), tol=1e-8, maxit=200,
                        dtype=jnp.float64)
    L = float(L) * 1.05

    def grad(x):
        return hess(x) - data

    psiH_fn = lambda x: psi_dot(x, psi)
    psi_fn = lambda a: psi_hdot(a, psi)
    v0 = jnp.zeros((nband, nbasis, psi.Nymax, psi.Nxmax))
    w = jnp.ones((nbasis, psi.Nymax, psi.Nxmax))
    x0 = jnp.zeros((nband, nx, ny))

    def l21(x):
        a = np.asarray(psi_dot(jnp.asarray(x), psi))
        return np.abs(a.sum(axis=0)).sum()

    xs = {}
    for lam in (1e-8, 5e-2):
        x, *_ = primal_dual(x0, v0, lam, psiH_fn, psi_fn, L, w, grad,
                            nu=nbasis, tol=1e-7, maxit=3000, positivity=1)
        xs[lam] = np.asarray(x)
    assert (xs[5e-2] >= 0).all()
    assert l21(xs[5e-2]) < l21(xs[1e-8])
