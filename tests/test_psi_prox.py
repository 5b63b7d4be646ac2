"""SARA dictionary and prox operator tests — mirrors upstream
tests/test_psi_operator.py: Psi.H then Psi = nbasis*I to 12 decimals;
prox with sigma=0 is identity; fused dual update equals its two-step
numpy definition."""

import jax.numpy as jnp
import numpy as np
import pytest
from numpy.testing import assert_allclose, assert_array_almost_equal

from pfb_tpu.ops.prox import (dual_update_21, dual_update_21m, prox_21,
                              prox_21m)
from pfb_tpu.ops.psi import make_psi, psi_dot, psi_hdot

pmp = pytest.mark.parametrize


@pmp("nx,ny", [(64, 64), (60, 64)])
@pmp("nlevel", [1, 2])
def test_psi_roundtrip_nbasis_identity(nx, ny, nlevel):
    """hdot(dot(x)) == nbasis * x (upstream test_psi_operator.py:47-48,
    decimal=12)."""
    bases = ("self", "db1", "db2")
    psi = make_psi(nx, ny, bases, nlevel)
    rng = np.random.default_rng(42)
    nband = 2
    x = rng.normal(size=(nband, nx, ny))
    alpha = psi_dot(jnp.asarray(x), psi)
    assert alpha.shape == (nband, len(bases), psi.Nymax, psi.Nxmax)
    rec = np.asarray(psi_hdot(alpha, psi))
    assert_array_almost_equal(rec, len(bases) * x, decimal=11)


def test_psi_self_basis_transposed():
    """'self' stores the transposed image (reference psi.py:195-199)."""
    nx, ny = 16, 24
    psi = make_psi(nx, ny, ("self", "db1"), 1)
    x = np.arange(nx * ny, dtype=float).reshape(1, nx, ny)
    alpha = np.asarray(psi_dot(jnp.asarray(x), psi))
    assert_allclose(alpha[0, 0, :ny, :nx], x[0].T)


def test_prox21_sigma_zero_identity():
    rng = np.random.default_rng(0)
    v = rng.normal(size=(3, 2, 8, 8))
    w = np.ones((2, 8, 8))
    out = np.asarray(prox_21(jnp.asarray(v), 0.0, jnp.asarray(w)))
    assert_array_almost_equal(out, v, decimal=12)
    out = np.asarray(prox_21m(jnp.asarray(v), 0.0, jnp.asarray(w)))
    assert_array_almost_equal(out, v, decimal=12)


def _np_prox_21m(v, sigma, weight):
    l2_norm = np.sum(v, axis=0)
    l2_soft = np.maximum(np.abs(l2_norm) - sigma * weight, 0.0) * \
        np.sign(l2_norm)
    mask = l2_norm != 0
    ratio = np.zeros(mask.shape)
    ratio[mask] = l2_soft[mask] / l2_norm[mask]
    return v * ratio[None]


def test_prox_21m_vs_numpy():
    rng = np.random.default_rng(1)
    v = rng.normal(size=(4, 3, 10, 12))
    w = np.abs(rng.normal(size=(3, 10, 12)))
    lam = 0.3
    out = np.asarray(prox_21m(jnp.asarray(v), lam, jnp.asarray(w)))
    assert_array_almost_equal(out, _np_prox_21m(v, lam, w), decimal=12)


@pmp("fused,norm", [(dual_update_21m, "mfs"), (dual_update_21, "l2")])
def test_dual_update_fused_vs_twostep(fused, norm):
    """v <- vtilde - sigma*prox(vtilde/sigma, lam/sigma) with
    vtilde = vp + sigma*v (reference prox_21m.py:66-74 & numba fused
    variant :76-103, equality asserted upstream at 1e-8..1e-12)."""
    rng = np.random.default_rng(2)
    nband, nbasis, ny, nx = 3, 2, 6, 7
    vp = rng.normal(size=(nband, nbasis, ny, nx))
    v = rng.normal(size=(nband, nbasis, ny, nx))
    w = np.abs(rng.normal(size=(nbasis, ny, nx)))
    lam, sigma = 0.25, 1.7

    vtilde = vp + sigma * v
    if norm == "mfs":
        prox = _np_prox_21m(vtilde / sigma, lam / sigma, w)
    else:
        l2 = np.linalg.norm(vtilde / sigma, axis=0)
        soft = np.maximum(l2 - (lam / sigma) * w, 0.0)
        ratio = np.where(l2 != 0, soft / np.where(l2 == 0, 1, l2), 0.0)
        prox = (vtilde / sigma) * ratio[None]
    expected = vtilde - sigma * prox

    got = np.asarray(fused(jnp.asarray(vp), jnp.asarray(v), lam,
                           sigma=sigma, weight=jnp.asarray(w)))
    assert_array_almost_equal(got, expected, decimal=11)
