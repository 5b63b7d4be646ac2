"""Fused Pallas ES gridder (interpret mode on CPU) vs the DFT oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from pfb_tpu.ops.dft import dirty2vis_dft, vis2dirty_dft
from pfb_tpu.ops.pgridder import dirty2vis_pg, pgrid_plan, vis2dirty_pg
from pfb_tpu.utils.simulation import image_size_for, simulate_obs

pmp = pytest.mark.parametrize


@pytest.fixture(scope="module")
def obs():
    return simulate_obs(nant=7, ntime=6, nchan=2, seed=3)


@pmp("do_w", [False, True])
@pmp("shift", [False, True])
def test_vis2dirty_pg_matches_dft(obs, do_w, shift):
    nx, cell = image_size_for(obs, fov_deg=0.2)
    nx = min(nx, 64)
    x0, y0 = (1e-3, -2e-3) if shift else (0.0, 0.0)
    rng = np.random.default_rng(0)
    nrow, nchan = obs.uvw.shape[0], obs.freq.size
    vis = rng.normal(size=(nrow, nchan)) + \
        1j * rng.normal(size=(nrow, nchan))
    wgt = rng.random((nrow, nchan))
    ref = np.asarray(vis2dirty_dft(
        jnp.asarray(obs.uvw), jnp.asarray(obs.freq), jnp.asarray(vis),
        wgt=jnp.asarray(wgt), nx=nx, ny=nx, cellx=cell, celly=cell,
        do_wterm=do_w, x0=x0, y0=y0))
    got = np.asarray(vis2dirty_pg(
        obs.uvw, obs.freq, vis, wgt=wgt, nx=nx, ny=nx, cellx=cell,
        celly=cell, epsilon=1e-7, do_wgridding=do_w, x0=x0, y0=y0))
    assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-6


@pmp("do_w", [False, True])
def test_dirty2vis_pg_matches_dft(obs, do_w):
    nx, cell = image_size_for(obs, fov_deg=0.2)
    nx = min(nx, 64)
    rng = np.random.default_rng(1)
    img = rng.normal(size=(nx, nx))
    ref = np.asarray(dirty2vis_dft(
        jnp.asarray(obs.uvw), jnp.asarray(obs.freq), jnp.asarray(img),
        cell, cell, do_wterm=do_w))
    got = np.asarray(dirty2vis_pg(
        obs.uvw, obs.freq, jnp.asarray(img), cell, cell, epsilon=1e-7,
        do_wgridding=do_w))
    assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-6


def test_pg_plan_reuse(obs):
    """A cached pgrid_plan gives identical results for both directions
    (the plan is what the major cycle amortises across matvecs)."""
    nx, cell = image_size_for(obs, fov_deg=0.2)
    nx = min(nx, 64)
    rng = np.random.default_rng(5)
    nrow, nchan = obs.uvw.shape[0], obs.freq.size
    vis = rng.normal(size=(nrow, nchan)) + \
        1j * rng.normal(size=(nrow, nchan))
    img = rng.normal(size=(nx, nx))
    plan = pgrid_plan(obs.uvw, obs.freq, nx=nx, ny=nx, cellx=cell,
                      celly=cell, epsilon=1e-7, do_wgridding=True)
    a = np.asarray(vis2dirty_pg(obs.uvw, obs.freq, vis, nx=nx, ny=nx,
                                cellx=cell, celly=cell, plan=plan))
    b = np.asarray(vis2dirty_pg(obs.uvw, obs.freq, vis, nx=nx, ny=nx,
                                cellx=cell, celly=cell, epsilon=1e-7,
                                do_wgridding=True))
    np.testing.assert_allclose(a, b, rtol=0, atol=0)
    va = np.asarray(dirty2vis_pg(obs.uvw, obs.freq, jnp.asarray(img),
                                 cell, cell, plan=plan))
    vb = np.asarray(dirty2vis_pg(obs.uvw, obs.freq, jnp.asarray(img),
                                 cell, cell, epsilon=1e-7,
                                 do_wgridding=True))
    np.testing.assert_allclose(va, vb, rtol=0, atol=0)


@pmp("shift", [False, True])
def test_wblocked_matches_unblocked(obs, shift):
    """W-plane-blocked gridding (bounded memory: O(plane_block x grid)
    instead of O(nw x grid)) is numerically identical to the all-planes
    layout in both directions and through the Hessian."""
    import jax
    from pfb_tpu.ops.pgridder import (_adjoint_wblocked_impl,
                                      _forward_wblocked_impl,
                                      make_hessian_pg,
                                      make_hessian_pg_wblocked,
                                      pgrid_plan_wblocked)
    nx, cell = image_size_for(obs, fov_deg=0.2)
    nx = min(nx, 64)
    x0, y0 = (1e-3, -2e-3) if shift else (0.0, 0.0)
    rng = np.random.default_rng(2)
    nrow, nchan = obs.uvw.shape[0], obs.freq.size
    vr = rng.normal(size=(nrow, nchan))
    vi = rng.normal(size=(nrow, nchan))
    wgt = rng.random((nrow, nchan))
    img = rng.normal(size=(nx, nx))

    plan = pgrid_plan(obs.uvw, obs.freq, nx=nx, ny=nx, cellx=cell,
                      celly=cell, epsilon=1e-7, do_wgridding=True,
                      x0=x0, y0=y0)
    assert plan["nw"] > 3  # w planes actually exercised
    bp = pgrid_plan_wblocked(obs.uvw, obs.freq, nx=nx, ny=nx,
                             cellx=cell, celly=cell, epsilon=1e-7,
                             plane_block=3, x0=x0, y0=y0)
    assert bp["nblocks"] > 1

    interp = jax.default_backend() != "tpu"
    ref = np.asarray(vis2dirty_pg(obs.uvw, obs.freq, vr + 1j * vi,
                                  wgt=wgt, nx=nx, ny=nx, cellx=cell,
                                  celly=cell, plan=plan))
    got = np.asarray(_adjoint_wblocked_impl(
        bp, jnp.asarray(vr), jnp.asarray(vi), jnp.asarray(wgt),
        interp))
    np.testing.assert_allclose(got, ref, rtol=1e-10, atol=1e-10
                               * np.abs(ref).max())

    fref = dirty2vis_pg(obs.uvw, obs.freq, jnp.asarray(img), cell,
                        cell, plan=plan)
    fr, fi = _forward_wblocked_impl(bp, jnp.asarray(img), interp)
    fgot = np.asarray(fr) + 1j * np.asarray(fi)
    assert np.abs(fgot - fref).max() / np.abs(fref).max() < 1e-10

    h_ref = make_hessian_pg(plan, wgt=wgt)
    h_blk = make_hessian_pg_wblocked(bp, wgt=wgt)
    xr = jnp.asarray(img)
    np.testing.assert_allclose(np.asarray(h_blk(xr)),
                               np.asarray(h_ref(xr)), rtol=1e-9,
                               atol=1e-10)


def test_wblocked_split_precision_accuracy(obs):
    """epsilon >= 1e-5 plans select the split-f32 cfft stage dots
    (three bf16 MXU passes; ops/pallas_cfft.py:_dot_split3). The
    blocked adjoint must stay within the requested gridding accuracy
    of the HIGHEST-precision unblocked path."""
    from pfb_tpu.ops.pgridder import (_adjoint_wblocked_impl,
                                      _adjoint_from_plan, pgrid_plan,
                                      pgrid_plan_wblocked)
    nx, cell = image_size_for(obs, fov_deg=0.2)
    nx = min(nx, 64)
    rng = np.random.default_rng(4)
    nrow, nchan = obs.uvw.shape[0], obs.freq.size
    vr = rng.normal(size=(nrow, nchan))
    vi = rng.normal(size=(nrow, nchan))
    bp = pgrid_plan_wblocked(obs.uvw, obs.freq, nx=nx, ny=nx,
                             cellx=cell, celly=cell, epsilon=1e-5,
                             plane_block=3)
    assert bp["p0"]["cfft_prec"] == "split"
    p = pgrid_plan(obs.uvw, obs.freq, nx=nx, ny=nx, cellx=cell,
                   celly=cell, epsilon=1e-5, do_wgridding=True)
    got = np.asarray(_adjoint_wblocked_impl(
        bp, jnp.asarray(vr), jnp.asarray(vi), None, True))
    ref = np.asarray(_adjoint_from_plan(
        p, jnp.asarray(vr), jnp.asarray(vi), None, True))
    scale = np.abs(ref).max()
    assert np.abs(got - ref).max() / scale < 3e-5


def test_wblocked_capacity256_matches(obs):
    """capacity=256 packed entries (auto-selected at production vis
    counts) produce identical gridding to capacity=128."""
    from pfb_tpu.ops.pgridder import (_adjoint_wblocked_impl,
                                      pgrid_plan_wblocked)
    nx, cell = image_size_for(obs, fov_deg=0.2)
    nx = min(nx, 64)
    rng = np.random.default_rng(5)
    nrow, nchan = obs.uvw.shape[0], obs.freq.size
    vr = rng.normal(size=(nrow, nchan))
    vi = rng.normal(size=(nrow, nchan))
    outs = []
    for cap in (128, 256):
        bp = pgrid_plan_wblocked(obs.uvw, obs.freq, nx=nx, ny=nx,
                                 cellx=cell, celly=cell, epsilon=1e-7,
                                 plane_block=3, capacity=cap)
        outs.append(np.asarray(_adjoint_wblocked_impl(
            bp, jnp.asarray(vr), jnp.asarray(vi), None, True)))
    scale = np.abs(outs[0]).max()
    assert np.abs(outs[1] - outs[0]).max() / scale < 1e-12
