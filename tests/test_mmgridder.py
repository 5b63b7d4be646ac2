"""Matmul-formulation (scatter-free) gridder vs the DFT oracle."""

import jax.numpy as jnp
import numpy as np
import pytest
from numpy.testing import assert_allclose

from pfb_tpu.ops.dft import dirty2vis_dft, vis2dirty_dft
from pfb_tpu.ops.mmgridder import dirty2vis_mm, vis2dirty_mm
from pfb_tpu.utils.simulation import image_size_for, simulate_obs

pmp = pytest.mark.parametrize


@pytest.fixture(scope="module")
def obs():
    return simulate_obs(nant=7, ntime=6, nchan=2, seed=3)


@pmp("do_w", [False, True])
def test_vis2dirty_mm_matches_dft(obs, do_w):
    nx, cell = image_size_for(obs, fov_deg=0.2)
    nx = min(nx, 64)
    rng = np.random.default_rng(0)
    nrow, nchan = obs.uvw.shape[0], obs.freq.size
    vis = rng.normal(size=(nrow, nchan)) + \
        1j * rng.normal(size=(nrow, nchan))
    wgt = rng.random((nrow, nchan))
    ref = np.asarray(vis2dirty_dft(
        jnp.asarray(obs.uvw), jnp.asarray(obs.freq), jnp.asarray(vis),
        wgt=jnp.asarray(wgt), nx=nx, ny=nx, cellx=cell, celly=cell,
        do_wterm=do_w))
    got = np.asarray(vis2dirty_mm(
        obs.uvw, obs.freq, vis, wgt=wgt, nx=nx, ny=nx, cellx=cell,
        celly=cell, epsilon=1e-7, do_wgridding=do_w, tile=32))
    assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-6


@pmp("do_w", [False, True])
def test_dirty2vis_mm_matches_dft(obs, do_w):
    nx, cell = image_size_for(obs, fov_deg=0.2)
    nx = min(nx, 64)
    rng = np.random.default_rng(1)
    img = rng.normal(size=(nx, nx))
    ref = np.asarray(dirty2vis_dft(
        jnp.asarray(obs.uvw), jnp.asarray(obs.freq), jnp.asarray(img),
        cell, cell, do_wterm=do_w))
    got = np.asarray(dirty2vis_mm(
        obs.uvw, obs.freq, jnp.asarray(img), cell, cell, epsilon=1e-7,
        do_wgridding=do_w, tile=32))
    # degrid blocks are gathered in f32
    assert np.abs(got - ref).max() / np.abs(ref).max() < 5e-6


def test_mm_plan_reuse(obs):
    """A cached mm_plan gives identical results for both directions."""
    from pfb_tpu.ops.mmgridder import mm_plan
    nx, cell = image_size_for(obs, fov_deg=0.2)
    nx = min(nx, 64)
    rng = np.random.default_rng(5)
    nrow, nchan = obs.uvw.shape[0], obs.freq.size
    vis = rng.normal(size=(nrow, nchan)) + \
        1j * rng.normal(size=(nrow, nchan))
    plan = mm_plan(obs.uvw, obs.freq, nx=nx, ny=nx, cellx=cell,
                   celly=cell, epsilon=1e-7, do_wgridding=True,
                   tile=32)
    a = np.asarray(vis2dirty_mm(
        obs.uvw, obs.freq, vis, nx=nx, ny=nx, cellx=cell, celly=cell,
        epsilon=1e-7, do_wgridding=True, tile=32))
    b = np.asarray(vis2dirty_mm(
        obs.uvw, obs.freq, vis, nx=nx, ny=nx, cellx=cell, celly=cell,
        plan=plan))
    assert_allclose(a, b, rtol=0, atol=0)
    img = rng.normal(size=(nx, nx))
    va = np.asarray(dirty2vis_mm(
        obs.uvw, obs.freq, jnp.asarray(img), cell, cell, epsilon=1e-7,
        do_wgridding=True, tile=32))
    vb = np.asarray(dirty2vis_mm(
        obs.uvw, obs.freq, jnp.asarray(img), cell, cell, plan=plan))
    assert_allclose(va, vb, rtol=0, atol=0)


def test_mm_centre_shift_matches_dft(obs):
    """x0/y0 image-centre offsets agree with the oracle both ways."""
    nx, cell = image_size_for(obs, fov_deg=0.2)
    nx = min(nx, 64)
    x0, y0 = 3 * cell, -2 * cell
    rng = np.random.default_rng(7)
    nrow, nchan = obs.uvw.shape[0], obs.freq.size
    vis = rng.normal(size=(nrow, nchan)) + \
        1j * rng.normal(size=(nrow, nchan))
    ref = np.asarray(vis2dirty_dft(
        jnp.asarray(obs.uvw), jnp.asarray(obs.freq), jnp.asarray(vis),
        nx=nx, ny=nx, cellx=cell, celly=cell, do_wterm=True,
        x0=x0, y0=y0))
    got = np.asarray(vis2dirty_mm(
        obs.uvw, obs.freq, vis, nx=nx, ny=nx, cellx=cell, celly=cell,
        epsilon=1e-7, do_wgridding=True, tile=32, x0=x0, y0=y0))
    assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-6
    img = rng.normal(size=(nx, nx))
    vref = np.asarray(dirty2vis_dft(
        jnp.asarray(obs.uvw), jnp.asarray(obs.freq), jnp.asarray(img),
        cell, cell, do_wterm=True, x0=x0, y0=y0))
    vgot = np.asarray(dirty2vis_mm(
        obs.uvw, obs.freq, jnp.asarray(img), cell, cell, epsilon=1e-7,
        do_wgridding=True, tile=32, x0=x0, y0=y0))
    assert np.abs(vgot - vref).max() / np.abs(vref).max() < 5e-6


def test_mm_backend_registered(obs):
    from pfb_tpu.ops.gridder import get_backend
    d2v, v2d = get_backend("mm")
    nx, cell = image_size_for(obs, fov_deg=0.2)
    nx = min(nx, 64)
    rng = np.random.default_rng(11)
    vis = rng.normal(size=(obs.uvw.shape[0], obs.freq.size)) + 0j
    d = v2d(obs.uvw, obs.freq, vis, nx=nx, ny=nx, cellx=cell,
            celly=cell, x0=0.0, y0=0.0)
    assert d.shape == (nx, nx)


def test_mm_matches_scatter_wgrid(obs):
    """mm and scatter implementations agree on identical geometry."""
    from pfb_tpu.ops.wgridder import vis2dirty_wgrid
    nx, cell = image_size_for(obs, fov_deg=0.2)
    nx = min(nx, 64)
    rng = np.random.default_rng(2)
    nrow, nchan = obs.uvw.shape[0], obs.freq.size
    vis = rng.normal(size=(nrow, nchan)) + \
        1j * rng.normal(size=(nrow, nchan))
    a = np.asarray(vis2dirty_wgrid(
        jnp.asarray(obs.uvw), jnp.asarray(obs.freq), jnp.asarray(vis),
        nx=nx, ny=nx, cellx=cell, celly=cell, epsilon=1e-7,
        do_wgridding=True))
    b = np.asarray(vis2dirty_mm(
        obs.uvw, obs.freq, vis, nx=nx, ny=nx, cellx=cell, celly=cell,
        epsilon=1e-7, do_wgridding=True, tile=32))
    assert np.abs(a - b).max() / np.abs(a).max() < 1e-6
