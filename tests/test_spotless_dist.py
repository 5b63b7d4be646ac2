"""Distributed (mesh-resident) spotless major cycle vs the
single-device worker: same model and residual through an identical
init->grid pipeline — the worker-level distributed e2e coverage the
reference's commented-out _spotless_dist never had
(reference pfb/workers/spotless.py:429-667)."""

import jax
import numpy as np
import pytest
from numpy.testing import assert_allclose

from pfb_tpu.utils.ms import simulate_ms
from pfb_tpu.workers.grid import _grid
from pfb_tpu.workers.init import _init
from pfb_tpu.workers.spotless import _spotless, _spotless_dist

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def pipeline4(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("dist_e2e")
    ms_path = str(tmp / "test.npz")
    model, Ix, Iy, nx, cell_rad, jones = simulate_ms(
        ms_path, nant=7, ntime=6, nchan=4, nsource=3, fov_deg=0.3,
        seed=99, gains=False)
    outname = str(tmp / "out")
    xds = _init(ms=ms_path, output_filename=outname,
                channels_per_image=1)
    dds = _grid(xdsi=xds, output_filename=outname, suffix="main",
                field_of_view=0.3, robustness=0.0, psf=True,
                residual=False)
    return dict(model=model, Ix=Ix, Iy=Iy, dds=dds, outname=outname)


def _hessnorm(dds):
    import jax.numpy as jnp
    from pfb_tpu.ops.psf import make_psf_convolve
    from pfb_tpu.opt.power_method import power_method
    from pfb_tpu.workers.cubes import dds2cubes
    dirty, *_rest = dds2cubes(dds, 4, apparent=False)
    psfhat = _rest[3]
    ny_psf = dds[0]["PSF"].shape[-1]
    conv = make_psf_convolve(jnp.asarray(psfhat), ny_psf)
    beta, _ = power_method(conv, dirty.shape, tol=1e-7, maxit=200,
                           dtype=dirty.dtype)
    return float(beta) * 1.05


def test_spotless_dist_matches_local(pipeline4, tmp_path):
    p = pipeline4
    hessnorm = _hessnorm(p["dds"])
    kw = dict(niter=3, rmsfactor=0.3, gamma=1.0, bases="self,db1",
              nlevels=2, l1reweight_from=2, pd_tol=1e-6, pd_maxit=300,
              hessnorm=hessnorm, verbose=0)

    m_loc, r_loc = _spotless(ddsi=[dict(ds) for ds in p["dds"]],
                             output_filename=str(tmp_path / "loc"),
                             **kw)

    from pfb_tpu.parallel.mesh import make_mesh
    mesh = make_mesh(nband=4, nspace=1, devices=jax.devices()[:4])
    m_dist, r_dist = _spotless_dist(
        mesh=mesh, ddsi=[dict(ds) for ds in p["dds"]],
        output_filename=str(tmp_path / "dist"), **kw)

    assert_allclose(m_dist, m_loc, rtol=1e-7, atol=1e-9)
    assert_allclose(r_dist, r_loc, rtol=1e-7, atol=1e-9)
    # the run converged onto something non-trivial
    assert np.abs(m_loc).max() > 0


def test_spotless_dist_resume_l1weight(pipeline4, tmp_path):
    """L1WEIGHT persists through the dds store and is reloaded on
    resume (reference spotless.py:536-546, 623-627)."""
    from pfb_tpu.parallel.mesh import make_mesh
    from pfb_tpu.utils import dstore
    p = pipeline4
    hessnorm = _hessnorm(p["dds"])
    mesh = make_mesh(nband=4, nspace=1, devices=jax.devices()[:4])
    out = str(tmp_path / "resume")
    kw = dict(rmsfactor=0.3, gamma=1.0, bases="self,db1", nlevels=2,
              l1reweight_from=1, pd_tol=5e-4, pd_maxit=1000,
              hessnorm=hessnorm, verbose=0)
    _spotless_dist(mesh=mesh, ddsi=[dict(ds) for ds in p["dds"]],
                   output_filename=out, niter=1, **kw)
    dds2 = dstore.read_store(out + "_I_main.dds")
    assert dds2[0]["niters"] == 1
    w = np.asarray(dds2[0]["L1WEIGHT"])
    assert w.ndim == 3 and not np.all(w == 1.0)
    # resume continues and reloads the persisted state
    _spotless_dist(mesh=mesh, ddsi=None, output_filename=out, niter=1,
                   **kw)
    dds3 = dstore.read_store(out + "_I_main.dds")
    assert dds3[0]["niters"] == 2


def test_spotless_dist_space_shards_matches_local(pipeline4, tmp_path):
    """space_shards>1 (band+space mesh: sharded dual cube, space-dist
    PD gradient) reproduces the single-device worker through major
    iterations including an l1-reweight."""
    from pfb_tpu.parallel.mesh import make_mesh
    p = pipeline4
    hessnorm = _hessnorm(p["dds"])
    kw = dict(niter=2, rmsfactor=0.3, gamma=1.0, bases="self,db1",
              nlevels=2, l1reweight_from=2, pd_tol=1e-6, pd_maxit=300,
              hessnorm=hessnorm, verbose=0)

    m_loc, r_loc = _spotless(ddsi=[dict(ds) for ds in p["dds"]],
                             output_filename=str(tmp_path / "loc"),
                             **kw)

    mesh = make_mesh(nband=2, nspace=4)
    m_sp, r_sp = _spotless_dist(
        mesh=mesh, ddsi=[dict(ds) for ds in p["dds"]],
        output_filename=str(tmp_path / "sp"), **kw)

    assert_allclose(m_sp, m_loc, rtol=1e-7, atol=1e-9)
    assert_allclose(r_sp, r_loc, rtol=1e-7, atol=1e-9)
