"""End-to-end pipeline tests: simulate MS -> init -> grid ->
klean/spotless recovers point-source fluxes through w-term and DI gain
corruptions (mirrors upstream tests/test_klean.py and test_spotless.py,
flux tolerance atol = 5*threshold)."""

import numpy as np
import pytest
from numpy.testing import assert_allclose

from pfb_tpu.utils.ms import simulate_ms
from pfb_tpu.workers.grid import _grid
from pfb_tpu.workers.init import _init
from pfb_tpu.workers.klean import _klean
from pfb_tpu.workers.spotless import _spotless

pytestmark = pytest.mark.slow

pmp = pytest.mark.parametrize


@pytest.fixture(scope="module", params=[False, True],
                ids=["nogains", "gains"])
def pipeline(request, tmp_path_factory):
    do_gains = request.param
    tmp = tmp_path_factory.mktemp(f"e2e_{do_gains}")
    ms_path = str(tmp / "test.npz")
    # enough baselines that CLEAN's point-source prior pins the fluxes
    # (sparser arrays leave too much null space for 5e-5 recovery)
    model, Ix, Iy, nx, cell_rad, jones = simulate_ms(
        ms_path, nant=13, ntime=12, nchan=3, nsource=5, fov_deg=0.4,
        seed=420, gains=do_gains)
    outname = str(tmp / "out")
    xds = _init(ms=ms_path, output_filename=outname,
                channels_per_image=1,
                gain_table=ms_path + ".gains.npz" if do_gains else None)
    dds = _grid(xdsi=xds, output_filename=outname, suffix="main",
                field_of_view=0.4, robustness=0.0, psf=True,
                residual=False)
    return dict(model=model, Ix=Ix, Iy=Iy, nx=nx, cell_rad=cell_rad,
                outname=outname, xds=xds, dds=dds, do_gains=do_gains)


def _ncorr_correction(nx, cell_rad, Ix, Iy):
    """images are I/n — correct recovered fluxes by n at the source
    pixels (upstream test_klean.py:252-256)."""
    l = (np.arange(nx) - nx // 2) * cell_rad
    ll, mm = np.meshgrid(l, l, indexing="ij")
    eps = ll**2 + mm**2
    n = 1 - eps / (np.sqrt(1 - eps) + 1)
    return n[Ix, Iy]


def test_init_grid_shapes(pipeline):
    p = pipeline
    assert len(p["xds"]) == 3  # one per channel
    assert len(p["dds"]) == 3
    nx = p["dds"][0]["DIRTY"].shape[0]
    assert p["dds"][0]["PSF"].shape[0] >= 2 * nx - 2


def test_klean_recovers_fluxes(pipeline, tmp_path):
    p = pipeline
    model, Ix, Iy = p["model"], p["Ix"], p["Iy"]
    threshold = 1e-5
    rec, resid = _klean(ddsi=[dict(ds) for ds in p["dds"]],
                        output_filename=str(tmp_path / "klean"),
                        niter=100, threshold=threshold, gamma=0.1,
                        peak_factor=0.75, sub_peak_factor=0.75,
                        mop_flux=True, dirosion=0, verbose=0)
    n = _ncorr_correction(p["nx"], p["cell_rad"], Ix, Iy)
    nsource = Ix.size
    for s in range(nsource):
        assert_allclose(
            1.0 + rec[:, Ix[s], Iy[s]] * n[s] - model[:, Ix[s], Iy[s]],
            1.0, atol=5 * threshold)


def test_spotless_reduces_residual(pipeline, tmp_path):
    p = pipeline
    model, Ix, Iy = p["model"], p["Ix"], p["Iy"]
    # upstream test parameters (test_spotless.py: rmsfactor=0.1,
    # pd_tol=5e-4); upstream asserts residual consistency rather than
    # per-pixel fluxes — SARA regularisation spreads point flux into
    # small blobs, so we check residual reduction + box-summed flux
    rec, resid = _spotless(ddsi=[dict(ds) for ds in p["dds"]],
                           output_filename=str(tmp_path / "spot"),
                           niter=10, rmsfactor=0.1, gamma=1.0,
                           bases="self,db1,db2", nlevels=2,
                           l1reweight_from=5, pd_tol=5e-4,
                           pd_maxit=2000, verbose=0)
    dirty_mfs = np.sum([ds["DIRTY"] for ds in p["dds"]], axis=0)
    wsum = np.sum([ds["WSUM"][0] for ds in p["dds"]])
    resid_mfs = resid.sum(axis=0)
    assert np.abs(resid_mfs).max() < 0.05 * np.abs(dirty_mfs / wsum).max()
    for s in range(Ix.size):
        i, j = Ix[s], Iy[s]
        box = rec[:, i - 3:i + 4, j - 3:j + 4].sum(axis=(1, 2))
        assert_allclose(box, model[:, i, j], rtol=0.3)


def test_klean_resume(pipeline, tmp_path):
    """Checkpoint/resume: a second _klean call resumes from the stored
    niters (reference spotless.py:134-137, klean.py:149-152)."""
    p = pipeline
    out = str(tmp_path / "resume")
    dds_copy = [dict(ds) for ds in p["dds"]]
    _klean(ddsi=dds_copy, output_filename=out, niter=1, threshold=1e-5,
           gamma=0.1, peak_factor=0.75, sub_peak_factor=0.75,
           mop_flux=False, verbose=0)
    from pfb_tpu.utils import dstore
    dds2 = dstore.read_store(out + "_I_main.dds")
    assert dds2[0]["niters"] == 1
    assert "MODEL" in dds2[0] and "MODEL_BEST" in dds2[0]
    # resume: continues from iteration 1
    _klean(ddsi=None, output_filename=out, niter=1, threshold=1e-5,
           gamma=0.1, peak_factor=0.75, sub_peak_factor=0.75,
           mop_flux=False, verbose=0)
    dds3 = dstore.read_store(out + "_I_main.dds")
    assert dds3[0]["niters"] == 2
