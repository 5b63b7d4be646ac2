"""Model fitting/eval, degrid round-trip and FITS I/O tests.

Mirrors upstream tests/test_model2comps.py (fit/eval round trips) and
the second half of tests/test_spotless.py (model2comps reproduces the
model EXACTLY at the fitted points; degrid -> CORRECTED_DATA -> re-grid
gives dirty == previous residual)."""

import numpy as np
import pytest
from numpy.testing import assert_allclose

from pfb_tpu.models.comps import (eval_coeffs_to_cube,
                                  eval_coeffs_to_slice, fit_image_cube)


def _random_cube(ntime=1, nband=4, nx=16, ny=16, ncomp=5, seed=0):
    rng = np.random.default_rng(seed)
    time = 5e9 + np.arange(ntime) * 100.0
    freq = 1e9 + np.arange(nband) * 1e8
    img = np.zeros((ntime, nband, nx, ny))
    Ix = rng.integers(0, nx, ncomp)
    Iy = rng.integers(0, ny, ncomp)
    for i in range(ncomp):
        flux = 1 + rng.random()
        alpha = -0.7 + 0.1 * rng.standard_normal()
        img[:, :, Ix[i], Iy[i]] = flux * (freq / freq.mean()) ** alpha
    return time, freq, img


@pytest.mark.parametrize("method", ["poly", "Legendre"])
def test_fit_eval_roundtrip_exact(method):
    """With nbasisf = nband the fit interpolates: eval at the fit
    points reproduces the model exactly (upstream
    test_spotless.py:264-265)."""
    time, freq, img = _random_cube()
    coeffs, Ix, Iy, expr, params, texpr, fexpr = fit_image_cube(
        time, freq, img, method=method)
    cube = eval_coeffs_to_cube(time, freq, img.shape[2], img.shape[3],
                               coeffs, Ix, Iy, expr, params, texpr,
                               fexpr)
    assert_allclose(1 + cube, 1 + img, rtol=1e-9)


def test_eval_slice_regrid():
    """Evaluating onto a finer grid interpolates correctly at source
    pixels (upstream test_model2comps semantics)."""
    time, freq, img = _random_cube(nx=16, ny=16)
    coeffs, Ix, Iy, expr, params, texpr, fexpr = fit_image_cube(
        time, freq, img, method="Legendre")
    cell = 1e-5
    out = eval_coeffs_to_slice(time[0], freq[1], coeffs, Ix, Iy, expr,
                               params, texpr, fexpr,
                               16, 16, cell, cell, 0.0, 0.0,
                               16, 16, cell, cell, 0.0, 0.0)
    assert_allclose(out, img[0, 1], atol=1e-12)


def test_fits_roundtrip(tmp_path):
    from pfb_tpu.utils.fits import load_fits, save_fits, set_wcs
    rng = np.random.default_rng(1)
    cube = rng.normal(size=(2, 16, 20))
    hdr = set_wcs(1e-3, 1e-3, 16, 20, [0.1, -0.5],
                  np.array([1e9, 1.1e9]))
    name = str(tmp_path / "test.fits")
    save_fits(cube, name, hdr, dtype=np.float64)
    back = load_fits(name)
    assert back.shape == (1, 2, 16, 20)
    assert_allclose(back[0], cube, rtol=1e-12)


def test_degrid_residual_consistency(tmp_path):
    """model2comps -> degrid -> CORRECTED_DATA -> re-grid == stored
    residual (upstream test_spotless.py:266-325)."""
    from pfb_tpu.utils.ms import read_ms, simulate_ms, update_ms_column
    from pfb_tpu.workers.degrid import _degrid
    from pfb_tpu.workers.grid import _grid
    from pfb_tpu.workers.init import _init
    from pfb_tpu.workers.klean import _klean
    from pfb_tpu.workers.model2comps import _model2comps

    ms_path = str(tmp_path / "t.npz")
    model, Ix, Iy, nx, cell_rad, _ = simulate_ms(
        ms_path, nant=8, ntime=6, nchan=2, nsource=3, fov_deg=0.3,
        seed=11)
    out = str(tmp_path / "o")
    xds = _init(ms=ms_path, output_filename=out, channels_per_image=1)
    dds = _grid(xdsi=xds, output_filename=out, suffix="main",
                field_of_view=0.3, robustness=0.0, psf=True,
                residual=False)
    _klean(ddsi=dds, output_filename=out, niter=3, threshold=1e-4,
           gamma=0.1, peak_factor=0.75, sub_peak_factor=0.75,
           mop_flux=False, verbose=0)

    mds = _model2comps(ddsi=dds, output_filename=out, suffix="main",
                       fit_mode="Legendre")

    # model must be reproduced exactly at the fit points
    from pfb_tpu.models.comps import eval_coeffs_to_cube
    freqs_out = np.unique([ds["freq_out"] for ds in dds])
    times_out = np.unique([ds["time_out"] for ds in dds])
    cube = eval_coeffs_to_cube(times_out, freqs_out, nx, nx,
                               mds["coefficients"], mds["location_x"],
                               mds["location_y"],
                               mds["parametrisation"], mds["params"],
                               mds["texpr"], mds["fexpr"])
    model_stored = np.stack([ds["MODEL"] for ds in
                             sorted(dds, key=lambda d: d["bandid"])])
    assert_allclose(1 + cube[0], 1 + model_stored, rtol=1e-7)

    # degrid, subtract, regrid: dirty(CORRECTED) == RESIDUAL
    mvis = _degrid(ms=ms_path, mds=mds, channels_per_image=1)
    msd = read_ms(ms_path)
    update_ms_column(ms_path, "CORRECTED_DATA", msd["DATA"] - mvis)
    xds2 = _init(ms=ms_path, output_filename=str(tmp_path / "o2"),
                 channels_per_image=1, data_column="CORRECTED_DATA")
    dds2 = _grid(xdsi=xds2, output_filename=str(tmp_path / "o2"),
                 suffix="main", field_of_view=0.3, robustness=0.0,
                 psf=False, residual=False)
    for ds, ds2 in zip(sorted(dds, key=lambda d: d["bandid"]),
                       sorted(dds2, key=lambda d: d["bandid"])):
        wsum = ds["WSUM"][0]
        assert_allclose(1 + np.abs(ds["RESIDUAL"]) / wsum,
                        1 + np.abs(ds2["DIRTY"]) / wsum, rtol=2e-7)


def test_restore_products(tmp_path):
    from pfb_tpu.utils.ms import simulate_ms
    from pfb_tpu.workers.grid import _grid
    from pfb_tpu.workers.init import _init
    from pfb_tpu.workers.klean import _klean
    from pfb_tpu.workers.restore import _restore

    ms_path = str(tmp_path / "t.npz")
    simulate_ms(ms_path, nant=8, ntime=6, nchan=2, nsource=3,
                fov_deg=0.3, seed=12)
    out = str(tmp_path / "o")
    xds = _init(ms=ms_path, output_filename=out, channels_per_image=1)
    dds = _grid(xdsi=xds, output_filename=out, suffix="main",
                field_of_view=0.3, robustness=0.0, psf=True,
                residual=False)
    _klean(ddsi=dds, output_filename=out, niter=2, threshold=1e-4,
           gamma=0.1, peak_factor=0.75, sub_peak_factor=0.75,
           mop_flux=False, verbose=0)
    res = _restore(ddsi=dds, output_filename=out, outputs="mMrRiIc")
    assert "model_mfs" in res and "residual" in res and "image_mfs" in res
    import glob
    assert len(glob.glob(str(tmp_path / "o_I_main.*.fits"))) >= 5
