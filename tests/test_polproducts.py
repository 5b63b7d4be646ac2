"""Full-polarisation end-to-end: simulate polarised sources, image
each Stokes product through init -> grid, and recover the per-product
fluxes at the source pixels (mirrors upstream
tests/test_polproducts.py:11-269, rtol/atol 1e-4), with and without
gains, in linear and circular bases."""

import numpy as np
import pytest
from numpy.testing import assert_allclose

from pfb_tpu.utils.ms import simulate_ms
from pfb_tpu.workers.grid import _grid
from pfb_tpu.workers.init import _init

pmp = pytest.mark.parametrize


def _ncorr(nx, cell_rad, Ix, Iy):
    l = (np.arange(nx) - nx // 2) * cell_rad
    ll, mm = np.meshgrid(l, l, indexing="ij")
    eps = ll**2 + mm**2
    n = 1 - eps / (np.sqrt(1 - eps) + 1)
    return n[Ix, Iy]


@pmp("pol", ["linear", "circular"])
@pmp("gains", [False, True])
def test_stokes_product_fluxes(tmp_path, pol, gains):
    ms_path = str(tmp_path / f"pol_{pol}.npz")
    stokes, Ix, Iy, nx, cell_rad, _ = simulate_ms(
        ms_path, nant=9, ntime=6, nchan=2, nsource=1, fov_deg=0.25,
        seed=7, fullpol=True, pol=pol, gains=gains, gain_mode="full")
    n = _ncorr(nx, cell_rad, Ix, Iy)
    gt = ms_path + ".gains.npz" if gains else None
    for pi, product in enumerate("IQUV"):
        xds = _init(ms=ms_path, write=False, channels_per_image=1,
                    product=product, gain_table=gt)
        dds = _grid(xdsi=xds, output_filename=str(tmp_path / product),
                    suffix="main", field_of_view=0.25, psf=False,
                    residual=False, robustness=None, write=False)
        iscale = np.abs(stokes[0]).max()
        for ds in dds:
            b = ds["bandid"]
            got = ds["DIRTY"] / ds["WSUM"][0]
            for s in range(Ix.size):
                flux = got[Ix[s], Iy[s]] * n[s]
                want = stokes[pi, b, Ix[s], Iy[s]]
                # dirty-peak flux: other sources' sidelobes limit the
                # single-source accuracy; nsource=1 keeps this clean
                assert abs(flux - want) < 2e-4 * iscale, \
                    (product, b, flux, want)
