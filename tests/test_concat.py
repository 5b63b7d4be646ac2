"""concat_row / concat_chan re-binning tests."""

import numpy as np
from numpy.testing import assert_allclose

from pfb_tpu.utils.ms import simulate_ms
from pfb_tpu.workers.concat import concat_chan, concat_row
from pfb_tpu.workers.grid import _grid
from pfb_tpu.workers.init import _init


def test_concat_chan_grid_equivalence(tmp_path):
    """Gridding 4 single-channel datasets re-binned to 2 bands equals
    gridding 2-channel chunks directly."""
    ms_path = str(tmp_path / "t.npz")
    simulate_ms(ms_path, nant=7, ntime=4, nchan=4, nsource=2,
                fov_deg=0.3, seed=5)
    out = str(tmp_path / "o")
    xds1 = _init(ms=ms_path, output_filename=out, channels_per_image=1,
                 write=False)
    xds2 = _init(ms=ms_path, output_filename=out, channels_per_image=2,
                 write=False)
    assert len(xds1) == 4 and len(xds2) == 2

    rebinned = concat_chan(xds1, 2)
    assert len(rebinned) == 2
    for a, b in zip(sorted(rebinned, key=lambda d: d["freq_out"]),
                    sorted(xds2, key=lambda d: d["freq_out"])):
        assert_allclose(a["VIS"], b["VIS"])
        assert_allclose(a["WEIGHT"], b["WEIGHT"])
        assert a["freq_out"] == b["freq_out"]

    dds_a = _grid(xdsi=xds1, nband=2, field_of_view=0.3, write=False,
                  robustness=None, psf=False, residual=False)
    dds_b = _grid(xdsi=xds2, field_of_view=0.3, write=False,
                  robustness=None, psf=False, residual=False)
    assert len(dds_a) == 2
    for a, b in zip(dds_a, dds_b):
        assert_allclose(a["DIRTY"], b["DIRTY"], rtol=1e-12)


def test_concat_row(tmp_path):
    ms_path = str(tmp_path / "t.npz")
    simulate_ms(ms_path, nant=6, ntime=4, nchan=2, nsource=2,
                fov_deg=0.3, seed=6)
    out = str(tmp_path / "o")
    xds = _init(ms=ms_path, output_filename=out, channels_per_image=1,
                integrations_per_image=2, write=False)
    assert len(xds) == 4  # 2 time chunks x 2 bands
    merged = concat_row(xds)
    assert len(merged) == 2
    nrow_tot = sum(d["UVW"].shape[0] for d in xds if
                   d["freq_out"] == merged[0]["freq_out"])
    assert merged[0]["UVW"].shape[0] == nrow_tot
