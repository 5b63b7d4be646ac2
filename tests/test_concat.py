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


def test_concat_chan_weighted_overlap(tmp_path):
    """Channels shared by two datasets are weight-summed on the union
    grid (reference sum_overlap, utils/misc.py:1030-1067)."""
    rng = np.random.default_rng(3)
    nrow = 16
    uvw = rng.normal(size=(nrow, 3))
    f1 = np.array([1.0e9, 1.1e9, 1.2e9])
    f2 = np.array([1.2e9, 1.3e9])  # overlaps f1 at 1.2e9
    common = dict(UVW=uvw, time_out=0.0, ra=0.0, dec=0.0, product="I")

    def mk(freq, seed):
        r = np.random.default_rng(seed)
        return dict(common,
                    VIS=(r.normal(size=(nrow, freq.size)) +
                         1j * r.normal(size=(nrow, freq.size))),
                    WEIGHT=r.random((nrow, freq.size)),
                    MASK=np.ones((nrow, freq.size), np.uint8),
                    FREQ=freq, freq_out=float(freq.mean()))

    d1, d2 = mk(f1, 1), mk(f2, 2)
    out = concat_chan([d1, d2], 1)
    assert len(out) == 1
    o = out[0]
    assert_allclose(o["FREQ"], np.array([1.0e9, 1.1e9, 1.2e9, 1.3e9]))
    # non-overlapping channels pass through
    assert_allclose(o["VIS"][:, 0], d1["VIS"][:, 0])
    assert_allclose(o["WEIGHT"][:, 3], d2["WEIGHT"][:, 1])
    # the shared 1.2 GHz channel is the weighted sum
    w1, w2 = d1["WEIGHT"][:, 2], d2["WEIGHT"][:, 0]
    expect = (w1 * d1["VIS"][:, 2] + w2 * d2["VIS"][:, 0]) / (w1 + w2)
    assert_allclose(o["VIS"][:, 2], expect)
    assert_allclose(o["WEIGHT"][:, 2], w1 + w2)


def test_concat_chan_row_mismatch_raises(tmp_path):
    rng = np.random.default_rng(0)
    a = dict(UVW=rng.normal(size=(8, 3)), time_out=0.0,
             VIS=np.ones((8, 2), complex), WEIGHT=np.ones((8, 2)),
             MASK=np.ones((8, 2), np.uint8),
             FREQ=np.array([1e9, 1.1e9]), freq_out=1.05e9)
    b = dict(a, UVW=rng.normal(size=(8, 3)))
    import pytest as _pt
    with _pt.raises(ValueError):
        concat_chan([a, b], 1)
