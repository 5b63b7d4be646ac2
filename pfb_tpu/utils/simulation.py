"""Synthetic measurement-set simulation.

The reference test suite downloads a real 1h MeerKAT-layout ascii MS and
synthesises ground truth into it (tests/conftest.py:22-35,
tests/test_klean.py:71-93 upstream). Neither casacore nor network access
exists here, so this module synthesises the whole observation: array
layout, earth-rotation uvw tracks, per-channel frequencies and
point-source model visibilities — enough to exercise the full
init -> grid -> deconvolve -> degrid pipeline with known ground truth.

The uvw synthesis is the textbook ENU -> equatorial XYZ -> uvw chain
(same physics as casacore's fixvis recompute used in
pfb/utils/astrometry.py:19-103).
"""

from dataclasses import dataclass

import numpy as np


@dataclass
class SimObservation:
    uvw: np.ndarray        # (nrow, 3) metres
    time: np.ndarray       # (nrow,) seconds (synthetic epoch)
    ant1: np.ndarray       # (nrow,)
    ant2: np.ndarray       # (nrow,)
    freq: np.ndarray       # (nchan,) Hz
    ra: float              # rad
    dec: float             # rad


def random_array_enu(nant=12, extent=1000.0, seed=0):
    """Pseudo-random log-spiral array layout in ENU metres (compact core
    + outliers, loosely VLA-ish)."""
    rng = np.random.default_rng(seed)
    th = rng.uniform(0, 2 * np.pi, nant)
    r = extent * rng.random(nant) ** 2
    e = r * np.cos(th)
    n = r * np.sin(th)
    u = rng.normal(0.0, 1.0, nant)  # small height scatter
    return np.stack([e, n, u], axis=1)


def enu_to_xyz(enu, lat):
    """Local ENU baseline -> equatorial XYZ at latitude lat."""
    e, n, u = enu[:, 0], enu[:, 1], enu[:, 2]
    x = -np.sin(lat) * n + np.cos(lat) * u
    y = e
    z = np.cos(lat) * n + np.sin(lat) * u
    return np.stack([x, y, z], axis=1)


def xyz_to_uvw(xyz, ha, dec):
    """Equatorial XYZ baseline -> uvw for hour angle ha, declination."""
    sH, cH = np.sin(ha), np.cos(ha)
    sd, cd = np.sin(dec), np.cos(dec)
    x, y, z = xyz[:, 0], xyz[:, 1], xyz[:, 2]
    u = sH * x + cH * y
    v = -sd * cH * x + sd * sH * y + cd * z
    w = cd * cH * x - cd * sH * y + sd * z
    return np.stack([u, v, w], axis=1)


def simulate_obs(nant=12, ntime=16, nchan=4, duration_h=1.0,
                 freq0=1.0e9, bandwidth=0.4e9, dec=-0.5, lat=-0.52,
                 extent=1000.0, seed=0):
    """One scan of an earth-rotation synthesis observation."""
    enu = random_array_enu(nant, extent=extent, seed=seed)
    ap, aq = np.triu_indices(nant, 1)
    bl_xyz = enu_to_xyz(enu[ap] - enu[aq], lat)
    nbl = ap.size

    has = np.linspace(-duration_h / 2, duration_h / 2, ntime) * \
        (2 * np.pi / 24.0)
    t0 = 5.0e9  # arbitrary epoch, seconds
    dt = duration_h * 3600.0 / max(ntime - 1, 1)

    uvw = np.zeros((ntime * nbl, 3))
    time = np.zeros(ntime * nbl)
    ant1 = np.zeros(ntime * nbl, dtype=np.int32)
    ant2 = np.zeros(ntime * nbl, dtype=np.int32)
    for it, ha in enumerate(has):
        sl = slice(it * nbl, (it + 1) * nbl)
        uvw[sl] = xyz_to_uvw(bl_xyz, ha, dec)
        time[sl] = t0 + it * dt
        ant1[sl] = ap
        ant2[sl] = aq

    freq = freq0 + bandwidth * np.arange(nchan) / max(nchan, 1)
    return SimObservation(uvw=uvw, time=time, ant1=ant1, ant2=ant2,
                          freq=freq, ra=0.0, dec=dec)


def point_source_model(nx, ny, freq, nsource=10, seed=420,
                       margin=0, freq0=None):
    """Random point sources with power-law spectra on pixel centres —
    mirrors the upstream test ground truth (test_klean.py:71-78)."""
    rng = np.random.RandomState(seed)
    nchan = len(freq)
    if freq0 is None:
        freq0 = np.mean(freq)
    model = np.zeros((nchan, nx, ny))
    Ix = rng.randint(margin, nx - margin, nsource)
    Iy = rng.randint(margin, ny - margin, nsource)
    alpha = -0.7 + 0.1 * rng.randn(nsource)
    I0 = 1.0 + np.abs(rng.randn(nsource))
    for i in range(nsource):
        model[:, Ix[i], Iy[i]] = I0[i] * (freq / freq0) ** alpha[i]
    return model, Ix, Iy


def image_size_for(obs: SimObservation, fov_deg=1.0, srf=2.0):
    """Cell size from 1/(2 uv_max f_max / c) and an even 5-smooth image
    size covering the field of view (reference: workers/grid.py:242-264,
    init.py:183)."""
    from pfb_tpu.ops.dft import LIGHTSPEED
    from pfb_tpu.ops.fft import good_even_size
    uv_max = max(np.abs(obs.uvw[:, 0]).max(), np.abs(obs.uvw[:, 1]).max())
    cell_N = 1.0 / (2 * uv_max * obs.freq.max() / LIGHTSPEED)
    cell_rad = cell_N / srf
    cell_deg = np.rad2deg(cell_rad)
    npix = good_even_size(int(fov_deg / cell_deg))
    return npix, cell_rad
