"""UVW synthesis and coordinate helpers.

Equivalent of pfb/utils/astrometry.py: the reference recomputes UVW with
casacore measures (fixvis-style, astrometry.py:19-103); here the same
textbook chain (antenna ITRF/ENU -> hour angle -> uvw) is implemented
directly. Ephemeris targets (get_coordinates for e.g. the Sun) need an
ephemeris service and are stubbed.
"""

import numpy as np

from pfb_tpu.utils.simulation import enu_to_xyz, xyz_to_uvw


def synthesize_uvw(ants_enu, time_s, ant1, ant2, phase_dir, lat,
                   lst0=0.0, earth_rate=2 * np.pi / 86164.0905):
    """Recompute UVW for given antenna ENU positions and times.

    phase_dir = (ra, dec) radians; lst approximated as
    lst0 + earth_rate * t (sidereal). Mirrors the role of the
    casacore-based synthesize_uvw (reference astrometry.py:19-103).
    """
    ra, dec = phase_dir
    xyz = enu_to_xyz(ants_enu, lat)
    utime, idx = np.unique(time_s, return_inverse=True)
    uvw = np.zeros((time_s.size, 3))
    for i, t in enumerate(utime):
        ha = lst0 + earth_rate * t - ra
        sel = idx == i
        bl = xyz[ant1[sel]] - xyz[ant2[sel]]
        uvw[sel] = xyz_to_uvw(bl, ha, dec)
    return uvw


def get_coordinates(obs_time, target="Sun"):
    """Ephemeris target -> (ra, dec) radians at ``obs_time`` (MS TIME
    convention: seconds of MJD). The reference resolves ephemeris
    targets through casacore measures (astrometry.py:104-137);
    here the Sun uses the standard low-precision solar position
    algorithm (Meeus/Almanac, ~0.01 deg) — ample for pointing a
    primary-beam model or a movie phase centre."""
    if target.lower() != "sun":
        raise ValueError(
            f"Only the Sun ephemeris is built in (got {target!r}); "
            "pass explicit radec for other bodies.")
    mjd = np.mean(np.atleast_1d(obs_time)) / 86400.0
    n = mjd - 51544.5  # days since J2000
    L = np.deg2rad((280.460 + 0.9856474 * n) % 360.0)
    g = np.deg2rad((357.528 + 0.9856003 * n) % 360.0)
    lam = L + np.deg2rad(1.915) * np.sin(g) + \
        np.deg2rad(0.020) * np.sin(2 * g)
    eps = np.deg2rad(23.439 - 4e-7 * n)
    ra = np.arctan2(np.cos(eps) * np.sin(lam), np.cos(lam)) % (2 * np.pi)
    dec = np.arcsin(np.sin(eps) * np.sin(lam))
    return float(ra), float(dec)


def parse_target(target, obs_time=None):
    """Resolve a --target string to (ra, dec) radians (reference
    grid.py target / fastim.py target semantics): either an ephemeris
    body name (see :func:`get_coordinates`) or 'HH:MM:SS,DD:MM:SS'
    (comma-delimited, as the reference documents), or 'rad,rad' when
    both fields are plain floats."""
    s = str(target).strip()
    if "," not in s:
        return get_coordinates(obs_time, target=s)
    a, b = (p.strip() for p in s.split(",", 1))

    def sexa(txt, hours):
        parts = [float(p) for p in txt.split(":")]
        while len(parts) < 3:
            parts.append(0.0)
        sign = -1.0 if txt.lstrip().startswith("-") else 1.0
        val = abs(parts[0]) + parts[1] / 60.0 + parts[2] / 3600.0
        deg = val * (15.0 if hours else 1.0)
        return sign * np.deg2rad(deg)

    if ":" in a or ":" in b:
        return sexa(a, hours=True), sexa(b, hours=False)
    return float(a), float(b)


def parallactic_angle(time_s, ra, dec, lat, lst0=0.0,
                      earth_rate=2 * np.pi / 86164.0905):
    """Parallactic angle (radians) per time sample for a source at
    (ra, dec) seen from latitude ``lat``; LST approximated as
    lst0 + earth_rate * t like :func:`synthesize_uvw`."""
    ha = lst0 + earth_rate * np.asarray(time_s, np.float64) - ra
    return np.arctan2(
        np.cos(lat) * np.sin(ha),
        np.sin(lat) * np.cos(dec) -
        np.cos(lat) * np.sin(dec) * np.cos(ha))


def radec_to_lm(radec_target, radec_phase_centre):
    """Direction cosines of a target w.r.t. the phase centre (SIN
    projection) — same convention as africanus' radec_to_lm used by the
    grid worker (reference grid.py:371)."""
    ra, dec = radec_target
    ra0, dec0 = radec_phase_centre
    dra = ra - ra0
    l = np.cos(dec) * np.sin(dra)
    m = (np.sin(dec) * np.cos(dec0) -
         np.cos(dec) * np.sin(dec0) * np.cos(dra))
    return l, m


def _uvw_basis(ra, dec):
    """Rows (u, v, w) of the uvw projection for phase centre
    (ra, dec): w along the source, u east, v north."""
    sa, ca = np.sin(ra), np.cos(ra)
    sd, cd = np.sin(dec), np.cos(dec)
    return np.array([[-sa, ca, 0.0],
                     [-sd * ca, -sd * sa, cd],
                     [cd * ca, cd * sa, sd]])


def rephase_to(vis, uvw, radec_in, radec_out, freq):
    """Exactly re-reference visibilities to a new phase centre
    (init.yaml radec; the reference raises NotImplementedError on this
    path, stokes2vis.py:162-165): rotate the uvw frame
    (uvw' = T(out) T(in)^T uvw, the fixvis operation) and counter-
    rotate the phases by the w change. Returns (vis', uvw')."""
    Tin = _uvw_basis(*radec_in)
    Tout = _uvw_basis(*radec_out)
    uvw_new = np.asarray(uvw) @ (Tout @ Tin.T).T
    from pfb_tpu.ops.dft import LIGHTSPEED
    # vis convention exp(-2pi i (u l + v m + w (n-1))) (ops/dft.py):
    # vis' = vis * exp(+2pi i (w_new - w_old) / lambda)
    dw = uvw_new[:, 2] - np.asarray(uvw)[:, 2]  # metres
    phase = dw[:, None] * (np.asarray(freq)[None, :] / LIGHTSPEED)
    vis = np.asarray(vis)
    if vis.ndim == 3:  # (row, chan, corr)
        phase = phase[..., None]
    return vis * np.exp(2j * np.pi * phase), uvw_new


def rephase_vis(vis, uvw, radec_in, radec_out, freq=None):
    """Phase-rotate visibilities to a new phase centre
    (reference misc.py:759-772). uvw in wavelengths if freq is None,
    else metres with per-channel scaling."""
    from pfb_tpu.ops.dft import LIGHTSPEED
    l_i, m_i = radec_to_lm(radec_in, radec_in)  # zero by construction
    l_o, m_o = radec_to_lm(radec_out, radec_in)
    n_i = 1.0
    n_o = np.sqrt(1.0 - l_o**2 - m_o**2)
    dl, dm, dn = l_o - l_i, m_o - m_i, n_o - n_i
    phase = uvw[:, 0] * dl + uvw[:, 1] * dm + uvw[:, 2] * dn
    if freq is not None:
        phase = phase[:, None] * (freq[None, :] / LIGHTSPEED)
    return vis * np.exp(2j * np.pi * phase)
