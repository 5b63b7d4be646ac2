"""Primary beam models and evaluation onto the image grid.

Equivalent of pfb/utils/beam.py: the reference interpolates katbeam
JimBeam (MeerKAT L/UHF polynomial fits) or a measured .npz beam onto the
image grid. katbeam is unavailable here, so the built-in model is the
standard cosine-cubed aperture-taper approximation used for MeerKAT-like
dishes (cos^3 with frequency-scaled argument); measured beams load from
npz with (beam, l_beam, m_beam) arrays. ``eval_beam`` regrids with a
RegularGridInterpolator exactly like the reference (beam.py:143-154).
"""

import numpy as np
from scipy.interpolate import RegularGridInterpolator


def cos3_beam(l_deg, m_deg, freq_hz, dish_diameter=13.5,
              ref_freq=1.28e9):
    """Cosine-cubed primary beam: b = cos^3(min(theta_b, pi/2)) with
    theta_b ~ 1.18 theta r / theta_HPBW — the standard analytic
    MeerKAT-ish approximation (katbeam's JimBeam is a refined fit of
    the same shape)."""
    r = np.sqrt(l_deg**2 + m_deg**2)
    # HPBW in degrees ~ 1.18 lambda / D
    lam = 299792458.0 / freq_hz
    hpbw = np.rad2deg(1.18 * lam / dish_diameter)
    arg = 1.18866 * r / hpbw  # cos^3 hits 0.5 at arg ~ 0.5
    arg = np.minimum(arg * np.pi / 2 / 0.593, np.pi / 2)
    return np.cos(arg) ** 3


def interp_beam(freq, nx, ny, cell_deg, btype="kbl", l0=0.0, m0=0.0,
                dish_diameter=13.5, utime=None, radec=None, lat=None,
                lst0=0.0):
    """Evaluate a beam model for one frequency on a coarse grid,
    returning (beam, l_grid, m_grid) like the reference's interp_beam
    (pfb/utils/beam.py:84-140).

    When ``utime`` (array of time samples) plus ``radec`` and ``lat``
    are given, the beam is the TIME AVERAGE over the per-sample
    parallactic-angle rotations of the sky frame — the beam_cube_dde
    path of reference beam.py:16-83 (which carries a stray
    ipdb.set_trace upstream; rebuilt from design intent). Rotation is
    a no-op for circularly symmetric models but matters for measured
    .npz beams."""
    l = (-(nx // 2) + np.arange(nx)) * cell_deg + l0
    m = (-(ny // 2) + np.arange(ny)) * cell_deg + m0
    ll, mm = np.meshgrid(l, m, indexing="ij")

    interp = None
    if isinstance(btype, str) and btype.endswith(".npz"):
        # load + build the interpolator ONCE — model() runs per
        # parallactic-angle sample below
        with np.load(btype) as f:
            bvals = f["beam"]
            l_b = f["l_beam"]
            m_b = f["m_beam"]
        interp = RegularGridInterpolator((l_b, m_b), bvals,
                                         bounds_error=False,
                                         fill_value=0.0)

    def model(llg, mmg):
        if btype is None or btype == "none":
            return np.ones(llg.shape)
        if btype in ("kbl", "kbuhf", "cos3"):
            return cos3_beam(llg, mmg, freq,
                             dish_diameter=dish_diameter)
        if interp is not None:
            return interp((llg, mmg))
        raise ValueError(f"Unknown beam model {btype}")

    if utime is None:
        return model(ll, mm), l, m

    from pfb_tpu.utils.astrometry import parallactic_angle
    ra, dec = radec
    pas = parallactic_angle(np.atleast_1d(utime), ra, dec, lat,
                            lst0=lst0)
    beam = np.zeros((nx, ny))
    for pa in pas:
        c, s = np.cos(pa), np.sin(pa)
        beam += model(c * ll + s * mm, -s * ll + c * mm)
    return beam / pas.size, l, m


def eval_beam(beam, l_beam, m_beam, l_out, m_out):
    """Resample a beam from its native grid onto image coordinates
    (reference eval_beam, pfb/utils/beam.py:143-154)."""
    interp = RegularGridInterpolator((l_beam, m_beam), beam,
                                     bounds_error=False, fill_value=0.0)
    ll, mm = np.meshgrid(l_out, m_out, indexing="ij")
    return interp((ll, mm))
