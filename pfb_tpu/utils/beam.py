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
                dish_diameter=13.5):
    """Evaluate a beam model for one frequency on a coarse grid,
    returning (beam, l_grid, m_grid) like the reference's interp_beam
    (pfb/utils/beam.py:84-140)."""
    l = (-(nx // 2) + np.arange(nx)) * cell_deg + l0
    m = (-(ny // 2) + np.arange(ny)) * cell_deg + m0
    ll, mm = np.meshgrid(l, m, indexing="ij")
    if btype is None or btype == "none":
        beam = np.ones((nx, ny))
    elif btype in ("kbl", "kbuhf", "cos3"):
        beam = cos3_beam(ll, mm, freq, dish_diameter=dish_diameter)
    elif btype.endswith(".npz"):
        with np.load(btype) as f:
            bvals = f["beam"]
            l_b = f["l_beam"]
            m_b = f["m_beam"]
        interp = RegularGridInterpolator((l_b, m_b), bvals,
                                         bounds_error=False,
                                         fill_value=0.0)
        beam = interp((ll, mm))
    else:
        raise ValueError(f"Unknown beam model {btype}")
    return beam, l, m


def eval_beam(beam, l_beam, m_beam, l_out, m_out):
    """Resample a beam from its native grid onto image coordinates
    (reference eval_beam, pfb/utils/beam.py:143-154)."""
    interp = RegularGridInterpolator((l_beam, m_beam), beam,
                                     bounds_error=False, fill_value=0.0)
    ll, mm = np.meshgrid(l_out, m_out, indexing="ij")
    return interp((ll, mm))
