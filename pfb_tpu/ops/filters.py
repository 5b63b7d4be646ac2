"""Daubechies filter banks, generated from first principles.

The reference pulls filter coefficients from PyWavelets
(pfb/operators/psi.py:37-41); PyWavelets is not available here, so the
extremal-phase Daubechies scaling filters are computed by spectral
factorisation of the Daubechies half-band polynomial (the textbook
construction), then assembled into the same four-filter bank layout
PyWavelets uses:

    rec_lo = h                      (scaling filter, sum = sqrt(2))
    dec_lo = reverse(h)
    rec_hi[k] = (-1)^k dec_lo[k]    (quadrature mirror)
    dec_hi = reverse(rec_hi)

Orientation matches PyWavelets' dbN (checked against the closed-form
db2 coefficients (1±sqrt(3))/(4 sqrt(2)) in tests/test_wavelets.py).
"""

from functools import lru_cache
from math import comb

import numpy as np


@lru_cache(maxsize=None)
def daubechies_scaling(p: int) -> np.ndarray:
    """Extremal-phase Daubechies scaling filter h with p vanishing
    moments (length 2p), normalised so sum(h) = sqrt(2)."""
    if p < 1:
        raise ValueError("order must be >= 1")
    if p == 1:  # Haar
        return np.array([1.0, 1.0]) / np.sqrt(2.0)

    # Half-band polynomial P(y) = sum_k C(p-1+k, k) y^k
    P = np.array([comb(p - 1 + k, k) for k in range(p)], dtype=np.float64)

    # Substitute y = (2 - z - 1/z)/4 and clear denominators:
    # z^{p-1} P((2 - z - 1/z)/4) is a degree-2(p-1) polynomial in z.
    # Build it by expanding each term y^k -> ((-z^2 + 2z - 1)/(4z))^k.
    # Coefficients indexed from z^0 .. z^{2(p-1)}.
    poly = np.zeros(2 * p - 1, dtype=np.float64)
    base = np.array([-1.0, 2.0, -1.0]) / 4.0  # (-1 + 2z - z^2)/4 coeffs
    for k in range(p):
        # ((-1 + 2z - z^2)/4)^k as a polynomial of degree 2k
        term = np.array([1.0])
        for _ in range(k):
            term = np.convolve(term, base)
        # multiply by z^{p-1-k} to align (total shift z^{p-1} / z^k)
        shifted = np.zeros(2 * p - 1)
        shifted[p - 1 - k:p - 1 - k + term.size] = term
        poly += P[k] * shifted

    # Roots; keep those strictly inside the unit circle (minimum phase)
    roots = np.roots(poly[::-1])  # np.roots wants descending order
    inside = roots[np.abs(roots) < 1.0]
    # pair complex roots; product over (z - r) for kept roots
    q = np.array([1.0 + 0.0j])
    for r in inside:
        q = np.convolve(q, np.array([1.0, -r]))
    q = q.real  # roots come in conjugate pairs

    # h(z) ~ (1 + z)^p * q(z)
    h = np.array([1.0])
    for _ in range(p):
        h = np.convolve(h, np.array([1.0, 1.0]))
    h = np.convolve(h, q)
    h = h / h.sum() * np.sqrt(2.0)

    # Orientation: PyWavelets' extremal-phase filters have the large
    # coefficients at the front (h[0] ~ 0.48 for db2). The spectral
    # factorisation can come out reversed; flip if energy is at the back.
    n = h.size
    front = np.sum(h[: n // 2] ** 2)
    back = np.sum(h[n // 2:] ** 2)
    if back > front:
        h = h[::-1]
    return h


def filter_bank(wavelet: str):
    """(dec_lo, dec_hi, rec_lo, rec_hi) for 'dbN' — same layout as
    pywt.Wavelet(name).filter_bank."""
    if not wavelet.startswith("db"):
        raise ValueError(f"Only Daubechies bases supported, got {wavelet}")
    p = int(wavelet[2:])
    h = daubechies_scaling(p)
    rec_lo = h
    dec_lo = h[::-1].copy()
    k = np.arange(h.size)
    rec_hi = ((-1.0) ** k) * dec_lo
    dec_hi = rec_hi[::-1].copy()
    return dec_lo, dec_hi, rec_lo, rec_hi


def dwt_max_level(data_len: int, wavelet: str) -> int:
    """Max useful decomposition level (pywt.dwt_max_level semantics)."""
    p = int(wavelet[2:])
    filter_len = 2 * p
    if data_len < filter_len - 1:
        return 0
    import math
    return int(math.floor(math.log2(data_len / (filter_len - 1))))
