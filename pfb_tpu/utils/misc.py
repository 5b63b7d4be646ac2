"""Misc numerics: PSF Gaussian fitting, convolution to a common
resolution, Kronecker matvecs, edge slicing.

Equivalents of the corresponding pieces of pfb/utils/misc.py in the
reference (cited per function). scipy.ndimage.label replaces
skimage.measure.label.
"""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.ndimage import label
from scipy.optimize import fmin_l_bfgs_b


def to4d(data):
    """Broadcast 1-4D arrays to 4D (reference misc.py:96-106)."""
    if data.ndim == 4:
        return data
    if data.ndim == 2:
        return data[None, None]
    if data.ndim == 3:
        return data[None]
    if data.ndim == 1:
        return data[None, None, None]
    raise ValueError("Only arrays with ndim <= 4 can be broadcast to 4D.")


def kron_matvec(A, b):
    """Kronecker-product matvec (I_x (x) I_y ...) (reference
    misc.py:63-74)."""
    D = len(A)
    N = b.size
    x = b.ravel()
    for d in range(D):
        Gd = A[d].shape[0]
        NGd = N // Gd
        X = np.reshape(x, (Gd, NGd))
        Z = A[d].dot(X).T
        x = Z.ravel()
    return x.reshape(b.shape)


def give_edges(p, q, nx, ny, nx_psf, ny_psf):
    """Overlap slices between image and PSF centred at (p, q)
    (reference misc.py:141-167)."""
    nx0 = nx_psf // 2
    ny0 = ny_psf // 2
    xl = np.maximum(p - nx0, 0)
    xu = np.minimum(p + nx0, nx)
    yl = np.maximum(q - ny0, 0)
    yu = np.minimum(q + ny0, ny)
    xlpsf = np.maximum(nx0 - p, 0)
    xupsf = np.minimum(nx0 + nx - p, nx_psf)
    ylpsf = np.maximum(ny0 - q, 0)
    yupsf = np.minimum(ny0 + ny - q, ny_psf)
    return (slice(xl, xu), slice(yl, yu),
            slice(xlpsf, xupsf), slice(ylpsf, yupsf))


def Gaussian2D(xin, yin, GaussPar=(1.0, 1.0, 0.0), normalise=True,
               nsigma=5):
    """Elliptical Gaussian on a coordinate grid, FWHM-parametrised
    (reference misc.py:109-138)."""
    S0, S1, PA = GaussPar
    Smaj, Smin = S0, S1
    A = np.array([[1.0 / Smin**2, 0], [0, 1.0 / Smaj**2]])
    t = np.deg2rad(-PA)
    R = np.array([[np.cos(t), -np.sin(t)], [np.sin(t), np.cos(t)]])
    A = R.T @ A @ R
    sOut = xin.shape
    extent = (nsigma * Smaj) ** 2
    xflat = xin.squeeze()
    yflat = yin.squeeze()
    idx, idy = np.where(xflat**2 + yflat**2 <= extent)
    x = np.array([xflat[idx, idy].ravel(), yflat[idx, idy].ravel()])
    Rq = np.einsum("nb,bc,cn->n", x.T, A, x)
    fwhm_conv = 2 * np.sqrt(2 * np.log(2))
    tmp = np.exp(-fwhm_conv * Rq)
    gausskern = np.zeros(xflat.shape, dtype=np.float64)
    gausskern[idx, idy] = tmp
    if normalise:
        gausskern /= np.sum(gausskern)
    return np.ascontiguousarray(gausskern.reshape(sOut), dtype=np.float64)


@jax.jit
def psf_errorsq(x, data, xy):
    """Sum-squared error of a FWHM-parametrised Gaussian fit — the JAX
    objective the reference already uses (misc.py:506-526)."""
    emaj, emin, pa = x
    Smin = jnp.minimum(emaj, emin)
    Smaj = jnp.maximum(emaj, emin)
    A = jnp.array([[1.0 / Smin**2, 0], [0, 1.0 / Smaj**2]])
    t = jnp.deg2rad(-pa)
    R = jnp.array([[jnp.cos(t), -jnp.sin(t)],
                   [jnp.sin(t), jnp.cos(t)]])
    B = R.T @ A @ R
    Q = jnp.einsum("nb,bc,cn->n", xy.T, B, xy)
    fwhm_conv = 2 * jnp.sqrt(2 * jnp.log(2))
    model = jnp.exp(-fwhm_conv * Q)
    res = data - model
    return jnp.vdot(res, res).real


def fitcleanbeam(psf, level=0.5, pixsize=1.0, extent=15.0):
    """Fit a 2D Gaussian to the PSF main lobe per band
    (reference misc.py:529-584): label islands above ``level``, select
    the central one, fit with L-BFGS-B on the JAX objective."""
    nband, nx, ny = psf.shape
    x = np.arange(-nx / 2, nx / 2)
    y = np.arange(-ny / 2, ny / 2)
    xx, yy = np.meshgrid(x, y, indexing="ij")

    dfunc = jax.jit(jax.value_and_grad(psf_errorsq))

    Gausspars = []
    for v in range(nband):
        if not psf[v].any():
            Gausspars.append([np.nan, np.nan, np.nan])
            continue
        psfv = psf[v] / psf[v].max()
        mask = np.where(psfv > level, 1.0, 0.0)
        islands, _ = label(mask)
        ncenter = islands[nx // 2, ny // 2]
        xisl = xx[islands == ncenter]
        yisl = yy[islands == ncenter]
        xdiff = xisl.max() - xisl.min()
        ydiff = yisl.max() - yisl.min()
        rsq = np.abs(xisl).max() ** 2 + np.abs(yisl).max() ** 2
        idxs = (xx**2 + yy**2) < extent * rsq
        data = psfv[idxs]
        xy = np.vstack((xx[idxs], yy[idxs]))
        emaj0 = max(xdiff, ydiff)
        emin0 = min(xdiff, ydiff)

        def fg(p):
            val, g = dfunc(jnp.asarray(p), jnp.asarray(data),
                           jnp.asarray(xy))
            return float(val), np.asarray(g, dtype=np.float64)

        p, f, d = fmin_l_bfgs_b(
            fg, np.array((emaj0, emin0, 0.0)),
            bounds=((0, None), (0, None), (None, None)), factr=1e11)
        Gausspars.append([p[0] * pixsize, p[1] * pixsize, p[2]])
    return Gausspars


def convolve2gaussres(image, xx, yy, gaussparf, gausspari=None,
                      pfrac=0.5, norm_kernel=False):
    """Convolve a cube to a target resolution, optionally deconvolving
    each band's initial resolution in the Fourier domain
    (reference misc.py:186-238)."""
    from pfb_tpu.ops.fft import get_padding_info

    nband, nx, ny = image.shape
    padding, unpad_x, unpad_y = get_padding_info(nx, ny, pfrac)
    lastsize = ny + int(np.sum(padding[-1]))

    gausskern = Gaussian2D(xx, yy, gaussparf, normalise=norm_kernel)
    gausskern = np.pad(gausskern[None], padding, mode="constant")
    gausskernhat = np.fft.rfft2(np.fft.ifftshift(gausskern, axes=(1, 2)),
                                axes=(1, 2))

    impad = np.pad(image, padding, mode="constant")
    imhat = np.fft.rfft2(np.fft.ifftshift(impad, axes=(1, 2)),
                         axes=(1, 2))

    if gausspari is None:
        imhat *= gausskernhat
    else:
        for i in range(nband):
            thiskern = Gaussian2D(xx, yy, gausspari[i],
                                  normalise=norm_kernel)
            thiskern = np.pad(thiskern[None], padding, mode="constant")
            thiskernhat = np.fft.rfft2(
                np.fft.ifftshift(thiskern, axes=(1, 2)), axes=(1, 2))
            convkernhat = np.where(np.abs(thiskernhat) > 0.0,
                                   gausskernhat / np.where(
                                       np.abs(thiskernhat) > 0.0,
                                       thiskernhat, 1.0), 0.0)
            imhat[i] *= convkernhat[0]

    image_out = np.fft.fftshift(
        np.fft.irfft2(imhat, s=(impad.shape[1], lastsize), axes=(1, 2)),
        axes=(1, 2))[:, unpad_x, unpad_y]
    return image_out


def remove_large_islands(x, max_island_size=100):
    """Zero islands larger than max_island_size pixels
    (reference misc.py:1355-1363)."""
    islands, num = label(x.squeeze())
    for i in range(1, num + 1):
        msk = islands == i
        if msk.sum() > max_island_size:
            x[msk] = 0.0
    return x
