"""fastim worker: high-cadence residual snapshot imaging.

Equivalent of pfb/workers/fastim.py + utils/stokes2im.py: for every
(scan, time-chunk, band) produce a small residual dirty image —
weights, optional model subtraction (from an mds), robust weighting
and gridding all in one pass — written to an fds store for the smoovie
movie maker. The reference farms chunks to dask workers with a
seed-and-refill task queue (fastim.py:370-487); here the JAX async
dispatch IS the pipeline: each chunk's device work is launched before
the previous chunk's results are materialised to host, so host I/O
(column slicing, fds assembly) overlaps device gridding.
"""

import numpy as np

from pfb_tpu.config import to_device, to_host
from pfb_tpu.models.comps import eval_coeffs_to_slice
from pfb_tpu.ops.gridder import get_backend
from pfb_tpu.ops.weighting import compute_counts, counts_to_weights
from pfb_tpu.utils import dstore
from pfb_tpu.utils.ms import read_ms
from pfb_tpu.utils.stokes import unity_jones, weight_data


def _fastim(ms=None, output_filename=None, product="I", suffix="fds",
            mds=None, channels_per_image=None, integrations_per_image=1,
            robustness=None, super_resolution_factor=2.0,
            field_of_view=1.0, nx=None, cell_size=None, backend="dft",
            gain_table=None, data_column="DATA", write=True, **kw):
    """Returns the list of fds datasets (one small image per
    (time-chunk, band))."""
    import jax.numpy as jnp

    from pfb_tpu.ops.dft import LIGHTSPEED
    from pfb_tpu.ops.fft import good_even_size

    msd = read_ms(ms)
    data = msd[data_column]
    nrow, nchan, ncorr = data.shape
    uvw = msd["UVW"]
    time = msd["TIME"]
    ant1, ant2 = msd["ANTENNA1"], msd["ANTENNA2"]
    freq = msd["FREQ"]
    flag = msd.get("FLAG", np.zeros(data.shape, bool))
    wgt_in = msd.get("WEIGHT_SPECTRUM", np.ones(data.shape))
    pol = str(msd.get("POLTYPE", "linear"))

    utime = np.unique(time)
    ntime = utime.size
    tbin_map = np.searchsorted(utime, time)
    nant = int(max(ant1.max(), ant2.max())) + 1

    if gain_table is not None:
        jones = np.load(gain_table)["jones"]
    else:
        jones = unity_jones(ntime, nant, nchan)

    if isinstance(mds, str):
        mds = dstore.read_store(mds)[0]

    ipi = integrations_per_image or 1
    cpi = channels_per_image
    if cpi in (0, -1, None):
        cpi = nchan

    # image geometry
    uv_max = np.abs(uvw[:, :2]).max()
    cell_N = 1.0 / (2 * uv_max * freq.max() / LIGHTSPEED)
    if cell_size is not None:
        cell_rad = cell_size * np.pi / 60 / 60 / 180
    else:
        cell_rad = cell_N / super_resolution_factor
    if nx is None:
        cell_arcsec = cell_rad * 60 * 60 * 180 / np.pi
        nx = good_even_size(int(field_of_view * 3600 / cell_arcsec))
    ny = nx

    flag_rc = flag.any(axis=-1)
    d2v, v2d = get_backend(backend)
    scan = np.asarray(msd.get("SCAN_NUMBER", np.zeros(nrow, np.int32)))

    def launch(srows, t0, t1, sid, c0):
        """Dispatch one (scan, time-chunk, band) snapshot's device
        work; returns device arrays + metadata (no host sync)."""
        rows = srows[(tbin_map[srows] >= t0) & (tbin_map[srows] < t1)]
        tout = float(np.mean(utime[t0:t1]))
        csel = slice(c0, min(c0 + cpi, nchan))
        vis, wout = weight_data(
            to_device(data[rows][:, csel]),
            jnp.asarray(wgt_in[rows][:, csel]),
            jnp.asarray(flag_rc[rows][:, csel].astype(np.uint8)),
            to_device(jones[:, :, csel]),
            jnp.asarray(tbin_map[rows]), jnp.asarray(ant1[rows]),
            jnp.asarray(ant2[rows]), product=product, pol=pol)
        mask = (~flag_rc[rows][:, csel]).astype(np.uint8)
        uvw_j = jnp.asarray(uvw[rows])
        freq_j = jnp.asarray(freq[csel])
        fout = float(np.mean(freq[csel]))

        if mds is not None:
            image = eval_coeffs_to_slice(
                tout, fout, mds["coefficients"], mds["location_x"],
                mds["location_y"], mds["parametrisation"],
                mds["params"], mds["texpr"], mds["fexpr"],
                mds["npix_x"], mds["npix_y"], mds["cell_rad_x"],
                mds["cell_rad_y"], mds.get("center_x", 0.0),
                mds.get("center_y", 0.0), nx, ny, cell_rad,
                cell_rad, 0.0, 0.0)
            mvis = d2v(uvw_j, freq_j, jnp.asarray(image), cell_rad,
                       cell_rad)
            vis = vis - mvis

        if robustness is not None:
            counts = compute_counts(uvw_j, freq_j, jnp.asarray(mask),
                                    nx, ny, cell_rad, cell_rad)
            imw = counts_to_weights(counts, uvw_j, freq_j, nx, ny,
                                    cell_rad, cell_rad, robustness)
            wout = wout * imw

        wsum = jnp.where(jnp.asarray(mask, bool), wout, 0.0).sum()
        dirty = v2d(uvw_j, freq_j, vis, wgt=wout,
                    mask=jnp.asarray(mask), nx=nx, ny=ny,
                    cellx=cell_rad, celly=cell_rad)
        return dict(dirty=dirty, wsum=wsum, tout=tout, fout=fout,
                    timeid=int(t0 // ipi), bandid=int(c0 // cpi),
                    scanid=int(sid))

    def finish(p):
        """Materialise a launched snapshot to a host fds entry."""
        return {
            "RESIDUAL": np.asarray(p["dirty"]),
            "WSUM": np.atleast_1d(float(p["wsum"])),
            "time_out": p["tout"],
            "freq_out": p["fout"],
            "timeid": p["timeid"],
            "bandid": p["bandid"],
            "scanid": p["scanid"],
            "cell_rad": float(cell_rad),
            "ra": float(msd.get("RA", 0.0)),
            "dec": float(msd.get("DEC", 0.0)),
        }

    # time chunks never cross scan boundaries (reference fastim
    # chunks per (ddid, scan)); device work for chunk k+1 is dispatched
    # before chunk k's host readback, overlapping I/O with compute
    fds = []
    pending = None
    for sid in np.unique(scan):
        srows = np.where(scan == sid)[0]
        tbins = np.unique(tbin_map[srows])
        for i0 in range(0, tbins.size, ipi):
            t0 = tbins[i0]
            t1 = tbins[min(i0 + ipi, tbins.size) - 1] + 1
            for c0 in range(0, nchan, cpi):
                nxt = launch(srows, t0, t1, sid, c0)
                if pending is not None:
                    fds.append(finish(pending))
                pending = nxt
    if pending is not None:
        fds.append(finish(pending))

    if write and output_filename is not None:
        name = f"{output_filename}_{product.upper()}_{suffix}.fds"
        dstore.write_store(name, fds, overwrite=True)
    return fds
