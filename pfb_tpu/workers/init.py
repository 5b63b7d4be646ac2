"""init worker: MS (+ optional gain table) -> per-chunk Stokes
visibility store (xds).

TPU-native equivalent of pfb/workers/init.py + utils/stokes2vis.py:
reads the npz MS, splits rows into time chunks (integrations_per_image)
and channels into freq chunks (channels_per_image), computes
Jones-corrected Stokes visibilities + weights with the sympy->jnp
kernels, and writes an xds store with the reference's field names.
"""

import numpy as np

from pfb_tpu.utils import dstore
from pfb_tpu.utils.ms import read_ms
from pfb_tpu.utils.stokes import unity_jones, weight_data


def _init(ms=None, output_filename=None, product="I",
          channels_per_image=None, integrations_per_image=-1,
          gain_table=None, data_column="DATA", weight_column=None,
          flag_column="FLAG", beam_model=None, max_field_of_view=3.0,
          overwrite=True, write=True, **kw):
    """Returns the list of xds datasets (and writes
    ``{output_filename}_{PRODUCT}.xds`` unless write=False).

    Chunking mirrors construct_mappings (utils/misc.py:250-487): rows
    grouped by unique time into integrations_per_image-sized chunks;
    channels into channels_per_image-sized chunks (-1/None = all).
    """
    msd = read_ms(ms) if isinstance(ms, (str, bytes)) or hasattr(
        ms, "__fspath__") else dict(ms)

    data = msd[data_column]
    nrow, nchan, ncorr = data.shape
    uvw = msd["UVW"]
    time = msd["TIME"]
    ant1 = msd["ANTENNA1"]
    ant2 = msd["ANTENNA2"]
    freq = msd["FREQ"]
    flag = msd.get(flag_column, np.zeros(data.shape, bool))
    wgt = msd.get(weight_column or "WEIGHT_SPECTRUM",
                  np.ones(data.shape))
    pol = str(msd.get("POLTYPE", "linear"))
    ra = float(msd.get("RA", 0.0))
    dec = float(msd.get("DEC", 0.0))

    utime = np.unique(time)
    ntime = utime.size
    tbin_map = np.searchsorted(utime, time)
    nant = int(max(ant1.max(), ant2.max())) + 1

    if gain_table is not None:
        g = np.load(gain_table) if isinstance(gain_table, str) else \
            gain_table
        jones = g["jones"] if hasattr(g, "files") or isinstance(g, dict) \
            else g
    else:
        jones = unity_jones(ntime, nant, nchan)

    ipi = integrations_per_image
    if ipi in (0, -1, None):
        ipi = ntime
    cpi = channels_per_image
    if cpi in (0, -1, None):
        cpi = nchan

    # per-(row,chan) flag: flagged if any correlation flagged
    flag_rc = flag.any(axis=-1)

    datasets = []
    for t0 in range(0, ntime, ipi):
        tsel = (tbin_map >= t0) & (tbin_map < t0 + ipi)
        rows = np.where(tsel)[0]
        for c0 in range(0, nchan, cpi):
            csel = slice(c0, min(c0 + cpi, nchan))
            import jax.numpy as jnp

            from pfb_tpu.config import to_device
            vis, wout = weight_data(
                to_device(data[rows][:, csel]),
                jnp.asarray(wgt[rows][:, csel]),
                jnp.asarray(flag_rc[rows][:, csel].astype(np.uint8)),
                to_device(jones[:, :, csel]),
                jnp.asarray(tbin_map[rows]),
                jnp.asarray(ant1[rows]), jnp.asarray(ant2[rows]),
                product=product, pol=pol, mode="diag")
            mask = (~flag_rc[rows][:, csel]).astype(np.uint8)
            from pfb_tpu.config import to_host
            ds = {
                "VIS": to_host(vis),
                "WEIGHT": np.asarray(wout),
                "MASK": mask,
                "UVW": uvw[rows],
                "FREQ": freq[csel],
                "time_out": float(np.mean(utime[t0:t0 + ipi])),
                "freq_out": float(np.mean(freq[csel])),
                "freq_min": float(freq[csel].min()),
                "freq_max": float(freq[csel].max()),
                "time_min": float(utime[t0:t0 + ipi].min()),
                "time_max": float(utime[t0:t0 + ipi].max()),
                "ra": ra,
                "dec": dec,
                "product": product,
            }
            # primary beam on a coarse grid at freq_out (reference
            # attaches BEAM/l_beam/m_beam per xds, stokes2vis.py:235-280)
            from pfb_tpu.utils.beam import interp_beam
            nb = 64
            cell_b = max_field_of_view / nb
            bvals, l_b, m_b = interp_beam(ds["freq_out"], nb, nb,
                                          cell_b, btype=beam_model)
            ds["BEAM"] = bvals
            ds["l_beam"] = l_b
            ds["m_beam"] = m_b
            datasets.append(ds)

    if write and output_filename is not None:
        name = f"{output_filename}_{product.upper()}.xds"
        dstore.write_store(name, datasets, overwrite=overwrite)
    return datasets
