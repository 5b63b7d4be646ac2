"""Dataset concatenation along row (time) and channel (band) axes.

Equivalents of concat_row / concat_chan (reference:
pfb/utils/misc.py:776-987): concat_row merges all time chunks of a band
into one dataset (wsum-weighted beam); concat_chan maps nband_in
frequency chunks onto nband_out coarser bands by concatenating the
channel axes of datasets sharing a time chunk.
"""

import numpy as np


def concat_row(xds):
    """Merge datasets of equal freq_out across time chunks."""
    freqs = np.unique([ds["freq_out"] for ds in xds])
    times = np.unique([ds["time_out"] for ds in xds])
    if times.size == 1:
        return xds
    out = []
    for nu in freqs:
        group = [ds for ds in xds if ds["freq_out"] == nu]
        group = sorted(group, key=lambda d: d["time_out"])
        ds0 = dict(group[0])
        ds0["VIS"] = np.concatenate([d["VIS"] for d in group], axis=0)
        ds0["WEIGHT"] = np.concatenate([d["WEIGHT"] for d in group],
                                       axis=0)
        ds0["MASK"] = np.concatenate([d["MASK"] for d in group], axis=0)
        ds0["UVW"] = np.concatenate([d["UVW"] for d in group], axis=0)
        ds0["time_out"] = float(np.mean([d["time_out"] for d in group]))
        ds0["time_min"] = float(min(d.get("time_min", d["time_out"])
                                    for d in group))
        ds0["time_max"] = float(max(d.get("time_max", d["time_out"])
                                    for d in group))
        out.append(ds0)
    return out


def concat_chan(xds, nband_out):
    """Re-bin the frequency axis onto nband_out bands."""
    freqs_in = np.unique([ds["freq_out"] for ds in xds])
    times = np.unique([ds["time_out"] for ds in xds])
    nband_in = freqs_in.size
    if nband_out == nband_in:
        return xds
    if nband_out > nband_in:
        raise ValueError(
            f"Cannot split {nband_in} input bands into {nband_out}")
    # group input bands into contiguous output bands
    edges = np.linspace(0, nband_in, nband_out + 1).astype(int)
    out = []
    for t in times:
        tgroup = sorted([ds for ds in xds if ds["time_out"] == t],
                        key=lambda d: d["freq_out"])
        for b in range(nband_out):
            group = tgroup[edges[b]:edges[b + 1]]
            if not group:
                continue
            ds0 = dict(group[0])
            ds0["VIS"] = np.concatenate([d["VIS"] for d in group],
                                        axis=1)
            ds0["WEIGHT"] = np.concatenate([d["WEIGHT"] for d in group],
                                           axis=1)
            ds0["MASK"] = np.concatenate([d["MASK"] for d in group],
                                         axis=1)
            ds0["FREQ"] = np.concatenate([d["FREQ"] for d in group])
            ds0["freq_out"] = float(np.mean(ds0["FREQ"]))
            ds0["freq_min"] = float(ds0["FREQ"].min())
            ds0["freq_max"] = float(ds0["FREQ"].max())
            out.append(ds0)
    return out
