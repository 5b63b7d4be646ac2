"""smoovie worker: render fds residual snapshots to a GIF movie.

Equivalent of pfb/workers/smoovie.py:21-461: scan-respecting time/freq
binning with wsum-weighted frame sums, then frame rendering. The
reference uses streamjoy + matplotlib; here frames are normalised,
colour-mapped with matplotlib and written as an animated GIF via PIL.
"""

import numpy as np

from pfb_tpu.utils import dstore


def sum_blocks(frames, wsums):
    """wsum-weighted frame sum (reference smoovie.py sum_blocks)."""
    wsum = np.sum(wsums)
    out = np.sum(frames, axis=0)
    if wsum > 0:
        out = out / wsum
    return out, wsum


def _smoovie(fdsi=None, output_filename=None, product="I",
             suffix="fds", animate_axis="time", out_format="gif",
             fps=5, t_bin=1, f_bin=None, cmap="grey", write=True, **kw):
    """Returns the list of rendered frames (2D arrays); writes a GIF."""
    if fdsi is None:
        name = f"{output_filename}_{product.upper()}_{suffix}.fds"
        fds = dstore.read_store(name)
    else:
        fds = fdsi

    times = np.unique([ds["time_out"] for ds in fds])
    freqs = np.unique([ds["freq_out"] for ds in fds])

    if animate_axis == "time":
        keys = times
        key_of = lambda ds: ds["time_out"]
        nbin = t_bin or 1
    else:
        keys = freqs
        key_of = lambda ds: ds["freq_out"]
        nbin = f_bin or 1

    frames = []
    for i0 in range(0, keys.size, nbin):
        sel = keys[i0:i0 + nbin]
        group = [ds for ds in fds if key_of(ds) in sel]
        if not group:
            continue
        frame, wsum = sum_blocks(
            np.stack([ds["RESIDUAL"] for ds in group]),
            np.stack([ds["WSUM"][0] for ds in group]))
        frames.append(frame)

    if write and output_filename is not None and frames:
        from PIL import Image
        import matplotlib
        cm = matplotlib.colormaps.get_cmap(
            "gray" if cmap in ("grey", "gray") else cmap)
        lo = min(f.min() for f in frames)
        hi = max(f.max() for f in frames)
        rng = hi - lo if hi > lo else 1.0
        imgs = []
        for f in frames:
            norm = (f - lo) / rng
            rgba = (cm(norm) * 255).astype(np.uint8)
            imgs.append(Image.fromarray(rgba))
        out = f"{output_filename}_{product.upper()}_movie.{out_format}"
        imgs[0].save(out, save_all=True, append_images=imgs[1:],
                     duration=int(1000 / fps), loop=0)
    return frames
