"""smoovie worker: render fds residual snapshots to a movie.

Equivalent of pfb/workers/smoovie.py:21-461: scan-boundary-respecting
time (or freq) binning with wsum-weighted frame sums, optional
annotated frame rendering, and animated output. The reference uses
streamjoy + matplotlib; here frames are normalised, colour-mapped with
matplotlib and written as an animated GIF via PIL or an mp4 via
imageio when an ffmpeg backend is installed (GIF fallback otherwise).
"""

import numpy as np

from pfb_tpu.utils import dstore
from pfb_tpu.utils.logging import get_logger

log = get_logger("SMOOVIE")


def sum_blocks(frames, wsums):
    """wsum-weighted frame sum (reference smoovie.py sum_blocks)."""
    wsum = np.sum(wsums)
    out = np.sum(frames, axis=0)
    if wsum > 0:
        out = out / wsum
    return out, wsum


def _bin_keys_scanwise(fds, key_of, nbin):
    """Group datasets into bins of nbin consecutive keys that never
    cross a scan boundary (reference smoovie.py: time bins are formed
    per scan so frames cannot mix scans)."""
    scans = sorted({ds.get("scanid", 0) for ds in fds})
    groups = []
    for s in scans:
        sds = [ds for ds in fds if ds.get("scanid", 0) == s]
        keys = np.unique([key_of(ds) for ds in sds])
        for i0 in range(0, keys.size, nbin):
            sel = set(keys[i0:i0 + nbin].tolist())
            group = [ds for ds in sds if key_of(ds) in sel]
            if group:
                groups.append(group)
    return groups


def _render_annotated(frame, label, cmap, lo, hi):
    """Matplotlib-rendered RGB frame with a label and colorbar
    (reference plot_frame, smoovie.py:380-430)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(5, 5), dpi=96)
    im = ax.imshow(frame.T, origin="lower", cmap=cmap, vmin=lo,
                   vmax=hi)
    ax.set_title(label, fontsize=9)
    ax.axis("off")
    fig.colorbar(im, ax=ax, shrink=0.8)
    fig.canvas.draw()
    buf = np.asarray(fig.canvas.buffer_rgba())[..., :3].copy()
    plt.close(fig)
    return buf


def _smoovie(fdsi=None, output_filename=None, product="I",
             suffix="fds", animate_axis="time", out_format="gif",
             fps=5, t_bin=1, f_bin=None, cmap="grey", annotate=False,
             write=True, **kw):
    """Returns the list of rendered frames (2D arrays); writes the
    movie. out_format 'gif' or 'mp4' (mp4 needs an imageio ffmpeg
    backend; falls back to gif)."""
    if fdsi is None:
        name = f"{output_filename}_{product.upper()}_{suffix}.fds"
        fds = dstore.read_store(name)
    else:
        fds = fdsi

    if animate_axis == "time":
        key_of = lambda ds: ds["time_out"]
        nbin = t_bin or 1
    else:
        key_of = lambda ds: ds["freq_out"]
        nbin = f_bin or 1

    frames = []
    labels = []
    for group in _bin_keys_scanwise(fds, key_of, nbin):
        frame, wsum = sum_blocks(
            np.stack([ds["RESIDUAL"] for ds in group]),
            np.stack([ds["WSUM"][0] for ds in group]))
        frames.append(frame)
        if animate_axis == "time":
            labels.append(
                f"scan {group[0].get('scanid', 0)}  "
                f"t = {np.mean([key_of(d) for d in group]):.1f} s")
        else:
            labels.append(
                f"nu = {np.mean([key_of(d) for d in group])/1e6:.1f}"
                " MHz")

    if write and output_filename is not None and frames:
        import matplotlib
        cmname = "gray" if cmap in ("grey", "gray") else cmap
        cm = matplotlib.colormaps.get_cmap(cmname)
        lo = min(f.min() for f in frames)
        hi = max(f.max() for f in frames)
        rng = hi - lo if hi > lo else 1.0
        rgb = []
        for f, lab in zip(frames, labels):
            if annotate:
                rgb.append(_render_annotated(f, lab, cmname, lo, hi))
            else:
                rgb.append((cm((f - lo) / rng) * 255).astype(np.uint8))

        out = f"{output_filename}_{product.upper()}_movie.{out_format}"
        if out_format == "mp4":
            try:
                import imageio
                with imageio.get_writer(out, fps=fps) as w:
                    for r in rgb:
                        w.append_data(r[..., :3])
            except Exception as e:  # no ffmpeg backend in this env
                log.warning(
                    "mp4 writer unavailable (%s); writing GIF", e)
                out = out[:-4] + ".gif"
                _write_gif(out, rgb, fps)
        else:
            _write_gif(out, rgb, fps)
        log.info("wrote %s (%d frames)", out, len(rgb))
    return frames


def _write_gif(out, rgb, fps):
    from PIL import Image
    imgs = [Image.fromarray(r) for r in rgb]
    imgs[0].save(out, save_all=True, append_images=imgs[1:],
                 duration=int(1000 / fps), loop=0)
