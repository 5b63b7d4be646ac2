"""TPU f32 end-to-end precision check: simulate on CPU in float64,
run init -> grid -> klean on the TPU in float32, report the klean
point-source flux error against the 5e-5 CPU/f64 tolerance regime
(BASELINE.md TPU-precision story; reference tests/test_klean.py).

Run with no args: spawns the CPU simulation in a subprocess (f64),
then executes the pipeline on the default (TPU) backend.
"""

import json
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SIM_SNIPPET = r"""
import sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np
from pfb_tpu.utils.ms import simulate_ms
model, Ix, Iy, nx, cell, _ = simulate_ms(
    {ms!r}, nant=13, ntime=8, nchan=2, nsource=3, fov_deg=0.25,
    seed=99, gains=False)
np.savez({meta!r}, model=model, Ix=Ix, Iy=Iy, nx=nx, cell=cell)
"""


def main():
    os.makedirs("/root/.jax_cache", exist_ok=True)
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    import numpy as np

    repo = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "..")
    tmp = tempfile.mkdtemp()
    ms = os.path.join(tmp, "t.npz")
    meta = os.path.join(tmp, "meta.npz")
    subprocess.run([sys.executable, "-c", SIM_SNIPPET.format(
        repo=repo, ms=ms, meta=meta)], check=True)
    m = np.load(meta)
    model, Ix, Iy = m["model"], m["Ix"], m["Iy"]
    nx, cell = int(m["nx"]), float(m["cell"])

    from pfb_tpu.workers.grid import _grid
    from pfb_tpu.workers.init import _init
    from pfb_tpu.workers.klean import _klean

    print("backend:", jax.default_backend(), flush=True)
    out = os.path.join(tmp, "o")
    xds = _init(ms=ms, output_filename=out, channels_per_image=1,
                precision="single")
    dds = _grid(xdsi=xds, output_filename=out, suffix="main",
                field_of_view=0.25, robustness=0.0, psf=True,
                residual=False)
    rec, resid = _klean(ddsi=[dict(d) for d in dds],
                        output_filename=out + "k", niter=100,
                        threshold=1e-5, gamma=0.1, peak_factor=0.75,
                        sub_peak_factor=0.75, mop_flux=True,
                        dirosion=0, verbose=0)
    l = (np.arange(nx) - nx // 2) * cell
    ll, mm = np.meshgrid(l, l, indexing="ij")
    eps = ll**2 + mm**2
    n = (1 - eps / (np.sqrt(1 - eps) + 1))[Ix, Iy]
    errs = [float(np.abs(rec[:, Ix[s], Iy[s]] * n[s]
                         - model[:, Ix[s], Iy[s]]).max())
            for s in range(Ix.size)]
    print(json.dumps({"metric": "tpu_f32_klean_flux_err",
                      "value": max(errs), "per_source": errs,
                      "tolerance_regime": 5e-5}))


if __name__ == "__main__":
    main()
