"""TPU f32 spotless (SARA) convergence parity: simulate on CPU in
float64 and run the full init -> grid -> spotless pipeline TWICE — once
CPU/f64 (subprocess) and once float32 on the chip — then compare with
the reference test protocol (tests/test_spotless.py):

- model fit exactness: model2comps on the TPU model reproduces it
  (reference :264-265 asserts exact allclose on CPU/f64; here the fit
  runs host-side f64 on the f32 model, asserted at 1e-6),
- residual consistency: the --transfer-model-from re-grid of the TPU
  model reproduces the TPU residual (reference :322-325 R/R.H round
  trip),
- f32-vs-f64 drift of the recovered model and final residual (the
  SARA analogue of scripts/tpu_klean_precision.py — l1-reweighted
  primal-dual exercises coefficient identities the klean path never
  touches).

Prints one JSON line for BASELINE.md.
"""

import json
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SPOT_OPTS = dict(niter=5, rmsfactor=0.1, gamma=1.0,
                 bases="self,db1,db2", nlevels=2, l1reweight_from=3,
                 pd_tol=5e-4, pd_maxit=600, verbose=0)

CPU_SNIPPET = r"""
import sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np
from pfb_tpu.utils.ms import simulate_ms
from pfb_tpu.workers.init import _init
from pfb_tpu.workers.grid import _grid
from pfb_tpu.workers.spotless import _spotless
model, Ix, Iy, nx, cell, _ = simulate_ms(
    {ms!r}, nant=13, ntime=6, nchan=2, nsource=3, fov_deg=0.25,
    seed=7, gains=False)
xds = _init(ms={ms!r}, write=False, channels_per_image=1)
dds = _grid(xdsi=xds, output_filename={out!r} + "cpu", suffix="main",
            field_of_view=0.25, robustness=0.0, psf=True,
            residual=False)
rec, resid = _spotless(ddsi=[dict(d) for d in dds],
                       output_filename={out!r} + "cpuspot",
                       **{opts!r})
wsum = np.sum([d["WSUM"][0] for d in dds])
dirty_mfs = np.sum([d["DIRTY"] for d in dds], axis=0) / wsum
np.savez({meta!r}, model=model, Ix=Ix, Iy=Iy, nx=nx, cell=cell,
         rec=rec, resid=resid, wsum=wsum, dirty_mfs=dirty_mfs)
"""


def main():
    os.makedirs("/root/.jax_cache", exist_ok=True)
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    import numpy as np

    repo = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "..")
    tmp = os.environ.get("SPOT_TMP") or tempfile.mkdtemp()
    os.makedirs(tmp, exist_ok=True)
    ms = os.path.join(tmp, "t.npz")
    meta = os.path.join(tmp, "meta.npz")
    out = os.path.join(tmp, "o")
    if not os.path.exists(meta):  # SPOT_TMP caches the CPU/f64 half
        subprocess.run([sys.executable, "-c", CPU_SNIPPET.format(
            repo=repo, ms=ms, meta=meta, out=out, opts=SPOT_OPTS)],
            check=True)
    m = np.load(meta)
    rec_cpu, resid_cpu = m["rec"], m["resid"]
    model, Ix, Iy = m["model"], m["Ix"], m["Iy"]
    dirty_mfs = m["dirty_mfs"]

    from pfb_tpu.workers.grid import _grid
    from pfb_tpu.workers.init import _init
    from pfb_tpu.workers.model2comps import _model2comps
    from pfb_tpu.workers.spotless import _spotless

    print("backend:", jax.default_backend(), flush=True)
    xds = _init(ms=ms, write=False, channels_per_image=1,
                precision="single")
    dds = _grid(xdsi=xds, output_filename=out, suffix="main",
                field_of_view=0.25, robustness=0.0, psf=True,
                residual=False)
    rec, resid = _spotless(ddsi=[dict(d) for d in dds],
                           output_filename=out + "spot", **SPOT_OPTS)
    rec = np.asarray(rec, np.float64)
    resid = np.asarray(resid, np.float64)
    nband = rec.shape[0]
    wsum = np.sum([d["WSUM"][0] for d in dds])

    # reference :264-265 — the component fit reproduces the model
    for ds in dds:
        ds["MODEL"] = rec[ds["bandid"]]
    mds = _model2comps(ddsi=dds, output_filename=out + "m",
                       nbasisf=nband, fit_mode="Legendre")
    from pfb_tpu.models.comps import eval_coeffs_to_cube
    freqs_out = np.unique([ds["freq_out"] for ds in dds])
    times_out = np.unique([ds["time_out"] for ds in dds])
    nxy = rec.shape[-2:]
    fit = eval_coeffs_to_cube(times_out, freqs_out, nxy[0], nxy[1],
                              mds["coefficients"], mds["location_x"],
                              mds["location_y"],
                              mds["parametrisation"], mds["params"],
                              mds["texpr"], mds["fexpr"])
    fit = np.asarray(fit)[0].reshape(rec.shape)
    peak = np.abs(rec).max()
    fit_err = float(np.abs(fit - rec).max() / peak)

    # reference :322-325 — transfer-model re-grid reproduces residual
    dds_t = _grid(xdsi=xds, output_filename=out + "t", suffix="main",
                  field_of_view=0.25, robustness=0.0, psf=False,
                  residual=True, transfer_model_from=mds)
    res_t = np.zeros_like(resid)
    for ds in dds_t:
        res_t[ds["bandid"]] += np.asarray(ds["RESIDUAL"],
                                          np.float64) / wsum
    rscale = np.abs(dirty_mfs).max()
    consist_err = float(np.abs(res_t - resid).max() / rscale)

    # f32 vs f64 drift (model + final residual)
    drift_model = float(np.abs(rec - rec_cpu).max() / peak)
    drift_resid = float(np.abs(resid - resid_cpu).max() / rscale)

    print(json.dumps({
        "metric": "tpu_f32_spotless_parity",
        "fit_roundtrip_rel": fit_err,
        "residual_consistency_rel": consist_err,
        "model_drift_f32_vs_f64_rel": drift_model,
        "residual_drift_f32_vs_f64_rel": drift_resid,
        "peak_model": peak, "dirty_mfs_peak": rscale,
    }))


if __name__ == "__main__":
    main()
