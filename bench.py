"""Benchmark: PSF-Hessian matvec throughput at the BASELINE.json target
(4096^2 x 8 bands, float32) plus PCG iteration rate, on whatever
accelerator is attached.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

vs_baseline is the measured fraction of the HBM-roofline
("speed-of-light") time for the matvec on this chip: the op is
bandwidth-bound, moving ~5 full padded cubes (pad write, fft read+write
as complex, ifft read+write) of 8 x 8192^2 float32 = 2.15 GB each
(~12.9 GB) against the chip's nominal HBM bandwidth (819 GB/s on TPU
v5e). 1.0 would mean the FFT convolve saturates HBM.

The reference publishes no benchmark numbers (BASELINE.md), so there is
no upstream figure to normalise against.

Timing note: block_until_ready does not block on the axon TPU relay —
synchronisation is forced with a scalar readback (see
.claude/skills/verify/SKILL.md).
"""

import json
import os
import tempfile
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np


def chip_parity():
    """On-chip correctness certificate alongside the throughput
    numbers (round-4 VERDICT item 7: bench.py certified speed only, so
    a numerical regression on chip would not be caught by the driver's
    bench loop). Runs a small init -> grid -> spotless pipeline in f32
    on the attached accelerator and applies the two reference spotless
    assertions (tests/test_spotless.py:264-265 model2comps fit
    round-trip, :322-325 transfer-model re-grid residual
    consistency)."""
    import numpy as np

    from pfb_tpu.models.comps import eval_coeffs_to_cube
    from pfb_tpu.utils.ms import simulate_ms
    from pfb_tpu.workers.grid import _grid
    from pfb_tpu.workers.init import _init
    from pfb_tpu.workers.model2comps import _model2comps
    from pfb_tpu.workers.spotless import _spotless

    opts = dict(niter=2, rmsfactor=0.1, gamma=1.0, bases="self,db1",
                nlevels=2, l1reweight_from=2, pd_tol=5e-4,
                pd_maxit=300, verbose=0)
    with tempfile.TemporaryDirectory() as tmp:
        ms = os.path.join(tmp, "t.npz")
        out = os.path.join(tmp, "o")
        simulate_ms(ms, nant=9, ntime=4, nchan=2, nsource=3,
                    fov_deg=0.25, seed=7, gains=False)
        xds = _init(ms=ms, write=False, channels_per_image=1,
                    precision="single")
        dds = _grid(xdsi=xds, output_filename=out, suffix="main",
                    field_of_view=0.25, robustness=0.0, psf=True,
                    residual=False)
        rec, resid = _spotless(ddsi=[dict(d) for d in dds],
                               output_filename=out + "spot", **opts)
        rec = np.asarray(rec, np.float64)
        resid = np.asarray(resid, np.float64)
        nband = rec.shape[0]
        wsum = np.sum([d["WSUM"][0] for d in dds])
        dirty_mfs = np.sum([np.asarray(d["DIRTY"], np.float64)
                            for d in dds], axis=0) / wsum

        for ds in dds:
            ds["MODEL"] = rec[ds["bandid"]]
        mds = _model2comps(ddsi=dds, output_filename=out + "m",
                           nbasisf=nband, fit_mode="Legendre")
        freqs_out = np.unique([ds["freq_out"] for ds in dds])
        times_out = np.unique([ds["time_out"] for ds in dds])
        nxy = rec.shape[-2:]
        fit = eval_coeffs_to_cube(
            times_out, freqs_out, nxy[0], nxy[1],
            mds["coefficients"], mds["location_x"],
            mds["location_y"], mds["parametrisation"], mds["params"],
            mds["texpr"], mds["fexpr"])
        fit = np.asarray(fit)[0].reshape(rec.shape)
        peak = float(np.abs(rec).max())
        fit_err = float(np.abs(fit - rec).max() / peak)

        dds_t = _grid(xdsi=xds, output_filename=out + "t",
                      suffix="main", field_of_view=0.25,
                      robustness=0.0, psf=False, residual=True,
                      transfer_model_from=mds)
        res_t = np.zeros_like(resid)
        for ds in dds_t:
            res_t[ds["bandid"]] += np.asarray(ds["RESIDUAL"],
                                              np.float64) / wsum
        rscale = float(np.abs(dirty_mfs).max())
        consist_err = float(np.abs(res_t - resid).max() / rscale)
    return {"fit_roundtrip_rel": fit_err,
            "residual_consistency_rel": consist_err,
            # reference CPU/f64 asserts exact allclose; the on-chip
            # f32 gate (BASELINE.md round-4 chip measurements: 2.6e-18
            # and 8.8e-8)
            "ok": bool(fit_err < 1e-5 and consist_err < 1e-4)}


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    from pfb_tpu.ops.fft import make_psfhat
    from pfb_tpu.ops.psf import make_psf_convolve
    from pfb_tpu.opt.pcg import pcg_bands, pcg_bands_hostloop

    platform = jax.devices()[0].platform
    on_accel = platform != "cpu"

    if on_accel:
        nband, nx = 8, 4096
        band_chunk = 2
    else:  # CPU smoke fallback so the bench always emits a line
        nband, nx = 4, 512
        band_chunk = None
    nxp = 2 * nx

    def sync(x):
        return float(jnp.sum(x))

    psf = jnp.zeros((nband, nxp, nxp), jnp.float32)
    psf = psf.at[:, nx, nx].set(0.5)

    engine = "xla-fft"
    if platform == "tpu" and nx % 128 == 0:
        # fused Pallas four-step FFT pipeline (ops/pallas_fft.py):
        # measured 1.7x the XLA-FFT matvec throughput on v5e
        from pfb_tpu.ops.psf import make_psf_convolve_pallas
        # real_transfer=False: the bench PSF is a delta (exactly even),
        # but realistic w-gridded PSFs are only ~1%-even, so the
        # complex-H path is what production matvecs run — keep the
        # headline number representative
        hess = make_psf_convolve_pallas(psf, nx, nx,
                                        real_transfer=False)
        engine = "pallas"
        del psf
    else:
        psfhat = make_psfhat(psf, band_chunk=band_chunk)
        del psf
        hess = make_psf_convolve(psfhat, nxp, band_chunk=band_chunk)

    x = jnp.full((nband, nx, nx), 1e-3, jnp.float32)
    sync(hess(x))  # compile + warm

    # ---- matvec throughput ----
    # the scalar-readback sync costs ~50 ms over the remote-TPU relay;
    # chain enough matvecs per sync that it amortises below 5%
    trials = []
    for _ in range(3):
        n = 25 if on_accel else 5
        z = x
        t0 = time.perf_counter()
        for _ in range(n):
            z = hess(z)
        sync(z)
        trials.append((time.perf_counter() - t0) / n)
    best = min(trials)
    matvecs_per_s = 1.0 / best

    # roofline: ~5 padded-cube passes of HBM traffic
    bytes_moved = 5 * nband * nxp * nxp * 4
    hbm_bw = 819e9 if platform == "tpu" else 100e9  # v5e nominal
    sol_time = bytes_moved / hbm_bw
    vs_baseline = sol_time / best  # fraction of speed-of-light

    # ---- PCG iteration rate (fixed 50 iterations) ----
    b = hess(x)
    niter = 50 if on_accel else 20

    if engine == "pallas" and hasattr(hess, "apply"):
        # fully fused: one XLA program for the whole solve, with the
        # transfer function as a jit ARGUMENT (baking it as an HLO
        # constant blows the compile payload; an eager while_loop
        # closing over it deoptimises the Pallas pipeline ~40x)
        from pfb_tpu.opt.pcg import make_pcg_bands_fused
        # backtrack=False: fixed-iteration throughput measurement — a
        # backtracking line search would add data-dependent extra
        # matvecs and break comparability across runs
        solve = make_pcg_bands_fused(
            hess.apply, tol=0.0, maxit=niter, minit=niter,
            backtrack=False,
            apply_cg=getattr(hess, "apply_cg", None),
            cg_scale=getattr(hess, "cg_scale", None))
        x0 = jnp.zeros_like(b)
        pcg_path = "cg-fused" if hasattr(hess, "apply_cg") \
            else "fused"

        def run_pcg():
            return solve(b, x0, hess.consts)
    else:
        pcg_path = "hostloop"
        def run_pcg():
            return pcg_bands_hostloop(lambda v: hess(v), b,
                                      x0=jnp.zeros_like(b), tol=0.0,
                                      maxit=niter, minit=niter)
    sync(run_pcg())  # compile
    t0 = time.perf_counter()
    sync(run_pcg())
    pcg_iters_per_s = niter / (time.perf_counter() - t0)

    result = {
        "metric": f"psf_hessian_matvecs_per_s@{nx}^2x{nband}b_f32",
        "value": round(matvecs_per_s, 3),
        "unit": "matvec/s",
        "vs_baseline": round(vs_baseline, 4),
        "platform": platform,
        "matvec_ms": round(best * 1e3, 2),
        "matvec_ms_spread": [round(t * 1e3, 2) for t in
                             sorted(trials)],
        "pcg_iters_per_s": round(pcg_iters_per_s, 2),
        "pcg_path": pcg_path,
        "engine": engine,
    }

    # ---- Pallas gridder throughput (device-resident, 1M vis,
    # 1024^2, w-gridding on, eps 1e-5 — BASELINE.md's gridder case;
    # ducc0-class CPU reaches 10-100 Mvis/s) ----
    if platform == "tpu":
        from pfb_tpu.ops.pgridder import (_adjoint_from_plan,
                                          _forward_from_plan,
                                          make_hessian_pg, pgrid_plan)
        rng = np.random.default_rng(0)
        nrow, nchan, nxg = 125_000, 8, 1024
        uvw = rng.normal(scale=1000.0, size=(nrow, 3))
        uvw[:, 2] *= 0.1
        freq = np.linspace(0.9e9, 1.1e9, nchan)
        umax = np.abs(uvw[:, :2]).max() * freq[-1] / 299792458.0
        cell = 1.0 / (2.0 * umax * 2.0)
        nvis = nrow * nchan
        plan = pgrid_plan(uvw, freq, nx=nxg, ny=nxg, cellx=cell,
                          celly=cell, epsilon=1e-5, do_wgridding=True)
        vr = jnp.asarray(rng.normal(size=(nrow, nchan)).astype(
            np.float32))
        vi = jnp.asarray(rng.normal(size=(nrow, nchan)).astype(
            np.float32))
        img = _adjoint_from_plan(plan, vr, vi, None, False)
        sync(img)
        gtimes = {}
        hess_pg = make_hessian_pg(plan)
        # chain each op 8x with a scalar data dependency so the ~50 ms
        # relay sync amortises (same methodology as the matvec loop)
        nrep = 8

        def adj_chain(vr, vi):
            s = jnp.float32(0.0)
            for _ in range(nrep):
                im = _adjoint_from_plan(plan, vr + s, vi, None, False)
                s = im[0, 0] * 0.0
            return im

        def fwd_chain(x):
            s = jnp.float32(0.0)
            for _ in range(nrep):
                fr, fi = _forward_from_plan(plan, x + s,
                                            engine="pallas")
                s = fr[0, 0] * 0.0
            return fr

        def hess_chain(x):
            for _ in range(nrep):
                x = hess_pg(x)
            return x

        for name, fn, args in (("adjoint", adj_chain, (vr, vi)),
                               ("forward", fwd_chain, (img,)),
                               ("hessian", hess_chain, (img,))):
            sync(fn(*args))  # warm: compile outside the timed trials
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                r = fn(*args)
                sync(r)
                ts.append((time.perf_counter() - t0) / nrep)
            gtimes[name] = ts
        result["gridder_Mvis_per_s"] = {
            k: round(nvis / min(v) / 1e6, 2)
            for k, v in gtimes.items()}
        result["gridder_Mvis_per_s_spread"] = {
            k: [round(nvis / t / 1e6, 2) for t in sorted(v)]
            for k, v in gtimes.items()}

        # ---- flagship-scale gridder: 4096^2, w-gridding on, at a
        # PRODUCTION row count (1M rows x 8 chan = 8M vis — VERDICT r3
        # replaced the old 125k-row figure's amortisation claim with a
        # measurement), via the w-plane-BLOCKED plan set (all-planes
        # layout exceeds HBM at this size). Free the PSF-pipeline
        # arrays first (~4 GB of transfer functions + cubes) — the
        # 8192^2 extended grids need the HBM — and never let an OOM
        # here kill the whole bench line. ----
        del hess, x, b, img, plan, hess_pg
        if pcg_path == "fused":
            del solve, x0
        try:
            from pfb_tpu.ops.pgridder import (
                make_adjoint_pg_wblocked, make_hessian_pg_wblocked,
                pgrid_plan_wblocked)
            nxg4 = 4096
            nrow4 = 1_000_000
            uvw4 = rng.normal(scale=1000.0, size=(nrow4, 3))
            uvw4[:, 2] *= 0.1
            umax4 = np.abs(uvw4[:, :2]).max() * freq[-1] / 299792458.0
            cell4 = 1.0 / (2.0 * umax4 * 2.0)
            nvis4 = nrow4 * nchan
            bp = pgrid_plan_wblocked(uvw4, freq, nx=nxg4, ny=nxg4,
                                     cellx=cell4, celly=cell4,
                                     epsilon=1e-5, plane_block=4)
            vr4 = jnp.asarray(rng.normal(
                size=(nrow4, nchan)).astype(np.float32))
            vi4 = jnp.asarray(rng.normal(
                size=(nrow4, nchan)).astype(np.float32))
            hess4 = make_hessian_pg_wblocked(bp)
            adj4 = make_adjoint_pg_wblocked(bp)
            img4 = adj4(vr4, vi4)
            sync(img4)           # warm adjoint
            sync(hess4(img4))    # warm hessian
            g4 = {}
            for name, fn, args in (
                    ("adjoint", adj4, (vr4, vi4)),
                    ("hessian", hess4, (img4,))):
                ts = []
                for _ in range(2):
                    t0 = time.perf_counter()
                    sync(fn(*args))
                    ts.append(time.perf_counter() - t0)
                g4[name] = ts
            result["gridder4096_w_s_per_op"] = {
                k: round(min(v), 3) for k, v in g4.items()}
            result["gridder4096_w_Mvis_per_s"] = {
                k: round(nvis4 / min(v) / 1e6, 2)
                for k, v in g4.items()}
            result["gridder4096_nrow"] = nrow4
            result["gridder4096_nblocks"] = int(bp["nblocks"])
        except Exception as e:  # pragma: no cover - device-dependent
            result["gridder4096_error"] = \
                f"{type(e).__name__}: {str(e)[:120]}"

    if on_accel:
        try:
            result["parity"] = chip_parity()
        except Exception as e:  # pragma: no cover - device-dependent
            result["parity"] = {
                "error": f"{type(e).__name__}: {str(e)[:120]}"}

    print(json.dumps(result))


if __name__ == "__main__":
    main()
