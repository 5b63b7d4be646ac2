"""Mesh-resident spotless major iteration at the flagship scale
(4096^2 x 8 bands, f32): fused-Pallas PD backward step + stacked
pg-gridder exact residual, on whatever accelerator is attached
(1-device mesh on a single chip; band-sharded on a pod slice).

Prints one JSON line with the per-phase timings. BASELINE config 5
(spotless on 4096^2 x 8) is this workload's multi-host form.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    from pfb_tpu.ops.psf import prep_pallas_hessian
    from pfb_tpu.ops.psi import make_psi
    from pfb_tpu.parallel.dist import (hessian_psf_dist,
                                       make_hessian_dds_dist,
                                       primal_dual_dist)
    from pfb_tpu.parallel.mesh import (band_sharding, coeff_sharding,
                                       make_mesh, replicated)

    platform = jax.devices()[0].platform
    on_tpu = platform == "tpu"
    nband, nx = (8, 4096) if on_tpu else (4, 256)
    nrow, nchan = (125_000, 1) if on_tpu else (2000, 1)
    pd_iters = 20
    nmesh = min(nband, len(jax.devices()))
    mesh = make_mesh(nband=nmesh, nspace=1,
                     devices=jax.devices()[:nmesh])

    def sync(x):
        return float(jnp.sum(x))

    # synthetic PSF cube (delta + sidelobe; gridding an 8192^2 PSF
    # would need the 16384^2 oversampled grid — out of scope here)
    nxp = 2 * nx
    psf = np.zeros((nband, nxp, nxp), np.float32)
    psf[:, nx, nx] = 1.0 / nband
    # EVEN sidelobes: a real PSF is Hermitian-symmetric, so the
    # transfer function is real -> real_transfer path, half the H
    # memory/traffic (the complex-H variant pushed the w-ON major
    # cycle over HBM at 4096^2x8)
    psf[:, nx + 32, nx] = 0.03 / nband
    psf[:, nx - 32, nx] = 0.03 / nband
    psf[:, nx, nx + 32] = 0.03 / nband
    psf[:, nx, nx - 32] = 0.03 / nband

    bands = band_sharding(mesh)
    hsh = jax.NamedSharding(mesh, jax.sharding.PartitionSpec("band"))
    hr, hi, row_block = prep_pallas_hessian(
        jnp.asarray(psf), nx, nx, real_transfer="auto")
    if hi is None:  # even PSF -> real transfer, half the H memory
        hargs = (jax.device_put(hr, hsh),)
    else:
        hargs = (jax.device_put(hr, hsh), jax.device_put(hi, hsh))
    del hr, hi, psf
    ekw = dict(engine="pallas", nx=nx, ny=nx, row_block=row_block,
               nh=len(hargs))

    rng = np.random.default_rng(0)
    dirty = jax.device_put(jnp.asarray(
        rng.normal(size=(nband, nx, nx)).astype(np.float32) * 1e-3),
        bands)
    model = jax.device_put(jnp.zeros((nband, nx, nx), jnp.float32),
                           bands)

    # synthetic visibility datasets for the exact pg residual, with
    # w-gridding ON everywhere: on the chip the residual runs through
    # the stacked w-plane-BLOCKED plan sets (plane_block=4 -> grid
    # memory O(4 x 8192^2) instead of the all-planes layout's
    # ~5.4 GB x 3 buffer generations that exceeded HBM at 4096^2)
    do_w = True
    plane_block = (int(os.environ.get("DM_PB", "4"))
                   if on_tpu else None)
    uvw = rng.normal(scale=1000.0, size=(nrow, 3))
    uvw[:, 2] *= 0.02
    freqs = np.linspace(0.9e9, 1.1e9, nband * nchan)
    umax = np.abs(uvw[:, :2]).max() * freqs[-1] / 299792458.0
    cell = 1.0 / (2.0 * umax * 2.0)
    dds = [dict(UVW=uvw, FREQ=freqs[b * nchan:(b + 1) * nchan],
                WEIGHT=np.ones((nrow, nchan)),
                MASK=np.ones((nrow, nchan)), bandid=b, cell_rad=cell,
                DIRTY=np.zeros((nx, nx)), WSUM=np.array([1.0]))
           for b in range(nband)]
    wsum = float(nband * nrow * nchan)

    t0 = time.perf_counter()
    hess_exact = make_hessian_dds_dist(mesh, dds, nband, wsum, nx, nx,
                                       use_beam=False, backend="pg",
                                       epsilon=1e-5, do_wgridding=do_w,
                                       plane_block=plane_block)
    t_plan = time.perf_counter() - t0

    psi = make_psi(nx, nx, ("self", "db1"), 3)
    pd = primal_dual_dist(mesh, psi, nu=psi.nbasis, tol=0.0,
                          maxit=pd_iters, positivity=1, **ekw)
    dual = jax.device_put(
        jnp.zeros((nband, psi.nbasis, psi.Nymax, psi.Nxmax),
                  jnp.float32), coeff_sharding(mesh))
    l1w = jax.device_put(
        jnp.ones((psi.nbasis, psi.Nymax, psi.Nxmax), jnp.float32),
        replicated(mesh))
    psf_convolve = hessian_psf_dist(mesh, **ekw)

    lam = jnp.asarray(1e-4, jnp.float32)
    L = jnp.asarray(1.2, jnp.float32)

    def major(model, dual, resid):
        data = resid + psf_convolve(model, *hargs)
        m, d, w, k = pd(model, dual, data, hargs, l1w, lam, L)
        conv = hess_exact(m)
        return m, d, dirty - conv

    # compile + warm
    t0 = time.perf_counter()
    m, d, r = major(model, dual, dirty)
    sync(r)
    t_compile = time.perf_counter() - t0

    t0 = time.perf_counter()
    m, d, r = major(m, d, r)
    sync(r)
    t_major = time.perf_counter() - t0

    # phase split
    t0 = time.perf_counter()
    data = r + psf_convolve(m, *hargs)
    m2, d2, w2, k2 = pd(m, d, data, hargs, l1w, lam, L)
    sync(m2)
    t_pd = time.perf_counter() - t0
    t0 = time.perf_counter()
    conv = hess_exact(m2)
    sync(conv)
    t_resid = time.perf_counter() - t0

    print(json.dumps({
        "metric": f"spotless_dist_major_iter@{nx}^2x{nband}b_f32",
        "platform": platform, "mesh_devices": len(mesh.devices.ravel()),
        "pd_iters": pd_iters, "nvis": nband * nrow * nchan,
        "major_iter_s": round(t_major, 3),
        "pd_solve_s": round(t_pd, 3),
        "pd_ms_per_iter": round(t_pd / pd_iters * 1e3, 2),
        "exact_residual_s": round(t_resid, 3),
        "residual_Mvis_per_s": round(
            nband * nrow * nchan / t_resid / 1e6, 2),
        "plan_s": round(t_plan, 2), "compile_s": round(t_compile, 1),
    }))


if __name__ == "__main__":
    main()
