"""Scaling-efficiency harness (BASELINE.json: >=80% matvec nnz/s at
N>=2 hosts): measures the band-sharded PSF-Hessian matvec rate per
chip at increasing mesh sizes and reports efficiency vs the 1-chip
rate.

On a TPU pod slice run one process per host:
    python scripts/scaling_bench.py --coordinator host0:1234 \
        --num-processes N --process-id i
On a single chip (or CPU with
XLA_FLAGS=--xla_force_host_platform_device_count=8) it sweeps the
local device counts. Virtual CPU devices share cores, so CPU numbers
validate the harness, not the hardware.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")


def bench_mesh(mesh, nband, nx, reps=3, chain=10):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pfb_tpu.ops.fft import make_psfhat
    from pfb_tpu.parallel.dist import hessian_psf_dist
    from pfb_tpu.parallel.mesh import band_sharding

    nxp = 2 * nx
    psf = jnp.zeros((nband, nxp, nxp), jnp.float32)
    psf = psf.at[:, nx, nx].set(0.5)
    psfhat = make_psfhat(psf, band_chunk=1)
    sh = band_sharding(mesh)
    x = jax.device_put(jnp.full((nband, nx, nx), 1e-3, jnp.float32),
                       sh)
    ph = jax.device_put(psfhat, sh)
    hess = hessian_psf_dist(mesh, nxp)
    z = hess(x, ph)
    float(jnp.sum(z))
    best = np.inf
    for _ in range(reps):
        z = x
        t0 = time.perf_counter()
        for _ in range(chain):
            z = hess(z, ph)
        float(jnp.sum(z))
        best = min(best, (time.perf_counter() - t0) / chain)
    return 1.0 / best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--nx", type=int, default=None)
    ap.add_argument("--nband-per-device", type=int, default=1)
    args = ap.parse_args()

    import jax

    # honour JAX_PLATFORMS even where sitecustomize pre-registers a
    # TPU plugin (the env var alone is not enough on such images)
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms",
                          os.environ["JAX_PLATFORMS"])
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    if args.coordinator:
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id)

    from pfb_tpu.parallel.mesh import make_mesh

    devs = jax.devices()
    platform = devs[0].platform
    nx = args.nx or (4096 if platform == "tpu" else 256)

    results = []
    n = 1
    while n <= len(devs):
        mesh = make_mesh(nband=n, nspace=1, devices=devs[:n])
        nband = n * args.nband_per_device
        rate = bench_mesh(mesh, nband, nx)
        # weak scaling: per-device problem size fixed; efficiency is
        # (rate at n) / (n * rate at 1) of band-matvecs/s
        results.append(dict(ndevices=n, nband=nband,
                            matvecs_per_s=round(rate, 3),
                            band_matvecs_per_s=round(rate * nband, 3)))
        n *= 2
    base = results[0]["band_matvecs_per_s"]
    for r in results:
        r["efficiency"] = round(
            r["band_matvecs_per_s"] / (r["ndevices"] * base), 4)
    if args.process_id in (None, 0):
        print(json.dumps({"metric": "matvec_scaling",
                          "platform": platform, "nx": nx,
                          "results": results}))


if __name__ == "__main__":
    main()
