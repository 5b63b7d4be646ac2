"""Capture a jax.profiler trace of the v3 PSF matvec at 4096^2 x 8
(VERDICT r3 item 6: publish profiler evidence of the matvec floor or
close the 77% -> 85% gap). Writes the trace dir and lists what the
runtime produced (over the axon relay device-side tracing may be
unavailable — that result is evidence too); if a Chrome-format
trace.json.gz appears, prints the top device ops by total duration."""
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from pfb_tpu.ops.psf import make_psf_convolve_pallas

TRACE = "/tmp/jax_matvec_trace"


def main():
    nband, nx = 8, 4096
    rng = np.random.default_rng(0)
    psf = np.zeros((nband, 2 * nx, 2 * nx), np.float32)
    psf[:, nx, nx] = 1.0
    psf[:, nx + 32, nx] = 0.03
    psf[:, nx - 32, nx] = 0.03
    conv = make_psf_convolve_pallas(jnp.asarray(psf), nx, nx)
    x = jnp.asarray(rng.normal(size=(nband, nx, nx)).astype(np.float32))

    @jax.jit
    def chain(x, consts):
        def step(v, _):
            return conv.apply(v, consts), None
        return lax.scan(step, x, None, length=20)[0]

    float(jnp.sum(chain(x, conv.consts)))  # compile+warm
    t0 = time.perf_counter()
    float(jnp.sum(chain(x, conv.consts)))
    dt = time.perf_counter() - t0
    print(f"matvec: {dt / 20 * 1e3:.2f} ms", flush=True)

    with jax.profiler.trace(TRACE):
        float(jnp.sum(chain(x, conv.consts)))

    files = sorted(glob.glob(TRACE + "/**/*", recursive=True))
    for f in files:
        if os.path.isfile(f):
            print(f"{os.path.getsize(f):>12} {f}", flush=True)

    js = [f for f in files if f.endswith("trace.json.gz")]
    if js:
        with gzip.open(js[0], "rt") as fh:
            tr = json.load(fh)
        dur = defaultdict(float)
        for ev in tr.get("traceEvents", []):
            if ev.get("ph") == "X" and "dur" in ev:
                dur[ev.get("name", "?")] += ev["dur"]
        for name, d in sorted(dur.items(), key=lambda kv: -kv[1])[:25]:
            print(f"{d/1e3:10.2f} ms  {name[:90]}", flush=True)


if __name__ == "__main__":
    main()
