"""Calibrate the ES-kernel shape parameter beta per support k.

For each support k, scan beta and measure the max relative error of
vis2dirty_wgrid against the exact-DFT oracle on a small random case
(CPU, f64, w-gridding on). The reference's ducc0 backend ships
per-(support, sigma) optimised kernels reaching ~1 decade of accuracy
per tap; the fixed beta=2.3 used so far only achieves ~0.73.

Writes the winning (k -> beta, achieved_eps) table to stdout in the
form consumed by pfb_tpu.ops.wgridder.kernel_params.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402


def case(nrow=3000, nchan=4, nx=256, seed=1):
    rng = np.random.default_rng(seed)
    uvw = rng.normal(scale=800.0, size=(nrow, 3))
    uvw[:, 2] *= 0.12
    freq = np.linspace(0.9e9, 1.1e9, nchan)
    vis = rng.normal(size=(nrow, nchan)) + \
        1j * rng.normal(size=(nrow, nchan))
    wgt = rng.random((nrow, nchan))
    umax = np.abs(uvw[:, :2]).max() * freq[-1] / 299792458.0
    cell = 1.0 / (2.0 * umax * 2.0)
    return uvw, freq, vis, wgt, nx, cell


def err_for(k, beta, oracle, args):
    import pfb_tpu.ops.wgridder as wg

    orig = wg.kernel_params
    wg.kernel_params = lambda eps: (k, beta)
    try:
        uvw, freq, vis, wgt, nx, cell = args
        img = wg.vis2dirty_wgrid(uvw, freq, vis, wgt=wgt, nx=nx, ny=nx,
                                 cellx=cell, celly=cell,
                                 do_wgridding=True)
        img = np.asarray(img)
    finally:
        wg.kernel_params = orig
    return np.abs(img - oracle).max() / np.abs(oracle).max()


def main():
    from pfb_tpu.ops.dft import vis2dirty_dft

    args = case()
    uvw, freq, vis, wgt, nx, cell = args
    oracle = np.asarray(vis2dirty_dft(uvw, freq, vis, wgt=wgt, nx=nx,
                                      ny=nx, cellx=cell, celly=cell))
    table = {}
    for k in range(4, 15):
        best = (None, 1.0)
        # coarse scan then refine around the winner
        for beta in np.arange(1.4, 2.8, 0.1):
            e = err_for(k, float(beta), oracle, args)
            if e < best[1]:
                best = (float(beta), e)
        b0 = best[0]
        for beta in np.arange(b0 - 0.09, b0 + 0.1, 0.02):
            e = err_for(k, float(beta), oracle, args)
            if e < best[1]:
                best = (float(beta), e)
        table[k] = best
        print(f"k={k:2d}: beta={best[0]:.2f} eps={best[1]:.2e}  "
              f"(beta=2.3 -> {err_for(k, 2.3, oracle, args):.2e})",
              flush=True)
    print()
    print("_BETA_TABLE = {")
    for k, (b, e) in table.items():
        print(f"    {k}: ({b:.2f}, {e:.2e}),")
    print("}")


if __name__ == "__main__":
    main()
