"""Halo-exchange vs gather space-sharded Psi: per-device FLOP and
communication accounting at nspace=4,8 (VERDICT r3 item 5's "done"
criterion) plus virtual-mesh wall times at a production-shaped config.

The communicated-bytes and flop columns are analytic (hardware
independent); wall times on shared host cores only validate the
programs.

Usage:
  python scripts/bench_halo_psi.py [--nx 4096] [--ny 4096] [--nlevel 3]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault(
    "XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def flops_conv(rows, n_in, F):
    """One analysis/synthesis pass over `rows` lines of length n_in."""
    return 2.0 * rows * ((n_in + F - 1) // 2) * F


def account(psi, ps, qy):
    """(flops_halo, flops_gather, bytes_a2a_halo, bytes_gather) per
    device per application (analysis; synthesis is symmetric)."""
    fl_halo = fl_rep = comm_halo = 0.0
    nx, ny = psi.nx, psi.ny
    itemsize = 4  # f32 production
    for w, s in zip(psi.bases, psi.specs):
        if w == "self":
            comm_halo += nx / ps * ps * qy * itemsize  # transpose a2a
            continue
        F = s.F
        Nx, Ny = s.nx, s.ny
        for i in range(s.nlevel):
            c = nx // (2 ** i * ps)
            # pass 1 (y, both filters): halo runs on c (+tail) rows,
            # gather on the full Nx rows per device
            fl_halo += 2 * flops_conv(c + (Nx - ps * c), Ny, F)
            fl_rep += 2 * flops_conv(Nx, Ny, F)
            # pass 2 (x, both filters): halo on qy rows, gather on 2Cy
            Cy = s.sy[i]
            fl_halo += 2 * flops_conv(qy, Nx, F)
            fl_rep += 2 * flops_conv(2 * Cy, Nx, F)
            # approx chain (lo-lo): halo conv on c rows vs Cx*... in
            # the replicated transform the approx is produced by the
            # same two passes (already counted)
            fl_halo += flops_conv(c, s.sy[i], F)
            # a2a volume: local (c, ps*qy) array, (ps-1)/ps leaves
            comm_halo += c * ps * qy * itemsize * (ps - 1) / ps
            Nx, Ny = s.sx[i], s.sy[i]
    comm_gather = psi.nx / ps * psi.ny * itemsize * (ps - 1)  # receive
    return fl_halo, fl_rep, comm_halo, comm_gather


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=4096)
    ap.add_argument("--ny", type=int, default=4096)
    ap.add_argument("--nlevel", type=int, default=3)
    ap.add_argument("--bases", default="self,db1,db2,db3")
    ap.add_argument("--timing-nx", type=int, default=512,
                    help="size for the virtual-mesh wall-time check")
    args = ap.parse_args()

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax import shard_map

    from pfb_tpu.ops.psi import make_psi, psi_dot
    from pfb_tpu.parallel.dist import _psi_dot_space_local
    from pfb_tpu.parallel.dwt_halo import (halo_psi_dot_local,
                                           make_halo_plan)
    from pfb_tpu.parallel.mesh import make_mesh

    bases = tuple(args.bases.split(","))

    print(f"analytic accounting, {args.nx}x{args.ny} L={args.nlevel} "
          f"bases={bases} (per device, per psi_dot application, f32):")
    print(f"{'ps':>3} {'halo GFLOP':>11} {'gather GFLOP':>13} "
          f"{'halo a2a MB':>12} {'gather MB':>10}")
    for ps in (4, 8):
        psi = make_psi(args.nx, args.ny, bases, args.nlevel)
        qy = -(-psi.Nymax // ps)
        fh, fr, ch, cg = account(psi, ps, qy)
        print(f"{ps:>3} {fh/1e9:>11.3f} {fr/1e9:>13.3f} "
              f"{ch/1e6:>12.1f} {cg/1e6:>10.1f}")

    # virtual-mesh wall-time sanity (shared cores -> program check)
    nx = args.timing_nx
    for ps in (4, 8):
        nb = 8 // ps
        psi = make_psi(nx, nx, bases, min(args.nlevel, 2))
        qy = -(-psi.Nymax // ps)
        mesh = make_mesh(nband=nb, nspace=ps)
        cube = P("band", "space", None)
        coeff = P("band", None, "space", None)
        plan = make_halo_plan(psi, ps, qy)
        dot_h = jax.jit(shard_map(
            lambda xl: halo_psi_dot_local(xl, plan), mesh=mesh,
            in_specs=(cube,), out_specs=coeff))
        dot_g = jax.jit(shard_map(
            lambda xl: _psi_dot_space_local(xl, psi, qy), mesh=mesh,
            in_specs=(cube,), out_specs=coeff))
        x = jax.device_put(
            jnp.asarray(np.random.default_rng(0).normal(
                size=(nb, nx, nx)).astype(np.float32)),
            NamedSharding(mesh, cube))
        for name, fn in (("halo", dot_h), ("gather", dot_g)):
            jax.block_until_ready(fn(x))
            t0 = time.perf_counter()
            for _ in range(3):
                out = fn(x)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / 3
            print(f"ps={ps} {name:>6}: {dt*1e3:7.1f} ms/psi_dot "
                  f"@{nx}^2x{nb}b virtual mesh", flush=True)


if __name__ == "__main__":
    main()
