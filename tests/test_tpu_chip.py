"""On-chip validation suite — runs ONLY when the session's default
backend is a real TPU (the CI environment is CPU; there these all
skip). Turns the round-3/4 drive scripts' checks into tests:

  pytest tests/test_tpu_chip.py -q     (on a TPU host)

Covers the compiled (non-interpret) Mosaic lowerings of every hot
kernel against the exact-DFT oracle and the CPU-parity engines:
pg adjoint/forward (compact-Y spread + DMA fold, pflag skip), the
pruned c2c FFT engine, the fixed-iteration fused PCG, and the Pallas
PSF matvec. Complex arrays never cross host<->device (axon relay
limitation)."""

import numpy as np
import pytest
from numpy.testing import assert_allclose

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    jax.default_backend() not in ("tpu",),
    reason="needs a real TPU (CI runs CPU; drive via scripts/ or "
           "pytest on a TPU host)")


@pytest.fixture(scope="module")
def obs():
    rng = np.random.default_rng(7)
    nrow, nchan = 20000, 4
    uvw = rng.normal(scale=120.0, size=(nrow, 3))
    uvw[:, 2] *= 0.2
    freq = np.linspace(0.9e9, 1.1e9, nchan)
    umax = np.abs(uvw[:, :2]).max() * freq[-1] / 299792458.0
    cell = 1.0 / (2.0 * umax * 2.0)
    vr = rng.normal(size=(nrow, nchan)).astype(np.float32)
    vi = rng.normal(size=(nrow, nchan)).astype(np.float32)
    return dict(uvw=jnp.asarray(uvw, jnp.float32),
                freq=jnp.asarray(freq, jnp.float32),
                vr=vr, vi=vi, cell=cell,
                vis=(vr + 1j * vi).astype(np.complex64))


@pytest.fixture(scope="module")
def oracle(obs):
    from pfb_tpu.ops.dft import vis2dirty_dft
    nx = 256
    ref = vis2dirty_dft(obs["uvw"], obs["freq"],
                        (jnp.asarray(obs["vr"]), jnp.asarray(obs["vi"])),
                        nx=nx, ny=nx, cellx=obs["cell"],
                        celly=obs["cell"])
    return nx, ref, float(jnp.abs(ref).max())


def test_pg_adjoint_vs_oracle(obs, oracle):
    from pfb_tpu.ops.pgridder import vis2dirty_pg
    nx, ref, rmax = oracle
    got = vis2dirty_pg(obs["uvw"], obs["freq"], obs["vis"], nx=nx,
                       ny=nx, cellx=obs["cell"], celly=obs["cell"],
                       epsilon=1e-5, do_wgridding=True)
    assert float(jnp.abs(got - ref).max()) / rmax < 1e-4


def test_pg_forward_vs_oracle(obs, oracle):
    from pfb_tpu.ops.dft import dirty2vis_dft
    from pfb_tpu.ops.pgridder import dirty2vis_pg
    nx, ref, rmax = oracle
    img = jnp.asarray(np.asarray(ref), jnp.float32)
    vrr, vri = dirty2vis_dft(obs["uvw"], obs["freq"], img,
                             obs["cell"], obs["cell"], split=True)
    vgr, vgi = dirty2vis_pg(obs["uvw"], obs["freq"], img, obs["cell"],
                            obs["cell"], epsilon=1e-5,
                            do_wgridding=True, split=True)
    vscale = float(jnp.sqrt(vrr**2 + vri**2).max())
    err = float(jnp.sqrt((vgr - vrr)**2 + (vgi - vri)**2).max())
    assert err / vscale < 1e-4


def test_wgridder_cfft_vs_oracle(obs, oracle):
    from jax import lax

    from pfb_tpu.ops.wgridder import vis2dirty_wgrid
    nx, ref, rmax = oracle
    uvw, freq, cell = obs["uvw"], obs["freq"], obs["cell"]

    @jax.jit
    def wg(vr_, vi_):
        return vis2dirty_wgrid(uvw, freq, lax.complex(vr_, vi_),
                               nx=nx, ny=nx, cellx=cell, celly=cell,
                               epsilon=1e-5, do_wgridding=True)

    gw = wg(jnp.asarray(obs["vr"]), jnp.asarray(obs["vi"]))
    assert float(jnp.abs(gw - ref).max()) / rmax < 1e-4


def test_fused_pcg_fixed_iter_matches_eager(obs):
    from pfb_tpu.ops.pgridder import vis2dirty_pg
    from pfb_tpu.ops.psf import make_psf_convolve_pallas
    from pfb_tpu.opt.pcg import make_pcg_bands_fused, pcg_bands_hostloop
    nb, npx = 2, 512
    ones = (np.ones_like(obs["vr"]) + 0j).astype(np.complex64)
    psf = vis2dirty_pg(obs["uvw"], obs["freq"], ones, nx=2 * npx,
                       ny=2 * npx, cellx=obs["cell"],
                       celly=obs["cell"], epsilon=1e-5,
                       do_wgridding=False)
    psf_c = jnp.tile((psf / float(psf.max()))[None], (nb, 1, 1))
    conv = make_psf_convolve_pallas(psf_c, npx, npx, sigmainv=1e-1)
    model = jnp.zeros((nb, npx, npx), jnp.float32)
    model = model.at[:, npx // 2, npx // 2].set(1.0)
    b = conv.apply(model, conv.consts)
    solve = make_pcg_bands_fused(conv.apply, tol=0.0, maxit=30,
                                 minit=30, backtrack=False)
    x1 = solve(b, jnp.zeros_like(b), conv.consts)
    x2 = pcg_bands_hostloop(lambda z: conv.apply(z, conv.consts), b,
                            tol=1e-30, maxit=30, minit=30)
    d = float(jnp.abs(x1 - x2).max())
    s = float(jnp.abs(x2).max())
    assert d / s < 1e-5


def test_cg_fused_pcg_matches_eager(obs):
    """The CG-fused kernel pipeline (direction update in K1,
    [p.Ap, p.p] reductions in K3) compiled on the chip gives the
    fixed-iteration pcg_bands result."""
    from pfb_tpu.ops.pgridder import vis2dirty_pg
    from pfb_tpu.ops.psf import make_psf_convolve_pallas
    from pfb_tpu.opt.pcg import make_pcg_bands_fused, \
        pcg_bands_hostloop
    nb, npx = 2, 512
    ones = (np.ones_like(obs["vr"]) + 0j).astype(np.complex64)
    psf = vis2dirty_pg(obs["uvw"], obs["freq"], ones, nx=2 * npx,
                       ny=2 * npx, cellx=obs["cell"],
                       celly=obs["cell"], epsilon=1e-5,
                       do_wgridding=False)
    psf_c = jnp.tile((psf / float(psf.max()))[None], (nb, 1, 1))
    ws = jnp.asarray(np.array([1.0, 1.5],
                              np.float32))[:, None, None]
    conv = make_psf_convolve_pallas(psf_c, npx, npx, sigmainv=1e-1,
                                    wsum=ws)
    assert hasattr(conv, "apply_cg")
    model = jnp.zeros((nb, npx, npx), jnp.float32)
    model = model.at[:, npx // 2, npx // 2].set(1.0)
    b = conv(model)
    solve = make_pcg_bands_fused(conv.apply, tol=0.0, maxit=30,
                                 apply_cg=conv.apply_cg,
                                 cg_scale=conv.cg_scale)
    x1 = solve(b, jnp.zeros_like(b), conv.consts)
    x2 = pcg_bands_hostloop(lambda z: conv(z), b,
                            tol=1e-30, maxit=30, minit=30)
    d = float(jnp.abs(x1 - x2).max())
    s = float(jnp.abs(x2).max())
    # the CG scalars come from in-kernel f32 VPU partial sums vs the
    # hostloop's XLA vdot reduction trees; the ordering difference
    # compounds through 30 f32 CG iterations (measured 6.8e-4 on
    # v5e; CPU interpret parity with identical ordering is 2e-5 —
    # tests/test_fused_solvers.py)
    assert d / s < 2e-3
