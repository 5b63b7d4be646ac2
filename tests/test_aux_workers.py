"""fluxmop / fastim / smoovie / beam / gauss coverage."""

import numpy as np
import pytest
from numpy.testing import assert_allclose


@pytest.fixture(scope="module")
def small_pipeline(tmp_path_factory):
    from pfb_tpu.utils.ms import simulate_ms
    from pfb_tpu.workers.grid import _grid
    from pfb_tpu.workers.init import _init

    tmp = tmp_path_factory.mktemp("aux")
    ms_path = str(tmp / "t.npz")
    model, Ix, Iy, nx, cell_rad, _ = simulate_ms(
        ms_path, nant=8, ntime=6, nchan=2, nsource=3, fov_deg=0.3,
        seed=21)
    out = str(tmp / "o")
    xds = _init(ms=ms_path, output_filename=out, channels_per_image=1)
    dds = _grid(xdsi=xds, output_filename=out, suffix="main",
                field_of_view=0.3, robustness=0.0, psf=True,
                residual=False)
    return dict(ms=ms_path, out=out, dds=dds, model=model, Ix=Ix,
                Iy=Iy, nx=nx, cell_rad=cell_rad)


def test_fluxmop_reduces_residual(small_pipeline, tmp_path):
    from pfb_tpu.workers.fluxmop import _fluxmop
    p = small_pipeline
    model, resid = _fluxmop(ddsi=[dict(d) for d in p["dds"]],
                            output_filename=str(tmp_path / "mop"),
                            use_psf=True, sigmainv=1e-4, gamma=0.9,
                            cg_maxit=100, verbose=0)
    dirty_mfs = np.sum([d["DIRTY"] for d in p["dds"]], axis=0)
    wsum = np.sum([d["WSUM"][0] for d in p["dds"]])
    assert np.abs(resid.sum(0)).max() < \
        0.6 * np.abs(dirty_mfs / wsum).max()
    # store now holds MODELP/UPDATE for reverting
    from pfb_tpu.utils import dstore
    dds2 = dstore.read_store(str(tmp_path / "mop") + "_I_main.dds")
    assert "MODELP" in dds2[0] and "UPDATE" in dds2[0]


def test_fastim_smoovie(small_pipeline, tmp_path):
    from pfb_tpu.workers.fastim import _fastim
    from pfb_tpu.workers.smoovie import _smoovie
    p = small_pipeline
    fds = _fastim(ms=p["ms"], output_filename=str(tmp_path / "f"),
                  integrations_per_image=2, channels_per_image=1,
                  field_of_view=0.3)
    assert len(fds) == 3 * 2  # 3 time chunks x 2 bands
    assert all("RESIDUAL" in ds for ds in fds)
    frames = _smoovie(fdsi=fds, output_filename=str(tmp_path / "f"),
                      animate_axis="time")
    assert len(frames) == 3
    import os
    assert os.path.exists(str(tmp_path / "f") + "_I_movie.gif")


def test_beam_models():
    from pfb_tpu.utils.beam import cos3_beam, eval_beam, interp_beam
    beam, l, m = interp_beam(1.28e9, 64, 64, 0.01)
    assert beam.shape == (64, 64)
    assert beam.max() == pytest.approx(1.0, abs=1e-6)
    assert beam[0, 0] < 0.5  # tapers off axis
    # regrid identity
    out = eval_beam(beam, l, m, l, m)
    assert_allclose(out, beam, atol=1e-12)


def test_gauss_kron_identities():
    import jax.numpy as jnp
    from pfb_tpu.ops.gauss import Gauss, kron_matvec
    rng = np.random.default_rng(0)
    G = Gauss(1.0, 2, 8, 8, length_scale=2.0)
    x = jnp.asarray(rng.normal(size=(2, 8, 8)))
    # K^-1 K x == x
    y = G.idot(G.dot(x))
    assert_allclose(np.asarray(y), np.asarray(x), rtol=1e-6, atol=1e-8)
    # kron matvec vs dense
    A = rng.normal(size=(3, 3))
    B = rng.normal(size=(4, 4))
    v = rng.normal(size=12)
    dense = np.kron(A, B) @ v
    got = np.asarray(kron_matvec((jnp.asarray(A), jnp.asarray(B)),
                                 jnp.asarray(v)))
    assert_allclose(got, dense, rtol=1e-10)
