"""fwdbwd worker test (upstream test_fwdbwd.py is fully commented out;
this exercises the working reimplementation: the forward-backward loop
with the 'id' frequency-correlated parametrisation must reduce the
residual on a point-source field)."""

import numpy as np

from pfb_tpu.utils.ms import simulate_ms
from pfb_tpu.workers.fwdbwd import _fwdbwd, setup_parametrisation
from pfb_tpu.workers.grid import _grid
from pfb_tpu.workers.init import _init


def test_parametrisation_roundtrip():
    import jax.numpy as jnp
    freq = 1e9 + np.arange(4) * 1e8
    for mode in ("id", "exp"):
        func, finv, dfunc, dhfunc = setup_parametrisation(
            mode=mode, freq=freq)
        rng = np.random.default_rng(0)
        s = jnp.asarray(rng.normal(size=(4, 8, 8)))
        x = func(s)
        s2 = finv(x)
        if mode == "id":
            np.testing.assert_allclose(np.asarray(s2), np.asarray(s),
                                       rtol=1e-8)
        # adjointness of the linearisation: <df v, u> == <v, dhf u>
        v = jnp.asarray(rng.normal(size=(4, 8, 8)))
        u = jnp.asarray(rng.normal(size=(4, 8, 8)))
        lhs = float(jnp.vdot(dfunc(s, v), u))
        rhs = float(jnp.vdot(v, dhfunc(s, u)))
        np.testing.assert_allclose(lhs, rhs, rtol=1e-10)


def test_fwdbwd_reduces_residual(tmp_path):
    ms_path = str(tmp_path / "t.npz")
    simulate_ms(ms_path, nant=8, ntime=6, nchan=2, nsource=3,
                fov_deg=0.3, seed=31)
    out = str(tmp_path / "o")
    xds = _init(ms=ms_path, output_filename=out, channels_per_image=1)
    dds = _grid(xdsi=xds, output_filename=out, suffix="main",
                field_of_view=0.3, robustness=0.0, psf=True,
                residual=False)
    model, param, resid = _fwdbwd(
        ddsi=[dict(d) for d in dds], output_filename=out, niter=4,
        parametrisation="id", rmsfactor=0.3, gamma=1.0,
        bases="self,db1", nlevels=2, verbose=0)
    dirty_mfs = np.sum([d["DIRTY"] for d in dds], axis=0)
    wsum = np.sum([d["WSUM"][0] for d in dds])
    assert np.abs(resid.sum(0)).max() < \
        0.5 * np.abs(dirty_mfs / wsum).max()
    from pfb_tpu.utils import dstore
    dds2 = dstore.read_store(out + "_I_main.dds")
    assert "PARAM" in dds2[0]
