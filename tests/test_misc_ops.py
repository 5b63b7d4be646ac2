"""Mask operator, cg_dct, astrometry, logging, profiling coverage."""

import jax.numpy as jnp
import numpy as np
from numpy.testing import assert_allclose


def test_mask_operator_roundtrip():
    from pfb_tpu.ops.mask import Mask
    rng = np.random.default_rng(0)
    m = rng.random((8, 10)) > 0.5
    M = Mask(m)
    x = jnp.asarray(rng.normal(size=(3, 8, 10)))
    v = M.dot(x)
    assert v.shape == (3, M.n)
    back = M.hdot(v)
    assert_allclose(np.asarray(back), np.asarray(x) * m[None])
    # hdot then dot is identity on the vector
    assert_allclose(np.asarray(M.dot(back)), np.asarray(v))


def test_cg_dct_multifield():
    from pfb_tpu.opt.pcg import cg_dct
    rng = np.random.default_rng(1)
    A1 = rng.normal(size=(6, 6))
    A1 = A1 @ A1.T + 6 * np.eye(6)
    A2 = rng.normal(size=(4, 4))
    A2 = A2 @ A2.T + 4 * np.eye(4)
    b = {"f0": {"t0b0": jnp.asarray(rng.normal(size=6))},
         "f1": {"t0b0": jnp.asarray(rng.normal(size=4))}}

    def A(x):
        return {"f0": {"t0b0": jnp.asarray(A1) @ x["f0"]["t0b0"]},
                "f1": {"t0b0": jnp.asarray(A2) @ x["f1"]["t0b0"]}}

    x0 = {"f0": {"t0b0": jnp.zeros(6)}, "f1": {"t0b0": jnp.zeros(4)}}
    x, r = cg_dct(A, b, x0, tol=1e-14, maxit=100)
    assert_allclose(A1 @ np.asarray(x["f0"]["t0b0"]),
                    np.asarray(b["f0"]["t0b0"]), atol=1e-6)
    assert_allclose(A2 @ np.asarray(x["f1"]["t0b0"]),
                    np.asarray(b["f1"]["t0b0"]), atol=1e-6)


def test_synthesize_uvw_matches_simulation():
    from pfb_tpu.utils.astrometry import synthesize_uvw
    from pfb_tpu.utils.simulation import random_array_enu, simulate_obs
    obs = simulate_obs(nant=5, ntime=3, nchan=1, seed=9)
    # recompute uvw from the same layout/geometry
    enu = random_array_enu(5, extent=1000.0, seed=9)
    # obs uses ha in [-d/2, d/2]*2pi/24; emulate via lst0/earth_rate
    # here just check shapes and antisymmetry under ant swap
    uvw = synthesize_uvw(enu, obs.time, obs.ant1, obs.ant2,
                         (0.0, obs.dec), lat=-0.52)
    assert uvw.shape == obs.uvw.shape
    uvw_sw = synthesize_uvw(enu, obs.time, obs.ant2, obs.ant1,
                            (0.0, obs.dec), lat=-0.52)
    assert_allclose(uvw_sw, -uvw, atol=1e-9)


def test_rephase_vis_identity():
    from pfb_tpu.utils.astrometry import rephase_vis
    rng = np.random.default_rng(2)
    vis = rng.normal(size=(10, 2)) + 1j * rng.normal(size=(10, 2))
    uvw = rng.normal(size=(10, 3)) * 100
    out = rephase_vis(vis, uvw, (0.1, -0.5), (0.1, -0.5),
                      freq=np.array([1e9, 1.2e9]))
    assert_allclose(out, vis)


def test_logging_and_profiling(tmp_path):
    from pfb_tpu.utils.logging import get_logger, log_to_file
    from pfb_tpu.utils.profiling import PhaseTimer
    log = get_logger("TEST")
    fname = log_to_file(str(tmp_path / "run.log"))
    log.info("hello")
    import logging
    logging.getLogger("pfb_tpu").handlers[-1].flush()
    assert "hello" in open(fname).read()

    timer = PhaseTimer()
    x = jnp.ones((4, 4))
    with timer("phase1", sync_value=x):
        y = x * 2
    assert "phase1" in timer.report()
