"""Halo-exchange space-sharded Psi must agree with the single-device
dictionary to f64 — the scalable replacement for the gather-based
``_psi_dot_space_local`` (VERDICT r3 item 5; SURVEY.md section 5
"long-context analogue")."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P
from numpy.testing import assert_allclose

from jax import shard_map

from pfb_tpu.ops.psi import make_psi, psi_dot, psi_hdot
from pfb_tpu.parallel.dwt_halo import (halo_psi_dot_local,
                                       halo_psi_hdot_local,
                                       make_halo_plan)
from pfb_tpu.parallel.mesh import make_mesh


def _run(nband, nx, ny, bases, nlevel, nb_mesh, ps, seed=0):
    psi = make_psi(nx, ny, bases, nlevel)
    qy = -(-psi.Nymax // ps)
    plan = make_halo_plan(psi, ps, qy)
    mesh = make_mesh(nband=nb_mesh, nspace=ps)

    rng = np.random.default_rng(seed)
    x = rng.normal(size=(nband, nx, ny))

    cube = P("band", "space", None)
    coeff = P("band", None, "space", None)

    dot = jax.jit(shard_map(
        lambda xl: halo_psi_dot_local(xl, plan), mesh=mesh,
        in_specs=(cube,), out_specs=coeff))
    hdot = jax.jit(shard_map(
        lambda al: halo_psi_hdot_local(al, plan), mesh=mesh,
        in_specs=(coeff,), out_specs=cube))

    xd = jax.device_put(jnp.asarray(x), NamedSharding(mesh, cube))
    a_dist = dot(xd)

    # pad reference coeffs to the ps*qy row container
    a_ref = psi_dot(jnp.asarray(x), psi)
    a_ref_p = jnp.pad(a_ref, [(0, 0), (0, 0),
                              (0, qy * ps - psi.Nymax), (0, 0)])
    assert_allclose(np.asarray(a_dist), np.asarray(a_ref_p),
                    rtol=1e-10, atol=1e-10)

    # synthesis parity on independent random coefficients
    alpha = rng.normal(size=a_ref.shape)
    img_ref = psi_hdot(jnp.asarray(alpha), psi)
    ap = jnp.pad(jnp.asarray(alpha),
                 [(0, 0), (0, 0), (0, qy * ps - psi.Nymax), (0, 0)])
    apd = jax.device_put(ap, NamedSharding(mesh, coeff))
    img_dist = hdot(apd)
    assert_allclose(np.asarray(img_dist), np.asarray(img_ref),
                    rtol=1e-10, atol=1e-10)

    # tight-frame identity through the distributed pair
    back = hdot(dot(xd))
    assert_allclose(np.asarray(back), psi.nbasis * x,
                    rtol=1e-10, atol=1e-10)


@pytest.mark.parametrize("bases,nlevel", [
    (("self", "db1"), 2),
    (("self", "db1", "db2"), 2),
    (("db2",), 3),
])
def test_halo_psi_parity_2band_4space(bases, nlevel):
    _run(nband=2, nx=64, ny=48, bases=bases, nlevel=nlevel,
         nb_mesh=2, ps=4)


def test_halo_psi_parity_8space():
    _run(nband=1, nx=128, ny=64, bases=("self", "db1", "db2"),
         nlevel=2, nb_mesh=1, ps=8)


def test_halo_psi_parity_db4():
    # F=8: nontrivial halo (F-2=6 rows) and tails
    _run(nband=2, nx=128, ny=96, bases=("self", "db4"), nlevel=2,
         nb_mesh=2, ps=4)


def test_halo_plan_rejects_bad_shapes():
    psi = make_psi(100, 100, ("db1",), 2)  # 100 not divisible by 4*4
    with pytest.raises(ValueError):
        make_halo_plan(psi, 4, -(-psi.Nymax // 4))
