"""Multi-device tests on an 8-virtual-device CPU mesh.

Beyond the reference's test surface (it never tests distribution, SURVEY
§4): sims-axis sharding must (a) compile and execute, and (b) reproduce
the single-device result bit-for-bit-ish (same keys, same lockstep math —
only reduction orders may differ)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from muse_tpu import MuseResult, get_J, muse, muse_fit
from muse_tpu.models import funnel_problem
from muse_tpu.parallel import make_sims_mesh


@pytest.fixture(scope="module")
def prob():
    return funnel_problem(64, data_key=jax.random.PRNGKey(42))


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_mesh_construction():
    m = make_sims_mesh()
    assert m.n_sims_shards == 8
    m2 = make_sims_mesh(sims=4, field=2)
    assert m2.field_axis == "field"
    with pytest.raises(ValueError):
        make_sims_mesh(sims=3, field=2)


def test_sharded_muse_matches_single_device(prob):
    key = jax.random.PRNGKey(1)
    res_single = muse(prob, 1.0, nsims=24, maxsteps=5, key=key)
    mesh = make_sims_mesh()
    res_mesh = muse(prob, 1.0, nsims=24, maxsteps=5, key=key, mesh=mesh)
    np.testing.assert_allclose(res_mesh.theta, res_single.theta,
                               rtol=1e-4, atol=1e-5)
    assert len(res_mesh.history) == len(res_single.history)


def test_sharded_get_J_matches(prob):
    key = jax.random.PRNGKey(2)
    r1, r2 = MuseResult(), MuseResult()
    get_J(r1, prob, 0.0, key=key, nsims=16)
    get_J(r2, prob, 0.0, key=key, nsims=16, mesh=make_sims_mesh())
    np.testing.assert_allclose(r1.J, r2.J, rtol=1e-4)


def test_uneven_lane_count_shards(prob):
    """nsims+1 = 11 lanes on an 8-way mesh (GSPMD uneven sharding)."""
    mesh = make_sims_mesh()
    res = muse(prob, 1.0, nsims=10, maxsteps=3, mesh=mesh,
               key=jax.random.PRNGKey(3))
    assert np.isfinite(res.theta).all()


def test_sims_by_field_mesh(prob):
    """2-axis mesh: 4-way sims × 2-way field sharding of the latent."""
    mesh = make_sims_mesh(sims=4, field=2)
    res = muse(prob, 1.0, nsims=8, maxsteps=3, mesh=mesh,
               key=jax.random.PRNGKey(4))
    assert np.isfinite(res.theta).all()
