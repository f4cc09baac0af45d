"""Tests for θ handling (theta.py) and bijectors (transforms.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from muse_tpu.theta import ThetaSpec
from muse_tpu import transforms as tf


class TestThetaSpec:
    def test_scalar(self):
        spec = ThetaSpec.from_example(1.0)
        assert spec.n == 1 and spec.scalar
        flat = spec.flatten(2.5)
        assert flat.shape == (1,)
        assert float(spec.to_user(flat)) == pytest.approx(2.5)

    def test_dict(self):
        spec = ThetaSpec.from_example({"a": 1.0, "b": jnp.zeros(3)})
        assert spec.n == 4
        assert spec.names == ("a", "b[0]", "b[1]", "b[2]")
        flat = spec.flatten({"a": 2.0, "b": jnp.array([1., 2., 3.])})
        out = spec.to_user(flat)
        assert out["a"] == pytest.approx(2.0)
        np.testing.assert_allclose(out["b"], [1, 2, 3])

    def test_vector(self):
        spec = ThetaSpec.from_example(jnp.zeros(4))
        assert spec.n == 4 and not spec.scalar

    def test_wrong_size_raises(self):
        spec = ThetaSpec.from_example(jnp.zeros(4))
        with pytest.raises(ValueError):
            spec.flatten(jnp.zeros(5))


class TestBijectors:
    @pytest.mark.parametrize("bij,x", [
        (tf.Identity(), jnp.array([1.5, -2.0])),
        (tf.Log(), jnp.array([0.5, 2.0])),
        (tf.Softplus(), jnp.array([0.5, 2.0])),
        (tf.Logit(), jnp.array([0.2, 0.8])),
        (tf.Logit(-1.0, 3.0), jnp.array([0.0, 2.5])),
        (tf.Affine(2.0, 1.0), jnp.array([1.0, -1.0])),
    ])
    def test_round_trip(self, bij, x):
        y = bij.forward(x)
        np.testing.assert_allclose(np.asarray(bij.inverse(y)),
                                   np.asarray(x), rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("bij,x", [
        (tf.Log(), jnp.array([0.5, 2.0])),
        (tf.Softplus(), jnp.array([0.5, 2.0])),
        (tf.Logit(), jnp.array([0.2, 0.8])),
        (tf.Affine(2.0), jnp.array([1.0, -1.0])),
    ])
    def test_log_det_matches_jacobian(self, bij, x):
        J = jax.jacfwd(bij.forward)(x)
        expected = float(jnp.linalg.slogdet(J)[1])
        assert float(bij.log_det_jacobian(x)) == pytest.approx(
            expected, abs=1e-3)

    def test_blockwise(self):
        bw = tf.Blockwise([tf.Identity(), tf.Log()], [2, 2])
        x = jnp.array([1.0, -1.0, 0.5, 2.0])
        y = bw.forward(x)
        np.testing.assert_allclose(np.asarray(bw.inverse(y)),
                                   np.asarray(x), rtol=1e-5)
        J = jax.jacfwd(bw.forward)(x)
        assert float(bw.log_det_jacobian(x)) == pytest.approx(
            float(jnp.linalg.slogdet(J)[1]), abs=1e-4)

    def test_support_registry(self):
        assert tf.from_support("real").name == "identity"
        assert tf.from_support("positive").name == "log"
        with pytest.raises(KeyError):
            tf.from_support("simplex")
