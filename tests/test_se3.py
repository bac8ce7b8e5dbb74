import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rgbid_tpu.core import se3

jax.config.update("jax_enable_x64", False)


def random_twists(n, scale_t=1.0, scale_r=1.0, seed=0):
    r = np.random.default_rng(seed)
    v = r.normal(size=(n, 3)) * scale_t
    w = r.normal(size=(n, 3)) * scale_r
    return np.concatenate([v, w], axis=1).astype(np.float32)


def test_exp_identity():
    T = se3.exp(jnp.zeros(6))
    np.testing.assert_allclose(np.asarray(T), np.eye(4), atol=1e-7)


def test_exp_log_roundtrip():
    for d in random_twists(20, scale_t=0.5, scale_r=0.8):
        T = se3.exp(jnp.asarray(d))
        d2 = se3.log(T)
        np.testing.assert_allclose(np.asarray(d2), d, atol=2e-5)


def test_exp_log_roundtrip_small_angle():
    for d in random_twists(10, scale_t=0.1, scale_r=1e-5, seed=1):
        T = se3.exp(jnp.asarray(d))
        d2 = se3.log(T)
        np.testing.assert_allclose(np.asarray(d2), d, atol=1e-6)


def test_rotation_is_orthonormal():
    for d in random_twists(10, seed=2):
        T = np.asarray(se3.exp(jnp.asarray(d)))
        R = T[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
        assert np.linalg.det(R) == pytest.approx(1.0, abs=1e-5)


def test_inv():
    for d in random_twists(10, seed=3):
        T = se3.exp(jnp.asarray(d))
        TT = np.asarray(T @ se3.inv(T))
        np.testing.assert_allclose(TT, np.eye(4), atol=1e-5)


def test_exp_composition_small():
    # exp(a)exp(b) ~= exp(a+b) only to first order; check with tiny twists.
    a = jnp.asarray(random_twists(1, 1e-4, 1e-4, seed=4)[0])
    b = jnp.asarray(random_twists(1, 1e-4, 1e-4, seed=5)[0])
    lhs = np.asarray(se3.exp(a) @ se3.exp(b))
    rhs = np.asarray(se3.exp(a + b))
    np.testing.assert_allclose(lhs, rhs, atol=1e-7)


def test_quaternion_roundtrip():
    for d in random_twists(20, seed=6):
        T = se3.exp(jnp.asarray(d))
        q = se3.to_quaternion(T[:3, :3])
        R2 = se3.from_quaternion(q)
        np.testing.assert_allclose(np.asarray(R2), np.asarray(T[:3, :3]), atol=1e-5)
        assert np.linalg.norm(np.asarray(q)) == pytest.approx(1.0, abs=1e-6)


def test_transform_points():
    d = jnp.asarray(random_twists(1, seed=7)[0])
    T = se3.exp(d)
    pts = jnp.asarray(np.random.default_rng(8).normal(size=(11, 3)).astype(np.float32))
    out = se3.transform_points(T, pts)
    expected = np.asarray(pts) @ np.asarray(T[:3, :3]).T + np.asarray(T[:3, 3])
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)


def test_jit_and_grad_safe():
    f = jax.jit(lambda d: se3.log(se3.exp(d)))
    d = jnp.asarray(random_twists(1, seed=9)[0])
    np.testing.assert_allclose(np.asarray(f(d)), np.asarray(d), atol=2e-5)
    g = jax.grad(lambda d: jnp.sum(se3.exp(d)))(jnp.zeros(6))
    assert np.all(np.isfinite(np.asarray(g)))
