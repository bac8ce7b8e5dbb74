"""Regression tests for SO(3) projection (pose hygiene).

The bug this guards: repeated fp32 pose composition drifted R off SO(3)
(det ~1.002 after ~13 frames); the rigid optimizer cannot correct a
non-rigid defect, so trajectories diverged exponentially (~3x error/frame)
at system level while every isolated tracker test passed.
"""

import jax.numpy as jnp
import numpy as np

from rgbid_tpu.core import se3
from rgbid_tpu.reference_cpu import se3_np


def _dirty_pose(scale=1.003, shear=2e-3):
    T = se3_np.exp(np.array([0.1, -0.05, 0.2, 0.3, -0.2, 0.1]))
    T[:3, :3] *= scale
    T[0, 1] += shear
    return T


def test_device_orthonormalize_restores_so3():
    T = _dirty_pose()
    out = np.asarray(se3.orthonormalize(jnp.asarray(T, jnp.float32)))
    R = out[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=2e-5)
    assert abs(np.linalg.det(R) - 1.0) < 2e-5
    # Translation untouched.
    np.testing.assert_allclose(out[:3, 3], T[:3, 3], atol=1e-7)


def test_host_orthonormalize_restores_so3():
    T = _dirty_pose()
    out = se3_np.orthonormalize(T)
    R = out[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
    assert abs(np.linalg.det(R) - 1.0) < 1e-12


def test_orthonormalize_is_noop_on_clean_pose():
    T = se3_np.exp(np.array([0.3, 0.1, -0.2, 0.5, 0.4, -0.3]))
    out = np.asarray(se3.orthonormalize(jnp.asarray(T, jnp.float32)))
    np.testing.assert_allclose(out, T, atol=1e-6)


def test_long_compose_chain_stays_rigid():
    """1000 composes with per-step projection must not drift off SO(3)."""
    d = jnp.asarray(np.array([1e-3, -2e-3, 1e-3, 2e-3, -1e-3, 1e-3], np.float32))
    step = se3.exp(d)
    T = jnp.eye(4)
    for _ in range(1000):
        T = se3.orthonormalize(T @ step)
    R = np.asarray(T[:3, :3], np.float64)
    assert np.abs(R @ R.T - np.eye(3)).max() < 1e-5
