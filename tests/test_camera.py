import jax.numpy as jnp
import numpy as np

from rgbid_tpu.core import camera


def test_level_shapes():
    assert camera.level_shape(480, 640, 0) == (480, 640)
    assert camera.level_shape(480, 640, 1) == (240, 320)
    assert camera.level_shape(480, 640, 2) == (120, 160)
    assert camera.level_shape(480, 640, 3) == (60, 80)


def test_level_intrinsics_center_convention():
    intr = camera.TUM_FR1
    l1 = camera.level_intrinsics(intr, 1)
    assert l1.fx == intr.fx / 2
    # Half-pixel-center convention.
    assert np.isclose(l1.cx, (intr.cx + 0.5) / 2 - 0.5)
    assert (l1.height, l1.width) == (240, 320)


def test_project_backproject_roundtrip():
    intr = camera.DEFAULT
    u, v = camera.pixel_grid(12, 16)
    u = u * 40 + 3.0
    v = v * 30 + 2.0
    xi = jnp.full_like(u, 0.5)  # 2 m
    x, y, z = camera.backproject(u, v, xi, intr)
    u2, v2, rho = camera.project(x, y, z, intr)
    np.testing.assert_allclose(np.asarray(u2), np.asarray(u), atol=1e-4)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v), atol=1e-4)
    np.testing.assert_allclose(np.asarray(rho), 0.5, atol=1e-6)


def test_backproject_consistent_across_levels():
    # The same 3D point should project to corresponding pixels at two levels.
    intr0 = camera.DEFAULT
    intr1 = camera.level_intrinsics(intr0, 1)
    X, Y, Z = 0.3, -0.2, 2.5
    u0, v0, _ = camera.project(jnp.asarray(X), jnp.asarray(Y), jnp.asarray(Z), intr0)
    u1, v1, _ = camera.project(jnp.asarray(X), jnp.asarray(Y), jnp.asarray(Z), intr1)
    np.testing.assert_allclose(2 * (np.asarray(u1) + 0.5) - 0.5, np.asarray(u0), atol=1e-4)
    np.testing.assert_allclose(2 * (np.asarray(v1) + 0.5) - 0.5, np.asarray(v0), atol=1e-4)
