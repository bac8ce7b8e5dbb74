"""Pallas fused kernel A' vs the XLA twin (exact-contract equivalence).

On CPU the kernels run in interpreter mode; the same tests run against
compiled Mosaic kernels when executed on TPU.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from rgbid_tpu.core.camera import Intrinsics, level_intrinsics
from rgbid_tpu.core.config import TrackingConfig
from rgbid_tpu.datasets import synthetic
from rgbid_tpu.ops import gauss_newton, image
from rgbid_tpu.ops.pallas_kernels import residuals_and_normal_eq_pallas
from rgbid_tpu.reference_cpu import odometry as odo
from rgbid_tpu.reference_cpu import se3_np
from rgbid_tpu.tracking import Tracker, keyframe_pyramid, preprocess_frame

INTR = Intrinsics(fx=258.6, fy=258.2, cx=159.3, cy=127.6, width=320, height=240)


@pytest.fixture(scope="module")
def setup():
    scene = synthetic.make_scene(0)
    T0 = np.eye(4)
    T1 = synthetic.orbit_trajectory(40, trans_amp=0.2, rot_amp=0.05)[2]
    f0 = synthetic.render_frame(scene, INTR, T0)
    f1 = synthetic.render_frame(scene, INTR, T1)
    return f0, f1, np.linalg.inv(T1) @ T0


@pytest.mark.parametrize("level", [0, 1, 2])
@pytest.mark.parametrize("use_geometric", [True, False])
def test_pallas_matches_xla_irls(setup, level, use_geometric):
    f0, f1, T_gt = setup
    p0 = odo.preprocess_frame(f0[0], f0[1], 3)
    p1 = odo.preprocess_frame(f1[0], f1[1], 3)
    intr_l = level_intrinsics(INTR, level)

    kf_int = jnp.asarray(p0.intensity[level])
    kf_xi = jnp.asarray(p0.xi[level])
    kf_mask = jnp.asarray(p0.mask[level], jnp.float32)
    ones = jnp.ones_like(kf_mask)
    gx_i, gy_i = image.gradients(kf_int, ones)
    gx_x, gy_x = image.gradients(kf_xi, kf_mask)
    jac = gauss_newton.template_jacobians(gx_i, gy_i, gx_x, gy_x, kf_xi, kf_mask, intr_l)

    from rgbid_tpu.ops.warp import backproject_grid

    kf_points = backproject_grid(kf_xi, intr_l)
    args = (
        jnp.asarray(T_gt, jnp.float32),
        kf_int, kf_points, kf_mask, jac,
        jnp.asarray(p1.intensity[level]),
        jnp.asarray(p1.xi[level]),
        jnp.asarray(p1.mask[level], jnp.float32),
        intr_l, 5.0,
        jnp.asarray(0.01, jnp.float32), jnp.asarray(0.0025, jnp.float32),
        1, use_geometric, 3.0,
    )
    ref = gauss_newton.residuals_and_normal_eq(*args)
    out = residuals_and_normal_eq_pallas(*args)

    np.testing.assert_allclose(np.asarray(out.n_valid), np.asarray(ref.n_valid), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out.sigma2_int), np.asarray(ref.sigma2_int), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out.sigma2_xi), np.asarray(ref.sigma2_xi), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out.H), np.asarray(ref.H), rtol=2e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out.b), np.asarray(ref.b), rtol=2e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.error), np.asarray(ref.error), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out.inlier_frac), np.asarray(ref.inlier_frac), rtol=1e-4)


def test_tracker_with_pallas_kernel_matches(setup):
    """Full tracker with kernel='pallas' converges to the same pose."""
    f0, f1, T_gt = setup
    pyr0 = preprocess_frame(jnp.asarray(f0[0]), jnp.asarray(f0[1]), 3)
    pyr1 = preprocess_frame(jnp.asarray(f1[0]), jnp.asarray(f1[1]), 3)
    kf = keyframe_pyramid(pyr0, INTR)
    poses = {}
    for kernel in ("xla", "pallas"):
        cfg = TrackingConfig(levels=3, iters=(4, 8, 16), kernel=kernel, jacobian="ic")
        res = Tracker(INTR, cfg).track(kf, pyr1, jnp.eye(4))
        poses[kernel] = np.asarray(res.T, np.float64)
        err = se3_np.log(se3_np.inv(T_gt) @ poses[kernel])
        assert np.linalg.norm(err) < 2e-3, kernel
    np.testing.assert_allclose(poses["pallas"], poses["xla"], atol=1e-4)


def test_fusion_kernel_b_matches_xla(setup):
    """Pallas kernel B (fusion) vs the XLA fusion path."""
    import dataclasses

    from rgbid_tpu.core.config import FusionConfig
    from rgbid_tpu.mapping.fusion import fuse_inverse_depth
    from rgbid_tpu.reference_cpu import odometry as odo

    f0, f1, T_gt = setup
    kf_xi, kf_mask = odo.inverse_depth_from_u16(f0[1])
    cur_xi, cur_mask = odo.inverse_depth_from_u16(f1[1])
    kf_var = np.full_like(kf_xi, 6.4e-5)
    cov = np.diag([1e-6] * 3 + [1e-7] * 3).astype(np.float32)
    args = lambda cfg: (
        jnp.asarray(kf_xi), jnp.asarray(kf_var), jnp.asarray(kf_mask, jnp.float32),
        jnp.asarray(cur_xi), jnp.asarray(cur_mask, jnp.float32),
        jnp.asarray(T_gt, jnp.float32), jnp.asarray(cov), INTR, cfg,
    )
    xla = fuse_inverse_depth(*args(FusionConfig(kernel="xla")))
    pal = fuse_inverse_depth(*args(FusionConfig(kernel="pallas")))
    np.testing.assert_allclose(np.asarray(pal[0]), np.asarray(xla[0]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(pal[1]), np.asarray(xla[1]), atol=1e-9)
    assert abs(float(pal[3]) - float(xla[3])) <= 2.0


def test_odd_resolution_tracker():
    """Non-multiple-of-8 image heights (arbitrary cameras) must work: the
    kernel wrappers zero-pad rows instead of falling back to a single
    full-height VMEM block."""
    intr = Intrinsics(fx=120.0, fy=120.0, cx=82.0, cy=65.0, width=166, height=131)
    scene = synthetic.make_scene(0)
    T1 = synthetic.orbit_trajectory(40, trans_amp=0.15, rot_amp=0.04)[2]
    f0 = synthetic.render_frame(scene, intr, np.eye(4))
    f1 = synthetic.render_frame(scene, intr, T1)
    T_gt = np.linalg.inv(T1) @ np.eye(4)
    pyr0 = preprocess_frame(jnp.asarray(f0[0]), jnp.asarray(f0[1]), 2)
    pyr1 = preprocess_frame(jnp.asarray(f1[0]), jnp.asarray(f1[1]), 2)
    kf = keyframe_pyramid(pyr0, intr)
    for kernel in ("xla", "pallas"):
        cfg = TrackingConfig(levels=2, iters=(6, 16), kernel=kernel, jacobian="ic")
        res = Tracker(intr, cfg).track(kf, pyr1, jnp.eye(4))
        err = se3_np.log(se3_np.inv(T_gt) @ np.asarray(res.T, np.float64))
        assert np.linalg.norm(err) < 5e-3, (kernel, err)
