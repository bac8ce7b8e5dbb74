"""Validate the numpy CPU reference odometry (the correctness oracle).

BASELINE.json config 1: single frame-pair dense odometry with the CPU
reference implementation.
"""

import numpy as np
import pytest

from rgbid_tpu.core.camera import Intrinsics, level_intrinsics
from rgbid_tpu.core.config import TrackingConfig
from rgbid_tpu.datasets import synthetic
from rgbid_tpu.reference_cpu import odometry as odo
from rgbid_tpu.reference_cpu import se3_np


INTR = Intrinsics(fx=258.6, fy=258.2, cx=159.3, cy=127.6, width=320, height=240)
CFG = TrackingConfig(levels=3, iters=(4, 6, 10))


@pytest.fixture(scope="module")
def scene():
    return synthetic.make_scene(0)


@pytest.fixture(scope="module")
def frame_pair(scene):
    T0 = np.eye(4)
    T1 = synthetic.orbit_trajectory(40, trans_amp=0.25, rot_amp=0.06)[2]
    f0 = synthetic.render_frame(scene, INTR, T0)
    f1 = synthetic.render_frame(scene, INTR, T1)
    return f0, f1, T0, T1


def _pyr(frame):
    rgb, d16, _, _ = frame
    return odo.preprocess_frame(rgb, d16, CFG.levels)


# ---------------------------------------------------------------------------
# Jacobian finite-difference checks (exact math, no image sampling involved)


def test_warp_jacobian_finite_difference():
    rng = np.random.default_rng(0)
    intr = level_intrinsics(INTR, 1)
    P = np.array([[[0.3, -0.2, 2.0]], [[-0.5, 0.4, 3.5]]])  # (2,1,3)
    Jpi = odo._projection_jacobian(P, intr)
    Jp = odo._se3_point_jacobian(P)
    Jw = np.einsum("hwij,hwjk->hwik", Jpi, Jp)
    for _ in range(10):
        d = rng.normal(scale=1e-6, size=6)
        Pp = P @ se3_np.exp(d)[:3, :3].T + se3_np.exp(d)[:3, 3]
        du_num = (
            intr.fx * Pp[..., 0] / Pp[..., 2] + intr.cx - (intr.fx * P[..., 0] / P[..., 2] + intr.cx)
        )
        dv_num = (
            intr.fy * Pp[..., 1] / Pp[..., 2] + intr.cy - (intr.fy * P[..., 1] / P[..., 2] + intr.cy)
        )
        du_lin = np.einsum("hwk,k->hw", Jw[..., 0, :], d)
        dv_lin = np.einsum("hwk,k->hw", Jw[..., 1, :], d)
        np.testing.assert_allclose(du_num, du_lin, rtol=1e-3, atol=1e-10)
        np.testing.assert_allclose(dv_num, dv_lin, rtol=1e-3, atol=1e-10)


def test_rho_jacobian_finite_difference():
    rng = np.random.default_rng(1)
    P = np.array([[[0.3, -0.2, 2.0]], [[-0.5, 0.4, 3.5]]])
    Jr = odo._rho_jacobian(P)
    for _ in range(10):
        d = rng.normal(scale=1e-6, size=6)
        T = se3_np.exp(d)
        Pp = P @ T[:3, :3].T + T[:3, 3]
        drho_num = 1.0 / Pp[..., 2] - 1.0 / P[..., 2]
        drho_lin = np.einsum("hwk,k->hw", Jr, d)
        np.testing.assert_allclose(drho_num, drho_lin, rtol=1e-3, atol=1e-12)


# ---------------------------------------------------------------------------
# Pipeline building blocks


def test_pyramid_masks_and_values(frame_pair):
    pyr = _pyr(frame_pair[0])
    assert len(pyr.intensity) == 3
    assert pyr.intensity[1].shape == (120, 160)
    for l in range(3):
        m = pyr.mask[l]
        assert m.mean() > 0.9
        xi = pyr.xi[l][m]
        assert np.all(xi > 1.0 / 10.0) and np.all(xi < 1.0 / 0.3)


def test_student_t_sigma_estimates_scale():
    rng = np.random.default_rng(2)
    r = rng.standard_t(df=5, size=20000).astype(np.float32) * 0.05
    sigma = odo.student_t_sigma(r, np.ones_like(r, bool), 5.0, 0.5, iters=20)
    assert 0.04 < sigma < 0.06


def test_bilinear_sample_identity_grid():
    img = np.arange(30, dtype=np.float32).reshape(5, 6)
    u, v = np.meshgrid(np.arange(6, dtype=np.float32), np.arange(5, dtype=np.float32))
    val, ok = odo.bilinear_sample(img, np.ones((5, 6), bool), u, v)
    np.testing.assert_allclose(val[ok], img[ok])


# ---------------------------------------------------------------------------
# Tracking


def test_track_identity_pair(frame_pair):
    pyr = _pyr(frame_pair[0])
    T, stats, _ = odo.track(pyr, pyr, INTR, CFG)
    d = se3_np.log(T)
    assert np.linalg.norm(d) < 1e-4
    assert stats[-1].valid_fraction > 0.9


def test_track_recovers_known_motion(frame_pair):
    f0, f1, T0, T1 = frame_pair
    T_gt = np.linalg.inv(T1) @ T0  # current <- reference
    T, stats, H = odo.track(_pyr(f0), _pyr(f1), INTR, CFG)
    err = se3_np.log(np.linalg.inv(T_gt) @ T)
    assert np.linalg.norm(err[:3]) < 2e-3  # meters
    assert np.linalg.norm(err[3:]) < 2e-3  # radians
    # Normal matrix must be SPD (usable as information matrix).
    assert np.all(np.linalg.eigvalsh(H) > 0)


def test_track_converges_from_perturbed_init(frame_pair):
    f0, f1, T0, T1 = frame_pair
    T_gt = np.linalg.inv(T1) @ T0
    T_init = se3_np.exp(np.array([0.02, -0.015, 0.01, 0.01, -0.008, 0.012])) @ T_gt
    T, _, _ = odo.track(_pyr(f0), _pyr(f1), INTR, CFG, T_init=T_init)
    err = se3_np.log(np.linalg.inv(T_gt) @ T)
    assert np.linalg.norm(err) < 3e-3


def test_photometric_only_mode(frame_pair):
    f0, f1, T0, T1 = frame_pair
    T_gt = np.linalg.inv(T1) @ T0
    cfg = TrackingConfig(levels=3, iters=(4, 6, 10), use_geometric=False)
    T, _, _ = odo.track(_pyr(f0), _pyr(f1), INTR, cfg)
    err = se3_np.log(np.linalg.inv(T_gt) @ T)
    # Photometric-only still converges on textured scenes, slightly looser.
    assert np.linalg.norm(err) < 5e-3
