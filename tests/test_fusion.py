"""Inverse-depth fusion (K8+K9): device vs oracle + statistical properties.

BASELINE.json config 3: keyframe creation + inverse-depth fusion with
uncertainty weighting.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from rgbid_tpu.core.camera import Intrinsics
from rgbid_tpu.core.config import FusionConfig, TrackingConfig
from rgbid_tpu.datasets import synthetic
from rgbid_tpu.mapping import create_device_keyframe, fusion, rebuild_after_fusion
from rgbid_tpu.mapping.fusion import fuse_inverse_depth
from rgbid_tpu.reference_cpu import fusion as fusion_ref
from rgbid_tpu.reference_cpu import odometry as odo
from rgbid_tpu.reference_cpu import se3_np
from rgbid_tpu.tracking import preprocess_frame

INTR = Intrinsics(fx=258.6, fy=258.2, cx=159.3, cy=127.6, width=320, height=240)
FCFG = FusionConfig()


@pytest.fixture(scope="module")
def setup():
    scene = synthetic.make_scene(0)
    T0 = np.eye(4)
    T1 = synthetic.orbit_trajectory(40, trans_amp=0.15, rot_amp=0.04)[2]
    rng = np.random.default_rng(7)
    f0 = synthetic.render_frame(scene, INTR, T0, xi_noise_sigma=0.005, rng=rng)
    f1 = synthetic.render_frame(scene, INTR, T1, xi_noise_sigma=0.005, rng=rng)
    _, _, _, gt_depth0 = synthetic.render_frame(scene, INTR, T0)
    T_ck = np.linalg.inv(T1) @ T0
    return f0, f1, T_ck, gt_depth0


def _planes(frame):
    xi, mask = odo.inverse_depth_from_u16(frame[1])
    return xi, mask


def test_device_matches_oracle(setup):
    f0, f1, T_ck, _ = setup
    kf_xi, kf_mask = _planes(f0)
    cur_xi, cur_mask = _planes(f1)
    kf_var = np.full_like(kf_xi, FCFG.sensor_sigma_xi**2)
    cov = np.diag([1e-6, 1e-6, 1e-6, 1e-7, 1e-7, 1e-7])

    r_xi, r_var, r_mask, r_n = fusion_ref.fuse(
        kf_xi, kf_var, kf_mask, cur_xi, cur_mask, T_ck, cov, INTR, FCFG
    )
    d_xi, d_var, d_mask, d_n = fuse_inverse_depth(
        jnp.asarray(kf_xi),
        jnp.asarray(kf_var),
        jnp.asarray(kf_mask, jnp.float32),
        jnp.asarray(cur_xi),
        jnp.asarray(cur_mask, jnp.float32),
        jnp.asarray(T_ck, jnp.float32),
        jnp.asarray(cov, jnp.float32),
        INTR,
        FCFG,
    )
    # Gate decisions at the threshold boundary may differ by float precision;
    # compare values where both agree the pixel was fused, and demand the
    # fused-pixel sets agree to >99.9%.
    changed_ref = r_xi != kf_xi
    changed_dev = np.asarray(d_xi) != kf_xi
    agree = changed_ref == changed_dev
    assert agree.mean() > 0.999
    both = changed_ref & changed_dev
    np.testing.assert_allclose(np.asarray(d_xi)[both], r_xi[both], atol=5e-4)
    np.testing.assert_allclose(np.asarray(d_var)[both], r_var[both], rtol=2e-2, atol=1e-9)
    assert abs(float(d_n) - r_n) / max(r_n, 1) < 2e-3


def test_variance_decreases_and_xi_improves(setup):
    """Fusing repeated noisy observations must shrink variance and pull the
    inverse-depth map toward ground truth (Kalman consistency)."""
    f0, f1, T_ck, gt_depth0 = setup
    scene = synthetic.make_scene(0)
    kf_xi, kf_mask = _planes(f0)
    kf_var = np.full_like(kf_xi, FCFG.sensor_sigma_xi**2)
    gt_xi = np.where(gt_depth0 > 0, 1.0 / np.maximum(gt_depth0, 1e-6), 0.0)

    err0 = np.abs((kf_xi - gt_xi)[kf_mask]).mean()
    rng = np.random.default_rng(11)
    poses = synthetic.orbit_trajectory(40, trans_amp=0.15, rot_amp=0.04)
    var_prev = kf_var.copy()
    for k in [4, 6, 8]:
        fk = synthetic.render_frame(scene, INTR, poses[k], xi_noise_sigma=0.005, rng=rng)
        cur_xi, cur_mask = _planes(fk)
        T = np.linalg.inv(poses[k]) @ np.eye(4)
        kf_xi, kf_var, kf_mask, n = fusion_ref.fuse(
            kf_xi, kf_var, kf_mask, cur_xi, cur_mask, T, np.zeros((6, 6)), INTR, FCFG
        )
        assert n > 0.5 * kf_mask.sum()
        assert np.all(kf_var <= var_prev + 1e-12)
        var_prev = kf_var.copy()
    err1 = np.abs((kf_xi - gt_xi)[kf_mask]).mean()
    assert err1 < 0.8 * err0  # denoising works


def test_occlusion_gate_rejects_outliers(setup):
    f0, _, _, _ = setup
    kf_xi, kf_mask = _planes(f0)
    kf_var = np.full_like(kf_xi, FCFG.sensor_sigma_xi**2)
    #

    # A fake current frame whose depth is wildly different (e.g. an object
    # appeared): identity pose, xi scaled by 2 -> all residuals huge.
    cur_xi = kf_xi * 2.0
    xi_new, var_new, _, n = fusion_ref.fuse(
        kf_xi, kf_var, kf_mask, cur_xi, kf_mask, np.eye(4), np.zeros((6, 6)), INTR, FCFG
    )
    assert n < 0.01 * kf_mask.sum()  # nearly everything gated out
    np.testing.assert_allclose(xi_new, kf_xi)  # map untouched


def test_pose_uncertainty_inflates_obs_variance(setup):
    f0, f1, T_ck, _ = setup
    kf_xi, kf_mask = _planes(f0)
    cur_xi, cur_mask = _planes(f1)
    kf_var = np.full_like(kf_xi, FCFG.sensor_sigma_xi**2)
    _, var_certain, _, _ = fusion_ref.fuse(
        kf_xi, kf_var, kf_mask, cur_xi, cur_mask, T_ck, np.zeros((6, 6)), INTR, FCFG
    )
    big_cov = np.diag([1e-4, 1e-4, 1e-4, 1e-5, 1e-5, 1e-5])
    _, var_uncertain, _, _ = fusion_ref.fuse(
        kf_xi, kf_var, kf_mask, cur_xi, cur_mask, T_ck, big_cov, INTR, FCFG
    )
    # With an uncertain pose, posterior variance must not shrink as much.
    assert var_uncertain.mean() >= var_certain.mean()


def _punch_holes(depth_u16, frac=0.25, seed=3):
    """Blob dropout in a u16 depth image (invalid = 0), like the gauntlet's
    depth_holes scenario."""
    rng = np.random.default_rng(seed)
    h, w = depth_u16.shape
    out = depth_u16.copy()
    target = frac * h * w
    killed = 0
    while killed < target:
        cy, cx = rng.integers(0, h), rng.integers(0, w)
        r = rng.integers(5, 25)
        yy, xx = np.ogrid[:h, :w]
        blob = (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r
        killed += blob.sum()
        out[blob] = 0
    return out


def _np_hole_guess(xi0, mask0, levels=3):
    """Numpy mirror of mapping.fusion.hole_guess via the device pyramid."""
    from rgbid_tpu.mapping.fusion import hole_guess
    from rgbid_tpu.ops import image
    from rgbid_tpu.tracking.frames import KeyframeLevel

    xi_pyr, mask_pyr = image.build_pyramid(
        jnp.asarray(xi0), jnp.asarray(mask0, jnp.float32), levels
    )
    lvls = [
        KeyframeLevel(intensity=None, xi=x, mask=m, jac=None)
        for x, m in zip(xi_pyr, mask_pyr)
    ]
    g, gm = hole_guess(lvls)
    return np.asarray(g), np.asarray(gm)


def test_fuse_and_grow_matches_oracle(setup):
    """Device gather-form K8 (Kalman + hits + validity growth) vs the
    numpy oracle: fused values, claimed sets, claimed values and hit
    counts must agree."""
    from rgbid_tpu.mapping.fusion import fuse_and_grow

    f0, f1, T_ck, _ = setup
    holes = _punch_holes(f0[1])
    kf_xi_h, kf_mask_h = odo.inverse_depth_from_u16(holes)
    cur_xi, cur_mask = _planes(f1)
    kf_var = np.full_like(kf_xi_h, FCFG.sensor_sigma_xi**2)
    kf_hits = np.where(kf_mask_h, FCFG.confirm_hits, 0.0).astype(np.float32)
    guess, gmask = _np_hole_guess(kf_xi_h, kf_mask_h)
    cov = np.diag([1e-6, 1e-6, 1e-6, 1e-7, 1e-7, 1e-7])

    r_xi, r_var, r_mask, r_hits, r_nf, r_nc = fusion_ref.fuse_grow(
        kf_xi_h, kf_var, kf_mask_h, kf_hits, cur_xi, cur_mask, T_ck, cov,
        INTR, FCFG, guess, gmask,
    )
    d_xi, d_var, d_mask, d_hits, d_n = fuse_and_grow(
        jnp.asarray(kf_xi_h),
        jnp.asarray(kf_var),
        jnp.asarray(kf_mask_h, jnp.float32),
        jnp.asarray(kf_hits),
        jnp.asarray(cur_xi),
        jnp.asarray(cur_mask, jnp.float32),
        jnp.asarray(T_ck, jnp.float32),
        jnp.asarray(cov, jnp.float32),
        INTR,
        FCFG,
        guess=jnp.asarray(guess),
        gmask=jnp.asarray(gmask),
    )
    # Claims actually happen (the other frame observes into the holes)...
    assert r_nc > 1000, r_nc
    # ...and the device agrees with the oracle on the mask (up to
    # float-boundary gate stragglers) and on the values.
    d_mask_b = np.asarray(d_mask) > 0.5
    agree = d_mask_b == r_mask
    assert agree.mean() > 0.999
    both = d_mask_b & r_mask & (~kf_mask_h)  # claimed on both paths
    close = np.abs(np.asarray(d_xi)[both] - r_xi[both]) <= 5e-4
    assert close.mean() > 0.999, close.mean()
    hits_agree = np.asarray(d_hits) == r_hits
    assert hits_agree.mean() > 0.999
    assert abs(float(d_n) - r_nf) / max(r_nf, 1) < 2e-3


def test_validity_grows_and_confirms(setup):
    """A keyframe founded with 25% depth holes must self-complete: the
    full estimate mask grows, claimed pixels confirm after another
    consistent observation, and the claimed inverse depths are accurate
    (SURVEY.md §2.2 K8 'update validity & hit counts')."""
    from rgbid_tpu.mapping.fusion import fuse_and_grow

    f0, _, _, gt_depth0 = setup
    scene = synthetic.make_scene(0)
    holes = _punch_holes(f0[1])
    kf_xi, kf_mask = odo.inverse_depth_from_u16(holes)
    founding_frac = kf_mask.mean()
    gt_xi = np.where(gt_depth0 > 0, 1.0 / np.maximum(gt_depth0, 1e-6), 0.0)

    xi = jnp.asarray(kf_xi)
    var = jnp.asarray(np.full_like(kf_xi, FCFG.sensor_sigma_xi**2))
    mask = jnp.asarray(kf_mask, jnp.float32)
    hits = jnp.asarray(
        np.where(kf_mask, FCFG.confirm_hits, 0.0).astype(np.float32)
    )
    rng = np.random.default_rng(11)
    poses = synthetic.orbit_trajectory(40, trans_amp=0.15, rot_amp=0.04)
    cov = jnp.zeros((6, 6), jnp.float32)
    for k in [3, 5, 7]:
        fk = synthetic.render_frame(
            scene, INTR, poses[k], xi_noise_sigma=0.005, rng=rng
        )
        cur_xi, cur_mask = _planes(fk)
        T = jnp.asarray(np.linalg.inv(poses[k]), jnp.float32)
        guess, gmask = _np_hole_guess(np.asarray(xi), np.asarray(mask) > 0.5)
        xi, var, mask, hits, _ = fuse_and_grow(
            xi, var, mask, hits,
            jnp.asarray(cur_xi), jnp.asarray(cur_mask, jnp.float32),
            T, cov, INTR, FCFG,
            guess=jnp.asarray(guess), gmask=jnp.asarray(gmask),
        )
    mask_np = np.asarray(mask) > 0.5
    hits_np = np.asarray(hits)
    grown = mask_np & (~kf_mask)
    # Validity grew substantially into the founding holes.
    assert mask_np.mean() > founding_frac + 0.05, (
        mask_np.mean(), founding_frac
    )
    assert grown.sum() > 1000
    # Claimed + re-observed pixels are CONFIRMED (enter template/cloud).
    confirmed_grown = grown & (hits_np >= FCFG.confirm_hits)
    assert confirmed_grown.sum() > 0.5 * grown.sum()
    # And the grown estimates are accurate where ground truth exists.
    sel = grown & (gt_xi > 1e-6)
    err = np.abs(np.asarray(xi)[sel] - gt_xi[sel])
    assert np.median(err) < 0.01  # 1% of a 1/m inverse depth


def test_create_and_rebuild_device_keyframe(setup):
    f0, f1, T_ck, _ = setup
    pyr = preprocess_frame(jnp.asarray(f0[0]), jnp.asarray(f0[1]), 3)
    kf = create_device_keyframe(pyr, INTR, FCFG)
    assert kf.var.shape == (240, 320)
    assert len(kf.levels) == 3
    # Rebuild with the (unchanged) level-0 planes: template must be identical.
    kf2 = rebuild_after_fusion(kf, kf.levels[0].xi, kf.var, kf.levels[0].mask, INTR)
    np.testing.assert_allclose(
        np.asarray(kf2.levels[1].xi), np.asarray(kf.levels[1].xi), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(kf2.levels[0].jac), np.asarray(kf.levels[0].jac), atol=1e-6
    )
