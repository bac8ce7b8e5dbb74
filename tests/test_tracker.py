"""On-device inverse-compositional tracker vs. ground truth and CPU oracle.

BASELINE.json config 2: pyramid Gauss-Newton tracking.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from rgbid_tpu.core.camera import Intrinsics
from rgbid_tpu.core.config import TrackingConfig
from rgbid_tpu.datasets import synthetic
from rgbid_tpu.reference_cpu import odometry as odo
from rgbid_tpu.reference_cpu import se3_np
from rgbid_tpu.tracking import Tracker, keyframe_pyramid, preprocess_frame

INTR = Intrinsics(fx=258.6, fy=258.2, cx=159.3, cy=127.6, width=320, height=240)
CFG = TrackingConfig(levels=3, iters=(4, 8, 16), jacobian="ic")  # keyframe_pyramid builds IC templates


@pytest.fixture(scope="module")
def scene():
    return synthetic.make_scene(0)


@pytest.fixture(scope="module")
def pair(scene):
    T0 = np.eye(4)
    T1 = synthetic.orbit_trajectory(40, trans_amp=0.25, rot_amp=0.06)[2]
    f0 = synthetic.render_frame(scene, INTR, T0)
    f1 = synthetic.render_frame(scene, INTR, T1)
    return f0, f1, T0, T1


def _dev_pyr(frame):
    rgb, d16, _, _ = frame
    return preprocess_frame(jnp.asarray(rgb), jnp.asarray(d16), CFG.levels)


def test_track_identity(pair):
    f0 = pair[0]
    pyr = _dev_pyr(f0)
    kf = keyframe_pyramid(pyr, INTR)
    tracker = Tracker(INTR, CFG)
    res = tracker.track(kf, pyr, jnp.eye(4))
    d = se3_np.log(np.asarray(res.T, np.float64))
    assert np.linalg.norm(d) < 1e-4
    assert float(res.overlap) > 0.9
    assert np.all(np.asarray(res.n_valid) > 100)


def test_track_recovers_known_motion(pair):
    f0, f1, T0, T1 = pair
    T_gt = np.linalg.inv(T1) @ T0
    kf = keyframe_pyramid(_dev_pyr(f0), INTR)
    tracker = Tracker(INTR, CFG)
    res = tracker.track(kf, _dev_pyr(f1), jnp.eye(4))
    err = se3_np.log(se3_np.inv(T_gt) @ np.asarray(res.T, np.float64))
    assert np.linalg.norm(err[:3]) < 3e-3
    assert np.linalg.norm(err[3:]) < 3e-3


def test_device_matches_cpu_reference(pair):
    """IC device tracker and FC numpy oracle converge to the same pose."""
    f0, f1, _, _ = pair
    kf = keyframe_pyramid(_dev_pyr(f0), INTR)
    tracker = Tracker(INTR, CFG)
    res = tracker.track(kf, _dev_pyr(f1), jnp.eye(4))

    T_cpu, _, _ = odo.track(
        odo.preprocess_frame(f0[0], f0[1], CFG.levels),
        odo.preprocess_frame(f1[0], f1[1], CFG.levels),
        INTR,
        CFG,
    )
    err = se3_np.log(se3_np.inv(T_cpu) @ np.asarray(res.T, np.float64))
    assert np.linalg.norm(err) < 2e-3


def test_track_from_motion_prior(pair):
    f0, f1, T0, T1 = pair
    T_gt = np.linalg.inv(T1) @ T0
    T_init = se3_np.exp(np.array([0.02, -0.015, 0.01, 0.01, -0.008, 0.012])) @ T_gt
    kf = keyframe_pyramid(_dev_pyr(f0), INTR)
    tracker = Tracker(INTR, CFG)
    res = tracker.track(kf, _dev_pyr(f1), jnp.asarray(T_init, jnp.float32))
    err = se3_np.log(se3_np.inv(T_gt) @ np.asarray(res.T, np.float64))
    assert np.linalg.norm(err) < 3e-3


def test_diagnostics_shapes(pair):
    f0 = pair[0]
    pyr = _dev_pyr(f0)
    kf = keyframe_pyramid(pyr, INTR)
    res = Tracker(INTR, CFG).track(kf, pyr, jnp.eye(4))
    assert res.errors.shape == (3,)
    assert res.H.shape == (6, 6)
    assert np.all(np.isfinite(np.asarray(res.errors)))
    # H must be symmetric PSD (information matrix).
    H = np.asarray(res.H, np.float64)
    np.testing.assert_allclose(H, H.T, rtol=1e-4)
    assert np.all(np.linalg.eigvalsh(H) > -1e-3)


def test_esm_tracker_beats_ic(pair):
    """ESM mode (default): near-second-order convergence — at the same
    iteration budget it must beat the IC path on this pair."""
    from rgbid_tpu.core.config import FusionConfig
    from rgbid_tpu.mapping.keyframe import create_device_keyframe

    f0, f1, T0, T1 = pair
    T_gt = np.linalg.inv(T1) @ T0
    results = {}
    for jac in ("ic", "esm"):
        esm = jac == "esm"
        pyr0 = preprocess_frame(jnp.asarray(f0[0]), jnp.asarray(f0[1]), 3, esm=esm)
        pyr1 = preprocess_frame(jnp.asarray(f1[0]), jnp.asarray(f1[1]), 3, esm=esm)
        kf = create_device_keyframe(pyr0, INTR, FusionConfig(), jacobian=jac)
        cfg = TrackingConfig(levels=3, iters=(4, 8, 16), jacobian=jac)
        res = Tracker(INTR, cfg).track(kf.levels, pyr1, jnp.eye(4))
        err = se3_np.log(se3_np.inv(T_gt) @ np.asarray(res.T, np.float64))
        results[jac] = np.linalg.norm(err)
    assert results["esm"] < 1e-3
    assert results["esm"] <= results["ic"] * 1.2  # at least as good


def test_textureless_scene_geometric_channel():
    """The joint error's inverse-depth channel must carry tracking when
    the scene has NO texture (the paper's central claim: photometric-only
    methods fail here; the well-conditioned inverse-depth residual does
    not)."""
    from rgbid_tpu.core.config import FusionConfig
    from rgbid_tpu.datasets.synthetic import Scene, TexturedRect, orbit_trajectory, render_frame
    from rgbid_tpu.mapping.keyframe import create_device_keyframe

    # Rebuild the default room-corner geometry with FLAT textures.
    base = synthetic.make_scene(0)
    flat = Scene(
        rects=[
            type(r)(r.p0, r.eu, r.ev, np.full_like(r.texture, 0.5), r.tint)
            for r in base.rects
        ]
    )
    T1 = orbit_trajectory(40, trans_amp=0.15, rot_amp=0.04)[2]
    f0 = render_frame(flat, INTR, np.eye(4))
    f1 = render_frame(flat, INTR, T1)
    T_gt = np.linalg.inv(T1) @ np.eye(4)
    pyr0 = preprocess_frame(jnp.asarray(f0[0]), jnp.asarray(f0[1]), 3, esm=True)
    pyr1 = preprocess_frame(jnp.asarray(f1[0]), jnp.asarray(f1[1]), 3, esm=True)
    kf = create_device_keyframe(pyr0, INTR, FusionConfig(), jacobian="esm")
    cfg = TrackingConfig(levels=3, iters=(4, 8, 16), jacobian="esm")
    res = Tracker(INTR, cfg).track(kf.levels, pyr1, jnp.eye(4))
    err = se3_np.log(se3_np.inv(T_gt) @ np.asarray(res.T, np.float64))
    assert np.all(np.isfinite(np.asarray(res.T)))
    # Physics note: with zero texture the only weak direction is the
    # classic ty/wx "sliding" ambiguity of the (near-horizontal) floor
    # plane, limited by u16 depth quantization; the well-observable
    # directions must still be recovered tightly, and the total error
    # stays bounded (photometric-only methods diverge outright here).
    assert abs(err[0]) < 5e-3 and abs(err[2]) < 5e-3 and abs(err[5]) < 5e-3, err
    assert np.linalg.norm(err) < 8e-2, err


def test_bf16_plane_storage_matches_f32():
    """plane_dtype="bf16" stores the per-iteration HBM-resident planes
    (gather stack, hoisted backprojected points, template intensity)
    half-width while all residual/Jacobian MATH stays f32 — the recovered
    pose must match the f32 run to well under the sensor quantization
    (see TrackingConfig.plane_dtype for the quantization-step argument).
    """
    from rgbid_tpu.core.config import FusionConfig
    from rgbid_tpu.mapping.keyframe import create_device_keyframe

    scene = synthetic.make_scene(0)
    T0 = np.eye(4)
    T1 = synthetic.orbit_trajectory(40, trans_amp=0.25, rot_amp=0.06)[2]
    f0 = synthetic.render_frame(scene, INTR, T0)
    f1 = synthetic.render_frame(scene, INTR, T1)
    T_gt = np.linalg.inv(T1) @ T0
    poses = {}
    for pd in ("f32", "bf16"):
        dt = jnp.bfloat16 if pd == "bf16" else jnp.float32
        pyr0 = preprocess_frame(jnp.asarray(f0[0]), jnp.asarray(f0[1]), 3,
                                esm=True, plane_dtype=dt)
        pyr1 = preprocess_frame(jnp.asarray(f1[0]), jnp.asarray(f1[1]), 3,
                                esm=True, plane_dtype=dt)
        kf = create_device_keyframe(pyr0, INTR, FusionConfig(), jacobian="esm")
        cfg = TrackingConfig(levels=3, iters=(4, 8, 16), jacobian="esm",
                             plane_dtype=pd)
        res = Tracker(INTR, cfg).track(kf.levels, pyr1, jnp.eye(4))
        err = se3_np.log(se3_np.inv(T_gt) @ np.asarray(res.T, np.float64))
        poses[pd] = (np.asarray(res.T, np.float64), np.linalg.norm(err))
    # Both recover the motion; bf16 within 2x of f32's (already sub-mm)
    # error and the two poses agree to sub-mm.
    assert poses["f32"][1] < 1e-3
    assert poses["bf16"][1] < 2e-3
    d = se3_np.log(se3_np.inv(poses["f32"][0]) @ poses["bf16"][0])
    assert np.linalg.norm(d) < 1e-3, d


def test_template_stride_backprojection_exact(pair):
    """Strided-template backprojection is EXACT, not approximate: strided
    pixel (i, j) IS full-res pixel (s*i, s*j), so backprojecting the
    decimated xi plane through plain 1/s-scaled intrinsics must reproduce
    the full-res points at the kept pixels bit-for-bit (the lever changes
    WHICH template pixels vote, never WHERE they are in space)."""
    from rgbid_tpu.ops.warp import backproject_grid

    f0 = pair[0]
    pyr = _dev_pyr(f0)
    xi = pyr[0].xi
    s = 2
    intr_s = Intrinsics(
        fx=INTR.fx / s, fy=INTR.fy / s, cx=INTR.cx / s, cy=INTR.cy / s,
        width=INTR.width // s, height=INTR.height // s,
    )
    full = backproject_grid(xi, INTR)
    strided = backproject_grid(xi[::s, ::s], intr_s)
    for a, b in zip(strided, full):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b)[::s, ::s])


def test_template_stride_tracks(pair):
    """template_stride=(2,2,1) (the round-5 speed lever: s^2x fewer IRLS
    gather/reduce bytes at the strided levels while the CURRENT frame
    stays full resolution) must recover the pair's motion to the same
    order as the unstrided solve — VGA/4 ~ 19k pixels still vastly
    overdetermine 6 DOF."""
    from rgbid_tpu.core.config import FusionConfig
    from rgbid_tpu.mapping.keyframe import create_device_keyframe

    f0, f1, T0, T1 = pair
    T_gt = np.linalg.inv(T1) @ T0
    errs = {}
    for stride in ((1, 1, 1), (2, 2, 1)):
        pyr0 = preprocess_frame(jnp.asarray(f0[0]), jnp.asarray(f0[1]), 3, esm=True)
        pyr1 = preprocess_frame(jnp.asarray(f1[0]), jnp.asarray(f1[1]), 3, esm=True)
        kf = create_device_keyframe(pyr0, INTR, FusionConfig(), jacobian="esm")
        cfg = TrackingConfig(
            levels=3, iters=(4, 8, 16), jacobian="esm", template_stride=stride
        )
        res = Tracker(INTR, cfg).track(kf.levels, pyr1, jnp.eye(4))
        err = se3_np.log(se3_np.inv(T_gt) @ np.asarray(res.T, np.float64))
        errs[stride] = np.linalg.norm(err)
        # Diagnostics must reflect the decimated template consistently:
        # overlap is a fraction (stride cancels), so it stays high.
        assert float(res.overlap) > 0.8
    assert errs[(2, 2, 1)] < 1.5e-3, errs
    assert errs[(2, 2, 1)] <= max(2.5 * errs[(1, 1, 1)], 7.5e-4), errs


def test_esm_5plane_stack_matches_7plane(pair):
    """The opt-in per-level stack split (esm_geo_min_level=2: 7-plane at
    coarse levels, 5-plane [I, xi, mask, gxI, gyI] at the fine ESM level
    — ESM averaging on intensity only, template gradients for the
    geometric channel) must converge like the full 7-plane stack on a
    clean pair — and both kernels (XLA twin + Pallas interpret) must
    agree exactly on the 5-channel layout. (The knob defaults OFF: with
    depth noise the geometric averaging is load-bearing — 16.7-17.7 vs
    5.3 mm on the noisy loop clip — see TrackingConfig.esm_geo_min_level
    for the measured record.)"""
    from rgbid_tpu.core.config import FusionConfig
    from rgbid_tpu.mapping.keyframe import create_device_keyframe
    from rgbid_tpu.ops import gauss_newton
    from rgbid_tpu.ops.pallas_kernels import esm_residuals_and_normal_eq_pallas
    from rgbid_tpu.ops.warp import backproject_grid

    f0, f1, T0, T1 = pair
    T_gt = np.linalg.inv(T1) @ T0
    errs = {}
    for geo_min in (0, 2):
        pyr0 = preprocess_frame(
            jnp.asarray(f0[0]), jnp.asarray(f0[1]), 3, esm=True,
            esm_geo_min_level=geo_min,
        )
        pyr1 = preprocess_frame(
            jnp.asarray(f1[0]), jnp.asarray(f1[1]), 3, esm=True,
            esm_geo_min_level=geo_min,
        )
        assert pyr1[1].stack7.shape[0] == (5 if geo_min == 2 else 7)
        assert pyr1[2].stack7.shape[0] == 7
        kf = create_device_keyframe(pyr0, INTR, FusionConfig(), jacobian="esm")
        cfg = TrackingConfig(
            levels=3, iters=(4, 8, 16), jacobian="esm",
            esm_geo_min_level=geo_min,
        )
        res = Tracker(INTR, cfg).track(kf.levels, pyr1, jnp.eye(4))
        err = se3_np.log(se3_np.inv(T_gt) @ np.asarray(res.T, np.float64))
        errs[geo_min] = np.linalg.norm(err)
    assert errs[2] < 1e-3, errs  # converges
    assert errs[2] <= max(2.0 * errs[0], 5e-4), errs  # no regression

    # Twin equality on the 5-channel stack (one IRLS evaluation).
    lvl = 1
    pyr0 = preprocess_frame(jnp.asarray(f0[0]), jnp.asarray(f0[1]), 3, esm=True)
    pyr1 = preprocess_frame(
        jnp.asarray(f1[0]), jnp.asarray(f1[1]), 3, esm=True,
        esm_geo_min_level=2,
    )
    kf = create_device_keyframe(pyr0, INTR, FusionConfig(), jacobian="esm")
    kl, cl = kf.levels[lvl], pyr1[lvl]
    from rgbid_tpu.core.camera import level_intrinsics

    intr_l = level_intrinsics(INTR, lvl)
    pts = backproject_grid(kl.xi, intr_l)
    T = jnp.asarray(T_gt, jnp.float32)
    args = (T, kl.intensity, pts, kl.mask, kl.jac, cl.stack7, intr_l,
            5.0, jnp.asarray(0.01), jnp.asarray(0.0025))
    a = esm_residuals_and_normal_eq_pallas(*args)
    b = gauss_newton.esm_residuals_and_normal_eq(*args)
    np.testing.assert_allclose(np.asarray(a.H), np.asarray(b.H), rtol=2e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(a.b), np.asarray(b.b), rtol=2e-4, atol=1e-4)
    np.testing.assert_allclose(float(a.n_valid), float(b.n_valid), rtol=1e-6)
    np.testing.assert_allclose(float(a.error), float(b.error), rtol=1e-4)
