"""Multi-chip sharding on the 8-device virtual CPU mesh.

Validates the SPMD row-sharded tracker (psum'd normal equations) against
the single-device tracker, and mesh-sharded DP relocalization against the
unsharded scorer.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rgbid_tpu.backend.relocalization import RelocScorer
from rgbid_tpu.core.camera import Intrinsics, level_intrinsics
from rgbid_tpu.core.config import SlamConfig
from rgbid_tpu.datasets import synthetic
from rgbid_tpu.parallel import SpmdTracker, make_mesh, shard_reloc_batch
from rgbid_tpu.reference_cpu import odometry as odo
from rgbid_tpu.reference_cpu import se3_np

INTR = Intrinsics(fx=258.6, fy=258.2, cx=159.3, cy=127.6, width=320, height=240)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


@pytest.fixture(scope="module")
def level1_pair():
    scene = synthetic.make_scene(0)
    T0 = np.eye(4)
    T1 = synthetic.orbit_trajectory(40, trans_amp=0.2, rot_amp=0.05)[3]
    f0 = synthetic.render_frame(scene, INTR, T0)
    f1 = synthetic.render_frame(scene, INTR, T1)
    p0 = odo.preprocess_frame(f0[0], f0[1], 2)
    p1 = odo.preprocess_frame(f1[0], f1[1], 2)
    T_gt = np.linalg.inv(T1) @ T0
    return p0, p1, T_gt


def test_spmd_tracker_matches_ground_truth(level1_pair):
    p0, p1, T_gt = level1_pair
    intr_l = level_intrinsics(INTR, 1)  # 120 x 160: 120 rows = 8 x 15
    mesh = make_mesh(8, "sp")

    from rgbid_tpu.ops import gauss_newton, image

    kf_int = jnp.asarray(p0.intensity[1])
    kf_xi = jnp.asarray(p0.xi[1])
    kf_mask = jnp.asarray(p0.mask[1], jnp.float32)
    ones = jnp.ones_like(kf_mask)
    gx_i, gy_i = image.gradients(kf_int, ones)
    gx_x, gy_x = image.gradients(kf_xi, kf_mask)
    jac = gauss_newton.template_jacobians(gx_i, gy_i, gx_x, gy_x, kf_xi, kf_mask, intr_l)

    # Init ~3 cm off GT: a single pyramid level has a narrow basin (the
    # full tracker provides coarse levels; here we test the SPMD math).
    T0 = se3_np.exp(np.array([0.02, -0.015, 0.01, 0.008, -0.006, 0.01])) @ T_gt
    tr = SpmdTracker(mesh, intr_l)
    T, s2i, s2x = tr.track(
        kf_int, kf_xi, kf_mask, jac,
        jnp.asarray(p1.intensity[1]), jnp.asarray(p1.xi[1]),
        jnp.asarray(p1.mask[1], jnp.float32),
        jnp.asarray(T0, jnp.float32), iters=25,
    )
    err = se3_np.log(se3_np.inv(T_gt) @ np.asarray(T, np.float64))
    assert np.linalg.norm(err) < 3e-3
    assert float(s2i) < 0.01


def test_spmd_matches_single_device(level1_pair):
    """8-way row sharding must reproduce the unsharded math (same psums)."""
    p0, p1, _ = level1_pair
    intr_l = level_intrinsics(INTR, 1)
    from rgbid_tpu.ops import gauss_newton, image

    kf_int = jnp.asarray(p0.intensity[1])
    kf_xi = jnp.asarray(p0.xi[1])
    kf_mask = jnp.asarray(p0.mask[1], jnp.float32)
    ones = jnp.ones_like(kf_mask)
    gx_i, gy_i = image.gradients(kf_int, ones)
    gx_x, gy_x = image.gradients(kf_xi, kf_mask)
    jac = gauss_newton.template_jacobians(gx_i, gy_i, gx_x, gy_x, kf_xi, kf_mask, intr_l)
    cur = (
        jnp.asarray(p1.intensity[1]),
        jnp.asarray(p1.xi[1]),
        jnp.asarray(p1.mask[1], jnp.float32),
    )

    results = {}
    for n_dev in (1, 8):
        mesh = make_mesh(n_dev, "sp")
        tr = SpmdTracker(mesh, intr_l)
        T, _, _ = tr.track(
            kf_int, kf_xi, kf_mask, jac, *cur,
            jnp.eye(4, dtype=jnp.float32), iters=10,
        )
        results[n_dev] = np.asarray(T, np.float64)
    # fp reduction order differs; agreement to ~1e-4 is bit-noise level here.
    np.testing.assert_allclose(results[1], results[8], atol=5e-4)


def test_sharded_reloc_matches_unsharded(level1_pair):
    """DP reloc over DISTINCT pairs: each batch slot scores a different
    (template, current) pair, and per-pair equality with the unsharded
    scorer is asserted — sharding must not mix pairs across devices."""
    p0, p1, T_gt = level1_pair
    cfg = SlamConfig().override(
        **{"tracking.levels": 3, "backend.reloc_level": 1, "backend.reloc_iters": 16}
    )
    scorer = RelocScorer(INTR, cfg)

    def planes(p):
        return {
            "intensity": p.intensity[1],
            "xi": p.xi[1],
            "mask": p.mask[1].astype(np.float32),
        }

    # Three distinct pairs: (p0→p1), (p1→p0), (p0→a farther view).
    scene = synthetic.make_scene(0)
    T2 = synthetic.orbit_trajectory(40, trans_amp=0.2, rot_amp=0.05)[6]
    f2 = synthetic.render_frame(scene, INTR, T2)
    p2 = odo.preprocess_frame(f2[0], f2[1], 2)
    temps = [planes(p0), planes(p1), planes(p0)]
    curs = [planes(p1), planes(p0), planes(p2)]

    base = scorer.score_pairs(temps, curs)
    mesh = make_mesh(8, "dp")
    sharded = shard_reloc_batch(scorer, mesh, temps, curs)
    np.testing.assert_allclose(np.asarray(sharded.T), np.asarray(base.T)[:3], atol=1e-4)
    err = se3_np.log(se3_np.inv(T_gt) @ np.asarray(sharded.T[0], np.float64))
    assert np.linalg.norm(err) < 1.2e-2
    # Distinctness is real: different pairs produce different poses.
    Ts = np.asarray(sharded.T)
    assert np.abs(Ts[0] - Ts[1]).max() > 1e-3
    assert np.abs(Ts[0] - Ts[2]).max() > 1e-3


# ---------------------------------------------------------------------------
# Round 2: the PRODUCTION tracker under shard_map (not the demo class)


@pytest.fixture(scope="module")
def esm_pair():
    """Production keyframe/frame pytrees (ESM) at mesh-divisible shapes."""
    import jax.numpy as jnp

    from rgbid_tpu.core.camera import Intrinsics
    from rgbid_tpu.datasets import synthetic
    from rgbid_tpu.mapping.keyframe import create_device_keyframe
    from rgbid_tpu.core.config import FusionConfig
    from rgbid_tpu.tracking.frames import preprocess_frame

    h, w = 256, 128
    intr = Intrinsics(fx=110.0, fy=110.0, cx=w / 2 - 0.5, cy=h / 2 - 0.5, width=w, height=h)
    seq = synthetic.generate_sequence(
        n_frames=2, intr=intr, motion="orbit", trans_amp=0.12, rot_amp=0.04, seed=6
    )
    pyr0 = preprocess_frame(jnp.asarray(seq.rgb[0]), jnp.asarray(seq.depth[0]), 3, esm=True)
    pyr1 = preprocess_frame(jnp.asarray(seq.rgb[1]), jnp.asarray(seq.depth[1]), 3, esm=True)
    kf = create_device_keyframe(pyr0, intr, FusionConfig(), jacobian="esm")
    gt_rel = np.linalg.inv(seq.gt_poses[1]) @ seq.gt_poses[0]  # T_{cur<-kf}
    return intr, kf, pyr1, gt_rel


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices")
def test_sharded_production_tracker_matches_single_device(esm_pair):
    """shard_map'd _track_impl (the REAL ESM step, row-sharded keyframe,
    psum'd statistics) must equal the single-device production tracker."""
    import jax.numpy as jnp

    from rgbid_tpu.core.config import TrackingConfig
    from rgbid_tpu.parallel import ShardedTracker, make_mesh
    from rgbid_tpu.tracking.tracker import Tracker

    intr, kf, cur, gt_rel = esm_pair
    cfg = TrackingConfig(levels=3, iters=(2, 4, 8), jacobian="esm", kernel="xla")
    single = Tracker(intr, cfg)
    mesh = make_mesh(8, "sp")
    sharded = ShardedTracker(mesh, intr, cfg)

    T0 = jnp.eye(4, dtype=jnp.float32)
    r1 = single.track(kf.levels, cur, T0)
    r8 = sharded.track(kf.levels, cur, T0)
    np.testing.assert_allclose(np.asarray(r8.T), np.asarray(r1.T), atol=2e-5)
    np.testing.assert_allclose(np.asarray(r8.H), np.asarray(r1.H), rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(float(r8.n_valid[0]), float(r1.n_valid[0]), rtol=1e-6)
    np.testing.assert_allclose(float(r8.overlap), float(r1.overlap), rtol=1e-5)
    # And it actually tracked: pose close to ground truth.
    err = np.linalg.norm(np.asarray(r8.T)[:3, 3] - gt_rel[:3, 3])
    assert err < 5e-3, err


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices")
def test_sharded_strided_tracker_matches_single_device(esm_pair):
    """template_stride under shard_map: each device decimates its own row
    band, which equals the single-device global decimation iff the
    per-device band height divides by the stride (here 256/8 = 32 rows,
    stride 2 — the production VGA/8 = 60-row case is likewise even).
    row_offset is in STRIDED units and flows through the 1/s-scaled
    backprojection intrinsics, so global full-res row = s*(i + offset) —
    any error there shifts every off-device band's geometry and cannot
    cancel. Sharded must equal single-device to reduction-order noise."""
    import jax.numpy as jnp

    from rgbid_tpu.core.config import TrackingConfig
    from rgbid_tpu.parallel import ShardedTracker, make_mesh
    from rgbid_tpu.tracking.tracker import Tracker

    intr, kf, cur, gt_rel = esm_pair
    cfg = TrackingConfig(
        levels=3, iters=(2, 4, 8), jacobian="esm", kernel="xla",
        template_stride=(2, 2, 1),
    )
    single = Tracker(intr, cfg)
    sharded = ShardedTracker(make_mesh(8, "sp"), intr, cfg)

    T0 = jnp.eye(4, dtype=jnp.float32)
    r1 = single.track(kf.levels, cur, T0)
    r8 = sharded.track(kf.levels, cur, T0)
    np.testing.assert_allclose(np.asarray(r8.T), np.asarray(r1.T), atol=2e-5)
    np.testing.assert_allclose(np.asarray(r8.H), np.asarray(r1.H), rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(float(r8.n_valid[0]), float(r1.n_valid[0]), rtol=1e-6)
    np.testing.assert_allclose(float(r8.overlap), float(r1.overlap), rtol=1e-5)
    # Strided solve still tracks the pair.
    err = np.linalg.norm(np.asarray(r8.T)[:3, 3] - gt_rel[:3, 3])
    assert err < 5e-3, err


def test_sharded_consensus_triggers_identically():
    """The depth-stratified consensus must take the SAME decision under
    shard_map as on a single device — the stratified reduction psums its
    (K, 50) statistics, so votes, hostage flags, and the masked re-track
    all replicate. Exercised on a REAL near-field mover (the synthetic
    renderer's occluder panel at z=1.4 m against a 1.8-4 m background:
    3+ voting strata with the panel a pixel minority). The round-3
    consensus rework deliberately refuses two-voter 50/50 scenes (no
    majority to appeal to), so the mover must be a genuine minority
    stratum for detection to be exercisable at all."""
    import jax.numpy as jnp

    from rgbid_tpu.core.camera import Intrinsics
    from rgbid_tpu.core.config import FusionConfig, TrackingConfig
    from rgbid_tpu.datasets import synthetic
    from rgbid_tpu.mapping.keyframe import create_device_keyframe
    from rgbid_tpu.parallel import ShardedTracker, make_mesh
    from rgbid_tpu.tracking.frames import preprocess_frame
    from rgbid_tpu.tracking.tracker import Tracker

    h, w = 256, 128
    intr = Intrinsics(
        fx=110.0, fy=110.0, cx=w / 2 - 0.5, cy=h / 2 - 0.5, width=w, height=h
    )
    # Fast panel (0.067 m/frame at z 1.4 = basin-escaping ~5 px/frame
    # at level 0): its stratum saturates the fixed-sigma error and the
    # error-outlier path flags it (err ~1.1 > floor, 9% pixel minority).
    # The panel sweeps in from x=-1.6 at 0.067 m/frame, so frames 24/25
    # have it exactly mid-view.
    seq = synthetic.generate_sequence(
        n_frames=26, intr=intr, motion="orbit", trans_amp=0.12, rot_amp=0.04,
        moving_occluder=True, occluder_z=1.4, occluder_speed=0.067, seed=6,
    )
    pyr0 = preprocess_frame(
        jnp.asarray(seq.rgb[24]), jnp.asarray(seq.depth[24]), 3, esm=True
    )
    kf = create_device_keyframe(pyr0, intr, FusionConfig(), jacobian="esm")
    cur2 = preprocess_frame(
        jnp.asarray(seq.rgb[25]), jnp.asarray(seq.depth[25]), 3, esm=True
    )

    cfg = TrackingConfig(
        levels=3, iters=(2, 4, 8), jacobian="esm", kernel="xla",
        consensus=True, consensus_persist=1,
    )
    T0 = jnp.eye(4, dtype=jnp.float32)
    # STREAMING semantics on both paths: zero persistence history, the
    # same default the ShardedTracker uses (advisor round-2 fix — SPMD
    # must not silently waive the persistence gate).
    hist = jnp.zeros((cfg.consensus_bins,), jnp.float32)
    single = Tracker(intr, cfg)
    r1 = single.track(kf.levels, cur2, T0, cons_prev=hist)
    mesh = make_mesh(8, "sp")
    sharded = ShardedTracker(mesh, intr, cfg)
    r8 = sharded.track(kf.levels, cur2, T0)
    np.testing.assert_allclose(np.asarray(r8.T), np.asarray(r1.T), atol=5e-5)
    np.testing.assert_allclose(
        float(r8.consensus_frac), float(r1.consensus_frac), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(r8.cons_excluded), np.asarray(r1.cons_excluded), atol=1e-6
    )
    # The detection path must actually be exercised: the panel's
    # stratum gets flagged (nonzero consecutive counts) on BOTH paths.
    assert np.asarray(r1.cons_excluded).max() > 0
    assert np.asarray(r8.cons_excluded).max() > 0


# ---------------------------------------------------------------------------
# Round 5: the ATTACK PROBE's acceptance path under SPMD (round-4 VERDICT
# weak #8 — the probe's fixed-sigma evidence psums, the probe evidence
# mask, and the streak transfer were the one consensus mechanism with no
# sharded == single-device case).


def test_sharded_attack_probe_accepts_identically():
    """A ballistic-onset frame pair where the attack probe FIRES and is
    ACCEPTED: the sharded tracker must reproduce the single-device pose
    AND the post-transfer streak exactly. The acceptance path exercises
    three SPMD-relevant reductions that no other test reaches: the
    `_err0_fixed` evidence psums (both hypotheses' level-0 errors must
    psum identically or devices could take different accept branches),
    the probe evidence mask (built from psum'd vote exclusions), and the
    streak transfer (attacker credited, vote-named victim decayed).

    The clip is the gauntlet's ballistic near mover (BASELINE.md round-4
    forensics: the panel locks the coarse solve within one frame of
    onset, the vote names the occluded static VICTIM under a clear
    majority, and only the probe's info-density argmax can name the
    attacker) re-rendered at 320x256 so all four pyramid level heights
    (256/128/64/32) shard 8 ways."""
    import jax.numpy as jnp

    from rgbid_tpu.core.camera import Intrinsics
    from rgbid_tpu.core.config import FusionConfig
    from rgbid_tpu.datasets import synthetic
    from rgbid_tpu.mapping.keyframe import create_device_keyframe
    from rgbid_tpu.parallel import ShardedTracker, make_mesh
    from rgbid_tpu.tracking.frames import preprocess_frame
    from rgbid_tpu.tracking.tracker import Tracker

    h, w = 256, 320
    intr = Intrinsics(
        fx=258.6, fy=258.2, cx=159.5, cy=127.5, width=w, height=h
    )
    # The VGA-gauntlet ballistic clip's parameters (seed 3; trajectory
    # phase scales with n_frames, so render all 60 and slice the onset).
    seq = synthetic.generate_sequence(
        n_frames=60,
        intr=intr,
        motion="orbit",
        trans_amp=0.25,
        rot_amp=0.08,
        xi_noise_sigma=0.005,
        moving_occluder=True,
        occluder_z=1.4,
        seed=3,
    )
    # Production onset: f24 founds a keyframe with the incoming panel in
    # view; at f25 the coarse solve locks onto the panel from a clean
    # constant-velocity prior. Reproduce exactly that: template = f24,
    # current = f25, T_init = the f23->f24 inter-frame delta (what the
    # motion model predicts), zero persistence history (fresh founding).
    tcfg = (
        SlamConfig()
        .override(**{"tracking.kernel": "xla", "tracking.attack_probe": True})
        .tracking
    )
    pyr_kf = preprocess_frame(
        jnp.asarray(seq.rgb[24]), jnp.asarray(seq.depth[24]),
        tcfg.levels, esm=True,
    )
    kf = create_device_keyframe(pyr_kf, intr, FusionConfig(), jacobian="esm")
    cur = preprocess_frame(
        jnp.asarray(seq.rgb[25]), jnp.asarray(seq.depth[25]),
        tcfg.levels, esm=True,
    )
    delta = np.linalg.inv(seq.gt_poses[24]) @ seq.gt_poses[23]
    T_init = jnp.asarray(delta, jnp.float32)  # T_ck = I at founding
    hist = jnp.zeros((tcfg.consensus_bins,), jnp.float32)

    single = Tracker(intr, tcfg)
    r1 = single.track(kf.levels, cur, T_init, cons_prev=hist)
    # The probe must actually fire AND be accepted here, or this test
    # exercises nothing: acceptance transfers the streak to the probed
    # attacker while the vote's flagged victim DECAYS — so the streak
    # landing on a stratum the no-probe run did NOT flag is the
    # accepted-probe signature (a rejected probe leaves the victim's
    # normal +1 update in place).
    import dataclasses

    r1_off = Tracker(
        intr, dataclasses.replace(tcfg, attack_probe=False)
    ).track(kf.levels, cur, T_init, cons_prev=hist)
    c_on = np.asarray(r1.cons_excluded)
    c_off = np.asarray(r1_off.cons_excluded)
    assert c_on.max() >= 1.0, f"probe never credited a stratum: {c_on}"
    assert np.argmax(c_on) != np.argmax(c_off), (
        f"streak not transferred (probe not accepted?): on={c_on} off={c_off}"
    )
    # And the accepted probe materially moved the pose off the
    # mover-locked solution.
    d_mm = np.linalg.norm(
        (np.asarray(r1.T) - np.asarray(r1_off.T))[:3, 3]
    ) * 1e3
    assert d_mm > 2.0, f"probe acceptance changed pose by only {d_mm:.2f} mm"

    mesh = make_mesh(8, "sp")
    sharded = ShardedTracker(mesh, intr, tcfg)
    r8 = sharded.track(kf.levels, cur, T_init, cons_prev=hist)
    np.testing.assert_allclose(np.asarray(r8.T), np.asarray(r1.T), atol=5e-5)
    np.testing.assert_allclose(
        np.asarray(r8.cons_excluded), c_on, atol=1e-6
    )
    np.testing.assert_allclose(
        float(r8.consensus_frac), float(r1.consensus_frac), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(r8.rescue), float(r1.rescue), atol=1e-6
    )
