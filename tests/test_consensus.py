"""Depth-stratified motion consensus (tracking/consensus.py).

The near-field moving occluder is the documented breaking point of
non-segmenting dense VO (round-2 gauntlet: 372 mm ATE): a fronto-parallel
panel at 1.4 m carrying ~2/3 of the Fisher information drags the pose and
neither robust weighting nor the occlusion gate can reject it. The
consensus mechanism must (a) crack that scenario and (b) stay silent on
rigid scenes.
"""

import numpy as np
import pytest

from rgbid_tpu.core.camera import Intrinsics
from rgbid_tpu.core.config import SlamConfig
from rgbid_tpu.datasets import synthetic
from rgbid_tpu.eval import absolute_trajectory_error
from rgbid_tpu.system import SlamSystem

INTR = Intrinsics(fx=258.6, fy=258.2, cx=159.5, cy=119.5, width=320, height=240)


# One compiled system per config hash, shared across tests via reset()
# (determinism-tested; the gauntlet runner's pattern): the walking-mover
# and rigid-silence tests use the SAME two configs, so sharing halves
# this module's system compiles (round-4 VERDICT item 7 — suite time).
_SYSTEMS: dict = {}


def _run(seq, consensus: bool):
    cfg = SlamConfig().override(
        **{
            "backend.enabled": False,
            "tracking.consensus": consensus,
            # Pin the reference's every-frame fusion cadence: this test
            # compares consensus ON vs OFF on a deliberately short,
            # chaotic clip (see the comment in the walking-mover test),
            # and the fuse_every=2 default shifts keyframe-switch timing
            # enough to reshuffle the off-run's luck. The cadence's own
            # accuracy evidence lives in the 60-frame gauntlet A/B
            # (walking mover 34 mm with fuse2 vs 55 without).
            "fusion.fuse_every": 1,
        }
    )
    key = cfg.config_hash()
    slam = _SYSTEMS.get(key)
    if slam is None:
        slam = SlamSystem(INTR, cfg)
        _SYSTEMS[key] = slam
    else:
        slam.reset()
    slam.feed(list(seq.frames()))
    slam.finish()
    gt0 = np.linalg.inv(seq.gt_poses[0])
    ate = absolute_trajectory_error(
        [gt0 @ T for T in seq.gt_poses], slam.poses()
    )
    fracs = [s.get("consensus_frac", 0.0) for s in slam.stats]
    return ate["rmse"], fracs, list(slam.stats)


# ---------------------------------------------------------------------------
# Unit level: analyze() picks the pixel-count majority, not the
# information-dominant minority.


def test_analyze_pixel_majority_wins():
    from rgbid_tpu.tracking import consensus as cons
    import jax.numpy as jnp

    K = 6
    # Strata 0-3: static scene, small corrections, 70% of pixels.
    # Stratum 4: the mover — HUGE information, 25% of pixels, large delta.
    # Stratum 5: nearly empty (no vote).
    nk = jnp.asarray([2000.0, 1500.0, 1800.0, 1700.0, 2500.0, 50.0])
    deltas_true = [
        [0.0002, 0.0, 0.0, 0.0, 0.0, 0.0],
        [0.0, 0.0003, 0.0, 0.0, 0.0, 0.0],
        [-0.0002, 0.0, 0.0001, 0.0, 0.0, 0.0],
        [0.0001, -0.0001, 0.0, 0.0, 0.0, 0.0],
        [0.02, 0.01, 0.0, 0.0, 0.0, 0.0],  # mover: 2 cm drag
        [0.0, 0.0, 0.0, 0.0, 0.0, 0.0],
    ]
    info = [1e4, 1e4, 1e4, 1e4, 1e6, 1e2]  # mover dominates information
    Hk = jnp.stack([i * jnp.eye(6) for i in info]) * nk[:, None, None]
    bk = jnp.stack(
        [
            Hk[k] @ jnp.asarray(deltas_true[k]) / nk[k] * nk[k]
            for k in range(K)
        ]
    )
    # Geometry Gram: ~1e4 px^2 per unit twist for every stratum (the
    # flow metric then reads 100 px per metre — VGA-scale), and aligned
    # per-pixel errors well under the outlier floor.
    Gk = jnp.stack([1e4 * jnp.eye(6)] * K) * nk[:, None, None]
    ek = 0.1 * nk
    res = cons.analyze(Hk, bk, nk, Gk, ek, tol=0.4, min_frac=0.03)
    dec = cons.decide(
        res, jnp.full((K,), 10.0), nk, trigger_frac=0.03, max_frac=0.4
    )
    assert bool(dec.triggered)
    member = np.asarray(dec.member)
    assert member[4] == 0.0  # the mover is voted out
    np.testing.assert_array_equal(member[:4], 1.0)  # static strata kept
    assert member[5] == 1.0  # non-voters are never excluded
    assert 0.2 < float(dec.excluded_frac) < 0.3
    # Persistence gate: with too-short history the verdict must NOT act.
    dec0 = cons.decide(
        res, jnp.ones(K), nk, trigger_frac=0.03, max_frac=0.4
    )
    assert not bool(dec0.triggered)
    np.testing.assert_array_equal(np.asarray(dec0.member), 1.0)


def test_analyze_static_scene_no_trigger():
    from rgbid_tpu.tracking import consensus as cons
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    nk = jnp.asarray(rng.uniform(500, 3000, 6).astype(np.float32))
    deltas = jnp.asarray(rng.normal(0, 3e-4, (6, 6)).astype(np.float32))
    Hk = jnp.stack([1e4 * jnp.eye(6)] * 6) * nk[:, None, None]
    bk = jnp.einsum("kij,kj->ki", Hk / nk[:, None, None], deltas) * nk[:, None]
    Gk = jnp.stack([1e4 * jnp.eye(6)] * 6) * nk[:, None, None]
    ek = 0.1 * nk
    res = cons.analyze(Hk, bk, nk, Gk, ek, tol=0.4, min_frac=0.03)
    dec = cons.decide(res, jnp.full((6,), 10.0), nk, trigger_frac=0.03, max_frac=0.4)
    assert not bool(dec.triggered)
    np.testing.assert_array_equal(np.asarray(dec.member), 1.0)


def test_analyze_error_outlier_excludes_fast_mover():
    """A basin-escaped mover cannot vote (b ~ 0) but its weighted error
    saturates — the error-outlier test must still exclude it."""
    from rgbid_tpu.tracking import consensus as cons
    import jax.numpy as jnp

    nk = jnp.asarray([2000.0, 1800.0, 2200.0, 900.0, 0.0, 0.0])
    Hk = jnp.stack([1e4 * jnp.eye(6)] * 6) * jnp.maximum(nk, 1)[:, None, None]
    bk = jnp.zeros((6, 6))  # everyone "converged" (the fast mover's b
    # decorrelated to noise; statics genuinely converged)
    Gk = jnp.stack([1e4 * jnp.eye(6)] * 6) * jnp.maximum(nk, 1)[:, None, None]
    ek = jnp.asarray([0.1, 0.15, 0.12, 4.8, 0.0, 0.0]) * jnp.maximum(nk, 1)
    res = cons.analyze(Hk, bk, nk, Gk, ek, tol=0.4, min_frac=0.03)
    dec = cons.decide(res, jnp.full((6,), 10.0), nk, trigger_frac=0.03, max_frac=0.4)
    assert bool(dec.triggered)
    member = np.asarray(dec.member)
    assert member[3] == 0.0  # saturated-error stratum excluded
    np.testing.assert_array_equal(member[:3], 1.0)


def test_stratum_masks_roundtrip():
    from rgbid_tpu.tracking import consensus as cons
    import jax.numpy as jnp

    edges = cons.stratum_edges(0.1, 3.4, 6)
    assert edges.shape == (7,)
    xi = jnp.asarray([[0.05, 0.15, 0.7, 3.0], [1.0, 2.0, 3.39, 5.0]], jnp.float32)
    mask = jnp.ones_like(xi)
    oh = cons.stratum_onehot(xi, mask, edges)
    assert oh.shape == (6, 2, 4)
    np.testing.assert_allclose(np.asarray(oh.sum(0)), 1.0)  # partition
    member = jnp.asarray([1.0, 0.0, 1.0, 1.0, 1.0, 1.0])
    keep = cons.member_mask(xi, mask, edges, member)
    idx = np.asarray(cons.stratum_index(xi, edges))
    np.testing.assert_array_equal(np.asarray(keep), np.asarray(member)[idx])


# ---------------------------------------------------------------------------
# System level.


@pytest.fixture(scope="module")
def near_mover_seq():
    # Near-field panel at WALKING speed (0.015 m/frame = 0.45 m/s at
    # 30 Hz): the realistic dynamic-scene regime (TUM fr3/walking-class),
    # where the mover stays within the coarse-level linearization basin
    # and the consensus vote can see it. The gauntlet's ballistic variant
    # (2.6 m sweep in 60 frames) remains the documented outer limit.
    return synthetic.generate_sequence(
        n_frames=40,
        intr=INTR,
        motion="orbit",
        trans_amp=0.25,
        rot_amp=0.08,
        xi_noise_sigma=0.005,
        moving_occluder=True,
        occluder_z=1.4,
        occluder_speed=0.015,
        seed=1,
    )


def test_consensus_rejects_walking_speed_near_mover(near_mover_seq):
    ate_off, _, _ = _run(near_mover_seq, consensus=False)
    ate_on, fracs, _ = _run(near_mover_seq, consensus=True)
    # The mechanism must actually fire while the panel dominates...
    assert max(fracs) > 0.05
    # ...and improve the trajectory meaningfully with an absolute cap.
    # The consensus-off number on this short clip swings with the chaos
    # of keyframe-switch timing (16-63 mm observed across tunings), so
    # the strong-separation claim lives in the 60-frame gauntlet row
    # (moving_occluder_near_walking: 192.7 mm off -> 46.4 mm on); here we
    # pin firing + improvement + a hard ceiling.
    assert ate_on < 0.8 * ate_off, (ate_on, ate_off)
    assert ate_on < 0.025, ate_on


def test_consensus_handles_two_independent_movers():
    """TWO simultaneous walking-speed movers in different depth strata
    (z 1.35 sweeping left-to-right, z 2.3 sweeping right-to-left — the
    renderer's moving_occluder2): the depth-stratified vote's two-front
    regime, and the scenario the scoped streak transfer exists for
    (tracker.py: an accepted probe must only touch the involved strata,
    or the second mover's streak is knocked back every probe frame).
    Measured (seed 3, this clip): consensus ON 35.6 mm / OFF 115.4 mm,
    both movers' strata flagged in the same frame (cons_flags 2), a
    persistent episode forms, zero losses."""
    seq = synthetic.generate_sequence(
        n_frames=40,
        intr=INTR,
        motion="orbit",
        trans_amp=0.25,
        rot_amp=0.08,
        xi_noise_sigma=0.005,
        moving_occluder=True,
        occluder_z=1.35,
        occluder_speed=0.018,
        moving_occluder2=True,
        occluder2_z=2.3,
        occluder2_speed=-0.018,
        seed=3,
    )
    ate_off, _, _ = _run(seq, consensus=False)
    ate_on, _, stats = _run(seq, consensus=True)
    assert not any(s.get("lost") for s in stats)
    # Both movers' strata flagged simultaneously at least once.
    assert max(s.get("cons_flags", 0) for s in stats) >= 2, [
        s.get("cons_flags", 0) for s in stats
    ]
    # At least one episode ripens to persistence.
    assert max(s.get("cons_flags_persist", 0) for s in stats) >= 1
    # The two-front scene must still track: hard ceiling + clear
    # improvement over consensus-off (measured 3.2x; the off-arm swings
    # with keyframe-switch chaos, so the bound is conservative).
    assert ate_on < 0.075, ate_on
    assert ate_on < 0.6 * ate_off, (ate_on, ate_off)


def test_consensus_silent_on_rigid_scene():
    seq = synthetic.generate_sequence(
        n_frames=16,
        intr=INTR,
        motion="orbit",
        trans_amp=0.25,
        rot_amp=0.08,
        xi_noise_sigma=0.005,
        seed=2,
    )
    ate_off, _, _ = _run(seq, consensus=False)
    ate_on, fracs, _ = _run(seq, consensus=True)
    assert max(fracs) == 0.0  # never triggered
    # Identical trajectory (the refit branch never ran).
    np.testing.assert_allclose(ate_on, ate_off, atol=1e-6)


def test_streak_counts_safe_to_thread_from_cold_start():
    """cons_prev=None waives the in-frame persistence gates via a
    sentinel history (100); the RETURNED counts must be computed from a
    ZERO history — a caller threading them into the next frame must not
    start every stratum past the episode gate (which would mask the
    whole template and silently freeze the pose; code-review round 3)."""
    import jax.numpy as jnp

    from rgbid_tpu.core.config import FusionConfig, TrackingConfig
    from rgbid_tpu.mapping.keyframe import create_device_keyframe
    from rgbid_tpu.tracking.frames import preprocess_frame
    from rgbid_tpu.tracking.tracker import Tracker

    seq = synthetic.generate_sequence(
        n_frames=3, intr=INTR, motion="orbit", trans_amp=0.15,
        rot_amp=0.05, seed=0,
    )
    pyr0 = preprocess_frame(
        jnp.asarray(seq.rgb[0]), jnp.asarray(seq.depth[0]), 3, esm=True
    )
    kf = create_device_keyframe(pyr0, INTR, FusionConfig(), jacobian="esm")
    cfg = TrackingConfig(
        levels=3, iters=(4, 8, 16), jacobian="esm", kernel="xla",
        consensus=True,
    )
    tr = Tracker(INTR, cfg)
    p1 = preprocess_frame(
        jnp.asarray(seq.rgb[1]), jnp.asarray(seq.depth[1]), 3, esm=True
    )
    r1 = tr.track(kf.levels, p1, jnp.eye(4))
    assert np.asarray(r1.cons_excluded).max() < 99  # sentinel must not leak
    p2 = preprocess_frame(
        jnp.asarray(seq.rgb[2]), jnp.asarray(seq.depth[2]), 3, esm=True
    )
    r2 = tr.track(kf.levels, p2, r1.T, cons_prev=r1.cons_excluded)
    assert float(r2.n_valid[0]) > 1000  # template not masked away
    assert np.isfinite(np.asarray(r2.T)).all()


def test_analyze_hostage_by_information_dominance():
    """Established-drag signature: the pose rides an ALIGNED pixel
    minority with information dominance while the majority decorrelates.
    The hostage must be named by dominance (info share >> pixel share),
    NOT by argmin error — the far background has the naturally lowest
    error and the larger pixel count (the measured ballistic failure:
    argmin landed on a 49%-pixel far band and no rescue ever fired)."""
    from rgbid_tpu.tracking import consensus as cons
    import jax.numpy as jnp

    K = 6
    # Stratum 1: FAR background — most pixels, tiny information, tiny
    # error (distant pixels barely respond to pose error).
    # Stratum 2: mid background — decorrelating (dragged majority).
    # Stratum 3: the mover holding the pose — 18% of pixels, dominant
    # information, LOW error (it is aligned; the pose is locked to it).
    nk = jnp.asarray([0.0, 4900.0, 3300.0, 1800.0, 0.0, 0.0])
    info = [0.0, 2e3, 8e3, 2e5, 0.0, 0.0]  # per-pixel J^T W J scale
    Hk = jnp.stack([i * jnp.eye(6) for i in info]) * nk[:, None, None]
    bk = jnp.zeros((K, 6))
    Gk = jnp.stack([1e4 * jnp.eye(6)] * K) * nk[:, None, None]
    # Per-pixel errors: far 0.07 (lowest!), mid 0.9 (decorrelating),
    # mover 0.15 (aligned).
    ek = jnp.asarray([0.0, 0.07, 0.9, 0.15, 0.0, 0.0]) * nk
    res = cons.analyze(Hk, bk, nk, Gk, ek, tol=0.4, min_frac=0.03)
    hostage = np.asarray(res.hostage)
    assert hostage[3] == 1.0, hostage  # the dominant aligned minority
    assert hostage[1] == 0.0  # NOT the low-error far background
    # A live hostage explains the majority's decorrelation: the err
    # path must not flag the dragged static majority that frame.
    assert np.asarray(res.excluded)[2] == 0.0
    # decide() with a ripe streak turns it into a rescue.
    dec = cons.decide(
        res, jnp.asarray([0.0, 0.0, 0.0, 5.0, 0.0, 0.0]), nk,
        trigger_frac=0.03, max_frac=0.4,
    )
    assert bool(dec.rescue)
    assert np.asarray(dec.member)[3] == 0.0


def test_analyze_two_voter_votes_never_flag():
    """With two ~50/50 voters there is no majority to appeal to: vote
    disagreements must not reach `excluded` (they fed the streak counter
    and the episode mask — measured: a 7-frame streak on a 47%-pixel
    STATIC band crippled the next founded template, +82 mm in one
    frame)."""
    from rgbid_tpu.tracking import consensus as cons
    import jax.numpy as jnp

    K = 6
    nk = jnp.asarray([0.0, 4700.0, 5300.0, 0.0, 0.0, 0.0])
    # The two bands prefer clearly different corrections (wide-baseline
    # aging split) — flow disagreement far beyond tol.
    deltas = jnp.zeros((K, 6)).at[1, 0].set(0.02).at[2, 0].set(-0.02)
    info = 1e4
    Hk = jnp.stack([info * jnp.eye(6)] * K) * nk[:, None, None]
    bk = jnp.einsum("kij,kj->ki", Hk, deltas) / jnp.maximum(nk, 1.0)[:, None]
    bk = bk * nk[:, None]
    Gk = jnp.stack([1e4 * jnp.eye(6)] * K) * nk[:, None, None]
    ek = 0.1 * nk  # healthy errors — only the vote path could fire
    res = cons.analyze(Hk, bk, nk, Gk, ek, tol=0.4, min_frac=0.03)
    assert not bool(res.majority_ok)
    np.testing.assert_array_equal(np.asarray(res.excluded), 0.0)


def test_analyze_exposes_dominance_candidates():
    """`ConsensusResult.dominant` must name information-dominant pixel-
    MINORITY voter strata (the attack-probe candidate pool) and stay
    silent on majority or low-density strata."""
    from rgbid_tpu.tracking import consensus as cons
    import jax.numpy as jnp

    K = 6
    # Stratum 1: far majority (47%), low information density.
    # Stratum 2: mid static (32%), ~proportional information.
    # Stratum 3: near minority (21%), 3x information density.
    nk = jnp.asarray([0.0, 4700.0, 3200.0, 2100.0, 0.0, 0.0])
    info = [0.0, 4e3, 1e4, 3e4, 0.0, 0.0]
    Hk = jnp.stack([i * jnp.eye(6) for i in info]) * nk[:, None, None]
    bk = jnp.zeros((K, 6))
    Gk = jnp.stack([1e4 * jnp.eye(6)] * K) * nk[:, None, None]
    ek = 0.1 * nk
    res = cons.analyze(Hk, bk, nk, Gk, ek, tol=0.4, min_frac=0.03)
    dom = np.asarray(res.dominant)
    assert dom[3] == 1.0, dom
    np.testing.assert_array_equal(dom[[0, 1, 2, 4, 5]], 0.0)
    share = np.asarray(res.info_share)
    assert abs(share.sum() - 1.0) < 1e-5
    assert share[3] > 0.5  # 21% of pixels, >50% of the information


def test_attack_probe_arrests_ballistic_onset():
    """The round-4 ballistic-onset fix (see TrackingConfig.attack_probe
    and BASELINE.md round-4 forensics). The BALLISTIC near mover (the
    panel crossing at ~0.11 m/frame) locks the coarse solve within one
    frame of onset; pre-probe the system lost ~50 mm/frame for the
    3-4 frames the persistence gate needs (QVGA drift 52 -> 318 mm over
    f25-f30 of this exact clip). The probe must (a) fire and correct the
    onset frames, and (b) hand the streak to the attacker so the episode
    mask ripens on the MOVER, keeping drift arrested through transit.

    Measured with the probe (CPU, this clip): drift <= 30 mm through
    f45, raw RMSE ~20 mm. Bound set at 2x+ headroom; the unprotected
    number (151.9 mm full-clip ATE, gauntlet row) is pinned in
    BASELINE.md rather than re-run here (it costs a second compile)."""
    seq = synthetic.generate_sequence(
        n_frames=60,  # trajectory phase scales with n_frames: render the
        intr=INTR,    # full gauntlet clip, feed only through transit
        motion="orbit",
        trans_amp=0.25,
        rot_amp=0.08,
        xi_noise_sigma=0.005,
        moving_occluder=True,
        occluder_z=1.4,
        seed=3,
    )
    frames = list(seq.frames())[:42]
    cfg = SlamConfig().override(
        **{
            "backend.enabled": False,
            "tracking.attack_probe": True,
        }
    )
    slam = SlamSystem(INTR, cfg)
    slam.feed(frames)
    slam.finish()
    gt0 = np.linalg.inv(seq.gt_poses[0])
    ate = absolute_trajectory_error(
        [gt0 @ T for T in seq.gt_poses[:42]], slam.poses()
    )
    # The probe's accepted corrections surface as rescue frames.
    assert any(s.get("rescue") for s in slam.stats), "probe never fired"
    assert ate["rmse"] < 0.060, ate["rmse"]
