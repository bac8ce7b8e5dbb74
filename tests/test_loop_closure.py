"""Full back-end integration: loop detection -> batched verification ->
pose-graph optimization -> trajectory rebase (BASELINE.json config 4).
"""

import numpy as np
import pytest

from rgbid_tpu.core.camera import Intrinsics
from rgbid_tpu.core.config import SlamConfig
from rgbid_tpu.datasets import synthetic
from rgbid_tpu.eval import absolute_trajectory_error
from rgbid_tpu.system import SlamSystem

INTR = Intrinsics(fx=258.6, fy=258.2, cx=159.3, cy=127.6, width=320, height=240)


@pytest.fixture(scope="module")
def run():
    # A closed loop with noisy depth (odometry drifts a little), revisiting
    # the start. Tight keyframe thresholds -> enough keyframes for the BoW
    # temporal gap.
    cfg = SlamConfig().override(
        **{
            "tracking.levels": 3,
            "tracking.iters": (4, 8, 16),
            "keyframe.max_translation": 0.12,
            "keyframe.max_rotation": 0.12,
            "keyframe.min_overlap": 0.80,
            "backend.enabled": True,
            "backend.min_keyframe_gap": 5,
            "backend.reloc_level": 1,
            "backend.reloc_iters": 16,
            "backend.min_score": 0.05,
        }
    )
    seq = synthetic.generate_sequence(
        n_frames=40,
        intr=INTR,
        motion="loop",
        radius=0.5,
        rot_amp=0.15,
        xi_noise_sigma=0.004,
        seed=2,
    )
    slam = SlamSystem(INTR, cfg)
    for f in seq.frames():
        slam.process_frame(f.rgb, f.depth, f.timestamp)
    slam.finish()
    return seq, slam


def test_loop_closures_found(run):
    _, slam = run
    assert slam.backend is not None
    assert slam.backend.num_loop_closures >= 1
    # Every accepted loop edge connects temporally distant keyframes.
    for e in slam.backend._loop_edges:
        assert e["to_id"] - e["from_id"] >= 5
        assert np.all(np.isfinite(e["T_rel"]))


def test_pose_graph_ran_and_reduced_error(run):
    _, slam = run
    res = getattr(slam.backend, "last_result", None)
    assert res is not None, "pose graph never ran"
    assert res["final_error"] <= res["initial_error"] + 1e-12


def test_trajectory_still_accurate_after_optimization(run):
    seq, slam = run
    gt0 = np.linalg.inv(seq.gt_poses[0])
    gt = [gt0 @ T for T in seq.gt_poses]
    ate = absolute_trajectory_error(gt, slam.poses())
    assert ate["rmse"] < 0.012


def test_backend_stats_sane(run):
    _, slam = run
    lc = slam.backend.loop_closer
    assert lc.n_queries == len(slam.manager.keyframes)
    assert lc.n_accepted <= lc.n_candidates


def test_midrun_pose_publication(run):
    """Corrected poses are applied LIVE (consume-once), not only at finish:
    injecting an update rebases the active keyframe, the recorded
    trajectory, and the motion-model state on the next frame."""
    from rgbid_tpu.reference_cpu import se3_np

    seq, slam = run
    active = slam.manager.active
    old_T = active.T_wk.copy()
    corr = se3_np.exp(np.array([0.05, -0.02, 0.01, 0.0, 0.01, 0.0]))
    with slam.backend._lock:
        slam.backend._optimized = {active.kf_id: corr @ old_T}
    traj_before = slam.poses()[-1].copy()
    slam.process_frame(seq.rgb[-1], seq.depth[-1], 99.0)
    np.testing.assert_allclose(active.T_wk, corr @ old_T, atol=1e-12)
    # Consumed: no pending updates remain.
    assert not slam.backend.has_updates()
    # Past trajectory entries associated with this keyframe were rebased.
    # (the pre-update last pose was tracked against `active`)
    rebased = corr @ traj_before
    np.testing.assert_allclose(slam.poses()[-2], rebased, atol=1e-9)


def test_optimize_tolerates_concurrent_keyframe_append(run):
    """Race regression (ADVICE r1): an edge referencing a keyframe appended
    AFTER the pose snapshot must be dropped, not crash the backend thread."""
    _, slam = run
    backend = slam.backend
    n = len(slam.manager.keyframes)
    # Simulate the front end racing in a new keyframe + odometry edge
    # between the pose snapshot and edge collection: an edge pointing past
    # the end of the pose list.
    bogus = {
        "from_id": n - 1,
        "to_id": n + 5,  # not yet in manager.keyframes
        "T_rel": np.eye(4),
        "information": np.eye(6),
    }
    backend._loop_edges.append(bogus)
    try:
        backend._optimize()  # must not raise
        assert backend.has_updates()
    finally:
        backend._loop_edges.remove(bogus)
        backend.take_updates()
