"""Full-SLAM endurance runs.

A 100-frame loop with the backend on runs in the DEFAULT suite (round-2
then round-3 VERDICT: lifecycle regressions — memory growth, pose-rebase
drift over repeated loop closures — must not be able to land silently
behind an opt-in gate, and the default suite must cover >=100 frames).
A 200-frame version stays behind RUN_SLOW=1.
"""

import os

import numpy as np
import pytest

from rgbid_tpu.core.camera import Intrinsics
from rgbid_tpu.core.config import SlamConfig
from rgbid_tpu.datasets import synthetic
from rgbid_tpu.eval import absolute_trajectory_error, relative_pose_error
from rgbid_tpu.system import SlamSystem

INTR = Intrinsics(fx=258.6, fy=258.2, cx=159.3, cy=127.6, width=320, height=240)


def _endurance_cfg():
    return SlamConfig().override(
        **{
            "tracking.levels": 3,
            "tracking.iters": (2, 8, 16),
            "keyframe.max_translation": 0.15,
            "keyframe.max_rotation": 0.15,
            "backend.enabled": True,
            "backend.min_keyframe_gap": 5,
            "backend.reloc_level": 1,
            "backend.min_score": 0.05,
        }
    )


def _run(n_frames: int):
    seq = synthetic.generate_sequence(
        n_frames=n_frames, intr=INTR, motion="loop", radius=0.5, rot_amp=0.15,
        xi_noise_sigma=0.004, seed=3,
    )
    slam = SlamSystem(INTR, _endurance_cfg())
    slam.feed(list(seq.frames()))
    slam.finish()
    gt0 = np.linalg.inv(seq.gt_poses[0])
    gt = [gt0 @ T for T in seq.gt_poses]
    return seq, slam, gt


def test_100_frame_loop_with_backend():
    """Default-suite endurance: full pipeline (flights, fusion, loop
    closure, live pose publication) over a 100-frame closed loop
    (BASELINE.json config 2's clip length)."""
    seq, slam, gt = _run(100)
    ate = absolute_trajectory_error(gt, slam.poses())
    rpe = relative_pose_error(gt, slam.poses())
    assert ate["rmse"] < 0.015, ate
    assert rpe["trans_rmse"] < 0.006, rpe
    assert not any(r.get("lost") for r in slam.stats)
    assert len(slam.manager.keyframes) >= 8
    assert slam.backend.num_loop_closures >= 1
    cloud = slam.map_points(voxel=0.02)
    assert len(cloud) > 20000
    # Map is colored (keyframes carry the founding frame's RGB).
    assert cloud[:, 3:].std(axis=0).min() > 0.01


@pytest.mark.skipif(not os.environ.get("RUN_SLOW"), reason="set RUN_SLOW=1")
def test_200_frame_loop_with_backend():
    seq, slam, gt = _run(200)
    ate = absolute_trajectory_error(gt, slam.poses())
    rpe = relative_pose_error(gt, slam.poses())
    assert ate["rmse"] < 0.015, ate
    assert rpe["trans_rmse"] < 0.006, rpe
    assert not any(r.get("lost") for r in slam.stats)
    assert len(slam.manager.keyframes) >= 8
    assert slam.backend.num_loop_closures >= 1
