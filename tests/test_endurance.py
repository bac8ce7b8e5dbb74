"""100-frame full-SLAM endurance run (BASELINE.json config 2's clip length).

Slow (~4 min on CPU): enabled with RUN_SLOW=1; the default suite stays fast.
"""

import os

import numpy as np
import pytest

from rgbid_tpu.core.camera import Intrinsics
from rgbid_tpu.core.config import SlamConfig
from rgbid_tpu.datasets import synthetic
from rgbid_tpu.eval import absolute_trajectory_error, relative_pose_error
from rgbid_tpu.system import SlamSystem

pytestmark = pytest.mark.skipif(
    not os.environ.get("RUN_SLOW"), reason="set RUN_SLOW=1 for endurance tests"
)

INTR = Intrinsics(fx=258.6, fy=258.2, cx=159.3, cy=127.6, width=320, height=240)


def test_100_frame_loop_with_backend():
    cfg = SlamConfig().override(
        **{
            "tracking.levels": 3,
            "tracking.iters": (4, 8, 16),
            "keyframe.max_translation": 0.15,
            "keyframe.max_rotation": 0.15,
            "backend.enabled": True,
            "backend.min_keyframe_gap": 5,
            "backend.reloc_level": 1,
            "backend.min_score": 0.05,
        }
    )
    seq = synthetic.generate_sequence(
        n_frames=100, intr=INTR, motion="loop", radius=0.5, rot_amp=0.15,
        xi_noise_sigma=0.004, seed=3,
    )
    slam = SlamSystem(INTR, cfg)
    for f in seq.frames():
        slam.process_frame(f.rgb, f.depth, f.timestamp)
    slam.finish()

    gt0 = np.linalg.inv(seq.gt_poses[0])
    gt = [gt0 @ T for T in seq.gt_poses]
    ate = absolute_trajectory_error(gt, slam.poses())
    rpe = relative_pose_error(gt, slam.poses())
    assert ate["rmse"] < 0.015, ate
    assert rpe["trans_rmse"] < 0.006, rpe
    assert not any(r.get("lost") for r in slam.stats)
    assert len(slam.manager.keyframes) >= 8
    assert slam.backend.num_loop_closures >= 1
    cloud = slam.map_points(voxel=0.02)
    assert len(cloud) > 20000
