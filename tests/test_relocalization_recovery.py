"""Tracking-loss recovery: global relocalization against the BoW database
(the reference's only failure-recovery mechanism, SURVEY.md §5).
"""

import numpy as np
import pytest

from rgbid_tpu.core.camera import Intrinsics
from rgbid_tpu.core.config import SlamConfig
from rgbid_tpu.datasets import synthetic
from rgbid_tpu.system import SlamSystem

INTR = Intrinsics(fx=258.6, fy=258.2, cx=159.3, cy=127.6, width=320, height=240)


def test_relocalizes_after_sensor_dropout():
    cfg = SlamConfig().override(
        **{
            "tracking.levels": 3,
            "tracking.iters": (4, 8, 16),
            "keyframe.max_translation": 0.12,
            "keyframe.max_rotation": 0.12,
            "backend.enabled": True,
            "backend.min_keyframe_gap": 3,
            "backend.reloc_level": 1,
            "backend.reloc_iters": 16,
            "backend.min_score": 0.02,
            "backend.reloc_after_lost": 2,
        }
    )
    seq = synthetic.generate_sequence(
        n_frames=16,
        intr=INTR,
        motion="orbit",
        trans_amp=0.35,
        rot_amp=0.1,
        xi_noise_sigma=0.003,
        seed=2,
    )
    slam = SlamSystem(INTR, cfg)
    # Phase 1: 12 good frames -> several keyframes in the BoW database.
    for i in range(12):
        slam.process_frame(seq.rgb[i], seq.depth[i], seq.timestamps[i])
    n_kfs_before = len(slam.manager.keyframes)
    assert n_kfs_before >= 3
    # Give the backend thread a moment to ingest the finalized keyframes.
    import time

    deadline = time.time() + 30
    while time.time() < deadline and slam.backend._queue.qsize() > 0:
        time.sleep(0.1)

    # Phase 2: sensor dropout (all-invalid depth + noise image) -> lost.
    rng = np.random.default_rng(0)
    noise_rgb = rng.integers(0, 255, seq.rgb[0].shape, dtype=np.uint8)
    zero_depth = np.zeros_like(seq.depth[0])
    for k in range(3):
        slam.process_frame(noise_rgb, zero_depth, 1.0 + 0.03 * k)
    assert slam.stats[-1]["lost"]
    assert not slam.stats[-1].get("relocalized", False)

    # Phase 3: drive the recovery path directly with a frame showing an
    # early view. (End-to-end the tracker often re-acquires by itself on
    # this synthetic scene — its convergence basin is wide — so the
    # trigger condition is exercised above and the recovery machinery
    # here.)
    import jax.numpy as jnp

    from rgbid_tpu.tracking.step import pack_frame

    packed = jnp.asarray(pack_frame(seq.rgb[2], seq.depth[2], slam.config))
    T_back = slam._try_relocalize(seq.rgb[2], seq.depth[2], 2.0, packed)
    assert T_back is not None
    # Recovered world pose close to the ground-truth pose of frame 2.
    gt = np.linalg.inv(seq.gt_poses[0]) @ seq.gt_poses[2]
    err = np.linalg.norm(T_back[:3, 3] - gt[:3, 3])
    assert err < 0.03, err
    # A fresh keyframe exists and tracking resumes cleanly against it
    # (relocalization reset the device motion state to identity).
    assert len(slam.manager.keyframes) == n_kfs_before + 1
    T_next = slam.process_frame(seq.rgb[3], seq.depth[3], 2.1)
    assert not slam.stats[-1]["lost"]
    gt3 = np.linalg.inv(seq.gt_poses[0]) @ seq.gt_poses[3]
    assert np.linalg.norm(T_next[:3, 3] - gt3[:3, 3]) < 0.03
    slam.finish()
    # The recovery edge entered the pose graph.
    assert slam.backend.num_loop_closures >= 1
