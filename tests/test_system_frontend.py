"""SlamSystem front end (tracking + fusion + keyframe lifecycle) on a
synthetic sequence — BASELINE.json configs 2+3 at system level.
"""

import numpy as np
import pytest

from rgbid_tpu.core.camera import Intrinsics
from rgbid_tpu.core.config import SlamConfig
from rgbid_tpu.datasets import synthetic
from rgbid_tpu.eval import absolute_trajectory_error, relative_pose_error
from rgbid_tpu.system import SlamSystem

INTR = Intrinsics(fx=258.6, fy=258.2, cx=159.3, cy=127.6, width=320, height=240)


def _config():
    return SlamConfig().override(
        **{
            "tracking.levels": 3,
            "tracking.iters": (4, 8, 16),
            "backend.enabled": False,
        }
    )


@pytest.fixture(scope="module")
def run():
    seq = synthetic.generate_sequence(
        n_frames=25,
        intr=INTR,
        motion="orbit",
        trans_amp=0.35,
        rot_amp=0.1,
        xi_noise_sigma=0.004,
        seed=1,
    )
    slam = SlamSystem(INTR, _config())
    for f in seq.frames():
        slam.process_frame(f.rgb, f.depth, f.timestamp)
    slam.finish()
    return seq, slam


def test_trajectory_accuracy(run):
    seq, slam = run
    gt = [np.linalg.inv(seq.gt_poses[0]) @ T for T in seq.gt_poses]
    est = slam.poses()
    assert len(est) == len(gt)
    ate = absolute_trajectory_error(gt, est)
    assert ate["rmse"] < 0.01  # < 1 cm on a 25-frame noisy clip
    rpe = relative_pose_error(gt, est)
    assert rpe["trans_rmse"] < 0.005


def test_no_lost_frames(run):
    _, slam = run
    assert not any(r.get("lost") for r in slam.stats)


def test_keyframes_created_and_finalized(run):
    _, slam = run
    kfs = slam.manager.keyframes
    # Motion amplitude forces at least one switch on this clip.
    assert len(kfs) >= 2
    for kf in kfs:
        assert kf.cloud is not None and len(kf.cloud) > 1000
        assert kf.reloc_planes is not None
    # Odometry edges connect consecutive keyframes.
    assert len(slam.manager.edges) == len(kfs) - 1
    for e in slam.manager.edges:
        assert e.to_id == e.from_id + 1
        assert np.all(np.isfinite(e.information))


def test_fusion_active_between_switches(run):
    _, slam = run
    fused = [r["n_fused"] for r in slam.stats if "n_fused" in r and not r["switch"]]
    assert len(fused) > 5
    assert np.median(fused) > 10000  # most pixels fuse on non-switch frames


def test_map_and_trajectory_export(run, tmp_path):
    _, slam = run
    from rgbid_tpu.eval.metrics import trajectory_from_tum_rows
    from rgbid_tpu.mapping.export import read_ply, read_tum_trajectory

    traj_path = str(tmp_path / "traj.txt")
    map_path = str(tmp_path / "map.ply")
    slam.save_trajectory(traj_path)
    slam.save_map(map_path, voxel=0.01)

    rows = read_tum_trajectory(traj_path)
    assert rows.shape[0] == len(slam.poses())
    ts, poses = trajectory_from_tum_rows(rows)
    for T_file, T_mem in zip(poses, slam.poses()):
        np.testing.assert_allclose(T_file, T_mem, atol=1e-4)

    cloud = read_ply(map_path)
    assert len(cloud) > 5000
    # Points live in front of the origin camera, within the scene bounds.
    assert np.percentile(cloud[:, 2], 5) > 0.5
    assert np.percentile(cloud[:, 2], 95) < 8.0


def test_pcd_export_round_trip(run, tmp_path):
    """PCD export (SURVEY.md §2.1 'saves PLY/PCD'): binary x/y/z/rgb PCD
    round-trips bit-exact in xyz and to u8 resolution in color, and
    save_map picks the format from the extension."""
    _, slam = run
    from rgbid_tpu.mapping.export import read_pcd, read_ply

    pcd_path = str(tmp_path / "map.pcd")
    ply_path = str(tmp_path / "map.ply")
    slam.save_map(pcd_path, voxel=0.01)
    slam.save_map(ply_path, voxel=0.01)
    a = read_pcd(pcd_path)
    b = read_ply(ply_path)
    assert a.shape == b.shape and len(a) > 5000
    np.testing.assert_allclose(a[:, :3], b[:, :3], atol=0)
    # Both writers quantize color to u8, so they must agree exactly.
    np.testing.assert_allclose(a[:, 3:], b[:, 3:], atol=1e-6)


def test_reset_is_deterministic():
    """reset() must produce a system indistinguishable from a fresh one:
    feeding the same clip twice through one system (reset between) gives
    bit-identical trajectories — the invariant the gauntlet's
    compiled-system reuse and bench.py's churn variant rely on."""
    seq = synthetic.generate_sequence(
        n_frames=12, intr=INTR, motion="orbit", trans_amp=0.25,
        rot_amp=0.08, xi_noise_sigma=0.004, seed=5,
    )
    frames = list(seq.frames())
    slam = SlamSystem(INTR, _config().override(pipeline_depth=4))
    slam.feed(frames)
    slam.finish()
    first = [T.copy() for T in slam.poses()]
    n_kf_first = len(slam.manager.keyframes)
    slam.reset()
    assert slam.poses() == [] and slam.stats == []
    slam.feed(frames)
    slam.finish()
    second = slam.poses()
    assert len(first) == len(second) == len(frames)
    assert len(slam.manager.keyframes) == n_kf_first
    for a, b in zip(first, second):
        np.testing.assert_array_equal(a, b)
