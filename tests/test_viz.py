"""Offline visualization renders (headless GUI replacement)."""

import numpy as np

from rgbid_tpu.utils import viz


def test_frame_panel_and_colormaps(tmp_path):
    h, w = 60, 80
    rng = np.random.default_rng(0)
    intensity = rng.uniform(0, 1, (h, w)).astype(np.float32)
    xi = rng.uniform(0.1, 1.5, (h, w)).astype(np.float32)
    mask = np.ones((h, w), np.float32)
    mask[:10] = 0
    panel = viz.frame_panel(intensity, xi, mask, str(tmp_path / "panel.png"))
    assert panel.shape == (h, 2 * w, 3)
    assert (tmp_path / "panel.png").exists()
    r = viz.residual_image(intensity, intensity * 0.9, mask)
    assert r.shape == (h, w, 3)
    assert np.all(r[:10] == 0)  # invalid zone blacked out


def test_trajectory_and_map_plots(tmp_path):
    poses = []
    for i in range(20):
        T = np.eye(4)
        T[:3, 3] = [np.sin(i / 5), 0.0, i * 0.1]
        poses.append(T)
    viz.plot_trajectory(
        [("est", poses)], str(tmp_path / "traj.png"), keyframe_poses=poses[::5]
    )
    assert (tmp_path / "traj.png").stat().st_size > 5000
    cloud = np.random.default_rng(1).uniform(0, 1, (5000, 6)).astype(np.float32)
    viz.plot_map_topdown(cloud, str(tmp_path / "map.png"))
    assert (tmp_path / "map.png").stat().st_size > 5000
