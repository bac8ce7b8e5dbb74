"""Live visualization: the periodic 3-pane snapshot renderer
(utils/live_view.py) and its SlamSystem integration (VizConfig)."""

import time

import numpy as np

from rgbid_tpu.core.camera import Intrinsics
from rgbid_tpu.core.config import SlamConfig
from rgbid_tpu.datasets import synthetic
from rgbid_tpu.utils.live_view import LiveViewer

INTR = Intrinsics(fx=130.0, fy=130.0, cx=79.5, cy=59.5, width=160, height=120)


def _snapshot(frame=0, with_cloud=True):
    rng = np.random.default_rng(frame)
    rgb = rng.integers(0, 255, (120, 160, 3), dtype=np.uint8)
    depth = rng.integers(2000, 20000, (120, 160), dtype=np.uint16)
    poses = []
    for i in range(frame + 2):
        T = np.eye(4)
        T[:3, 3] = [0.01 * i, 0.0, 0.02 * i]
        poses.append(T)
    snap = {
        "rgb": rgb,
        "depth": depth,
        "frame": frame,
        "n_keyframes": 2,
        "lost": False,
        "kf_rgb": rgb,
        "kf_depth": depth,
        "kf_id": 1,
        "poses": poses,
        "kf_poses": poses[::2],
    }
    if with_cloud:
        cloud = rng.uniform(0, 1, (500, 6)).astype(np.float32)
        snap["kf_clouds"] = [(np.eye(4), cloud), (poses[-1], cloud)]
    return snap


def test_live_viewer_renders_atomically(tmp_path):
    v = LiveViewer(str(tmp_path), history=True, map_every=2)
    for i in range(3):
        v.publish(_snapshot(frame=i))
        time.sleep(0.05)
    v.close()
    live = tmp_path / "live.png"
    assert live.exists() and live.stat().st_size > 5000
    assert not (tmp_path / ".live.tmp.png").exists()  # atomic replace
    assert v.rendered >= 1
    assert v.rendered + v.dropped == 3
    # History frames were written for every RENDERED snapshot.
    assert len(list(tmp_path.glob("live_*.png"))) == v.rendered


def test_live_viewer_lossy_queue(tmp_path):
    """Publishing faster than rendering must never block or error."""
    v = LiveViewer(str(tmp_path))
    t0 = time.perf_counter()
    for i in range(20):
        v.publish(_snapshot(frame=i, with_cloud=False))
    publish_time = time.perf_counter() - t0
    v.close()
    assert publish_time < 1.0  # non-blocking even with a busy renderer
    assert v.rendered >= 1
    assert (tmp_path / "live.png").exists()


def test_live_viewer_survives_bad_snapshot(tmp_path):
    v = LiveViewer(str(tmp_path))
    v.publish({"not": "a frame"})  # renderer must swallow the exception
    v.publish(_snapshot(frame=0))
    time.sleep(0.05)
    v.close()
    assert v.rendered >= 1  # thread stayed alive past the bad snapshot
    assert (tmp_path / "live.png").exists()


def test_system_live_viz_integration(tmp_path):
    """End-to-end: SlamSystem with viz.enabled publishes while tracking and
    live.png reflects the run (keyframe pane + map from finalized clouds)."""
    out = tmp_path / "live"
    cfg = SlamConfig().override(
        **{
            "tracking.levels": 3,
            "tracking.iters": (2, 4, 8),
            "backend.enabled": False,
            "viz.enabled": True,
            "viz.every_n": 3,
            "viz.out_dir": str(out),
            "viz.map_every": 1,
        }
    )
    seq = synthetic.generate_sequence(
        n_frames=14, intr=INTR, motion="orbit", trans_amp=0.25, rot_amp=0.06,
        xi_noise_sigma=0.003,
    )
    from rgbid_tpu.system import SlamSystem

    slam = SlamSystem(INTR, cfg)
    slam.feed(list(seq.frames()))
    slam.finish()
    assert slam.viewer.rendered >= 1
    assert (out / "live.png").exists()
    assert (out / "live.png").stat().st_size > 10000
    # The keyframe pane had real data: founding depth was captured.
    assert slam.manager.keyframes[0].depth is not None
