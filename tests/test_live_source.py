"""Live capture path (datasets/live.py): follow a GROWING TUM-format
directory — the software equivalent of the reference's OpenNI2 grabber
(SURVEY.md §2.1). A writer thread plays capture daemon (PNGs + append-only
rgb.txt/depth.txt); the LiveSource consumer must stream every frame in
order, exactly once, WHILE the capture is still being written, and end on
idle timeout.
"""

import os
import threading
import time

import cv2
import numpy as np

from rgbid_tpu.core.camera import Intrinsics
from rgbid_tpu.datasets import synthetic
from rgbid_tpu.datasets.live import LiveSource

INTR = Intrinsics(fx=258.6, fy=258.2, cx=159.3, cy=127.6, width=320, height=240)


def _write_frame(root, seq, i):
    t_rgb = seq.timestamps[i]
    t_depth = t_rgb + 0.004
    rgb_name = f"rgb/{t_rgb:.6f}.png"
    depth_name = f"depth/{t_depth:.6f}.png"
    cv2.imwrite(os.path.join(root, rgb_name),
                cv2.cvtColor(seq.rgb[i], cv2.COLOR_RGB2BGR))
    cv2.imwrite(os.path.join(root, depth_name), seq.depth[i])
    # Index lines are appended AFTER the PNGs exist (capture-daemon
    # ordering); each append is a separate open so the reader sees
    # partial-but-valid files, like tailing a real recorder.
    with open(os.path.join(root, "rgb.txt"), "a") as f:
        f.write(f"{t_rgb:.6f} {rgb_name}\n")
    with open(os.path.join(root, "depth.txt"), "a") as f:
        f.write(f"{t_depth:.6f} {depth_name}\n")


def test_live_source_streams_growing_capture(tmp_path):
    root = str(tmp_path / "capture")
    os.makedirs(os.path.join(root, "rgb"))
    os.makedirs(os.path.join(root, "depth"))
    for name in ("rgb.txt", "depth.txt"):
        with open(os.path.join(root, name), "w") as f:
            f.write("# live capture\n")
    seq = synthetic.generate_sequence(
        n_frames=8, intr=INTR, motion="orbit", trans_amp=0.15, rot_amp=0.04,
        xi_noise_sigma=0.003, seed=5,
    )
    # Two frames exist before the consumer starts; the rest arrive live.
    _write_frame(root, seq, 0)
    _write_frame(root, seq, 1)

    def writer():
        for i in range(2, len(seq)):
            time.sleep(0.15)
            _write_frame(root, seq, i)

    w = threading.Thread(target=writer)
    w.start()
    src = LiveSource(root, poll_interval=0.03, idle_timeout=2.0)
    got, arrival = [], []
    for fr in src.frames():
        got.append(fr)
        arrival.append(time.monotonic())
    w.join()

    # Every frame, exactly once, in timestamp order.
    assert len(got) == len(seq)
    ts = [fr.timestamp for fr in got]
    assert ts == sorted(ts)
    np.testing.assert_array_equal(got[3].depth, seq.depth[3])
    # Streaming really overlapped the capture: the first frames were
    # consumed well before the writer finished the last ones.
    assert arrival[1] < arrival[-1] - 0.5


def test_live_source_stop_and_idle(tmp_path):
    root = str(tmp_path / "capture2")
    os.makedirs(os.path.join(root, "rgb"))
    os.makedirs(os.path.join(root, "depth"))
    for name in ("rgb.txt", "depth.txt"):
        with open(os.path.join(root, name), "w") as f:
            f.write("# live capture\n")
    seq = synthetic.generate_sequence(
        n_frames=2, intr=INTR, motion="static", xi_noise_sigma=0.003, seed=5,
    )
    _write_frame(root, seq, 0)
    _write_frame(root, seq, 1)
    src = LiveSource(root, poll_interval=0.02, idle_timeout=0.3)
    t0 = time.monotonic()
    frames = list(src.frames())
    took = time.monotonic() - t0
    assert len(frames) == 2
    # Ended via idle timeout, promptly (not hanging).
    assert took < 5.0
