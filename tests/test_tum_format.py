"""TUM dataset reader + CLI --tum path, driven by a synthetic sequence
written to disk in exact TUM RGB-D benchmark layout (PNG rgb/ + 16-bit
depth/ + rgb.txt/depth.txt/groundtruth.txt). No network needed.
"""

import json
import os

import cv2
import numpy as np
import pytest

from rgbid_tpu.core.camera import Intrinsics
from rgbid_tpu.datasets import synthetic
from rgbid_tpu.datasets.tum import TumSequence, associate

INTR = Intrinsics(fx=258.6, fy=258.2, cx=159.3, cy=127.6, width=320, height=240)


@pytest.fixture(scope="module")
def tum_dir(tmp_path_factory):
    """Write a synthetic sequence as a TUM-format dataset directory."""
    root = tmp_path_factory.mktemp("rgbd_dataset_synth")  # no "freiburgN" -> no auto-distortion
    seq = synthetic.generate_sequence(
        n_frames=10, intr=INTR, motion="orbit", trans_amp=0.15, rot_amp=0.04,
        xi_noise_sigma=0.003, seed=5,
    )
    os.makedirs(root / "rgb")
    os.makedirs(root / "depth")
    rgb_lines, depth_lines, gt_lines = [], [], []
    from rgbid_tpu.mapping.export import _quat_from_R

    for i in range(len(seq)):
        # Slightly offset depth timestamps to exercise association.
        t_rgb = seq.timestamps[i]
        t_depth = t_rgb + 0.004
        rgb_name = f"rgb/{t_rgb:.6f}.png"
        depth_name = f"depth/{t_depth:.6f}.png"
        cv2.imwrite(str(root / rgb_name), cv2.cvtColor(seq.rgb[i], cv2.COLOR_RGB2BGR))
        cv2.imwrite(str(root / depth_name), seq.depth[i])
        rgb_lines.append(f"{t_rgb:.6f} {rgb_name}")
        depth_lines.append(f"{t_depth:.6f} {depth_name}")
        T = seq.gt_poses[i]
        q = _quat_from_R(T[:3, :3])
        tx, ty, tz = T[:3, 3]
        gt_lines.append(
            f"{t_rgb:.6f} {tx:.6f} {ty:.6f} {tz:.6f} {q[0]:.6f} {q[1]:.6f} {q[2]:.6f} {q[3]:.6f}"
        )
    for name, lines in [("rgb.txt", rgb_lines), ("depth.txt", depth_lines), ("groundtruth.txt", gt_lines)]:
        with open(root / name, "w") as f:
            f.write("# header\n# t data\n")
            f.write("\n".join(lines) + "\n")
    return str(root), seq


def test_associate_greedy():
    a = [(0.0, ["a0"]), (1.0, ["a1"]), (2.0, ["a2"])]
    b = [(0.015, ["b0"]), (1.2, ["b1"]), (2.005, ["b2"])]
    m = associate(a, b, max_difference=0.02)
    assert m == [(0, 0), (2, 2)]  # b1 is 0.2s off -> excluded


def test_tum_sequence_reads_frames(tum_dir):
    root, seq = tum_dir
    ts = TumSequence(root)
    assert len(ts) == len(seq)
    assert not ts.undistort  # unknown sequence name -> zero distortion
    # default calibration auto-rescaled to the 320x240 images.
    assert ts.intrinsics.width == 320 and ts.intrinsics.height == 240
    assert abs(ts.intrinsics.fx - 525.0 / 2) < 1e-6
    f = ts[0]
    assert f.rgb.shape == (240, 320, 3) and f.rgb.dtype == np.uint8
    assert f.depth.shape == (240, 320) and f.depth.dtype == np.uint16
    # PNG round trip is lossless for both rgb and 16-bit depth.
    np.testing.assert_array_equal(f.rgb, seq.rgb[0])
    np.testing.assert_array_equal(f.depth, seq.depth[0])
    # Ground truth parsed: one row per frame, parseable poses.
    assert ts.groundtruth is not None and ts.groundtruth.shape == (10, 8)


def test_cli_tum_end_to_end(tum_dir, capsys):
    root, seq = tum_dir
    from rgbid_tpu.cli import main as cli_main

    rc = cli_main(
        [
            "--tum", root,
            "--intrinsics", "258.6,258.2,159.3,127.6,320,240",
            "--eval",
            "--quiet",
            "--set", "tracking.levels=3",
            "--set", "tracking.iters=[4,8,16]",
            "--set", "backend.enabled=false",
        ]
    )
    assert rc == 0
    result = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert result["frames"] == 10
    assert result["lost_frames"] == 0
    # ATE evaluated against the parsed groundtruth.txt via timestamp
    # association; sub-centimeter on this clip.
    assert result["ate"]["rmse"] < 0.01
    assert result["ate"]["n"] >= 9


def test_undistortion_path(tum_dir):
    root, seq = tum_dir
    from rgbid_tpu.datasets.tum import TumSequence, guess_distortion

    # Our fixture has no distortion -> default reader is a pure passthrough.
    assert not TumSequence(root).undistort or True
    # Force a freiburg1-style distortion model: frames change, dtype/shape
    # preserved, depth stays NEAREST-sampled (no invented values).
    d = guess_distortion("rgbd_dataset_freiburg1_desk")
    assert abs(d[0] - 0.2624) < 1e-9
    ts = TumSequence(root, distortion=d)
    assert ts.undistort
    f = ts[0]
    assert f.rgb.shape == seq.rgb[0].shape and f.depth.dtype == np.uint16
    assert not np.array_equal(f.rgb, seq.rgb[0])  # remap actually applied
    # NEAREST remap: every depth value existed in the source image.
    src_vals = set(np.unique(seq.depth[0]).tolist())
    assert set(np.unique(f.depth).tolist()) <= src_vals | {0}
    # undistort=False restores passthrough.
    f2 = TumSequence(root, distortion=d, undistort=False)[0]
    np.testing.assert_array_equal(f2.depth, seq.depth[0])


# ---------------------------------------------------------------------------
# TUM-scale ingest readiness (round 2): fast associate, calibration file,
# prefetch, 500-frame end-to-end


def test_associate_fast_matches_bruteforce_and_scales():
    """The sorted-window associate must reproduce the toolkit's all-pairs
    greedy result exactly, and run a real-sequence-sized index (~3k
    entries per file) in far under 0.1 s."""
    import time

    rng = np.random.default_rng(0)

    def brute(a, b, max_difference=0.02):
        candidates = []
        for i, (ta, _) in enumerate(a):
            for j, (tb, _) in enumerate(b):
                d = abs(ta - tb)
                if d < max_difference:
                    candidates.append((d, i, j))
        candidates.sort()
        used_a, used_b, matches = set(), set(), []
        for _, i, j in candidates:
            if i not in used_a and j not in used_b:
                used_a.add(i)
                used_b.add(j)
                matches.append((i, j))
        return sorted(matches)

    # Jittered 30 Hz streams with dropouts on both sides.
    for seed in range(3):
        rng = np.random.default_rng(seed)
        ta = np.cumsum(rng.uniform(0.02, 0.05, 300))
        tb = ta + rng.normal(0, 0.008, 300)
        keep_a = rng.random(300) > 0.08
        keep_b = rng.random(300) > 0.08
        a = [(float(t), ["x"]) for t in ta[keep_a]]
        b = [(float(t), ["y"]) for t in np.sort(tb[keep_b])]
        assert associate(a, b) == brute(a, b)

    # Scale: 3000-entry files (a full fr3-length sequence).
    ta = np.cumsum(rng.uniform(0.03, 0.037, 3000))
    tb = np.sort(ta + rng.normal(0, 0.006, 3000))
    a = [(float(t), ["x"]) for t in ta]
    b = [(float(t), ["y"]) for t in tb]
    t0 = time.perf_counter()
    m = associate(a, b)
    dt = time.perf_counter() - t0
    assert len(m) > 2500
    # Complexity guard, not a latency SLO: the O(n^2) brute-force this
    # protects against takes seconds at n=3000, while the shipped
    # O(n log n) merge runs ~3 ms idle. The bound is deliberately loose
    # (1 s) because the suite shares the host with TPU-tunnel clients
    # and a 0.1 s bound measured 330 ms under co-tenancy (round-4 flake).
    assert dt < 1.0, f"associate took {dt*1e3:.1f} ms"


def test_load_calibration_formats(tmp_path):
    from rgbid_tpu.datasets.tum import load_calibration

    p = tmp_path / "c1.txt"
    p.write_text("# fx fy cx cy\n520.9 521.0 325.1 249.7\n")
    intr, dist = load_calibration(str(p))
    assert (intr.fx, intr.width) == (520.9, 640) and not dist.any()

    p = tmp_path / "c2.txt"
    p.write_text("517.3 516.5 318.6 255.3 640 480\n0.2624 -0.9531 -0.0054 0.0026 1.1633\n")
    intr, dist = load_calibration(str(p))
    assert intr.cy == 255.3 and abs(dist[0] - 0.2624) < 1e-12

    p = tmp_path / "c3.txt"
    p.write_text("fx: 100.0\nfy = 101.0\ncx: 80\ncy: 60\nwidth: 160\nheight: 120\nk1: 0.1\n")
    intr, dist = load_calibration(str(p))
    assert (intr.fy, intr.height, dist[0]) == (101.0, 120, 0.1)


def test_calibration_file_pickup(tum_dir, tmp_path):
    root, seq = tum_dir
    calib = tmp_path / "calib.txt"
    calib.write_text("258.6 258.2 159.3 127.6 320 240\n")
    ts = TumSequence(root, calib_file=str(calib))
    assert abs(ts.intrinsics.fx - 258.6) < 1e-9
    assert not ts.undistort  # explicit calib: zero distortion wins over guess


def test_prefetch_frames_order_and_errors():
    from rgbid_tpu.datasets import prefetch_frames

    out = list(prefetch_frames(iter(range(100)), depth=3))
    assert out == list(range(100))

    def boom():
        yield 1
        raise RuntimeError("reader died")

    it = prefetch_frames(boom(), depth=2)
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="reader died"):
        list(it)


@pytest.fixture(scope="module")
def tum_dir_500(tmp_path_factory):
    """A 500-frame TUM-format directory at small resolution (ingest-scale
    fixture; SLAM itself runs on a prefix)."""
    intr = Intrinsics(fx=129.3, fy=129.1, cx=79.6, cy=59.8, width=160, height=120)
    root = tmp_path_factory.mktemp("rgbd_dataset_synth500")
    seq = synthetic.generate_sequence(
        n_frames=500, intr=intr, motion="orbit", trans_amp=0.2, rot_amp=0.05,
        xi_noise_sigma=0.002, seed=11,
    )
    os.makedirs(root / "rgb")
    os.makedirs(root / "depth")
    rng = np.random.default_rng(0)
    rgb_lines, depth_lines = [], []
    for i in range(len(seq)):
        t_rgb = seq.timestamps[i]
        t_depth = t_rgb + float(rng.uniform(0.0, 0.01))
        rgb_name = f"rgb/{t_rgb:.6f}.png"
        depth_name = f"depth/{t_depth:.6f}.png"
        cv2.imwrite(str(root / rgb_name), cv2.cvtColor(seq.rgb[i], cv2.COLOR_RGB2BGR))
        cv2.imwrite(str(root / depth_name), seq.depth[i])
        rgb_lines.append(f"{t_rgb:.6f} {rgb_name}")
        depth_lines.append(f"{t_depth:.6f} {depth_name}")
    for name, lines in [("rgb.txt", rgb_lines), ("depth.txt", depth_lines)]:
        with open(root / name, "w") as f:
            f.write("# header\n")
            f.write("\n".join(lines) + "\n")
    (root / "calibration.txt").write_text("129.3 129.1 79.6 59.8 160 120\n")
    return str(root)


def test_cli_500_frame_ingest(tum_dir_500, capsys):
    """End-to-end CLI over the 500-frame directory: association covers the
    full index in one pass (in-directory calibration.txt picked up), SLAM
    runs a prefix through the prefetch + flight pipeline."""
    import time

    t0 = time.perf_counter()
    ts = TumSequence(tum_dir_500)
    assoc_s = time.perf_counter() - t0
    assert len(ts) == 500
    assert assoc_s < 2.0  # full open incl. probe-image read; associate itself <0.1 s
    assert abs(ts.intrinsics.fx - 129.3) < 1e-9  # calibration.txt pickup

    from rgbid_tpu.cli import main as cli_main

    rc = cli_main(
        [
            "--tum", tum_dir_500,
            "--max-frames", "30",
            "--quiet",
            "--set", "tracking.levels=3",
            "--set", "tracking.iters=[2,8,16]",
            "--set", "backend.enabled=false",
        ]
    )
    assert rc == 0
    result = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert result["frames"] == 30
    assert result["lost_frames"] == 0
