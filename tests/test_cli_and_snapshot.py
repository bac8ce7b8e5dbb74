"""CLI runner (config 5 entry point) + full-state snapshot/resume."""

import json
import os

import numpy as np
import pytest

from rgbid_tpu.cli import main as cli_main


def test_cli_synthetic_run(tmp_path, capsys):
    out_dir = str(tmp_path / "run")
    rc = cli_main(
        [
            "--synthetic", "40",
            "--max-frames", "8",
            "--out-dir", out_dir,
            "--eval",
            "--quiet",
            "--set", "tracking.levels=3",
            "--set", "tracking.iters=[4,8,16]",
            "--set", "backend.enabled=false",
        ]
    )
    assert rc == 0
    result = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert result["frames"] == 8
    assert result["lost_frames"] == 0
    assert result["ate"]["rmse"] < 0.01
    assert os.path.exists(os.path.join(out_dir, "trajectory.txt"))
    assert os.path.exists(os.path.join(out_dir, "map.ply"))
    # JSONL log: header + 8 frames + result.
    lines = open(os.path.join(out_dir, "frames.jsonl")).read().splitlines()
    recs = [json.loads(l) for l in lines]
    assert recs[0]["type"] == "run_header" and "config_hash" in recs[0]
    assert sum(r["type"] == "frame" for r in recs) == 8
    assert recs[-1]["type"] == "result"


def test_snapshot_roundtrip(tmp_path):
    from rgbid_tpu.core.camera import Intrinsics
    from rgbid_tpu.core.config import SlamConfig
    from rgbid_tpu.datasets import synthetic
    from rgbid_tpu.system import SlamSystem
    from rgbid_tpu.utils import snapshot

    INTR = Intrinsics(fx=258.6, fy=258.2, cx=159.3, cy=127.6, width=320, height=240)
    cfg = SlamConfig().override(
        **{"tracking.levels": 3, "tracking.iters": (4, 8, 16), "backend.enabled": False}
    )
    seq = synthetic.generate_sequence(
        n_frames=12, intr=INTR, motion="orbit", trans_amp=0.3, rot_amp=0.08, seed=4
    )
    slam = SlamSystem(INTR, cfg)
    for i in range(8):
        slam.process_frame(seq.rgb[i], seq.depth[i], seq.timestamps[i])

    path = str(tmp_path / "state.npz")
    snapshot.save(slam, path)
    slam2 = snapshot.restore(path)

    # Identical bookkeeping state.
    assert slam2._frame_count == slam._frame_count
    assert len(slam2.manager.keyframes) == len(slam.manager.keyframes)
    np.testing.assert_allclose(
        np.asarray(slam2._motion.T_ck), np.asarray(slam._motion.T_ck)
    )
    np.testing.assert_allclose(
        np.asarray(slam2._motion.delta), np.asarray(slam._motion.delta)
    )
    np.testing.assert_allclose(
        np.asarray(slam2._kf_state.levels[0].xi), np.asarray(slam._kf_state.levels[0].xi)
    )

    # Both must track the remaining frames to the same poses.
    for i in range(8, 12):
        Ta = slam.process_frame(seq.rgb[i], seq.depth[i], seq.timestamps[i])
        Tb = slam2.process_frame(seq.rgb[i], seq.depth[i], seq.timestamps[i])
        np.testing.assert_allclose(Ta, Tb, atol=1e-5)


def test_snapshot_restores_backend_state(tmp_path):
    """Restored runs must keep loop edges AND a queryable BoW database:
    pre-snapshot keyframes must stay matchable after resume."""
    from rgbid_tpu.core.camera import Intrinsics
    from rgbid_tpu.core.config import SlamConfig
    from rgbid_tpu.datasets import synthetic
    from rgbid_tpu.system import SlamSystem
    from rgbid_tpu.utils import snapshot

    INTR = Intrinsics(fx=258.6, fy=258.2, cx=159.3, cy=127.6, width=320, height=240)
    cfg = SlamConfig().override(
        **{
            "tracking.levels": 3,
            "tracking.iters": (4, 8, 16),
            "keyframe.max_translation": 0.08,
            "backend.min_keyframe_gap": 4,
        }
    )
    seq = synthetic.generate_sequence(
        n_frames=22, intr=INTR, motion="loop", radius=0.45, rot_amp=0.1, seed=7
    )
    slam = SlamSystem(INTR, cfg)
    for i in range(22):
        slam.process_frame(seq.rgb[i], seq.depth[i], seq.timestamps[i])
    slam.finish()
    assert slam.backend.num_loop_closures > 0
    n_db = len(slam.backend.loop_closer.db.entries)
    assert n_db > 0

    path = str(tmp_path / "state.npz")
    snapshot.save(slam, path)
    slam2 = snapshot.restore(path)

    # Loop edges survived the round trip.
    assert len(slam2.backend._loop_edges) == len(slam.backend._loop_edges)
    e0, e1 = slam.backend._loop_edges[0], slam2.backend._loop_edges[0]
    assert e0["from_id"] == e1["from_id"] and e0["to_id"] == e1["to_id"]
    np.testing.assert_allclose(e0["T_rel"], e1["T_rel"])
    # Every keyframe with descriptors is back in the BoW database and will
    # not be re-processed as if new.
    assert len(slam2.backend.loop_closer.db.entries) == n_db
    for kf in slam2.manager.keyframes:
        if kf.descriptors is not None and len(kf.descriptors) > 0:
            assert kf.kf_id in slam2.backend.loop_closer.db.entries
            assert kf.kf_id in slam2.backend._processed
    slam2.finish()
