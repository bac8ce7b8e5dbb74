"""Back-end components: pose graph, BoW place recognition, batched
relocalization (BASELINE.json config 4).
"""

import numpy as np
import pytest

from rgbid_tpu.backend.place_recognition import BowDatabase, hamming_distances
from rgbid_tpu.backend.pose_graph import GraphEdge, optimize_pose_graph
from rgbid_tpu.backend.relocalization import RelocScorer
from rgbid_tpu.core.camera import Intrinsics
from rgbid_tpu.core.config import SlamConfig
from rgbid_tpu.datasets import synthetic
from rgbid_tpu.reference_cpu import se3_np

INTR = Intrinsics(fx=258.6, fy=258.2, cx=159.3, cy=127.6, width=320, height=240)


# ---------------------------------------------------------------------------
# Pose graph


def _chain_with_drift(n=12, drift=0.02, seed=0):
    """Ground-truth loop trajectory + drifted odometry measurements."""
    rng = np.random.default_rng(seed)
    gt = [np.eye(4)]
    rels = []
    for i in range(n - 1):
        d = np.array([0.3, 0.0, 0.1, 0.0, 0.25, 0.0]) + rng.normal(scale=0.01, size=6)
        T_rel = se3_np.exp(d)  # T_{i<-i+1}
        rels.append(T_rel)
        gt.append(gt[-1] @ T_rel)
    # Odometry measurements = true rels + accumulating noise (drift).
    noisy = [se3_np.exp(rng.normal(scale=drift, size=6) * [1, 1, 1, 0.3, 0.3, 0.3]) @ R for R in rels]
    return gt, rels, noisy


def test_pose_graph_zero_residual_stays():
    gt, rels, _ = _chain_with_drift()
    edges = [
        GraphEdge(i, i + 1, rels[i], np.eye(6) * 1e4) for i in range(len(rels))
    ]
    out = optimize_pose_graph(gt, edges, iterations=5)
    assert out["final_error"] < 1e-9
    for a, b in zip(out["poses"], gt):
        np.testing.assert_allclose(a, b, atol=1e-9)


def test_pose_graph_corrects_drift_with_loop():
    gt, rels, noisy = _chain_with_drift()
    n = len(gt)
    # Build drifted initial poses by integrating noisy odometry.
    poses = [np.eye(4)]
    for R in noisy:
        poses.append(poses[-1] @ R)
    drift_before = np.linalg.norm(poses[-1][:3, 3] - gt[-1][:3, 3])
    edges = [GraphEdge(i, i + 1, noisy[i], np.eye(6) * 1e2) for i in range(n - 1)]
    # Loop edge: perfect relative measurement between last and first node.
    T_loop = se3_np.inv(gt[0]) @ gt[-1]  # T_{0<-? }: T_w0 @ X = T_w,last
    edges.append(GraphEdge(0, n - 1, T_loop, np.eye(6) * 1e6, robust=True))
    out = optimize_pose_graph(poses, edges, iterations=20)
    drift_after = np.linalg.norm(out["poses"][-1][:3, 3] - gt[-1][:3, 3])
    assert out["final_error"] < out["initial_error"]
    assert drift_after < 0.2 * drift_before
    # Interior nodes also improve on average.
    e_b = np.mean([np.linalg.norm(p[:3, 3] - g[:3, 3]) for p, g in zip(poses, gt)])
    e_a = np.mean([np.linalg.norm(p[:3, 3] - g[:3, 3]) for p, g in zip(out["poses"], gt)])
    assert e_a < 0.5 * e_b


def test_pose_graph_huber_resists_outlier_loop():
    gt, rels, _ = _chain_with_drift()
    n = len(gt)
    edges = [GraphEdge(i, i + 1, rels[i], np.eye(6) * 1e4) for i in range(n - 1)]
    # A WRONG loop edge (e.g. a false positive place match), robustified.
    bogus = se3_np.exp(np.array([1.5, -2.0, 0.7, 0.4, 0.2, -0.5]))
    edges.append(GraphEdge(0, n - 1, bogus, np.eye(6) * 1e2, robust=True))
    out = optimize_pose_graph(gt, edges, iterations=20)
    # With Huber the correct odometry dominates: nodes stay near GT.
    errs = [np.linalg.norm(p[:3, 3] - g[:3, 3]) for p, g in zip(out["poses"], gt)]
    assert max(errs) < 0.08


# ---------------------------------------------------------------------------
# BoW


def test_hamming_distances():
    a = np.zeros((2, 32), np.uint8)
    b = np.zeros((3, 32), np.uint8)
    b[1, 0] = 0xFF
    b[2, :] = 0xFF
    d = hamming_distances(a, b)
    assert d[0, 0] == 0 and d[0, 1] == 8 and d[0, 2] == 256


def test_bow_same_place_scores_higher():
    from rgbid_tpu.backend.features import extract_orb

    scene = synthetic.make_scene(0)
    poses = synthetic.loopy_trajectory(20, radius=0.4, rot_amp=0.12)
    views = [0, 4, 8, 12, 19]  # 19 is back near 0
    descs = {}
    for v in views:
        rgb, _, gray, _ = synthetic.render_frame(scene, INTR, poses[v])
        u8 = np.clip(gray * 255, 0, 255).astype(np.uint8)
        _, descs[v] = extract_orb(u8, 400)

    db = BowDatabase(min_score=0.0, min_gap=2, max_candidates=10)
    for i, v in enumerate(views[:-1]):
        db.insert(i, descs[v])
    results = dict(db.query(10, descs[19]))  # query id far from all
    assert len(results) > 0
    # The revisit (view 0 == entry 0) must be the best match.
    best = max(results, key=results.get)
    assert best == 0


# ---------------------------------------------------------------------------
# Batched relocalization


@pytest.mark.parametrize("batch", [1, 3])
def test_reloc_scorer_recovers_relative_pose(batch):
    cfg = SlamConfig().override(
        **{"tracking.levels": 3, "backend.reloc_level": 1, "backend.reloc_iters": 20}
    )
    scorer = RelocScorer(INTR, cfg)
    scene = synthetic.make_scene(0)
    from rgbid_tpu.reference_cpu import odometry as odo

    def planes(T_wc):
        rgb, d16, _, _ = synthetic.render_frame(scene, INTR, T_wc)
        pyr = odo.preprocess_frame(rgb, d16, 2)
        return {
            "intensity": pyr.intensity[1],
            "xi": pyr.xi[1],
            "mask": pyr.mask[1].astype(np.float32),
        }

    T0 = np.eye(4)
    temps, curs, gts = [], [], []
    for k in range(batch):
        T1 = synthetic.orbit_trajectory(40, trans_amp=0.2, rot_amp=0.06)[3 + 2 * k]
        temps.append(planes(T0))
        curs.append(planes(T1))
        gts.append(np.linalg.inv(T1) @ T0)  # T_{cur<-template}
    res = scorer.score_pairs(temps, curs)
    for k in range(batch):
        assert scorer.accept(res, k), (
            float(res.error[k]),
            float(res.inlier_frac[k]),
            float(res.n_valid[k]),
        )
        err = se3_np.log(se3_np.inv(gts[k]) @ np.asarray(res.T[k], np.float64))
        assert np.linalg.norm(err) < 1.2e-2  # loop-edge precision; info-weighted in the graph


def test_reloc_scorer_rejects_unrelated_views():
    cfg = SlamConfig().override(
        **{"tracking.levels": 3, "backend.reloc_level": 1, "backend.reloc_iters": 12}
    )
    scorer = RelocScorer(INTR, cfg)
    scene_a = synthetic.make_scene(0)
    scene_b = synthetic.make_scene(99)  # different textures & layout
    from rgbid_tpu.reference_cpu import odometry as odo

    def planes(scene, T_wc):
        rgb, d16, _, _ = synthetic.render_frame(scene, INTR, T_wc)
        pyr = odo.preprocess_frame(rgb, d16, 2)
        return {
            "intensity": pyr.intensity[1],
            "xi": pyr.xi[1],
            "mask": pyr.mask[1].astype(np.float32),
        }

    res = scorer.score_pairs([planes(scene_a, np.eye(4))], [planes(scene_b, np.eye(4))])
    assert not scorer.accept(res, 0)


def test_episode_edges_concentrate_loop_correction():
    """The round-5 revisit mechanism at production info scales: a mover
    episode bakes its drag into the odometry edges measured during it.
    If those edges keep full stiffness, the optimizer honors them and
    dumps a loop closure's correction into the WEAKEST clean edge
    instead (measured on mover_then_revisit: correct pre-episode
    keyframes dragged to ~372 mm). Episode edges arrive down-scaled
    (BackendConfig.episode_info_scale) AND Huber-robustified — the
    correction must land predominantly in the genuinely inconsistent
    episode edges, sparing the clean chain entirely; the accurate
    episode edges, being soft, absorb a bounded share.

    Graph mirrors the forensic record (BASELINE.md round-5): 9 nodes,
    clean infos 1e7-4e9 (the 1e7 is the low-overlap clean edge that ate
    a third of the correction at scale 1e-2), two mid-episode edges
    corrupted by ~0.19 m each, perfect robust loop edges 0<-7 and 1<-8.
    """
    rng = np.random.default_rng(7)
    n = 9
    gt = [np.eye(4)]
    for i in range(n - 1):
        d = np.array([0.25, 0.0, 0.08, 0.0, 0.2, 0.0]) + rng.normal(scale=0.01, size=6)
        gt.append(gt[-1] @ se3_np.exp(d))
    true_rels = [se3_np.inv(gt[i]) @ gt[i + 1] for i in range(n - 1)]

    drag = se3_np.exp(np.array([0.13, -0.1, 0.08, 0.02, -0.015, 0.01]))
    episode = {2, 3, 4, 5, 6}          # edges measured during activity
    corrupted = {4, 5}                 # the ones actually carrying drag
    clean_info = {0: 4e9, 1: 2e7, 7: 1e9}  # 1: the weak low-overlap edge
    scale = 1e-4

    measured, edges = [], []
    for i in range(n - 1):
        m = (true_rels[i] @ drag) if i in corrupted else true_rels[i]
        measured.append(m)
        if i in episode:
            edges.append(GraphEdge(i, i + 1, m, np.eye(6) * 1e9 * scale, robust=True))
        else:
            edges.append(GraphEdge(i, i + 1, m, np.eye(6) * clean_info[i]))
    poses = [np.eye(4)]
    for m in measured:
        poses.append(poses[-1] @ m)
    for a, b in ((0, 7), (1, 8)):
        T_loop = se3_np.inv(gt[a]) @ gt[b]
        edges.append(GraphEdge(a, b, T_loop, np.eye(6) * 1e9, robust=True))

    pre = [np.linalg.norm(p[:3, 3] - g[:3, 3]) for p, g in zip(poses, gt)]
    assert pre[8] > 0.3  # the drag really baked a large offset
    out = optimize_pose_graph(poses, edges, iterations=40)
    post = [np.linalg.norm(p[:3, 3] - g[:3, 3]) for p, g in zip(out["poses"], gt)]
    # What the mechanism GUARANTEES (measured: post = [0, 0, 0.0004,
    # 0.071, 0.143, 0.038, 0.073, 0, 0]):
    # 1. The clean pre-episode chain is spared (the stiff control drags
    #    node 2 to 0.32 m through the weak clean edge).
    assert max(post[:3]) < 0.01, post
    # 2. The revisit-anchored nodes are fully reclaimed.
    assert max(post[7:]) < 0.01, post
    # 3. Mid-episode smear is bounded WELL below the baked tail: the
    #    accurate-but-soft episode edges absorb some stretch (nodes 3-4
    #    at ~0.07/0.14), but nothing approaches the 0.37 m offset.
    assert max(post) < 0.45 * pre[8], post
    # 4. Net trajectory error collapses (mean 0.142 -> 0.036 m).
    assert float(np.mean(post)) < 0.35 * float(np.mean(pre)), (post, pre)

    # Negative control: the same graph with full-stiffness, non-robust
    # episode edges drags the clean chain — the documented failure mode
    # (node 2 lands at ~0.32 m: the correction dumps into the weak
    # low-overlap clean edge instead of the corrupted episode edges).
    edges_stiff = [
        GraphEdge(e.from_id, e.to_id, e.T_rel, np.eye(6) * 1e9)
        if e.from_id in episode and e.to_id == e.from_id + 1
        else e
        for e in edges
    ]
    out2 = optimize_pose_graph(poses, edges_stiff, iterations=40)
    post2 = [np.linalg.norm(p[:3, 3] - g[:3, 3]) for p, g in zip(out2["poses"], gt)]
    assert max(post2[:3]) > 0.25, post2
    assert max(post2[:3]) > 100 * max(post[:3]), (post2, post)


# ---------------------------------------------------------------------------
# Sparse analytic pose graph (round 2): Jacobians, oracle equality, scale


def test_analytic_edge_jacobians_match_fd():
    from rgbid_tpu.backend.pose_graph import (
        _numeric_jacobians,
        edge_jacobians_analytic,
    )

    rng = np.random.default_rng(0)
    for _ in range(20):
        T_from = se3_np.exp(rng.normal(scale=0.8, size=6))
        T_to = se3_np.exp(rng.normal(scale=0.8, size=6))
        T_rel = se3_np.exp(rng.normal(scale=0.3, size=6))
        Jf_a, Jt_a, r = edge_jacobians_analytic(T_from, T_to, T_rel)
        Jf_n, Jt_n = _numeric_jacobians(T_from, T_to, T_rel)
        np.testing.assert_allclose(Jf_a, Jf_n, atol=1e-6)
        np.testing.assert_allclose(Jt_a, Jt_n, atol=1e-6)


def test_sparse_matches_dense_fd_oracle():
    gt, rels, noisy = _chain_with_drift(n=14, drift=0.03, seed=3)
    n = len(gt)
    poses = [np.eye(4)]
    for R in noisy:
        poses.append(poses[-1] @ R)
    edges = [GraphEdge(i, i + 1, noisy[i], np.eye(6) * 1e2) for i in range(n - 1)]
    T_loop = se3_np.inv(gt[0]) @ gt[-1]
    edges.append(GraphEdge(0, n - 1, T_loop, np.eye(6) * 1e6, robust=True))
    out_s = optimize_pose_graph(poses, edges, iterations=40, method="sparse")
    out_d = optimize_pose_graph(poses, edges, iterations=40, method="dense_fd")
    # Both converge to the same stationary point (analytic vs FD Jacobians
    # and sparse vs dense solves agree to solver precision).
    assert abs(out_s["final_error"] - out_d["final_error"]) <= 1e-8 * max(
        out_d["final_error"], 1.0
    )
    for a, b in zip(out_s["poses"], out_d["poses"]):
        np.testing.assert_allclose(a, b, atol=1e-8)


def test_sparse_scales_to_large_graphs():
    """500 nodes, ~2000 edges: must optimize in well under a second per
    the round-2 goal (the dense FD loop took minutes at this size)."""
    import time

    rng = np.random.default_rng(1)
    n = 500
    gt = [np.eye(4)]
    rels = []
    for i in range(n - 1):
        d = np.array([0.1, 0.02, 0.05, 0.01, 0.04, 0.005]) + rng.normal(scale=0.005, size=6)
        T_rel = se3_np.exp(d)
        rels.append(T_rel)
        gt.append(gt[-1] @ T_rel)
    poses = [np.eye(4)]
    for R in rels:
        noisy = se3_np.exp(rng.normal(scale=0.004, size=6)) @ R
        poses.append(poses[-1] @ noisy)
    edges = [GraphEdge(i, i + 1, rels[i], np.eye(6) * 1e3) for i in range(n - 1)]
    # ~1500 random extra constraints (loop-closure-like, exact).
    for _ in range(1500):
        i, j = sorted(rng.integers(0, n, 2))
        if i == j:
            continue
        T_rel = se3_np.inv(gt[i]) @ gt[j]  # T_{i<-j}: T_wi @ T_rel = T_wj
        edges.append(GraphEdge(i, j, T_rel, np.eye(6) * 1e3, robust=True))
    t0 = time.perf_counter()
    out = optimize_pose_graph(poses, edges, iterations=10, method="sparse")
    dt = time.perf_counter() - t0
    # Very generous wall-clock bound: measured ~0.3-0.6 s in isolation,
    # but this box's tenancy varies +-30% and a concurrent full-suite run
    # tripped a 5 s bound at 8.6 s (round-2 VERDICT weak #8). The bound
    # only needs to catch a complexity regression (the dense FD path took
    # MINUTES at this size), so an order of magnitude of headroom is the
    # right trade against flakiness.
    assert dt < 30.0, dt
    assert out["final_error"] < out["initial_error"] * 1e-3
    err_end = np.linalg.norm(out["poses"][-1][:3, 3] - gt[-1][:3, 3])
    assert err_end < 0.01, err_end
