"""Native C++ kernels (pose-graph assembly, Hamming) vs numpy oracles."""

import numpy as np
import pytest

from rgbid_tpu import native
from rgbid_tpu.backend.place_recognition import hamming_distances
from rgbid_tpu.backend.pose_graph import GraphEdge, optimize_pose_graph
from rgbid_tpu.reference_cpu import se3_np

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library could not be built"
)


def _graph(n=15, seed=0):
    rng = np.random.default_rng(seed)
    gt = [np.eye(4)]
    rels = []
    for _ in range(n - 1):
        d = np.array([0.25, 0.02, 0.1, 0.02, 0.2, 0.01]) + rng.normal(scale=0.01, size=6)
        rels.append(se3_np.exp(d))
        gt.append(gt[-1] @ rels[-1])
    noisy = [se3_np.exp(rng.normal(scale=0.02, size=6) * [1, 1, 1, 0.3, 0.3, 0.3]) @ R for R in rels]
    poses = [np.eye(4)]
    for R in noisy:
        poses.append(poses[-1] @ R)
    edges = [GraphEdge(i, i + 1, noisy[i], np.eye(6) * 1e2) for i in range(n - 1)]
    T_loop = se3_np.inv(gt[0]) @ gt[-1]
    edges.append(GraphEdge(0, n - 1, T_loop, np.eye(6) * 1e5, robust=True))
    return gt, poses, edges


def test_native_build_matches_numpy_system():
    _, poses, edges = _graph()
    e_from = np.array([e.from_id for e in edges], np.int32)
    e_to = np.array([e.to_id for e in edges], np.int32)
    e_T = np.stack([e.T_rel for e in edges])
    e_info = np.stack([e.information for e in edges])
    e_robust = np.array([e.robust for e in edges], np.uint8)
    H, b, err = native.pg_build_system(poses, e_from, e_to, e_T, e_info, e_robust, 0.1)

    # numpy reference assembly (mirrors the pure-python optimizer internals)
    from rgbid_tpu.backend import pose_graph as pg

    N = len(poses)
    H_ref = np.zeros((6 * N, 6 * N))
    b_ref = np.zeros(6 * N)
    for ed in edges:
        r = pg._edge_residual(poses[ed.from_id], poses[ed.to_id], ed.T_rel)
        info = ed.information
        if ed.robust:
            # Metric-norm Huber (round 5): the Mahalanobis norm at
            # production info scales annihilated every real loop edge —
            # see pose_graph.py's dense-path comment.
            m = float(max(np.linalg.norm(r), 1e-9))
            w = 1.0 if m <= 0.1 else 0.1 / m
            info = info * w
        Jf, Jt = pg._numeric_jacobians(poses[ed.from_id], poses[ed.to_id], ed.T_rel)
        f, t = 6 * ed.from_id, 6 * ed.to_id
        H_ref[f : f + 6, f : f + 6] += Jf.T @ info @ Jf
        H_ref[t : t + 6, t : t + 6] += Jt.T @ info @ Jt
        H_ref[f : f + 6, t : t + 6] += Jf.T @ info @ Jt
        H_ref[t : t + 6, f : f + 6] += Jt.T @ info @ Jf
        b_ref[f : f + 6] += Jf.T @ info @ r
        b_ref[t : t + 6] += Jt.T @ info @ r
    np.testing.assert_allclose(H, H_ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(b, b_ref, rtol=1e-5, atol=1e-8)


def test_native_optimizer_matches_python():
    gt, poses, edges = _graph()
    out_py = optimize_pose_graph(poses, edges, iterations=15, use_native=False)
    out_cc = optimize_pose_graph(poses, edges, iterations=15, use_native=True)
    assert abs(out_cc["final_error"] - out_py["final_error"]) < 1e-5 * max(
        out_py["final_error"], 1.0
    )
    for a, b in zip(out_cc["poses"], out_py["poses"]):
        np.testing.assert_allclose(a, b, atol=1e-6)
    # And it actually corrected the drift.
    e_before = np.mean([np.linalg.norm(p[:3, 3] - g[:3, 3]) for p, g in zip(poses, gt)])
    e_after = np.mean(
        [np.linalg.norm(p[:3, 3] - g[:3, 3]) for p, g in zip(out_cc["poses"], gt)]
    )
    assert e_after < 0.5 * e_before


def test_native_hamming_matches_numpy():
    rng = np.random.default_rng(1)
    a = rng.integers(0, 256, (37, 32), dtype=np.uint8)
    b = rng.integers(0, 256, (53, 32), dtype=np.uint8)
    np.testing.assert_array_equal(native.hamming_batch(a, b), hamming_distances(a, b))


def test_native_is_faster_for_large_graphs():
    import time

    _, poses, edges = _graph(n=60, seed=3)
    t0 = time.perf_counter()
    optimize_pose_graph(poses, edges, iterations=5, use_native=False)
    t_py = time.perf_counter() - t0
    t0 = time.perf_counter()
    optimize_pose_graph(poses, edges, iterations=5, use_native=True)
    t_cc = time.perf_counter() - t0
    assert t_cc < t_py  # typically 50-1000x
