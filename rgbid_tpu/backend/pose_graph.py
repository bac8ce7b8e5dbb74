"""SE(3) pose-graph optimization (host, numpy float64).

Reference equivalent: src/pose_graph.* (SURVEY.md §2.1) — keyframe poses
as nodes, odometry + loop edges with information matrices, iterative
Gauss-Newton with the first node fixed, Cholesky solve. Stays on the host
per BASELINE.json:5; a native C++ solver (rgbid_tpu/native) accelerates
the same math for large graphs, with this numpy version as the tested
fallback and oracle.

Edge convention (matches mapping.manager.OdometryEdge):
    T_rel = T_{from<-to}, i.e. T_w,from @ T_rel ~= T_w,to,
    residual r = log( inv(T_w,to) @ T_w,from @ T_rel )  in R^6.
Updates are right-multiplied twists: T_i <- T_i @ exp(delta_i).
Jacobians are computed by central finite differences — exact enough for
GN, robust to convention errors, and cheap at SLAM graph sizes.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Sequence

import numpy as np

from ..reference_cpu import se3_np


@dataclass
class GraphEdge:
    from_id: int
    to_id: int
    T_rel: np.ndarray  # 4x4, T_{from<-to}
    information: np.ndarray  # 6x6 SPD
    robust: bool = False  # Huber kernel (used for loop edges)


def _edge_residual(T_from: np.ndarray, T_to: np.ndarray, T_rel: np.ndarray) -> np.ndarray:
    return se3_np.log(se3_np.inv(T_to) @ T_from @ T_rel)


def _numeric_jacobians(T_from, T_to, T_rel, eps: float = 1e-6):
    """d r / d delta_from, d r / d delta_to (right perturbations), 6x6 each."""
    Jf = np.zeros((6, 6))
    Jt = np.zeros((6, 6))
    for k in range(6):
        d = np.zeros(6)
        d[k] = eps
        E = se3_np.exp(d)
        Ei = se3_np.exp(-d)
        Jf[:, k] = (
            _edge_residual(T_from @ E, T_to, T_rel)
            - _edge_residual(T_from @ Ei, T_to, T_rel)
        ) / (2 * eps)
        Jt[:, k] = (
            _edge_residual(T_from, T_to @ E, T_rel)
            - _edge_residual(T_from, T_to @ Ei, T_rel)
        ) / (2 * eps)
    return Jf, Jt


def optimize_pose_graph(
    poses: Sequence[np.ndarray],
    edges: Sequence[GraphEdge],
    iterations: int = 15,
    damping: float = 1e-5,
    huber_delta: float = 0.1,
    fixed: Sequence[int] = (0,),
    use_native: bool = True,
) -> Dict:
    """Gauss-Newton over keyframe poses. Returns dict with 'poses',
    'initial_error', 'final_error', 'iterations'.

    When the native C++ assembly kernels are built (rgbid_tpu.native),
    the per-edge work runs there (~10^3x faster than the Python loop for
    large graphs); the solve is LAPACK either way. Both paths produce the
    same result (tested).
    """
    if use_native:
        try:
            from .. import native

            if native.available() and len(edges) > 0:
                return _optimize_native(
                    poses, edges, iterations, damping, huber_delta, fixed
                )
        except Exception:
            pass  # fall back to the pure-numpy path
    N = len(poses)
    T = [p.copy() for p in poses]
    fixed = set(fixed)

    def total_error():
        e = 0.0
        for ed in edges:
            r = _edge_residual(T[ed.from_id], T[ed.to_id], ed.T_rel)
            e += float(r @ ed.information @ r)
        return e

    err0 = total_error()
    prev = err0
    its = 0
    for it in range(iterations):
        H = np.zeros((6 * N, 6 * N))
        b = np.zeros(6 * N)
        for ed in edges:
            r = _edge_residual(T[ed.from_id], T[ed.to_id], ed.T_rel)
            info = ed.information
            if ed.robust:
                # Huber: scale the information by w = min(1, delta/|r|_M).
                m = float(np.sqrt(max(r @ info @ r, 1e-18)))
                w = 1.0 if m <= huber_delta else huber_delta / m
                info = info * w
            Jf, Jt = _numeric_jacobians(T[ed.from_id], T[ed.to_id], ed.T_rel)
            f, t = 6 * ed.from_id, 6 * ed.to_id
            H[f : f + 6, f : f + 6] += Jf.T @ info @ Jf
            H[t : t + 6, t : t + 6] += Jt.T @ info @ Jt
            H[f : f + 6, t : t + 6] += Jf.T @ info @ Jt
            H[t : t + 6, f : f + 6] += Jt.T @ info @ Jf
            b[f : f + 6] += Jf.T @ info @ r
            b[t : t + 6] += Jt.T @ info @ r
        # Fix gauge: clamp the fixed nodes.
        for i in fixed:
            H[6 * i : 6 * i + 6, :] = 0.0
            H[:, 6 * i : 6 * i + 6] = 0.0
            H[6 * i : 6 * i + 6, 6 * i : 6 * i + 6] = np.eye(6)
            b[6 * i : 6 * i + 6] = 0.0
        H += damping * np.eye(6 * N)
        try:
            delta = -np.linalg.solve(H, b)
        except np.linalg.LinAlgError:
            break
        for i in range(N):
            if i in fixed:
                continue
            T[i] = se3_np.orthonormalize(T[i] @ se3_np.exp(delta[6 * i : 6 * i + 6]))
        its = it + 1
        cur = total_error()
        if prev - cur < 1e-12 * max(prev, 1.0):
            break
        prev = cur

    return {
        "poses": T,
        "initial_error": err0,
        "final_error": total_error(),
        "iterations": its,
    }


def _optimize_native(poses, edges, iterations, damping, huber_delta, fixed):
    from .. import native

    N = len(poses)
    dim = 6 * N
    fixed = set(fixed)
    fixed_mask = np.zeros(N, np.uint8)
    for i in fixed:
        fixed_mask[i] = 1
    e_from = np.array([e.from_id for e in edges], np.int32)
    e_to = np.array([e.to_id for e in edges], np.int32)
    e_T = np.stack([e.T_rel for e in edges])
    e_info = np.stack([e.information for e in edges])
    e_robust = np.array([e.robust for e in edges], np.uint8)

    T = [p.copy() for p in poses]
    err0 = native.pg_total_error(T, e_from, e_to, e_T, e_info)
    prev = err0
    its = 0
    for it in range(iterations):
        H, b, _ = native.pg_build_system(
            T, e_from, e_to, e_T, e_info, e_robust, huber_delta
        )
        for i in fixed:
            H[6 * i : 6 * i + 6, :] = 0.0
            H[:, 6 * i : 6 * i + 6] = 0.0
            H[6 * i : 6 * i + 6, 6 * i : 6 * i + 6] = np.eye(6)
            b[6 * i : 6 * i + 6] = 0.0
        H += damping * np.eye(dim)
        try:
            delta = -np.linalg.solve(H, b)
        except np.linalg.LinAlgError:
            break
        T = native.pg_apply_updates(T, delta, fixed_mask)
        its = it + 1
        cur = native.pg_total_error(T, e_from, e_to, e_T, e_info)
        if prev - cur < 1e-12 * max(prev, 1.0):
            break
        prev = cur
    return {
        "poses": T,
        "initial_error": err0,
        "final_error": native.pg_total_error(T, e_from, e_to, e_T, e_info),
        "iterations": its,
    }


class PoseGraph:
    """Incremental wrapper: holds nodes + edges, optimizes on demand."""

    def __init__(self, iterations: int = 15, damping: float = 1e-5):
        self.iterations = iterations
        self.damping = damping
        self.edges: List[GraphEdge] = []

    def add_edge(self, from_id, to_id, T_rel, information, robust=False):
        self.edges.append(
            GraphEdge(from_id, to_id, np.asarray(T_rel, np.float64), np.asarray(information, np.float64), robust)
        )

    def optimize(self, poses: Sequence[np.ndarray]) -> Dict:
        return optimize_pose_graph(
            poses, self.edges, self.iterations, self.damping
        )
