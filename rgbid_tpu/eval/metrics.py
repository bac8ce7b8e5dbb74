"""Trajectory evaluation: ATE (Umeyama-aligned RMSE) and RPE.

In-repo reimplementation of the TUM benchmark toolkit's evaluation scripts
(``evaluate_ate.py`` / ``evaluate_rpe.py``), which is the reference's entire
automated validation strategy (SURVEY.md §4). Pure numpy, host-side.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np


def umeyama_alignment(x: np.ndarray, y: np.ndarray, with_scale: bool = False):
    """Least-squares similarity transform aligning x (3,N) onto y (3,N).

    Returns (R, t, s) minimizing || y - (s R x + t) ||^2 (Umeyama 1991;
    the Horn alignment used by evaluate_ate is the s=1 case).
    """
    if x.shape != y.shape or x.shape[0] != 3:
        raise ValueError("expected (3, N) point sets of equal shape")
    n = x.shape[1]
    mx, my = x.mean(axis=1, keepdims=True), y.mean(axis=1, keepdims=True)
    xc, yc = x - mx, y - my
    cov = yc @ xc.T / n
    U, d, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1.0
    R = U @ S @ Vt
    if with_scale:
        var_x = (xc**2).sum() / n
        s = float(np.trace(np.diag(d) @ S) / var_x)
    else:
        s = 1.0
    t = my - s * R @ mx
    return R, t, s


def _positions(poses: Sequence[np.ndarray]) -> np.ndarray:
    return np.stack([T[:3, 3] for T in poses], axis=1)  # (3, N)


def absolute_trajectory_error(
    gt_poses: Sequence[np.ndarray],
    est_poses: Sequence[np.ndarray],
    with_scale: bool = False,
) -> dict:
    """ATE over pose lists already associated 1:1 (same length/order).

    Returns dict with rmse/mean/median/max of aligned translation errors.
    """
    if len(gt_poses) != len(est_poses):
        raise ValueError("pose lists must be associated 1:1")
    gt = _positions(gt_poses)
    est = _positions(est_poses)
    R, t, s = umeyama_alignment(est, gt, with_scale)
    aligned = s * R @ est + t
    err = np.linalg.norm(aligned - gt, axis=0)
    return {
        "rmse": float(np.sqrt((err**2).mean())),
        "mean": float(err.mean()),
        "median": float(np.median(err)),
        "max": float(err.max()),
        "n": len(err),
    }


def relative_pose_error(
    gt_poses: Sequence[np.ndarray],
    est_poses: Sequence[np.ndarray],
    delta: int = 1,
) -> dict:
    """RPE with a fixed frame delta: per-pair drift of relative motion.

    Returns translational RMSE (m) and rotational RMSE (rad).
    """
    if len(gt_poses) != len(est_poses):
        raise ValueError("pose lists must be associated 1:1")
    terrs, rerrs = [], []
    for i in range(len(gt_poses) - delta):
        gt_rel = np.linalg.inv(gt_poses[i]) @ gt_poses[i + delta]
        est_rel = np.linalg.inv(est_poses[i]) @ est_poses[i + delta]
        e = np.linalg.inv(gt_rel) @ est_rel
        terrs.append(np.linalg.norm(e[:3, 3]))
        c = np.clip((np.trace(e[:3, :3]) - 1) / 2, -1, 1)
        rerrs.append(np.arccos(c))
    terrs, rerrs = np.array(terrs), np.array(rerrs)
    return {
        "trans_rmse": float(np.sqrt((terrs**2).mean())),
        "rot_rmse": float(np.sqrt((rerrs**2).mean())),
        "n": len(terrs),
    }


def trajectory_from_tum_rows(rows: np.ndarray) -> Tuple[np.ndarray, List[np.ndarray]]:
    """(N, 8) TUM rows [t, tx, ty, tz, qx, qy, qz, qw] -> (timestamps, 4x4 poses)."""
    ts = rows[:, 0]
    poses = []
    for r in rows:
        x, y, z, qx, qy, qz, qw = r[1:8]
        n = qx * qx + qy * qy + qz * qz + qw * qw
        s = 2.0 / n if n > 0 else 0.0
        R = np.array(
            [
                [1 - s * (qy * qy + qz * qz), s * (qx * qy - qw * qz), s * (qx * qz + qw * qy)],
                [s * (qx * qy + qw * qz), 1 - s * (qx * qx + qz * qz), s * (qy * qz - qw * qx)],
                [s * (qx * qz - qw * qy), s * (qy * qz + qw * qx), 1 - s * (qx * qx + qy * qy)],
            ]
        )
        T = np.eye(4)
        T[:3, :3] = R
        T[:3, 3] = [x, y, z]
        poses.append(T)
    return ts, poses


def associate_trajectories(
    ts_a: np.ndarray, ts_b: np.ndarray, max_difference: float = 0.02
) -> List[Tuple[int, int]]:
    """Nearest-neighbor timestamp association between two trajectories."""
    j = 0
    matches = []
    order = np.argsort(ts_b)
    ts_b_sorted = ts_b[order]
    for i, t in enumerate(ts_a):
        j = int(np.searchsorted(ts_b_sorted, t))
        best, bestd = -1, max_difference
        for k in (j - 1, j):
            if 0 <= k < len(ts_b_sorted):
                d = abs(ts_b_sorted[k] - t)
                if d < bestd:
                    best, bestd = int(order[k]), d
        if best >= 0:
            matches.append((i, best))
    return matches
