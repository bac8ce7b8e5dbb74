"""Independent numpy SE(3) implementation (float64).

Kept separate from rgbid_tpu.core.se3 (JAX) on purpose: the two are
cross-validated in tests, so a transcription error in one is caught by the
other.
"""

from __future__ import annotations

import numpy as np


def hat(w: np.ndarray) -> np.ndarray:
    return np.array(
        [[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]], dtype=np.float64
    )


def exp(delta: np.ndarray) -> np.ndarray:
    delta = np.asarray(delta, np.float64)
    v, w = delta[:3], delta[3:]
    theta = np.linalg.norm(w)
    W = hat(w)
    if theta < 1e-9:
        R = np.eye(3) + W + 0.5 * W @ W
        V = np.eye(3) + 0.5 * W + W @ W / 6.0
    else:
        a = np.sin(theta) / theta
        b = (1 - np.cos(theta)) / theta**2
        c = (theta - np.sin(theta)) / theta**3
        R = np.eye(3) + a * W + b * W @ W
        V = np.eye(3) + b * W + c * W @ W
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = V @ v
    return T


def log(T: np.ndarray) -> np.ndarray:
    R = T[:3, :3]
    t = T[:3, 3]
    cos_theta = np.clip((np.trace(R) - 1) / 2, -1, 1)
    theta = np.arccos(cos_theta)
    if theta < 1e-9:
        w = 0.5 * np.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])
        V_inv = np.eye(3) - 0.5 * hat(w)
    else:
        w = theta / (2 * np.sin(theta)) * np.array(
            [R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]]
        )
        W = hat(w)
        coef = 1 / theta**2 - (1 + np.cos(theta)) / (2 * theta * np.sin(theta))
        V_inv = np.eye(3) - 0.5 * W + coef * W @ W
    return np.concatenate([V_inv @ t, w])


def orthonormalize(T: np.ndarray) -> np.ndarray:
    """Project R onto SO(3) by SVD (host-side pose hygiene; see the JAX
    twin in core.se3 for why this is load-bearing)."""
    U, _, Vt = np.linalg.svd(T[:3, :3])
    S = np.eye(3)
    if np.linalg.det(U @ Vt) < 0:
        S[2, 2] = -1.0
    out = np.eye(4)
    out[:3, :3] = U @ S @ Vt
    out[:3, 3] = T[:3, 3]
    return out


def inv(T: np.ndarray) -> np.ndarray:
    out = np.eye(4)
    out[:3, :3] = T[:3, :3].T
    out[:3, 3] = -T[:3, :3].T @ T[:3, 3]
    return out
