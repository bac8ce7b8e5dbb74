"""Offline visualization (headless replacement for the reference's GUI).

The reference runs a live 3-pane PCL/VTK visualizer (current frame /
keyframe / global map — SURVEY.md §2.1 "Visualization"). This environment
is headless, so the equivalent is offline renders: per-frame panels
(intensity, inverse depth, residual image) as PNGs via OpenCV, and
trajectory / map figures via matplotlib (Agg backend).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import cv2
import numpy as np


def colorize_inverse_depth(xi: np.ndarray, mask: Optional[np.ndarray] = None,
                           xi_max: float = 2.0) -> np.ndarray:
    """Inverse-depth plane -> BGR colormap image (invalid = black)."""
    norm = np.clip(xi / xi_max, 0.0, 1.0)
    img = cv2.applyColorMap((norm * 255).astype(np.uint8), cv2.COLORMAP_TURBO)
    if mask is not None:
        img[mask <= 0] = 0
    return img


def residual_image(i_sampled: np.ndarray, i_template: np.ndarray,
                   valid: Optional[np.ndarray] = None, scale: float = 4.0) -> np.ndarray:
    """Photometric residual plane -> diverging-colormap BGR image."""
    r = np.clip((i_sampled - i_template) * scale, -1.0, 1.0)
    img = cv2.applyColorMap(((r * 0.5 + 0.5) * 255).astype(np.uint8), cv2.COLORMAP_JET)
    if valid is not None:
        img[valid <= 0] = 0
    return img


def frame_panel(intensity: np.ndarray, xi: np.ndarray, mask: np.ndarray,
                path: Optional[str] = None) -> np.ndarray:
    """Side-by-side intensity + colorized inverse depth (the reference's
    current-frame pane)."""
    gray = cv2.cvtColor((np.clip(intensity, 0, 1) * 255).astype(np.uint8), cv2.COLOR_GRAY2BGR)
    depth = colorize_inverse_depth(xi, mask)
    panel = np.concatenate([gray, depth], axis=1)
    if path:
        cv2.imwrite(path, panel)
    return panel


def plot_trajectory(
    trajectories: Sequence[Tuple[str, List[np.ndarray]]],
    path: str,
    keyframe_poses: Optional[List[np.ndarray]] = None,
) -> None:
    """Top-down (x-z) trajectory plot; accepts [(label, [T_wc...]), ...]."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6, 6))
    for label, poses in trajectories:
        xyz = np.array([T[:3, 3] for T in poses])
        ax.plot(xyz[:, 0], xyz[:, 2], label=label, linewidth=1.5)
    if keyframe_poses:
        kf = np.array([T[:3, 3] for T in keyframe_poses])
        ax.scatter(kf[:, 0], kf[:, 2], marker="s", s=25, zorder=3, label="keyframes")
    ax.set_xlabel("x [m]")
    ax.set_ylabel("z [m]")
    ax.set_aspect("equal")
    ax.legend()
    ax.grid(True, alpha=0.3)
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)


def plot_map_topdown(cloud_xyzrgb: np.ndarray, path: str, max_points: int = 200000) -> None:
    """Top-down scatter of the global map cloud."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    pts = cloud_xyzrgb
    if len(pts) > max_points:
        idx = np.random.default_rng(0).choice(len(pts), max_points, replace=False)
        pts = pts[idx]
    fig, ax = plt.subplots(figsize=(6, 6))
    ax.scatter(pts[:, 0], pts[:, 2], c=np.clip(pts[:, 3:6], 0, 1), s=0.3, linewidths=0)
    ax.set_xlabel("x [m]")
    ax.set_ylabel("z [m]")
    ax.set_aspect("equal")
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
