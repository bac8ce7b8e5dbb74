"""Live visualization: the reference's 3-pane GUI, headless.

The reference runs a live PCL/VTK visualizer on its own thread (SURVEY.md
§2.1 "Visualization" / "Threading glue"): current RGB + residual view, the
active keyframe view, and the global map + trajectory. This environment is
headless, so the honest equivalent is a PERIODIC SNAPSHOT renderer: a
third thread that composites the same three panes into a PNG
(``<dir>/live.png``, atomically replaced so a file watcher / browser can
poll it) every few frames while the system runs.

Design constraints (why it looks the way it does):

- The hot path must never block or read device memory: a D2H readback of
  a plane costs ~30 ms on the sandbox TPU, which would erase the flight
  pipeline's gains. The panes are therefore rendered ONLY from host-side
  data the front end already has (raw rgb/depth of the published frame,
  keyframe metadata, poses, finalized clouds).
- ``publish()`` is non-blocking and lossy: snapshots go into a depth-1
  queue; if the renderer is still busy with the previous one, the new
  snapshot REPLACES the waiting one (a live view wants the latest state,
  not a backlog).
- The PNG is written to a temp file and os.replace()d so readers never
  observe a half-written image.
"""

from __future__ import annotations

import os
import queue
import threading
from typing import List, Optional

import numpy as np

from .viz import colorize_inverse_depth


def _gray_bgr(rgb_or_gray: np.ndarray) -> np.ndarray:
    import cv2

    a = rgb_or_gray
    if a.ndim == 2:
        return cv2.cvtColor(a, cv2.COLOR_GRAY2BGR)
    return cv2.cvtColor(a, cv2.COLOR_RGB2BGR)


def _xi_from_depth_u16(
    depth_u16: np.ndarray, depth_scale: float, min_depth: float, max_depth: float
):
    z = depth_u16.astype(np.float32) / depth_scale
    mask = (z > min_depth) & (z < max_depth)
    xi = np.where(mask, 1.0 / np.maximum(z, 1e-6), 0.0).astype(np.float32)
    return xi, mask.astype(np.float32)


def _label(img: np.ndarray, text: str) -> np.ndarray:
    import cv2

    cv2.putText(
        img, text, (6, 18), cv2.FONT_HERSHEY_SIMPLEX, 0.5, (255, 255, 255), 1,
        cv2.LINE_AA,
    )
    return img


class LiveViewer:
    """Periodic 3-pane snapshot renderer on its own thread.

    Pane 1 (current): gray image | colorized inverse depth of the most
    recently published frame, annotated with frame id / keyframe count /
    lost state. Pane 2 (keyframe): the active keyframe's color image |
    its founding inverse depth. Pane 3 (map): top-down trajectory +
    keyframe positions + the global cloud assembled so far (matplotlib,
    Agg). Panes 1+2 are cheap (OpenCV); pane 3 re-renders only every
    ``map_every`` snapshots.
    """

    def __init__(self, out_dir: str, history: bool = False, map_every: int = 3):
        os.makedirs(out_dir, exist_ok=True)
        self.out_dir = out_dir
        self.history = history
        self.map_every = max(1, int(map_every))
        self._q: "queue.Queue[Optional[dict]]" = queue.Queue(maxsize=1)
        self._map_png: Optional[np.ndarray] = None
        self._count = 0
        self.rendered = 0  # snapshots actually written (for tests/stats)
        self.dropped = 0  # snapshots replaced before rendering
        self._thread = threading.Thread(
            target=self._run, name="rgbid-liveview", daemon=True
        )
        self._thread.start()

    # ------------------------------------------------------------- publish
    def publish(self, snap: dict) -> None:
        """Non-blocking, lossy: the latest snapshot wins."""
        while True:
            try:
                self._q.put_nowait(snap)
                return
            except queue.Full:
                try:
                    self._q.get_nowait()
                    self.dropped += 1
                except queue.Empty:
                    pass

    def close(self, timeout: float = 30.0) -> None:
        """Render anything still queued, then stop the thread."""
        self._q.put(None)  # blocks until the renderer drains the queue
        self._thread.join(timeout=timeout)

    # -------------------------------------------------------------- render
    def _run(self) -> None:
        while True:
            snap = self._q.get()
            if snap is None:
                return
            try:
                self._render(snap)
                self.rendered += 1
            except Exception:  # never kill the viz thread
                import traceback

                traceback.print_exc()

    def _render(self, snap: dict) -> None:
        import cv2

        h, w = snap["depth"].shape
        xi, mask = _xi_from_depth_u16(
            snap["depth"], snap.get("depth_scale", 5000.0),
            snap.get("min_depth", 0.3), snap.get("max_depth", 10.0),
        )
        cur = np.concatenate(
            [_gray_bgr(snap["rgb"]), colorize_inverse_depth(xi, mask)], axis=1
        )
        state = "LOST" if snap.get("lost") else "tracking"
        _label(
            cur,
            f"frame {snap.get('frame', 0)}  kf {snap.get('n_keyframes', 0)}  "
            f"{state}",
        )

        kf_rgb = snap.get("kf_rgb")
        kf_depth = snap.get("kf_depth")
        if kf_rgb is not None:
            kxi, kmask = (
                _xi_from_depth_u16(
                    kf_depth, snap.get("depth_scale", 5000.0),
                    snap.get("min_depth", 0.3), snap.get("max_depth", 10.0),
                )
                if kf_depth is not None
                else (np.zeros((h, w), np.float32), np.zeros((h, w), np.float32))
            )
            kf_pane = np.concatenate(
                [_gray_bgr(kf_rgb), colorize_inverse_depth(kxi, kmask)], axis=1
            )
            _label(kf_pane, f"active keyframe {snap.get('kf_id', 0)}")
        else:
            kf_pane = np.zeros_like(cur)

        if self._count % self.map_every == 0 or self._map_png is None:
            cloud = snap.get("cloud")
            if cloud is None and snap.get("kf_clouds"):
                from ..mapping.export import transform_cloud

                cloud = np.concatenate(
                    [transform_cloud(c, T) for T, c in snap["kf_clouds"]]
                )
            self._map_png = self._render_map(
                snap.get("poses", []), snap.get("kf_poses", []),
                cloud, cur.shape[1],
            )
        self._count += 1

        panel = np.concatenate([cur, kf_pane, self._map_png], axis=0)
        tmp = os.path.join(self.out_dir, ".live.tmp.png")
        cv2.imwrite(tmp, panel)
        os.replace(tmp, os.path.join(self.out_dir, "live.png"))
        if self.history:
            cv2.imwrite(
                os.path.join(
                    self.out_dir, f"live_{snap.get('frame', 0):06d}.png"
                ),
                panel,
            )

    def _render_map(
        self,
        poses: List[np.ndarray],
        kf_poses: List[np.ndarray],
        cloud: Optional[np.ndarray],
        width_px: int,
    ) -> np.ndarray:
        """Top-down trajectory + keyframes + cloud as a BGR image."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        dpi = 100
        fig, ax = plt.subplots(
            figsize=(width_px / dpi, max(width_px / dpi * 0.5, 2.4)), dpi=dpi
        )
        if cloud is not None and len(cloud):
            pts = cloud
            if len(pts) > 60000:
                idx = np.random.default_rng(0).choice(len(pts), 60000, replace=False)
                pts = pts[idx]
            ax.scatter(
                pts[:, 0], pts[:, 2], c=np.clip(pts[:, 3:6], 0, 1), s=0.3,
                linewidths=0,
            )
        if poses:
            xyz = np.array([T[:3, 3] for T in poses])
            ax.plot(xyz[:, 0], xyz[:, 2], color="tab:blue", linewidth=1.5)
        if kf_poses:
            kf = np.array([T[:3, 3] for T in kf_poses])
            ax.scatter(kf[:, 0], kf[:, 2], marker="s", s=20, color="tab:red", zorder=3)
        ax.set_aspect("equal")
        ax.grid(True, alpha=0.3)
        ax.set_title("trajectory + map (top-down)", fontsize=9)
        fig.tight_layout(pad=0.4)
        fig.canvas.draw()
        buf = np.asarray(fig.canvas.buffer_rgba())[:, :, :3]
        plt.close(fig)
        # Pad/crop to the panel width.
        hgt, wid = buf.shape[:2]
        if wid < width_px:
            pad = np.zeros((hgt, width_px - wid, 3), np.uint8)
            buf = np.concatenate([buf, pad], axis=1)
        elif wid > width_px:
            buf = buf[:, :width_px]
        return buf[:, :, ::-1].copy()  # RGB -> BGR
