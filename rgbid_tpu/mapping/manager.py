"""Host-side keyframe lifecycle (KeyframeManager equivalent).

Reference: src/keyframe_manager.* (SURVEY.md §2.1) — creates keyframes,
drives fusion (which here happens inside the fused device step), finalizes
retiring keyframes (cloud extraction) and hands them to the back end.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, List, Optional

import numpy as np

from ..core.camera import Intrinsics
from .keyframe import DeviceKeyframe, Keyframe, extract_cloud


@dataclass
class OdometryEdge:
    """Relative SE(3) constraint between consecutive keyframes."""

    from_id: int
    to_id: int
    T_rel: np.ndarray  # T_{from<-to}: maps to-frame points into from-frame
    information: np.ndarray  # 6x6


class KeyframeManager:
    """Tracks host keyframe records; finalizes retired keyframes."""

    def __init__(
        self,
        intr: Intrinsics,
        cloud_stride: int = 2,
        cloud_max_sigma: float = 0.05,
        reloc_level: int = 2,
        on_finalize: Optional[Callable[[Keyframe], None]] = None,
    ):
        self.intr = intr
        self.cloud_stride = cloud_stride
        self.cloud_max_sigma = cloud_max_sigma
        self.reloc_level = reloc_level
        self.on_finalize = on_finalize
        self.keyframes: List[Keyframe] = []
        self.edges: List[OdometryEdge] = []

    @property
    def active(self) -> Keyframe:
        return self.keyframes[-1]

    def new_keyframe(self, timestamp: float, T_wk: np.ndarray) -> Keyframe:
        kf = Keyframe(kf_id=len(self.keyframes), timestamp=timestamp, T_wk=T_wk.copy())
        self.keyframes.append(kf)
        return kf

    def add_odometry_edge(self, from_id: int, to_id: int, T_rel: np.ndarray, info: np.ndarray):
        self.edges.append(OdometryEdge(from_id, to_id, T_rel.copy(), info.copy()))

    def finalize(self, kf: Keyframe, device_state: DeviceKeyframe) -> Keyframe:
        """Read back the fused keyframe planes and extract artifacts.

        Called on keyframe retirement (switch) and at shutdown — a few VGA
        readbacks per keyframe event, never per frame.
        """
        lvl0 = device_state.levels[0]
        xi0 = np.asarray(lvl0.xi)
        mask0 = np.asarray(lvl0.mask) > 0.5
        var0 = np.asarray(device_state.var)
        # Color from the host-kept founding frame; when present the
        # finest-level device intensity plane need not be read back at all
        # (gray for ORB comes from the same host image).
        intensity0 = None if kf.rgb is not None else np.asarray(lvl0.intensity)
        kf.cloud = extract_cloud(
            intensity0,
            xi0,
            mask0,
            var0,
            self.intr,
            max_sigma=self.cloud_max_sigma,
            stride=self.cloud_stride,
            rgb=kf.rgb,
        )
        if kf.rgb is not None:
            try:
                import cv2

                gray_u8 = cv2.cvtColor(
                    np.ascontiguousarray(kf.rgb), cv2.COLOR_RGB2GRAY
                )
            except Exception:
                f = kf.rgb.astype(np.float32)
                gray_u8 = np.clip(
                    0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2] + 0.5,
                    0,
                    255,
                ).astype(np.uint8)
        else:
            gray_u8 = np.clip(intensity0 * 255.0, 0, 255).astype(np.uint8)
        # Host copies of the coarse planes for place recognition + batched
        # relocalization scoring (SURVEY.md §3.5).
        li = device_state.levels[min(self.reloc_level, len(device_state.levels) - 1)]
        kf.reloc_planes = {
            "intensity": np.asarray(li.intensity),
            "xi": np.asarray(li.xi),
            "mask": np.asarray(li.mask),
            "intensity0_u8": gray_u8,
        }
        if self.on_finalize is not None:
            self.on_finalize(kf)
        return kf
