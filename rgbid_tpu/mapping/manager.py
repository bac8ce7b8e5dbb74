"""Host-side keyframe lifecycle (KeyframeManager equivalent).

Reference: src/keyframe_manager.* (SURVEY.md §2.1) — creates keyframes,
drives fusion (which here happens inside the fused device step), finalizes
retiring keyframes (cloud extraction) and hands them to the back end.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Callable, List, Optional

import numpy as np

from ..core.camera import Intrinsics
from .keyframe import DeviceKeyframe, Keyframe, extract_cloud


@functools.lru_cache(maxsize=None)
def _packer(stride: int = 1):
    """Jitted concat of finalize's plane reads into ONE vector: on the
    sandbox TPU every first read of a device value costs ~28 ms
    REGARDLESS of size, so finalize's six plane reads were ~170 ms per
    keyframe switch (measured round 3: ~250 ms/switch total, ~29 ms/frame
    amortized on switch-heavy clips). One packed read pays the fixed
    cost once plus bytes.

    ``stride`` subsamples the first three (level-0) planes ON DEVICE
    before the read: the only consumer of the full-resolution level-0
    planes is cloud extraction, which strides by cloud_stride anyway —
    striding device-side cuts the readback bytes 4x at the default
    stride 2 (3.9 -> 1.1 MB at VGA; D2H bytes price like uploads,
    ~25-40 MB/s on this platform) with a bit-identical cloud."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def pack(*planes):
        out = []
        for i, p in enumerate(planes):
            if i < 3 and stride > 1:
                p = p[::stride, ::stride]
            out.append(jnp.ravel(p))
        return jnp.concatenate(out)

    return pack


@dataclass
class OdometryEdge:
    """Relative SE(3) constraint between consecutive keyframes."""

    from_id: int
    to_id: int
    T_rel: np.ndarray  # T_{from<-to}: maps to-frame points into from-frame
    information: np.ndarray  # 6x6 (already episode-scaled if episode)
    # Diagnostic: the inter-keyframe interval saw consensus activity, so
    # ``information`` was scaled by BackendConfig.episode_info_scale.
    episode: bool = False


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

    def add_odometry_edge(
        self, from_id: int, to_id: int, T_rel: np.ndarray, info: np.ndarray,
        episode: bool = False,
    ):
        self.edges.append(
            OdometryEdge(from_id, to_id, T_rel.copy(), info.copy(), episode)
        )

    def finalize(self, kf: Keyframe, device_state: DeviceKeyframe) -> Keyframe:
        """Read back the fused keyframe planes and extract artifacts.

        Called on keyframe retirement (switch) and at shutdown — a few VGA
        readbacks per keyframe event, never per frame.
        """
        lvl0 = device_state.levels[0]
        li = device_state.levels[
            min(self.reloc_level, len(device_state.levels) - 1)
        ]
        # ONE batched device read for all six finalize planes; the
        # level-0 planes come back pre-strided by cloud_stride (their
        # only consumer is the strided cloud extraction).
        s = max(self.cloud_stride, 1)
        packed = np.asarray(
            _packer(s)(
                lvl0.xi, lvl0.mask, device_state.var,
                li.intensity, li.xi, li.mask,
            )
        )
        h0, w0 = lvl0.xi.shape
        hs, ws = len(range(0, h0, s)), len(range(0, w0, s))
        hl, wl = li.xi.shape
        n0 = hs * ws
        nl = hl * wl
        o = 0
        xi0 = packed[o : o + n0].reshape(hs, ws); o += n0
        mask0 = packed[o : o + n0].reshape(hs, ws) > 0.5; o += n0
        var0 = packed[o : o + n0].reshape(hs, ws); o += n0
        li_int = packed[o : o + nl].reshape(hl, wl); o += nl
        li_xi = packed[o : o + nl].reshape(hl, wl); o += nl
        li_mask = packed[o : o + nl].reshape(hl, wl); o += nl
        # Color from the host-kept founding frame; when present the
        # finest-level device intensity plane need not be read back at all
        # (gray for ORB comes from the same host image).
        intensity0 = None if kf.rgb is not None else np.asarray(lvl0.intensity)
        kf.cloud = extract_cloud(
            intensity0[::s, ::s] if intensity0 is not None else None,
            xi0,
            mask0,
            var0,
            self.intr,
            max_sigma=self.cloud_max_sigma,
            stride=1,
            rgb=kf.rgb[::s, ::s] if kf.rgb is not None else None,
            grid_step=s,
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
        # relocalization scoring (SURVEY.md §3.5) — from the same packed
        # read as the level-0 planes above.
        kf.reloc_planes = {
            "intensity": li_int,
            "xi": li_xi,
            "mask": li_mask,
            "intensity0_u8": gray_u8,
        }
        if self.on_finalize is not None:
            self.on_finalize(kf)
        return kf
