"""Keyframe state: device pytree + host metadata (Keyframe struct, K10).

Reference equivalent: src/keyframe.* (SURVEY.md §2.1) — pose, fused
inverse-depth map with per-pixel variance, intensity image, validity mask,
point cloud, BoW descriptor. Here the dense planes live on device
(DeviceKeyframe pytree, HBM-resident); id/pose/features live on host
(Keyframe dataclass).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.camera import Intrinsics, level_intrinsics
from ..core.config import FusionConfig
from ..ops import gauss_newton, image
from ..tracking.frames import FrameLevel, KeyframeLevel


class DeviceKeyframe(NamedTuple):
    """Device-resident keyframe state (a pytree; fixed shapes)."""

    levels: Tuple[KeyframeLevel, ...]  # tracking template (I, xi, mask, J)
    var: jax.Array  # (H, W) per-pixel inverse-depth variance at level 0


def _template_levels(
    int_pyr, xi_pyr, mask_pyr, intr: Intrinsics, jac_dtype=jnp.float32,
    jacobian: str = "ic",
) -> Tuple[KeyframeLevel, ...]:
    out = []
    for l in range(len(int_pyr)):
        intr_l = level_intrinsics(intr, l)
        ones = jnp.ones_like(mask_pyr[l])
        gx_i, gy_i = image.gradients(int_pyr[l], ones)
        gx_x, gy_x = image.gradients(xi_pyr[l], mask_pyr[l])
        if jacobian == "esm":
            # ESM keeps only the 4 gradient planes; the warp Jacobian is
            # recomputed in-kernel from the template points.
            jac = jnp.stack([gx_i, gy_i, gx_x, gy_x]).astype(jac_dtype)
        else:
            jac = gauss_newton.template_jacobians(
                gx_i, gy_i, gx_x, gy_x, xi_pyr[l], mask_pyr[l], intr_l, jac_dtype
            )
        out.append(KeyframeLevel(int_pyr[l], xi_pyr[l], mask_pyr[l], jac))
    return tuple(out)


def create_device_keyframe(
    frame: Tuple[FrameLevel, ...],
    intr: Intrinsics,
    cfg: FusionConfig,
    jac_dtype=jnp.float32,
    jacobian: str = "ic",
) -> DeviceKeyframe:
    """Promote a preprocessed frame to a fresh keyframe (variance = sensor)."""
    int_pyr = [l.intensity for l in frame]
    xi_pyr = [l.xi for l in frame]
    mask_pyr = [l.mask for l in frame]
    levels = _template_levels(int_pyr, xi_pyr, mask_pyr, intr, jac_dtype, jacobian)
    var0 = jnp.where(
        frame[0].mask > 0, cfg.sensor_sigma_xi**2, cfg.max_variance
    ).astype(jnp.float32)
    return DeviceKeyframe(levels=levels, var=var0)


def rebuild_after_fusion(
    kf: DeviceKeyframe,
    xi0: jax.Array,
    var0: jax.Array,
    mask0: jax.Array,
    intr: Intrinsics,
    jac_dtype=jnp.float32,
    jacobian: str = "ic",
) -> DeviceKeyframe:
    """Rebuild the tracking template from the fused level-0 inverse depth.

    The intensity pyramid is untouched (fusion refines depth only, like the
    reference); the xi pyramid, masks and IC Jacobians are recomputed so
    tracking always runs against the latest fused (denoised) depth.
    """
    levels = len(kf.levels)
    int_pyr = [l.intensity for l in kf.levels]
    xi_pyr, mask_pyr = image.build_pyramid(xi0, mask0, levels)
    new_levels = _template_levels(int_pyr, xi_pyr, mask_pyr, intr, jac_dtype, jacobian)
    return DeviceKeyframe(levels=new_levels, var=var0)


@dataclass
class Keyframe:
    """Host-side keyframe record (metadata + finalized artifacts)."""

    kf_id: int
    timestamp: float
    T_wk: np.ndarray  # camera-to-world pose (updated by the pose graph)
    # Finalized dense artifacts (filled when the keyframe is retired or on
    # demand): point cloud (N, 6) xyz+rgb in keyframe coordinates.
    cloud: Optional[np.ndarray] = None
    # Place-recognition payload (filled by the back end).
    descriptors: Optional[np.ndarray] = None
    keypoints: Optional[np.ndarray] = None
    bow: Optional[dict] = None
    # Host copies of coarse pyramid planes for batched relocalization.
    reloc_planes: Optional[dict] = None


def extract_cloud(
    intensity0: np.ndarray,
    xi0: np.ndarray,
    mask0: np.ndarray,
    var0: np.ndarray,
    intr: Intrinsics,
    max_sigma: float = 0.05,
    stride: int = 1,
) -> np.ndarray:
    """K10: backproject the fused keyframe map -> (N, 6) xyz+rgb float32.

    Host-side compaction (boolean indexing) of a device-computed dense
    grid; gray intensity is replicated to rgb.
    """
    h, w = xi0.shape
    u, v = np.meshgrid(np.arange(w, dtype=np.float32), np.arange(h, dtype=np.float32))
    keep = (mask0 > 0) & (np.sqrt(np.maximum(var0, 0.0)) < max_sigma) & (xi0 > 1e-6)
    if stride > 1:
        sel = np.zeros_like(keep)
        sel[::stride, ::stride] = True
        keep &= sel
    z = 1.0 / np.maximum(xi0, 1e-6)
    x = (u - intr.cx) / intr.fx * z
    y = (v - intr.cy) / intr.fy * z
    g = np.clip(intensity0, 0.0, 1.0)
    pts = np.stack([x[keep], y[keep], z[keep], g[keep], g[keep], g[keep]], axis=1)
    return pts.astype(np.float32)
