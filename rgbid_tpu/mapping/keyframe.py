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
    """Device-resident keyframe state (a pytree; fixed shapes).

    The template levels carry the CONFIRMED mask (hits >= confirm_hits —
    what tracking and cloud extraction may trust); ``mask_full`` is the
    superset of every pixel with a depth estimate, including provisional
    claims from the validity-growth pass, and is what fusion refines
    (SURVEY.md §2.2 K8 "update validity & hit counts")."""

    levels: Tuple[KeyframeLevel, ...]  # tracking template (I, xi, mask, J)
    var: jax.Array  # (H, W) per-pixel inverse-depth variance at level 0
    # Number of frames fused into this keyframe so far (drives the
    # amortized coarse-level template rebuild schedule).
    fused_count: jax.Array = None  # () int32
    # (H, W) per-pixel observation-support counts. Founding pixels are
    # direct sensor measurements and start at confirm_hits (trusted,
    # like the reference); claimed hole-fill pixels start at 1 and each
    # successful fuse adds 1.
    hits: jax.Array = None
    # (H, W) full estimate-validity mask (confirmed + provisional).
    mask_full: jax.Array = None


def _template_levels(
    int_pyr, xi_pyr, mask_pyr, intr: Intrinsics, jac_dtype=jnp.float32,
    jacobian: str = "ic",
) -> Tuple[KeyframeLevel, ...]:
    out = []
    for l in range(len(int_pyr)):
        intr_l = level_intrinsics(intr, l)
        gx_i, gy_i = image.gradients_unmasked(int_pyr[l])
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
    confirm = float(getattr(cfg, "confirm_hits", 2.0))
    mask0 = frame[0].mask.astype(jnp.float32)
    return DeviceKeyframe(
        levels=levels,
        var=var0,
        fused_count=jnp.asarray(0, jnp.int32),
        hits=confirm * mask0,
        mask_full=mask0,
    )


def _rebuild_level0(
    old: KeyframeLevel,
    xi0: jax.Array,
    mask0: jax.Array,
    intr: Intrinsics,
    jac_dtype,
    jacobian: str,
) -> KeyframeLevel:
    """Finest-level template refresh from the fused inverse depth.

    Intensity (and hence its gradients) never changes under fusion, so ESM
    reuses the stored intensity-gradient planes and only recomputes the
    two xi-gradient planes; IC recomputes its Jacobian field (which mixes
    intensity gradients with the xi-dependent warp Jacobian).
    """
    gx_x, gy_x = image.gradients(xi0, mask0)
    if jacobian == "esm":
        jac = jnp.concatenate(
            [old.jac[:2], jnp.stack([gx_x, gy_x]).astype(jac_dtype)], axis=0
        )
    else:
        gx_i, gy_i = image.gradients_unmasked(old.intensity)
        jac = gauss_newton.template_jacobians(
            gx_i, gy_i, gx_x, gy_x, xi0, mask0, intr, jac_dtype
        )
    return KeyframeLevel(old.intensity, xi0, mask0, jac)


def rebuild_after_fusion(
    kf: DeviceKeyframe,
    xi0: jax.Array,
    var0: jax.Array,
    mask0: jax.Array,
    intr: Intrinsics,
    jac_dtype=jnp.float32,
    jacobian: str = "ic",
    coarse_every: int = 1,
    hits: jax.Array | None = None,
    confirm_hits: float = 2.0,
    fine_every: int = 1,
) -> DeviceKeyframe:
    """Rebuild the tracking template from the fused level-0 inverse depth.

    ``mask0`` is the FULL estimate mask (confirmed + provisional claims);
    when ``hits`` is given, the template the tracker sees is gated to
    CONFIRMED pixels only (hits >= confirm_hits) — a freshly claimed
    hole-fill pixel must be re-observed before tracking trusts it.

    The intensity pyramid is untouched (fusion refines depth only, like the
    reference). The finest level is refreshed EVERY fused frame (it sets
    tracking accuracy); the coarse xi pyramid + gradients are refreshed
    every ``coarse_every`` fused frames (lax.cond) — coarse levels only
    seed the coarse-to-fine schedule, so a few frames of depth staleness
    there is invisible to the final pose while the full per-frame pyramid
    rebuild was round 1's single biggest frame-time sink.
    """
    levels = len(kf.levels)
    count = kf.fused_count + 1
    if hits is not None:
        tmask = mask0 * (hits >= confirm_hits).astype(jnp.float32)
    else:
        tmask = mask0
        hits = kf.hits
    if fine_every <= 1:
        new0 = _rebuild_level0(
            kf.levels[0], xi0, tmask, intr, jac_dtype, jacobian
        )
    else:
        # The fused xi/mask are the keyframe's STATE and must always be
        # stored; only the gradient/Jacobian recompute is amortized
        # (stale-by-one gradients, exact values).
        new0 = jax.lax.cond(
            count % fine_every == 0,
            lambda _: _rebuild_level0(
                kf.levels[0], xi0, tmask, intr, jac_dtype, jacobian
            ),
            lambda _: KeyframeLevel(
                kf.levels[0].intensity, xi0, tmask, kf.levels[0].jac
            ),
            None,
        )
    if levels == 1:
        return DeviceKeyframe(
            levels=(new0,), var=var0, fused_count=count,
            hits=hits, mask_full=mask0,
        )

    def full_coarse(_):
        int_pyr = [l.intensity for l in kf.levels]
        xi_pyr, mask_pyr = image.build_pyramid(xi0, tmask, levels)
        return tuple(
            _template_levels(int_pyr, xi_pyr, mask_pyr, intr, jac_dtype, jacobian)[1:]
        )

    def keep_coarse(_):
        return tuple(kf.levels[1:])

    if coarse_every <= 1:
        coarse = full_coarse(None)
    else:
        coarse = jax.lax.cond(
            count % coarse_every == 0, full_coarse, keep_coarse, None
        )
    return DeviceKeyframe(
        levels=(new0,) + coarse, var=var0, fused_count=count,
        hits=hits, mask_full=mask0,
    )


@dataclass
class Keyframe:
    """Host-side keyframe record (metadata + finalized artifacts)."""

    kf_id: int
    timestamp: float
    T_wk: np.ndarray  # camera-to-world pose (updated by the pose graph)
    # Host copy of the founding frame's color image (H, W, 3) u8 — the
    # fused keyframe refines depth only, so this stays the keyframe's
    # color for ORB features and colored map export (the reference's
    # keyframes carry the color image; SURVEY.md §2.1 Keyframe struct).
    rgb: Optional[np.ndarray] = None
    # Host copy of the founding frame's raw depth (H, W) u16 — used only by
    # the live viewer's keyframe pane (the fused inverse depth lives on
    # device and is never read back per frame).
    depth: Optional[np.ndarray] = None
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
    intensity0: Optional[np.ndarray],
    xi0: np.ndarray,
    mask0: np.ndarray,
    var0: np.ndarray,
    intr: Intrinsics,
    max_sigma: float = 0.05,
    stride: int = 1,
    rgb: Optional[np.ndarray] = None,
    grid_step: int = 1,
) -> np.ndarray:
    """K10: backproject the fused keyframe map -> (N, 6) xyz+rgb float32.

    Host-side compaction (boolean indexing) of a device-computed dense
    grid. When the keyframe's host color image ``rgb`` (H, W, 3 u8) is
    given the cloud carries real colors (like the reference's colored
    keyframe clouds); else gray intensity is replicated to rgb.

    ``grid_step`` declares that the input planes were PRE-STRIDED by
    that factor (device-side subsampling in the finalize readback):
    pixel (i, j) of the planes is pixel (i*grid_step, j*grid_step) of
    the full image, so the backprojection grid scales accordingly.
    Equivalent to stride=grid_step on full planes, at 1/grid_step^2 the
    readback bytes.
    """
    h, w = xi0.shape
    u, v = np.meshgrid(
        np.arange(w, dtype=np.float32) * grid_step,
        np.arange(h, dtype=np.float32) * grid_step,
    )
    keep = (mask0 > 0) & (np.sqrt(np.maximum(var0, 0.0)) < max_sigma) & (xi0 > 1e-6)
    if stride > 1:
        sel = np.zeros_like(keep)
        sel[::stride, ::stride] = True
        keep &= sel
    z = 1.0 / np.maximum(xi0, 1e-6)
    x = (u - intr.cx) / intr.fx * z
    y = (v - intr.cy) / intr.fy * z
    if rgb is not None:
        c = rgb.astype(np.float32) * (1.0 / 255.0)
        cols = [c[..., 0][keep], c[..., 1][keep], c[..., 2][keep]]
    else:
        g = np.clip(intensity0, 0.0, 1.0)
        cols = [g[keep], g[keep], g[keep]]
    pts = np.stack([x[keep], y[keep], z[keep]] + cols, axis=1)
    return pts.astype(np.float32)
