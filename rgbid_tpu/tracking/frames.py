"""Device-resident frame/keyframe pyramids (pytrees).

Equivalent of the reference's per-frame device buffers + Keyframe struct
device half (SURVEY.md §2.1): all pyramid planes live in HBM for the whole
frame lifetime; only diagnostics scalars ever return to the host.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..core.camera import Intrinsics, level_intrinsics
from ..ops import gauss_newton, image


class FrameLevel(NamedTuple):
    """One pyramid level of an incoming frame."""

    intensity: jax.Array  # (H, W) f32 [0, 1]
    xi: jax.Array  # (H, W) f32 inverse depth (0 where invalid)
    mask: jax.Array  # (H, W) f32 {0, 1}
    # ESM mode only: the channel stack sampled jointly (4 corner gathers
    # total) per IRLS iteration. Channel count by level (consumers
    # dispatch on it; see config.TrackingConfig.esm_min_level /
    # esm_geo_min_level):
    #   level >= esm_geo_min_level: (7, H, W) [I, xi, mask, gxI, gyI,
    #       gxXi, gyXi] — ESM averaging on both channels;
    #   esm_min_level <= level < esm_geo_min_level: (5, H, W)
    #       [I, xi, mask, gxI, gyI] — averaging on intensity only,
    #       template gradients carry the geometric channel;
    #   level < esm_min_level: (3, H, W) [I, xi, mask] — template
    #       gradients for both channels.
    # None in IC mode.
    stack7: jax.Array | None = None


class KeyframeLevel(NamedTuple):
    """One pyramid level of the tracking template (active keyframe)."""

    intensity: jax.Array
    xi: jax.Array
    mask: jax.Array
    jac: jax.Array  # (12, H, W) IC template Jacobians (0-5 photo, 6-11 xi)


def preprocess_frame(
    rgb_u8: jax.Array,
    depth_u16: jax.Array,
    levels: int,
    depth_scale: float = 5000.0,
    min_depth: float = 0.3,
    max_depth: float = 10.0,
    esm: bool = False,
    esm_min_level: int = 0,
    plane_dtype=jnp.float32,
    esm_geo_min_level: int = 0,
) -> Tuple[FrameLevel, ...]:
    """K1 + K3: raw sensor planes -> intensity/inverse-depth pyramids.

    Runs entirely on device from the raw u8/u16 uploads (SURVEY.md §7
    stance 6: pack uploads raw, convert on device). Pass the config's
    ``esm_min_level``/``esm_geo_min_level`` to get pyramids structurally
    identical to the production program's (see FrameLevel.stack7 for the
    per-level channel layout). The standalone default (0) keeps the
    legacy full 7-plane stack at every ESM level; production callers
    pass the config values.
    """
    intensity = image.intensity_from_rgb(rgb_u8)
    xi, mask = image.inverse_depth_from_u16(depth_u16, depth_scale, min_depth, max_depth)
    return preprocess_planes(
        intensity, xi, mask, levels, esm, esm_min_level, plane_dtype,
        esm_geo_min_level,
    )


def preprocess_planes(
    intensity: jax.Array,
    xi: jax.Array,
    mask: jax.Array,
    levels: int,
    esm: bool = False,
    esm_min_level: int = 0,
    plane_dtype=jnp.float32,
    esm_geo_min_level: int = 0,
) -> Tuple[FrameLevel, ...]:
    """Pyramid construction from already-converted level-0 planes (the
    production path unpacks a gray-u8 + depth-u16 packed upload instead of
    full RGB — 0.9 MB vs 1.5 MB per VGA frame, and upload bytes are the
    sandbox's hard floor)."""
    # NOTE: the batched build_pyramids_multi variant is a net loss on the
    # emulated sandbox TPU (stack copies cost more than the saved conv
    # dispatches); on real hardware prefer the batched path.
    # Intensity is defined everywhere -> unmasked pyramid with constant
    # border renormalization (half the convs of the masked path).
    ints = image.build_pyramid_unmasked(intensity, levels)
    xis, masks = image.build_pyramid(xi, mask, levels)
    out = []
    for l in range(levels):
        stack7 = None
        if esm:
            # plane_dtype="bf16" stores the gather stack half-width: the
            # 4-corner bilinear gather re-reads it every IRLS iteration
            # and it dominates the finest level's per-iteration HBM
            # traffic. The blend weights are f32, so sampled values come
            # out f32 and all residual math downstream is unchanged; the
            # {0,1} mask channel is exact in bf16.
            if l >= esm_min_level:
                gx_i, gy_i = image.gradients_unmasked(ints[l])
                if l >= esm_geo_min_level:
                    gx_x, gy_x = image.gradients(xis[l], masks[l])
                    planes = [ints[l], xis[l], masks[l], gx_i, gy_i, gx_x, gy_x]
                else:
                    # 5-plane stack: ESM averaging on intensity only;
                    # the geometric channel uses template gradients —
                    # 29% fewer per-iteration gather bytes and two
                    # fewer gradient convs at this level
                    # (TrackingConfig.esm_geo_min_level).
                    planes = [ints[l], xis[l], masks[l], gx_i, gy_i]
                stack7 = jnp.stack(planes).astype(plane_dtype)
            else:
                # Template-gradient levels: no current-frame gradients are
                # sampled, so materialize only the 3 tracker planes.
                stack7 = jnp.stack(
                    [ints[l], xis[l], masks[l]]
                ).astype(plane_dtype)
        out.append(FrameLevel(ints[l], xis[l], masks[l], stack7))
    return tuple(out)


def keyframe_pyramid(
    frame: Tuple[FrameLevel, ...],
    intr: Intrinsics,
    jacobian: str = "ic",
    jac_dtype=jnp.float32,
) -> Tuple[KeyframeLevel, ...]:
    """Promote a frame pyramid to a tracking template (runs once per
    keyframe; K4 + Jacobian precompute).

    ``jacobian`` selects the template layout and MUST match the tracker
    config: "ic" stores the (12, H, W) inverse-compositional Jacobian
    field; "esm" stores the 4 gradient planes the ESM kernels expect
    (the production path builds these via mapping.keyframe). The
    historical default stays "ic" — existing callers pinned IC configs.
    """
    out = []
    for l, lev in enumerate(frame):
        intr_l = level_intrinsics(intr, l)
        gx_i, gy_i = image.gradients_unmasked(lev.intensity)
        gx_x, gy_x = image.gradients(lev.xi, lev.mask)
        if jacobian == "esm":
            jac = jnp.stack([gx_i, gy_i, gx_x, gy_x]).astype(jac_dtype)
        else:
            jac = gauss_newton.template_jacobians(
                gx_i, gy_i, gx_x, gy_x, lev.xi, lev.mask, intr_l, jac_dtype
            )
        out.append(KeyframeLevel(lev.intensity, lev.xi, lev.mask, jac))
    return tuple(out)
