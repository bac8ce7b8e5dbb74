"""SE(3) warping + bilinear sampling (K5's gather half, K2's remap).

The per-pixel backproject→transform→project math is pure elementwise XLA;
the bilinear sample is an XLA 2-D advanced-index gather. Per SURVEY.md §7
(measured: Pallas cannot lower dynamic per-pixel gather on this platform)
sampling stays in XLA and fused Pallas kernels consume pre-gathered planes.

Mirrors rgbid_tpu.reference_cpu.odometry.{warp_points,bilinear_sample}.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.camera import Intrinsics


def pixel_grid(h: int, w: int):
    u = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    v = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    return u, v


def backproject_grid(xi: jax.Array, intr: Intrinsics, row_offset=0):
    """Per-pixel camera points (X, Y, Z) from an inverse-depth plane.

    ``row_offset`` shifts the pixel grid's v coordinate — used by the
    row-sharded SPMD tracker, where each device holds a horizontal band
    of the keyframe and must backproject with GLOBAL row indices.
    """
    h, w = xi.shape
    u, v = pixel_grid(h, w)
    v = v + row_offset
    z = 1.0 / jnp.maximum(xi, 1e-8)
    x = (u - intr.cx) * (1.0 / intr.fx) * z
    y = (v - intr.cy) * (1.0 / intr.fy) * z
    return x, y, z


def transform_project(Px, Py, Pz, T: jax.Array, intr: Intrinsics):
    """Project precomputed template points through T (loop-variant half of
    warp_points — the backprojection P = dir * z is constant across IRLS
    iterations and should be hoisted out of the loop by the caller)."""
    R, t = T[:3, :3], T[:3, 3]
    xp = R[0, 0] * Px + R[0, 1] * Py + R[0, 2] * Pz + t[0]
    yp = R[1, 0] * Px + R[1, 1] * Py + R[1, 2] * Pz + t[1]
    zp = R[2, 0] * Px + R[2, 1] * Py + R[2, 2] * Pz + t[2]
    front = (zp > 1e-6).astype(jnp.float32)
    rho = 1.0 / jnp.maximum(zp, 1e-6)
    up = intr.fx * xp * rho + intr.cx
    vp = intr.fy * yp * rho + intr.cy
    return up, vp, rho, front


def warp_points(xi_ref: jax.Array, mask_ref: jax.Array, T: jax.Array, intr: Intrinsics):
    """Warp every reference pixel into the current frame.

    Returns (u', v', rho', (X', Y', Z'), valid) with rho' = 1/Z' the
    predicted current-frame inverse depth. valid = mask & in-front.
    """
    x, y, z = backproject_grid(xi_ref, intr)
    R, t = T[:3, :3], T[:3, 3]
    xp = R[0, 0] * x + R[0, 1] * y + R[0, 2] * z + t[0]
    yp = R[1, 0] * x + R[1, 1] * y + R[1, 2] * z + t[1]
    zp = R[2, 0] * x + R[2, 1] * y + R[2, 2] * z + t[2]
    front = (zp > 1e-6).astype(jnp.float32)
    rho = 1.0 / jnp.maximum(zp, 1e-6)
    up = intr.fx * xp * rho + intr.cx
    vp = intr.fy * yp * rho + intr.cy
    return up, vp, rho, (xp, yp, zp), mask_ref * front


# One stacked-index gather for all 4 bilinear corners (True) vs four
# separate corner gathers (False). The stacked form measured 16% faster
# in an isolated probe but 4 ms/frame SLOWER in the production flight
# pipeline (round-3 A/B: 83.1 vs 78.9 ms/frame on the VGA bench clip) —
# another probe-vs-production inversion (SURVEY.md Appendix D #1), so
# the split form stays the default. Semantics are bit-identical either
# way. This module global is the DEFAULT for call sites without a
# config (fusion's once-per-fused-frame pass, relocalization); the
# per-iteration tracker hot path reads TrackingConfig.stacked_gather
# and passes it explicitly (round 4 — the real-v5e preset flips it in
# one switch instead of a module-global archaeology exercise).
STACKED_GATHER = False


def _corner_weights(u, v, h, w):
    """Shared bilinear-corner setup: clamped integer corners + weights."""
    inb = (
        (u >= 0.0) & (u <= w - 1.001) & (v >= 0.0) & (v <= h - 1.001)
    ).astype(jnp.float32)
    uc = jnp.clip(u, 0.0, w - 1.001)
    vc = jnp.clip(v, 0.0, h - 1.001)
    u0 = jnp.floor(uc).astype(jnp.int32)
    v0 = jnp.floor(vc).astype(jnp.int32)
    fu = uc - u0.astype(jnp.float32)
    fv = vc - v0.astype(jnp.float32)
    u1 = jnp.minimum(u0 + 1, w - 1)
    v1 = jnp.minimum(v0 + 1, h - 1)
    return inb, u0, v0, u1, v1, fu, fv


def _gather_corners(stack: jax.Array, u0, v0, u1, v1, stacked=None):
    """Gather the 4 bilinear corners of a (C, H, W) stack.

    Returns (C, 4, H, W) in corner order [00, 01, 10, 11]. ``stacked``
    overrides the module-global STACKED_GATHER default (trace-time
    static)."""
    if STACKED_GATHER if stacked is None else stacked:
        vs = jnp.stack([v0, v0, v1, v1])
        us = jnp.stack([u0, u1, u0, u1])
        return stack[:, vs, us]
    return jnp.stack(
        [
            stack[:, v0, u0],
            stack[:, v0, u1],
            stack[:, v1, u0],
            stack[:, v1, u1],
        ],
        axis=1,
    )


def sample_tracker_planes(
    stack3: jax.Array, u: jax.Array, v: jax.Array, stacked=None
):
    """Sample [intensity, xi, mask] (3, H, W) at shared (u, v) with ONE
    stacked corner gather (vs 12 gathers when sampling the planes
    separately — on the sandbox TPU every gather op carries a multi-ms
    fixed cost).

    From the same gathered corners: bilinear blend for intensity/xi, and
    exact all-4-corners product for the {0,1} validity mask (identical
    semantics to bilinear_sample(img, mask, ...)).

    Returns (i_s, xi_s, mask_ok, inb), each (H, W).
    """
    _, h, w = stack3.shape
    inb, u0, v0, u1, v1, fu, fv = _corner_weights(u, v, h, w)
    s = _gather_corners(stack3, u0, v0, u1, v1, stacked)  # (3, 4, H, W)
    cw = jnp.stack(
        [(1 - fu) * (1 - fv), fu * (1 - fv), (1 - fu) * fv, fu * fv]
    )
    blend = (s * cw[None]).sum(axis=1)
    mask_ok = s[2].prod(axis=0)
    return blend[0], blend[1], mask_ok, inb


def sample_stack7(stack7: jax.Array, u: jax.Array, v: jax.Array, stacked=None):
    """Like sample_tracker_planes but for the 7-channel ESM stack
    [I, xi, mask, gxI, gyI, gxXi, gyXi]: one stacked corner gather;
    channel 2 (mask) gets exact all-corners product semantics, the rest
    bilinear.

    Returns (blend (7, H, W), mask_ok (H, W), inb (H, W)).
    """
    _, h, w = stack7.shape
    inb, u0, v0, u1, v1, fu, fv = _corner_weights(u, v, h, w)
    s = _gather_corners(stack7, u0, v0, u1, v1, stacked)  # (C, 4, H, W)
    cw = jnp.stack(
        [(1 - fu) * (1 - fv), fu * (1 - fv), (1 - fu) * fv, fu * fv]
    )
    blend = (s * cw[None]).sum(axis=1)
    mask_ok = s[2].prod(axis=0)
    return blend, mask_ok, inb


def bilinear_sample(img: jax.Array, mask: jax.Array | None, u: jax.Array, v: jax.Array):
    """Bilinear sample at continuous (u, v); XLA gather.

    valid = in-bounds, and (if mask given) all 4 corner pixels valid.
    Returns (value, valid_f32).
    """
    h, w = img.shape
    inb = (
        (u >= 0.0) & (u <= w - 1.001) & (v >= 0.0) & (v <= h - 1.001)
    ).astype(jnp.float32)
    uc = jnp.clip(u, 0.0, w - 1.001)
    vc = jnp.clip(v, 0.0, h - 1.001)
    u0 = jnp.floor(uc).astype(jnp.int32)
    v0 = jnp.floor(vc).astype(jnp.int32)
    fu = uc - u0.astype(jnp.float32)
    fv = vc - v0.astype(jnp.float32)
    u1 = jnp.minimum(u0 + 1, w - 1)
    v1 = jnp.minimum(v0 + 1, h - 1)
    i00 = img[v0, u0]
    i01 = img[v0, u1]
    i10 = img[v1, u0]
    i11 = img[v1, u1]
    val = (
        i00 * (1 - fu) * (1 - fv)
        + i01 * fu * (1 - fv)
        + i10 * (1 - fu) * fv
        + i11 * fu * fv
    )
    ok = inb
    if mask is not None:
        m00 = mask[v0, u0]
        m01 = mask[v0, u1]
        m10 = mask[v1, u0]
        m11 = mask[v1, u1]
        ok = ok * m00 * m01 * m10 * m11
    return val, ok
