"""Image-plane ops: preprocess (K1), masked Gaussian pyramid (K3),
gradients (K4).

XLA equivalents of the reference CUDA kernels preprocess.cu / pyramid.cu /
gradients.cu (SURVEY.md §2.2; reference mount empty, semantics from the
RGBiD-SLAM papers). All are memory-bound elementwise/conv ops — XLA fuses
them well, no Pallas needed (SURVEY.md §7 design stance 4).

Semantics exactly mirror rgbid_tpu.reference_cpu.odometry (the numpy
oracle); unit tests enforce <=1e-5 agreement.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

# K1 -----------------------------------------------------------------------


def intensity_from_rgb(rgb_u8: jax.Array) -> jax.Array:
    """(H, W, 3) uint8 RGB -> luma float32 in [0, 1] (BT.601)."""
    rgb = rgb_u8.astype(jnp.float32) * (1.0 / 255.0)
    return 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]


def inverse_depth_from_u16(
    depth_u16: jax.Array,
    depth_scale: float = 5000.0,
    min_depth: float = 0.3,
    max_depth: float = 10.0,
):
    """(xi, mask): xi = 1/meters where valid else 0; mask float32 {0,1}."""
    d = depth_u16.astype(jnp.float32) * (1.0 / depth_scale)
    mask = jnp.logical_and(d > min_depth, d < max_depth)
    xi = jnp.where(mask, 1.0 / jnp.maximum(d, 1e-6), 0.0)
    return xi, mask.astype(jnp.float32)


# K3 -----------------------------------------------------------------------

_BINOMIAL = jnp.array([1.0, 4.0, 6.0, 4.0, 1.0], jnp.float32) / 16.0


def _conv_sep(img: jax.Array, stride: tuple[int, int]) -> jax.Array:
    """Separable 5-tap binomial blur (zero padding) with optional stride.

    Equivalent to blur-then-subsample-at-even-indices when stride == 2.
    Accepts (H, W) or a batched (B, H, W) stack — the batch goes through
    ONE conv pair, which matters on TPU where each dispatched op carries a
    fixed cost (a 4-plane pyramid level is 2 convs instead of 8).
    """
    batched = img.ndim == 3
    x = img[:, None] if batched else img[None, None, :, :]
    # Two separable 1-D passes beat a single 5x5 conv here (measured
    # 224 vs 272 ms/frame system-wide on the sandbox emulator, which
    # prices convs by taps, not by op count).
    kv = _BINOMIAL.reshape(1, 1, 5, 1)
    kh = _BINOMIAL.reshape(1, 1, 1, 5)
    x = lax.conv_general_dilated(
        x, kv, window_strides=(stride[0], 1), padding=[(2, 2), (0, 0)]
    )
    x = lax.conv_general_dilated(
        x, kh, window_strides=(1, stride[1]), padding=[(0, 0), (2, 2)]
    )
    return x[:, 0] if batched else x[0, 0]


def masked_blur(img: jax.Array, mask: jax.Array, stride: tuple[int, int] = (1, 1)):
    """Validity-renormalized blur: blur(img*m)/blur(m); returns (out, weight)."""
    num = _conv_sep(img * mask, stride)
    den = _conv_sep(mask, stride)
    out = jnp.where(den > 1e-6, num / jnp.maximum(den, 1e-6), 0.0)
    return out, den


def _up2_axis(x: jax.Array, axis: int) -> jax.Array:
    """2x linear upsample along ``axis``: out[2i] = x[i] (exact),
    out[2i+1] = (x[i] + x[i+1]) / 2 (edge-clamped). Interleave rides a
    stack+reshape (layout ops, no gathers)."""
    n = x.shape[axis]
    nxt = lax.concatenate(
        [lax.slice_in_dim(x, 1, n, axis=axis),
         lax.slice_in_dim(x, n - 1, n, axis=axis)],
        dimension=axis,
    )
    mid = 0.5 * (x + nxt)
    out = jnp.stack([x, mid], axis=axis + 1)
    shape = list(x.shape)
    shape[axis] = 2 * n
    return out.reshape(shape)


def upsample2x_renorm(xi: jax.Array, mask: jax.Array):
    """Validity-renormalized bilinear 2x upsample of a sparse-valid field.

    (H, W) -> (2H, 2W). Even output coordinates reproduce the input
    EXACTLY where valid (num/den = xi*m/m); odd coordinates interpolate
    over the valid neighbors only (renorm by the upsampled mask), so a
    valid/invalid boundary copies the valid side instead of bleeding
    zeros. Output mask = any contributing input pixel valid.

    Used by the half-resolution depth upload codec ("u16h", non-default:
    at pipeline_depth 32 the upload DMA overlaps compute and byte savings
    buy nothing — measured record in BASELINE.md round 4 session 4).
    """
    num = _up2_axis(_up2_axis(xi * mask, 0), 1)
    den = _up2_axis(_up2_axis(mask, 0), 1)
    out = jnp.where(den > 1e-6, num / jnp.maximum(den, 1e-6), 0.0)
    return out, (den > 1e-6).astype(jnp.float32)


def downsample(img: jax.Array, mask: jax.Array, min_weight: float = 0.25):
    """One pyramid step: masked blur + 2x subsample (stride-2 convs)."""
    out, wgt = masked_blur(img, mask, stride=(2, 2))
    sub_mask = mask[::2, ::2]
    out_mask = jnp.logical_and(wgt > min_weight, sub_mask > 0.5).astype(jnp.float32)
    return out, out_mask


def downsample_multi(imgs, masks, min_weight: float = 0.25):
    """Masked downsample of P plane/mask pairs in ONE batched conv pass."""
    P = len(imgs)
    stack = jnp.stack([imgs[i] * masks[i] for i in range(P)] + list(masks))
    blurred = _conv_sep(stack, (2, 2))
    nums, dens = blurred[:P], blurred[P:]
    outs, out_masks = [], []
    for i in range(P):
        out = jnp.where(dens[i] > 1e-6, nums[i] / jnp.maximum(dens[i], 1e-6), 0.0)
        sub_mask = masks[i][::2, ::2]
        outs.append(out)
        out_masks.append(
            jnp.logical_and(dens[i] > min_weight, sub_mask > 0.5).astype(jnp.float32)
        )
    return outs, out_masks


import functools

import numpy as _np


@functools.lru_cache(maxsize=None)
def _ones_blur_inv_np(h: int, w: int):
    """1 / (stride-2 zero-pad binomial blur of an all-ones (h, w) plane).

    Input-independent border-renormalization constant for unmasked
    pyramids: lets the intensity pyramid skip its mask-blur convs
    entirely (the mask is all-ones at every level).
    """
    b = _np.array([1.0, 4.0, 6.0, 4.0, 1.0], _np.float64) / 16.0

    def blur1d(x, axis):
        out = _np.zeros_like(x)
        for k, c in enumerate(b):
            sh = k - 2
            src = _np.roll(x, -sh, axis=axis)
            idx = [slice(None)] * x.ndim
            if sh > 0:
                idx[axis] = slice(x.shape[axis] - sh, None)
            elif sh < 0:
                idx[axis] = slice(0, -sh)
            if sh != 0:
                src[tuple(idx)] = 0.0
            out += c * src
        return out

    den = blur1d(blur1d(_np.ones((h, w)), 0), 1)[::2, ::2]
    return (1.0 / den).astype(_np.float32)


def downsample_unmasked(img: jax.Array):
    """Pyramid step for a plane defined everywhere (e.g. intensity):
    one conv pair + a constant border renormalization — bit-equivalent to
    downsample(img, ones) but half the convs."""
    h, w = img.shape
    out = _conv_sep(img, (2, 2)) * jnp.asarray(_ones_blur_inv_np(h, w))
    return out


def build_pyramid_unmasked(img: jax.Array, levels: int):
    imgs = [img]
    for _ in range(levels - 1):
        imgs.append(downsample_unmasked(imgs[-1]))
    return imgs


def build_pyramid(img: jax.Array, mask: jax.Array, levels: int):
    """Lists [L0..L_{levels-1}] of (img, mask) — mask is float32 {0,1}."""
    imgs, masks = [img], [mask]
    for _ in range(levels - 1):
        i2, m2 = downsample(imgs[-1], masks[-1])
        imgs.append(i2)
        masks.append(m2)
    return imgs, masks


def build_pyramids_multi(imgs, masks, levels: int):
    """P joint pyramids with one batched conv pass per level.

    Returns (pyramids, mask_pyramids): lists of per-level lists.
    """
    cur_i, cur_m = list(imgs), list(masks)
    out_i = [cur_i]
    out_m = [cur_m]
    for _ in range(levels - 1):
        cur_i, cur_m = downsample_multi(cur_i, cur_m)
        out_i.append(cur_i)
        out_m.append(cur_m)
    # transpose to per-plane pyramids
    P = len(imgs)
    pyrs = [[out_i[l][p] for l in range(levels)] for p in range(P)]
    mpyrs = [[out_m[l][p] for l in range(levels)] for p in range(P)]
    return pyrs, mpyrs


# K4 -----------------------------------------------------------------------


def _pad1(x: jax.Array, axis: int) -> jax.Array:
    """Zero-pad one element on both sides of ``axis`` (negative index)."""
    cfg = [(0, 0)] * x.ndim
    cfg[axis] = (1, 1)
    return jnp.pad(x, cfg)


def gradients(img: jax.Array, mask: jax.Array):
    """(gx, gy) masked central differences (zero at invalid/borders).

    Works on (H, W) planes or batched (..., H, W) stacks. Shift-concat
    formulation: an interior-slice + jnp.pad variant with ~half the
    plane-ops measured ~2.5 ms/frame SLOWER in the production VGA flight
    pipeline (round-3 A/B, 79.0 vs 76.4 ms median — pad breaks the XLA
    elementwise fusion the concat form gets), another probe-vs-production
    inversion (SURVEY.md Appendix D #1). Interior gx =
    0.5*(img[u+1]-img[u-1]) where both neighbors are valid, zero at
    borders/invalid — matches the numpy oracle.
    """
    zc = jnp.zeros_like(img[..., :, :1])
    zr = jnp.zeros_like(img[..., :1, :])
    gx = 0.5 * (
        jnp.concatenate([img[..., :, 1:], zc], -1)
        - jnp.concatenate([zc, img[..., :, :-1]], -1)
    )
    gy = 0.5 * (
        jnp.concatenate([img[..., 1:, :], zr], -2)
        - jnp.concatenate([zr, img[..., :-1, :]], -2)
    )
    mzc = jnp.zeros_like(mask[..., :, :1])
    mzr = jnp.zeros_like(mask[..., :1, :])
    ok_x = jnp.concatenate([mask[..., :, 1:], mzc], -1) * jnp.concatenate(
        [mzc, mask[..., :, :-1]], -1
    )
    ok_y = jnp.concatenate([mask[..., 1:, :], mzr], -2) * jnp.concatenate(
        [mzr, mask[..., :-1, :]], -2
    )
    # Zero the one-pixel border (numpy oracle leaves borders at 0).
    ok_x = ok_x.at[..., :, 0].set(0.0).at[..., :, -1].set(0.0)
    ok_y = ok_y.at[..., 0, :].set(0.0).at[..., -1, :].set(0.0)
    return gx * ok_x, gy * ok_y


def gradients_unmasked(img: jax.Array):
    """gradients() for a plane defined everywhere (e.g. intensity):
    skips the mask-product planes entirely (4 concat + 2 mul + 4 set
    fewer ops per call). Equivalent to gradients(img, ones) — use at
    every intensity call site. Border columns/rows still zero (the
    one-sided difference the concat form produces there is masked off in
    gradients(); here we zero it explicitly to stay bit-equivalent)."""
    zc = jnp.zeros_like(img[..., :, :1])
    zr = jnp.zeros_like(img[..., :1, :])
    gx = 0.5 * (
        jnp.concatenate([img[..., :, 1:], zc], -1)
        - jnp.concatenate([zc, img[..., :, :-1]], -1)
    )
    gy = 0.5 * (
        jnp.concatenate([img[..., 1:, :], zr], -2)
        - jnp.concatenate([zr, img[..., :-1, :]], -2)
    )
    gx = gx.at[..., :, 0].set(0.0).at[..., :, -1].set(0.0)
    gy = gy.at[..., 0, :].set(0.0).at[..., -1, :].set(0.0)
    return gx, gy
