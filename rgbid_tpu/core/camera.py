"""Pinhole camera model with per-pyramid-level intrinsics.

TPU-native equivalent of the reference's calibration component
(SURVEY.md §2.1 "Calibration / undistortion": per-level intrinsic scaling
fx/2^l, ...; reference mount empty, structure reconstructed from the
RGBiD-SLAM papers).

The intrinsics are a small NamedTuple pytree so they can be passed through
jit boundaries and closed over without triggering retraces.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Intrinsics(NamedTuple):
    fx: float
    fy: float
    cx: float
    cy: float
    width: int
    height: int


# Default TUM fr1-style calibration (freiburg1 sequences). Used when a
# dataset provides no explicit calibration, matching the reference's
# bundled default calibration files.
TUM_FR1 = Intrinsics(fx=517.3, fy=516.5, cx=318.6, cy=255.3, width=640, height=480)
TUM_FR2 = Intrinsics(fx=520.9, fy=521.0, cx=325.1, cy=249.7, width=640, height=480)
TUM_FR3 = Intrinsics(fx=535.4, fy=539.2, cx=320.1, cy=247.6, width=640, height=480)
DEFAULT = Intrinsics(fx=525.0, fy=525.0, cx=319.5, cy=239.5, width=640, height=480)


def level_shape(height: int, width: int, level: int) -> tuple[int, int]:
    """(H, W) of pyramid level ``level`` (level 0 = full resolution)."""
    h, w = height, width
    for _ in range(level):
        h = (h + 1) // 2
        w = (w + 1) // 2
    return h, w


def level_intrinsics(intr: Intrinsics, level: int) -> Intrinsics:
    """Intrinsics for a pyramid level.

    Follows the standard half-pixel-center convention: a level-l pixel center
    u_l corresponds to full-res coordinate u_0 = 2^l * (u_l + 0.5) - 0.5,
    so  f_l = f / 2^l  and  c_l = (c + 0.5)/2^l - 0.5.
    """
    s = float(2**level)
    h, w = level_shape(intr.height, intr.width, level)
    return Intrinsics(
        fx=intr.fx / s,
        fy=intr.fy / s,
        cx=(intr.cx + 0.5) / s - 0.5,
        cy=(intr.cy + 0.5) / s - 0.5,
        width=w,
        height=h,
    )


def pixel_grid(h: int, w: int, dtype=jnp.float32):
    """(u, v) coordinate planes of shape (h, w)."""
    v = jnp.arange(h, dtype=dtype)[:, None] * jnp.ones((1, w), dtype=dtype)
    u = jnp.ones((h, 1), dtype=dtype) * jnp.arange(w, dtype=dtype)[None, :]
    return u, v


def backproject(u, v, xi, intr: Intrinsics):
    """Pixel (u, v) with inverse depth xi -> camera-frame point (X, Y, Z).

    Inverse-depth parametrization (the reference's core idea): Z = 1/xi.
    Invalid pixels (xi <= 0) must be masked by the caller; here xi is clamped
    away from zero to stay NaN-free under jit.
    """
    z = 1.0 / jnp.maximum(xi, 1e-8)
    x = (u - intr.cx) / intr.fx * z
    y = (v - intr.cy) / intr.fy * z
    return x, y, z


def project(x, y, z, intr: Intrinsics):
    """Camera-frame point -> (u, v, rho) with rho = 1/Z the inverse depth."""
    rho = 1.0 / jnp.maximum(z, 1e-8)
    u = intr.fx * x * rho + intr.cx
    v = intr.fy * y * rho + intr.cy
    return u, v, rho
