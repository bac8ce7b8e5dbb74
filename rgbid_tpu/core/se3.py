"""SE(3) Lie-group operations (JAX, jit/vmap/grad-safe).

TPU-native rebuild of the reference's host-side rigid-transform math
(reference: Eigen SE(3) helpers used by VisodoTracker / PoseGraph — see
SURVEY.md §2.1; reference mount was empty, paths unverified).

Conventions
-----------
* A pose is a 4x4 homogeneous matrix ``T`` (float32/float64).
* A twist is a 6-vector ``delta = [v, w]`` — translation first, rotation
  second — matching the Jacobian layout used by the tracker (ops/jacobians.py).
* ``exp(delta)`` is the matrix exponential of ``hat(delta)``;
  ``log`` is its inverse. Small angles are handled with Taylor expansions so
  everything is differentiable and NaN-free under jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS2 = 1e-8  # threshold on theta^2 below which Taylor expansions are used


def hat(w: jax.Array) -> jax.Array:
    """so(3) hat operator: 3-vector -> 3x3 skew-symmetric matrix."""
    wx, wy, wz = w[0], w[1], w[2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy]),
            jnp.stack([wz, z, -wx]),
            jnp.stack([-wy, wx, z]),
        ]
    )


def vee(W: jax.Array) -> jax.Array:
    """Inverse of :func:`hat` (assumes ``W`` skew-symmetric)."""
    return jnp.stack([W[2, 1], W[0, 2], W[1, 0]])


def _sinc_coeffs(theta2: jax.Array):
    """(sin t/t, (1-cos t)/t^2, (t-sin t)/t^3) with Taylor fallbacks."""
    small = theta2 < _EPS2
    # Guard the denominators; where() picks the Taylor branch for small angles.
    t2 = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(t2)
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / t2)
    c = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (theta - jnp.sin(theta)) / (t2 * theta))
    return a, b, c


def exp(delta: jax.Array) -> jax.Array:
    """SE(3) exponential map: twist [v, w] -> 4x4 transform."""
    v, w = delta[:3], delta[3:]
    W = hat(w)
    W2 = W @ W
    theta2 = jnp.dot(w, w)
    a, b, c = _sinc_coeffs(theta2)
    eye = jnp.eye(3, dtype=delta.dtype)
    R = eye + a * W + b * W2
    V = eye + b * W + c * W2
    t = V @ v
    top = jnp.concatenate([R, t[:, None]], axis=1)
    bottom = jnp.array([[0.0, 0.0, 0.0, 1.0]], dtype=delta.dtype)
    return jnp.concatenate([top, bottom], axis=0)


def log(T: jax.Array) -> jax.Array:
    """SE(3) logarithm: 4x4 transform -> twist [v, w]."""
    R = T[:3, :3]
    t = T[:3, 3]
    cos_theta = jnp.clip((jnp.trace(R) - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_theta)
    theta2 = theta * theta
    small = theta2 < _EPS2
    sin_theta = jnp.sin(theta)
    # w = theta / (2 sin theta) * vee(R - R^T); Taylor: 0.5 * (1 + theta^2/6)
    k = jnp.where(
        small,
        0.5 + theta2 / 12.0,
        theta / jnp.where(small, 1.0, 2.0 * sin_theta),
    )
    w = k * vee(R - R.T)
    W = hat(w)
    W2 = W @ W
    # V^-1 = I - W/2 + coef * W^2
    # coef = 1/theta^2 - (1+cos)/(2 theta sin);  Taylor: 1/12 + theta^2/720
    safe_t2 = jnp.where(small, 1.0, theta2)
    coef = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        1.0 / safe_t2
        - (1.0 + jnp.cos(theta)) / jnp.where(small, 1.0, 2.0 * theta * sin_theta),
    )
    V_inv = jnp.eye(3, dtype=T.dtype) - 0.5 * W + coef * W2
    v = V_inv @ t
    return jnp.concatenate([v, w])


def inv(T: jax.Array) -> jax.Array:
    """Inverse of a rigid transform (uses R^T, not a general inverse)."""
    R = T[:3, :3]
    t = T[:3, 3]
    Rt = R.T
    top = jnp.concatenate([Rt, (-Rt @ t)[:, None]], axis=1)
    bottom = jnp.array([[0.0, 0.0, 0.0, 1.0]], dtype=T.dtype)
    return jnp.concatenate([top, bottom], axis=0)


def identity(dtype=jnp.float32) -> jax.Array:
    return jnp.eye(4, dtype=dtype)


def rotation_angle(R: jax.Array) -> jax.Array:
    """Rotation angle of a 3x3 rotation matrix (trace formula, clipped)."""
    c = jnp.clip((jnp.trace(R) - 1.0) * 0.5, -1.0, 1.0)
    return jnp.arccos(c)


def orthonormalize(T: jax.Array, iters: int = 2) -> jax.Array:
    """Project the rotation block back onto SO(3) (Newton polar iteration).

    Repeated float32 pose composition (dozens of exp-map composes per
    frame) drifts R off the manifold multiplicatively; because subsequent
    updates only COMPOSE rigid factors, a non-rigid defect can never be
    corrected by the optimizer and compounds frame over frame into
    exponential trajectory divergence. Cheap branch-free fix, run once per
    GN update: R <- R (3 I - R^T R) / 2, quadratically convergent to the
    polar factor for near-orthonormal R.
    """
    R = T[:3, :3]
    eye3 = jnp.eye(3, dtype=T.dtype)
    for _ in range(iters):
        R = R @ (1.5 * eye3 - 0.5 * (R.T @ R))
    top = jnp.concatenate([R, T[:3, 3][:, None]], axis=1)
    bottom = jnp.array([[0.0, 0.0, 0.0, 1.0]], dtype=T.dtype)
    return jnp.concatenate([top, bottom], axis=0)


def from_rt(R: jax.Array, t: jax.Array) -> jax.Array:
    top = jnp.concatenate([R, t[:, None]], axis=1)
    bottom = jnp.array([[0.0, 0.0, 0.0, 1.0]], dtype=R.dtype)
    return jnp.concatenate([top, bottom], axis=0)


def transform_points(T: jax.Array, pts: jax.Array) -> jax.Array:
    """Apply T to points of shape (..., 3)."""
    return pts @ T[:3, :3].T + T[:3, 3]


def to_quaternion(R: jax.Array) -> jax.Array:
    """Rotation matrix -> quaternion [qx, qy, qz, qw] (TUM order), jit-safe.

    Uses the branch-free Shepperd-style construction via 4 candidate columns.
    """
    m00, m01, m02 = R[0, 0], R[0, 1], R[0, 2]
    m10, m11, m12 = R[1, 0], R[1, 1], R[1, 2]
    m20, m21, m22 = R[2, 0], R[2, 1], R[2, 2]
    tr = m00 + m11 + m22
    # Four candidate quaternions (unnormalized), one per dominant component.
    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01])
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20])
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21])
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22])
    # Pick the branch with the largest pivot.
    pivots = jnp.stack([1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22])
    idx = jnp.argmax(pivots)
    q = jnp.stack([qx[idx], qy[idx], qz[idx], qw[idx]])
    q = q / jnp.linalg.norm(q)
    # Canonicalize sign (qw >= 0).
    return jnp.where(q[3] < 0, -q, q)


def from_quaternion(q: jax.Array) -> jax.Array:
    """Quaternion [qx, qy, qz, qw] -> rotation matrix."""
    x, y, z, w = q[0], q[1], q[2], q[3]
    n = x * x + y * y + z * z + w * w
    s = jnp.where(n > 0, 2.0 / n, 0.0)
    wx, wy, wz = s * w * x, s * w * y, s * w * z
    xx, xy, xz = s * x * x, s * x * y, s * x * z
    yy, yz, zz = s * y * y, s * y * z, s * z * z
    return jnp.stack(
        [
            jnp.stack([1.0 - (yy + zz), xy - wz, xz + wy]),
            jnp.stack([xy + wz, 1.0 - (xx + zz), yz - wx]),
            jnp.stack([xz - wy, yz + wx, 1.0 - (xx + yy)]),
        ]
    )
