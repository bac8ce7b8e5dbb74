"""Device inverse-depth fusion + uncertainty propagation (K8 + K9).

XLA equivalent of the reference's integrate.cu/covariance.cu (SURVEY.md
§2.2): per-pixel 1-D Kalman updates of the active keyframe's inverse-depth
map, with occlusion gating and first-order propagation of sensor + pose
uncertainty. Gather formulation via projective data association (see
reference_cpu/fusion.py, the oracle this op is tested against, for the
derivation). Everything is elementwise except one bilinear gather — XLA
fuses the rest into a handful of kernels; a Pallas fused variant consumes
the pre-gathered samples (SURVEY.md §7 stance 3).

The covariance convention matches the tracker exactly: the tracker's
IC update is T_ck <- T_ck . exp(-delta), so H^{-1} is the covariance of a
right twist of T_ck, which equals the covariance of a left twist of T_kc —
the frame this kernel's Jacobian is written in.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.camera import Intrinsics
from ..core.config import FusionConfig
from ..ops.warp import sample_tracker_planes, warp_points


def fuse_inverse_depth(
    kf_xi: jax.Array,
    kf_var: jax.Array,
    kf_mask: jax.Array,
    cur_xi: jax.Array,
    cur_mask: jax.Array,
    T_ck: jax.Array,
    pose_cov: jax.Array,
    intr: Intrinsics,
    cfg: FusionConfig,
):
    """Returns (xi', var', mask', n_fused). All planes (H, W) float32."""
    up, vp, _, _, front = warp_points(kf_xi, kf_mask, T_ck, intr)
    # 4 corner gathers for value+mask together (see sample_tracker_planes);
    # the duplicated xi channel is free relative to extra gather ops.
    stack = jnp.stack([cur_xi, cur_xi, cur_mask])
    xi_obs_cur, _, mask_ok, inb = sample_tracker_planes(stack, up, vp)
    valid = front * inb * mask_ok * (xi_obs_cur > 1e-6)

    kernel = getattr(cfg, "kernel", "xla")
    if kernel == "pallas" or (kernel == "auto" and jax.default_backend() == "tpu"):
        from ..ops.pallas_kernels import fusion_pallas

        xi_new, var_new, n_fused = fusion_pallas(
            up, vp, xi_obs_cur, valid, kf_xi, kf_var, kf_mask,
            _rigid_inverse(T_ck), pose_cov, intr, cfg,
        )
        return xi_new, var_new, kf_mask, n_fused

    zc = 1.0 / jnp.maximum(xi_obs_cur, 1e-6)
    dir_x = (up - intr.cx) * (1.0 / intr.fx)
    dir_y = (vp - intr.cy) * (1.0 / intr.fy)
    T_kc = _rigid_inverse(T_ck)
    R, t = T_kc[:3, :3], T_kc[:3, 3]
    Xk = (R[0, 0] * dir_x + R[0, 1] * dir_y + R[0, 2]) * zc + t[0]
    Yk = (R[1, 0] * dir_x + R[1, 1] * dir_y + R[1, 2]) * zc + t[1]
    Zk = (R[2, 0] * dir_x + R[2, 1] * dir_y + R[2, 2]) * zc + t[2]
    valid = valid * (Zk > 1e-6)
    xi_obs_kf = jnp.where(valid > 0, 1.0 / jnp.maximum(Zk, 1e-6), 0.0)

    # K9a: sensor noise through the frame change.
    r3dir = R[2, 0] * dir_x + R[2, 1] * dir_y + R[2, 2]
    dxi = r3dir / (jnp.maximum(Zk, 1e-6) ** 2 * jnp.maximum(xi_obs_cur, 1e-6) ** 2)
    var_sensor = dxi * dxi * (cfg.sensor_sigma_xi**2)
    # K9b: pose covariance through J = -xi^2 [0, 0, 1, Yk, -Xk, 0].
    xi2 = xi_obs_kf * xi_obs_kf
    j2, j3, j4 = -xi2, -xi2 * Yk, xi2 * Xk
    C = pose_cov
    var_pose = (
        j2 * (C[2, 2] * j2 + C[2, 3] * j3 + C[2, 4] * j4)
        + j3 * (C[3, 2] * j2 + C[3, 3] * j3 + C[3, 4] * j4)
        + j4 * (C[4, 2] * j2 + C[4, 3] * j3 + C[4, 4] * j4)
    )
    var_obs = jnp.maximum(var_sensor + var_pose, cfg.min_variance)

    # K8: occlusion gate + Kalman update.
    resid = xi_obs_kf - kf_xi
    gate = (resid * resid <= cfg.gate_k**2 * (kf_var + var_obs)).astype(jnp.float32)
    fuse_mask = valid * kf_mask * gate
    k_gain = kf_var / jnp.maximum(kf_var + var_obs, 1e-12)
    xi_new = jnp.where(fuse_mask > 0, kf_xi + k_gain * resid, kf_xi)
    var_new = jnp.where(fuse_mask > 0, (1.0 - k_gain) * kf_var, kf_var)
    var_new = jnp.clip(var_new, cfg.min_variance, cfg.max_variance)
    return xi_new, var_new, kf_mask, jnp.sum(fuse_mask)


def _rigid_inverse(T: jax.Array) -> jax.Array:
    R = T[:3, :3]
    t = T[:3, 3]
    Rt = R.T
    top = jnp.concatenate([Rt, (-Rt @ t)[:, None]], axis=1)
    bottom = jnp.array([[0.0, 0.0, 0.0, 1.0]], dtype=T.dtype)
    return jnp.concatenate([top, bottom], axis=0)
