"""Device inverse-depth fusion + uncertainty propagation (K8 + K9).

XLA equivalent of the reference's integrate.cu/covariance.cu (SURVEY.md
§2.2): per-pixel 1-D Kalman updates of the active keyframe's inverse-depth
map, with occlusion gating and first-order propagation of sensor + pose
uncertainty. Gather formulation via projective data association (see
reference_cpu/fusion.py, the oracle this op is tested against, for the
derivation). Everything is elementwise except one bilinear gather — XLA
fuses the rest into a handful of kernels; a Pallas fused variant consumes
the pre-gathered samples (SURVEY.md §7 stance 3).

K8's full contract (SURVEY.md §2.2 "update validity & hit counts", §3.4)
has two more pieces beyond the Kalman refinement:

* **hit counts** — every successful per-pixel fuse increments a hits
  plane; template and cloud extraction gate on ``cfg.confirm_hits``;
* **validity growth** — the gather form can only refine pixels that
  already have a depth estimate (an invalid keyframe pixel has no ray to
  look up a measurement along), so holes are filled by a periodic
  FORWARD-SPLAT claim pass (`_claim_pass`): current-frame measurements
  are scattered into the keyframe grid and invalid pixels with
  depth-consistent support become provisional estimates (hits = 1) that
  later fusion confirms. This restores the reference's self-completing
  keyframes (its scatter formulation grows validity for free).

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
from ..ops.warp import backproject_grid, sample_tracker_planes, warp_points


def _fuse_core(
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
    """Kalman refinement of valid keyframe pixels.

    Returns (xi', var', fuse_mask, n_fused) — fuse_mask is the per-pixel
    {0,1} plane of successful updates (drives the hit counts).
    """
    up, vp, _, _, front = warp_points(kf_xi, kf_mask, T_ck, intr)
    # 4 corner gathers for value+mask together (see sample_tracker_planes);
    # the duplicated xi channel is free relative to extra gather ops.
    stack = jnp.stack([cur_xi, cur_xi, cur_mask])
    xi_obs_cur, _, mask_ok, inb = sample_tracker_planes(stack, up, vp)
    valid = front * inb * mask_ok * (xi_obs_cur > 1e-6)

    kernel = getattr(cfg, "kernel", "xla")
    if kernel == "pallas" or (kernel == "auto" and jax.default_backend() == "tpu"):
        from ..ops.pallas_kernels import fusion_pallas

        return fusion_pallas(
            up, vp, xi_obs_cur, valid, kf_xi, kf_var, kf_mask,
            _rigid_inverse(T_ck), pose_cov, intr, cfg,
        )

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
    return xi_new, var_new, fuse_mask, jnp.sum(fuse_mask)


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
    """Kalman-only step (oracle-parity API; reference_cpu/fusion.py).

    Returns (xi', var', mask', n_fused). All planes (H, W) float32.
    """
    xi_new, var_new, _fuse_mask, n = _fuse_core(
        kf_xi, kf_var, kf_mask, cur_xi, cur_mask, T_ck, pose_cov, intr, cfg
    )
    return xi_new, var_new, kf_mask, n


def _claim_pass(
    kf_xi: jax.Array,
    kf_var: jax.Array,
    kf_mask: jax.Array,
    kf_hits: jax.Array,
    cur_xi: jax.Array,
    cur_mask: jax.Array,
    T_ck: jax.Array,
    intr: Intrinsics,
    cfg: FusionConfig,
):
    """Validity growth: forward-splat current measurements into the
    keyframe grid and claim INVALID keyframe pixels that gathered
    depth-consistent support (the reference's scatter formulation grows
    validity this way for free; the numpy oracle is
    reference_cpu/fusion.py claim()).

    One XLA scatter-add of a (H*W, 3) stack [weight, w*xi, w*xi^2] — the
    second moment rejects claims at depth discontinuities, where two
    surfaces splat onto the same keyframe pixel. Claimed pixels become
    provisional estimates: var inflated (cfg.claim_var_inflation) and
    hits = 1, so they only reach the template/cloud after confirmation
    by later fusion (cfg.confirm_hits).
    """
    h, w = kf_xi.shape
    T_kc = _rigid_inverse(T_ck)
    x, y, z = backproject_grid(cur_xi, intr)
    R, t = T_kc[:3, :3], T_kc[:3, 3]
    Xk = R[0, 0] * x + R[0, 1] * y + R[0, 2] * z + t[0]
    Yk = R[1, 0] * x + R[1, 1] * y + R[1, 2] * z + t[1]
    Zk = R[2, 0] * x + R[2, 1] * y + R[2, 2] * z + t[2]
    front = (Zk > 1e-6).astype(jnp.float32)
    rho = 1.0 / jnp.maximum(Zk, 1e-6)  # = xi in the keyframe frame
    uk = intr.fx * Xk * rho + intr.cx
    vk = intr.fy * Yk * rho + intr.cy
    ui = jnp.round(uk).astype(jnp.int32)
    vi = jnp.round(vk).astype(jnp.int32)
    inb = ((ui >= 0) & (ui <= w - 1) & (vi >= 0) & (vi <= h - 1)).astype(
        jnp.float32
    )
    wgt = cur_mask * (cur_xi > 1e-6) * front * inb
    flat = jnp.clip(vi, 0, h - 1) * w + jnp.clip(ui, 0, w - 1)
    vals = jnp.stack([wgt, wgt * rho, wgt * rho * rho], axis=-1).reshape(-1, 3)
    acc = (
        jnp.zeros((h * w, 3), jnp.float32)
        .at[flat.reshape(-1)]
        .add(vals)
        .reshape(h, w, 3)
    )
    sw = acc[..., 0]
    mean_xi = acc[..., 1] / jnp.maximum(sw, 1e-6)
    spread = jnp.maximum(acc[..., 2] / jnp.maximum(sw, 1e-6) - mean_xi**2, 0.0)
    claim = (
        (kf_mask < 0.5)
        & (sw >= cfg.claim_min_weight)
        & (spread <= (3.0 * cfg.sensor_sigma_xi) ** 2)
        & (mean_xi > 1e-6)
    ).astype(jnp.float32)
    xi_new = jnp.where(claim > 0, mean_xi, kf_xi)
    var_new = jnp.where(
        claim > 0,
        jnp.clip(
            cfg.claim_var_inflation * cfg.sensor_sigma_xi**2 + spread,
            cfg.min_variance,
            cfg.max_variance,
        ),
        kf_var,
    )
    mask_new = jnp.maximum(kf_mask, claim)
    hits_new = jnp.where(claim > 0, 1.0, kf_hits)
    return xi_new, var_new, mask_new, hits_new, jnp.sum(claim)


def fuse_and_grow(
    kf_xi: jax.Array,
    kf_var: jax.Array,
    kf_mask: jax.Array,
    kf_hits: jax.Array,
    cur_xi: jax.Array,
    cur_mask: jax.Array,
    T_ck: jax.Array,
    pose_cov: jax.Array,
    intr: Intrinsics,
    cfg: FusionConfig,
    do_claim: jax.Array | bool = False,
):
    """The full K8 step: Kalman refinement + hit counts + (periodic)
    validity growth. ``kf_mask`` is the FULL estimate mask (every pixel
    with a depth estimate, confirmed or provisional), not the
    hits-gated template mask.

    Returns (xi', var', mask', hits', n_fused).
    """
    xi_new, var_new, fuse_mask, n = _fuse_core(
        kf_xi, kf_var, kf_mask, cur_xi, cur_mask, T_ck, pose_cov, intr, cfg
    )
    hits_new = kf_hits + fuse_mask
    if not getattr(cfg, "grow_validity", False):
        return xi_new, var_new, kf_mask, hits_new, n

    def with_claim(op):
        xi, var, mask, hits = op
        xi2, var2, mask2, hits2, _n_claimed = _claim_pass(
            xi, var, mask, hits, cur_xi, cur_mask, T_ck, intr, cfg
        )
        return xi2, var2, mask2, hits2

    def no_claim(op):
        return op

    xi_new, var_new, mask_new, hits_new = jax.lax.cond(
        jnp.asarray(do_claim, jnp.bool_),
        with_claim,
        no_claim,
        (xi_new, var_new, kf_mask, hits_new),
    )
    return xi_new, var_new, mask_new, hits_new, n


def _rigid_inverse(T: jax.Array) -> jax.Array:
    R = T[:3, :3]
    t = T[:3, 3]
    Rt = R.T
    top = jnp.concatenate([Rt, (-Rt @ t)[:, None]], axis=1)
    bottom = jnp.array([[0.0, 0.0, 0.0, 1.0]], dtype=T.dtype)
    return jnp.concatenate([top, bottom], axis=0)
