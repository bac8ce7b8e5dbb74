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
* **validity growth** — invalid keyframe pixels (founding depth holes)
  are claimed IN THE SAME gather pass: each hole pixel borrows a depth
  GUESS from the keyframe's own coarse pyramid (the validity-renormalized
  downsampling makes coarse levels defined across small holes), warps
  along that hypothesis, and claims the observation if the re-expressed
  measurement closes the loop (|xi_obs_kf - guess| within a gate). A
  rejected hypothesis costs nothing; an accepted one initializes the
  pixel at inflated variance and hits = 1, to be confirmed by later
  fusion before the template/cloud trusts it.

  Design note vs the reference: the reference's scatter formulation
  grows validity for free; a literal scatter was built and measured at
  ~90 ms per claim pass at VGA on this platform (scatter ops are
  priced brutally by the sandbox emulator) — the gather-with-guess form
  rides the fusion pass's EXISTING four corner gathers and costs ~0.
  The semantic difference: gather-claiming fills holes consistent with
  the surrounding geometry (sensor dropout, the dominant real case) but
  not newly-revealed geometry with no coarse support; such pixels stay
  invalid until a keyframe switch founds them directly.

The covariance convention matches the tracker exactly: the tracker's
IC update is T_ck <- T_ck . exp(-delta), so H^{-1} is the covariance of a
right twist of T_ck, which equals the covariance of a left twist of T_kc —
the frame this kernel's Jacobian is written in.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.camera import Intrinsics
from ..core.config import FusionConfig
from ..ops.warp import sample_tracker_planes, warp_points


def hole_guess(levels) -> Tuple[jax.Array, jax.Array]:
    """Per-pixel depth hypothesis for INVALID level-0 pixels, cascaded
    from the finest pyramid level with support (nearest-neighbor
    upsample — pure reshape/broadcast, no gathers).

    Support = the renormalized-blur VALUE existing (xi > 0), not the
    level's validity mask: the pyramid's masks deliberately require the
    subsampled center pixel valid (tracking must not invent depth), so
    a founding hole stays masked at every level — but the renormalized
    blur VALUES spread ~2 px per level into holes from the valid ring,
    which is exactly the neighborhood hypothesis the claim pass needs.

    Returns (guess, gmask) at level-0 resolution.
    """
    h, w = levels[0].xi.shape
    guess = jnp.zeros((h, w), jnp.float32)
    gmask = jnp.zeros((h, w), jnp.float32)
    for l in range(1, len(levels)):
        f = 2**l
        up = jnp.repeat(jnp.repeat(levels[l].xi, f, axis=0), f, axis=1)[:h, :w]
        hl, wl = up.shape
        if hl < h or wl < w:
            up = jnp.pad(up, ((0, h - hl), (0, w - wl)))
        um = (up > 1e-6).astype(jnp.float32)
        take = (gmask < 0.5) & (um > 0.5)
        guess = jnp.where(take, up, guess)
        gmask = jnp.maximum(gmask, um)
    return guess, gmask


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
    guess: Optional[jax.Array] = None,
    gmask: Optional[jax.Array] = None,
):
    """Kalman refinement of valid keyframe pixels, plus (when guess is
    given) gather-form claiming of invalid ones.

    Returns (xi', var', fuse_mask, claim_mask, n_fused) — fuse_mask and
    claim_mask are per-pixel {0,1} planes (hit counts / validity growth).
    """
    grow = guess is not None
    if grow:
        xi_eff = jnp.where(kf_mask > 0, kf_xi, guess)
        mask_eff = jnp.maximum(kf_mask, gmask)
    else:
        xi_eff, mask_eff = kf_xi, kf_mask
    up, vp, _, _, front = warp_points(xi_eff, mask_eff, T_ck, intr)
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
            guess=guess, gmask=gmask,
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

    claim_mask = jnp.zeros_like(kf_mask)
    if grow:
        # Validity growth: a hole pixel's observation is claimed when the
        # measurement, re-expressed in the keyframe, closes the loop with
        # the coarse-pyramid hypothesis it was warped along.
        consistent = (
            jnp.abs(xi_obs_kf - guess) <= getattr(cfg, "claim_tol", 0.08)
        ).astype(jnp.float32)
        claim_mask = (
            (kf_mask < 0.5).astype(jnp.float32) * gmask * valid * consistent
        )
        xi_new = jnp.where(claim_mask > 0, xi_obs_kf, xi_new)
        var_new = jnp.where(
            claim_mask > 0,
            jnp.clip(
                getattr(cfg, "claim_var_inflation", 4.0) * var_obs,
                cfg.min_variance,
                cfg.max_variance,
            ),
            var_new,
        )
    return xi_new, var_new, fuse_mask, claim_mask, jnp.sum(fuse_mask)


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
    xi_new, var_new, _fuse_mask, _claim, n = _fuse_core(
        kf_xi, kf_var, kf_mask, cur_xi, cur_mask, T_ck, pose_cov, intr, cfg
    )
    return xi_new, var_new, kf_mask, n


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
    guess: Optional[jax.Array] = None,
    gmask: Optional[jax.Array] = None,
):
    """The full K8 step: Kalman refinement + hit counts + validity
    growth (when a coarse-pyramid guess is supplied and
    cfg.grow_validity is on). ``kf_mask`` is the FULL estimate mask
    (every pixel with a depth estimate, confirmed or provisional), not
    the hits-gated template mask.

    Returns (xi', var', mask', hits', n_fused).
    """
    if not getattr(cfg, "grow_validity", False):
        guess = gmask = None
    xi_new, var_new, fuse_mask, claim_mask, n = _fuse_core(
        kf_xi, kf_var, kf_mask, cur_xi, cur_mask, T_ck, pose_cov, intr, cfg,
        guess=guess, gmask=gmask,
    )
    hits_new = jnp.where(claim_mask > 0, 1.0, kf_hits + fuse_mask)
    mask_new = jnp.maximum(kf_mask, claim_mask)
    return xi_new, var_new, mask_new, hits_new, n


def _rigid_inverse(T: jax.Array) -> jax.Array:
    R = T[:3, :3]
    t = T[:3, 3]
    Rt = R.T
    top = jnp.concatenate([Rt, (-Rt @ t)[:, None]], axis=1)
    bottom = jnp.array([[0.0, 0.0, 0.0, 1.0]], dtype=T.dtype)
    return jnp.concatenate([top, bottom], axis=0)
