"""The fused per-frame device program: ONE dispatch per frame.

Reference architecture (SURVEY.md §3.2): upload → ~12 kernel launches →
per-iteration readbacks → host keyframe logic → fusion kernels. TPU-native
architecture: raw u8/u16 planes go up; preprocessing, pyramids, the whole
coarse-to-fine IRLS tracker, the keyframe-switch decision, and EITHER
inverse-depth fusion + template rebuild OR new-keyframe creation
(lax.cond — one branch executes) all run inside a single jitted XLA
program. Only a ~60-float StepResult returns to the host each frame.

This eliminates every per-frame host↔device round trip except the raw
frame upload and the diagnostics readback — on the sandbox TPU (3.5 ms
fixed cost per dispatched program, SURVEY.md App. A) this is the
difference between ~1 s/frame naive and real-time-class behavior.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..core.camera import Intrinsics, level_intrinsics
from ..core.config import SlamConfig
from ..mapping.fusion import fuse_inverse_depth
from ..mapping.keyframe import DeviceKeyframe, create_device_keyframe, rebuild_after_fusion
from .frames import preprocess_frame
from .tracker import TrackResult, _track_impl


class StepResult(NamedTuple):
    """Small per-frame readback (everything the host needs)."""

    T: jax.Array  # (4, 4) current <- (entry) keyframe
    cov: jax.Array  # (6, 6) pose covariance (inverse of final H)
    switch: jax.Array  # () f32: 1.0 if a new keyframe was created
    lost: jax.Array  # () f32: 1.0 if tracking was rejected
    n_fused: jax.Array  # () pixels fused into the keyframe
    errors: jax.Array  # (levels,)
    inlier_frac: jax.Array  # (levels,)
    n_valid: jax.Array  # (levels,)
    overlap: jax.Array  # ()
    sigma2_int: jax.Array
    sigma2_xi: jax.Array


def _rotation_angle(R: jax.Array) -> jax.Array:
    c = jnp.clip((jnp.trace(R) - 1.0) * 0.5, -1.0, 1.0)
    return jnp.arccos(c)


def _process_frame_impl(
    rgb_u8: jax.Array,
    depth_u16: jax.Array,
    kf: DeviceKeyframe,
    T_init: jax.Array,
    intr: Intrinsics,
    cfg: SlamConfig,
) -> Tuple[StepResult, DeviceKeyframe]:
    tcfg, kcfg, fcfg = cfg.tracking, cfg.keyframe, cfg.fusion
    intrs = tuple(level_intrinsics(intr, l) for l in range(tcfg.levels))

    cur = preprocess_frame(
        rgb_u8, depth_u16, tcfg.levels, cfg.depth_scale, cfg.min_depth, cfg.max_depth
    )
    track: TrackResult = _track_impl(kf.levels, cur, T_init, intrs, tcfg)

    # Pose covariance: inverse of the final normal matrix (information).
    # track.H is per-pixel-normalized (conditioning); undo that here.
    Hd = track.H * jnp.maximum(track.n_valid[0], 1.0) + 1e-8 * jnp.eye(
        6, dtype=jnp.float32
    )
    cov = jax.scipy.linalg.cho_solve(
        jax.scipy.linalg.cho_factor(Hd), jnp.eye(6, dtype=jnp.float32)
    )

    # Tracking-loss check (the reference's frame rejection, SURVEY.md §5):
    # too little valid overlap or a non-finite pose -> reject.
    finite = jnp.all(jnp.isfinite(track.T))
    kf_count = jnp.maximum(jnp.sum(kf.levels[0].mask), 1.0)
    lost = jnp.logical_or(
        jnp.logical_not(finite),
        track.n_valid[0] < tcfg.min_valid_fraction * kf_count,
    )

    # Keyframe-switch decision (overlap / motion / uncertainty thresholds).
    t_norm = jnp.linalg.norm(track.T[:3, 3])
    angle = _rotation_angle(track.T[:3, :3])
    sigma_t = jnp.sqrt(jnp.maximum(jnp.trace(cov[:3, :3]), 0.0))
    switch = (
        (track.overlap < kcfg.min_overlap)
        | (t_norm > kcfg.max_translation)
        | (angle > kcfg.max_rotation)
        | (sigma_t > kcfg.max_pose_sigma)
    ) & jnp.logical_not(lost)

    def keep_branch(operands):
        kf, cur, T, cov = operands
        if not fcfg.enabled:
            return kf, jnp.asarray(0.0, jnp.float32)
        # Inflate the (overconfident, pixel-independence-assuming) tracker
        # covariance with a fixed pose-noise floor before propagation.
        floor = jnp.diag(
            jnp.asarray(
                [fcfg.pose_trans_sigma**2] * 3 + [fcfg.pose_rot_sigma**2] * 3,
                jnp.float32,
            )
        )
        xi2, var2, mask2, n_fused = fuse_inverse_depth(
            kf.levels[0].xi,
            kf.var,
            kf.levels[0].mask,
            cur[0].xi,
            cur[0].mask,
            T,
            cov + floor,
            intrs[0],
            fcfg,
        )
        kf2 = rebuild_after_fusion(kf, xi2, var2, mask2, intr)
        return kf2, n_fused

    def switch_branch(operands):
        kf, cur, T, cov = operands
        kf2 = create_device_keyframe(cur, intr, fcfg)
        return kf2, jnp.asarray(0.0, jnp.float32)

    def lost_branch(operands):
        kf, cur, T, cov = operands
        return kf, jnp.asarray(0.0, jnp.float32)

    # Three-way: lost -> no-op; switch -> new keyframe; else fuse.
    idx = jnp.where(lost, 2, jnp.where(switch, 1, 0)).astype(jnp.int32)
    kf2, n_fused = jax.lax.switch(
        idx, [keep_branch, switch_branch, lost_branch], (kf, cur, track.T, cov)
    )

    res = StepResult(
        T=track.T,
        cov=cov,
        switch=switch.astype(jnp.float32),
        lost=lost.astype(jnp.float32),
        n_fused=n_fused,
        errors=track.errors,
        inlier_frac=track.inlier_frac,
        n_valid=track.n_valid,
        overlap=track.overlap,
        sigma2_int=track.sigma2_int,
        sigma2_xi=track.sigma2_xi,
    )
    return res, kf2


class ProcessFrame:
    """Jit-compiled per-frame step bound to (intrinsics, config)."""

    def __init__(self, intr: Intrinsics, cfg: SlamConfig):
        self.intr = intr
        self.cfg = cfg
        self._fn = jax.jit(
            functools.partial(_process_frame_impl, intr=intr, cfg=cfg)
        )
        self._init_kf = jax.jit(
            lambda rgb, d16: create_device_keyframe(
                preprocess_frame(
                    rgb,
                    d16,
                    cfg.tracking.levels,
                    cfg.depth_scale,
                    cfg.min_depth,
                    cfg.max_depth,
                ),
                intr,
                cfg.fusion,
            )
        )

    def init_keyframe(self, rgb_u8, depth_u16) -> DeviceKeyframe:
        return self._init_kf(rgb_u8, depth_u16)

    def __call__(
        self, rgb_u8, depth_u16, kf: DeviceKeyframe, T_init
    ) -> Tuple[StepResult, DeviceKeyframe]:
        return self._fn(rgb_u8, depth_u16, kf, T_init)
