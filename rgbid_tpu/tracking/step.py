"""The fused per-frame device program: ONE dispatch per frame.

Reference architecture (SURVEY.md §3.2): upload → ~12 kernel launches →
per-iteration readbacks → host keyframe logic → fusion kernels. TPU-native
architecture: raw u8/u16 planes go up; preprocessing, pyramids, the whole
coarse-to-fine IRLS tracker, the keyframe-switch decision, and EITHER
inverse-depth fusion + template rebuild OR new-keyframe creation OR a
lost no-op (lax.switch — one branch executes) all run inside a single
jitted XLA program. One packed ~70-float StepResult vector returns to
the host each frame.

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
    """Small per-frame result (everything the host needs).

    On device this travels as ONE packed f32 vector (`pack`/`unpack`):
    eleven separate tiny readbacks cost ~35 ms each in per-dispatch
    overhead on the sandbox TPU, one packed readback ~1.4 ms.
    """

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

    def pack(self) -> jax.Array:
        flat = [jnp.ravel(x).astype(jnp.float32) for x in self]
        return jnp.concatenate(flat)

    @classmethod
    def unpack(cls, vec, levels: int) -> "StepResult":
        import numpy as np

        v = np.asarray(vec)
        L = levels
        out, o = [], 0
        for shape in [(4, 4), (6, 6), (), (), (), (L,), (L,), (L,), (), (), ()]:
            n = int(np.prod(shape)) if shape else 1
            out.append(v[o : o + n].reshape(shape) if shape else v[o])
            o += n
        return cls(*out)


def pack_frame(rgb_u8, depth_u16):
    """Host-side: pack RGB u8 + depth u16 into one (H, W, 5) u8 buffer.

    One device_put instead of two (uploads carry a large fixed cost on the
    sandbox; measured 37+25 ms as two calls vs ~37 ms packed).
    """
    import numpy as np

    h, w = depth_u16.shape
    d8 = np.ascontiguousarray(depth_u16).view(np.uint8).reshape(h, w, 2)
    return np.concatenate([rgb_u8, d8], axis=2)


def unpack_frame(packed_u8):
    """Device-side inverse of pack_frame (little-endian u16 reassembly)."""
    rgb = packed_u8[:, :, :3]
    lo = packed_u8[:, :, 3].astype(jnp.uint16)
    hi = packed_u8[:, :, 4].astype(jnp.uint16)
    return rgb, lo | (hi << 8)


def _rotation_angle(R: jax.Array) -> jax.Array:
    c = jnp.clip((jnp.trace(R) - 1.0) * 0.5, -1.0, 1.0)
    return jnp.arccos(c)


def _process_frame_impl(
    packed_u8: jax.Array,
    kf: DeviceKeyframe,
    T_init: jax.Array,
    intr: Intrinsics,
    cfg: SlamConfig,
) -> Tuple[jax.Array, DeviceKeyframe]:
    tcfg, kcfg, fcfg = cfg.tracking, cfg.keyframe, cfg.fusion
    intrs = tuple(level_intrinsics(intr, l) for l in range(tcfg.levels))
    jac_dtype = jnp.bfloat16 if tcfg.jac_dtype == "bf16" else jnp.float32
    esm = getattr(tcfg, "jacobian", "ic") == "esm"

    rgb_u8, depth_u16 = unpack_frame(packed_u8)
    cur = preprocess_frame(
        rgb_u8, depth_u16, tcfg.levels, cfg.depth_scale, cfg.min_depth,
        cfg.max_depth, esm,
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
        kf2 = rebuild_after_fusion(
            kf, xi2, var2, mask2, intr, jac_dtype, tcfg.jacobian
        )
        return kf2, n_fused

    def switch_branch(operands):
        kf, cur, T, cov = operands
        kf2 = create_device_keyframe(cur, intr, fcfg, jac_dtype, tcfg.jacobian)
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
    return res.pack(), kf2


class ProcessFrame:
    """Jit-compiled per-frame step bound to (intrinsics, config)."""

    def __init__(self, intr: Intrinsics, cfg: SlamConfig):
        self.intr = intr
        self.cfg = cfg
        self._fn = jax.jit(
            functools.partial(_process_frame_impl, intr=intr, cfg=cfg)
        )

        jac_dtype = (
            jnp.bfloat16 if cfg.tracking.jac_dtype == "bf16" else jnp.float32
        )
        esm = getattr(cfg.tracking, "jacobian", "ic") == "esm"

        def _init(packed):
            rgb, d16 = unpack_frame(packed)
            return create_device_keyframe(
                preprocess_frame(
                    rgb,
                    d16,
                    cfg.tracking.levels,
                    cfg.depth_scale,
                    cfg.min_depth,
                    cfg.max_depth,
                    esm,
                ),
                intr,
                cfg.fusion,
                jac_dtype,
                cfg.tracking.jacobian,
            )

        self._init_kf = jax.jit(_init)

    def init_keyframe(self, packed_u8) -> DeviceKeyframe:
        return self._init_kf(packed_u8)

    def __call__(
        self, packed_u8, kf: DeviceKeyframe, T_init
    ) -> Tuple[jax.Array, DeviceKeyframe]:
        """Returns (packed StepResult vector (device), new keyframe state)."""
        return self._fn(packed_u8, kf, T_init)
