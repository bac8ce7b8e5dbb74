"""The fused per-frame device program: ONE dispatch per frame, chainable
into multi-frame flights with zero host syncs in between.

Reference architecture (SURVEY.md §3.2): upload → ~12 kernel launches →
per-iteration readbacks → host keyframe logic → fusion kernels. TPU-native
architecture: raw u8/u16 planes go up; preprocessing, pyramids, the whole
coarse-to-fine IRLS tracker, the keyframe-switch decision, and EITHER
inverse-depth fusion + template rebuild OR new-keyframe creation OR a
lost no-op (one branch executes) all run inside a single jitted XLA
program. One packed ~70-float StepResult vector returns to the host each
frame.

The constant-velocity motion model ALSO lives on device (MotionState:
T_ck, delta, lost_count — including the coast-and-hold lost policy), so
frame i+1's program needs NO host input besides its raw upload. The host
can therefore dispatch a whole FLIGHT of frames and read results back
once per flight: on the sandbox TPU every host readback of a not-yet-
ready value costs ~28 ms regardless of size, while an extra chained
program costs ~1-3 ms and readbacks of already-forced values are free
(measured this round). SlamSystem.feed() exploits this; process_frame
remains the depth-1 special case with identical semantics.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..core import se3
from ..core.camera import Intrinsics, level_intrinsics
from ..core.config import SlamConfig
from ..mapping import fusion as fusion_mod
from ..mapping.fusion import fuse_and_grow
from ..mapping.keyframe import DeviceKeyframe, create_device_keyframe, rebuild_after_fusion
from .frames import preprocess_planes
from .tracker import TrackResult, _track_impl


class MotionState(NamedTuple):
    """Device-resident inter-frame tracking state (the constant-velocity
    motion model + the lost-frame coast-and-hold policy), threaded through
    chained per-frame programs so a flight needs no host round trips.

    T_ck:  (4, 4) pose of the last frame vs the active keyframe.
    delta: (4, 4) last inter-frame camera motion (identity while lost).
    lost_count: () f32 consecutive lost frames so far.
    """

    T_ck: jax.Array
    delta: jax.Array
    lost_count: jax.Array
    # (consensus_bins,) last frame's raw per-stratum disagreement flags —
    # the motion-consensus persistence gate (tracking/consensus.py).
    cons_excluded: jax.Array = None

    @classmethod
    def initial(cls, cons_bins: int = 6) -> "MotionState":
        eye = jnp.eye(4, dtype=jnp.float32)
        return cls(
            T_ck=eye,
            delta=eye,
            lost_count=jnp.asarray(0.0, jnp.float32),
            cons_excluded=jnp.zeros((cons_bins,), jnp.float32),
        )


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
    consensus_frac: jax.Array  # () pixel fraction masked by motion consensus
    # () f32: 1.0 when the confidently-wrong divergence guard declared
    # this frame lost (diagnostics; the lost flag already includes it).
    guard_fired: jax.Array
    # Guard input diagnostics: divergence of the converged pose from the
    # constant-velocity prior (translation m / rotation rad), the number
    # of consensus strata carrying raw stress flags this frame, and the
    # number flagged persistently (>= consensus_persist consecutive
    # frames — the guard's corroboration signal).
    div_trans: jax.Array
    div_rot: jax.Array
    cons_flags: jax.Array
    cons_flags_persist: jax.Array
    # () f32: 1.0 when a consensus rescue re-track fired AND materially
    # corrected the pose this frame (the refound trigger — see
    # TrackingConfig.rescue_refound); exported so diagnostics can see
    # rescue activity per frame.
    rescue: jax.Array

    def pack(self) -> jax.Array:
        flat = [jnp.ravel(x).astype(jnp.float32) for x in self]
        return jnp.concatenate(flat)

    @classmethod
    def unpack(cls, vec, levels: int) -> "StepResult":
        import numpy as np

        v = np.asarray(vec)
        L = levels
        out, o = [], 0
        for shape in [(4, 4), (6, 6), (), (), (), (L,), (L,), (L,), (), (), (), (), (), (), (), (), (), ()]:
            n = int(np.prod(shape)) if shape else 1
            out.append(v[o : o + n].reshape(shape) if shape else v[o])
            o += n
        return cls(*out)


def _gray_from_rgb(rgb_u8):
    import numpy as np

    if rgb_u8.ndim == 2:  # already gray
        return rgb_u8
    try:
        import cv2

        return cv2.cvtColor(np.ascontiguousarray(rgb_u8), cv2.COLOR_RGB2GRAY)
    except Exception:
        f = rgb_u8.astype(np.float32)
        return np.clip(
            0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2] + 0.5,
            0,
            255,
        ).astype(np.uint8)


_U12_LUTS: dict = {}


def _u12_lut(depth_scale: float, min_depth: float, max_depth: float):
    """Cached raw-u16-depth -> 12-bit xi code table (65536 entries).

    One host gather per frame instead of per-pixel float math (~0.3 vs
    ~6 ms VGA). Code 0 = invalid. VALIDITY is computed with the exact
    float32 arithmetic of the u16 device path (inverse_depth_from_u16:
    d = f32(raw) * f32(1/depth_scale), strict f32 compares) so the two
    codecs' masks are bit-identical for EVERY (depth_scale, min, max)
    combination, not just ones where f64 and f32 rounding agree at the
    boundary raws (advisor round 3). The quantized xi VALUE still uses
    f64 (it only needs to land in the right 12-bit bucket).
    """
    import numpy as np

    key = (depth_scale, min_depth, max_depth)
    lut = _U12_LUTS.get(key)
    if lut is None:
        raw = np.arange(65536, dtype=np.float64)
        xi = depth_scale / np.maximum(raw, 1.0)
        xi_min, xi_max = 1.0 / max_depth, 1.0 / min_depth
        step = (xi_max - xi_min) / 4094.0
        code = np.rint((xi - xi_min) / step).astype(np.int64) + 1
        d32 = raw.astype(np.float32) * np.float32(1.0 / depth_scale)
        valid = (d32 > np.float32(min_depth)) & (d32 < np.float32(max_depth))
        lut = np.where(valid, np.clip(code, 1, 4095), 0).astype(np.uint16)
        _U12_LUTS[key] = lut
    return lut


def pack_frame(rgb_u8, depth_u16, cfg: SlamConfig | None = None):
    """Host-side: gray u8 + depth into ONE u8 upload buffer.

    One device_put instead of two (uploads carry a large fixed cost on the
    sandbox), and gray instead of RGB (0.9 MB vs 1.5 MB at VGA — upload
    bytes are the sandbox's hard per-frame floor; the color image stays on
    the host for ORB features and colored map export, where it is needed
    anyway). The u8 luma quantization (1/255 ≈ 0.004 in [0,1] intensity)
    is below the photometric residual scales the tracker operates at
    (validated: bench-clip ATE unchanged). Planar layout because the host
    fill is contiguous plane copies (~0.2 ms VGA) vs ~1.6 ms for
    interleaved (H, W, 3) strided writes (measured round 2).

    Two codecs (cfg.depth_codec; None -> "u16" for compatibility with
    callers that predate the codec):
      "u16" -> (3, H, W): [gray, depth lo-byte, depth hi-byte].
      "u12" -> (H, W + 3W/2): each row is [gray row | bit-packed row of
               12-bit inverse-depth codes, 2 px -> 3 B]. Code 0 =
               invalid; codes 1..4095 span [1/max_depth, 1/min_depth]
               uniformly in xi — see SlamConfig.depth_codec for the
               fidelity argument (3.6x finer than Kinect disparity
               quantization at the default range).
    """
    import numpy as np

    h, w = depth_u16.shape
    gray = _gray_from_rgb(rgb_u8)
    if cfg is not None and cfg.depth_codec == "u12":
        assert w % 2 == 0, "u12 codec requires even width"
        code = _u12_lut(cfg.depth_scale, cfg.min_depth, cfg.max_depth)[
            depth_u16
        ]
        v = code.reshape(h, w // 2, 2)
        v0, v1 = v[..., 0], v[..., 1]
        trip = np.empty((h, w // 2, 3), np.uint8)
        trip[..., 0] = v0 >> 4
        trip[..., 1] = ((v0 & 0xF) << 4) | (v1 >> 8)
        trip[..., 2] = v1 & 0xFF
        out = np.empty((h, w + (3 * w) // 2), np.uint8)
        out[:, :w] = gray
        out[:, w:] = trip.reshape(h, (3 * w) // 2)
        return out
    if cfg is not None and cfg.depth_codec == "u16h":
        # Half-resolution depth upload: stride-2 decimation keeps REAL
        # sensor values (no host averaging that would invent phantom
        # depths at object edges); the device reconstructs full-res xi
        # with a validity-renormalized bilinear 2x upsample
        # (ops/image.upsample2x_renorm — even coordinates bit-exact).
        # 0.92 -> 0.46 MB/frame at VGA against the sandbox's ~35-40
        # ms/MB upload DMA floor; fidelity record in BASELINE.md.
        assert h % 2 == 0 and w % 2 == 0, "u16h codec requires even H, W"
        dh = np.ascontiguousarray(depth_u16[::2, ::2])
        out = np.empty((h + h // 2, w), np.uint8)
        out[:h] = gray
        out[h:] = dh.view(np.uint8).reshape(h // 2, w)
        return out
    d8 = np.ascontiguousarray(depth_u16).view(np.uint8).reshape(h, w, 2)
    out = np.empty((3, h, w), np.uint8)
    out[0] = gray
    out[1] = d8[..., 0]
    out[2] = d8[..., 1]
    return out


def unpack_frame(packed_u8):
    """Device-side inverse of the u16 codec: (gray u8, depth u16)."""
    gray = packed_u8[0]
    lo = packed_u8[1].astype(jnp.uint16)
    hi = packed_u8[2].astype(jnp.uint16)
    return gray, lo | (hi << 8)


def decode_frame(packed_u8, cfg: SlamConfig):
    """Device-side codec dispatch: packed upload -> (gray u8, xi, mask).

    The codec is static config, so jit traces exactly one branch. The u12
    path reconstructs xi directly (no divide — the host already quantized
    in inverse-depth space); the u16 path reproduces the original
    raw-depth -> inverse-depth conversion bit-for-bit.
    """
    from ..ops import image as _image

    if cfg.depth_codec == "u12":
        # Codec-mismatch guard (advisor round 3): a caller that packed
        # with the WRONG codec (e.g. pack_frame(cfg=None) defaults to
        # u16) would otherwise hit an opaque reshape error below.
        # Shapes are static at trace time, so this is a free Python
        # check, not a device op.
        if packed_u8.ndim != 2 or packed_u8.shape[1] % 5 != 0:
            raise ValueError(
                f"depth_codec='u12' expects a (H, 5*W/2) packed buffer "
                f"from pack_frame(..., cfg) with the same codec; got "
                f"shape {packed_u8.shape}. (A (3, H, W) buffer means the "
                f"frame was packed with the 'u16' codec.)"
            )
        h = packed_u8.shape[0]
        w = (packed_u8.shape[1] * 2) // 5  # W + 3W/2 total columns
        gray = packed_u8[:, :w]
        trip = packed_u8[:, w:].reshape(h, w // 2, 3).astype(jnp.int32)
        b0, b1, b2 = trip[..., 0], trip[..., 1], trip[..., 2]
        v0 = (b0 << 4) | (b1 >> 4)
        v1 = ((b1 & 0xF) << 8) | b2
        code = jnp.stack([v0, v1], -1).reshape(h, w)
        xi_min, xi_max = 1.0 / cfg.max_depth, 1.0 / cfg.min_depth
        step = (xi_max - xi_min) / 4094.0
        mask = (code > 0).astype(jnp.float32)
        xi = ((code.astype(jnp.float32) - 1.0) * step + xi_min) * mask
        return gray, xi, mask
    if cfg.depth_codec == "u16h":
        # ndim/rows%3 alone would also pass a u12 buffer whose H happens
        # to be divisible by 3 (a (H, 5W/2) u12 pack is 2-D too) and then
        # silently mis-decode; requiring an even width closes that hole —
        # a u12 buffer's column count 5W/2 is even only when W % 4 == 0,
        # AND pack_frame's u16h path asserts even H and W, so a genuine
        # u16h buffer always passes while odd-width impostors never do
        # (advisor round-4). A W%4==0 u12 buffer with H%3==0 remains
        # structurally indistinguishable by shape alone; the decoded
        # garbage there fails the validity mask downstream.
        if (
            packed_u8.ndim != 2
            or packed_u8.shape[0] % 3 != 0
            or packed_u8.shape[1] % 2 != 0
        ):
            raise ValueError(
                f"depth_codec='u16h' expects a (3H/2, W) packed buffer "
                f"(W even) from pack_frame(..., cfg) with the same codec; "
                f"got shape {packed_u8.shape}. (A (3, H, W) buffer means "
                f"the frame was packed with the 'u16' codec; a (H, 5W/2) "
                f"one with 'u12'.)"
            )
        h = (packed_u8.shape[0] * 2) // 3
        gray = packed_u8[:h]
        d8 = packed_u8[h:]
        lo = d8[:, 0::2].astype(jnp.uint16)
        hi = d8[:, 1::2].astype(jnp.uint16)
        xi_h, mask_h = _image.inverse_depth_from_u16(
            lo | (hi << 8), cfg.depth_scale, cfg.min_depth, cfg.max_depth
        )
        xi, mask = _image.upsample2x_renorm(xi_h, mask_h)
        return gray, xi, mask
    if packed_u8.ndim != 3 or packed_u8.shape[0] != 3:
        raise ValueError(
            f"depth_codec='u16' expects a (3, H, W) packed buffer "
            f"[gray, depth-lo, depth-hi]; got shape {packed_u8.shape}. "
            f"(A 2-D buffer means the frame was packed with the 'u12' "
            f"codec — pass the same cfg to pack_frame and SlamSystem.)"
        )
    gray, d16 = unpack_frame(packed_u8)
    xi, mask = _image.inverse_depth_from_u16(
        d16, cfg.depth_scale, cfg.min_depth, cfg.max_depth
    )
    return gray, xi, mask


def _process_frame_impl(
    packed_u8: jax.Array,
    kf: DeviceKeyframe,
    motion: MotionState,
    intr: Intrinsics,
    cfg: SlamConfig,
) -> Tuple[jax.Array, DeviceKeyframe, MotionState]:
    tcfg, kcfg, fcfg = cfg.tracking, cfg.keyframe, cfg.fusion
    intrs = tuple(level_intrinsics(intr, l) for l in range(tcfg.levels))
    jac_dtype = jnp.bfloat16 if tcfg.jac_dtype == "bf16" else jnp.float32
    esm = getattr(tcfg, "jacobian", "ic") == "esm"

    gray_u8, xi, mask = decode_frame(packed_u8, cfg)
    intensity = gray_u8.astype(jnp.float32) * (1.0 / 255.0)
    plane_dtype = (
        jnp.bfloat16
        if getattr(tcfg, "plane_dtype", "f32") in ("bf16", "bf16-stack")
        else jnp.float32
    )
    cur = preprocess_planes(
        intensity, xi, mask, tcfg.levels, esm,
        getattr(tcfg, "esm_min_level", 0), plane_dtype,
        getattr(tcfg, "esm_geo_min_level", 0),
    )
    # Constant-velocity prediction (on device; f32 compose chains need the
    # Newton-polar re-projection onto SO(3) — see core/se3.py).
    T_init = se3.orthonormalize(se3.inv(motion.delta) @ motion.T_ck)
    track: TrackResult = _track_impl(
        kf.levels, cur, T_init, intrs, tcfg,
        cons_prev=motion.cons_excluded,
    )

    # Pose covariance: inverse of the final normal matrix (information).
    # track.H is per-pixel-normalized (conditioning); undo that here.
    Hd = track.H * jnp.maximum(track.n_valid[0], 1.0) + 1e-8 * jnp.eye(
        6, dtype=jnp.float32
    )
    cov = jax.scipy.linalg.cho_solve(
        jax.scipy.linalg.cho_factor(Hd), jnp.eye(6, dtype=jnp.float32)
    )

    # Tracking-loss check (the reference's frame rejection, SURVEY.md §5):
    # too little valid overlap or a non-finite pose -> reject. The
    # denominator is the APPLIED template mask count from the tracker
    # (consensus exclusions removed): against the raw keyframe count, a
    # consensus episode masking 20-35% of the template would read as
    # loss, and the loss path zeroes the persistence history — disabling
    # the mover rescue exactly while a mover is active.
    finite = jnp.all(jnp.isfinite(track.T))
    lost = jnp.logical_or(
        jnp.logical_not(finite),
        track.n_valid[0] < tcfg.min_valid_fraction * track.kf_count,
    )

    # "Confidently wrong" divergence guard (see TrackingConfig): a
    # basin-escaping mover drags the pose far off the constant-velocity
    # prior while the consensus layer's raw flags fire — but the residual
    # stays low, so the overlap-based loss check above never trips.
    # Declaring the frame lost hands it to coast-and-hold + the host's
    # BoW relocalization. Both signals are required: divergence alone
    # false-triggers on legitimate accelerations and on the clean
    # re-lock after a coast (large motion since the held prior, zero
    # stress flags).
    guard_fired = jnp.asarray(False)
    D = se3.inv(T_init) @ track.T
    div_t = jnp.linalg.norm(D[:3, 3])
    div_r = se3.rotation_angle(D[:3, :3])
    stress_n = jnp.sum((track.cons_excluded > 0.5).astype(jnp.float32))
    # Persistent stress: strata flagged for >= consensus_persist
    # CONSECUTIVE frames (the same persistence bar the consensus refit
    # uses — one-frame flags on hard rigid frames are routine and must
    # not count as corroboration).
    persist = float(getattr(tcfg, "consensus_persist", 3))
    stress_p = jnp.sum((track.cons_excluded >= persist).astype(jnp.float32))
    if getattr(tcfg, "divergence_guard", False) and getattr(
        tcfg, "consensus", False
    ):
        guard_fired = (
            ((div_t > tcfg.div_trans_thresh) | (div_r > tcfg.div_rot_thresh))
            & (stress_p > 0.5)
            & finite
        )
        lost = jnp.logical_or(lost, guard_fired)

    # Keyframe-switch decision (overlap / motion / uncertainty thresholds).
    t_norm = jnp.linalg.norm(track.T[:3, 3])
    angle = se3.rotation_angle(track.T[:3, :3])
    sigma_t = jnp.sqrt(jnp.maximum(jnp.trace(cov[:3, :3]), 0.0))
    switch = (
        (track.overlap < kcfg.min_overlap)
        | (t_norm > kcfg.max_translation)
        | (angle > kcfg.max_rotation)
        | (sigma_t > kcfg.max_pose_sigma)
    )
    if (
        getattr(tcfg, "rescue_refound", False)
        and getattr(tcfg, "consensus", False)
        and track.rescue is not None
    ):
        # Rescue -> REFOUND (see TrackingConfig.rescue_refound): a
        # hostage rescue means established drag against this template.
        # Mid-episode the vote path is deaf (template-aging inflates its
        # threshold ~2.4x at gauntlet baselines), so repeated rescues
        # oscillate: rescue -> one clean frame -> drag resumes. Founding
        # a fresh keyframe at the rescued (static-locked) pose restarts
        # the episode at small baseline where the vote path has full
        # sensitivity — the measured recovery pattern behind every
        # successful walking-mover run.
        switch = switch | (track.rescue > 0.5)
    switch = switch & jnp.logical_not(lost)

    def keep_branch(operands):
        kf, cur, T, cov = operands
        if getattr(fcfg, "fuse_every", 1) > 1:
            # Fusion cadence: skip the fuse+rebuild on off-cycle frames
            # (fused_count still advances so the cadence pattern holds).
            return jax.lax.cond(
                kf.fused_count % fcfg.fuse_every == 0,
                _fuse_branch,
                lambda op: (
                    op[0]._replace(fused_count=op[0].fused_count + 1),
                    jnp.asarray(0.0, jnp.float32),
                ),
                operands,
            )
        return _fuse_branch(operands)

    def _fuse_branch(operands):
        kf, cur, T, cov = operands
        cur0 = cur[0]
        # Inflate the (overconfident, pixel-independence-assuming) tracker
        # covariance with a fixed pose-noise floor before propagation.
        floor = jnp.diag(
            jnp.asarray(
                [fcfg.pose_trans_sigma**2] * 3 + [fcfg.pose_rot_sigma**2] * 3,
                jnp.float32,
            )
        )
        # K8 full contract: Kalman refinement over the FULL estimate mask
        # (confirmed + provisional claims), hit counts, and validity
        # growth into founding depth holes (SURVEY.md §2.2 K8, §3.4) —
        # hole pixels ride the same gather pass along a coarse-pyramid
        # depth guess.
        if fcfg.grow_validity:
            guess, gmask = fusion_mod.hole_guess(kf.levels)
        else:
            guess = gmask = None
        xi2, var2, mask2, hits2, n_fused = fuse_and_grow(
            kf.levels[0].xi,
            kf.var,
            kf.mask_full,
            kf.hits,
            cur0.xi,
            cur0.mask,
            T,
            cov + floor,
            intrs[0],
            fcfg,
            guess=guess,
            gmask=gmask,
        )
        kf2 = rebuild_after_fusion(
            kf, xi2, var2, mask2, intr, jac_dtype, tcfg.jacobian,
            fcfg.coarse_rebuild_every,
            hits=hits2, confirm_hits=fcfg.confirm_hits,
            fine_every=getattr(fcfg, "fine_rebuild_every", 1),
        )
        return kf2, n_fused

    def switch_branch(operands):
        kf, cur, T, cov = operands
        # The current frame founds the new keyframe IN-PROGRAM: the device
        # state evolution is fully self-contained, which is what lets the
        # host run whole flights without syncing. The retiring keyframe's
        # fused planes are this step's INPUT state — the host retains that
        # pytree reference (no copy) and finalizes from it when it reads
        # this frame's switch flag.
        kf2 = create_device_keyframe(cur, intr, fcfg, jac_dtype, tcfg.jacobian)
        return kf2, jnp.asarray(0.0, jnp.float32)

    def lost_branch(operands):
        kf, cur, T, cov = operands
        return kf, jnp.asarray(0.0, jnp.float32)

    # Three-way: lost -> no-op; switch -> new keyframe; else fuse.
    if fcfg.enabled:
        idx = jnp.where(lost, 2, jnp.where(switch, 1, 0)).astype(jnp.int32)
        kf2, n_fused = jax.lax.switch(
            idx, [keep_branch, switch_branch, lost_branch], (kf, cur, track.T, cov)
        )
    else:
        kf2, n_fused = jax.lax.cond(
            switch & jnp.logical_not(lost),
            switch_branch,
            lost_branch,
            (kf, cur, track.T, cov),
        )

    # Motion-model update (the host's old per-frame bookkeeping, on device):
    # coast one prediction step on the FIRST lost frame, then hold; reset
    # the inter-frame velocity while lost; re-anchor T_ck at identity when
    # a new keyframe is founded.
    eye = jnp.eye(4, dtype=jnp.float32)
    first_lost = motion.lost_count < 0.5
    T_eff = jnp.where(lost, jnp.where(first_lost, T_init, motion.T_ck), track.T)
    delta_new = jnp.where(
        lost, eye, se3.orthonormalize(motion.T_ck @ se3.inv(track.T))
    )
    T_ck_new = jnp.where(switch & jnp.logical_not(lost), eye, T_eff)
    motion2 = MotionState(
        T_ck=T_ck_new,
        delta=delta_new,
        lost_count=jnp.where(lost, motion.lost_count + 1.0, 0.0),
        # Persistence memory: this frame's raw disagreement flags (zeroed
        # on lost frames so a recovery can't inherit stale dynamics —
        # keeping the streak through a coast was measured to hold the
        # episode mask down across the whole lost stretch and block
        # re-lock entirely on the QVGA ballistic clip).
        cons_excluded=jnp.where(lost, 0.0, track.cons_excluded),
    )

    res = StepResult(
        T=T_eff,
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
        consensus_frac=track.consensus_frac,
        guard_fired=guard_fired.astype(jnp.float32),
        div_trans=div_t,
        div_rot=div_r,
        cons_flags=stress_n,
        cons_flags_persist=stress_p,
        rescue=track.rescue,
    )
    return res.pack(), kf2, motion2


# Compiled-program reuse across ProcessFrame instances: jax.jit's
# internal cache keys on function identity, so every `functools.partial`
# built in __init__ would recompile an IDENTICAL program (~45 s flight
# program + multi-minute bootstrap at VGA on the sandbox, SURVEY App.
# D #5). (intr, cfg) are hashable value types (NamedTuple + frozen
# dataclasses), so two systems with equal configuration share one jitted
# callable — snapshot.restore(), bench A/B arms, and every test that
# rebuilds a system with an already-seen config skip the recompile.
_JIT_CACHE: dict = {}


class ProcessFrame:
    """Jit-compiled per-frame step bound to (intrinsics, config).

    The keyframe argument is deliberately NOT donated: the host retains
    the input-state pytree of each in-flight frame so that when a switch
    flag is read back (up to flight_depth frames later) the retiring
    keyframe's fused planes are still alive for finalization. Donation was
    measured a no-op on the sandbox emulator, and on real v5e the pass-
    through copies it would save are ~30 MB at HBM bandwidth (~15 us) —
    while flight pipelining saves ~28 ms of host-sync cost per frame.
    """

    def __init__(self, intr: Intrinsics, cfg: SlamConfig):
        self.intr = intr
        self.cfg = cfg
        try:
            cached = _JIT_CACHE.get((intr, cfg))
        except TypeError:  # unhashable field (e.g. list via override)
            cached = None
        if cached is not None:
            self._fn, self._init_kf = cached
            return
        self._fn = jax.jit(
            functools.partial(_process_frame_impl, intr=intr, cfg=cfg)
        )

        jac_dtype = (
            jnp.bfloat16 if cfg.tracking.jac_dtype == "bf16" else jnp.float32
        )
        esm = getattr(cfg.tracking, "jacobian", "ic") == "esm"

        def _init(packed):
            gray, xi, mask = decode_frame(packed, cfg)
            intensity = gray.astype(jnp.float32) * (1.0 / 255.0)
            return create_device_keyframe(
                preprocess_planes(
                    intensity, xi, mask, cfg.tracking.levels, esm,
                    getattr(cfg.tracking, "esm_min_level", 0),
                    esm_geo_min_level=getattr(
                        cfg.tracking, "esm_geo_min_level", 0
                    ),
                ),
                intr,
                cfg.fusion,
                jac_dtype,
                cfg.tracking.jacobian,
            )

        self._init_kf = jax.jit(_init)
        try:
            _JIT_CACHE[(intr, cfg)] = (self._fn, self._init_kf)
        except TypeError:
            pass

    def init_keyframe(self, packed_u8) -> DeviceKeyframe:
        return self._init_kf(packed_u8)

    def __call__(
        self, packed_u8, kf: DeviceKeyframe, motion: MotionState
    ) -> Tuple[jax.Array, DeviceKeyframe, MotionState]:
        """Returns (packed StepResult vector (device-resident until the
        caller forces it), new keyframe state, new motion state)."""
        return self._fn(packed_u8, kf, motion)
