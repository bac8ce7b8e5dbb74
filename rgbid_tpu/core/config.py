"""Configuration dataclasses for the whole framework.

TPU-native equivalent of the reference's ini-style Settings component
(SURVEY.md §2.1 "Settings/config": pyramid levels, per-level iterations,
Student-t nu, keyframe thresholds, loop-closure toggles).

All configs are frozen dataclasses so they hash stably and can be used as
static arguments to jitted functions. ``SlamConfig.from_json`` /
``override`` give the CLI the same flexibility as the reference's config
file + flags.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Tuple


@dataclass(frozen=True)
class TrackingConfig:
    """Frame-to-keyframe dense tracking (SURVEY.md §3.2)."""

    levels: int = 4
    # Gauss-Newton iterations per level, indexed by level (0 = finest).
    # Coarse levels get more iterations, like the reference: a coarse
    # iteration costs 4-64x less than a finest-level one (fewer pixels)
    # but does the heavy lifting of pulling large motions into the fine
    # levels' convergence basin. Measured on hard synthetic clips
    # (round 2): moving budget coarse-ward, (2,8,14,22) HALVES ATE vs the
    # round-1 default (3,4,7,12) at ~equal frame time. Round 3 measured
    # (2,6,12,20) on the sensitive gauntlet trio (handheld 5.05 vs 4.58,
    # exposure 5.8 vs 5.3, walking mover 55.2 vs 55.0 mm — within
    # emulator noise) at -2 ms/frame, and adopted it; deeper cuts
    # ((2,4,10,18)) measurably degrade hard scenarios. NOT re-tunable
    # downward for speed alone: esm_min_level=2 looked speed-neutral on
    # the easy clip but took the walking mover 55 -> 200 mm.
    iters: Tuple[int, ...] = (2, 6, 12, 20)
    # Per-level TEMPLATE-pixel decimation stride for the IRLS solve
    # (round-5 speed lever; 1 = every template pixel). The round-5 flight
    # profile measured the per-iteration cost scaling with PIXELS (bytes
    # gathered + reduced): 8.1 ms/iter at VGA L0, 1.05 at L1 — the two
    # full-res iterations are the single largest item in the 67 ms frame.
    # Stride s keeps every s-th template ROW AND COLUMN: the gather/reduce
    # bytes drop s^2 x while the CURRENT-frame planes stay full resolution
    # (full image sharpness at the sampled points — unlike dropping the
    # level, which blurs), and the solve still uses H*W/s^2 ~ 77k pixels
    # at VGA s=2, vastly overdetermining 6 DOF. Backprojection uses
    # stride-scaled intrinsics (exact: pixel (i,j) of the strided grid IS
    # full-res pixel (s*i, s*j)); projection/Jacobians keep the full
    # intrinsics. Applies to the TRACKING template only — fusion, template
    # rebuild, and the keyframe's stored planes stay full resolution.
    # Default (2,2,1,1) since round 5: the full-gauntlet accuracy A/B
    # (7 scenarios x seeds 3+2, QVGA 60 f) measured it accuracy-NEUTRAL
    # (rows move within their seed spread, several improve) while the
    # real-TPU headline gained 14.8 -> 19.1 fps (-25% ms/frame). Set
    # (1,1,1,1) to recover the exact round-4 numerics. See BASELINE.md
    # round-5 "template-pixel stride" record before re-tuning.
    template_stride: Tuple[int, ...] = (2, 2, 1, 1)
    # Student-t degrees of freedom (reference default nu ~= 5).
    student_t_nu: float = 5.0
    # Initial robust scales (intensity in [0,1], inverse depth in 1/m).
    init_sigma_int: float = 0.1
    init_sigma_xi: float = 0.05
    # Fixed-point iterations of the Student-t scale update per GN iteration.
    sigma_iters: int = 1
    # "exact": sigma updated from this iteration's residuals before
    # weighting (oracle semantics, 2 reduction passes). "lagged": weights
    # use the previous iteration's sigma and the update rides the same
    # reduction pass (half the dispatches; same fixed point).
    sigma_mode: str = "lagged"
    # Levenberg damping added to the 6x6 normal equations for safety.
    damping: float = 1e-6
    # Use the inverse-depth geometric residual channel in addition to the
    # photometric channel (the reference's joint error).
    use_geometric: bool = True
    # Huber-style gate: samples whose |r| exceeds gate_sigmas * sigma are
    # counted as outliers in diagnostics (weights already downweight them).
    gate_sigmas: float = 3.0
    # Occlusion/dynamics gate (ESM path): pixels whose INVERSE-DEPTH
    # residual exceeds gate_sigmas * sigma_xi are excluded from BOTH
    # residual channels, not just downweighted per-channel. A near-field
    # moving object carries outsized Fisher information (warp Jacobians
    # scale as 1/z^2), so per-channel Student-t alone lets it drag the
    # pose (measured: a moving panel covering ~20% of the view pulled the
    # tracker 0.84 m off in 16 frames; geometric gating reduces that to
    # mm). Same principle as the reference's fusion occlusion gate,
    # applied to tracking.
    occlusion_gate: bool = True
    # HARD CAP (1/m) on the occlusion gate's threshold at the finest
    # pyramid level(s) (levels <= occ_gate_cap_level; 0.0 disables).
    # The adaptive gate width ((2*gate_sigmas)^2 sigma_xi^2 + 0.05^2)
    # balloons to ~0.3 1/m exactly when a fast mover is dragging the
    # pose (its contamination inflates sigma_xi), letting the mover's
    # 0.15-0.46 1/m inverse-depth disagreement through. A BALLISTIC
    # mover (0.04+ m/frame) outruns its own template-stratum consensus
    # mask — it covers fresh background every frame, so the only
    # per-pixel handle on its CURRENT position is this gate. By level 0
    # the pose is sub-pixel and genuine inverse-depth residual spread is
    # at the noise floor (~0.01 1/m measured), so a 0.10 cap is ~10
    # sigma for rigid content while cutting panel-over-background
    # contamination (>= 0.155 1/m at the gauntlet geometry). Coarse
    # levels keep the adaptive width so genuinely misaligned frames can
    # still be pulled in.
    occ_gate_cap: float = 0.10
    occ_gate_cap_level: int = 0
    # Affine illumination compensation (ESM path only; ignored in IC
    # mode): estimate gain/bias (I_cur ~= a * I_kf + b) once per frame by
    # alignment-free moment matching and bake it into the tracking
    # template. Rescues auto-exposure-like drift (which violates the
    # brightness constancy the photometric term assumes) for two
    # full-image reductions per frame.
    affine_illumination: bool = True
    # Minimum fraction of keyframe pixels that must warp into the current
    # image with valid samples for the frame to be accepted.
    min_valid_fraction: float = 0.2
    # IRLS reduction implementation: "xla" (einsum path), "pallas" (fused
    # kernel A'), or "auto" (pallas on TPU, xla elsewhere).
    kernel: str = "auto"
    # Jacobian formulation: "ic" (inverse-compositional, precomputed
    # (12, H, W) template Jacobian field) or "esm" (efficient second-order
    # minimization: averaged template/current gradients with the warp
    # Jacobian recomputed in-kernel from template points — no Jacobian
    # field is stored or rebuilt at all, and convergence per iteration is
    # near-second-order).
    jacobian: str = "esm"
    # Coarsest level at which ESM gradient AVERAGING starts: levels >= this
    # sample the current frame's gradients too (full ESM — second-order
    # convergence where the motion is large); finer levels use template
    # gradients only, sampling just [I, xi, mask] — at the finest VGA level
    # the pose is already near-converged and the (7, H, W) sampling stack's
    # materialization + gather traffic was the single largest preprocess
    # cost (~30 ms/frame on the sandbox). 0 = full ESM everywhere.
    esm_min_level: int = 1
    # Coarsest level at which ESM gradient averaging extends to the
    # GEOMETRIC (inverse-depth) channel: levels >= this carry the full
    # 7-plane stack [I, xi, mask, gxI, gyI, gxXi, gyYi]; ESM levels
    # below it carry 5 planes [I, xi, mask, gxI, gyI] — intensity keeps
    # full ESM averaging (where the texture information lives) while
    # the geometric channel uses TEMPLATE gradients only, cutting that
    # level's per-iteration corner-gather traffic 7 -> 5 planes (-29%)
    # and dropping its two xi-gradient convs per frame. Default 0:
    # 7-plane at every ESM level (the rounds-1-3 behavior). The 5-plane
    # mode was round-4's named structural lever and is a MEASURED
    # ACCURACY NEGATIVE as a default: on the noisy-depth loop clip
    # (xi_noise 0.004, 17 keyframes/40 frames) 5-plane everywhere
    # scored 17.7 mm vs 7-plane's 5.3 mm, 5-plane at level 1 only
    # (geo_min=2) still 16.7 mm, and fresh coarse template rebuilds
    # (coarse_rebuild_every=1) did NOT recover it (16.6 mm) — the
    # geometric channel's current-frame gradient term is genuinely
    # load-bearing under depth noise, not a staleness artifact. The
    # sandbox speed win was ~5% (70.1 vs 73.9 ms/frame same-tenancy
    # VGA A/B). Kernels dispatch on the stack's channel count (7/5/3 —
    # all three layouts stay tested on-chip); this knob only controls
    # what preprocess materializes. Set to 2 for 5-plane at the fine
    # ESM level, 99 for 5-plane everywhere.
    esm_geo_min_level: int = 0
    # Storage dtype for the (12, H, W) template Jacobians: "bf16" halves
    # the dominant per-iteration HBM read (~15 MB/iter at VGA); products
    # still accumulate in f32 and the IRLS fixed point (J^T W r = 0 with
    # the stored J at r -> 0) is unchanged. Use "f32" to disable.
    jac_dtype: str = "bf16"
    # Storage dtype for the per-frame sampling stack and the loop-invariant
    # tracking planes the per-iteration program re-reads from HBM every
    # IRLS iteration (current-frame [I, xi, mask(, grads)] stack fed to the
    # 4-corner gather, template intensity, hoisted backprojected points
    # Px/Py/Pz). "bf16" halves that traffic; all residual/Jacobian MATH
    # stays f32 (bilinear blend, kernel loads cast up). Quantization:
    # intensity step ~2e-3 at 0.5 — below the u8 sensor quantization
    # (1/255) already accepted at upload; xi step ~4e-3 at 1/m — below the
    # gauntlet sensor noise (5e-3) and TUM depth noise (~1.5e-2 at 1 m).
    # The IRLS fixed point is unchanged (stored planes enter residuals,
    # not accumulators). Values: "f32" (default), "bf16" (both plane
    # families), and the ablation splits "bf16-stack" (only the frame's
    # gather stack, honored by the preprocess path) / "bf16-points"
    # (only the hoisted keyframe points + template intensity, honored by
    # the tracker). Any other string falls back to f32.
    plane_dtype: str = "f32"
    # Depth-stratified motion consensus (tracking/consensus.py): detects a
    # coherently moving, information-dominant foreground (the documented
    # breaking point of non-segmenting dense VO, reference included) by
    # letting each inverse-depth stratum of the template vote on the pose
    # with PIXEL-COUNT support after each coarse level converges, then
    # masks the persistent non-consensus strata out of the template for
    # the finer levels (hostage episodes re-track the whole pyramid).
    # Costs one fused stratified reduction per vote level per frame
    # (~1.6 ms/frame on the sandbox).
    consensus: bool = True
    consensus_bins: int = 6
    # COARSEST vote level (clamped to levels-1): votes run after every
    # level from here down to level 1; coarse votes are cheap, the
    # level-1 vote catches movers whose information only bites there.
    consensus_level: int = 2
    # Agreement tolerance between stratum hypotheses, measured as the RMS
    # image flow (PIXELS at consensus_level) one stratum's pose would
    # induce on another relative to its own optimum (geometry-Gram
    # metric; see tracking/consensus.py analyze()). Calibrated on the
    # gauntlet: a walking-speed near mover's onset signal is ~0.4-0.6 px
    # and must be caught within ~2 frames, before the drag decorrelates
    # the static majority; rigid-scene splits stay below that except on
    # hard two-band scenes, which the >=3-voter rule exempts.
    consensus_tol: float = 0.4
    # consensus_tol is specified in pixels ON THE CALIBRATION RIG
    # (320x240, fx = 258.6 — the gauntlet geometry); at track time it is
    # scaled by fx_full / consensus_ref_fx so the PHYSICAL (angular)
    # flow threshold is resolution-invariant — without this a VGA run
    # sees 2x the pixel flow per unit disagreement at every level index
    # and rigid-noise splits break the 60% vote majority. (Measured
    # round 3: at VGA, tol 0.4 px = no majority ever forms, tol 0.8
    # unscaled-equivalent went 195 mm because template-aging inflation
    # then pushed the MOVER below threshold; the scaling + rescue_refound
    # together restore QVGA-class behavior.) QVGA runs are bit-identical
    # (scale = 1).
    consensus_ref_fx: float = 258.6
    # Rescue -> keyframe REFOUND: when the hostage rescue fires
    # (established drag), found a new keyframe from the rescued pose
    # instead of continuing against the dragged template. Measured
    # (round 3, VGA walking mover): mid-episode the vote path is deaf —
    # baseline_scale sits at ~2.4 at the gauntlet's orbit baselines, so
    # tol_eff ~1.9 px vs a 1.4 px mover signal — and repeated rescues
    # oscillate (rescue -> clean frame -> drag resumes; 77-87 mm ATE).
    # Every successful QVGA walking run recovered through a keyframe
    # switch LANDING on the rescue frame by luck; this makes the switch
    # deliberate. A rigid-scene false rescue costs one extra keyframe
    # (benign; the refit re-converges to the same pose).
    rescue_refound: bool = True
    # Refound only when the rescue actually CORRECTED the pose (||t|| or
    # angle of main-vs-rescued pose above these): a rigid-scene false
    # rescue re-converges to the same pose (measured mm-level deltas on
    # hard rigid frames; ungated refounds there cost 1.9 -> 10.8 mm ATE
    # on a 14-frame loop), a genuine drag correction is tens of mm.
    rescue_refound_min_trans: float = 0.02
    rescue_refound_min_rot: float = 0.02
    # A stratum votes only if it holds this fraction of valid pixels.
    consensus_min_frac: float = 0.03
    # Error-outlier exclusion (fast movers beyond the linearization
    # basin): a voter stratum is excluded when its per-pixel weighted
    # error exceeds max(err_ratio * voters' median, err_floor). With the
    # fixed init sigmas, aligned strata sit at (r/sigma)^2 << 1 and
    # decorrelated ones saturate near nu+1 per pixel.
    consensus_err_ratio: float = 4.0
    consensus_err_floor: float = 1.0
    # Consecutive frames a stratum must be flagged before exclusion acts
    # (counts threaded through MotionState). 2 measurably leaked on
    # handheld-jitter hard-frame pairs; a real mover flags its strata for
    # its whole episode, so 3 costs one extra frame of drag at onset.
    consensus_persist: int = 3
    # Refit only if the excluded strata hold more than this pixel fraction.
    consensus_trigger_frac: float = 0.03
    # ...and LESS than this: a mover is a pixel minority by construction;
    # "half the image disagrees" is unresolved optimization error, not
    # dynamics, and masking it amplifies noise (measured).
    consensus_max_frac: float = 0.35
    # Inverse-depth range binned into consensus_bins log-spaced strata.
    # SlamSystem derives these from (min_depth, max_depth) — out-of-range
    # pixels are clamped into the edge bins, so the range must span the
    # sensor's valid depths; the defaults match the default 0.3-10 m.
    consensus_xi_min: float = 0.1
    consensus_xi_max: float = 3.4
    # "Confidently wrong" divergence machinery (the ballistic-mover
    # investigation, round 3). Two possible responses were built and
    # MEASURED per-frame across the gauntlet (signal table in
    # BASELINE.md):
    #
    # 1. divergence_guard — declare the frame LOST (coast + BoW reloc)
    #    when the pose diverges from the constant-velocity prior while
    #    consensus stress flags persist. Measured UNSAFE, default off:
    #    on rigid large_motion the prior diverges 30-55 mm EVERY frame
    #    (sinusoid prediction error) with sporadic raw flags — the
    #    identical signature to ballistic drag onset — while the
    #    ballistic mover's own drag is absorbed into the prior within
    #    ~2 frames (div drops to 5-15 mm). No threshold separates them;
    #    any that fires on the mover also coasts rigid frames whose
    #    prior is 40 mm wrong, which is strictly worse than tracking.
    divergence_guard: bool = False
    # 2. div_rescue — on divergence + stress-flag coincidence, RE-TRACK
    #    the pyramid from the prior with the flagged strata masked (the
    #    hostage-rescue response on a new trigger). Measured A/B on the
    #    gauntlet (QVGA, 60 f): ballistic 370.8 vs 370.7 mm (no benefit
    #    — the drag is absorbed into the prior, so the per-frame trigger
    #    fires on the wrong frames), walking/handheld unchanged,
    #    large_motion 9.7 vs 7.7 mm (false-positive re-tracks from a
    #    40 mm-wrong prior land slightly worse). Net negative → default
    #    OFF; kept as a config option and as the documented record of
    #    the second attempted answer.
    div_rescue: bool = False
    # Divergence thresholds vs the motion prior, per frame. Calibration:
    # the gauntlet's hardest RIGID direction reversal (large_motion,
    # 0.55 m amplitude sinusoid) deviates ~0.012 m/frame from constant
    # velocity at QVGA in theory but measures 30-55 mm against the
    # CONVERGED pose; the ballistic panel's drag-onset spikes are
    # 53-67 mm with stress flags raised.
    div_trans_thresh: float = 0.03  # meters
    div_rot_thresh: float = 0.04  # radians
    # 3. attack_probe — the round-4 answer that finally moved the
    #    ballistic row (forensics in BASELINE.md round-4). At ballistic
    #    onset the coarse solve locks onto the mover within ONE frame,
    #    so every per-stratum test runs at a MOVER-locked pose: the vote
    #    excludes the static band the mover currently occludes (the
    #    victim), the resolution-limited far background sides with the
    #    mover, and the mover's own information share (1.7x pixel share)
    #    is indistinguishable from a rigid near band's (1.4x) — nothing
    #    names the attacker directly, which is why divergence_guard /
    #    div_rescue / a lower hostage gate all measured useless here.
    #    The probe inverts the question: a vote exclusion under a CLEAR
    #    majority is the (1-frame, persistence-free) signature that SOME
    #    agreeing stratum holds the pose, and the only one that CAN is
    #    the highest information-density agreeing minority voter (1/z^2
    #    is the attack vector). Response: one masked re-track from the
    #    prior with that stratum removed, accepted only if it fits the
    #    retained template STRICTLY better (probe_margin) — a rigid
    #    false fire re-converges to the same pose and the tie is
    #    rejected. An ACCEPTED probe also hands the streak to the probed
    #    attacker (tracker.py streak transfer): the false accusation
    #    decays and the episode mask ripens on the MOVER within
    #    consensus_persist frames of onset. Measured (QVGA 60 f, full
    #    system, TPU): ballistic mover 151.9 -> 14.4 mm, fr3/walking
    #    stand-in 37.2 -> 4.1 mm, and the other NINE gauntlet rows
    #    (walking, handheld, large_motion, exposure, depth_holes, mid
    #    mover, kinect, easy orbit, combined endurance) BIT-IDENTICAL —
    #    hence default ON.
    attack_probe: bool = True
    # Strict acceptance margin for the attack probe: the probed pose's
    # fixed-sigma level-0 error on the retained template must be below
    # margin * the main pose's. 1.0 would accept ties (measured unsafe
    # for premature rescues, round 3); the ballistic onset separation is
    # huge (measured err_r = 0.20x err_m at the true pose, f25 of the
    # forensic clip), so 0.9 keeps full sensitivity with a real
    # rejection band for rigid fires (measured ties: err_r/err_m
    # 0.95-1.1 on rigid hard frames — all rejected).
    probe_margin: float = 0.9
    # Per-level early exit: stop a level's IRLS loop once the solved pose
    # step's twist norm (meters + radians) falls below this; cfg.iters then
    # acts as a BUDGET — hard frames spend it all, converged frames skip
    # the rest. 1e-5 = 10 um / 10 urad, two orders below the tracker's
    # mm-scale noise floor. Default 0 (static fori_loop): on the sandbox
    # emulator a lax.while_loop costs ~5 ms per instance even at zero
    # trips, cancelling the savings; on real TPU hardware set ~1e-5.
    early_exit_tol: float = 0.0
    # Convergence SKIP (the emulator-friendly sibling of early_exit_tol):
    # keep the static fori_loop but wrap the iteration body in a
    # lax.cond on the previous step's twist norm — converged iterations
    # become runtime no-ops, skipping the 4 corner gathers + IRLS kernel
    # (measured ~1 ms skipped vs ~6.6 ms hot per VGA trip, ISOLATED).
    # Default 0 (off): in the PRODUCTION flight pipeline the cond is a
    # net LOSS on this sandbox — 87.0 vs 71.3 ms/frame median on the VGA
    # bench (round-3 A/B at 1e-5; the per-trip cond dispatch breaks the
    # overlap the straight-line body gets — probe-vs-production
    # inversion #4, SURVEY.md Appendix D #1). Semantics are safe either
    # way (skipped steps would move the pose < tol; 1e-5 = 10 um /
    # 10 urad, two orders below the mm noise floor), so deployments on
    # real TPU hardware — where a branch costs ~us, not ms — should
    # re-measure and likely enable it.
    conv_skip_tol: float = 0.0
    # Bilinear-corner gather form for the per-iteration sample pass:
    # False = four separate corner gathers (the sandbox production
    # winner); True = one stacked-index gather (4x fewer gather
    # dispatches — measured 16% faster in an isolated probe but
    # +4 ms/frame in the sandbox flight pipeline, a probe-vs-production
    # inversion; expected to win on real v5e where dispatch is ~us).
    # Semantics are bit-identical. This config drives the tracker hot
    # path; warp.STACKED_GATHER remains the default for non-hot sites
    # (fusion's once-per-fused-frame pass, relocalization).
    stacked_gather: bool = False


@dataclass(frozen=True)
class KeyframeConfig:
    """Keyframe switching + lifecycle (SURVEY.md §2.1 KeyframeManager)."""

    # Switch when the valid-overlap fraction between current frame and the
    # active keyframe drops below this.
    min_overlap: float = 0.75
    # ... or when the camera moved too far from the keyframe.
    max_translation: float = 0.25  # meters
    max_rotation: float = 0.25  # radians
    # ... or when the pose uncertainty grows too large (trace of covariance).
    max_pose_sigma: float = 1e-2


@dataclass(frozen=True)
class FusionConfig:
    """Inverse-depth fusion + uncertainty propagation (SURVEY.md §3.4)."""

    # Master switch: when False the keyframe map is never refined (pure
    # frame-to-keyframe odometry, first-observation depth).
    enabled: bool = True
    # Sensor noise model: std of inverse depth measurements (approximately
    # constant over range for structured-light sensors — the paper's key
    # observation motivating the inverse-depth parametrization).
    sensor_sigma_xi: float = 0.008
    # Occlusion / dynamic-object gate in combined sigmas.
    gate_k: float = 2.0
    # Variance floor/ceiling. The floor is a PROCESS-NOISE floor, not a
    # numerical epsilon: per-pixel observations fused across frames share
    # correlated error (pose drift), so letting the Kalman variance fall to
    # sigma^2/n makes the keyframe overconfident, the gate then rejects
    # everything, and tracking drifts against a frozen biased template.
    # floor = (0.003 1/m)^2 caps the claimed accuracy at ~sqrt(n)=2.7x the
    # sensor sigma.
    min_variance: float = 9e-6
    max_variance: float = 1.0
    # Extra pose-uncertainty inflation applied to the tracker covariance
    # before propagating it into observation variance (the IRLS covariance
    # assumes independent pixels and is far too confident).
    pose_trans_sigma: float = 0.003  # meters
    pose_rot_sigma: float = 0.002  # radians
    # Fusion implementation: "xla", "pallas" (fused kernel B), or "auto"
    # (pallas on TPU, xla elsewhere).
    kernel: str = "auto"
    # Template-rebuild amortization: the finest level is refreshed from the
    # fused depth EVERY frame; the coarse xi pyramid + gradients every N
    # fused frames (1 = always, the round-1 behavior). Coarse levels only
    # seed coarse-to-fine initialization, so a few frames of staleness
    # there does not move the final pose (validated on the endurance clip).
    coarse_rebuild_every: int = 4
    # Fuse observations into the keyframe every Nth tracked frame
    # (1 = every frame, the reference's cadence). At 2 the depth map
    # still integrates ~15 observations over a typical keyframe life;
    # saves the fusion pass's cost on skipped frames (sandbox ~5 ms).
    # Default 2 (round 3): gauntlet A/B at 60 frames/scenario shows no
    # accuracy cost on the fusion-sensitive scenarios (depth_holes 4.14
    # vs 3.73 mm — within emulator noise; handheld 5.31 vs 5.05;
    # combined 3.84 vs 5.06; walking mover 34 vs 55 mm).
    fuse_every: int = 2
    # Refresh the FINEST-level tracking template from the fused depth
    # every Nth fused frame (1 = every frame). >1 trades one frame of
    # template-depth staleness for the rebuild's gradient convs.
    # Stays 1: with fuse_every=2 the rebuild already runs half the
    # frames, and a production A/B of fine=2 on top measured no further
    # frame-time change (72.1 vs 71.5 ms median — noise).
    fine_rebuild_every: int = 1
    # K8 validity growth (SURVEY.md §2.2 K8 "update validity & hit
    # counts", §3.4): frames that observe pixels INVALID in the keyframe
    # (depth holes at founding) claim them, so keyframes self-complete
    # like the reference's instead of keeping their founding holes for
    # life. Gather formulation riding the fusion pass's existing corner
    # gathers — hole pixels warp along a coarse-pyramid depth guess and
    # claim observations that close the loop (a literal scatter like the
    # reference's measured ~90 ms/claim at VGA on this platform).
    grow_validity: bool = True
    # Loop-closure gate for a claim: |xi re-expressed in keyframe -
    # coarse guess| in 1/m. Wide enough for coarse-level edge bleed,
    # tight enough to reject foreground/background confusion.
    claim_tol: float = 0.08
    # Claimed pixels start at this variance multiple of the observation
    # variance: single-look estimates through a guessed correspondence
    # must refine (and be confirmed) before being trusted.
    claim_var_inflation: float = 4.0
    # Hit-count confirmation threshold: a pixel enters the TRACKING
    # template and the exported cloud only once its hit count reaches
    # this. Founding pixels are direct sensor measurements and start
    # confirmed (hits = confirm_hits); claimed pixels start at 1 and need
    # confirm_hits - 1 further consistent observations.
    confirm_hits: float = 2.0


@dataclass(frozen=True)
class BackendConfig:
    """Loop closure + pose graph (SURVEY.md §3.3)."""

    enabled: bool = True
    # ORB features per keyframe for place recognition.
    num_features: int = 500
    # Bag-of-words vocabulary tree shape (branching^levels hierarchical
    # k-medians words). Used when training IN-RUN (vocab_path=""); the
    # packaged pretrained default below is an 8^4 = 4096-word tree.
    vocab_branching: int = 8
    vocab_levels: int = 4
    vocab_train_after: int = 3000
    # Pretrained vocabulary file (the reference's DBoW2 model: trained
    # offline, loaded at startup, never retrained). DEFAULT since round
    # 3: "builtin" = the packaged rgbid_tpu/data/vocab_b8l4.npz (built
    # by backend.build_vocab on a 48-scene multi-resolution synthetic
    # ORB corpus; revisit benchmark precision 0.92-0.98 at recall 1.0
    # with the scoring defaults below — above the 0.90 of in-run
    # training). "" = train in-run; any other value = path to a .npz
    # from build_vocab.
    vocab_path: str = "builtin"
    # BoW scoring refinements (measured on the disjoint revisit
    # benchmark, round 3): sqrt term-frequency damps burstiness (+3-5
    # precision points); the relative-score gate drops candidates below
    # this fraction of the best score (+7-8 points at recall 1.0).
    tf_mode: str = "sqrt"
    rel_score: float = 0.65
    # Odometry edges measured while the CONSENSUS machinery was active
    # (a ripened episode mask, a dominance/probe rescue, or live vote
    # exclusions anywhere in the inter-keyframe interval) get their
    # information scaled by this factor in the pose graph. A mover
    # episode bakes its drag into exactly those edges; at full stiffness
    # the optimizer honors them and distributes a loop closure's
    # correction into the CLEAN edges instead — measured on the round-5
    # mover_then_revisit forensics: the correct pre-episode keyframes
    # were dragged to ~372 mm while the mover-locked edges stayed put.
    # Soft episode edges concentrate the correction where the error
    # actually is; on clips with no loop closure a tree graph satisfies
    # soft edges exactly, so this is a no-op there (measured
    # bit-identical). 1.0 disables. The scale must clear the DYNAMIC
    # RANGE of clean-edge informations, not just their typical value:
    # a low-overlap clean edge measured 200x weaker than its neighbors
    # (2.1e7 vs 4e9), so at 1e-2 a third of the revisit correction still
    # dumped into it — 1e-4 puts every episode edge well below the
    # weakest clean edge. Episode edges are also Huber-robustified in
    # the optimizer so the correction concentrates in the genuinely
    # inconsistent ones among them.
    episode_info_scale: float = 1e-4
    # Candidate gating.
    min_score: float = 0.12
    min_keyframe_gap: int = 10
    max_candidates: int = 4
    # Dense verification (coarse pyramid levels, fixed iteration budget).
    reloc_level: int = 2
    reloc_iters: int = 12
    max_reloc_residual: float = 2.5
    min_reloc_inliers: float = 0.55
    # Absolute residual-scale gates (the normalized error/inlier stats are
    # scale-invariant and accept garbage alignments on their own).
    max_reloc_sigma_int: float = 0.06
    max_reloc_sigma_xi: float = 0.04
    # Tracking-loss recovery: after this many consecutive lost frames,
    # attempt global relocalization against the keyframe BoW database
    # (the reference's recovery mechanism, SURVEY.md §5).
    reloc_after_lost: int = 3
    # Pose graph optimization.
    pg_iterations: int = 15
    pg_damping: float = 1e-5
    # Use the native C++ pose-graph solver when built (falls back to numpy).
    use_native: bool = True


@dataclass(frozen=True)
class VizConfig:
    """Live visualization (the reference's 3-pane GUI, headless).

    A third thread (utils/live_view.py) periodically composites the
    current frame, active keyframe, and trajectory/map into
    ``<out_dir>/live.png`` — atomically replaced so an external watcher
    can poll it while the system runs. Snapshots are published lossily
    from host-side data only; the tracking hot path never blocks on
    rendering and never reads device planes for it.
    """

    enabled: bool = False
    # Publish a snapshot every N processed frames.
    every_n: int = 10
    # Output directory for live.png (+ numbered history when history=True).
    out_dir: str = "live_viz"
    history: bool = False
    # Re-render the (matplotlib) map pane every N snapshots; panes 1-2 are
    # cheap OpenCV composites and refresh every snapshot.
    map_every: int = 3


@dataclass(frozen=True)
class SlamConfig:
    """Top-level system configuration (mirrors the reference's Settings)."""

    tracking: TrackingConfig = field(default_factory=TrackingConfig)
    keyframe: KeyframeConfig = field(default_factory=KeyframeConfig)
    fusion: FusionConfig = field(default_factory=FusionConfig)
    backend: BackendConfig = field(default_factory=BackendConfig)
    viz: VizConfig = field(default_factory=VizConfig)
    # Depth PNG scale: raw u16 / depth_scale = meters (TUM uses 5000).
    depth_scale: float = 5000.0
    # Maximum sensor range in meters; deeper measurements are invalid.
    max_depth: float = 10.0
    min_depth: float = 0.3
    # Host->device depth transfer codec. "u16": raw depth as two u8
    # planes (exact). "u12": inverse depth uniformly quantized to 12
    # bits over [1/max_depth, 1/min_depth] and bit-packed 2 px -> 3 B,
    # cutting the per-frame upload 0.92 -> 0.77 MB. Fidelity: with the
    # default [0.3, 10] m range the xi step is 7.9e-4 1/m — 3.6x FINER
    # than a Kinect's own disparity quantization (1/8 px at
    # f*b ~= 43.5 m*px -> 2.9e-3 1/m), i.e. below sensor resolution;
    # depth error at 2 m is ~1.6 mm, and the bench-clip ATE is
    # IDENTICAL under both codecs (1.27 mm, round 3 session 3).
    # Default stays "u16" on the sandbox: the emulator prices the u12
    # device-side bit-unpack (~5 elementwise VGA ops + an interleave)
    # at about what the 0.15 MB DMA saving buys back (measured flights
    # 69.1/69.7 u16 vs 69.7/71.5 u12 ms/frame — a wash within tenancy
    # noise). On real v5e the decode is ~free on the VPU and 17% fewer
    # host->device bytes is a pure win: flip to "u12" there.
    # "u16h": raw u16 depth decimated stride-2 on the host (real sensor
    # values, no averaging) and reconstructed on device by a validity-
    # renormalized bilinear 2x upsample (even coordinates bit-exact) —
    # 0.92 -> 0.46 MB/frame at VGA. MEASURED NEGATIVE as a default
    # (round 4 session 4): at pipeline_depth 32 the upload DMA fully
    # overlaps compute, so halving the frame's bytes bought -0.4 ms
    # (67.8 -> 67.4, tenancy noise) while bench ATE degraded 1.37 ->
    # 2.37 mm and VGA kinect_sensor 1.01 -> 2.27 mm. Kept for
    # bandwidth-starved deployments (depth-16 flights measured the DMA
    # at ~23-26 ms/frame ON the critical path; u16h would win there).
    depth_codec: str = "u16"
    # Frames per pipelined flight in SlamSystem.feed(): that many per-frame
    # device programs are chained with NO host sync (on-device motion model
    # + in-program keyframe switching), then read back together. Amortizes
    # the ~28 ms fixed host-readback cost of the sandbox TPU; 1 = the
    # classic sync-every-frame loop. Round-4 sweep (same tenancy): 16 →
    # 69.5, 24 → 69.6, 32 → 67.3 ms/frame at VGA (readback /32 plus
    # dispatch amortization), with BIT-IDENTICAL gauntlet ATE on all
    # five sensitive rows (ballistic/walking movers, large_motion,
    # handheld, depth_holes) — so 32 is the default. The price is host
    # LATENCY, not accuracy: poses/keyframe finalize/pose-graph rebases
    # publish at flight granularity (~2.2 s at 30 Hz input), and a
    # mid-flight tracking loss replays up to a flight of frames. Live /
    # latency-sensitive deployments should drop to 8-16.
    pipeline_depth: int = 32

    # ------------------------------------------------------------------
    @classmethod
    def preset(cls, name: str) -> "SlamConfig":
        """Named configuration presets.

        ``"default"`` / ``"sandbox"``: the class defaults — every knob at
        its measured sandbox-emulator optimum (the values every number in
        BASELINE.md was measured with).

        ``"real-v5e"``: the consolidated REAL-HARDWARE flip list. The
        sandbox TPU (~3.5 ms/dispatch, ~0.5 GB/s, `block_until_ready`
        non-synchronizing) prices several levers opposite to real v5e
        silicon; each flip below was measured on the sandbox, documented
        as a hardware win, and defaulted off *here* only because of the
        emulator's cost model. One switch instead of an archaeology
        exercise across BASELINE.md/SURVEY appendices (round-4 VERDICT
        item 4). Per-flip rationale (sandbox measurement -> expected HW
        effect):

        | flip | sandbox | real v5e |
        |---|---|---|
        | depth_codec="u12" | wash (decode ops ~= 0.15 MB DMA saving) | -17% upload bytes, decode ~us on VPU: pure win |
        | tracking.early_exit_tol=1e-5 | while_loop ~5 ms/instance even at 0 trips | branch ~us; cfg.iters become budgets, converged levels exit free |
        | tracking.conv_skip_tol=0 | per-trip cond broke flight overlap (+15.7 ms) | subsumed by early_exit_tol's while_loop; keep off |
        | tracking.plane_dtype="bf16" | speed-neutral (gathers price by op, not byte) | halves per-iteration HBM gather traffic; ~0.4 mm on a 1.8 mm clip (on-TPU tier case pins the lowering) |
        | tracking.stacked_gather=True | +4 ms/frame (probe-vs-production inversion) | 4x fewer gather dispatches per sample pass |
        | fusion.fine_rebuild_every=1 | (already default) | rebuild convs are ~us; keep accuracy-first |

        NOT flipped: pipeline_depth stays at the class default (32 since
        round 4) — flights amortize host sync latency on any platform,
        and pose-graph corrections publish at flight granularity either
        way; latency-sensitive live deployments drop to 8-16 regardless
        of platform (see the pipeline_depth field note).
        """
        if name in ("default", "sandbox"):
            return cls()
        if name == "real-v5e":
            return cls().override(
                **{
                    "depth_codec": "u12",
                    "tracking.early_exit_tol": 1e-5,
                    "tracking.plane_dtype": "bf16",
                    "tracking.stacked_gather": True,
                }
            )
        raise KeyError(f"unknown config preset: {name!r}")

    def override(self, **updates: Any) -> "SlamConfig":
        """Return a copy with dotted-key overrides, e.g.
        ``cfg.override(**{"tracking.levels": 3, "backend.enabled": False})``.
        """
        out = self
        for key, value in updates.items():
            parts = key.split(".")
            if len(parts) == 1:
                out = dataclasses.replace(out, **{parts[0]: value})
            elif len(parts) == 2:
                sub = getattr(out, parts[0])
                if isinstance(value, (list,)):
                    value = tuple(value)
                sub = dataclasses.replace(sub, **{parts[1]: value})
                out = dataclasses.replace(out, **{parts[0]: sub})
            else:
                raise KeyError(f"config key too deep: {key}")
        return out

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), indent=2)

    @classmethod
    def from_json(cls, text: str) -> "SlamConfig":
        """Parse a (possibly partial) JSON config. Missing keys take the
        DATACLASS defaults — never re-stated here, so a partial deployment
        JSON can't silently pin a stale default (round-4 bug: a duplicated
        ``pipeline_depth=8`` literal here downgraded any JSON that omitted
        the key to 4x-shallower flights after the dataclass default moved
        to 32; ``test_preset.py`` now pins from_json("{}") == SlamConfig()).
        """
        raw = json.loads(text)
        # JSON has no tuples: coerce list-valued fields (iters,
        # consensus_refit_iters, ...) back to tuples generically.
        raw_t = {
            k: tuple(v) if isinstance(v, list) else v
            for k, v in raw.get("tracking", {}).items()
        }
        top = {
            k: raw[k]
            for k in (
                "depth_scale",
                "max_depth",
                "min_depth",
                "depth_codec",
                "pipeline_depth",
            )
            if k in raw
        }
        return cls(
            tracking=TrackingConfig(**raw_t),
            keyframe=KeyframeConfig(**raw.get("keyframe", {})),
            fusion=FusionConfig(**raw.get("fusion", {})),
            backend=BackendConfig(**raw.get("backend", {})),
            viz=VizConfig(**raw.get("viz", {})),
            **top,
        )

    def config_hash(self) -> str:
        import hashlib

        return hashlib.sha256(self.to_json().encode()).hexdigest()[:12]
