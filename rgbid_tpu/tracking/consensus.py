"""Depth-stratified motion consensus: reject coherently moving foreground.

The documented breaking point of non-segmenting dense VO (the reference
included — cf. DVO/RGBiD-class results on TUM fr3/walking_*) is a
coherently moving object that dominates the Fisher information: warp
Jacobians scale as 1/z^2, so a near-field mover covering ~20% of pixels
can carry ~2/3 of the information and drag the pose, while per-pixel
robust weighting cannot reject it (it is self-consistent) and the
occlusion gate cannot see it (a fronto-parallel translating panel stays
geometrically consistent with any keyframe founded while it is in view).

The consensus mechanism exploits the one structure such an object cannot
hide: it lives in DIFFERENT DEPTH STRATA than the static background, and
its strata disagree with the pixel-count majority about the pose. The
vote runs INSIDE the coarse-to-fine track, after each of the two coarse
levels converges (tracker.py) — the pyramid's information asymmetry
means a mover's texture is mostly blurred away there, so the
coarse-converged pose is still an almost-clean static estimate, while
the geometry-flow metric below still sees the mover's flow. Per vote:

1. Bin template pixels into K log-spaced inverse-depth strata and reduce
   per-stratum normal equations, a geometry Gram, and fixed-sigma error
   sums in one fused pass (ops/gauss_newton.stratified_normal_eq; the
   wide fixed-sigma occlusion gate stays ON to strip cross-depth
   pollution without crushing a mover's self-consistent flow signal).
2. Solve each stratum's preferred pose correction delta_k INSIDE its
   well-observed eigenspace (blind translation/rotation-ambiguity
   directions zeroed exactly; Tikhonov damping either leaks their junk
   or shrinks the mover's signal — both measured).
3. RANSAC-lite over strata: each well-populated stratum hypothesises its
   delta_k; agreement is the INDUCED IMAGE FLOW (pixels) hypothesis k
   would impose on stratum j; support is the PIXEL COUNT (not
   information!) of agreeing strata. The pixel-count majority is the
   static scene precisely because information dominance is the attack.
   A stratum can also be excluded by the error-outlier test (fast,
   basin-escaped movers) or flagged as a HOSTAGE (established drag).
4. decide(): exclusion acts only on a PERSISTENT (consensus_persist
   consecutive frames, counts threaded through MotionState),
   minority-sized disagreement backed by a clear >=60% majority of >=3
   voters; vote exclusions mask the template for the remaining finer
   levels (with a same-level rerun from the pre-level pose), hostage
   flags re-track the whole pyramid from the predicted pose.

Everything runs inside the jitted per-frame program; under SPMD the
stratified reduction psums and every device takes the same branch.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..ops import gauss_newton

# Pixel-minority caps shared by every "a mover is a pixel minority by
# construction" gate. Hoisted (advisor round-4) so the vote's gates and
# the tracker's attack-probe candidate pool can never silently
# desynchronize on a future tune:
# - MINORITY_CAP bounds the dominance/hostage candidates AND the
#   tracker's probe pool (tracker.py): a stratum holding >= 35% of
#   pixels is contendable scene structure, not an attacker.
# - ERR_MINORITY_CAP bounds the error-outlier test only, deliberately
#   LOOSER (round 3): the gauntlet panel covers 34-35% of vote-level
#   pixels at transit peak — a 0.35 cap broke the mover's streak at
#   exactly the worst frames (flags at f25-26, blocked at f27 with
#   nk = 0.35), while decide()'s aggregate max_frac still bounds what a
#   refit may mask.
MINORITY_CAP = 0.35
ERR_MINORITY_CAP = 0.40


def stratum_edges(xi_min: float, xi_max: float, k: int) -> jnp.ndarray:
    """K+1 log-spaced inverse-depth bin edges (static, baked into the jit)."""
    import numpy as np

    return jnp.asarray(
        np.geomspace(xi_min, xi_max, k + 1).astype(np.float32)
    )


def stratum_index(xi: jax.Array, edges: jax.Array) -> jax.Array:
    """Per-pixel stratum index in [0, K-1] (clamped; invalid pixels get 0
    but are always multiplied by the validity mask downstream)."""
    k = edges.shape[0] - 1
    idx = jnp.searchsorted(edges, xi, side="right") - 1
    return jnp.clip(idx, 0, k - 1)


def stratum_onehot(xi: jax.Array, mask: jax.Array, edges: jax.Array) -> jax.Array:
    """(K, H, W) one-hot stratum membership for valid pixels."""
    k = edges.shape[0] - 1
    idx = stratum_index(xi, edges)
    oh = jax.nn.one_hot(idx, k, axis=0, dtype=jnp.float32)
    return oh * mask[None]


class ConsensusResult(NamedTuple):
    excluded: jax.Array  # (K,) f32: 1 = stratum disagrees with the majority
    majority_ok: jax.Array  # () bool: a genuine pixel majority exists
    deltas: jax.Array  # (K, 6) per-stratum preferred corrections (debug)
    # (K,) f32 hostage flags: the pose is HELD by this aligned minority
    # stratum while the pixel majority's error climbs (established-drag
    # signature; see analyze docstring). Set only when no vote majority
    # could form.
    hostage: jax.Array = None
    # (K,) f32 Fisher-information share per stratum (trace of the raw-sum
    # J^T W J over the strata total) — the dominance diagnostic.
    info_share: jax.Array = None
    # (K,) f32: information-dominant pixel-minority voter strata — the
    # hostage CANDIDATES, without the hostage's decorrelation/persistence
    # preconditions. DIAGNOSTIC ONLY: the tracker's attack probe does NOT
    # read this field — it selects its own candidate from the
    # information-DENSITY argmax over agreeing minority voters (without
    # the 2x dominance gate; tracker.py probe pool), because at ballistic
    # onset the mover's dominance ratio (~1.7x) is indistinguishable from
    # a rigid near band's (~1.4x) and the 2x gate is correctly silent
    # there (BASELINE.md round-4 forensics). Exported for forensic traces
    # and tests.
    dominant: jax.Array = None


class ConsensusDecision(NamedTuple):
    member: jax.Array  # (K,) f32: 1 = stratum kept for the refit
    triggered: jax.Array  # () bool: refit should run
    excluded_frac: jax.Array  # () f32: pixel fraction masked out
    # () bool: the hostage signature fired — the caller should RE-TRACK
    # the whole pyramid from the predicted pose with member masked, not
    # just refit the current level (the drag accumulated over the frame).
    rescue: jax.Array = None


def analyze(
    Hk: jax.Array,  # (K, 6, 6) raw-sum information per stratum
    bk: jax.Array,  # (K, 6)
    nk: jax.Array,  # (K,)
    Gk: jax.Array,  # (K, 6, 6) raw-sum geometry Gram (warp Jacobians)
    ek: jax.Array,  # (K,) raw-sum weighted error (fixed sigmas)
    tol: float,  # flow agreement tolerance, PIXELS at the detection level
    min_frac: float,
    err_ratio: float = 4.0,
    err_floor: float = 1.0,
    baseline_scale=1.0,  # template-aging threshold inflation (see below)
) -> ConsensusResult:
    """Steps 2-3: per-stratum corrections + pixel-count-majority consensus.

    Two complementary disagreement tests, each catching a mover regime:
    - delta vote (flow metric): a SLOW coherent mover inside the
      linearization basin votes its own pose and disagrees;
    - error outlier: a FAST mover beyond the basin cannot vote (its
      gradients decorrelate, b_k collapses to noise) but its fixed-sigma
      weighted error saturates at ~(nu+1)/pixel while aligned strata sit
      near (r/sigma)^2 << 1 — a stratum whose per-pixel error is both
      above `err_floor` and `err_ratio`x the voters' median is moving or
      occluded either way, and gets excluded.
    """
    n_total = jnp.maximum(jnp.sum(nk), 1.0)
    inv_n = 1.0 / jnp.maximum(nk, 1.0)
    Hn = Hk * inv_n[:, None, None]
    bn = bk * inv_n[:, None]
    # TRUNCATED-EIGENSPACE per-stratum solves: a single depth band is
    # near-degenerate (translation/rotation ambiguity — eigenvalue spread
    # ~1e3), so the raw H_k^{-1} b_k explodes along each stratum's
    # unobservable directions and rigid strata "disagree" spuriously
    # (measured: 7-10 cm deltas on a static pair). Tikhonov damping was
    # measured to be the wrong fix — small damping leaks the junk, large
    # damping SHRINKS the well-observed component that carries a genuine
    # mover's signal (a walking-speed mover's vote halved below threshold
    # and the drag went undetected). Instead solve only inside each
    # stratum's well-observed eigenspace: blind directions are zeroed
    # exactly, strong ones (where a mover's lateral drag lives) are
    # recovered exactly.
    eigval, eigvec = jnp.linalg.eigh(Hn)  # (K, 6), (K, 6, 6) ascending
    keep = eigval > 0.01 * eigval[:, -1:]  # relative observability cut
    inv_eig = jnp.where(keep, 1.0 / jnp.maximum(eigval, 1e-12), 0.0)
    deltas = jnp.einsum(
        "kij,kj,klj,kl->ki", eigvec, inv_eig, eigvec, bn
    )
    deltas = jnp.where(jnp.isfinite(deltas), deltas, 0.0)

    voter = nk >= min_frac * n_total  # (K,)
    # Agreement is measured as INDUCED IMAGE FLOW, not Euclidean twist
    # distance and not image-information Mahalanobis: m[j, k] =
    # (d_j - d_k)^T (G_j / n_j) (d_j - d_k) is the mean squared pixel flow
    # hypothesis k would impose on stratum j relative to j's own optimum.
    # Euclidean failed because a far stratum's centimetre "preferences"
    # along its near-blind axes (1/z^2 observability) read as huge
    # disagreement while inducing no flow; image-information weighting
    # failed the other way because a mover's texture is blurred out at the
    # coarse detection level, silencing exactly the vote that matters
    # (both measured). Geometry is resolution- and texture-free: `tol` is
    # in PIXELS at the detection level.
    # TEMPLATE-AGING threshold inflation: at large baseline from the
    # keyframe, depth strata genuinely diverge (depth-noise parallax and
    # interpolation systematics grow with motion) and mimic a mover —
    # measured 6 false fires and 2x RPE on a rigid wide-baseline loop.
    # A real mover episode lives at SMALL baselines (its drag forces
    # frequent keyframe refounding), so scaling the vote/error thresholds
    # by baseline_scale (1 + 12 max(|t|-0.06, 0) + 8 max(angle-0.05, 0):
    # dead zone where mover onsets live, steep beyond — tracker.py) keeps
    # full sensitivity where it matters and goes progressively deaf where
    # aging dominates.
    Gn = Gk * inv_n[:, None, None]
    diff = deltas[:, None, :] - deltas[None, :, :]  # (K, K, 6) j - k
    m = jnp.einsum("jki,jil,jkl->jk", diff, Gn, diff)
    tol_eff = tol * baseline_scale
    agree = m <= tol_eff * tol_eff  # (K, K); agree[j, k]: j agrees with hyp k
    # Support of hypothesis k = pixel count of agreeing VOTER strata.
    support = jnp.sum(
        agree * (nk * voter.astype(jnp.float32))[:, None], axis=0
    )  # (K,)
    support = jnp.where(voter, support, -1.0)  # only voters hypothesise
    best = jnp.argmax(support)

    excluded_vote = voter & jnp.logical_not(agree[:, best])  # (K,)

    # Error-outlier test (fast/basin-escaped movers): compare each voter
    # stratum's per-pixel weighted error to the voters' median.
    err_n = ek * inv_n
    err_med = jnp.nanmedian(jnp.where(voter, err_n, jnp.nan))
    err_med = jnp.where(jnp.isfinite(err_med), err_med, 0.0)
    # The RATIO term scales with template aging (the median itself rises
    # with baseline, and the multiplier keeps headroom on top of that);
    # the ABSOLUTE floor deliberately does NOT (round 3): a per-pixel
    # weighted error above err_floor means decorrelation at any baseline
    # (rigid hard frames measure 0.1-0.3, a dragged/occluded stratum
    # 1.0-4.1), and scaling the floor suppressed the ballistic mover's
    # onset exactly when the median was still tiny (measured QVGA seed-3:
    # mover 1.08 vs scaled threshold 1.11 at f24, 1.48 vs 1.55 at f25 —
    # two near-misses that let a 50 mm/frame drag establish).
    # PER-STRATUM pixel-minority guard (round 3): a mover is a pixel
    # minority by construction, but a stratum's error also saturates
    # when it is the DECORRELATING STATIC MAJORITY of an established
    # drag (the pose rides another stratum; this one's residuals climb
    # through 1.0+ exactly like a mover's). Without the guard the err
    # test flagged a 33-40% static stratum mid-drag and the masked
    # refit handed the fine levels to the actual mover (measured QVGA
    # seed-3 ballistic: +45 mm on the very frames the refit fired).
    # The hostage test owns the dragged-majority signature; this test
    # owns fast MINORITY movers.
    # Minority cap ERR_MINORITY_CAP (0.40), NOT 0.35 — see the module
    # constants' note for the measured round-3 streak-break at 0.35.
    excluded_err = (
        voter
        & (nk < ERR_MINORITY_CAP * n_total)
        & (err_n > jnp.maximum(err_ratio * err_med * baseline_scale, err_floor))
    )
    # A CLEAR majority (60%), not a bare one: a genuine mover is a 15-30%
    # pixel minority, leaving the static consensus at 70-85%; an ambiguous
    # 48/52 split between static strata (hard frame, or a mover present in
    # the current image but not yet in the template) must stay silent —
    # measured: acting on a 52% "majority" masked half the static scene
    # and sent the track 0.9 m off in one frame.
    # Consensus needs at least 3 voting strata: with two ~50/50 voters
    # there is no "majority" to appeal to — a disagreement cannot be
    # attributed to either side (measured false fires on a two-band
    # handheld scene).
    enough_voters = jnp.sum(voter) >= 3
    majority_ok = (support[best] > 0.6 * n_total) & enough_voters
    # A vote exclusion is only MEANINGFUL when a genuine majority exists
    # (round 3): with two ~50/50 voters, "the other one disagrees with
    # best" flags a static band every frame. decide() already refuses to
    # ACT without majority_ok, but the raw flag feeds the streak counter
    # and the streak drives the episode mask — a wide-baseline two-voter
    # stretch was measured building a 7-frame streak on a 47%-pixel
    # STATIC stratum, and the episode mask then crippled the next
    # founded template (QVGA ballistic f26: 49% of static masked at
    # frame start, mover captured the coarse solve, +82 mm in one
    # frame). The err/hostage signatures keep their own guards and are
    # deliberately NOT gated here.
    excluded = (excluded_vote & majority_ok) | excluded_err

    # HOSTAGE detection (established drag): once the pose has been
    # dragged for a couple of frames, the static majority's residuals
    # decorrelate (each stratum recovers a different clipped piece of the
    # pull-back) and no vote majority can form — but the signature is
    # unmistakable: the stratum the pose is locked onto is the ONLY
    # low-error one, it is a pixel minority, and the majority's error is
    # a multiple of its. Flag it; decide() turns persistent hostage flags
    # into a full masked RE-TRACK from the predicted pose.
    # The hostage is identified by INFORMATION DOMINANCE, not by argmin
    # error (round 3): the stratum holding a dragged pose is the one
    # whose Fisher-information share vastly exceeds its pixel share —
    # that dominance is the very mechanism of the attack (1/z^2-amplified
    # Jacobians + Student-t weights that STAY high on the aligned mover
    # while the decorrelating majority gets downweighted, which amplifies
    # the ratio further). The previous argmin-error rule landed on the
    # FAR background band instead (distant pixels have naturally tiny
    # residuals and near-zero information; measured QVGA ballistic: bin1
    # at 49% pixels/lowest err failed the minority guard and the true
    # mover at 3.7x dominance was never named).
    info = jnp.trace(Hk, axis1=1, axis2=2)  # raw-sum J^T W J per stratum
    info_share = info / jnp.maximum(jnp.sum(info), 1e-12)
    pix_share = nk / n_total
    dominant = voter & (info_share > 2.0 * jnp.maximum(pix_share, 1e-6))
    # The "unhappy majority" evidence pool: voters that are neither
    # already-identified movers nor dominance candidates.
    others = voter & jnp.logical_not(excluded) & jnp.logical_not(dominant)
    others_med = jnp.nanmedian(jnp.where(others, err_n, jnp.nan))
    others_med = jnp.where(jnp.isfinite(others_med), others_med, 0.0)
    # NOT gated on majority_ok: with a resolution-scaled tol plus
    # template-aging inflation, a self-consistent dragging panel
    # (founded into the template) keeps every stratum inside the vote
    # tolerance — majority_ok stays True through the whole drag and a
    # `not majority_ok` precondition disables the rescue exactly when it
    # is the only working signal (measured at VGA: 195 mm, identical to
    # consensus-off). Guards below carry the false-positive load; the
    # decorrelation floor (0.35) is deliberately NOT baseline-scaled —
    # rigid hard-frame errors sit at ~0.1-0.3 while a dragged majority
    # climbs through 0.4-1.1 (measured), and during a drag the baseline
    # INCLUDES the drag so scaling would suppress the rescue exactly
    # when it is needed.
    hostage = (
        dominant
        & enough_voters
        & (nk < MINORITY_CAP * n_total)
        & (others_med > 2.0 * jnp.maximum(err_n, 1e-3))
        & (others_med > 0.35)
    ).astype(jnp.float32)
    # A live hostage EXPLAINS the majority's decorrelation: suppress the
    # error-outlier flags that frame (they point at the dragged STATIC
    # majority — masking it hands the refit to the actual mover;
    # measured: the streak built on a 33% static band for the whole
    # episode while the dominant panel stayed unflagged).
    hostage_any = jnp.sum(hostage) > 0.5
    excluded = jnp.where(
        hostage_any, excluded_vote & majority_ok, excluded
    )
    # (A "flagrant" >4x-tolerance instant-action vote flag was built and
    # measured here in round 3 and REMOVED: a basin-escaping mover's
    # per-stratum solve decorrelates — its delta collapses to noise
    # rather than voting big, so the flow magnitude never crosses the
    # bar on the clips that motivated it; the ERROR path is what sees
    # fast movers, and it did. Zero fires across the full gauntlet.)
    return ConsensusResult(
        excluded=excluded.astype(jnp.float32),
        majority_ok=majority_ok,
        deltas=deltas,
        hostage=hostage,
        info_share=info_share,
        dominant=(dominant & (nk < MINORITY_CAP * n_total)).astype(
            jnp.float32
        ),
    )


def decide(
    verdict: ConsensusResult,
    prev_counts: jax.Array,  # (K,) consecutive-flag counts BEFORE this frame
    nk: jax.Array,
    trigger_frac: float,
    max_frac: float,
    persist: int = 3,
) -> ConsensusDecision:
    """Step 4 gate: refit only on PERSISTENT minority disagreement.

    Three guards, each closing a measured false-trigger mode:
    - persistence (this frame AND last frame flag the same stratum): a
      genuine mover drags coherently for many frames, while hard-frame
      translation/rotation-ambiguity splits between static depth bands
      are random and do not repeat stratum-for-stratum;
    - minority cap (excluded pixel fraction < max_frac): a mover is a
      pixel minority by construction — if half the image "disagrees",
      that is unresolved optimization error, not dynamics (measured:
      a hard first frame split 48/52 and the refit made it worse);
    - pixel majority must exist (analyze.majority_ok): if no majority
      agrees on anything, the rigid-scene model is globally violated and
      masking strata would amplify noise.
    """
    n_total = jnp.maximum(jnp.sum(nk), 1.0)
    # Persistence gate: the stratum must have been flagged on the
    # previous `persist - 1` consecutive frames too (prev_counts carries
    # per-stratum consecutive-flag counts through MotionState). A real
    # mover flags the same strata for its whole episode; hard-frame
    # ambiguity splits rarely repeat 3x stratum-for-stratum (2x was
    # measured to leak on handheld jitter).
    gate = (prev_counts >= float(persist - 1)).astype(jnp.float32)
    persistent = verdict.excluded * gate  # (K,)
    excluded_frac = jnp.sum(persistent * nk) / n_total
    triggered = (
        (excluded_frac > trigger_frac)
        & (excluded_frac < max_frac)
        & verdict.majority_ok
    )
    # Hostage rescue: persistent hostage flags (same history channel —
    # a stratum flagged as mover by EITHER path yesterday counts). The
    # hostage stratum is masked and the caller re-tracks the whole
    # pyramid from the predicted pose. A one-frame-lower hostage gate
    # was measured TWICE (round 3): ballistic capture frame unchanged
    # both times, walking ATE tripled (19 -> 56 mm) both times — even
    # with the caller's evidence-based acceptance (the premature
    # rescues FIT the retained template better, yet the trajectory is
    # worse: a slow mover's early dominance frames are genuinely
    # ambiguous and the masked re-track overfits the remaining scene).
    # The third corroborating frame is load-bearing on slow movers.
    hostage_p = verdict.hostage * gate
    rescue = jnp.sum(hostage_p) > 0.5
    # The rescue re-track must also mask every RECENTLY-identified mover
    # stratum (high consecutive-flag count), not only this frame's flags:
    # template-aging tolerance inflation can let an established mover
    # slip inside the vote tolerance on exactly the rescue frame, and a
    # re-track that masks the hostage but KEEPS the mover hands the pose
    # to the mover (measured: 218 mm in one frame, QVGA walking f31,
    # prev_counts on the mover stratum = 8 while that frame's vote
    # missed it).
    recent = (prev_counts >= float(persist)).astype(jnp.float32)
    excl = jnp.where(
        rescue,
        jnp.maximum(jnp.maximum(persistent, hostage_p), recent),
        persistent,
    )
    act = triggered | rescue
    member = jnp.where(act, 1.0 - excl, jnp.ones_like(nk))
    frac = jnp.sum(excl * nk) / n_total
    return ConsensusDecision(
        member=member,
        triggered=act,
        excluded_frac=jnp.where(act, frac, 0.0),
        rescue=rescue,
    )


def member_mask(
    xi: jax.Array, mask: jax.Array, edges: jax.Array, member: jax.Array
) -> jax.Array:
    """Per-pixel keep mask at any pyramid level: pixels whose template
    stratum was voted out of the consensus are removed from the template."""
    return mask * jnp.take(member, stratum_index(xi, edges))
