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
its strata disagree with the pixel-count majority about the pose.
Per frame, BEFORE the coarse-to-fine track, at the predicted pose T_init
(detecting at the converged pose fails — by then the robust weights have
crushed whichever side lost the compromise; at T_init a mover's stratum
is SELF-consistent, so uniform weights cancel in H_k^{-1} b_k and nothing
can hide it):

1. Bin template pixels into K log-spaced inverse-depth strata and reduce
   per-stratum normal equations at a coarse level (one fused pass:
   ops/gauss_newton.stratified_normal_eq; no occlusion gate, generous
   init sigmas).
2. Solve each stratum's preferred (trace-damped) pose correction delta_k.
   The static strata share the prediction error (common mode cancels in
   pairwise comparison); a mover's strata want the mover's flow on top.
3. RANSAC-lite over strata: each well-populated stratum hypothesises its
   delta_k; support is the PIXEL COUNT (not information!) of strata that
   agree within a twist tolerance. The pixel-count majority is the
   static scene precisely because information-dominance is the attack.
4. decide(): only a PERSISTENT (two consecutive frames), minority-sized
   disagreement triggers; then the flagged strata are masked out of the
   tracking template at every level and the track proceeds normally —
   the pose is never dragged in the first place.

Everything runs inside the jitted per-frame program; under SPMD the
stratified reduction psums and every device takes the same branch.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..ops import gauss_newton


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


class ConsensusDecision(NamedTuple):
    member: jax.Array  # (K,) f32: 1 = stratum kept for the refit
    triggered: jax.Array  # () bool: refit should run
    excluded_frac: jax.Array  # () f32: pixel fraction masked out


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
    # DAMPED per-stratum solves: a single depth band is near-degenerate
    # (translation/rotation ambiguity — eigenvalue spread ~1e3), so the
    # raw H_k^{-1} b_k explodes along each stratum's unobservable
    # directions and rigid strata "disagree" spuriously (measured: 7-10 cm
    # deltas on a static pair). Tikhonov damping at a fraction of the
    # trace shrinks unobservable components to ~0 while leaving the
    # strongly observed ones — where a genuine mover's drag lives —
    # untouched.
    lam = 0.2 * jnp.trace(Hn, axis1=1, axis2=2) / 6.0 + 1e-6
    Hd = Hn + lam[:, None, None] * jnp.eye(6, dtype=jnp.float32)

    def solve(Hi, bi):
        return jax.scipy.linalg.cho_solve(jax.scipy.linalg.cho_factor(Hi), bi)

    deltas = jax.vmap(solve)(Hd, bn)
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
    Gn = Gk * inv_n[:, None, None]
    diff = deltas[:, None, :] - deltas[None, :, :]  # (K, K, 6) j - k
    m = jnp.einsum("jki,jil,jkl->jk", diff, Gn, diff)
    agree = m <= tol * tol  # (K, K); agree[j, k]: j agrees with hyp k
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
    excluded_err = voter & (
        err_n > jnp.maximum(err_ratio * err_med, err_floor)
    )
    excluded = excluded_vote | excluded_err
    # A CLEAR majority (60%), not a bare one: a genuine mover is a 15-30%
    # pixel minority, leaving the static consensus at 70-85%; an ambiguous
    # 48/52 split between static strata (hard frame, or a mover present in
    # the current image but not yet in the template) must stay silent —
    # measured: acting on a 52% "majority" masked half the static scene
    # and sent the track 0.9 m off in one frame.
    majority_ok = support[best] > 0.6 * n_total
    return ConsensusResult(
        excluded=excluded.astype(jnp.float32),
        majority_ok=majority_ok,
        deltas=deltas,
    )


def decide(
    verdict: ConsensusResult,
    prev_excluded: jax.Array,  # (K,) last frame's raw exclusion flags
    nk: jax.Array,
    trigger_frac: float,
    max_frac: float,
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
    persistent = verdict.excluded * prev_excluded  # (K,) AND
    excluded_frac = jnp.sum(persistent * nk) / n_total
    triggered = (
        (excluded_frac > trigger_frac)
        & (excluded_frac < max_frac)
        & verdict.majority_ok
    )
    member = jnp.where(triggered, 1.0 - persistent, jnp.ones_like(nk))
    return ConsensusDecision(
        member=member,
        triggered=triggered,
        excluded_frac=jnp.where(triggered, excluded_frac, 0.0),
    )


def member_mask(
    xi: jax.Array, mask: jax.Array, edges: jax.Array, member: jax.Array
) -> jax.Array:
    """Per-pixel keep mask at any pyramid level: pixels whose template
    stratum was voted out of the consensus are removed from the template."""
    return mask * jnp.take(member, stratum_index(xi, edges))
