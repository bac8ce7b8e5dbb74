"""The on-device coarse-to-fine IRLS tracker (VisodoTracker equivalent).

Reference architecture (SURVEY.md §3.2): per GN iteration the CUDA tracker
reduces the 6x6 normal equations on the GPU and reads ~29 floats back to
the host, which solves and updates the pose — ~25–60 host syncs per frame.

TPU-native architecture (SURVEY.md §7 stance 1): the ENTIRE coarse-to-fine
loop — warp, sample, Student-t IRLS, 6x6 Cholesky, exp-map update, all
levels — is ONE jitted XLA program with `lax.fori_loop` over iterations.
Only the final pose + ~40 diagnostic floats return to the host, once per
frame. Early exit becomes a masked no-op update (fixed shapes).

Two Jacobian formulations (config tracking.jacobian): "esm" (default;
averaged template/current gradients, warp Jacobians recomputed in-kernel
from precomputed template points, no stored Jacobian field — see
SURVEY.md App. B) and "ic" (classic inverse-compositional with a
precomputed (12, H, W) template Jacobian field).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..core.camera import Intrinsics, level_intrinsics
from ..core.config import TrackingConfig
from ..ops import gauss_newton
from .frames import FrameLevel, KeyframeLevel


def _select_irls(cfg: TrackingConfig):
    """Pick the IRLS reduction implementation (XLA twin vs Pallas A'/ESM)."""
    kernel = getattr(cfg, "kernel", "auto")
    use_pallas = kernel == "pallas" or (
        kernel == "auto" and jax.default_backend() == "tpu"
    )
    if getattr(cfg, "jacobian", "ic") == "esm":
        if use_pallas:
            from ..ops.pallas_kernels import esm_residuals_and_normal_eq_pallas

            return esm_residuals_and_normal_eq_pallas
        return gauss_newton.esm_residuals_and_normal_eq
    if use_pallas:
        from ..ops.pallas_kernels import residuals_and_normal_eq_pallas

        return residuals_and_normal_eq_pallas
    return gauss_newton.residuals_and_normal_eq


def _apply_affine_illumination(
    kf: Tuple[KeyframeLevel, ...],
    cur: Tuple[FrameLevel, ...],
    T_init: jax.Array,
    intrs: Tuple[Intrinsics, ...],
    cfg: TrackingConfig,
    axis_name: str | None,
) -> Tuple[KeyframeLevel, ...]:
    """Estimate a global gain/bias (I_cur ~= a * I_kf + b) and bake it
    into the tracking template: intensity' = a*I + b, intensity-gradient
    planes scaled by a.

    The estimate is MOMENT MATCHING — a = std(I_cur)/std(I_kf),
    b = mean(I_cur) - a * mean(I_kf), over each image's own pixels — and
    deliberately needs NO warp: a warp-based least squares at the
    pre-tracking pose is biased by whatever misalignment remains
    (measured: it injected 7-16 mrad/mm of pose error on CLEAN large-
    motion pairs), while global moments are alignment-free and exposure
    is a global property. Viewpoint-change residue in the moments is
    small, clipped, and absorbed by the robust weights. Purely
    tracker-local — the stored keyframe state is never mutated.
    """
    # Moments at LEVEL 0: coarse-level moments would be ~16x cheaper and
    # are statistically equivalent in expectation, but the interaction of
    # their slightly noisier gain with the dead zone measurably moved the
    # handheld-jitter gauntlet (4.6 -> 6.3 mm) — the reduction is cheap
    # relative to one tracking iteration, so full resolution it stays.
    kl, cl = kf[0], cur[0]
    n = jnp.asarray(kl.intensity.size, jnp.float32)
    sums = jnp.stack(
        [
            jnp.sum(kl.intensity),
            jnp.sum(kl.intensity * kl.intensity),
            jnp.sum(cl.intensity),
            jnp.sum(cl.intensity * cl.intensity),
        ]
    )
    if axis_name is not None:
        n = jax.lax.psum(n, axis_name)
        # Keyframe planes are row-sharded (partial sums -> psum); the
        # current frame is replicated, so its local sums are already the
        # full-image sums.
        sums = sums.at[0:2].set(jax.lax.psum(sums[0:2], axis_name))
    mean_k = sums[0] / n
    var_k = jnp.maximum(sums[1] / n - mean_k * mean_k, 1e-8)
    mean_c = sums[2] / n
    var_c = jnp.maximum(sums[3] / n - mean_c * mean_c, 1e-8)
    # A (near-)textureless image has no gain information — the variance
    # ratio is noise/noise; fall back to identity gain there (std < 0.02).
    textured = jnp.minimum(var_k, var_c) > 4e-4
    a = jnp.where(
        textured, jnp.clip(jnp.sqrt(var_c / var_k), 0.7, 1.5), 1.0
    )
    b = jnp.clip(mean_c - a * mean_k, -0.3, 0.3)
    # Dead zone: moment estimates carry a little viewpoint-change noise;
    # below ~2% gain / 1% bias the correction costs more than it fixes
    # (Student-t absorbs that much), so snap to identity there. Real
    # exposure drift walks through the zone and gets corrected.
    a = jnp.where(jnp.abs(a - 1.0) < 0.02, 1.0, a)
    b = jnp.where(jnp.abs(b) < 0.01, 0.0, b)

    out = []
    for kl in kf:
        gi = (kl.jac[:2].astype(jnp.float32) * a).astype(kl.jac.dtype)
        out.append(
            KeyframeLevel(
                intensity=a * kl.intensity + b,
                xi=kl.xi,
                mask=kl.mask,
                jac=jnp.concatenate([gi, kl.jac[2:]], axis=0),
            )
        )
    return tuple(out)


class TrackResult(NamedTuple):
    """Per-frame tracking output (small: safe to read back every frame)."""

    T: jax.Array  # (4, 4) current <- keyframe
    H: jax.Array  # (6, 6) final-level normal matrix (information)
    errors: jax.Array  # (levels,) weighted MSE after each level
    inlier_frac: jax.Array  # (levels,)
    n_valid: jax.Array  # (levels,)
    overlap: jax.Array  # () valid fraction vs keyframe valid count (finest)
    sigma2_int: jax.Array  # ()
    sigma2_xi: jax.Array  # ()
    # Pixel fraction masked out by the depth-stratified motion consensus
    # (0 when no refit was triggered / consensus disabled).
    consensus_frac: jax.Array = None
    # (consensus_bins,) raw per-stratum disagreement flags THIS frame —
    # threaded through MotionState so the next frame can require
    # persistence (tracking/consensus.py decide()).
    cons_excluded: jax.Array = None


def _track_impl(
    kf: Tuple[KeyframeLevel, ...],
    cur: Tuple[FrameLevel, ...],
    T_init: jax.Array,
    intrs: Tuple[Intrinsics, ...],
    cfg: TrackingConfig,
    axis_name: str | None = None,
    cons_prev: jax.Array | None = None,
) -> TrackResult:
    """The production coarse-to-fine tracker.

    ``axis_name`` enables SPMD execution inside a shard_map: keyframe
    planes (and their template points) are row-sharded across the mesh
    axis, the CURRENT frame's stacks are replicated (warp targets land
    anywhere), each device reduces its band's normal-equation statistics,
    and one ~42-float psum per IRLS iteration makes every device solve the
    identical 6x6 system — the solve and pose update are replicated. See
    parallel/tracker_spmd.py for the shard_map wrapper.
    """
    levels = cfg.levels
    irls = _select_irls(cfg)
    T = T_init
    s2i = jnp.asarray(cfg.init_sigma_int**2, jnp.float32)
    s2x = jnp.asarray(cfg.init_sigma_xi**2, jnp.float32)
    errors, inliers, nvalids = [], [], []
    H_last = jnp.eye(6, dtype=jnp.float32)

    from ..ops.warp import backproject_grid

    esm_mode = getattr(cfg, "jacobian", "ic") == "esm"
    if getattr(cfg, "affine_illumination", False) and esm_mode:
        kf = _apply_affine_illumination(
            kf, cur, T_init, intrs, cfg, axis_name
        )

    # Depth-stratified motion consensus (tracking/consensus.py): detect a
    # coherently moving, information-dominant foreground and mask its
    # strata out of the template BEFORE the fine levels, where its
    # information would drag the pose. The vote runs inside the level
    # loop, right after the detection level's iterations finish — the key
    # is the pyramid's information asymmetry: a mover's texture is mostly
    # blurred away at the coarse levels, so the coarse-converged pose is
    # an (almost) clean static estimate to vote at, while the geometry-
    # flow metric in analyze() still sees the mover's flow disagreement
    # (geometry is resolution-free even when its image gradients are
    # not). Earlier designs measured and rejected: voting at T_init
    # (prediction error + per-stratum damping bias = 3 cm spurious
    # splits), voting at the fully converged pose (adaptive sigmas have
    # crushed the losing side by then), a dedicated fixed-sigma mini-GN
    # at the detection level (4 iterations from T_init do not converge on
    # hard frames — coarse-to-fine exists for a reason).
    consensus_frac = jnp.asarray(0.0, jnp.float32)
    cons_excluded = jnp.zeros(
        (getattr(cfg, "consensus_bins", 6),), jnp.float32
    )
    consensus_on = getattr(cfg, "consensus", False) and esm_mode
    det_l = min(getattr(cfg, "consensus_level", 2), levels - 1)

    for level in range(levels - 1, -1, -1):
        kl, cl = kf[level], cur[level]
        intr_l = intrs[level]
        n_iters = cfg.iters[level] if level < len(cfg.iters) else cfg.iters[-1]
        # Loop-invariant backprojection: hoisted out of the IRLS loop.
        # Under SPMD each device holds a horizontal band of the keyframe;
        # backproject with GLOBAL row indices.
        row_offset = 0
        if axis_name is not None:
            row_offset = jax.lax.axis_index(axis_name) * kl.xi.shape[0]
        kf_points = backproject_grid(kl.xi, intr_l, row_offset)

        esm = getattr(cfg, "jacobian", "ic") == "esm"

        def body(carry, kl=kl, cl=cl, intr_l=intr_l, kf_points=kf_points, esm=esm):
            it, T, s2i, s2x, _H, _e, _i, _n, _step = carry
            if esm:
                res = irls(
                    T, kl.intensity, kf_points, kl.mask, kl.jac, cl.stack7,
                    intr_l, cfg.student_t_nu, s2i, s2x,
                    cfg.use_geometric, cfg.gate_sigmas,
                    getattr(cfg, "occlusion_gate", False),
                )
                if axis_name is not None:
                    res = gauss_newton.allreduce_irls(res, axis_name)
            else:
                res = irls(
                    T,
                    kl.intensity,
                    kf_points,
                    kl.mask,
                    kl.jac,
                    cl.intensity,
                    cl.xi,
                    cl.mask,
                    intr_l,
                    cfg.student_t_nu,
                    s2i,
                    s2x,
                    cfg.sigma_iters,
                    cfg.use_geometric,
                    cfg.gate_sigmas,
                    getattr(cfg, "sigma_mode", "exact"),
                )
                if axis_name is not None:
                    res = gauss_newton.allreduce_irls(res, axis_name)
            T_new, delta = gauss_newton.ic_update(
                T, res.H, res.b, cfg.damping, res.n_valid
            )
            return (
                it + 1,
                T_new,
                res.sigma2_int,
                res.sigma2_xi,
                res.H,
                res.error,
                res.inlier_frac,
                res.n_valid,
                jnp.linalg.norm(delta),
            )

        init = (
            jnp.asarray(0, jnp.int32),
            T,
            s2i,
            s2x,
            H_last,
            jnp.asarray(0.0, jnp.float32),
            jnp.asarray(0.0, jnp.float32),
            jnp.asarray(0.0, jnp.float32),
            jnp.asarray(jnp.inf, jnp.float32),
        )
        tol_f = float(getattr(cfg, "early_exit_tol", 0.0))
        if tol_f > 0.0:
            # Early exit: a converged GN iteration (step norm below tol)
            # would update the pose by less than the tolerance — pure waste
            # at the fixed per-iteration cost — so stop the level there and
            # treat cfg.iters as BUDGETS. Worth it on real TPU hardware
            # (while_loop trip overhead is ~us); on the sandbox emulator a
            # while_loop costs ~5 ms per INSTANCE even at zero iterations
            # (measured round 2), which cancels the savings — hence the
            # static fori_loop default (early_exit_tol = 0). Under SPMD the
            # step norm comes from the psum'd (replicated) solve, so every
            # device takes the same branch.
            tol = jnp.asarray(tol_f, jnp.float32)

            def cond(carry):
                it, *_rest, step = carry
                return jnp.logical_and(it < n_iters, step > tol)

            _, T, s2i, s2x, H_last, err, inl, nv, _ = jax.lax.while_loop(
                cond, body, init
            )
        else:
            _, T, s2i, s2x, H_last, err, inl, nv, _ = jax.lax.fori_loop(
                0, n_iters, lambda _i, c: body(c), init
            )
        errors.append(err)
        inliers.append(inl)
        nvalids.append(nv)

        if consensus_on and level == det_l:
            from . import consensus as _cons

            edges = _cons.stratum_edges(
                cfg.consensus_xi_min, cfg.consensus_xi_max,
                cfg.consensus_bins,
            )
            strata = _cons.stratum_onehot(kl.xi, kl.mask, edges)
            # The vote uses FIXED generous init sigmas (the adaptive ones
            # have already adapted to the compromise) and keeps the
            # occlusion gate ON: with these sigmas it is a wide ~0.3 1/m
            # gate that strips CROSS-DEPTH pollution (template pixels
            # warping onto a foreground object) while a fronto-parallel
            # mover's own strata sample their own depth and keep their
            # coherent flow signal.
            Hk, bk, nk, Gk, ek = gauss_newton.stratified_normal_eq(
                T, kl.intensity, kf_points, kl.mask, kl.jac, cl.stack7,
                intr_l, cfg.student_t_nu,
                jnp.asarray(cfg.init_sigma_int**2, jnp.float32),
                jnp.asarray(cfg.init_sigma_xi**2, jnp.float32),
                strata, cfg.use_geometric, cfg.gate_sigmas,
                occlusion_gate=True, axis_name=axis_name,
            )
            verdict = _cons.analyze(
                Hk, bk, nk, Gk, ek, cfg.consensus_tol,
                cfg.consensus_min_frac,
                getattr(cfg, "consensus_err_ratio", 4.0),
                getattr(cfg, "consensus_err_floor", 1.0),
            )
            cons_excluded = verdict.excluded
            # Persistence: a mover must flag the same strata two frames
            # in a row (cons_prev is last frame's raw flags via
            # MotionState). Callers without history (single-shot
            # tracking, relocalization) pass None -> persistence waived.
            prev = (
                cons_prev
                if cons_prev is not None
                else jnp.ones_like(verdict.excluded)
            )
            decision = _cons.decide(
                verdict, prev, nk, cfg.consensus_trigger_frac,
                getattr(cfg, "consensus_max_frac", 0.4),
            )
            consensus_frac = decision.excluded_frac
            # Mask the flagged strata out of the template for the
            # REMAINING (finer) levels (member = all-ones when not
            # triggered, so this is a no-op multiply).
            kf = tuple(
                KeyframeLevel(
                    klm.intensity,
                    klm.xi,
                    _cons.member_mask(
                        klm.xi, klm.mask, edges, decision.member
                    ),
                    klm.jac,
                )
                for klm in kf
            )

    kf_count = jnp.sum(kf[0].mask)
    cur_count = jnp.sum(cur[0].mask)
    n_px = jnp.asarray(
        kf[0].mask.shape[0] * kf[0].mask.shape[1], jnp.float32
    )
    if axis_name is not None:
        # Keyframe planes are row-sharded (partial counts -> psum); the
        # CURRENT frame is replicated across the mesh, so its local count
        # already covers the full image — psumming it would count each
        # pixel n_devices times, clip cur_frac to 1, and make the sharded
        # overlap diverge from the single-device value.
        kf_count = jax.lax.psum(kf_count, axis_name)
        n_px = jax.lax.psum(n_px, axis_name)
    kf_count = jnp.maximum(kf_count, 1.0)
    # GEOMETRIC overlap estimate, normalized for sensor dropout on both
    # sides: with independent validity fractions f_kf and f_cur, the
    # expected co-valid count is f_kf * f_cur * geometric_overlap * N, so
    # dividing by kf_count * cur_count / N removes the dropout factors.
    # Without holes this reduces to the round-1 n_valid / kf_count; with
    # 25% dropout per side the old measure read ~0.56 for a fully
    # co-visible frame and thrashed keyframe creation (a new keyframe
    # EVERY frame on the depth-holes gauntlet).
    cur_frac = jnp.clip(cur_count / n_px, 0.05, 1.0)
    overlap = jnp.clip(nvalids[-1] / (kf_count * cur_frac), 0.0, 1.0)
    # errors/... were appended coarse->fine; store fine->coarse (level order).
    return TrackResult(
        T=T,
        H=H_last,
        errors=jnp.stack(errors[::-1]),
        inlier_frac=jnp.stack(inliers[::-1]),
        n_valid=jnp.stack(nvalids[::-1]),
        overlap=overlap,
        sigma2_int=s2i,
        sigma2_xi=s2x,
        consensus_frac=consensus_frac,
        cons_excluded=cons_excluded,
    )


class Tracker:
    """Jit-compiled frame-to-keyframe tracker bound to (intrinsics, config).

    The compiled program is shared across frames (static shapes); keyframe
    and frame pyramids are passed as pytree arguments so no retraces occur.
    """

    def __init__(self, intr: Intrinsics, cfg: TrackingConfig):
        self.intr = intr
        self.cfg = cfg
        self.intrs = tuple(level_intrinsics(intr, l) for l in range(cfg.levels))
        self._fn = jax.jit(
            functools.partial(_track_impl, intrs=self.intrs, cfg=cfg)
        )

    def track(
        self,
        kf: Tuple[KeyframeLevel, ...],
        cur: Tuple[FrameLevel, ...],
        T_init: jax.Array,
    ) -> TrackResult:
        return self._fn(kf, cur, T_init)
