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
import os
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..core import se3
from ..core.camera import Intrinsics, level_intrinsics
from ..core.config import TrackingConfig
from ..ops import gauss_newton
from .frames import FrameLevel, KeyframeLevel

# Per-level pose trace (jax.debug.print inside the chained program) for
# offline drag forensics; set RGBID_DEBUG_LEVELS=1. Not a public knob.
_DEBUG_LEVELS = os.environ.get("RGBID_DEBUG_LEVELS") not in (None, "", "0")


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
    # (consensus_bins,) per-stratum CONSECUTIVE-flag counts after this
    # frame — threaded through MotionState so the next frame can require
    # persistence (tracking/consensus.py decide()).
    cons_excluded: jax.Array = None
    # () valid-pixel count of the APPLIED finest-level template mask
    # (consensus exclusions removed; psum'd under SPMD). Downstream
    # validity fractions must use THIS denominator, not the raw keyframe
    # count — a consensus episode masking 20-35% of the template would
    # otherwise read as tracking loss.
    kf_count: jax.Array = None
    # () f32: 1.0 when a hostage/divergence RESCUE re-track fired this
    # frame. The keyframe-switch decision reads it (rescue_refound):
    # a rescue means established drag against THIS template, and the
    # measured recovery pattern is refounding, not repeated rescues.
    rescue: jax.Array = None


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

    # Template-pixel decimation (TrackingConfig.template_stride): stride
    # level l's TEMPLATE planes by s — every per-pixel array the IRLS
    # solve touches (intensity, xi, mask, gradient planes, backprojected
    # points, gathered corners, Pallas reduce tiles) drops s^2 x in
    # bytes, while the CURRENT frame's gather stacks stay full
    # resolution (full image sharpness at the sampled points — unlike
    # dropping the level, which blurs). Exactness: strided pixel (i, j)
    # IS full-res pixel (s*i, s*j), so backprojection uses
    # stride-scaled intrinsics (make_runner) while projection and the
    # in-kernel warp Jacobians keep the full intrinsics (residual
    # gradients are sampled from full-res planes in full-res pixel
    # units). Runs AFTER the affine-illumination moment match (which
    # keeps its measured full-plane statistics) and applies to the
    # tracking solve only — fusion and the stored keyframe stay full
    # resolution. Under SPMD each device strides its own row band; the
    # sharded == single-device equality needs the per-device band height
    # divisible by s (VGA/8 = 60 rows: yes).
    strides = tuple(getattr(cfg, "template_stride", ()) or ())
    strides = strides + (1,) * max(0, levels - len(strides))
    if any(s > 1 for s in strides[:levels]):
        kf = tuple(
            kl
            if strides[l] == 1
            else KeyframeLevel(
                intensity=kl.intensity[:: strides[l], :: strides[l]],
                xi=kl.xi[:: strides[l], :: strides[l]],
                mask=kl.mask[:: strides[l], :: strides[l]],
                jac=kl.jac[:, :: strides[l], :: strides[l]],
            )
            for l, kl in enumerate(kf)
        )

    # Depth-stratified motion consensus (tracking/consensus.py): detect a
    # coherently moving, information-dominant foreground and mask its
    # strata out of the template before they can drag the pose. Three
    # escalating responses, each matched to a measured drag regime:
    # - vote at level 2 (nearly free): catches movers while the coarse-
    #   converged pose is still an almost-clean static estimate (a
    #   mover's texture is mostly blurred away there, but the geometry-
    #   flow metric in analyze() still sees its flow disagreement);
    # - vote at level 1 with SAME-LEVEL rerun: catches what the coarse
    #   vote missed at the level where a near-field mover's information
    #   actually bites; the level's iterations are re-run from their
    #   pre-level pose with the masked template (lax.cond), undoing the
    #   current frame's drag;
    # - HOSTAGE rescue: once drag is established, the static majority
    #   decorrelates and no vote majority can form, but the stratum the
    #   pose is locked onto is the only low-error pixel-minority one —
    #   persistent hostage flags re-track the WHOLE pyramid from the
    #   predicted pose with that stratum masked (lax.cond; 2x frame cost
    #   only while firing).
    # Earlier designs measured and rejected: voting at T_init (prediction
    # error + per-stratum bias = 3 cm spurious splits), voting at the
    # fully converged pose (adaptive sigmas have crushed the losing side
    # by then), Tikhonov-damped stratum solves (leak junk when weak,
    # shrink the mover signal when strong — truncated eigenspace solves
    # instead), one vote level only.
    consensus_frac = jnp.asarray(0.0, jnp.float32)
    n_bins = getattr(cfg, "consensus_bins", 6)
    cons_excluded = jnp.zeros((n_bins,), jnp.float32)
    rescue_out = jnp.asarray(0.0, jnp.float32)
    consensus_on = getattr(cfg, "consensus", False) and esm_mode
    det_l = min(getattr(cfg, "consensus_level", 2), levels - 1)
    if consensus_on:
        from . import consensus as _cons

        edges = _cons.stratum_edges(
            cfg.consensus_xi_min, cfg.consensus_xi_max, n_bins
        )
        member = jnp.ones((n_bins,), jnp.float32)
        # cons_prev carries per-stratum CONSECUTIVE-flag counts (via
        # MotionState). Callers without history (single-shot tracking,
        # relocalization) pass None -> persistence waived.
        cons_hist = (
            cons_prev
            if cons_prev is not None
            else jnp.full((n_bins,), 100.0, jnp.float32)
        )
        if cons_prev is not None:
            # EPISODE MASK (round-3 ballistic fix): strata with a live
            # streak start EXCLUDED at EVERY level — including the
            # coarsest, which the per-frame vote can never protect (the
            # vote runs after level det_l). The level trace shows why
            # this is the load-bearing piece: during a ballistic drag
            # the motion prior carries the drag velocity, the coarse
            # level (where the mover's 1/z^2 information dominates the
            # blurred image) CONFIRMS it, and by level 0 the static
            # majority sits ~5 px outside its linearization basin —
            # every level polishes the mover's pose. Masking the mover
            # before the coarse solve leaves the static majority within
            # its coarse basin (a 5 px level-0 error is 0.6 px at level
            # 3), so the pyramid pulls BACK each frame instead of
            # confirming the drag.
            # CONDITIONAL one-bin dilation: a mover near a bin edge (the
            # panel's xi shifts with camera range) can straddle into the
            # neighbor bin at frame start before any vote has credited
            # it — mask a full-streak stratum's neighbor too, but ONLY
            # if that neighbor has a live streak of its own (>= 1):
            # blind dilation was measured to mask 3 of 6 depth bands on
            # the ballistic clip and starve re-lock into a permanent
            # coast.
            persist_f = float(getattr(cfg, "consensus_persist", 3))
            hot = (cons_hist >= persist_f).astype(jnp.float32)
            zpad1 = jnp.zeros((1,), jnp.float32)
            hot_n = jnp.maximum(
                jnp.concatenate([zpad1, hot[:-1]]),
                jnp.concatenate([hot[1:], zpad1]),
            )
            hot = jnp.maximum(
                hot, hot_n * (cons_hist >= 1.0).astype(jnp.float32)
            )
            member = 1.0 - hot
        rescue_flag = jnp.asarray(False)
        flags_any = jnp.zeros((n_bins,), jnp.float32)
        nk_last = jnp.ones((n_bins,), jnp.float32)
        probe_fire = jnp.asarray(False)
        probe_cand = jnp.zeros((n_bins,), jnp.float32)
        excl_any = jnp.zeros((n_bins,), jnp.float32)

    def make_runner(level):
        kl, cl = kf[level], cur[level]
        intr_l = intrs[level]
        n_iters = cfg.iters[level] if level < len(cfg.iters) else cfg.iters[-1]
        # Loop-invariant backprojection: hoisted out of the IRLS loop.
        # Under SPMD each device holds a horizontal band of the keyframe;
        # backproject with GLOBAL row indices.
        row_offset = 0
        if axis_name is not None:
            # kl is already strided here, so the offset is in STRIDED row
            # units — backprojection through the stride-scaled intrinsics
            # maps it back to the global full-res row (s * offset).
            row_offset = jax.lax.axis_index(axis_name) * kl.xi.shape[0]
        s_l = strides[level]
        intr_bp = intr_l
        if s_l > 1:
            # Decimation keeps pixels at full-res coordinates u0 = s*j,
            # so x = (s*j - cx)/fx * z = (j - cx/s)/(fx/s) * z: plain
            # 1/s scaling (NOT level_intrinsics' half-pixel-center map,
            # which is for blurred+resampled pyramid levels).
            intr_bp = Intrinsics(
                fx=intr_l.fx / s_l,
                fy=intr_l.fy / s_l,
                cx=intr_l.cx / s_l,
                cy=intr_l.cy / s_l,
                width=kl.xi.shape[1],
                height=kl.xi.shape[0],
            )
        kf_points = backproject_grid(kl.xi, intr_bp, row_offset)
        esm = getattr(cfg, "jacobian", "ic") == "esm"
        # Finest-level hard cap on the occlusion-gate threshold (see
        # TrackingConfig.occ_gate_cap): 0.0 = adaptive-only at this level.
        gate_cap_l = (
            getattr(cfg, "occ_gate_cap", 0.0)
            if level <= getattr(cfg, "occ_gate_cap_level", 0)
            else 0.0
        )
        # plane_dtype="bf16" stores the LOOP-INVARIANT planes the
        # per-iteration program re-reads from HBM half-width (hoisted
        # backprojected points + template intensity; the frame's gather
        # stack is cast at preprocess). Consumers cast loads back to f32
        # before any math — see config.TrackingConfig.plane_dtype.
        kf_int_t = kl.intensity
        if esm and getattr(cfg, "plane_dtype", "f32") in ("bf16", "bf16-points"):
            kf_points = tuple(p.astype(jnp.bfloat16) for p in kf_points)
            kf_int_t = kl.intensity.astype(jnp.bfloat16)

        def run(T0, s2i0, s2x0, H0, mask_l):
            """One pyramid level's IRLS loop from (T0, sigmas) with the
            given template validity mask (the consensus mask multiplies
            into it; all-ones member = the plain mask)."""

            def body(carry):
                it, T, s2i, s2x, _H, _e, _i, _n, _step = carry
                if esm:
                    res = irls(
                        T, kf_int_t, kf_points, mask_l, kl.jac,
                        cl.stack7, intr_l, cfg.student_t_nu, s2i, s2x,
                        cfg.use_geometric, cfg.gate_sigmas,
                        getattr(cfg, "occlusion_gate", False),
                        gate_cap=gate_cap_l,
                        stacked_gather=getattr(cfg, "stacked_gather", None),
                    )
                else:
                    res = irls(
                        T, kl.intensity, kf_points, mask_l, kl.jac,
                        cl.intensity, cl.xi, cl.mask, intr_l,
                        cfg.student_t_nu, s2i, s2x, cfg.sigma_iters,
                        cfg.use_geometric, cfg.gate_sigmas,
                        getattr(cfg, "sigma_mode", "exact"),
                        stacked_gather=getattr(cfg, "stacked_gather", None),
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
                T0,
                s2i0,
                s2x0,
                H0,
                jnp.asarray(0.0, jnp.float32),
                jnp.asarray(0.0, jnp.float32),
                jnp.asarray(0.0, jnp.float32),
                jnp.asarray(jnp.inf, jnp.float32),
            )
            skip_tol = float(getattr(cfg, "conv_skip_tol", 0.0))
            if skip_tol > 0.0:
                # Convergence skip INSIDE the fori_loop: once the GN step
                # norm drops below tol, remaining iterations take the
                # no-op cond branch — the expensive body (4 corner
                # gathers of the 7-plane stack + the IRLS kernel) is
                # genuinely skipped at runtime (lax.cond executes one
                # branch; measured ~1 ms/skipped vs ~6.6 ms/hot trip
                # isolated at VGA). Unlike early_exit_tol's while_loop
                # (~5 ms fixed cost per INSTANCE on this emulator, round
                # 2), a cond inside the existing fori_loop adds no
                # instance cost, so cfg.iters become budgets at no price.
                # Under SPMD the step norm comes from the psum'd
                # (replicated) solve, so every device takes the same
                # branch.
                tol_c = jnp.asarray(skip_tol, jnp.float32)

                def body_or_skip(carry):
                    step = carry[-1]
                    return jax.lax.cond(
                        step > tol_c,
                        body,
                        lambda c: (c[0] + 1,) + c[1:],
                        carry,
                    )
            else:
                body_or_skip = body
            tol_f = float(getattr(cfg, "early_exit_tol", 0.0))
            if tol_f > 0.0:
                # Early exit: a converged GN iteration (step norm below
                # tol) would update the pose by less than the tolerance —
                # pure waste at the fixed per-iteration cost — so stop the
                # level there and treat cfg.iters as BUDGETS. Worth it on
                # real TPU hardware (while_loop trip overhead is ~us); on
                # the sandbox emulator a while_loop costs ~5 ms per
                # INSTANCE even at zero iterations (measured round 2),
                # which cancels the savings — hence the static fori_loop
                # default (early_exit_tol = 0). Under SPMD the step norm
                # comes from the psum'd (replicated) solve, so every
                # device takes the same branch.
                tol = jnp.asarray(tol_f, jnp.float32)

                def cond_fn(carry):
                    it, *_rest, step = carry
                    return jnp.logical_and(it < n_iters, step > tol)

                # while_loop already exits on convergence; no cond needed.
                out = jax.lax.while_loop(cond_fn, body, init)
            else:
                out = jax.lax.fori_loop(
                    0, n_iters, lambda _i, c: body_or_skip(c), init
                )
            return out[1:]

        return run, kl, cl, intr_l, kf_points

    runners = [make_runner(level) for level in range(levels)]

    def level_mask(level, member_vec):
        kl = kf[level]
        if consensus_on:
            return _cons.member_mask(kl.xi, kl.mask, edges, member_vec)
        return kl.mask

    def run_pyramid(member_vec, T0, s2i0, s2x0):
        """Plain coarse-to-fine pass (no votes) with the given stratum
        membership — the hostage-rescue branch."""
        T_, s2i_, s2x_ = T0, s2i0, s2x0
        H_ = jnp.eye(6, dtype=jnp.float32)
        errs_, inls_, nvs_ = [], [], []
        mask0_ = None
        for level in range(levels - 1, -1, -1):
            run, kl, _cl, _intr_l, _pts = runners[level]
            mask_l = level_mask(level, member_vec)
            T_, s2i_, s2x_, H_, err_, inl_, nv_, _ = run(
                T_, s2i_, s2x_, H_, mask_l
            )
            errs_.append(err_)
            inls_.append(inl_)
            nvs_.append(nv_)
            if level == 0:
                mask0_ = mask_l
        return (
            T_, s2i_, s2x_, H_,
            jnp.stack(errs_), jnp.stack(inls_), jnp.stack(nvs_), mask0_,
        )

    errors, inliers, nvalids = [], [], []
    mask0_applied = None
    for level in range(levels - 1, -1, -1):
        run, kl, cl, intr_l, kf_points = runners[level]
        mask_l = level_mask(level, member if consensus_on else None)
        T_pre, s2i_pre, s2x_pre, H_pre = T, s2i, s2x, H_last
        T, s2i, s2x, H_last, err, inl, nv, _ = run(
            T, s2i, s2x, H_last, mask_l
        )
        if _DEBUG_LEVELS:
            jax.debug.print(
                "  L{l} t={t} err={e:.3f} nv={n:.0f}",
                l=level, t=jnp.round(T[:3, 3] * 1e3, 1), e=err, n=nv,
            )

        if consensus_on and 1 <= level <= det_l:
            # The vote uses FIXED generous init sigmas (the adaptive ones
            # have already adapted to the compromise) and keeps the
            # occlusion gate ON: with these sigmas it is a wide ~0.3 1/m
            # gate that strips CROSS-DEPTH pollution (template pixels
            # warping onto a foreground object) while a fronto-parallel
            # mover's own strata sample their own depth and keep their
            # coherent flow signal. The stats run on the FULL template
            # mask, NOT the member-masked mask_l (round 3): an
            # episode-masked mover must stay MONITORED — it keeps
            # disagreeing with the (static-locked) converged pose, keeps
            # its streak alive, and stays masked for the whole episode;
            # when it leaves the view (nk -> 0, not a voter) or stops
            # moving (agrees), the flags stop, the streak decays, and
            # the stratum re-enters the consensus. With the old masked
            # stats a masked stratum had nk ~= 0, could never re-flag,
            # and the episode self-terminated after `persist` frames of
            # decay — re-admitting a mover still mid-sweep.
            full_mask_l = kl.mask
            strata = _cons.stratum_onehot(kl.xi, full_mask_l, edges)
            Hk, bk, nk, Gk, ek = gauss_newton.stratified_normal_eq(
                T, kl.intensity, kf_points, full_mask_l, kl.jac, cl.stack7,
                intr_l, cfg.student_t_nu,
                jnp.asarray(cfg.init_sigma_int**2, jnp.float32),
                jnp.asarray(cfg.init_sigma_xi**2, jnp.float32),
                strata, cfg.use_geometric, cfg.gate_sigmas,
                occlusion_gate=True, axis_name=axis_name,
                stacked_gather=getattr(cfg, "stacked_gather", None),
            )
            # Baseline from the keyframe (template aging): thresholds
            # inflate with motion magnitude — see analyze().
            t_norm = jnp.linalg.norm(T[:3, 3])
            ang = se3.rotation_angle(T[:3, :3])
            bscale = (
                1.0
                + 12.0 * jnp.maximum(t_norm - 0.06, 0.0)
                + 8.0 * jnp.maximum(ang - 0.05, 0.0)
            )
            # Resolution-invariant tolerance: consensus_tol is pixels on
            # the 320x240/fx=258.6 calibration rig; scale by the actual
            # full-res focal so the angular-flow threshold matches at
            # any resolution (intr_l.fx * 2^level == fx_full, so the
            # scale is level-independent). See consensus_ref_fx in
            # config.py for the measured VGA failure without this.
            tol_l = cfg.consensus_tol * (
                intr_l.fx * (2.0 ** level)
                / getattr(cfg, "consensus_ref_fx", 258.6)
            )
            verdict = _cons.analyze(
                Hk, bk, nk, Gk, ek, tol_l,
                cfg.consensus_min_frac,
                getattr(cfg, "consensus_err_ratio", 4.0),
                getattr(cfg, "consensus_err_floor", 1.0),
                baseline_scale=bscale,
            )
            if _DEBUG_LEVELS:
                jax.debug.print(
                    "  VOTE L{l} nk={nk} info={i} excl={e} host={h} dom={d} maj={m}",
                    l=level, nk=jnp.round(nk / jnp.maximum(jnp.sum(nk), 1.0), 2),
                    i=jnp.round(verdict.info_share, 2),
                    e=verdict.excluded, h=verdict.hostage,
                    d=verdict.dominant, m=verdict.majority_ok,
                )
            flags_any = jnp.maximum(
                flags_any, jnp.maximum(verdict.excluded, verdict.hostage)
            )
            nk_last = nk  # finest vote level's stratum pixel counts
            decision = _cons.decide(
                verdict, cons_hist, nk, cfg.consensus_trigger_frac,
                getattr(cfg, "consensus_max_frac", 0.4),
                getattr(cfg, "consensus_persist", 3),
            )
            if getattr(cfg, "attack_probe", False):
                # ATTACK-PROBE candidate (round-4 ballistic-onset fix).
                # Forensic record (BASELINE.md round-4): at ballistic
                # onset the coarse solve locks onto the panel within ONE
                # frame, so the vote runs at a MOVER-locked pose and its
                # exclusion flag lands on the static band the panel
                # currently occludes (the victim), while the resolution-
                # limited far background sides with the panel — the
                # mover itself is never named by any per-stratum test
                # (measured info share 1.7x pixel share at onset vs
                # 1.4x for rigid near bands: dominance cannot separate
                # them, which is why the 2x hostage gate correctly
                # stays silent there). The one identifiable signature:
                # a vote exclusion under a CLEAR majority names a
                # victim, and the only stratum that CAN drag the pose
                # is the highest information-DENSITY agreeing minority
                # voter (1/z^2 is the attack vector). Probe that
                # hypothesis: re-track the pyramid from the prior with
                # that stratum masked, accepted post-loop only on a
                # STRICT evidence margin (probe_margin < 1) — a rigid
                # false fire re-converges to the same pose and the tie
                # is rejected (the round-3 premature-rescue lesson:
                # ties must not win).
                tot_k = jnp.maximum(jnp.sum(nk), 1.0)
                voter_k = nk >= cfg.consensus_min_frac * tot_k
                # MINORITY_CAP is shared with analyze()'s dominance /
                # hostage gates (consensus.py module constants) so the
                # probe's candidate pool and the vote's gates tune
                # together.
                pool = (
                    voter_k
                    & (verdict.excluded < 0.5)
                    & (nk < _cons.MINORITY_CAP * tot_k)
                )
                dens = jnp.where(
                    pool,
                    verdict.info_share / jnp.maximum(nk / tot_k, 1e-6),
                    -1.0,
                )
                fire_l = (
                    (jnp.sum(verdict.excluded) > 0.5)
                    & verdict.majority_ok
                    & jnp.any(pool)
                )
                probe_cand = jnp.where(
                    fire_l,
                    jax.nn.one_hot(
                        jnp.argmax(dens), n_bins, dtype=jnp.float32
                    ),
                    probe_cand,
                )
                probe_fire = probe_fire | fire_l
                excl_any = jnp.maximum(excl_any, verdict.excluded)
            member2 = member * decision.member
            # Report the LARGEST per-level excluded fraction, not the sum:
            # when both vote levels flag the same strata in one frame a
            # sum double-counts the masked pixels (advisor round-2).
            consensus_frac = jnp.maximum(
                consensus_frac, decision.excluded_frac
            )
            rescue_flag = rescue_flag | decision.rescue
            # Rerun only when the decision NEWLY excluded a stratum that
            # was still a member when this level ran: during an episode
            # the mover is already masked at every level (episode mask),
            # decide() keeps flagging it, and an unconditional rerun
            # would pay a full redundant IRLS pass per vote level per
            # frame for an identical mask.
            mask_changed = jnp.any(member2 < member)
            rerun_here = (
                decision.triggered
                & mask_changed
                & jnp.logical_not(decision.rescue)
            )

            def _masked_rerun(_):
                mask_new = _cons.member_mask(kl.xi, kl.mask, edges, member2)
                return run(T_pre, s2i_pre, s2x_pre, H_pre, mask_new)

            T, s2i, s2x, H_last, err, inl, nv, _ = jax.lax.cond(
                rerun_here,
                _masked_rerun,
                lambda _: (T, s2i, s2x, H_last, err, inl, nv,
                           jnp.asarray(0.0, jnp.float32)),
                None,
            )
            member = member2
        errors.append(err)
        inliers.append(inl)
        nvalids.append(nv)
        if level == 0:
            mask0_applied = mask_l

    errs_s = jnp.stack(errors)
    inls_s = jnp.stack(inliers)
    nvs_s = jnp.stack(nvalids)
    if consensus_on:
        # Update the per-stratum streak counts for the next frame.
        # LEAKY + NEIGHBOR-CREDITING (round-3 ballistic fix): the old
        # hard-reset counter (flagged ? c+1 : 0) never reached the
        # persistence gate during a ballistic drag — detection flickers
        # (tolerance/floor aging inflation lets the mover slip on ~30% of
        # episode frames) and the mover's inverse depth crosses a bin
        # edge when the camera closes range, so the streak restarted from
        # zero mid-episode (measured: QVGA seed-3 ballistic, flags on
        # f20-f33 with 1-2 frame gaps and a bin2->bin3 migration, streak
        # stuck at 0-2, 548 mm raw ATE while the vote SAW the mover).
        # A flagged stratum now inherits a MIGRATING neighbor's streak
        # (the neighbor bin has the count and stopped flagging — the
        # mover's xi moved on) and unflagged strata decay by 1 instead
        # of resetting (flicker keeps it). Inheritance is gated on the
        # source neighbor NOT flagging this frame: a straddle (both bins
        # flagging) builds each bin's own streak and the episode mask's
        # conditional dilation already covers the pair, while an
        # ungated credit let a SINGLE spurious flag next to a saturated
        # mover bin jump straight to the cap and episode-mask a static
        # band for ~5 frames (code-review round 3). Isolated hard-frame
        # false flags still die out (1, 0, ...) and sparse repeats
        # (every 3rd frame) can never reach the gate.
        # With cons_prev=None the in-frame gates were waived via a
        # sentinel history (100); the RETURNED counts must not inherit
        # it (a caller threading them into the next frame would start
        # every stratum past the episode gate and mask the whole
        # template — code-review round 3), so the update runs on the
        # REAL history (zeros when none was given).
        hist_real = (
            cons_prev
            if cons_prev is not None
            else jnp.zeros((n_bins,), jnp.float32)
        )
        flagged = flags_any > 0.5
        zpad = jnp.zeros((1,), jnp.float32)
        fpad = jnp.zeros((1,), jnp.bool_)
        left_h = jnp.concatenate([zpad, hist_real[:-1]])
        right_h = jnp.concatenate([hist_real[1:], zpad])
        left_f = jnp.concatenate([fpad, flagged[:-1]])
        right_f = jnp.concatenate([flagged[1:], fpad])
        credit = jnp.maximum(
            jnp.where(left_f, 0.0, left_h), jnp.where(right_f, 0.0, right_h)
        )
        base = jnp.maximum(hist_real, credit)
        # Saturate the streak a little above the gate so a departed or
        # stopped mover unmasks within a few clean frames (an uncapped
        # count after a 15-frame episode would keep a now-static depth
        # band masked for 15 more).
        streak_cap = float(getattr(cfg, "consensus_persist", 3)) + 4.0
        cons_excluded = jnp.where(
            flagged,
            jnp.minimum(base + 1.0, streak_cap),
            jnp.maximum(hist_real - 1.0, 0.0),
        )
        if _DEBUG_LEVELS:
            jax.debug.print(
                "  STREAK prev={p} flags={f} -> {n}",
                p=cons_hist, f=flags_any, n=cons_excluded,
            )
        main_out = (T, s2i, s2x, H_last, errs_s, inls_s, nvs_s, mask0_applied)
        s2i0 = jnp.asarray(cfg.init_sigma_int**2, jnp.float32)
        s2x0 = jnp.asarray(cfg.init_sigma_xi**2, jnp.float32)
        rescue_any = rescue_flag
        rescue_member = member
        if getattr(cfg, "div_rescue", False):
            # Divergence-triggered rescue (round-3 ballistic-mover
            # response): when the converged pose diverges hard from the
            # motion prior ON a frame where strata carry stress flags,
            # re-track the pyramid from the prior with those strata
            # masked. Measured asymmetry justifies a hair trigger: on a
            # rigid false positive the masked re-track re-converges to
            # the same pose (costs one extra frame-track); on a
            # basin-escaping mover it removes the drag. Guards: the
            # flagged strata must be a real pixel minority (frac in
            # (1%, consensus_max_frac]) so we never mask half the image.
            D = se3.inv(T_init) @ T
            div_t = jnp.linalg.norm(D[:3, 3])
            div_r = se3.rotation_angle(D[:3, :3])
            flagged = jnp.maximum(
                (flags_any > 0.5).astype(jnp.float32),
                (cons_hist >= float(getattr(cfg, "consensus_persist", 3))).astype(
                    jnp.float32
                ),
            )
            frac = jnp.sum(flagged * nk_last) / jnp.maximum(
                jnp.sum(nk_last), 1.0
            )
            div_fire = (
                (
                    (div_t > getattr(cfg, "div_trans_thresh", 0.03))
                    | (div_r > getattr(cfg, "div_rot_thresh", 0.04))
                )
                & (frac > 0.01)
                & (frac <= getattr(cfg, "consensus_max_frac", 0.35))
                & jnp.logical_not(rescue_flag)
            )
            rescue_member = jnp.where(
                div_fire, member * (1.0 - flagged), member
            )
            rescue_any = rescue_flag | div_fire
            consensus_frac = jnp.maximum(
                consensus_frac, jnp.where(div_fire, frac, 0.0)
            )
        rescue_margin = jnp.asarray(1.0, jnp.float32)
        if getattr(cfg, "attack_probe", False):
            # Fold the attack probe into the one traced rescue pyramid:
            # it fires only when no hostage/divergence rescue does, masks
            # the probed attacker stratum, and must BEAT the main pose by
            # the strict margin (hostage/div rescues keep their measured
            # tie-accepting semantics via margin 1).
            probe_go = probe_fire & jnp.logical_not(rescue_any)
            rescue_member = jnp.where(
                probe_go, member * (1.0 - probe_cand), rescue_member
            )
            rescue_margin = jnp.where(
                probe_go,
                jnp.asarray(
                    float(getattr(cfg, "probe_margin", 0.9)), jnp.float32
                ),
                rescue_margin,
            )
            rescue_any = rescue_any | probe_go
        T_main = main_out[0]

        def _err0_fixed(Tq, mask0):
            """One fixed-sigma level-0 evaluation of pose Tq on the given
            masked template — the EVIDENCE metric for rescue acceptance.
            Fixed init sigmas (not the adapted ones) so the two poses'
            errors are comparable; psum'd under SPMD so every device
            takes the same branch."""
            _, kl0, cl0, intr0, pts0 = runners[0]
            r0 = irls(
                Tq, kl0.intensity, pts0, mask0, kl0.jac, cl0.stack7,
                intr0, cfg.student_t_nu, s2i0, s2x0,
                cfg.use_geometric, cfg.gate_sigmas,
                getattr(cfg, "occlusion_gate", False),
                gate_cap=getattr(cfg, "occ_gate_cap", 0.0),
                stacked_gather=getattr(cfg, "stacked_gather", None),
            )
            if axis_name is not None:
                r0 = gauss_newton.allreduce_irls(r0, axis_name)
            return r0.error

        def _rescue_branch(args):
            """Masked re-track from the prior, accepted ONLY on evidence:
            the rescued pose must fit the RETAINED (non-mover) level-0
            template at least as well (hostage/div rescues, margin 1) or
            STRICTLY better (attack probe, margin < 1) than the main pose
            does on the same mask with the same fixed sigmas. A premature
            rescue (slow mover whose early dominance frames are
            ambiguous) re-tracks to a worse static fit and is rejected —
            which is what lets the hostage gate fire a frame earlier than
            the vote path without the measured walking regression
            (19 -> 56 mm when early rescues were accepted
            unconditionally)."""
            m, margin = args
            resc = run_pyramid(m, T_init, s2i0, s2x0)
            mask0_r = resc[7]
            evid_mask = mask0_r
            if getattr(cfg, "attack_probe", False):
                # The probe's EVIDENCE must be judged only on UNACCUSED
                # pixels: this frame's vote-excluded strata stay in the
                # probe's re-track (in the ballistic case the excluded
                # stratum is the static VICTIM and carries the pull-back
                # signal) but must leave the comparison — when the vote
                # accusation is CORRECT (walking regime: the mover itself
                # is excluded), an evidence mask retaining the mover
                # rewards the mover-locked hypothesis (measured on the
                # seed-1 walking clip: one accepted wrong-way probe,
                # dT 31 mm mover-ward at err ratio 0.75, +8 mm ATE). The
                # hostage/div rescue paths already exclude their accused
                # strata from mask0_r via decide(); this aligns the
                # probe's evidence with the same rule.
                kl0 = kf[0]
                evid_member = 1.0 - jnp.clip(excl_any, 0.0, 1.0)
                evid_mask = jnp.where(
                    probe_go,
                    _cons.member_mask(
                        kl0.xi, mask0_r, edges, evid_member
                    ),
                    mask0_r,
                )
            err_r = _err0_fixed(resc[0], evid_mask)
            err_m = _err0_fixed(T_main, evid_mask)
            if _DEBUG_LEVELS:
                jax.debug.print(
                    "  RESCUE err_r={r:.4f} err_m={m:.4f} margin={g}"
                    " member={mb} dT={d} (mm, rescued-main)",
                    r=err_r, m=err_m, g=margin, mb=m,
                    d=jnp.round((resc[0][:3, 3] - T_main[:3, 3]) * 1e3, 1),
                )
            acc = err_r <= margin * err_m
            return jax.lax.cond(
                acc, lambda: resc, lambda: main_out
            ) + (acc.astype(jnp.float32),)

        (
            T, s2i, s2x, H_last, errs_s, inls_s, nvs_s, mask0_applied,
            rescue_accepted,
        ) = jax.lax.cond(
            rescue_any,
            _rescue_branch,
            lambda args: main_out + (jnp.asarray(0.0, jnp.float32),),
            (rescue_member, rescue_margin),
        )
        if getattr(cfg, "attack_probe", False):
            # STREAK TRANSFER on an accepted attack probe: the vote flag
            # that triggered it was cast at a MOVER-locked pose, so the
            # accusation named the victim (the static band the mover
            # occludes), not the attacker. Feeding that flag into the
            # streak is the measured poison — the victim's streak ripens,
            # the episode mask cripples the static template mid-drag, and
            # the probed attacker stays unmasked (f27 in the round-4
            # forensic: victim + attacker both masked left only the far
            # band, the probe got rejected, and 53 mm leaked through).
            # An accepted probe is EVIDENCE the attacker hypothesis is
            # right: credit the streak to the probed stratum and let the
            # false accusation decay, so the episode mask ripens on the
            # MOVER within consensus_persist frames of onset.
            # Only the INVOLVED strata transfer (advisor round-4): the
            # probed attacker gets the +1 credit, the vote-excluded
            # victims (excl_any — the accusations cast at the
            # mover-locked pose, now known false) decay, and every
            # UNINVOLVED stratum keeps its normal cons_excluded update —
            # a second, independent mover flagged through its own
            # err/hostage path this frame must not have its streak
            # knocked back on every probe-accept frame (the old
            # rebuild-from-hist_real form decayed ALL non-probed strata,
            # which could keep a simultaneous second mover's episode
            # mask from ever ripening).
            probe_accept = probe_go & (rescue_accepted > 0.5)
            transfer = jnp.where(
                probe_cand > 0.5,
                jnp.minimum(hist_real + 1.0, streak_cap),
                jnp.where(
                    excl_any > 0.5,
                    jnp.maximum(hist_real - 1.0, 0.0),
                    cons_excluded,
                ),
            )
            cons_excluded = jnp.where(probe_accept, transfer, cons_excluded)
        # rescue_out feeds the keyframe-REFOUND decision (rescue_refound)
        # and is gated on the rescue's pose CORRECTION, not on the rescue
        # having fired: on a rigid false positive the masked re-track
        # re-converges to the main pose (measured: a 14-frame rigid loop
        # had hostage fires on 3 hard frames whose rescues landed at the
        # same pose — ungated refounds there took 1.9 -> 10.8 mm ATE by
        # baking founding error into fresh keyframes), while a genuine
        # drag rescue moves the pose by tens of mm (walking mover:
        # 85-260 mm prior divergence on fighting frames). Only a rescue
        # that actually CORRECTED something is evidence of drag worth
        # refounding over.
        D_r = se3.inv(T_main) @ T
        corr_t = jnp.linalg.norm(D_r[:3, 3])
        corr_r = se3.rotation_angle(D_r[:3, :3])
        corrected = (
            (corr_t > getattr(cfg, "rescue_refound_min_trans", 0.02))
            | (corr_r > getattr(cfg, "rescue_refound_min_rot", 0.02))
        )
        rescue_out = (rescue_any & corrected).astype(jnp.float32)

    # Overlap vs the APPLIED finest-level template mask: when consensus
    # masks strata out, they must leave the overlap denominator too, or a
    # firing episode would read as overlap collapse and thrash keyframe
    # creation.
    kf_count = jnp.sum(mask0_applied)
    cur_count = jnp.sum(cur[0].mask)
    # cur_frac normalizes the CURRENT frame's validity count, so its
    # denominator is the current frame's own (full-res, replicated) pixel
    # count — independent of template striding/sharding. kf_count and
    # n_valid may both be template-strided; they share the same
    # subsampling so their ratio (the overlap fraction) is unchanged.
    n_px = jnp.asarray(
        cur[0].mask.shape[0] * cur[0].mask.shape[1], jnp.float32
    )
    if axis_name is not None:
        # Keyframe planes are row-sharded (partial counts -> psum); the
        # CURRENT frame is replicated across the mesh, so its local count
        # already covers the full image — psumming it would count each
        # pixel n_devices times, clip cur_frac to 1, and make the sharded
        # overlap diverge from the single-device value.
        kf_count = jax.lax.psum(kf_count, axis_name)
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
    overlap = jnp.clip(nvs_s[-1] / (kf_count * cur_frac), 0.0, 1.0)
    # errors/... were appended coarse->fine; store fine->coarse (level order).
    return TrackResult(
        T=T,
        H=H_last,
        errors=errs_s[::-1],
        inlier_frac=inls_s[::-1],
        n_valid=nvs_s[::-1],
        overlap=overlap,
        sigma2_int=s2i,
        sigma2_xi=s2x,
        consensus_frac=consensus_frac,
        cons_excluded=cons_excluded,
        kf_count=kf_count,
        rescue=rescue_out,
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
        cons_prev: jax.Array | None = None,
    ) -> TrackResult:
        """``cons_prev`` carries the per-stratum consecutive-flag counts
        from the previous frame (streaming semantics, what the production
        MotionState threads through). None = single-shot semantics: the
        consensus persistence gate is waived."""
        if cons_prev is None:
            return self._fn(kf, cur, T_init)
        return self._fn(kf, cur, T_init, cons_prev=cons_prev)
