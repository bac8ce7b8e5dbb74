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


def _track_impl(
    kf: Tuple[KeyframeLevel, ...],
    cur: Tuple[FrameLevel, ...],
    T_init: jax.Array,
    intrs: Tuple[Intrinsics, ...],
    cfg: TrackingConfig,
) -> TrackResult:
    levels = cfg.levels
    irls = _select_irls(cfg)
    T = T_init
    s2i = jnp.asarray(cfg.init_sigma_int**2, jnp.float32)
    s2x = jnp.asarray(cfg.init_sigma_xi**2, jnp.float32)
    errors, inliers, nvalids = [], [], []
    H_last = jnp.eye(6, dtype=jnp.float32)

    from ..ops.warp import backproject_grid

    for level in range(levels - 1, -1, -1):
        kl, cl = kf[level], cur[level]
        intr_l = intrs[level]
        n_iters = cfg.iters[level] if level < len(cfg.iters) else cfg.iters[-1]
        # Loop-invariant backprojection: hoisted out of the IRLS loop.
        kf_points = backproject_grid(kl.xi, intr_l)

        esm = getattr(cfg, "jacobian", "ic") == "esm"

        def body(_, carry, kl=kl, cl=cl, intr_l=intr_l, kf_points=kf_points, esm=esm):
            T, s2i, s2x, _H, _e, _i, _n = carry
            if esm:
                res = irls(
                    T, kl.intensity, kf_points, kl.mask, kl.jac, cl.stack7,
                    intr_l, cfg.student_t_nu, s2i, s2x,
                    cfg.use_geometric, cfg.gate_sigmas,
                )
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
            T_new, _ = gauss_newton.ic_update(T, res.H, res.b, cfg.damping, res.n_valid)
            return (
                T_new,
                res.sigma2_int,
                res.sigma2_xi,
                res.H,
                res.error,
                res.inlier_frac,
                res.n_valid,
            )

        init = (
            T,
            s2i,
            s2x,
            H_last,
            jnp.asarray(0.0, jnp.float32),
            jnp.asarray(0.0, jnp.float32),
            jnp.asarray(0.0, jnp.float32),
        )
        T, s2i, s2x, H_last, err, inl, nv = jax.lax.fori_loop(
            0, n_iters, body, init
        )
        errors.append(err)
        inliers.append(inl)
        nvalids.append(nv)

    kf_count = jnp.maximum(jnp.sum(kf[0].mask), 1.0)
    # errors/... were appended coarse->fine; store fine->coarse (level order).
    return TrackResult(
        T=T,
        H=H_last,
        errors=jnp.stack(errors[::-1]),
        inlier_frac=jnp.stack(inliers[::-1]),
        n_valid=jnp.stack(nvalids[::-1]),
        overlap=nvalids[-1] / kf_count,
        sigma2_int=s2i,
        sigma2_xi=s2x,
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
