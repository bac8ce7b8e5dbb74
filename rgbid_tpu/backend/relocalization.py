"""Batched dense relocalization scoring on device (K11).

Reference equivalent: loop-candidate verification by dense alignment,
reusing the tracker kernels at coarse pyramid levels (SURVEY.md §3.5).
TPU-native twist (BASELINE.json:5): ALL candidate pairs are verified in a
single `vmap`-batched jitted program — one dispatch amortizes the fixed
per-program cost across the whole candidate set, and the per-pair math is
identical to the tracker's level loop (template Jacobians are rebuilt
in-program; at coarse resolution that is negligible).
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.camera import Intrinsics, level_intrinsics
from ..core.config import SlamConfig
from ..ops import gauss_newton, image


class RelocResult(NamedTuple):
    T: jax.Array  # (B, 4, 4) T_{query<-candidate} (maps template -> current)
    H: jax.Array  # (B, 6, 6)
    error: jax.Array  # (B,)
    inlier_frac: jax.Array  # (B,)
    n_valid: jax.Array  # (B,)
    sigma_int: jax.Array  # (B,) final photometric residual scale (absolute)
    sigma_xi: jax.Array  # (B,) final inverse-depth residual scale (absolute)


def _align_level(t_int, t_xi, t_mask, c_int, c_xi, c_mask, carry_in, intr_l, nu, iters, sigma_iters):
    # ESM alignment (same formulation as the tracker's default): template
    # gradients + warped current gradients averaged, warp Jacobian from
    # precomputed template points. Better-converged loop edges feed the
    # pose graph directly.
    from ..ops.warp import backproject_grid

    gx_i, gy_i = image.gradients_unmasked(t_int)
    gx_x, gy_x = image.gradients(t_xi, t_mask)
    t_grads = jnp.stack([gx_i, gy_i, gx_x, gy_x])
    cgx_i, cgy_i = image.gradients_unmasked(c_int)
    cgx_x, cgy_x = image.gradients(c_xi, c_mask)
    c_stack7 = jnp.stack([c_int, c_xi, c_mask, cgx_i, cgy_i, cgx_x, cgy_x])
    t_points = backproject_grid(t_xi, intr_l)

    def body(_, carry):
        T, s2i, s2x, _H, _e, _i, _n = carry
        res = gauss_newton.esm_residuals_and_normal_eq(
            T, t_int, t_points, t_mask, t_grads, c_stack7,
            intr_l, nu, s2i, s2x, occlusion_gate=True,
        )
        T_new, _ = gauss_newton.ic_update(T, res.H, res.b, 1e-6, res.n_valid)
        return (
            T_new, res.sigma2_int, res.sigma2_xi,
            res.H, res.error, res.inlier_frac, res.n_valid,
        )

    return jax.lax.fori_loop(0, iters, body, carry_in)


def _single_pair(
    t_int, t_xi, t_mask, c_int, c_xi, c_mask, T_init, *, intr_l, intr_l2, nu, iters, sigma_iters
):
    # Mini coarse-to-fine: two in-program downsamples widen the basin so
    # identity-initialized loop candidates converge even for decimeter-
    # scale revisit offsets (like the tracker's coarsest levels), then
    # refine at the stored level.
    t_int2, _ = image.downsample(t_int, jnp.ones_like(t_mask))
    t_xi2, t_mask2 = image.downsample(t_xi, t_mask)
    c_int2, _ = image.downsample(c_int, jnp.ones_like(c_mask))
    c_xi2, c_mask2 = image.downsample(c_xi, c_mask)
    t_int3, _ = image.downsample(t_int2, jnp.ones_like(t_mask2))
    t_xi3, t_mask3 = image.downsample(t_xi2, t_mask2)
    c_int3, _ = image.downsample(c_int2, jnp.ones_like(c_mask2))
    c_xi3, c_mask3 = image.downsample(c_xi2, c_mask2)

    z = jnp.asarray(0.0, jnp.float32)
    carry = (T_init, jnp.asarray(0.01, jnp.float32), jnp.asarray(0.0025, jnp.float32),
             jnp.eye(6, dtype=jnp.float32), z, z, z)
    carry = _align_level(
        t_int3, t_xi3, t_mask3, c_int3, c_xi3, c_mask3, carry,
        _level_up(intr_l2), nu, iters, sigma_iters
    )
    carry = _align_level(
        t_int2, t_xi2, t_mask2, c_int2, c_xi2, c_mask2, carry, intr_l2, nu, iters, sigma_iters
    )
    carry = _align_level(
        t_int, t_xi, t_mask, c_int, c_xi, c_mask, carry, intr_l, nu, iters, sigma_iters
    )
    T, s2i, s2x, H, err, inl, nv = carry
    return T, H, err, inl, nv, jnp.sqrt(s2i), jnp.sqrt(s2x)


def _level_up(intr: Intrinsics) -> Intrinsics:
    """Intrinsics one pyramid level coarser than ``intr``."""
    return Intrinsics(
        fx=intr.fx / 2,
        fy=intr.fy / 2,
        cx=(intr.cx + 0.5) / 2 - 0.5,
        cy=(intr.cy + 0.5) / 2 - 0.5,
        width=(intr.width + 1) // 2,
        height=(intr.height + 1) // 2,
    )


class RelocScorer:
    """Jit+vmap-compiled batched pair aligner bound to (intrinsics, config)."""

    def __init__(self, intr: Intrinsics, cfg: SlamConfig):
        self.cfg = cfg
        self.level = min(cfg.backend.reloc_level, cfg.tracking.levels - 1)
        self.intr_l = level_intrinsics(intr, self.level)
        fn = functools.partial(
            _single_pair,
            intr_l=self.intr_l,
            intr_l2=level_intrinsics(intr, self.level + 1),
            nu=cfg.tracking.student_t_nu,
            iters=cfg.backend.reloc_iters,
            sigma_iters=cfg.tracking.sigma_iters,
        )
        self._fn = jax.jit(jax.vmap(fn))

    def score_pairs(
        self,
        templates: List[dict],
        currents: List[dict],
        T_inits: List[np.ndarray] | None = None,
    ) -> RelocResult:
        """templates/currents: lists of reloc_planes dicts with keys
        intensity/xi/mask at the reloc level. Returns stacked results.

        T maps template(candidate)-frame points into current(query)-frame.
        """
        B = len(templates)
        assert B == len(currents) and B > 0
        # Pad to a fixed batch size: a vmap program specializes on B, and
        # per-batch-size recompiles are far more expensive than scoring a
        # few dummy pairs (minutes vs milliseconds on the sandbox TPU).
        Bpad = max(self.cfg.backend.max_candidates, B)
        pad = Bpad - B

        def stack(seq, k):
            arrs = [s[k] for s in seq] + [np.zeros_like(seq[0][k])] * pad
            return jnp.asarray(np.stack(arrs), jnp.float32)

        eye = np.eye(4, dtype=np.float32)
        t_list = [eye] * Bpad if T_inits is None else list(T_inits) + [eye] * pad
        T0 = jnp.asarray(np.stack(t_list), jnp.float32)
        out = self._fn(
            stack(templates, "intensity"), stack(templates, "xi"), stack(templates, "mask"),
            stack(currents, "intensity"), stack(currents, "xi"), stack(currents, "mask"),
            T0,
        )
        return RelocResult(*[np.asarray(x)[:B] for x in out])

    def accept(self, res: RelocResult, i: int) -> bool:
        """Acceptance gate (convergence + residual + inlier thresholds)."""
        b = self.cfg.backend
        nv = float(res.n_valid[i])
        h, w = self.intr_l.height, self.intr_l.width
        # NOTE: error/inlier_frac are Student-t scale-normalized and thus
        # nearly scale-INVARIANT — two unrelated views can "converge" with
        # good normalized stats. The absolute residual scales sigma_int /
        # sigma_xi are the discriminative part of this gate.
        return (
            np.isfinite(np.asarray(res.T[i])).all()
            and nv > 0.2 * h * w
            and float(res.error[i]) < b.max_reloc_residual
            and float(res.inlier_frac[i]) > b.min_reloc_inliers
            and float(res.sigma_int[i]) < b.max_reloc_sigma_int
            and float(res.sigma_xi[i]) < b.max_reloc_sigma_xi
        )
