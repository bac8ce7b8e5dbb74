"""Inverse-compositional Gauss-Newton building blocks (K5–K7).

The reference builds forward-compositional per-pixel Jacobians every
iteration on the GPU (estimate_step.cu, SURVEY.md §2.2 K7) and reads the
reduced 6x6 system back to the host each iteration. Here (SURVEY.md §7
design stances 1–2):

* Jacobians live on the *keyframe template* (inverse-compositional — one
  precompute per keyframe per level, constant across iterations);
* each iteration only gathers 2 sampled planes, evaluates residuals +
  Student-t weights, and reduces the 6x6 normal equations — all on device;
* the 6x6 solve and the SE(3) exponential update also run on device, so a
  whole pyramid level (or frame) is ONE XLA program with zero host syncs.

Update convention (Baker–Matthews inverse compositional):
    J_I  =  grad(I_kf) . Jw(P)
    J_xi =  grad(xi_kf) . Jw(P) - J_rho(P)
    H = sum_c (w_c / sigma_c^2) J_c J_c^T,  b = sum_c (w_c / sigma_c^2) J_c r_c
    delta = solve(H, b);   T <- T . exp(-delta)
which is first-order equivalent to the oracle's forward-compositional
update T <- exp(-H^{-1}b_fc) . T; both are validated to converge to the
same pose on synthetic data.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import se3
from ..core.camera import Intrinsics
from .warp import backproject_grid, sample_tracker_planes, transform_project


# Template Jacobians are stored as ONE (12, H, W) array: planes 0-5 are the
# photometric channel, 6-11 the inverse-depth channel. Plane-major layout
# keeps W in the TPU lane dimension, which the fused Pallas reduction
# kernel requires (BlockSpec tiles are (sublane, lane) = (rows, W)).


def warp_jacobian(x, y, z, intr: Intrinsics):
    """Jw = d(u,v)/d delta at identity, from template points. (..., 2, 6).

    Twist convention delta = [v, w] (translation first), perturbation
    P -> P + v + w x P.
    """
    iz = 1.0 / jnp.maximum(z, 1e-6)
    iz2 = iz * iz
    zeros = jnp.zeros_like(x)
    ju = intr.fx * jnp.stack(
        [iz, zeros, -x * iz2, -x * y * iz2, 1.0 + x * x * iz2, -y * iz], axis=-1
    )
    jv = intr.fy * jnp.stack(
        [zeros, iz, -y * iz2, -(1.0 + y * y * iz2), x * y * iz2, x * iz], axis=-1
    )
    return ju, jv


def rho_jacobian(x, y, z):
    """d(1/Z)/d delta at identity from template points, (..., 6)."""
    iz2 = 1.0 / jnp.maximum(z, 1e-6) ** 2
    zeros = jnp.zeros_like(x)
    return jnp.stack([zeros, zeros, -iz2, -y * iz2, x * iz2, zeros], axis=-1)


def template_jacobians(
    gx_int, gy_int, gx_xi, gy_xi, xi, mask, intr: Intrinsics, dtype=jnp.float32
) -> jax.Array:
    """Precompute the constant IC Jacobians for one keyframe pyramid level.

    Runs once per keyframe per level (vs. the reference's per-iteration
    Jacobian rebuild) — the single biggest HBM-traffic win on TPU.
    Returns (12, H, W): planes 0-5 photometric, 6-11 inverse-depth.
    """
    x, y, z = backproject_grid(xi, intr)
    ju, jv = warp_jacobian(x, y, z, intr)
    m = mask[..., None]
    j_int = (gx_int[..., None] * ju + gy_int[..., None] * jv) * m
    j_xi = (gx_xi[..., None] * ju + gy_xi[..., None] * jv - rho_jacobian(x, y, z)) * m
    return jnp.concatenate(
        [jnp.moveaxis(j_int, -1, 0), jnp.moveaxis(j_xi, -1, 0)], axis=0
    ).astype(dtype)


def student_t_sigma2(r2, valid, nu: float, sigma2_init, iters: int):
    """Masked fixed-point Student-t scale estimate (returns sigma^2)."""
    n = jnp.maximum(jnp.sum(valid), 1.0)
    sigma2 = sigma2_init
    for _ in range(max(iters, 1)):
        w = (nu + 1.0) / (nu + r2 / jnp.maximum(sigma2, 1e-12))
        sigma2 = jnp.maximum(jnp.sum(valid * w * r2) / n, 1e-12)
    return sigma2


class IrlsResult(NamedTuple):
    H: jax.Array  # (6, 6) normal matrix
    b: jax.Array  # (6,)
    sigma2_int: jax.Array
    sigma2_xi: jax.Array
    error: jax.Array  # weighted mean squared error
    n_valid: jax.Array
    inlier_frac: jax.Array


def allreduce_irls(res: IrlsResult, axis_name: str) -> IrlsResult:
    """Combine per-shard IRLS results into the global one (inside
    shard_map). Every field except n_valid is a per-pixel mean normalized
    by the SHARD's n_valid; multiplying by n recovers the raw sums, which
    psum correctly across row shards — the whole exchange is ~42 floats
    per iteration (21 H + 6 b + 5 scalars, padded), riding ICI.
    """
    n = res.n_valid
    N = jnp.maximum(jax.lax.psum(n, axis_name), 1.0)

    def mean(x):
        return jax.lax.psum(x * n, axis_name) / N

    return IrlsResult(
        H=mean(res.H),
        b=mean(res.b),
        sigma2_int=jnp.maximum(mean(res.sigma2_int), 1e-12),
        sigma2_xi=jnp.maximum(mean(res.sigma2_xi), 1e-12),
        error=mean(res.error),
        n_valid=jax.lax.psum(n, axis_name),
        inlier_frac=mean(res.inlier_frac),
    )


def residuals_and_normal_eq(
    T: jax.Array,
    kf_int: jax.Array,
    kf_points: tuple,
    kf_mask: jax.Array,
    jac12: jax.Array,
    cur_int: jax.Array,
    cur_xi: jax.Array,
    cur_mask: jax.Array,
    intr: Intrinsics,
    nu: float,
    sigma2_int,
    sigma2_xi,
    sigma_iters: int,
    use_geometric: bool = True,
    gate_sigmas: float = 3.0,
    sigma_mode: str = "exact",
    stacked_gather=None,
) -> IrlsResult:
    """One IRLS evaluation: warp, sample, weight, reduce to (H, b).

    Pure XLA version (K5+K6+K7). The Pallas fused kernel A' implements the
    identical contract (tested against this function). sigma_mode: see
    the Pallas twin — "lagged" weights with the incoming sigma and emits
    the updated sigma for the next iteration.
    """
    Px, Py, Pz = kf_points
    up, vp, rho, front = transform_project(Px, Py, Pz, T, intr)
    # One 4-corner-gather pass for all three current-frame planes.
    cur_stack = jnp.stack([cur_int, cur_xi, cur_mask])
    i_s, xi_s, mask_ok, inb = sample_tracker_planes(
        cur_stack, up, vp, stacked_gather
    )
    valid = kf_mask * front * inb * mask_ok
    r_i = (i_s - kf_int) * valid
    r_x = (xi_s - rho) * valid

    if sigma_mode == "exact":
        sigma2_int = student_t_sigma2(r_i * r_i, valid, nu, sigma2_int, sigma_iters)
        if use_geometric:
            sigma2_xi = student_t_sigma2(
                r_x * r_x, valid, nu, sigma2_xi, sigma_iters
            )
    w_i = (nu + 1.0) / (nu + r_i * r_i / sigma2_int) * valid / sigma2_int
    w_x = (nu + 1.0) / (nu + r_x * r_x / sigma2_xi) * valid / sigma2_xi

    n_valid = jnp.sum(valid)
    # Normalize the normal equations by the pixel count: delta is unchanged
    # but H entries stay O(1/sigma^2) instead of O(n/sigma^2) ~ 1e12, which
    # keeps the f32 Cholesky well-conditioned on TPU.
    inv_n = 1.0 / jnp.maximum(n_valid, 1.0)
    jac12 = jac12.astype(jnp.float32)  # fused upcast (bf16 storage)
    ji = jac12[:6].reshape(6, -1)
    wi = w_i.reshape(-1) * inv_n
    H = (ji * wi[None, :]) @ ji.T
    b = ji @ (wi * r_i.reshape(-1))
    if use_geometric:
        jx = jac12[6:].reshape(6, -1)
        wx = w_x.reshape(-1) * inv_n
        H = H + (jx * wx[None, :]) @ jx.T
        b = b + jx @ (wx * r_x.reshape(-1))
    # The geometric channel contributes to error/sigma only when it
    # contributes to the solve (a disabled channel's residuals would
    # otherwise dominate the reported error on bad-depth scenes).
    err = jnp.sum(w_i * r_i * r_i)
    if use_geometric:
        err = err + jnp.sum(w_x * r_x * r_x)
    err = err / jnp.maximum(n_valid, 1.0)
    inl = jnp.sum(
        valid * (r_i * r_i < gate_sigmas**2 * sigma2_int)
    ) / jnp.maximum(n_valid, 1.0)
    if sigma_mode != "exact":
        # Emit the updated scale for the NEXT iteration (lagged).
        n1 = jnp.maximum(n_valid, 1.0)
        w0i = (nu + 1.0) / (nu + r_i * r_i / sigma2_int)
        sigma2_int = jnp.maximum(jnp.sum(valid * w0i * r_i * r_i) / n1, 1e-12)
        if use_geometric:
            w0x = (nu + 1.0) / (nu + r_x * r_x / sigma2_xi)
            sigma2_xi = jnp.maximum(
                jnp.sum(valid * w0x * r_x * r_x) / n1, 1e-12
            )
    return IrlsResult(H, b, sigma2_int, sigma2_xi, err, n_valid, inl)


def _esm_pointwise(
    T: jax.Array,
    kf_int: jax.Array,
    kf_points: tuple,
    kf_mask: jax.Array,
    kf_grads: jax.Array,
    cur_stack: jax.Array,
    intr: Intrinsics,
    nu: float,
    sigma2_int,
    sigma2_xi,
    use_geometric: bool,
    gate_sigmas: float,
    occlusion_gate: bool,
    gate_cap2: float = 0.0,
    stacked_gather=None,
):
    """Shared per-pixel ESM math: warp, sample, residuals, occlusion
    gate, Student-t weights, warp/prediction Jacobians, ESM gradient
    averaging, channel Jacobians. ONE implementation feeds both the
    per-frame IRLS twin (esm_residuals_and_normal_eq) and the consensus
    vote's stratified reduction (stratified_normal_eq) — the vote's
    premise is evaluating the same model as the tracker, and this is the
    trickiest math in the repo (the exact-jrho fix once had to be applied
    to hand-synced copies; the Pallas kernel remains the one deliberate
    twin, pinned by exact-equality tests).

    Returns (Ji, Jx|None, ju, jv, w_i, w_x, r_i, r_x, valid).
    """
    from .warp import sample_stack7, transform_project

    # Stack layout dispatch by channel count (trace-time static):
    #   >=7: [I, xi, mask, gxI, gyI, gxXi, gyXi] — ESM averaging on both
    #        channels (levels >= esm_geo_min_level);
    #   5:   [I, xi, mask, gxI, gyI] — averaging on intensity only, the
    #        geometric channel uses template gradients (opt-in per-level
    #        via esm_geo_min_level; measured accuracy negative as a
    #        default — see config.TrackingConfig);
    #   3:   [I, xi, mask] — template gradients for both channels (fine
    #        levels below esm_min_level).
    n_ch = cur_stack.shape[0]
    avg_grads = n_ch >= 7
    avg_int = n_ch >= 5
    # Storage may be bf16 (TrackingConfig.plane_dtype); all math is f32.
    Px, Py, Pz = (p.astype(jnp.float32) for p in kf_points)
    kf_int = kf_int.astype(jnp.float32)
    up, vp, rho, front = transform_project(Px, Py, Pz, T, intr)
    samples, mask_ok, inb = sample_stack7(cur_stack, up, vp, stacked_gather)
    i_s, xi_s = samples[0], samples[1]
    valid = kf_mask * front * inb * mask_ok
    r_i = (i_s - kf_int) * valid
    r_x = (xi_s - rho) * valid
    # Occluded/dynamic pixels (inverse-depth residual beyond the gate) are
    # removed from BOTH channels' WEIGHTS — see TrackingConfig.occlusion_gate.
    # Crucially, the gate applies ONLY to the normal equations: sigma
    # statistics, n_valid, and inlier diagnostics use the ungated set
    # (gating the sigma update truncates the residual distribution, the
    # scale then shrinks every iteration and the gate spirals until ~a
    # third of a perfectly static scene is excluded — measured).
    # The gate is WIDE — (2*gate_sigmas)^2 * sigma^2 PLUS an absolute
    # inverse-depth floor (0.05 1/m)^2: occluders/dynamics disagree with
    # the template by 0.1-0.5 1/m while inlier noise is ~0.01, so the
    # floor keeps the gate from ever truncating legitimate residual tails
    # when sigma_xi collapses to the sensor level (measured: a
    # 3-sigma-only gate biased geometry-only scenes by ~1.5 cm).
    if occlusion_gate and use_geometric:
        thresh = (2.0 * gate_sigmas) ** 2 * sigma2_xi + 0.05**2
        # HARD CAP (round-3 ballistic fix; TrackingConfig.occ_gate_cap):
        # the adaptive term balloons exactly when a fast mover is
        # dragging the pose (contamination inflates sigma_xi -> the gate
        # opens to ~0.3 1/m and the mover's 0.15-0.46 1/m inverse-depth
        # disagreement sails through). A fast mover outruns its own
        # TEMPLATE-stratum mask (it covers fresh background every frame),
        # so the only per-pixel signal left at its CURRENT position is
        # this gate. The caller caps the finest level only: by level 0
        # the pose is sub-pixel and genuine residual spread is at the
        # noise floor (measured ~0.01 1/m), while coarse levels keep the
        # adaptive width so real misalignment can still be pulled in.
        # jnp.where, not a Python `if`: keeps the cap traceable (the
        # Pallas twin reads it from SMEM the same way), so a jitted
        # caller may sweep it.
        thresh = jnp.where(
            gate_cap2 > 0.0, jnp.minimum(thresh, gate_cap2), thresh
        )
        w_gate = (r_x * r_x <= thresh).astype(jnp.float32)
    else:
        w_gate = 1.0

    w_i = (nu + 1.0) / (nu + r_i * r_i / sigma2_int) * valid * w_gate / sigma2_int
    w_x = (nu + 1.0) / (nu + r_x * r_x / sigma2_xi) * valid * w_gate / sigma2_xi

    # Warp Jacobian at the template points (identity perturbation).
    iz = 1.0 / jnp.maximum(Pz, 1e-6)
    iz2 = iz * iz
    ju = (
        intr.fx * iz,
        jnp.zeros_like(Px),
        -intr.fx * Px * iz2,
        -intr.fx * Px * Py * iz2,
        intr.fx * (1.0 + Px * Px * iz2),
        -intr.fx * Py * iz,
    )
    jv = (
        jnp.zeros_like(Px),
        intr.fy * iz,
        -intr.fy * Py * iz2,
        -intr.fy * (1.0 + Py * Py * iz2),
        intr.fy * Px * Py * iz2,
        intr.fy * Px * iz,
    )
    # EXACT prediction Jacobian for the geometric channel:
    # d rho(T exp(d) P)/dd = -rho'^2 [r3 | P x r3] with r3 = T's third
    # rotation row and rho' the predicted inverse depth. The T~I
    # approximation (-xi^2 [0,0,1,Y,-X,0]) stalls the geometric-only
    # case at moderate motion (textureless scenes); the exact form costs
    # a few extra multiplies.
    R = T[:3, :3]
    rho2 = rho * rho
    jrho = (
        -rho2 * R[2, 0],
        -rho2 * R[2, 1],
        -rho2 * R[2, 2],
        -rho2 * (Py * R[2, 2] - Pz * R[2, 1]),
        -rho2 * (Pz * R[2, 0] - Px * R[2, 2]),
        -rho2 * (Px * R[2, 1] - Py * R[2, 0]),
    )
    kfg = kf_grads.astype(jnp.float32)
    if avg_grads:
        gx_i_e = 0.5 * (kfg[0] + samples[3])
        gy_i_e = 0.5 * (kfg[1] + samples[4])
        gx_x_e = 0.5 * (kfg[2] + samples[5])
        gy_x_e = 0.5 * (kfg[3] + samples[6])
    elif avg_int:
        gx_i_e = 0.5 * (kfg[0] + samples[3])
        gy_i_e = 0.5 * (kfg[1] + samples[4])
        gx_x_e, gy_x_e = kfg[2], kfg[3]
    else:
        gx_i_e, gy_i_e, gx_x_e, gy_x_e = kfg[0], kfg[1], kfg[2], kfg[3]
    Ji = [gx_i_e * ju[k] + gy_i_e * jv[k] for k in range(6)]
    Jx = None
    if use_geometric:
        Jx = [gx_x_e * ju[k] + gy_x_e * jv[k] - jrho[k] for k in range(6)]
    return Ji, Jx, ju, jv, w_i, w_x, r_i, r_x, valid



def esm_residuals_and_normal_eq(
    T: jax.Array,
    kf_int: jax.Array,
    kf_points: tuple,
    kf_mask: jax.Array,
    kf_grads: jax.Array,  # (4, H, W): gxI, gyI, gxXi, gyXi of the template
    cur_stack7: jax.Array,  # (7|5|3, H, W): [I,xi,mask(,gxI,gyI(,gxXi,gyYi))] — see _esm_pointwise
    intr: Intrinsics,
    nu: float,
    sigma2_int,
    sigma2_xi,
    use_geometric: bool = True,
    gate_sigmas: float = 3.0,
    occlusion_gate: bool = False,
    gate_cap: float = 0.0,
    stacked_gather=None,
) -> IrlsResult:
    """ESM variant (XLA twin of the Pallas ESM kernel).

    Jacobians use the AVERAGE of template and warped-current gradients
    (Efficient Second-order Minimization) dotted with the warp Jacobian
    recomputed from the precomputed template points — no (12, H, W)
    Jacobian field exists at all, so keyframe templates carry only 4
    gradient planes and fusion never rebuilds Jacobians. Convergence per
    iteration is near-second-order (vs first-order IC), so coarse levels
    need fewer iterations. Sigma update is lagged (single pass).

    When ``cur_stack7`` has only 3 channels ([I, xi, mask]) the TEMPLATE
    gradients are used alone (first-order; the fine-level mode of
    config.TrackingConfig.esm_min_level) — the contract is otherwise
    identical.
    """
    (
        Ji, Jx, _ju, _jv, w_i, w_x, r_i, r_x, valid
    ) = _esm_pointwise(
        T, kf_int, kf_points, kf_mask, kf_grads, cur_stack7, intr, nu,
        sigma2_int, sigma2_xi, use_geometric, gate_sigmas, occlusion_gate,
        gate_cap2=gate_cap * gate_cap, stacked_gather=stacked_gather,
    )

    n_valid = jnp.sum(valid)
    inv_n = 1.0 / jnp.maximum(n_valid, 1.0)
    H = jnp.zeros((6, 6), jnp.float32)
    b = jnp.zeros((6,), jnp.float32)
    for a in range(6):
        for c in range(a, 6):
            s = jnp.sum(w_i * Ji[a] * Ji[c]) * inv_n
            if use_geometric:
                s = s + jnp.sum(w_x * Jx[a] * Jx[c]) * inv_n
            H = H.at[a, c].set(s)
            H = H.at[c, a].set(s)
        sb = jnp.sum(w_i * Ji[a] * r_i) * inv_n
        if use_geometric:
            sb = sb + jnp.sum(w_x * Jx[a] * r_x) * inv_n
        b = b.at[a].set(sb)

    # Disabled-channel terms stay out of error/sigma (see the IC twin).
    err = jnp.sum(w_i * r_i * r_i)
    if use_geometric:
        err = err + jnp.sum(w_x * r_x * r_x)
    err = err * inv_n
    inl = jnp.sum(valid * (r_i * r_i < gate_sigmas**2 * sigma2_int)) * inv_n
    # Lagged sigma update for the next iteration.
    w0i = (nu + 1.0) / (nu + r_i * r_i / sigma2_int)
    s2i = jnp.maximum(jnp.sum(valid * w0i * r_i * r_i) * inv_n, 1e-12)
    if use_geometric:
        w0x = (nu + 1.0) / (nu + r_x * r_x / sigma2_xi)
        s2x = jnp.maximum(jnp.sum(valid * w0x * r_x * r_x) * inv_n, 1e-12)
    else:
        s2x = sigma2_xi
    return IrlsResult(H, b, s2i, s2x, err, n_valid, inl)


def stratified_normal_eq(
    T: jax.Array,
    kf_int: jax.Array,
    kf_points: tuple,
    kf_mask: jax.Array,
    kf_grads: jax.Array,  # (4, H, W) template gradients (ESM storage)
    cur_stack: jax.Array,  # (3+, H, W) [I, xi, mask, ...] current planes
    intr: Intrinsics,
    nu: float,
    sigma2_int,
    sigma2_xi,
    strata: jax.Array,  # (K, H, W) one-hot stratum membership (f32)
    use_geometric: bool = True,
    gate_sigmas: float = 3.0,
    occlusion_gate: bool = True,
    axis_name: str | None = None,
    stacked_gather=None,
):
    """Depth-stratified normal equations: one (H_k, b_k, n_k) per stratum.

    The motion-consensus check (tracking/consensus.py) needs to know what
    pose correction each DEPTH BAND of the template would individually
    ask for at the converged pose: a coherently moving, information-
    dominant foreground object (warp Jacobians scale as 1/z^2) drags the
    global solve, and per-pixel robust weighting cannot see it because
    the object is self-consistent — but it lives in different depth
    strata than the static background, and its strata disagree with the
    pixel-count majority about the pose. This is the segmentation signal
    the reference (and all non-segmenting dense VO) lacks.

    Math mirrors esm_residuals_and_normal_eq at the same level (ESM
    gradient averaging when the stack has 7 channels, the occlusion
    gate, exact prediction Jacobian), reduced PER STRATUM: the 21 H +
    6 b + 1 count + 1 error + 21 geometry-Gram per-pixel quantity planes
    are flattened into an (N, 50) matrix and hit with the (K, N) one-hot
    stratum matrix — one matmul instead of K full reductions. Returns
    RAW sums (information matrices, not per-pixel means): (K, 6, 6) H,
    (K, 6) b, (K,) n, (K, 6, 6) G, (K,) err.
    """
    (
        Ji, Jx, ju, jv, w_i, w_x, r_i, r_x, valid
    ) = _esm_pointwise(
        T, kf_int, kf_points, kf_mask, kf_grads, cur_stack, intr, nu,
        sigma2_int, sigma2_xi, use_geometric, gate_sigmas, occlusion_gate,
        stacked_gather=stacked_gather,
    )

    cols = []
    idx = []
    for a in range(6):
        for c in range(a, 6):
            q = w_i * Ji[a] * Ji[c]
            if use_geometric:
                q = q + w_x * Jx[a] * Jx[c]
            cols.append(q)
            idx.append((a, c))
    for a in range(6):
        q = w_i * Ji[a] * r_i
        if use_geometric:
            q = q + w_x * Jx[a] * r_x
        cols.append(q)
    cols.append(valid)
    # Per-stratum weighted error: with fixed sigmas, a stratum whose
    # content has moved beyond the linearization basin (fast mover) shows
    # DECORRELATED residuals — its Student-t-weighted error saturates at
    # ~(nu+1) per pixel while aligned strata sit near (r/sigma)^2 << 1.
    # The consensus error-outlier test keys on this (the delta vote alone
    # cannot see a basin-escaped mover: its gradients decorrelate and its
    # b_k collapses to noise — measured).
    cols.append(w_i * r_i * r_i + (w_x * r_x * r_x if use_geometric else 0.0))
    # Geometry Gram G = sum valid (Ju Ju^T + Jv Jv^T): the UNWEIGHTED,
    # texture-free warp-Jacobian outer product. d^T (G/n) d is the mean
    # squared image flow (pixels^2) a twist d induces on the stratum —
    # the consensus vote compares hypotheses in this metric, because a
    # mover's coarse-level IMAGE information can be blurred away while
    # its geometric flow disagreement is resolution-independent.
    for a in range(6):
        for c in range(a, 6):
            cols.append(valid * (ju[a] * ju[c] + jv[a] * jv[c]))
    Q = jnp.stack([c.reshape(-1) for c in cols], axis=1)  # (N, 50)
    S = strata.reshape(strata.shape[0], -1)  # (K, N)
    out = S @ Q  # (K, 50)
    if axis_name is not None:
        out = jax.lax.psum(out, axis_name)

    K = strata.shape[0]
    Hk = jnp.zeros((K, 6, 6), jnp.float32)
    Gk = jnp.zeros((K, 6, 6), jnp.float32)
    for j, (a, c) in enumerate(idx):
        Hk = Hk.at[:, a, c].set(out[:, j])
        Gk = Gk.at[:, a, c].set(out[:, 29 + j])
        if a != c:
            Hk = Hk.at[:, c, a].set(out[:, j])
            Gk = Gk.at[:, c, a].set(out[:, 29 + j])
    bk = out[:, 21:27]
    nk = out[:, 27]
    ek = out[:, 28]
    return Hk, bk, nk, Gk, ek


def ic_update(T: jax.Array, H: jax.Array, b: jax.Array, damping: float, n_valid):
    """delta = solve(H + lambda I, b); T <- T . exp(-delta) (on device).

    If too few pixels were valid, the update is suppressed (masked no-op) —
    the fixed-shape equivalent of the reference's frame rejection.
    """
    Hd = H + damping * jnp.eye(6, dtype=H.dtype)
    delta = jax.scipy.linalg.cho_solve(jax.scipy.linalg.cho_factor(Hd), b)
    ok = (n_valid > 100.0) & jnp.all(jnp.isfinite(delta))
    delta = jnp.where(ok, delta, jnp.zeros_like(delta))
    # Re-project onto SE(3): fp32 compose chains drift R off SO(3), and a
    # non-rigid defect is invisible to the rigid optimizer (see se3.py).
    return se3.orthonormalize(T @ se3.exp(-delta)), delta
