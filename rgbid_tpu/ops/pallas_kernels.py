"""Pallas fused kernels for the IRLS hot path (kernel A' = K5+K6+K7).

The gather half of K5 (bilinear warp sampling) stays in XLA — Pallas
cannot lower dynamic per-pixel gathers on this platform (SURVEY.md §7
stance 3, measured) — and the gather-free per-pixel pipeline is fused
here into two VPU kernels that each read the pixel planes exactly once:

* ``_sigma_kernel``: partial sums for the Student-t scale fixed point
  (sum of w(sigma_old) * r^2 per channel + valid count).
* ``_normal_kernel``: Student-t weights + the 21-entry upper-triangular
  J^T W J, 6-entry J^T W r, weighted error, inlier count — one pass over
  the 5 residual planes + 12 Jacobian planes, accumulated across row-tile
  grid steps into a single (1, 128) output block.

Kernel A-ESM (the default path) additionally recomputes the warp
Jacobians in-kernel from precomputed template points and averages
template/current gradients — no Jacobian field input at all. Kernel B
fuses the gather-free half of inverse-depth fusion (K8+K9).

Every kernel implements exactly the contract of its XLA twin in
ops.gauss_newton / mapping.fusion; equivalence is enforced by tests. On
non-TPU backends the kernels run in interpreter mode so the whole suite
exercises them.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.camera import Intrinsics
from .gauss_newton import IrlsResult
from .warp import sample_stack7, sample_tracker_planes, transform_project

_TRI = [(a, b) for a in range(6) for b in range(a, 6)]  # 21 upper-tri pairs


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _tile_rows(h: int, w: int = 640, planes: int = 8, mult: int = 8) -> int:
    """Row-tile height: divides h, multiple of `mult`, sized so the
    kernel's resident VMEM (all input planes x double buffering) stays
    within budget. v5e scoped VMEM is 16 MB; target <=8 MB of tile inputs
    so compiler scratch and the output block always fit (a 17-plane ESM
    tile at 120x640 measured 17.7 MB and OOM'd on real Mosaic).

    `mult` is the sublane granularity of the NARROWEST input dtype: 8
    rows for f32, 16 for bf16 (Mosaic min tile (16, 128)) — a 120-row
    f32-legal tile mis-tiles bf16 refs on real hardware (code-review
    round 3). Callers guarantee h % mult == 0 via _pad_rows, so the
    final fallback of `mult` always divides and a full-height
    (VMEM-overflowing) block never occurs.
    """
    budget = int(8e6 / max(w * planes * 4 * 2, 1))
    for t in (120, 96, 80, 64, 60, 48, 40, 32, 24, 16, 8):
        if t % mult == 0 and t <= max(budget, mult) and h % t == 0:
            return t
    return h


def _pad_rows(arrs, h, mult: int = 8):
    """Zero-pad (…, H, W) planes to H multiple of `mult` (zero rows carry
    valid=0 and contribute nothing to any reduction)."""
    pad = (-h) % mult
    if pad == 0:
        return arrs, h
    out = []
    for a in arrs:
        widths = [(0, 0)] * (a.ndim - 2) + [(0, pad), (0, 0)]
        out.append(jnp.pad(a, widths))
    return out, h + pad


# ---------------------------------------------------------------------------
# Kernel S: sigma sufficient statistics


def _sigma_kernel(s2_ref, i_s_ref, xi_s_ref, rho_ref, kf_int_ref, valid_ref, out_ref, *, nu):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    valid = valid_ref[:]
    r_i = (i_s_ref[:] - kf_int_ref[:]) * valid
    r_x = (xi_s_ref[:] - rho_ref[:]) * valid
    s2i = s2_ref[0, 0]
    s2x = s2_ref[0, 1]
    w_i = (nu + 1.0) / (nu + r_i * r_i / s2i)
    w_x = (nu + 1.0) / (nu + r_x * r_x / s2x)
    p0 = jnp.sum(valid * w_i * r_i * r_i)
    p1 = jnp.sum(valid * w_x * r_x * r_x)
    p2 = jnp.sum(valid)
    partial = jnp.stack([p0, p1, p2])
    out_ref[0, 0:3] = out_ref[0, 0:3] + partial


def sigma_stats(i_s, xi_s, rho, kf_int, valid, s2i, s2x, nu: float):
    """Returns (sum w(s2)*r_i^2, sum w(s2)*r_x^2, n_valid) over all pixels."""
    h, w = i_s.shape
    (i_s, xi_s, rho, kf_int, valid), h = _pad_rows([i_s, xi_s, rho, kf_int, valid], h)
    th = _tile_rows(h, w, planes=5)
    grid = h // th
    spec = pl.BlockSpec((th, w), lambda i: (i, 0), memory_space=pltpu.VMEM)
    s2 = jnp.stack([s2i, s2x]).reshape(1, 2).astype(jnp.float32)
    out = pl.pallas_call(
        functools.partial(_sigma_kernel, nu=nu),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
            spec, spec, spec, spec, spec,
        ],
        out_specs=pl.BlockSpec((1, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        interpret=_interpret(),
    )(s2, i_s, xi_s, rho, kf_int, valid)
    return out[0, 0], out[0, 1], out[0, 2]


# ---------------------------------------------------------------------------
# Kernel A: fused residual + weight + normal-equation reduction


def _normal_kernel(
    s2_ref, i_s_ref, xi_s_ref, rho_ref, kf_int_ref, valid_ref, jac_ref, out_ref,
    *, nu, gate2, use_geometric,
):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    valid = valid_ref[:]
    r_i = (i_s_ref[:] - kf_int_ref[:]) * valid
    r_x = (xi_s_ref[:] - rho_ref[:]) * valid
    s2i = s2_ref[0, 0]
    s2x = s2_ref[0, 1]
    w_i = (nu + 1.0) / (nu + r_i * r_i / s2i) * valid / s2i
    w_x = (nu + 1.0) / (nu + r_x * r_x / s2x) * valid / s2x

    # Load the 12 Jacobian planes once, upcasting bf16 -> f32 in VMEM.
    J = [jac_ref[k].astype(jnp.float32) for k in range(12 if use_geometric else 6)]
    sums = []
    # 21 upper-triangular H entries, both channels fused.
    for a, b in _TRI:
        s = jnp.sum(w_i * J[a] * J[b])
        if use_geometric:
            s = s + jnp.sum(w_x * J[6 + a] * J[6 + b])
        sums.append(s)
    # 6 b entries.
    for a in range(6):
        s = jnp.sum(w_i * J[a] * r_i)
        if use_geometric:
            s = s + jnp.sum(w_x * J[6 + a] * r_x)
        sums.append(s)
    # err, inlier count, n_valid (disabled-channel terms stay out of the
    # error — mirrors the XLA twin's use_geometric gating).
    err_sum = jnp.sum(w_i * r_i * r_i)
    if use_geometric:
        err_sum = err_sum + jnp.sum(w_x * r_x * r_x)
    sums.append(err_sum)
    sums.append(jnp.sum(valid * (r_i * r_i < gate2 * s2i)))
    sums.append(jnp.sum(valid))
    # Student-t scale sufficient statistics (for the next iteration's
    # lagged sigma update): sum of w0(s2_old) * r^2, w0 WITHOUT the 1/s2
    # normalization.
    sums.append(jnp.sum(valid * ((nu + 1.0) / (nu + r_i * r_i / s2i)) * r_i * r_i))
    sums.append(jnp.sum(valid * ((nu + 1.0) / (nu + r_x * r_x / s2x)) * r_x * r_x))
    partial = jnp.stack(sums)  # (32,)
    out_ref[0, 0:32] = out_ref[0, 0:32] + partial


def normal_eq(
    i_s, xi_s, rho, kf_int, valid, jac12, s2i, s2x, nu: float, gate_sigmas: float,
    use_geometric: bool,
):
    """Fused weights + J^T W J / J^T W r reduction. Returns raw sums:
    (H (6,6), b (6,), err_sum, inlier_sum, n_valid)."""
    h, w = i_s.shape
    (i_s, xi_s, rho, kf_int, valid, jac12), h = _pad_rows(
        [i_s, xi_s, rho, kf_int, valid, jac12], h
    )
    th = _tile_rows(h, w, planes=5 + 12)
    grid = h // th
    spec = pl.BlockSpec((th, w), lambda i: (i, 0), memory_space=pltpu.VMEM)
    jspec = pl.BlockSpec((12, th, w), lambda i: (0, i, 0), memory_space=pltpu.VMEM)
    s2 = jnp.stack([s2i, s2x]).reshape(1, 2).astype(jnp.float32)
    out = pl.pallas_call(
        functools.partial(
            _normal_kernel, nu=nu, gate2=gate_sigmas**2, use_geometric=use_geometric
        ),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
            spec, spec, spec, spec, spec, jspec,
        ],
        out_specs=pl.BlockSpec((1, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        interpret=_interpret(),
    )(s2, i_s, xi_s, rho, kf_int, valid, jac12)

    tri = out[0, 0:21]
    H = jnp.zeros((6, 6), jnp.float32)
    for k, (a, b) in enumerate(_TRI):
        H = H.at[a, b].set(tri[k])
        H = H.at[b, a].set(tri[k])
    b_vec = out[0, 21:27]
    return H, b_vec, out[0, 27], out[0, 28], out[0, 29], out[0, 30], out[0, 31]


# ---------------------------------------------------------------------------
# Drop-in replacement for gauss_newton.residuals_and_normal_eq


def residuals_and_normal_eq_pallas(
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
    """Identical contract to the XLA twin; fused Pallas reductions.

    sigma_mode "exact": update sigma from THIS iteration's residuals
    before weighting (two kernel passes — matches the numpy oracle).
    sigma_mode "lagged": weights use the incoming sigma and the updated
    sigma (same sufficient statistics, ONE kernel pass) is returned for
    the next iteration — standard IRLS interleaving with the same fixed
    point, at half the dispatches.
    """
    Px, Py, Pz = kf_points
    up, vp, rho, front = transform_project(Px, Py, Pz, T, intr)
    # One 4-corner-gather pass for all three current-frame planes.
    cur_stack = jnp.stack([cur_int, cur_xi, cur_mask])
    i_s, xi_s, mask_ok, inb = sample_tracker_planes(
        cur_stack, up, vp, stacked_gather
    )
    valid = kf_mask * front * inb * mask_ok

    if sigma_mode == "exact":
        for _ in range(max(sigma_iters, 1)):
            swi, swx, n = sigma_stats(
                i_s, xi_s, rho, kf_int, valid, sigma2_int, sigma2_xi, nu
            )
            n = jnp.maximum(n, 1.0)
            sigma2_int = jnp.maximum(swi / n, 1e-12)
            if use_geometric:
                sigma2_xi = jnp.maximum(swx / n, 1e-12)

    H, b, err_sum, inl_sum, n_valid, swi, swx = normal_eq(
        i_s, xi_s, rho, kf_int, valid, jac12, sigma2_int, sigma2_xi,
        nu, gate_sigmas, use_geometric,
    )
    inv_n = 1.0 / jnp.maximum(n_valid, 1.0)
    if sigma_mode != "exact":
        sigma2_int = jnp.maximum(swi * inv_n, 1e-12)
        if use_geometric:
            sigma2_xi = jnp.maximum(swx * inv_n, 1e-12)
    return IrlsResult(
        H=H * inv_n,
        b=b * inv_n,
        sigma2_int=sigma2_int,
        sigma2_xi=sigma2_xi,
        error=err_sum * inv_n,
        n_valid=n_valid,
        inlier_frac=inl_sum * inv_n,
    )


# ---------------------------------------------------------------------------
# Kernel B: fused inverse-depth fusion + uncertainty propagation (K8+K9)


def _fusion_kernel(
    par_ref, up_ref, vp_ref, xi_obs_ref, valid_ref, kf_xi_ref, kf_var_ref,
    kf_mask_ref, guess_ref, gmask_ref,
    xi_out_ref, var_out_ref, fuse_out_ref, claim_out_ref, n_ref,
):
    """Gather-free half of the fusion pipeline (one VPU pass), including
    the gather-form validity growth (K8 "update validity": hole pixels
    warped along a coarse-pyramid guess claim consistent observations).

    par layout (SMEM, (1, 32) f32):
      0:9   R_kc row-major, 9:12 t_kc,
      12:15 cov3 row 0, 15:18 row 1, 18:21 row 2 (translation/rot-xy block
            of the pose covariance in the [z, wx, wy] subspace used by the
            jacobian J = -xi^2 [0,0,1,Yk,-Xk,0]),
      21 inv_fx, 22 inv_fy, 23 cx, 24 cy,
      25 sensor_var, 26 gate_k^2, 27 min_var, 28 max_var,
      29 claim_tol, 30 claim_var_inflation (0 = growth disabled).
    """
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        n_ref[:] = jnp.zeros_like(n_ref)

    p = par_ref
    up = up_ref[:]
    vp = vp_ref[:]
    xi_obs_cur = xi_obs_ref[:]
    valid = valid_ref[:] * (xi_obs_cur > 1e-6)
    kf_xi = kf_xi_ref[:]
    kf_var = kf_var_ref[:]
    kf_mask = kf_mask_ref[:]

    zc = 1.0 / jnp.maximum(xi_obs_cur, 1e-6)
    dir_x = (up - p[0, 23]) * p[0, 21]
    dir_y = (vp - p[0, 24]) * p[0, 22]
    Xk = (p[0, 0] * dir_x + p[0, 1] * dir_y + p[0, 2]) * zc + p[0, 9]
    Yk = (p[0, 3] * dir_x + p[0, 4] * dir_y + p[0, 5]) * zc + p[0, 10]
    Zk = (p[0, 6] * dir_x + p[0, 7] * dir_y + p[0, 8]) * zc + p[0, 11]
    valid = valid * (Zk > 1e-6)
    xi_obs_kf = jnp.where(valid > 0, 1.0 / jnp.maximum(Zk, 1e-6), 0.0)

    r3dir = p[0, 6] * dir_x + p[0, 7] * dir_y + p[0, 8]
    dxi = r3dir / (jnp.maximum(Zk, 1e-6) ** 2 * jnp.maximum(xi_obs_cur, 1e-6) ** 2)
    var_sensor = dxi * dxi * p[0, 25]
    xi2 = xi_obs_kf * xi_obs_kf
    j2, j3, j4 = -xi2, -xi2 * Yk, xi2 * Xk
    var_pose = (
        j2 * (p[0, 12] * j2 + p[0, 13] * j3 + p[0, 14] * j4)
        + j3 * (p[0, 15] * j2 + p[0, 16] * j3 + p[0, 17] * j4)
        + j4 * (p[0, 18] * j2 + p[0, 19] * j3 + p[0, 20] * j4)
    )
    var_obs = jnp.maximum(var_sensor + var_pose, p[0, 27])

    resid = xi_obs_kf - kf_xi
    gate = (resid * resid <= p[0, 26] * (kf_var + var_obs)).astype(jnp.float32)
    fuse_mask = valid * kf_mask * gate
    k_gain = kf_var / jnp.maximum(kf_var + var_obs, 1e-12)
    xi_new = jnp.where(fuse_mask > 0, kf_xi + k_gain * resid, kf_xi)
    var_new = jnp.where(fuse_mask > 0, (1.0 - k_gain) * kf_var, kf_var)
    # Validity growth: hole pixel + guess-consistent observation -> claim.
    guess = guess_ref[:]
    gmask = gmask_ref[:]
    consistent = (jnp.abs(xi_obs_kf - guess) <= p[0, 29]).astype(jnp.float32)
    claim = (
        (kf_mask < 0.5).astype(jnp.float32)
        * gmask
        * valid
        * consistent
        * (p[0, 30] > 0.0).astype(jnp.float32)
    )
    xi_new = jnp.where(claim > 0, xi_obs_kf, xi_new)
    var_new = jnp.where(claim > 0, p[0, 30] * var_obs, var_new)
    xi_out_ref[:] = xi_new
    var_out_ref[:] = jnp.clip(var_new, p[0, 27], p[0, 28])
    # Per-pixel fuse/claim flags drive hit counts + validity (K8 contract).
    fuse_out_ref[:] = fuse_mask
    claim_out_ref[:] = claim
    # Vector store (Mosaic cannot store scalars to VMEM on this platform).
    n_ref[0, 0:1] = n_ref[0, 0:1] + jnp.sum(fuse_mask)[None]


def fusion_pallas(
    up, vp, xi_obs_cur, valid, kf_xi, kf_var, kf_mask, T_kc, pose_cov, intr,
    cfg, guess=None, gmask=None,
):
    """Kernel-B wrapper (pre-gathered inputs).

    Returns (xi', var', fuse_mask, claim_mask, n_fused) — fuse_mask feeds
    hit counts, claim_mask the validity growth. Pass guess=None to
    disable growth (claim_mask all zero).
    """
    h0, w = kf_xi.shape
    grow = guess is not None
    if not grow:
        guess = jnp.zeros_like(kf_xi)
        gmask = jnp.zeros_like(kf_xi)
    (up, vp, xi_obs_cur, valid, kf_xi, kf_var, kf_mask, guess, gmask), h = (
        _pad_rows(
            [up, vp, xi_obs_cur, valid, kf_xi, kf_var, kf_mask, guess, gmask],
            h0,
        )
    )
    th = _tile_rows(h, w, planes=13)
    grid = h // th
    spec = pl.BlockSpec((th, w), lambda i: (i, 0), memory_space=pltpu.VMEM)
    R, t = T_kc[:3, :3], T_kc[:3, 3]
    par = jnp.concatenate(
        [
            R.reshape(-1),
            t,
            pose_cov[2:5, 2:5].reshape(-1),
            jnp.asarray(
                [
                    1.0 / intr.fx,
                    1.0 / intr.fy,
                    intr.cx,
                    intr.cy,
                    cfg.sensor_sigma_xi**2,
                    cfg.gate_k**2,
                    cfg.min_variance,
                    cfg.max_variance,
                    getattr(cfg, "claim_tol", 0.08),
                    getattr(cfg, "claim_var_inflation", 4.0) if grow else 0.0,
                ],
                jnp.float32,
            ),
            jnp.zeros(1, jnp.float32),
        ]
    ).reshape(1, 32)
    xi_new, var_new, fuse_mask, claim_mask, n = pl.pallas_call(
        _fusion_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, 32), lambda i: (0, 0), memory_space=pltpu.SMEM),
            spec, spec, spec, spec, spec, spec, spec, spec, spec,
        ],
        out_specs=(
            spec,
            spec,
            spec,
            spec,
            pl.BlockSpec((1, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((h, w), jnp.float32),
            jax.ShapeDtypeStruct((h, w), jnp.float32),
            jax.ShapeDtypeStruct((h, w), jnp.float32),
            jax.ShapeDtypeStruct((h, w), jnp.float32),
            jax.ShapeDtypeStruct((1, 128), jnp.float32),
        ),
        interpret=_interpret(),
    )(par, up, vp, xi_obs_cur, valid, kf_xi, kf_var, kf_mask, guess, gmask)
    return xi_new[:h0], var_new[:h0], fuse_mask[:h0], claim_mask[:h0], n[0, 0]


# ---------------------------------------------------------------------------
# Kernel A-ESM: in-kernel warp Jacobians from template points + averaged
# template/current gradients (no stored Jacobian field at all).


def _esm_kernel(
    par_ref, kf_int_ref, rho_ref, valid_ref, px_ref, py_ref, pz_ref,
    kfg_ref, smp_ref, out_ref, *, nu, gate2, use_geometric, avg_grads=True,
    avg_int=True, occlusion_gate=False,
):
    """par (1, 8) SMEM: [fx, fy, s2i, s2x, r31, r32, r33, gate_cap2]
    where r3* is the third rotation row of the current pose estimate
    (for the exact geometric-prediction Jacobian) and gate_cap2 is the
    squared hard cap on the occlusion-gate threshold (0 = uncapped; see
    the XLA twin and TrackingConfig.occ_gate_cap)."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    fx = par_ref[0, 0]
    fy = par_ref[0, 1]
    s2i = par_ref[0, 2]
    s2x = par_ref[0, 3]
    valid = valid_ref[:]
    # Template planes may be stored bf16 (TrackingConfig.plane_dtype);
    # all residual/Jacobian math runs f32.
    kf_int = kf_int_ref[:].astype(jnp.float32)
    rho = rho_ref[:]
    i_s = smp_ref[0]
    xi_s = smp_ref[1]
    r_i = (i_s - kf_int) * valid
    r_x = (xi_s - rho) * valid
    # Gate occluded pixels out of the WEIGHTS only (sigma stats, n_valid
    # and inlier diagnostics stay ungated — see the XLA twin for why).
    if occlusion_gate and use_geometric:
        thresh = 4.0 * gate2 * s2x + 0.05**2
        cap2 = par_ref[0, 7]
        thresh = jnp.where(cap2 > 0.0, jnp.minimum(thresh, cap2), thresh)
        w_gate = (r_x * r_x <= thresh).astype(jnp.float32)
    else:
        w_gate = 1.0
    w_i = (nu + 1.0) / (nu + r_i * r_i / s2i) * valid * w_gate / s2i
    w_x = (nu + 1.0) / (nu + r_x * r_x / s2x) * valid * w_gate / s2x

    Px = px_ref[:].astype(jnp.float32)
    Py = py_ref[:].astype(jnp.float32)
    Pz = pz_ref[:].astype(jnp.float32)
    iz = 1.0 / jnp.maximum(Pz, 1e-6)
    iz2 = iz * iz
    zero = jnp.zeros_like(Px)
    ju = (fx * iz, zero, -fx * Px * iz2, -fx * Px * Py * iz2,
          fx * (1.0 + Px * Px * iz2), -fx * Py * iz)
    jv = (zero, fy * iz, -fy * Py * iz2, -fy * (1.0 + Py * Py * iz2),
          fy * Px * Py * iz2, fy * Px * iz)
    # Exact prediction Jacobian: -rho'^2 [r3 | P x r3].
    r31 = par_ref[0, 4]
    r32 = par_ref[0, 5]
    r33 = par_ref[0, 6]
    rho2 = rho * rho
    jrho = (
        -rho2 * r31,
        -rho2 * r32,
        -rho2 * r33,
        -rho2 * (Py * r33 - Pz * r32),
        -rho2 * (Pz * r31 - Px * r33),
        -rho2 * (Px * r32 - Py * r31),
    )

    # ESM gradients: average of template and warped-current gradients on
    # both channels (avg_grads, 7-plane stack), on intensity only
    # (avg_int, 5-plane stack — opt-in; template gradients carry
    # the geometric channel), or template-only at fine levels (samples
    # carry just [i_s, xi_s] then). Static flags mirror the XLA twin's
    # channel-count dispatch.
    if avg_grads:
        gxi = 0.5 * (kfg_ref[0].astype(jnp.float32) + smp_ref[3])
        gyi = 0.5 * (kfg_ref[1].astype(jnp.float32) + smp_ref[4])
        gxx = 0.5 * (kfg_ref[2].astype(jnp.float32) + smp_ref[5])
        gyx = 0.5 * (kfg_ref[3].astype(jnp.float32) + smp_ref[6])
    elif avg_int:
        gxi = 0.5 * (kfg_ref[0].astype(jnp.float32) + smp_ref[3])
        gyi = 0.5 * (kfg_ref[1].astype(jnp.float32) + smp_ref[4])
        gxx = kfg_ref[2].astype(jnp.float32)
        gyx = kfg_ref[3].astype(jnp.float32)
    else:
        gxi = kfg_ref[0].astype(jnp.float32)
        gyi = kfg_ref[1].astype(jnp.float32)
        gxx = kfg_ref[2].astype(jnp.float32)
        gyx = kfg_ref[3].astype(jnp.float32)

    Ji = [gxi * ju[k] + gyi * jv[k] for k in range(6)]
    if use_geometric:
        Jx = [gxx * ju[k] + gyx * jv[k] - jrho[k] for k in range(6)]
    sums = []
    for a, b in _TRI:
        v = jnp.sum(w_i * Ji[a] * Ji[b])
        if use_geometric:
            v = v + jnp.sum(w_x * Jx[a] * Jx[b])
        sums.append(v)
    for a in range(6):
        v = jnp.sum(w_i * Ji[a] * r_i)
        if use_geometric:
            v = v + jnp.sum(w_x * Jx[a] * r_x)
        sums.append(v)
    # Disabled-channel terms stay out of error/sigma (mirrors the XLA
    # twin's use_geometric gating — tested for exact equality).
    err_sum = jnp.sum(w_i * r_i * r_i)
    if use_geometric:
        err_sum = err_sum + jnp.sum(w_x * r_x * r_x)
    sums.append(err_sum)
    sums.append(jnp.sum(valid * (r_i * r_i < gate2 * s2i)))
    sums.append(jnp.sum(valid))
    sums.append(jnp.sum(valid * ((nu + 1.0) / (nu + r_i * r_i / s2i)) * r_i * r_i))
    sums.append(jnp.sum(valid * ((nu + 1.0) / (nu + r_x * r_x / s2x)) * r_x * r_x))
    out_ref[0, 0:32] = out_ref[0, 0:32] + jnp.stack(sums)


def esm_residuals_and_normal_eq_pallas(
    T: jax.Array,
    kf_int: jax.Array,
    kf_points: tuple,
    kf_mask: jax.Array,
    kf_grads: jax.Array,
    cur_stack7: jax.Array,
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
    """Pallas twin of gauss_newton.esm_residuals_and_normal_eq.

    Accepts a (7, H, W) ESM stack (gradient averaging on both channels),
    a (5, H, W) [I, xi, mask, gxI, gyI] stack (averaging on intensity
    only — opt-in via esm_geo_min_level), or a (3, H, W) [I, xi, mask] stack (template
    gradients alone, fine-level mode; only the 2 sampled residual planes
    enter the kernel then).
    """
    n_ch = cur_stack7.shape[0]
    avg_grads = n_ch >= 7
    avg_int = n_ch >= 5
    Px, Py, Pz = kf_points
    up, vp, rho, front = transform_project(Px, Py, Pz, T, intr)
    samples, mask_ok, inb = sample_stack7(cur_stack7, up, vp, stacked_gather)
    if not avg_int:
        samples = samples[:2]
    valid = kf_mask * front * inb * mask_ok

    h, w = kf_int.shape
    # bf16 plane storage (TrackingConfig.plane_dtype) halves the sublane
    # granularity: Mosaic's min tile is (16, 128) for bf16 vs (8, 128)
    # for f32, so padding and tile choice must move to 16-row multiples.
    mult = 16 if any(
        a.dtype == jnp.bfloat16 for a in (kf_int, Px, Py, Pz)
    ) else 8
    (kf_int_p, rho_p, valid_p, Px_p, Py_p, Pz_p, kfg_p, smp_p), hp = _pad_rows(
        [kf_int, rho, valid, Px, Py, Pz, kf_grads, samples], h, mult
    )
    n_smp = smp_p.shape[0]
    th = _tile_rows(hp, w, planes=6 + 4 + n_smp, mult=mult)
    grid = hp // th
    spec = pl.BlockSpec((th, w), lambda i: (i, 0), memory_space=pltpu.VMEM)
    spec4 = pl.BlockSpec((4, th, w), lambda i: (0, i, 0), memory_space=pltpu.VMEM)
    spec7 = pl.BlockSpec((n_smp, th, w), lambda i: (0, i, 0), memory_space=pltpu.VMEM)
    par = jnp.stack(
        [jnp.asarray(intr.fx, jnp.float32), jnp.asarray(intr.fy, jnp.float32),
         jnp.asarray(sigma2_int, jnp.float32), jnp.asarray(sigma2_xi, jnp.float32),
         T[2, 0], T[2, 1], T[2, 2],
         jnp.asarray(gate_cap * gate_cap, jnp.float32)]
    ).reshape(1, 8)
    out = pl.pallas_call(
        functools.partial(
            _esm_kernel, nu=nu, gate2=gate_sigmas**2,
            use_geometric=use_geometric, avg_grads=avg_grads,
            avg_int=avg_int, occlusion_gate=occlusion_gate,
        ),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.SMEM),
            spec, spec, spec, spec, spec, spec, spec4, spec7,
        ],
        out_specs=pl.BlockSpec((1, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        interpret=_interpret(),
    )(par, kf_int_p, rho_p, valid_p, Px_p, Py_p, Pz_p, kfg_p, smp_p)

    tri = out[0, 0:21]
    H = jnp.zeros((6, 6), jnp.float32)
    for k, (a, b) in enumerate(_TRI):
        H = H.at[a, b].set(tri[k])
        H = H.at[b, a].set(tri[k])
    b_vec = out[0, 21:27]
    n_valid = out[0, 29]
    inv_n = 1.0 / jnp.maximum(n_valid, 1.0)
    return IrlsResult(
        H=H * inv_n,
        b=b_vec * inv_n,
        sigma2_int=jnp.maximum(out[0, 30] * inv_n, 1e-12),
        # A disabled geometric channel keeps its incoming scale (XLA-twin
        # semantics).
        sigma2_xi=jnp.maximum(out[0, 31] * inv_n, 1e-12)
        if use_geometric
        else jnp.asarray(sigma2_xi, jnp.float32),
        error=out[0, 27] * inv_n,
        n_valid=n_valid,
        inlier_frac=out[0, 28] * inv_n,
    )
