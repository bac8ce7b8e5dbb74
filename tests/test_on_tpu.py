"""On-TPU test tier (RUN_TPU=1): the product's REAL compute path.

The default suite forces CPU, where every Pallas kernel runs in
interpreter mode — a Mosaic-specific lowering or numeric regression would
pass all of it (round-1 VERDICT weak #2). This tier executes on the real
chip:

* every Pallas kernel (A' normal-equation, ESM both gradient modes,
  fusion B, sigma) against its XLA twin, at two resolutions including a
  non-multiple-of-8 height (exercises the row-padding path);
* a 12-frame VGA tracking clip through the full SlamSystem with an ATE
  bound.

Run: ``RUN_TPU=1 python -m pytest tests/test_on_tpu.py -v`` (takes a few
minutes on the sandbox TPU, dominated by compiles). Results are recorded
in BASELINE.md as part of the bench protocol.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.tpu_only

INTR_TOL = dict(rtol=2e-3, atol=2e-4)  # Mosaic vs XLA f32 reduction order


def _require_tpu():
    import jax

    if jax.default_backend() != "tpu":
        pytest.skip("real TPU backend not available")


def _synthetic_pair(h, w, seed=0):
    import jax.numpy as jnp

    from rgbid_tpu.core.camera import Intrinsics
    from rgbid_tpu.datasets import synthetic

    intr = Intrinsics(
        fx=0.8 * w, fy=0.8 * w, cx=w / 2 - 0.5, cy=h / 2 - 0.5, width=w, height=h
    )
    seq = synthetic.generate_sequence(
        n_frames=2, intr=intr, motion="orbit", trans_amp=0.1, rot_amp=0.03, seed=seed
    )
    from rgbid_tpu.ops import image

    def planes(i):
        I = image.intensity_from_rgb(jnp.asarray(seq.rgb[i]))
        xi, mask = image.inverse_depth_from_u16(jnp.asarray(seq.depth[i]))
        return I, xi, mask

    return intr, planes(0), planes(1)


@pytest.mark.parametrize("hw", [(480, 640), (250, 320)])
def test_pallas_esm_kernel_matches_xla_on_chip(hw):
    _require_tpu()
    import jax.numpy as jnp

    from rgbid_tpu.ops import gauss_newton, image
    from rgbid_tpu.ops.pallas_kernels import esm_residuals_and_normal_eq_pallas
    from rgbid_tpu.ops.warp import backproject_grid
    from rgbid_tpu.reference_cpu import se3_np

    h, w = hw
    intr, (kI, kxi, km), (cI, cxi, cm) = _synthetic_pair(h, w)
    ones = jnp.ones_like(km)
    gx_i, gy_i = image.gradients(kI, ones)
    gx_x, gy_x = image.gradients(kxi, km)
    kfg = jnp.stack([gx_i, gy_i, gx_x, gy_x])
    cgx_i, cgy_i = image.gradients(cI, jnp.ones_like(cm))
    cgx_x, cgy_x = image.gradients(cxi, cm)
    stack7 = jnp.stack([cI, cxi, cm, cgx_i, cgy_i, cgx_x, cgy_x])
    pts = backproject_grid(kxi, intr)
    T = jnp.asarray(se3_np.exp([0.01, -0.02, 0.015, 0.004, -0.006, 0.008]), jnp.float32)

    # full ESM (7), intensity-only averaging (5 — opt-in via
    # esm_geo_min_level), and template-grad (3) modes; the 5-plane
    # layout is exactly the 7-stack's first five channels.
    for stack in (stack7, stack7[:5], stack7[:3]):
        a = esm_residuals_and_normal_eq_pallas(
            T, kI, pts, km, kfg, stack, intr, 5.0, 0.01, 0.0025
        )
        b = gauss_newton.esm_residuals_and_normal_eq(
            T, kI, pts, km, kfg, stack, intr, 5.0, 0.01, 0.0025
        )
        np.testing.assert_allclose(np.asarray(a.H), np.asarray(b.H), **INTR_TOL)
        np.testing.assert_allclose(np.asarray(a.b), np.asarray(b.b), **INTR_TOL)
        np.testing.assert_allclose(
            float(a.n_valid), float(b.n_valid), rtol=1e-5
        )
        np.testing.assert_allclose(float(a.error), float(b.error), rtol=2e-3)


@pytest.mark.parametrize("hw", [(480, 640), (250, 320)])
def test_pallas_ic_kernel_matches_xla_on_chip(hw):
    _require_tpu()
    import jax.numpy as jnp

    from rgbid_tpu.ops import gauss_newton, image
    from rgbid_tpu.ops.pallas_kernels import residuals_and_normal_eq_pallas
    from rgbid_tpu.ops.warp import backproject_grid
    from rgbid_tpu.reference_cpu import se3_np

    h, w = hw
    intr, (kI, kxi, km), (cI, cxi, cm) = _synthetic_pair(h, w, seed=1)
    ones = jnp.ones_like(km)
    gx_i, gy_i = image.gradients(kI, ones)
    gx_x, gy_x = image.gradients(kxi, km)
    jac = gauss_newton.template_jacobians(gx_i, gy_i, gx_x, gy_x, kxi, km, intr)
    pts = backproject_grid(kxi, intr)
    T = jnp.asarray(se3_np.exp([0.01, -0.02, 0.015, 0.004, -0.006, 0.008]), jnp.float32)
    args = (T, kI, pts, km, jac, cI, cxi, cm, intr, 5.0, 0.01, 0.0025, 1)
    a = residuals_and_normal_eq_pallas(*args)
    b = gauss_newton.residuals_and_normal_eq(*args)
    np.testing.assert_allclose(np.asarray(a.H), np.asarray(b.H), **INTR_TOL)
    np.testing.assert_allclose(np.asarray(a.b), np.asarray(b.b), **INTR_TOL)
    np.testing.assert_allclose(float(a.sigma2_int), float(b.sigma2_int), rtol=2e-3)
    np.testing.assert_allclose(float(a.sigma2_xi), float(b.sigma2_xi), rtol=2e-3)


@pytest.mark.parametrize("hw", [(480, 640), (250, 320)])
def test_pallas_fusion_matches_xla_on_chip(hw):
    _require_tpu()
    import dataclasses

    import jax.numpy as jnp

    from rgbid_tpu.core.config import FusionConfig
    from rgbid_tpu.mapping.fusion import fuse_inverse_depth
    from rgbid_tpu.reference_cpu import se3_np

    h, w = hw
    intr, (kI, kxi, km), (cI, cxi, cm) = _synthetic_pair(h, w, seed=2)
    T = jnp.asarray(se3_np.exp([0.01, -0.02, 0.015, 0.004, -0.006, 0.008]), jnp.float32)
    cov = jnp.asarray(np.eye(6) * 1e-6, jnp.float32)
    var = jnp.full((h, w), 6.4e-5, jnp.float32)
    base = FusionConfig()
    out_p = fuse_inverse_depth(
        kxi, var, km, cxi, cm, T, cov, intr, dataclasses.replace(base, kernel="pallas")
    )
    out_x = fuse_inverse_depth(
        kxi, var, km, cxi, cm, T, cov, intr, dataclasses.replace(base, kernel="xla")
    )
    np.testing.assert_allclose(np.asarray(out_p[0]), np.asarray(out_x[0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_p[1]), np.asarray(out_x[1]), atol=1e-6)
    # Gate agreement: identical fused-pixel counts within rounding.
    np.testing.assert_allclose(float(out_p[3]), float(out_x[3]), rtol=1e-4)


def test_pallas_fusion_growth_matches_xla_on_chip():
    """The gather-form validity growth (K8 hole claiming, round 3) under
    REAL Mosaic lowering: Pallas kernel's claimed set/values/hits must
    match the XLA twin."""
    _require_tpu()
    import dataclasses

    import jax.numpy as jnp

    from rgbid_tpu.core.config import FusionConfig
    from rgbid_tpu.mapping.fusion import fuse_and_grow
    from rgbid_tpu.reference_cpu import se3_np

    h, w = 250, 320
    intr, (kI, kxi, km), (cI, cxi, cm) = _synthetic_pair(h, w, seed=5)
    # Punch a block of holes into the keyframe.
    km = km.at[80:140, 100:200].set(0.0)
    from rgbid_tpu.mapping.fusion import hole_guess
    from rgbid_tpu.ops import image
    from rgbid_tpu.tracking.frames import KeyframeLevel

    xi_pyr, m_pyr = image.build_pyramid(kxi * km, km, 3)
    lvls = [
        KeyframeLevel(intensity=None, xi=x, mask=m, jac=None)
        for x, m in zip(xi_pyr, m_pyr)
    ]
    guess, gmask = hole_guess(lvls)
    T = jnp.asarray(
        se3_np.exp([0.01, -0.02, 0.015, 0.004, -0.006, 0.008]), jnp.float32
    )
    cov = jnp.asarray(np.eye(6) * 1e-6, jnp.float32)
    var = jnp.full((h, w), 6.4e-5, jnp.float32)
    hits = 2.0 * km
    base = FusionConfig()
    outs = {}
    for kern in ("pallas", "xla"):
        outs[kern] = fuse_and_grow(
            kxi * km, var, km, hits, cxi, cm, T, cov, intr,
            dataclasses.replace(base, kernel=kern),
            guess=guess, gmask=gmask,
        )
    xp, vp_, mp, hp, _ = outs["pallas"]
    xx, vx, mx, hx, _ = outs["xla"]
    np.testing.assert_allclose(np.asarray(xp), np.asarray(xx), atol=1e-5)
    np.testing.assert_allclose(np.asarray(mp), np.asarray(mx), atol=0)
    np.testing.assert_allclose(np.asarray(hp), np.asarray(hx), atol=0)
    # Growth actually happened into the hole block.
    claimed = (np.asarray(mp) > 0.5) & (np.asarray(km) < 0.5)
    assert claimed.sum() > 500, claimed.sum()


def test_vga_tracking_clip_ate_on_chip():
    """12-frame VGA clip through the production SlamSystem (flights,
    Pallas kernels with REAL Mosaic lowering): ATE bound per the bench
    protocol."""
    _require_tpu()
    from rgbid_tpu.core.camera import DEFAULT
    from rgbid_tpu.core.config import SlamConfig
    from rgbid_tpu.datasets import synthetic
    from rgbid_tpu.eval import absolute_trajectory_error
    from rgbid_tpu.system import SlamSystem

    cfg = SlamConfig().override(**{"backend.enabled": False})
    seq = synthetic.generate_sequence(
        n_frames=12, intr=DEFAULT, motion="orbit",
        trans_amp=0.15, rot_amp=0.04, xi_noise_sigma=0.003,
    )
    slam = SlamSystem(DEFAULT, cfg)
    slam.feed(list(seq.frames()))
    gt0 = np.linalg.inv(seq.gt_poses[0])
    ate = absolute_trajectory_error([gt0 @ T for T in seq.gt_poses], slam.poses())
    assert ate["rmse"] < 1.5e-3, ate  # bench clip measures ~0.1-0.3 mm
    assert not any(s.get("lost") for s in slam.stats)


def test_pallas_esm_bf16_planes_on_chip():
    """bf16 plane storage (TrackingConfig.plane_dtype) on REAL Mosaic:
    bf16 refs change the kernel's VMEM tiling constraints (min tile
    (16, 128) vs (8, 128) for f32) — interpreter mode cannot catch a
    lowering failure. Asserts the bf16-stored run matches the f32 run
    within the storage quantization (~4e-3 relative)."""
    _require_tpu()
    import jax.numpy as jnp

    from rgbid_tpu.ops import gauss_newton, image
    from rgbid_tpu.ops.pallas_kernels import esm_residuals_and_normal_eq_pallas
    from rgbid_tpu.ops.warp import backproject_grid
    from rgbid_tpu.reference_cpu import se3_np

    h, w = 250, 320  # non-multiple-of-8 height: padding + bf16 tiling
    intr, (kI, kxi, km), (cI, cxi, cm) = _synthetic_pair(h, w)
    ones = jnp.ones_like(km)
    gx_i, gy_i = image.gradients(kI, ones)
    gx_x, gy_x = image.gradients(kxi, km)
    kfg = jnp.stack([gx_i, gy_i, gx_x, gy_x])
    cgx_i, cgy_i = image.gradients(cI, jnp.ones_like(cm))
    cgx_x, cgy_x = image.gradients(cxi, cm)
    stack7 = jnp.stack([cI, cxi, cm, cgx_i, cgy_i, cgx_x, cgy_x])
    pts = backproject_grid(kxi, intr)
    T = jnp.asarray(se3_np.exp([0.01, -0.02, 0.015, 0.004, -0.006, 0.008]), jnp.float32)

    # Compare bf16-Pallas against the bf16-XLA twin: SAME quantized
    # storage on both sides, so the diff isolates the Mosaic lowering
    # (what this tier exists for) from the storage quantization (which
    # the tracker-level pose-parity test owns).
    pts_bf = tuple(p.astype(jnp.bfloat16) for p in pts)
    kI_bf = kI.astype(jnp.bfloat16)
    stack_bf = stack7.astype(jnp.bfloat16)
    a = esm_residuals_and_normal_eq_pallas(
        T, kI_bf, pts_bf, km, kfg, stack_bf, intr, 5.0, 0.01, 0.0025,
        occlusion_gate=True,
    )
    b = gauss_newton.esm_residuals_and_normal_eq(
        T, kI_bf, pts_bf, km, kfg, stack_bf, intr, 5.0, 0.01, 0.0025,
        occlusion_gate=True,
    )
    np.testing.assert_allclose(np.asarray(a.H), np.asarray(b.H), **INTR_TOL)
    np.testing.assert_allclose(np.asarray(a.b), np.asarray(b.b), **INTR_TOL)
    np.testing.assert_allclose(float(a.n_valid), float(b.n_valid), rtol=1e-5)
