"""Device XLA ops vs. the numpy CPU oracle (<=1e-5 agreement).

SURVEY.md §4 consequence (1): every kernel K1-K7 is checked against its
numpy reference implementation.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from rgbid_tpu.core.camera import Intrinsics, level_intrinsics
from rgbid_tpu.datasets import synthetic
from rgbid_tpu.ops import gauss_newton, image, warp
from rgbid_tpu.reference_cpu import odometry as odo
from rgbid_tpu.reference_cpu import se3_np

INTR = Intrinsics(fx=258.6, fy=258.2, cx=159.3, cy=127.6, width=320, height=240)


@pytest.fixture(scope="module")
def frame():
    scene = synthetic.make_scene(0)
    return synthetic.render_frame(scene, INTR, np.eye(4))


@pytest.fixture(scope="module")
def planes(frame):
    rgb, d16, _, _ = frame
    intensity = odo.intensity_from_rgb(rgb)
    xi, mask = odo.inverse_depth_from_u16(d16)
    # punch some invalid holes to exercise masking
    mask = mask.copy()
    mask[40:60, 50:90] = False
    xi = np.where(mask, xi, 0.0)
    return intensity, xi, mask


def test_intensity_matches(frame):
    rgb = frame[0]
    ref = odo.intensity_from_rgb(rgb)
    dev = np.asarray(image.intensity_from_rgb(jnp.asarray(rgb)))
    np.testing.assert_allclose(dev, ref, atol=1e-6)


def test_inverse_depth_matches(frame):
    d16 = frame[1]
    ref_xi, ref_m = odo.inverse_depth_from_u16(d16)
    dev_xi, dev_m = image.inverse_depth_from_u16(jnp.asarray(d16))
    np.testing.assert_allclose(np.asarray(dev_xi), ref_xi, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(dev_m) > 0.5, ref_m)


def test_masked_blur_and_downsample_match(planes):
    intensity, xi, mask = planes
    ref_img, ref_mask = odo.downsample(xi, mask)
    dev_img, dev_mask = image.downsample(jnp.asarray(xi), jnp.asarray(mask, jnp.float32))
    np.testing.assert_allclose(np.asarray(dev_img), ref_img, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(dev_mask) > 0.5, ref_mask)


def test_pyramid_matches(planes):
    intensity, xi, mask = planes
    ref_imgs, ref_masks = odo.build_pyramid(xi, mask, 3)
    dev_imgs, dev_masks = image.build_pyramid(
        jnp.asarray(xi), jnp.asarray(mask, jnp.float32), 3
    )
    for l in range(3):
        np.testing.assert_allclose(np.asarray(dev_imgs[l]), ref_imgs[l], atol=1e-5)
        np.testing.assert_array_equal(np.asarray(dev_masks[l]) > 0.5, ref_masks[l])


def test_gradients_match(planes):
    intensity, xi, mask = planes
    ref_gx, ref_gy = odo.gradients(xi, mask)
    dev_gx, dev_gy = image.gradients(jnp.asarray(xi), jnp.asarray(mask, jnp.float32))
    np.testing.assert_allclose(np.asarray(dev_gx), ref_gx, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dev_gy), ref_gy, atol=1e-6)


def test_warp_points_match(planes):
    _, xi, mask = planes
    T = se3_np.exp(np.array([0.03, -0.02, 0.05, 0.02, -0.01, 0.015]))
    ref_u, ref_v, ref_rho, _, ref_valid = odo.warp_points(xi, mask, T, INTR)
    du, dv, drho, _, dvalid = warp.warp_points(
        jnp.asarray(xi), jnp.asarray(mask, jnp.float32), jnp.asarray(T, jnp.float32), INTR
    )
    m = ref_valid
    np.testing.assert_allclose(np.asarray(du)[m], ref_u[m], atol=2e-3)
    np.testing.assert_allclose(np.asarray(dv)[m], ref_v[m], atol=2e-3)
    np.testing.assert_allclose(np.asarray(drho)[m], ref_rho[m], atol=1e-5)
    np.testing.assert_array_equal((np.asarray(dvalid) > 0.5), ref_valid)


def test_bilinear_sample_matches(planes):
    intensity, xi, mask = planes
    rng = np.random.default_rng(0)
    u = rng.uniform(-5, INTR.width + 5, size=(100, 120)).astype(np.float32)
    v = rng.uniform(-5, INTR.height + 5, size=(100, 120)).astype(np.float32)
    ref_val, ref_ok = odo.bilinear_sample(xi, mask, u, v)
    dev_val, dev_ok = warp.bilinear_sample(
        jnp.asarray(xi), jnp.asarray(mask, jnp.float32), jnp.asarray(u), jnp.asarray(v)
    )
    ok = ref_ok
    np.testing.assert_array_equal(np.asarray(dev_ok) > 0.5, ref_ok)
    np.testing.assert_allclose(np.asarray(dev_val)[ok], ref_val[ok], atol=1e-5)


def test_warp_jacobian_matches_oracle():
    x = np.array([[0.3, -0.5]], np.float32)
    y = np.array([[-0.2, 0.4]], np.float32)
    z = np.array([[2.0, 3.5]], np.float32)
    intr = level_intrinsics(INTR, 1)
    ju, jv = gauss_newton.warp_jacobian(jnp.asarray(x), jnp.asarray(y), jnp.asarray(z), intr)
    P = np.stack([x, y, z], axis=-1)
    Jpi = odo._projection_jacobian(P, intr)
    Jp = odo._se3_point_jacobian(P)
    Jw = np.einsum("hwij,hwjk->hwik", Jpi, Jp)
    np.testing.assert_allclose(np.asarray(ju), Jw[..., 0, :], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(jv), Jw[..., 1, :], rtol=1e-5, atol=1e-6)
    jr = gauss_newton.rho_jacobian(jnp.asarray(x), jnp.asarray(y), jnp.asarray(z))
    np.testing.assert_allclose(np.asarray(jr), odo._rho_jacobian(P), rtol=1e-5, atol=1e-7)


def test_student_t_sigma2_matches_oracle():
    rng = np.random.default_rng(1)
    r = (rng.standard_t(df=5, size=5000) * 0.05).astype(np.float32)
    valid = (rng.uniform(size=5000) > 0.2).astype(np.float32)
    ref = odo.student_t_sigma(r * (valid > 0), valid > 0, 5.0, 0.1, iters=3)
    dev = gauss_newton.student_t_sigma2(
        jnp.asarray(r * valid) ** 2, jnp.asarray(valid), 5.0, jnp.asarray(0.01), 3
    )
    assert np.sqrt(float(dev)) == pytest.approx(ref, rel=1e-4)


def test_u12_depth_codec_roundtrip():
    """The u12 transfer codec (12-bit xi codes, 2 px -> 3 B) must decode
    to the exact validity mask of the u16 path and xi within half a
    quantization step (7.9e-4/2 1/m at the default [0.3, 10] m range —
    3.6x finer than Kinect's own disparity quantization; see
    SlamConfig.depth_codec)."""
    from rgbid_tpu.core.config import SlamConfig
    from rgbid_tpu.tracking.step import decode_frame, pack_frame

    cfg = SlamConfig().override(depth_codec="u12")
    cfg16 = cfg.override(depth_codec="u16")
    rng = np.random.default_rng(3)
    h, w = 120, 160
    rgb = rng.integers(0, 255, (h, w, 3), np.uint8)
    # Cover: invalid zeros, below-min (>u16 50000 at scale 5000 = 10 m),
    # the full in-range span, and exact boundary values.
    depth = rng.integers(0, 60000, (h, w), np.uint16)
    depth[::7, ::5] = 0
    depth[0, 0] = int(cfg.min_depth * cfg.depth_scale)  # exactly min: invalid
    depth[0, 1] = int(cfg.max_depth * cfg.depth_scale)  # exactly max: invalid
    p12 = jnp.asarray(pack_frame(rgb, depth, cfg))
    # 1 B gray + 1.5 B depth per pixel.
    assert p12.shape == (h, w + (3 * w) // 2)
    g12, xi12, m12 = map(np.asarray, decode_frame(p12, cfg))
    g16, xi16, m16 = map(
        np.asarray, decode_frame(jnp.asarray(pack_frame(rgb, depth, cfg16)), cfg16)
    )
    np.testing.assert_array_equal(g12, g16)
    np.testing.assert_array_equal(m12, m16)
    step = (1.0 / cfg.min_depth - 1.0 / cfg.max_depth) / 4094.0
    err = np.abs(xi12 - xi16)[m16 > 0]
    assert err.max() <= step / 2 + 1e-6
    assert (xi12[m12 == 0] == 0).all()


def test_u16h_depth_codec_roundtrip():
    """The u16h transfer codec (stride-2 decimated raw depth + device
    validity-renormalized bilinear 2x upsample) must reproduce the
    decimate+upsample numpy oracle exactly, with even output coordinates
    BIT-equal to the half-res xi wherever the half-res pixel is valid."""
    from rgbid_tpu.core.config import SlamConfig
    from rgbid_tpu.ops.image import inverse_depth_from_u16
    from rgbid_tpu.tracking.step import decode_frame, pack_frame

    cfg = SlamConfig().override(depth_codec="u16h")
    rng = np.random.default_rng(7)
    h, w = 96, 128
    rgb = rng.integers(0, 255, (h, w, 3), np.uint8)
    depth = rng.integers(0, 60000, (h, w), np.uint16)
    depth[rng.random((h, w)) < 0.2] = 0  # invalid holes
    packed = jnp.asarray(pack_frame(rgb, depth, cfg))
    assert packed.shape == (h + h // 2, w)  # 1 B gray + 0.5 B depth / px
    gray, xi, mask = map(np.asarray, decode_frame(packed, cfg))

    xi_h, m_h = map(
        np.asarray,
        inverse_depth_from_u16(
            jnp.asarray(np.ascontiguousarray(depth[::2, ::2])),
            cfg.depth_scale, cfg.min_depth, cfg.max_depth,
        ),
    )

    def up1(x, axis):
        x = np.moveaxis(x, axis, 0)
        mid = 0.5 * (x + np.concatenate([x[1:], x[-1:]], 0))
        out = np.stack([x, mid], 1).reshape(2 * x.shape[0], *x.shape[1:])
        return np.moveaxis(out, 0, axis)

    num = up1(up1(xi_h * m_h, 0), 1)
    den = up1(up1(m_h, 0), 1)
    xi_o = np.where(den > 1e-6, num / np.maximum(den, 1e-6), 0.0)
    np.testing.assert_array_equal(mask, (den > 1e-6).astype(np.float32))
    np.testing.assert_allclose(xi, xi_o, atol=1e-7)
    valid = m_h > 0
    np.testing.assert_array_equal(xi[::2, ::2][valid], xi_h[valid])
    np.testing.assert_array_equal(
        gray, np.asarray(pack_frame(rgb, depth, None))[0]
    )
    with pytest.raises(ValueError, match="u16h"):
        decode_frame(jnp.asarray(pack_frame(rgb, depth, None)), cfg)


def test_u12_lut_mask_matches_u16_all_raws_and_configs():
    """Advisor round 3: the u12 LUT's validity must be computed with the
    SAME float32 arithmetic as the u16 device path so boundary raw
    values agree for EVERY config, not just the default. Checked over
    all 65536 raw values for several (depth_scale, min, max) combos,
    including ones where f64 vs f32 rounding flips the compare."""
    from rgbid_tpu.ops.image import inverse_depth_from_u16
    from rgbid_tpu.tracking.step import _u12_lut

    raws = jnp.arange(65536, dtype=jnp.uint16).reshape(256, 256)
    for scale, dmin, dmax in [
        (5000.0, 0.3, 10.0),
        (1000.0, 0.5, 5.0),
        (5208.33, 0.3, 10.0),  # ASUS-style factory scale: inexact in f32
        (5000.0, 0.29999998, 9.999999),
    ]:
        _, mask16 = inverse_depth_from_u16(raws, scale, dmin, dmax)
        lut = _u12_lut(scale, dmin, dmax)
        np.testing.assert_array_equal(
            (lut > 0), np.asarray(mask16).reshape(-1) > 0,
            err_msg=f"mask mismatch at scale={scale} range=({dmin},{dmax})",
        )


def test_decode_frame_rejects_codec_mismatch():
    """Feeding a u16-packed buffer to a u12-configured decode (or vice
    versa) must raise a descriptive error, not an opaque reshape failure
    (advisor round 3)."""
    from rgbid_tpu.core.config import SlamConfig
    from rgbid_tpu.tracking.step import decode_frame, pack_frame

    cfg12 = SlamConfig().override(depth_codec="u12")
    cfg16 = SlamConfig()
    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 255, (16, 32, 3), np.uint8)
    depth = rng.integers(2000, 25000, (16, 32), np.uint16)
    p16 = jnp.asarray(pack_frame(rgb, depth, cfg16))
    p12 = jnp.asarray(pack_frame(rgb, depth, cfg12))
    with pytest.raises(ValueError, match="u12"):
        decode_frame(p16, cfg12)
    with pytest.raises(ValueError, match="u16"):
        decode_frame(p12, cfg16)


def test_config_json_roundtrips_depth_codec():
    from rgbid_tpu.core.config import SlamConfig

    cfg = SlamConfig().override(depth_codec="u12", pipeline_depth=4)
    back = SlamConfig.from_json(cfg.to_json())
    assert back.depth_codec == "u12"
    assert back == cfg
