import numpy as np

from rgbid_tpu.core.camera import Intrinsics
from rgbid_tpu.datasets import synthetic


def small_intr():
    # Small frames keep the test fast; same aspect/fov as VGA.
    return Intrinsics(fx=129.3, fy=129.1, cx=79.6, cy=63.8, width=160, height=120)


def test_render_static_frame():
    scene = synthetic.make_scene(0)
    rgb, d16, gray, depth = synthetic.render_frame(scene, small_intr(), np.eye(4))
    assert rgb.shape == (120, 160, 3) and rgb.dtype == np.uint8
    assert d16.shape == (120, 160) and d16.dtype == np.uint16
    hit = depth > 0
    assert hit.mean() > 0.97  # scene covers nearly the full frame
    assert depth[hit].min() > 0.5 and depth[hit].max() < 8.0
    # Texture must have contrast (dense methods need gradients).
    assert gray[hit].std() > 0.05


def test_depth_scale_u16():
    scene = synthetic.make_scene(0)
    _, d16, _, depth = synthetic.render_frame(scene, small_intr(), np.eye(4))
    hit = depth > 0
    np.testing.assert_allclose(d16[hit] / 5000.0, depth[hit], atol=1e-4 + 1 / 5000.0)


def test_photometric_consistency_across_views():
    """Warp pixels from view A to view B with GT depth/pose; intensities match.

    This validates the renderer's geometric consistency, which every
    odometry correctness test depends on.
    """
    intr = small_intr()
    scene = synthetic.make_scene(0)
    T_a = np.eye(4)
    T_b = synthetic.orbit_trajectory(10, trans_amp=0.2, rot_amp=0.05)[5]
    _, _, gray_a, depth_a = synthetic.render_frame(scene, intr, T_a)
    _, _, gray_b, depth_b = synthetic.render_frame(scene, intr, T_b)

    h, w = depth_a.shape
    u, v = np.meshgrid(np.arange(w), np.arange(h))
    z = depth_a
    valid = z > 0
    x = (u - intr.cx) / intr.fx * z
    y = (v - intr.cy) / intr.fy * z
    pts_w = np.stack([x, y, z], -1) @ T_a[:3, :3].T + T_a[:3, 3]
    T_bw = np.linalg.inv(T_b)
    pts_b = pts_w @ T_bw[:3, :3].T + T_bw[:3, 3]
    zb = pts_b[..., 2]
    ub = intr.fx * pts_b[..., 0] / zb + intr.cx
    vb = intr.fy * pts_b[..., 1] / zb + intr.cy
    inb = valid & (zb > 0.05) & (ub >= 1) & (ub < w - 2) & (vb >= 1) & (vb < h - 2)
    # Nearest-neighbor sample of view B.
    ui, vi = np.round(ub[inb]).astype(int), np.round(vb[inb]).astype(int)
    # Occlusion check: only compare where depth agrees.
    zb_img = depth_b[vi, ui]
    vis = (zb_img > 0) & (np.abs(zb_img - zb[inb]) < 0.03)
    diff = np.abs(gray_b[vi, ui][vis] - gray_a[inb][vis])
    assert vis.mean() > 0.5
    # Median photometric error should be small (bilinear texture, NN sampling).
    assert np.median(diff) < 0.03


def test_sequence_generation_and_noise():
    seq = synthetic.generate_sequence(n_frames=4, intr=small_intr(), xi_noise_sigma=0.005, seed=3)
    assert len(seq) == 4
    assert seq.gt_poses[0].shape == (4, 4)
    f = next(seq.frames())
    assert f.rgb.shape == (120, 160, 3)
    # Noise should perturb depth but keep it in a sane range.
    d0 = seq.depth[0].astype(np.float64) / 5000.0
    hit = d0 > 0
    assert 0.3 < d0[hit].mean() < 8.0
