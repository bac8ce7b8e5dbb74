import numpy as np

from rgbid_tpu.eval import metrics


def _random_traj(n, seed=0):
    r = np.random.default_rng(seed)
    poses = [np.eye(4)]
    for _ in range(n - 1):
        d = r.normal(scale=[0.05, 0.05, 0.05, 0.01, 0.01, 0.01])
        T = np.eye(4)
        th = np.linalg.norm(d[3:])
        if th > 0:
            k = d[3:] / th
            K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
            T[:3, :3] = np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * K @ K
        T[:3, 3] = d[:3]
        poses.append(poses[-1] @ T)
    return poses


def test_ate_zero_for_identical():
    gt = _random_traj(20)
    res = metrics.absolute_trajectory_error(gt, gt)
    assert res["rmse"] < 1e-12


def test_ate_invariant_to_rigid_transform():
    gt = _random_traj(25, seed=1)
    offset = np.eye(4)
    offset[:3, 3] = [1.0, -2.0, 0.5]
    th = 0.7
    offset[:3, :3] = np.array(
        [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]]
    )
    est = [offset @ T for T in gt]
    res = metrics.absolute_trajectory_error(gt, est)
    assert res["rmse"] < 1e-9


def test_ate_detects_error():
    gt = _random_traj(30, seed=2)
    est = [T.copy() for T in gt]
    est[10][0, 3] += 0.1
    res = metrics.absolute_trajectory_error(gt, est)
    assert 0.005 < res["rmse"] < 0.1


def test_umeyama_with_scale():
    r = np.random.default_rng(3)
    x = r.normal(size=(3, 40))
    R_true, _, _ = np.linalg.svd(r.normal(size=(3, 3)))[0], None, None
    R_true = np.linalg.qr(r.normal(size=(3, 3)))[0]
    if np.linalg.det(R_true) < 0:
        R_true[:, 0] *= -1
    y = 1.7 * R_true @ x + np.array([[0.3], [1.0], [-2.0]])
    R, t, s = metrics.umeyama_alignment(x, y, with_scale=True)
    assert abs(s - 1.7) < 1e-9
    np.testing.assert_allclose(R, R_true, atol=1e-9)


def test_rpe_zero_for_identical():
    gt = _random_traj(15, seed=4)
    res = metrics.relative_pose_error(gt, gt, delta=3)
    assert res["trans_rmse"] < 1e-12 and res["rot_rmse"] < 1e-6


def test_tum_row_roundtrip():
    gt = _random_traj(5, seed=5)
    rows = []
    from rgbid_tpu.core import se3
    import jax.numpy as jnp

    for i, T in enumerate(gt):
        q = np.asarray(se3.to_quaternion(jnp.asarray(T[:3, :3], dtype=jnp.float32)))
        rows.append([float(i), *T[:3, 3], *q])
    ts, poses = metrics.trajectory_from_tum_rows(np.array(rows))
    for T, P in zip(gt, poses):
        np.testing.assert_allclose(P, T, atol=1e-6)
