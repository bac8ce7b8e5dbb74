"""Map assembly + export: global cloud, PLY/PCD writers, TUM trajectory.

Reference equivalent: map assembly/export component (SURVEY.md §2.1):
global cloud = union of keyframe clouds; saves PLY/PCD; saves trajectory
as TUM 'timestamp tx ty tz qx qy qz qw'.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np


def transform_cloud(cloud_xyzrgb: np.ndarray, T: np.ndarray) -> np.ndarray:
    """Apply a rigid transform to the xyz part of an (N, 6) cloud."""
    out = cloud_xyzrgb.copy()
    out[:, :3] = cloud_xyzrgb[:, :3] @ T[:3, :3].T.astype(np.float32) + T[:3, 3].astype(
        np.float32
    )
    return out


def assemble_map(
    clouds: Sequence[np.ndarray], poses: Sequence[np.ndarray], voxel: float = 0.0
) -> np.ndarray:
    """Union of keyframe clouds in world coordinates, optional voxel grid
    downsampling (keep one point per occupied voxel)."""
    parts = [
        transform_cloud(c, T) for c, T in zip(clouds, poses) if c is not None and len(c)
    ]
    if not parts:
        return np.zeros((0, 6), np.float32)
    cloud = np.concatenate(parts, axis=0)
    if voxel > 0:
        keys = np.floor(cloud[:, :3] / voxel).astype(np.int64)
        # Hash voxel coords; keep first point per voxel.
        h = keys[:, 0] * 73856093 ^ keys[:, 1] * 19349663 ^ keys[:, 2] * 83492791
        _, idx = np.unique(h, return_index=True)
        cloud = cloud[np.sort(idx)]
    return cloud


def write_ply(path: str, cloud_xyzrgb: np.ndarray) -> None:
    """Binary little-endian PLY with x y z r g b (colors in [0,1] -> u8)."""
    n = len(cloud_xyzrgb)
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {n}\n"
        "property float x\nproperty float y\nproperty float z\n"
        "property uchar red\nproperty uchar green\nproperty uchar blue\n"
        "end_header\n"
    )
    rec = np.zeros(
        n,
        dtype=[
            ("x", "<f4"),
            ("y", "<f4"),
            ("z", "<f4"),
            ("r", "u1"),
            ("g", "u1"),
            ("b", "u1"),
        ],
    )
    rec["x"], rec["y"], rec["z"] = (cloud_xyzrgb[:, i].astype(np.float32) for i in range(3))
    cols = np.clip(cloud_xyzrgb[:, 3:6] * 255.0, 0, 255).astype(np.uint8)
    rec["r"], rec["g"], rec["b"] = cols[:, 0], cols[:, 1], cols[:, 2]
    with open(path, "wb") as f:
        f.write(header.encode("ascii"))
        f.write(rec.tobytes())


def read_ply(path: str) -> np.ndarray:
    """Read back a PLY written by write_ply (for tests/round-trips)."""
    with open(path, "rb") as f:
        header = b""
        while not header.endswith(b"end_header\n"):
            header += f.readline()
        n = int([l for l in header.decode().splitlines() if l.startswith("element vertex")][0].split()[-1])
        rec = np.frombuffer(
            f.read(),
            dtype=[("x", "<f4"), ("y", "<f4"), ("z", "<f4"), ("r", "u1"), ("g", "u1"), ("b", "u1")],
            count=n,
        )
    out = np.zeros((n, 6), np.float32)
    out[:, 0], out[:, 1], out[:, 2] = rec["x"], rec["y"], rec["z"]
    out[:, 3], out[:, 4], out[:, 5] = rec["r"] / 255.0, rec["g"] / 255.0, rec["b"] / 255.0
    return out


def write_pcd(path: str, cloud_xyzrgb: np.ndarray) -> None:
    """Binary PCD v0.7 with FIELDS x y z rgb (PCL convention: the three
    u8 color channels packed into one float32's bit pattern), the format
    the reference's PCL-based map export produces (SURVEY.md §2.1 map
    assembly: "saves PLY/PCD")."""
    n = len(cloud_xyzrgb)
    header = (
        "# .PCD v0.7 - Point Cloud Data file format\n"
        "VERSION 0.7\n"
        "FIELDS x y z rgb\n"
        "SIZE 4 4 4 4\n"
        "TYPE F F F F\n"
        "COUNT 1 1 1 1\n"
        f"WIDTH {n}\n"
        "HEIGHT 1\n"
        "VIEWPOINT 0 0 0 1 0 0 0\n"
        f"POINTS {n}\n"
        "DATA binary\n"
    )
    rec = np.zeros((n, 4), np.float32)
    rec[:, :3] = cloud_xyzrgb[:, :3].astype(np.float32)
    cols = np.clip(cloud_xyzrgb[:, 3:6] * 255.0, 0, 255).astype(np.uint32)
    packed = (cols[:, 0] << 16) | (cols[:, 1] << 8) | cols[:, 2]
    rec[:, 3] = packed.view(np.float32)
    with open(path, "wb") as f:
        f.write(header.encode("ascii"))
        f.write(np.ascontiguousarray(rec).tobytes())


def read_pcd(path: str) -> np.ndarray:
    """Read back a binary x/y/z/rgb PCD (write_pcd round-trip + PCL files
    with the same layout) -> (N, 6) xyz + rgb-in-[0,1] float32."""
    with open(path, "rb") as f:
        n = None
        while True:
            line = f.readline().decode("ascii", errors="replace").strip()
            if line.startswith("POINTS"):
                n = int(line.split()[1])
            if line.startswith("DATA"):
                if line.split()[1] != "binary":
                    raise ValueError("only DATA binary PCD supported")
                break
        rec = np.frombuffer(f.read(16 * n), dtype=np.float32).reshape(n, 4)
    out = np.zeros((n, 6), np.float32)
    out[:, :3] = rec[:, :3]
    packed = rec[:, 3].copy().view(np.uint32)
    out[:, 3] = ((packed >> 16) & 0xFF) / 255.0
    out[:, 4] = ((packed >> 8) & 0xFF) / 255.0
    out[:, 5] = (packed & 0xFF) / 255.0
    return out


def write_tum_trajectory(path: str, rows: List[Tuple[float, np.ndarray]]) -> None:
    """rows: (timestamp, T_wc 4x4) -> TUM format file."""
    with open(path, "w") as f:
        f.write("# timestamp tx ty tz qx qy qz qw\n")
        for t, T in rows:
            q = _quat_from_R(T[:3, :3])
            tx, ty, tz = T[:3, 3]
            f.write(
                f"{t:.6f} {tx:.6f} {ty:.6f} {tz:.6f} "
                f"{q[0]:.6f} {q[1]:.6f} {q[2]:.6f} {q[3]:.6f}\n"
            )


def _quat_from_R(R: np.ndarray) -> np.ndarray:
    """Rotation matrix -> [qx, qy, qz, qw] (numpy, Shepperd)."""
    tr = np.trace(R)
    if tr > 0:
        s = np.sqrt(tr + 1.0) * 2
        qw = 0.25 * s
        qx = (R[2, 1] - R[1, 2]) / s
        qy = (R[0, 2] - R[2, 0]) / s
        qz = (R[1, 0] - R[0, 1]) / s
    elif R[0, 0] > R[1, 1] and R[0, 0] > R[2, 2]:
        s = np.sqrt(1.0 + R[0, 0] - R[1, 1] - R[2, 2]) * 2
        qw = (R[2, 1] - R[1, 2]) / s
        qx = 0.25 * s
        qy = (R[0, 1] + R[1, 0]) / s
        qz = (R[0, 2] + R[2, 0]) / s
    elif R[1, 1] > R[2, 2]:
        s = np.sqrt(1.0 + R[1, 1] - R[0, 0] - R[2, 2]) * 2
        qw = (R[0, 2] - R[2, 0]) / s
        qx = (R[0, 1] + R[1, 0]) / s
        qy = 0.25 * s
        qz = (R[1, 2] + R[2, 1]) / s
    else:
        s = np.sqrt(1.0 + R[2, 2] - R[0, 0] - R[1, 1]) * 2
        qw = (R[1, 0] - R[0, 1]) / s
        qx = (R[0, 2] + R[2, 0]) / s
        qy = (R[1, 2] + R[2, 1]) / s
        qz = 0.25 * s
    q = np.array([qx, qy, qz, qw])
    return q if qw >= 0 else -q


def read_tum_trajectory(path: str) -> np.ndarray:
    """Read a TUM trajectory file -> (N, 8) rows."""
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            rows.append([float(x) for x in line.split()[:8]])
    return np.asarray(rows)
