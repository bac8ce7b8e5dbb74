"""rgbid_tpu — TPU-native dense RGB-D visual SLAM.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
dangut/RGBiD-SLAM (C++/CUDA): a real-time frame-to-keyframe dense tracker
minimizing joint photometric + inverse-depth geometric error over Gaussian
pyramids with Student-t robust weighting, keyframe inverse-depth fusion with
per-pixel uncertainty propagation, and a host back end for loop closure and
pose-graph optimization driving batched relocalization scoring on device.

Public API (mirrors the reference: feed RGB-D frames, get poses + map):

    from rgbid_tpu import SlamSystem, SlamConfig, Intrinsics
    slam = SlamSystem(intrinsics, config)
    pose = slam.process_frame(rgb_u8, depth_u16, timestamp)
    slam.finish()
    slam.trajectory()          # list of (timestamp, 4x4 T_wc) pairs
    slam.save_trajectory(path) # TUM-format t tx ty tz qx qy qz qw rows
    slam.map_points()          # global point cloud (N, 6) xyzrgb
"""

__version__ = "0.1.0"

from .core.camera import Intrinsics  # noqa: F401
from .core.config import SlamConfig  # noqa: F401


def __getattr__(name):
    # Lazy import: keep `import rgbid_tpu` light (no jax import) for tooling.
    if name == "SlamSystem":
        from .system import SlamSystem

        return SlamSystem
    raise AttributeError(name)
