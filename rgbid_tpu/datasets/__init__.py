"""Dataset / frame-source layer.

TPU-native equivalent of the reference's L0 sensor/dataset I/O layer
(SURVEY.md §1): a TUM RGB-D benchmark reader plus a synthetic RGB-D
renderer used for all CI-grade testing (the sandbox has no network, so TUM
sequences cannot be downloaded; the reference's live OpenNI2 grabber is out
of scope but the frame-source interface is kept identical so one could be
added).
"""

from dataclasses import dataclass

import numpy as np


@dataclass
class Frame:
    """One RGB-D frame, as the sensor/dataset delivers it.

    rgb:   (H, W, 3) uint8
    depth: (H, W) uint16, raw sensor units (meters = depth / depth_scale)
    """

    timestamp: float
    rgb: np.ndarray
    depth: np.ndarray


from .synthetic import SyntheticSequence, generate_sequence, make_scene, render_frame  # noqa: E402,F401
from .tum import TumSequence  # noqa: E402,F401
