"""ORB feature extraction for place recognition (host, OpenCV).

Reference equivalent: binary feature extraction on keyframe intensity
images feeding the BoW database (SURVEY.md §2.1 "Loop detector").
"""

from __future__ import annotations

from typing import Tuple

import cv2
import numpy as np

_orb_cache = {}


def extract_orb(
    intensity_u8: np.ndarray, num_features: int = 500
) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (keypoints (N, 2) float32, descriptors (N, 32) uint8)."""
    if num_features not in _orb_cache:
        _orb_cache[num_features] = cv2.ORB_create(nfeatures=num_features)
    orb = _orb_cache[num_features]
    kps, desc = orb.detectAndCompute(intensity_u8, None)
    if desc is None or len(kps) == 0:
        return np.zeros((0, 2), np.float32), np.zeros((0, 32), np.uint8)
    pts = np.array([kp.pt for kp in kps], np.float32)
    return pts, desc.astype(np.uint8)
