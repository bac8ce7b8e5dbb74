"""Independent numpy CPU reference implementations.

These mirror the reference's CUDA kernel semantics (SURVEY.md §2.2 K1–K10)
in straightforward vectorized numpy, written independently of the JAX/Pallas
device path. They serve as the correctness oracle: every device op is
unit-tested against these to tight tolerances, and the full device tracker
is validated against this forward-compositional tracker on synthetic
sequences (BASELINE.json config 1: "single frame-pair dense odometry ...
CPU ref").

Deliberately favors clarity over speed — this code never runs in the
real-time path.
"""

from . import odometry, se3_np  # noqa: F401
