"""Device compute ops (JAX/XLA + Pallas).

TPU-native equivalents of the reference's CUDA kernel layer (SURVEY.md §2.2
K1–K12). Design per SURVEY.md §7: bilinear warp sampling uses XLA 2-D
gather (Pallas cannot lower dynamic gather on this platform); the
gather-free per-pixel pipelines (residual + Student-t weight + J^T W J /
J^T W r reduction, and inverse-depth fusion) are fused — first as pure XLA
(oracle-validated), then as Pallas mega-kernels.
"""

from .. import _precision  # noqa: F401  (forces f32 matmul precision)


from . import gauss_newton, image, warp  # noqa: F401
