"""Global matmul precision policy.

On TPU, XLA matmuls default to bfloat16 operand precision on the MXU.
Every matmul in this framework is tiny and accuracy-critical (6x6
Gauss-Newton normal-equation reductions over ~3e5 pixels, 4x4 SE(3)
composes, 3x3 orthonormalizations); bf16 accumulation there measurably
corrupts trajectories (13.4 mm vs 1.4 mm ATE on the same clip). The heavy
compute (elementwise pipelines, gathers, convs) is unaffected by this
flag, so forcing float32 costs nothing.

Imported for its side effect by rgbid_tpu.core and rgbid_tpu.ops.
"""

import jax

jax.config.update("jax_default_matmul_precision", "highest")
