"""Multi-chip parallelism (jax.sharding / shard_map).

The reference is a single-GPU system with no distributed dimension
(SURVEY.md §2.3); the honest multi-chip axes for dense SLAM are:

* **DP over loop-closure candidate pairs** (embarrassingly parallel):
  shard the batched relocalization scorer's batch axis across a mesh.
* **SP (spatial) over keyframe rows** inside the tracker's per-pixel
  reductions: each chip owns a row block of the keyframe template and
  produces partial J^T W J / J^T W r sums; tiny `lax.psum` collectives
  (~30 floats) ride the ICI each IRLS iteration, and the 6x6 solve +
  pose update are replicated.

TP/PP/EP have no counterpart here (no weight matrices, no layer pipeline,
no experts) — documented rather than faked.
"""

from .mesh import make_mesh  # noqa: F401
from .reloc import shard_reloc_batch  # noqa: F401
from .spmd import SpmdTracker  # noqa: F401
from .tracker_spmd import ShardedTracker  # noqa: F401
