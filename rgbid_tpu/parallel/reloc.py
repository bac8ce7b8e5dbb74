"""Data-parallel relocalization scoring across a device mesh.

Shards the batch axis of the vmapped pair-alignment program (the only
embarrassingly parallel axis in SLAM) with NamedSharding — XLA runs each
chip's share of candidate pairs locally with zero collectives.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from ..backend.relocalization import RelocResult, RelocScorer


def shard_reloc_batch(
    scorer: RelocScorer, mesh: Mesh, templates, currents
) -> RelocResult:
    """Like scorer.score_pairs but with the batch sharded over ``mesh``.

    The batch is padded to a multiple of the mesh size.
    """
    axis = mesh.axis_names[0]
    n_dev = mesh.shape[axis]
    B = len(templates)
    pad = (-B) % n_dev
    zt = {k: np.zeros_like(templates[0][k]) for k in templates[0]}
    temps = list(templates) + [zt] * pad
    curs = list(currents) + [dict(zt)] * pad

    sh = NamedSharding(mesh, P(axis, None, None))
    sh_T = NamedSharding(mesh, P(axis, None, None))

    def stack(seq, k):
        return jax.device_put(
            jnp.asarray(np.stack([s[k] for s in seq]), jnp.float32), sh
        )

    T0 = jax.device_put(
        jnp.tile(jnp.eye(4, dtype=jnp.float32)[None], (B + pad, 1, 1)), sh_T
    )
    out = scorer._fn(
        stack(temps, "intensity"), stack(temps, "xi"), stack(temps, "mask"),
        stack(curs, "intensity"), stack(curs, "xi"), stack(curs, "mask"),
        T0,
    )
    return RelocResult(*[np.asarray(x)[:B] for x in out])
