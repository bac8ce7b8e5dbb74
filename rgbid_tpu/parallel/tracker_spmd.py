"""Row-sharded SPMD execution of the PRODUCTION tracker.

Unlike parallel/spmd.py (a self-contained single-level IC demonstration
kept for its oracle tests), this wraps the real `tracking.tracker._track_impl`
— the exact code the per-frame device program runs, ESM kernels and all —
in a `shard_map` over a 1-D "sp" mesh:

* keyframe template planes (intensity/xi/mask/grad-jac) are row-sharded;
  each device backprojects its band with global row indices
  (`backproject_grid(row_offset=...)`);
* the current frame's sampling stacks are REPLICATED (a template pixel
  can warp anywhere in the current image, so the gather needs the full
  frame — at VGA that is ~9 MB, trivially affordable per chip);
* each IRLS iteration all-reduces ~42 floats of normal-equation
  statistics (`gauss_newton.allreduce_irls` psum) and every device then
  performs the identical 6x6 solve + pose update (replicated — cheaper
  than sharding a 6x6 solve).

Used by `__graft_entry__.dryrun_multichip` and asserted equal to the
single-device tracker in tests/test_parallel.py.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
from jax.sharding import Mesh, PartitionSpec as P

from ..core.camera import Intrinsics, level_intrinsics
from ..core.config import TrackingConfig
from ..tracking.frames import FrameLevel, KeyframeLevel
from ..tracking.tracker import TrackResult, _track_impl


def _kf_specs(levels: int, axis: str) -> Tuple[KeyframeLevel, ...]:
    """Row-sharded PartitionSpecs for the keyframe template pytree."""
    return tuple(
        KeyframeLevel(
            intensity=P(axis, None),
            xi=P(axis, None),
            mask=P(axis, None),
            jac=P(None, axis, None),  # (4|12, H, W): shard the row axis
        )
        for _ in range(levels)
    )


def _cur_specs(levels: int) -> Tuple[FrameLevel, ...]:
    """Replicated specs for the current frame (warp targets anywhere)."""
    rep = P(None, None)
    return tuple(
        FrameLevel(intensity=rep, xi=rep, mask=rep, stack7=P(None, None, None))
        for _ in range(levels)
    )


class ShardedTracker:
    """shard_map-wrapped production tracker bound to (mesh, intr, cfg).

    Every level's height must divide by the mesh size (VGA's 480/240/120
    rows shard evenly up to 8 ways for a 3-level pyramid; pad or lower
    `levels` otherwise).
    """

    def __init__(self, mesh: Mesh, intr: Intrinsics, cfg: TrackingConfig):
        if getattr(cfg, "jacobian", "ic") != "esm":
            raise ValueError("ShardedTracker supports the ESM production path")
        self.mesh = mesh
        self.cfg = cfg
        self.axis = mesh.axis_names[0]
        self.intrs = tuple(level_intrinsics(intr, l) for l in range(cfg.levels))
        n = mesh.devices.size
        strides = tuple(getattr(cfg, "template_stride", ()) or ())
        strides = strides + (1,) * max(0, cfg.levels - len(strides))
        for l in range(cfg.levels):
            h = self.intrs[l].height
            if h % n:
                raise ValueError(
                    f"level {l} height {h} not divisible by mesh size {n}"
                )
            # Each device decimates its OWN row band (template_stride);
            # per-band [::s] equals the global [::s] restriction only when
            # the band height divides by s — otherwise bands sample
            # misaligned rows and sharded silently diverges from
            # single-device (VGA/8 = 60 rows with s=2: fine).
            if (h // n) % strides[l]:
                raise ValueError(
                    f"level {l} per-device band height {h // n} not "
                    f"divisible by template_stride {strides[l]}"
                )

        def impl(kf, cur, T_init, cons_prev):
            return _track_impl(
                kf, cur, T_init, self.intrs, cfg,
                axis_name=self.axis, cons_prev=cons_prev,
            )

        sharded = jax.shard_map(
            impl,
            mesh=mesh,
            in_specs=(
                _kf_specs(cfg.levels, self.axis),
                _cur_specs(cfg.levels),
                P(),  # T_init replicated
                P(),  # cons_prev (persistence history) replicated
            ),
            out_specs=jax.tree_util.tree_map(
                lambda _: P(), TrackResult(*[0] * len(TrackResult._fields))
            ),
            check_vma=False,  # psum'd outputs are replicated by construction
        )
        self._fn = jax.jit(sharded)

    def track(
        self,
        kf: Tuple[KeyframeLevel, ...],
        cur: Tuple[FrameLevel, ...],
        T_init: jax.Array,
        cons_prev: jax.Array | None = None,
    ) -> TrackResult:
        # The consensus persistence gate must behave identically under
        # SPMD: without history the tracker waives persistence (treats
        # every stratum as long-flagged), a single-shot semantic that
        # would let one hard frame mask strata or fire hostage rescue in
        # a streaming context. Default to the zeros history a fresh
        # MotionState carries (advisor round-2 medium finding).
        if cons_prev is None:
            import jax.numpy as jnp

            cons_prev = jnp.zeros(
                (getattr(self.cfg, "consensus_bins", 6),), jnp.float32
            )
        return self._fn(kf, cur, T_init, cons_prev)
