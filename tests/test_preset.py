"""SlamConfig.preset — the consolidated real-hardware flip list.

The "real-v5e" preset exists so the intended hardware configuration is
ONE switch (round-4 VERDICT item 4) instead of prose scattered across
BASELINE.md appendices. These tests pin (a) the flip list itself, (b)
that the preset constructs and TRACKS a clip end to end (every flip
active at once: u12 codec + early-exit while_loop + bf16 planes +
stacked gather), and (c) that the stacked corner gather is bit-identical
to the split form.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from rgbid_tpu.core.camera import Intrinsics
from rgbid_tpu.core.config import SlamConfig
from rgbid_tpu.datasets import synthetic
from rgbid_tpu.eval import absolute_trajectory_error
from rgbid_tpu.system import SlamSystem

INTR = Intrinsics(fx=258.6, fy=258.2, cx=159.3, cy=127.6, width=320, height=240)


def test_from_json_partial_takes_dataclass_defaults():
    """A partial (or empty) deployment JSON must land EXACTLY on the
    dataclass defaults for every omitted key. Round-4 regression: a
    duplicated pipeline_depth=8 literal inside from_json silently gave
    any JSON omitting the key 4x-shallower flights than SlamConfig()."""
    assert SlamConfig.from_json("{}") == SlamConfig()
    # Partial sub-config: everything else still at defaults.
    cfg = SlamConfig.from_json('{"tracking": {"levels": 3}}')
    assert cfg.tracking.levels == 3
    assert cfg == SlamConfig().override(**{"tracking.levels": 3})
    # Top-level scalar override sticks; the rest stays default.
    cfg2 = SlamConfig.from_json('{"pipeline_depth": 8}')
    assert cfg2 == SlamConfig().override(pipeline_depth=8)


def test_preset_names():
    assert SlamConfig.preset("default") == SlamConfig()
    assert SlamConfig.preset("sandbox") == SlamConfig()
    with pytest.raises(KeyError):
        SlamConfig.preset("nope")


def test_real_v5e_flip_list():
    cfg = SlamConfig.preset("real-v5e")
    assert cfg.depth_codec == "u12"
    assert cfg.tracking.early_exit_tol == pytest.approx(1e-5)
    assert cfg.tracking.conv_skip_tol == 0.0  # subsumed by early_exit
    assert cfg.tracking.plane_dtype == "bf16"
    assert cfg.tracking.stacked_gather is True
    # Sandbox-vs-HW-neutral knobs must NOT move (accuracy was tuned on
    # them): iteration schedule, consensus, fusion cadence.
    base = SlamConfig()
    assert cfg.tracking.iters == base.tracking.iters
    assert cfg.tracking.consensus == base.tracking.consensus
    assert cfg.fusion.fuse_every == base.fusion.fuse_every
    assert cfg.pipeline_depth == base.pipeline_depth
    # Round-trips through JSON (deployment configs get serialized).
    assert SlamConfig.from_json(cfg.to_json()) == cfg


def test_real_v5e_preset_tracks_a_clip():
    """Full system under the preset: every hardware flip active at once
    on the CPU backend (interpret-mode kernels), QVGA, 10 frames."""
    cfg = SlamConfig.preset("real-v5e").override(
        **{"tracking.levels": 3, "tracking.iters": (3, 6, 12),
           "pipeline_depth": 4}
    )
    seq = synthetic.generate_sequence(
        n_frames=10, intr=INTR, motion="orbit", trans_amp=0.15,
        rot_amp=0.04, xi_noise_sigma=0.003,
    )
    slam = SlamSystem(INTR, cfg)
    slam.feed(list(seq.frames()))
    slam.finish()
    gt0 = np.linalg.inv(seq.gt_poses[0])
    ate = absolute_trajectory_error(
        [gt0 @ T for T in seq.gt_poses], slam.poses()
    )
    # bf16 planes + u12 codec cost a little vs the f32/u16 defaults;
    # the bound is still clean-scenario-class.
    assert ate["rmse"] < 5e-3, ate


def test_stacked_gather_bit_identical():
    """stacked_gather=True/False must sample identically (the flip is a
    dispatch-count trade, never a semantics trade)."""
    from rgbid_tpu.ops.warp import sample_stack7, sample_tracker_planes

    rng = np.random.default_rng(0)
    stack = jnp.asarray(rng.standard_normal((5, 40, 64)).astype(np.float32))
    u = jnp.asarray(rng.uniform(-5, 70, (40, 64)).astype(np.float32))
    v = jnp.asarray(rng.uniform(-5, 45, (40, 64)).astype(np.float32))
    a = sample_stack7(stack, u, v, stacked=False)
    b = sample_stack7(stack, u, v, stacked=True)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    a3 = sample_tracker_planes(stack[:3], u, v, stacked=False)
    b3 = sample_tracker_planes(stack[:3], u, v, stacked=True)
    for x, y in zip(a3, b3):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
