"""Full-state snapshot / resume.

The reference persists only a trajectory + map at shutdown (SURVEY.md §5
"Checkpoint / resume: none"). Because all dense state here lives in
pytrees, a full snapshot is nearly free — so the rebuild adds one: the
active device keyframe, host keyframe records (poses, clouds, reloc
planes, descriptors), graph edges, trajectory and config hash go into a
single .npz; `restore` reconstructs a SlamSystem that continues tracking.
"""

from __future__ import annotations

import json
from typing import TYPE_CHECKING

import jax
import jax.numpy as jnp
import numpy as np

if TYPE_CHECKING:
    from ..system import SlamSystem

FORMAT_VERSION = 3  # v3: DeviceKeyframe hits + mask_full leaves (K8)


def save(system: "SlamSystem", path: str) -> None:
    arrays = {}
    meta = {
        "version": FORMAT_VERSION,
        "config": system.config.to_dict(),
        "config_hash": system.config.config_hash(),
        "intrinsics": list(system.intr),
        "frame_count": system._frame_count,
        "stats": system.stats,
        "n_keyframes": len(system.manager.keyframes),
        "edges": [
            {"from_id": e.from_id, "to_id": e.to_id, "episode": e.episode}
            for e in system.manager.edges
        ],
    }
    # Accepted loop edges (back end): without them, resumed runs would
    # silently drop all pre-snapshot loop constraints from future
    # pose-graph optimizations.
    loop_edges = []
    if system.backend is not None:
        loop_edges = list(system.backend._loop_edges)
    meta["loop_edges"] = [
        {"from_id": e["from_id"], "to_id": e["to_id"]} for e in loop_edges
    ]
    for i, e in enumerate(loop_edges):
        arrays[f"ledge_{i}_T"] = np.asarray(e["T_rel"])
        arrays[f"ledge_{i}_info"] = np.asarray(e["information"])
    # Device motion state (bit-exact resume of the constant-velocity model).
    if system._motion is not None:
        arrays["T_ck"] = np.asarray(system._motion.T_ck)
        arrays["delta"] = np.asarray(system._motion.delta)
        arrays["lost_count"] = np.asarray(system._motion.lost_count)
        if system._motion.cons_excluded is not None:
            arrays["cons_excluded"] = np.asarray(system._motion.cons_excluded)
    arrays["traj_t"] = np.asarray([t for t, _ in system._trajectory])
    arrays["traj_T"] = np.stack([T for _, T in system._trajectory]) if system._trajectory else np.zeros((0, 4, 4))

    for i, e in enumerate(system.manager.edges):
        arrays[f"edge_{i}_T"] = e.T_rel
        arrays[f"edge_{i}_info"] = e.information
    for kf in system.manager.keyframes:
        p = f"kf_{kf.kf_id}_"
        arrays[p + "T_wk"] = kf.T_wk
        arrays[p + "ts"] = np.asarray(kf.timestamp)
        if kf.rgb is not None:
            arrays[p + "rgb"] = kf.rgb
        if kf.cloud is not None:
            arrays[p + "cloud"] = kf.cloud
        if kf.descriptors is not None:
            arrays[p + "desc"] = kf.descriptors
            arrays[p + "kpts"] = kf.keypoints
        if kf.reloc_planes is not None:
            for k, v in kf.reloc_planes.items():
                arrays[p + "rp_" + k] = v
    # Active device keyframe state (flattened pytree). bf16 leaves (the
    # Jacobian planes) are stored as f32 (numpy has no bfloat16) and cast
    # back on restore.
    if system._kf_state is not None:
        leaves, treedef = jax.tree_util.tree_flatten(system._kf_state)
        meta["kf_state_n_leaves"] = len(leaves)
        for i, leaf in enumerate(leaves):
            if leaf.dtype == jnp.bfloat16:
                arrays[f"kfstate_{i}"] = np.asarray(leaf.astype(jnp.float32))
            else:
                arrays[f"kfstate_{i}"] = np.asarray(leaf)
    arrays["meta_json"] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
    np.savez_compressed(path, **arrays)


def restore(path: str, config=None) -> "SlamSystem":
    from ..core.camera import Intrinsics
    from ..core.config import SlamConfig
    from ..mapping.keyframe import Keyframe
    from ..mapping.manager import OdometryEdge
    from ..system import SlamSystem

    z = np.load(path, allow_pickle=False)
    meta = json.loads(bytes(z["meta_json"].tobytes()).decode())
    if meta["version"] != FORMAT_VERSION:
        raise ValueError(f"snapshot version {meta['version']} != {FORMAT_VERSION}")
    intr = Intrinsics(*meta["intrinsics"])
    cfg = config or SlamConfig.from_json(json.dumps(meta["config"]))
    system = SlamSystem(intr, cfg)

    system._frame_count = meta["frame_count"]
    system.stats = meta["stats"]
    if "T_ck" in z:
        from ..tracking.step import MotionState

        bins = cfg.tracking.consensus_bins
        system._motion = MotionState(
            T_ck=jnp.asarray(z["T_ck"], jnp.float32),
            delta=jnp.asarray(z["delta"], jnp.float32),
            lost_count=jnp.asarray(z["lost_count"], jnp.float32),
            cons_excluded=jnp.asarray(
                z["cons_excluded"], jnp.float32
            )
            if "cons_excluded" in z
            else jnp.zeros((bins,), jnp.float32),
        )
    system._trajectory = [
        (float(t), T) for t, T in zip(z["traj_t"], z["traj_T"])
    ]
    for i in range(meta["n_keyframes"]):
        p = f"kf_{i}_"
        kf = Keyframe(kf_id=i, timestamp=float(z[p + "ts"]), T_wk=z[p + "T_wk"])
        if p + "rgb" in z:
            kf.rgb = z[p + "rgb"]
        if p + "cloud" in z:
            kf.cloud = z[p + "cloud"]
        if p + "desc" in z:
            kf.descriptors = z[p + "desc"]
            kf.keypoints = z[p + "kpts"]
        rp = {
            k[len(p + "rp_") :]: z[k] for k in z.files if k.startswith(p + "rp_")
        }
        if rp:
            kf.reloc_planes = rp
        system.manager.keyframes.append(kf)
    for i, e in enumerate(meta["edges"]):
        system.manager.edges.append(
            OdometryEdge(
                e["from_id"], e["to_id"], z[f"edge_{i}_T"],
                z[f"edge_{i}_info"], e.get("episode", False),
            )
        )
    if system.backend is not None:
        # Rehydrate the back end: loop edges back into the optimizer's
        # input set, and every restored keyframe's descriptors back into
        # the BoW database (else loop closure / lost-frame relocalization
        # could never match any pre-snapshot keyframe).
        for i, e in enumerate(meta.get("loop_edges", [])):
            system.backend._loop_edges.append(
                {
                    "from_id": e["from_id"],
                    "to_id": e["to_id"],
                    "T_rel": z[f"ledge_{i}_T"],
                    "information": z[f"ledge_{i}_info"],
                }
            )
        lc = system.backend.loop_closer
        for kf in system.manager.keyframes:
            if kf.descriptors is not None and len(kf.descriptors) > 0:
                with lc.db_lock:
                    lc.db.insert(kf.kf_id, kf.descriptors)
                    kf.bow = dict(lc.db.entries.get(kf.kf_id, {}))
                system.backend._processed.add(kf.kf_id)
    if "kf_state_n_leaves" in meta:
        # Rebuild the pytree structure (and leaf dtypes) from a template of
        # the same config.
        dummy_leaves, template = _kf_state_template(system)
        leaves = [
            jnp.asarray(z[f"kfstate_{i}"]).astype(d.dtype)
            for i, d in enumerate(dummy_leaves)
        ]
        system._kf_state = jax.tree_util.tree_unflatten(template, leaves)
    return system


def _kf_state_template(system: "SlamSystem"):
    """(leaves, treedef) of a DeviceKeyframe for this system's config."""
    from ..mapping.keyframe import create_device_keyframe
    from ..tracking.frames import preprocess_frame

    h, w = system.intr.height, system.intr.width
    rgb = jnp.zeros((h, w, 3), jnp.uint8)
    d = jnp.zeros((h, w), jnp.uint16)
    jac_dtype = (
        jnp.bfloat16 if system.config.tracking.jac_dtype == "bf16" else jnp.float32
    )
    dummy = create_device_keyframe(
        preprocess_frame(
            rgb,
            d,
            system.config.tracking.levels,
            esm=system.config.tracking.jacobian == "esm",
        ),
        system.intr,
        system.config.fusion,
        jac_dtype,
        system.config.tracking.jacobian,
    )
    return jax.tree_util.tree_flatten(dummy)
