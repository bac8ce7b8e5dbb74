"""SlamSystem: the public API (feed RGB-D frames -> poses + keyframe map).

Mirrors the reference's SlamSystem/app layer (SURVEY.md §3.1-3.3): a
device front end (fused per-frame program: track + fuse/switch) driven
from the host, a KeyframeManager for lifecycle, and a back-end thread
(loop closure + pose graph) consuming finalized keyframes.

Thread layout matches the reference's two-thread split: the front-end
(caller) thread drives the fused per-frame device program; the back-end
thread (OpenCV ORB + BoW + pose graph) dispatches its own device work —
the vmap-batched relocalization program — directly. JAX dispatch being
thread-safe is the invariant that makes this sound; shared host state
(BoW database, published poses) is lock-guarded.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from .core.camera import Intrinsics
from .core.config import SlamConfig
from .mapping.export import assemble_map, write_ply, write_tum_trajectory
from .mapping.keyframe import DeviceKeyframe
from .mapping.manager import KeyframeManager
from .reference_cpu import se3_np
from .tracking.step import MotionState, ProcessFrame, StepResult, pack_frame


class SlamSystem:
    """Dense RGB-D SLAM on TPU.

    Usage:
        slam = SlamSystem(intrinsics, config)
        for rgb, depth, t in frames:
            T_wc = slam.process_frame(rgb, depth, t)
        slam.finish()
        slam.save_trajectory("traj.txt"); slam.save_map("map.ply")
    """

    def __init__(self, intr: Intrinsics, config: Optional[SlamConfig] = None):
        self.intr = intr
        self.config = config or SlamConfig()
        # The consensus depth strata must span the sensor's valid
        # inverse-depth range: stratum_index clamps out-of-range pixels
        # into the edge bins, so a mismatched range would let near/far
        # pixels share (and pollute) an edge stratum's vote. Derive the
        # bin range from the configured depth limits — but only while the
        # fields are still at their dataclass defaults, so a range set
        # explicitly via config/JSON (e.g. deliberately narrowed strata)
        # is honored (advisor round-2).
        from .core.config import TrackingConfig as _TCfg

        _tdef = _TCfg()
        if (
            self.config.tracking.consensus_xi_min == _tdef.consensus_xi_min
            and self.config.tracking.consensus_xi_max == _tdef.consensus_xi_max
        ):
            self.config = self.config.override(
                **{
                    "tracking.consensus_xi_min": 1.0 / self.config.max_depth,
                    "tracking.consensus_xi_max": 1.0 / self.config.min_depth,
                }
            )
        self._step = ProcessFrame(intr, self.config)
        self.manager = KeyframeManager(
            intr, reloc_level=self.config.backend.reloc_level
        )
        self._kf_state: Optional[DeviceKeyframe] = None
        # Device-resident motion model (T_ck, delta, lost_count) — see
        # tracking.step.MotionState. Created at bootstrap.
        self._motion: Optional[MotionState] = None
        self._trajectory: List[Tuple[float, np.ndarray]] = []
        self._frame_count = 0
        self._lost_count = 0
        self._relocalized = False
        # True if any frame since the last keyframe switch showed live
        # consensus activity (ripened mask / rescue / vote exclusions) —
        # tags the NEXT odometry edge as episode-contaminated so the pose
        # graph can down-weight it (BackendConfig.episode_info_scale).
        self._episode_since_switch = False
        self.stats: List[dict] = []

        # Back end (loop closure + pose graph), optional.
        self.backend = None
        if self.config.backend.enabled:
            from .backend.loop_closure import BackendThread

            self.backend = BackendThread(self)

        # Live visualization (the reference's GUI thread), optional: a
        # lossy snapshot renderer fed from host-side data only — see
        # utils/live_view.py and VizConfig.
        self.viewer = None
        if self.config.viz.enabled:
            from .utils.live_view import LiveViewer

            self.viewer = LiveViewer(
                self.config.viz.out_dir,
                history=self.config.viz.history,
                map_every=self.config.viz.map_every,
            )

    # ------------------------------------------------------------------
    @property
    def T_wk(self) -> np.ndarray:
        return self.manager.active.T_wk

    def process_frame(
        self,
        rgb_u8: np.ndarray,
        depth_u16: np.ndarray,
        timestamp: float,
        packed=None,
    ) -> np.ndarray:
        """Track one frame; returns the world camera pose T_wc (4x4).

        This is the flight-depth-1 path: dispatch, sync, handle. ``feed()``
        chains several frames per host sync with identical semantics.
        ``packed`` optionally supplies the frame's device upload
        (``jnp.asarray(pack_frame(rgb_u8, depth_u16, cfg))``) prepared
        ahead of time — it must use this system's configured depth codec.
        """
        import time as _time

        _t0 = _time.perf_counter()
        if packed is None:
            packed = jnp.asarray(pack_frame(rgb_u8, depth_u16, self.config))

        if self._kf_state is None:
            T_wc = self._bootstrap(rgb_u8, timestamp, packed, depth_u16)
            return T_wc

        # Live pose-graph publication (the reference's back end publishes
        # corrected poses and the tracker rebases): apply pending
        # optimized keyframe poses before tracking this frame.
        self._apply_pose_updates()

        rec = self._dispatch(rgb_u8, depth_u16, timestamp, packed)
        # Host readback of the packed ~70-float vector — the only device
        # sync of the frame.
        res_np = StepResult.unpack(
            np.asarray(rec["res_vec"]), self.config.tracking.levels
        )
        T_wc, _ = self._handle(rec, res_np)
        # Wall time incl. upload + device step + readback (the readback is
        # a real device sync on this platform; block_until_ready is not).
        self.stats[-1]["ms"] = round((_time.perf_counter() - _t0) * 1e3, 2)
        return T_wc

    def _bootstrap(self, rgb_u8, timestamp, packed, depth_u16=None) -> np.ndarray:
        """First frame: becomes keyframe 0 at the origin."""
        self._kf_state = self._step.init_keyframe(packed)
        self._motion = MotionState.initial(self.config.tracking.consensus_bins)
        kf0 = self.manager.new_keyframe(timestamp, np.eye(4))
        kf0.rgb = np.ascontiguousarray(rgb_u8)
        if depth_u16 is not None:
            kf0.depth = np.ascontiguousarray(depth_u16)
        T_wc = np.eye(4)
        self._record(timestamp, T_wc, None)
        return T_wc

    def _dispatch(self, rgb_u8, depth_u16, timestamp, packed) -> dict:
        """Enqueue one frame's device step (no host sync). The input
        keyframe state is RETAINED in the returned record: if this frame's
        readback later shows a switch, that pytree holds the retiring
        keyframe's final fused planes for finalization."""
        prev_state = self._kf_state
        res_vec, kf2, motion2 = self._step(packed, prev_state, self._motion)
        self._kf_state = kf2
        self._motion = motion2
        return {
            "rgb": rgb_u8,
            "depth": depth_u16,
            "t": timestamp,
            "packed": packed,
            "prev_state": prev_state,
            "res_vec": res_vec,
        }

    def _handle(self, rec, res_np: StepResult):
        """Host bookkeeping for one frame's (already forced) StepResult.

        Returns (T_wc, relocalized). The device already executed the
        lost/switch/fuse branch AND the motion-model update; res_np.T is
        the effective pose vs the keyframe that was active DURING the
        frame (coast-and-hold already applied on lost frames).
        """
        timestamp = rec["t"]
        lost = bool(res_np.lost > 0.5)
        switch = bool(res_np.switch > 0.5)
        T_eff = se3_np.orthonormalize(res_np.T.astype(np.float64))
        T_wc = self.T_wk @ se3_np.inv(T_eff)
        relocalized = False
        # Consensus activity anywhere in the inter-keyframe interval
        # (including this frame, which may BE the switch frame) marks the
        # next odometry edge episode-contaminated. Persist/rescue/vote
        # exclusions only — a single un-ripened flag is routine noise.
        if (
            float(res_np.cons_flags_persist) > 0
            or float(res_np.rescue) > 0.5
            or float(res_np.consensus_frac) > 0
        ):
            self._episode_since_switch = True
        if lost:
            self._lost_count += 1
            # Recovery: after enough consecutive lost frames, try global
            # relocalization against the keyframe BoW database (the
            # reference's recovery mechanism).
            if (
                self.backend is not None
                and self._lost_count >= self.config.backend.reloc_after_lost
            ):
                T_reloc = self._try_relocalize(
                    rec["rgb"], rec["depth"], timestamp, rec["packed"]
                )
                if T_reloc is not None:
                    T_wc = T_reloc
                    self._lost_count = 0
                    self._relocalized = True
                    relocalized = True
        else:
            self._lost_count = 0
            if switch:
                self._on_keyframe_switch(timestamp, T_eff, T_wc, res_np, rec)
        self._record(timestamp, T_wc, res_np)
        if (
            self.viewer is not None
            and self._frame_count % max(self.config.viz.every_n, 1) == 0
        ):
            self._publish_viz(rec, lost)
        return T_wc, relocalized

    def _publish_viz(self, rec, lost: bool) -> None:
        """Hand the live viewer a host-data-only snapshot (lossy, cheap:
        list/reference assembly, no device readbacks, no rendering)."""
        act = self.manager.active
        self.viewer.publish(
            {
                "rgb": rec["rgb"],
                "depth": rec["depth"],
                "frame": self._frame_count - 1,
                "n_keyframes": len(self.manager.keyframes),
                "lost": lost,
                "kf_rgb": act.rgb,
                "kf_depth": act.depth,
                "kf_id": act.kf_id,
                "poses": [T for _, T in self._trajectory[-2000:]],
                "kf_poses": [k.T_wk.copy() for k in self.manager.keyframes],
                "kf_clouds": [
                    (k.T_wk.copy(), k.cloud)
                    for k in self.manager.keyframes
                    if k.cloud is not None
                ],
                "depth_scale": self.config.depth_scale,
                "min_depth": self.config.min_depth,
                "max_depth": self.config.max_depth,
            }
        )

    def _try_relocalize(self, rgb_u8, depth_u16, timestamp, packed):
        """Global relocalization of a lost frame against the BoW database.

        On success: the current frame becomes a fresh keyframe at the
        recovered world pose, a loop edge to the matched keyframe keeps
        the pose graph connected, and tracking resumes from identity.
        Returns the recovered T_wc, or None.
        """
        import cv2

        lc = self.backend.loop_closer
        gray = cv2.cvtColor(rgb_u8, cv2.COLOR_RGB2GRAY)
        from .backend.features import extract_orb

        _, desc = extract_orb(gray, self.config.backend.num_features)
        if len(desc) == 0:
            return None
        with lc.db_lock:
            # A huge query id disables the temporal-adjacency exclusion —
            # when lost, ANY keyframe is a legitimate candidate.
            candidates = lc.db.query(10**9, desc)
        if not candidates:
            return None
        cand_kfs = [
            self.manager.keyframes[cid]
            for cid, _ in candidates
            if self.manager.keyframes[cid].reloc_planes is not None
        ]
        if not cand_kfs:
            return None

        # Current-frame coarse planes (host numpy; only runs on lost frames).
        from .reference_cpu import odometry as odo

        level = self.backend.loop_closer.scorer.level
        pyr = odo.preprocess_frame(
            rgb_u8,
            depth_u16,
            level + 1,
            self.config.depth_scale,
            self.config.min_depth,
            self.config.max_depth,
        )
        cur_planes = {
            "intensity": pyr.intensity[level],
            "xi": pyr.xi[level],
            "mask": pyr.mask[level].astype(np.float32),
        }
        res = lc.scorer.score_pairs(
            [kf.reloc_planes for kf in cand_kfs], [cur_planes] * len(cand_kfs)
        )
        best, best_err = None, np.inf
        for i in range(len(cand_kfs)):
            if lc.scorer.accept(res, i) and float(res.error[i]) < best_err:
                best, best_err = i, float(res.error[i])
        if best is None:
            return None

        cand = cand_kfs[best]
        T_qc = se3_np.orthonormalize(np.asarray(res.T[best], np.float64))
        T_wc = cand.T_wk @ se3_np.inv(T_qc)

        # The current frame founds a fresh keyframe at the recovered pose;
        # reset the device tracking state (identity pose + velocity).
        self._kf_state = self._step.init_keyframe(packed)
        self._motion = MotionState.initial(self.config.tracking.consensus_bins)
        self._episode_since_switch = False
        new = self.manager.new_keyframe(timestamp, T_wc)
        new.rgb = np.ascontiguousarray(rgb_u8)
        # Loop edge to the matched keyframe keeps the pose graph connected.
        H = np.asarray(res.H[best], np.float64) * float(res.n_valid[best])
        self.backend.add_external_loop_edge(
            {
                "from_id": cand.kf_id,
                "to_id": new.kf_id,
                "T_rel": se3_np.inv(T_qc),
                "information": 0.5 * (H + H.T),
            }
        )
        return T_wc

    def _on_keyframe_switch(
        self,
        timestamp: float,
        T_ck: np.ndarray,
        T_wc: np.ndarray,
        res: StepResult,
        rec: dict,
    ) -> None:
        old = self.manager.active
        # The device created the new keyframe in-program on this frame; the
        # retiring keyframe's final fused planes are the step's INPUT state,
        # retained in the dispatch record for exactly this moment (flights
        # may hand us the switch flag several frames after the fact).
        #
        # Finalization (a ~1 MB packed readback + cloud extraction + the
        # ORB/BoW pipeline) runs on the BACK-END thread when one exists:
        # on the sandbox TPU the readback alone stalls the front end
        # ~60-100 ms, and round 4's churn bench measured ~460 ms marginal
        # per switch with everything on the caller thread — the retiring
        # keyframe's device pytree rides the submit queue and stays alive
        # until the back end has read it. Without a back end, finalize
        # stays synchronous (same artifacts, caller pays).
        if self.backend is None:
            self.manager.finalize(old, rec["prev_state"])
        new = self.manager.new_keyframe(timestamp, T_wc)
        new.rgb = np.ascontiguousarray(rec["rgb"])
        if self.viewer is not None:
            new.depth = np.ascontiguousarray(rec["depth"])
        # Odometry edge old->new: T_{old<-new} = inv(T_ck). Edges whose
        # interval saw consensus activity carry the mover's drag; soften
        # them so loop-closure corrections land THERE, not in the clean
        # chain (see BackendConfig.episode_info_scale).
        info = np.linalg.pinv(res.cov.astype(np.float64) + 1e-12 * np.eye(6))
        episode = self._episode_since_switch
        if episode:
            info = info * float(self.config.backend.episode_info_scale)
        self._episode_since_switch = False
        self.manager.add_odometry_edge(
            old.kf_id, new.kf_id, se3_np.inv(T_ck), info, episode=episode
        )
        if self.backend is not None:
            self.backend.submit(old, rec["prev_state"])

    def _record(self, timestamp, T_wc, res: Optional[StepResult]):
        self._trajectory.append((timestamp, T_wc.copy()))
        rec = {
            "frame": self._frame_count,
            "t": timestamp,
            "kf_id": self.manager.active.kf_id,
        }
        if res is not None:
            rec.update(
                overlap=float(res.overlap),
                inliers=float(res.inlier_frac[0]),
                error=float(res.errors[0]),
                n_fused=float(res.n_fused),
                lost=bool(res.lost > 0.5),
                switch=bool(res.switch > 0.5),
                relocalized=self._relocalized,
                consensus_frac=float(res.consensus_frac),
                guard_fired=bool(res.guard_fired > 0.5),
                div_trans=float(res.div_trans),
                div_rot=float(res.div_rot),
                cons_flags=float(res.cons_flags),
                cons_flags_persist=float(res.cons_flags_persist),
                rescue=bool(res.rescue > 0.5),
            )
        self._relocalized = False
        self.stats.append(rec)
        self._frame_count += 1

    # ------------------------------------------------------------------
    def feed(self, frames, flight_depth: Optional[int] = None) -> List[np.ndarray]:
        """Process an iterable of frames in pipelined flights.

        ``frames`` yields objects with .rgb/.depth/.timestamp (the
        datasets' Frame) or (rgb, depth, timestamp) tuples. Up to
        ``flight_depth`` (default config.pipeline_depth) per-frame device
        programs are chained WITHOUT host syncs — the on-device motion
        model + in-program keyframe switching make each step's inputs
        purely device-resident — then ONE readback forces the whole chain
        and the host replays its bookkeeping for every frame in order. On
        the sandbox TPU a not-yet-ready readback costs ~28 ms regardless
        of size while chained dispatches are ~free, so flights amortize
        the dominant fixed cost by ~flight_depth. Returns per-frame world
        poses.
        """
        # Per-frame uploads, deliberately: batching a whole flight's
        # frames into one (k, 3, H, W) device_put measured 64 vs
        # 79 ms/frame in an ISOLATED probe, but 20 ms/frame WORSE in the
        # production pipeline (round 3) — the per-frame device-side
        # slices serialize against the chained frame programs, while
        # separate uploads overlap with them.
        depth_k = flight_depth or getattr(self.config, "pipeline_depth", 8)
        poses: List[np.ndarray] = []
        pending: List[dict] = []
        for f in frames:
            if hasattr(f, "rgb"):
                rgb, depth, t = f.rgb, f.depth, f.timestamp
            else:
                rgb, depth, t = f
            packed = jnp.asarray(pack_frame(rgb, depth, self.config))
            if self._kf_state is None:
                poses.append(self.process_frame(rgb, depth, t, packed=packed))
                continue
            if not pending:
                self._apply_pose_updates()
            pending.append(self._dispatch(rgb, depth, t, packed))
            if len(pending) >= depth_k:
                poses.extend(self._drain(pending))
                pending = []
        if pending:
            poses.extend(self._drain(pending))
        return poses

    def _drain(self, pending: List[dict]) -> List[np.ndarray]:
        """Force + handle one flight of dispatched frames, in order.

        Forcing the LAST result syncs the whole chain (one expensive
        readback); earlier results are then already materialized and read
        for free. If a frame triggers relocalization mid-flight, the
        remaining frames' device results (computed against the pre-reloc
        state) are discarded and those frames are re-dispatched against
        the fresh state — the rare-path cost of the lost-recovery stall.
        """
        import time as _time

        _t0 = _time.perf_counter()
        levels = self.config.tracking.levels
        # ONE batched readback for the whole flight: on this platform a D2H
        # of a value never read before costs ~28-30 ms EVEN IF the chain is
        # already forced (measured round 2), so reading the 8 per-frame
        # vectors individually would cost ~240 ms/flight. Stacking them in
        # one tiny device program and reading that back once pays the
        # latency once.
        stacked = np.asarray(jnp.stack([rec["res_vec"] for rec in pending]))
        poses = []
        for i, rec in enumerate(pending):
            res_np = StepResult.unpack(stacked[i], levels)
            T_wc, relocalized = self._handle(rec, res_np)
            poses.append(T_wc)
            if relocalized and i + 1 < len(pending):
                # Device state was reset by relocalization: replay the
                # rest of the flight against it (depth-1; rare path).
                for rec2 in pending[i + 1 :]:
                    self._apply_pose_updates()
                    rec3 = self._dispatch(
                        rec2["rgb"], rec2["depth"], rec2["t"], rec2["packed"]
                    )
                    res3 = StepResult.unpack(np.asarray(rec3["res_vec"]), levels)
                    T_wc3, _ = self._handle(rec3, res3)
                    poses.append(T_wc3)
                break
        ms = round((_time.perf_counter() - _t0) * 1e3 / max(len(poses), 1), 2)
        for rec_stat in self.stats[-len(poses) :]:
            rec_stat.setdefault("ms", ms)
        return poses

    def reset(self) -> None:
        """Clear all tracking/map/backend state for a fresh sequence while
        KEEPING the compiled device programs (the ProcessFrame jit and its
        caches) — constructing a new SlamSystem pays the multi-minute VGA
        bootstrap compile again on the sandbox TPU (SURVEY.md App. D #5).
        Used by multi-sequence runs (bench.py's keyframe-churn variant,
        live restarts). The back-end thread, if any, is drained and
        replaced with a fresh one (the BoW database and pose graph are
        per-sequence state)."""
        if self.backend is not None:
            self.backend.finish()
            from .backend.loop_closure import BackendThread

            self.backend = BackendThread(self)
        self.manager = KeyframeManager(
            self.intr, reloc_level=self.config.backend.reloc_level
        )
        self._kf_state = None
        self._motion = None
        self._trajectory = []
        self._frame_count = 0
        self._lost_count = 0
        self._relocalized = False
        self._episode_since_switch = False
        self.stats = []

    def finish(self) -> None:
        """Finalize the active keyframe and drain the back end."""
        if self._kf_state is not None and self.manager.active.cloud is None:
            self.manager.finalize(self.manager.active, self._kf_state)
        if self.backend is not None:
            self.backend.submit(self.manager.active)
            self.backend.finish()
            self._apply_pose_updates()
        if self.viewer is not None:
            self.viewer.close()

    def _apply_pose_updates(self):
        """Consume optimized keyframe poses from the back end (if any):
        rebase keyframes, the recorded trajectory (each frame moves with
        its keyframe), and the live motion-model state. Called every frame
        (live publication) and at finish."""
        if self.backend is None or not self.backend.has_updates():
            return
        updates = self.backend.take_updates()
        if not updates:
            return
        old_poses = {kf.kf_id: kf.T_wk.copy() for kf in self.manager.keyframes}
        active_id = self.manager.active.kf_id
        for kf_id, T_new in updates.items():
            self.manager.keyframes[kf_id].T_wk = T_new
        # Rebase trajectory records through per-frame keyframe association.
        for i, rec in enumerate(self.stats):
            kf_id = rec["kf_id"]
            if kf_id in updates:
                t, T_wc = self._trajectory[i]
                correction = updates[kf_id] @ np.linalg.inv(old_poses[kf_id])
                self._trajectory[i] = (t, correction @ T_wc)
        # The motion model lives on device and is purely RELATIVE (T_ck and
        # delta are keyframe-/camera-frame quantities), so rebasing world
        # keyframe poses requires no motion-state correction.
        del active_id

    def trajectory(self) -> List[Tuple[float, np.ndarray]]:
        return list(self._trajectory)

    def poses(self) -> List[np.ndarray]:
        return [T for _, T in self._trajectory]

    def map_points(self, voxel: float = 0.0) -> np.ndarray:
        clouds = [kf.cloud for kf in self.manager.keyframes]
        poses = [kf.T_wk for kf in self.manager.keyframes]
        return assemble_map(clouds, poses, voxel)

    def save_trajectory(self, path: str) -> None:
        write_tum_trajectory(path, self._trajectory)

    def save_map(self, path: str, voxel: float = 0.0) -> None:
        """Write the global cloud; format by extension (.ply or .pcd)."""
        if path.lower().endswith(".pcd"):
            from .mapping.export import write_pcd

            write_pcd(path, self.map_points(voxel))
        else:
            write_ply(path, self.map_points(voxel))
