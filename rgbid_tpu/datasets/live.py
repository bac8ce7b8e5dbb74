"""Live frame source: follow a GROWING TUM-format capture directory.

The software-honest equivalent of the reference's OpenNI2 grabber
(SURVEY.md §2.1 "live grabber" — RGBiD-SLAM's CameraGrabber feeds
VisodoTracker frames as the sensor produces them). This sandbox has no
camera, but every headless RGB-D capture daemon (openni2_recorder,
realsense-record, ROS bag exporters) writes exactly the TUM layout —
PNGs plus append-only rgb.txt/depth.txt indexes — so "follow that
directory as it grows" IS live capture from the SLAM system's point of
view: frames arrive over time, arbitrarily interleaved RGB/depth
timestamps, no known end.

Semantics:

* yields `datasets.Frame` in timestamp order, exactly once each, with
  the same association/undistortion/calibration plumbing as the offline
  `TumSequence` reader (one shared implementation — `refresh()` re-reads
  the index files between polls);
* association happens on the FULL lists each poll (the matcher is
  deterministic, so already-yielded pairs keep their association) and a
  timestamp watermark guarantees exactly-once delivery even when a
  depth file for an already-seen RGB timestamp arrives late — such
  pairs are DROPPED rather than yielded out of order (a live consumer
  cannot rewind), matching grabber semantics (a frame missed is a frame
  dropped);
* `stop()` (or `idle_timeout` seconds without new data) ends the
  stream — the capture daemon going away is the normal shutdown signal.

Wrap in `datasets.prefetch_frames` to overlap PNG decode with SLAM
compute, same as the offline reader. Cite: reference CameraGrabber
(SURVEY.md §2.1); the interface contract is `datasets.Frame`.
"""

from __future__ import annotations

import os
import time
from typing import Iterator, Optional

import numpy as np

from . import Frame
from .tum import TumSequence


class LiveSource:
    """Follow a growing TUM-format capture directory in real time."""

    def __init__(
        self,
        seq_dir: str,
        poll_interval: float = 0.05,
        idle_timeout: float = 10.0,
        wait_for_dir: float = 30.0,
        **tum_kwargs,
    ):
        self.dir = seq_dir
        self.poll_interval = float(poll_interval)
        self.idle_timeout = float(idle_timeout)
        self.wait_for_dir = float(wait_for_dir)
        self._tum_kwargs = tum_kwargs
        self._seq: Optional[TumSequence] = None
        self._stopped = False

    def stop(self) -> None:
        """End the stream after the frames already indexed."""
        self._stopped = True

    @property
    def intrinsics(self):
        self._open()
        return self._seq.intrinsics

    def _open(self) -> None:
        if self._seq is not None:
            return
        # The capture daemon may still be creating the directory, the
        # first index lines, and the first frame pair. Wait for the
        # FIRST ASSOCIATED FRAME, not just the layout: TumSequence's
        # image-size intrinsics adaptation probes the first depth file,
        # so opening on an empty capture would lock in unadapted
        # calibration.
        deadline = time.monotonic() + self.wait_for_dir
        while True:
            try:
                seq = TumSequence(self.dir, **self._tum_kwargs)
                if len(seq) > 0:
                    self._seq = seq
                    return
            except (FileNotFoundError, IOError):
                pass
            if self._stopped or time.monotonic() >= deadline:
                raise TimeoutError(
                    f"no frames appeared in {self.dir!r} within "
                    f"{self.wait_for_dir:.0f}s"
                )
            time.sleep(self.poll_interval)

    def frames(self) -> Iterator[Frame]:
        self._open()
        seq = self._seq
        watermark = -np.inf  # newest rgb timestamp yielded
        consumed = 0  # diagnostic: total frames delivered
        last_new = time.monotonic()
        while True:
            try:
                n = seq.refresh()
            except (FileNotFoundError, IOError):
                # Index mid-rewrite by the capture daemon; retry.
                n = 0
            progressed = False
            for i in range(n):
                t = seq._items[i][0]
                if t <= watermark:
                    continue  # already yielded, or arrived-late (drop)
                try:
                    frame = seq[i]
                except IOError:
                    # The index line exists but the PNG is still being
                    # written — stop at this frame, retry next poll.
                    break
                watermark = t
                consumed += 1
                progressed = True
                yield frame
            if progressed:
                last_new = time.monotonic()
            elif self._stopped or (
                time.monotonic() - last_new > self.idle_timeout
            ):
                return
            else:
                time.sleep(self.poll_interval)
