"""Live (per-keyframe) visualization: the headless RViz equivalent.

The reference publishes the pose graph, landmark cloud, and debug images to
RViz after every keyframe (reference: src/slam_frontend_main.cc:194-225
PublishVisualization, :295-309 debug image topics, publishers :252-259).
This framework runs headless, so the live surface is files:

  - LiveViewer: atomically rewrites one self-refreshing HTML viewer per
    keyframe — open it in any browser and watch the map grow (camera
    persists across the auto-reloads via localStorage).
  - DebugImageStreamer: a Frontend debug sink that renders and writes each
    keyframe's stereo/match debug images to disk AS THEY HAPPEN, instead of
    buffering every raw stereo pair in RAM for the whole run (the round-1
    behavior: GBs on a long bag). Memory stays flat.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


class LiveViewer:
    """Rewrite an auto-refreshing HTML pose-graph viewer every few keyframes.

    Usage:
        viewer = LiveViewer("/tmp/run_live.html", cam_to_robot, every=1)
        ... per keyframe: viewer.update(frontend.get_slam_problem())
    """

    def __init__(
        self,
        path: str,
        left_cam_to_robot: Optional[np.ndarray] = None,
        every: int = 1,
        refresh_seconds: float = 2.0,
        max_landmarks: int = 60000,
        title: str = "vision_slam_frontend_tpu (live)",
    ):
        self.path = path
        self.left_cam_to_robot = left_cam_to_robot
        self.every = max(1, int(every))
        self.refresh_seconds = refresh_seconds
        self.max_landmarks = max_landmarks
        self.title = title
        self._updates = 0
        self.last_stats: dict = {}

    def update(self, problem, force: bool = False) -> Optional[dict]:
        """Rewrite the viewer if this is an every-Kth update (or force=True).

        Returns the content stats when a write happened, else None."""
        self._updates += 1
        if not force and (self._updates - 1) % self.every:
            return None
        from vision_slam_frontend_tpu.viz.html import export_html

        self.last_stats = export_html(
            self.path,
            problem,
            left_cam_to_robot=self.left_cam_to_robot,
            max_landmarks=self.max_landmarks,
            title=self.title,
            refresh_seconds=self.refresh_seconds,
        )
        return self.last_stats


class DebugImageStreamer:
    """Frontend debug sink: render + write debug images per keyframe.

    Install with `frontend.debug_sink = DebugImageStreamer(dir)`; the
    frontend then hands each keyframe's debug entry here instead of
    buffering it (reference analogue: the per-keyframe debug_image /
    debug_stereo_image topics, src/slam_frontend_main.cc:295-309).
    """

    def __init__(self, directory: str):
        self.directory = directory
        os.makedirs(directory, exist_ok=True)
        self.num_stereo = 0
        self.num_match = 0

    def __call__(self, entry: dict, frontend) -> None:
        from PIL import Image

        from vision_slam_frontend_tpu.viz.debug_images import render_debug_entry

        nodes_by_id = {n.node_idx: n for n in frontend._nodes}
        stereo, match = render_debug_entry(entry, nodes_by_id)
        fid = int(entry["frame_id"])
        Image.fromarray(stereo).save(
            os.path.join(self.directory, f"stereo_{fid:05d}.png")
        )
        self.num_stereo += 1
        if match is not None:
            Image.fromarray(match).save(
                os.path.join(self.directory, f"match_{fid:05d}.png")
            )
            self.num_match += 1
