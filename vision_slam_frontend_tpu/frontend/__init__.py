"""The stereo SLAM frontend: config, jitted keyframe step, host driver."""

from vision_slam_frontend_tpu.frontend.config import FrontendConfig
from vision_slam_frontend_tpu.frontend.frontend import Frontend

__all__ = ["FrontendConfig", "Frontend"]
