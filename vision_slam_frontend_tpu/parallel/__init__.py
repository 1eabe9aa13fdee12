"""Multi-chip / multi-host execution: mesh setup, sharded BA, batched frontend."""

from vision_slam_frontend_tpu.parallel.mesh import make_mesh, initialize_distributed
from vision_slam_frontend_tpu.parallel.sharded_ba import (
    shard_ba_problem,
    optimize_sharded,
    optimize_sharded_dense,
    build_lm_sharded,
)
from vision_slam_frontend_tpu.parallel.segment_ba import (
    build_segments,
    optimize_segments,
)

__all__ = [
    "make_mesh",
    "initialize_distributed",
    "shard_ba_problem",
    "optimize_sharded",
    "optimize_sharded_dense",
    "build_lm_sharded",
    "build_segments",
    "optimize_segments",
]
