"""TPU-native stereo visual SLAM framework.

A brand-new JAX/XLA/Pallas re-design of the capabilities of the reference
C++/ROS frontend (ut-amrl/vision_slam_frontend) plus the bundle-adjustment
backend it only emits a problem for.

Layout:
  geometry/  SE(3)/quaternion ops, pinhole + radial-tangential camera model
  types/     pytree IR: SLAMProblem / SLAMNode / VisionFactor / OdometryFactor
  ops/       Pallas kernels + XLA fallbacks: FAST, oriented-BRIEF, Hamming match
  frontend/  odometry-gated keyframe pipeline (jitted device step + host loop)
  backend/   Gauss-Newton / LM bundle adjustment with Schur complement
  parallel/  device-mesh sharding for distributed BA and batched frontend
  io/        rosbag / KITTI / EuRoC readers, calib YAML, npz serialization
  viz/       PLY / debug-image / HTML visualization
  cli/       command-line drivers mirroring the reference flag surface
"""

__version__ = "0.1.0"
