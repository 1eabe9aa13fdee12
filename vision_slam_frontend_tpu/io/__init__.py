"""Dataset I/O: synthetic scenes, rosbag / KITTI / EuRoC readers, serialization."""
