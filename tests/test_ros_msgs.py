"""Reference wire-format tests: md5sums, serialization round-trip, output bag."""

import numpy as np

from vision_slam_frontend_tpu.io import rosbag
from vision_slam_frontend_tpu.io.ros_msgs import (
    PKG,
    deserialize_slam_problem,
    msg_definition,
    msg_md5,
    serialize_slam_problem,
    write_output_bag,
)


class TestMd5:
    def test_known_geometry_msgs(self):
        # Public, well-known ROS md5sums.
        assert msg_md5("geometry_msgs/Vector3") == "4a842b65f413084dc2b10fb484ea7f17"
        assert msg_md5("geometry_msgs/Point") == "4a842b65f413084dc2b10fb484ea7f17"
        assert msg_md5("geometry_msgs/Quaternion") == "a779879fadf0160734f906b8c19c7004"

    def test_custom_types_stable(self):
        # Deterministic and distinct across our schema set.
        md5s = {
            t: msg_md5(t)
            for t in (
                f"{PKG}/SLAMProblem",
                f"{PKG}/SLAMNode",
                f"{PKG}/VisionFactor",
                f"{PKG}/OdometryFactor",
                f"{PKG}/CameraExtrinsics",
                f"{PKG}/CameraIntrinsics",
            )
        }
        assert len(set(md5s.values())) == len(md5s)
        assert all(len(v) == 32 for v in md5s.values())

    def test_definition_includes_deps(self):
        d = msg_definition(f"{PKG}/SLAMProblem")
        assert "MSG: vision_slam_frontend/SLAMNode" in d
        assert "MSG: geometry_msgs/Vector3" in d
        assert d.startswith("vision_slam_frontend/SLAMNode[] nodes")


class TestWireFormat:
    def test_problem_roundtrip(self):
        from tests.test_io import make_problem

        problem = make_problem()
        data = serialize_slam_problem(problem)
        back = deserialize_slam_problem(data)
        assert len(back.nodes) == len(problem.nodes)
        for a, b in zip(problem.nodes, back.nodes):
            assert a.node_idx == b.node_idx
            np.testing.assert_allclose(a.pose.loc, b.pose.loc, atol=1e-6)
            np.testing.assert_allclose(a.pose.angle, b.pose.angle, atol=1e-6)
            assert len(a.features) == len(b.features)
            for fa, fb in zip(a.features, b.features):
                np.testing.assert_allclose(fa.pixel, fb.pixel, atol=1e-5)
                np.testing.assert_allclose(fa.point3d, fb.point3d, atol=1e-6)
        assert len(back.vision_factors) == len(problem.vision_factors)
        assert (
            back.vision_factors[0].feature_matches[1].feature_idx_initial
            == problem.vision_factors[0].feature_matches[1].feature_idx_initial
        )
        assert len(back.odometry_factors) == len(problem.odometry_factors)
        np.testing.assert_allclose(
            back.odometry_factors[0].translation,
            problem.odometry_factors[0].translation,
            atol=1e-6,
        )

    def test_output_bag(self, tmp_path):
        from tests.test_io import make_problem

        from vision_slam_frontend_tpu.frontend.config import FrontendConfig

        problem = make_problem()
        config = FrontendConfig()
        path = str(tmp_path / "out.bag")
        write_output_bag(path, problem, config)
        msgs = list(rosbag.read_messages(path, raw=True))
        topics = [m[0] for m in msgs]
        assert topics == ["extrinsics", "intrinsics", "slam_problem"]
        types = {m[2]["type"] for m in msgs}
        assert types == {
            f"{PKG}/CameraExtrinsics",
            f"{PKG}/CameraIntrinsics",
            f"{PKG}/SLAMProblem",
        }
        back = deserialize_slam_problem(msgs[2][2]["raw"])
        assert len(back.nodes) == len(problem.nodes)
        # Intrinsics payload: 4 float64 (fx fy cx cy).
        import struct

        fx, fy, cx, cy = struct.unpack("<4d", msgs[1][2]["raw"])
        assert abs(fx - 527.873518) < 1e-3


def test_cli_output_bag(tmp_path, capsys):
    from vision_slam_frontend_tpu.cli.slam_frontend import main

    out = str(tmp_path / "p.npz")
    bag = str(tmp_path / "p.bag")
    rc = main(
        ["--input", "synthetic:5", "--output", out, "--output_bag", bag,
         "--max_features", "192", "--frame_life", "4"]
    )
    assert rc == 0
    msgs = list(rosbag.read_messages(bag, raw=True))
    assert [m[0] for m in msgs] == ["extrinsics", "intrinsics", "slam_problem"]
    back = deserialize_slam_problem(msgs[2][2]["raw"])
    assert len(back.nodes) == 4
