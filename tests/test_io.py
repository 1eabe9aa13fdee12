"""IO tests: rosbag round-trip, npz serialization, dataset loaders, CLI e2e."""

import os

import numpy as np
import pytest

from vision_slam_frontend_tpu.io import rosbag
from vision_slam_frontend_tpu.io.image import decode_image_bytes, encode_jpeg
from vision_slam_frontend_tpu.io.serialize import load_problem, save_problem
from vision_slam_frontend_tpu.io.synthetic import SyntheticRig, generate_sequence
from vision_slam_frontend_tpu.types.slam_types import (
    FeatureMatch,
    OdometryFactor,
    RobotPose,
    SLAMNode,
    SLAMProblem,
    VisionFactor,
    VisionFeature,
)

CLI_ARGS = ["--max_features", "192", "--frame_life", "4"]


def make_problem() -> SLAMProblem:
    rng = np.random.default_rng(0)
    nodes = []
    for i in range(3):
        feats = [
            VisionFeature(j, rng.uniform(0, 640, 2).astype(np.float32), rng.normal(size=3).astype(np.float32))
            for j in range(4)
        ]
        nodes.append(
            SLAMNode(
                node_idx=i,
                timestamp=float(i),
                pose=RobotPose(
                    loc=rng.normal(size=3).astype(np.float32),
                    angle=np.array([1.0, 0, 0, 0], np.float32),
                ),
                features=feats,
            )
        )
    vfs = [
        VisionFactor(0, 1, [FeatureMatch(0, 1), FeatureMatch(2, 3)]),
        VisionFactor(1, 2, []),
    ]
    ofs = [
        OdometryFactor(0, 1, np.array([1.0, 0, 0], np.float32), np.array([1.0, 0, 0, 0], np.float32)),
        OdometryFactor(1, 2, np.array([0.5, 0, 0], np.float32), np.array([1.0, 0, 0, 0], np.float32)),
    ]
    return SLAMProblem(nodes=nodes, vision_factors=vfs, odometry_factors=ofs)


class TestSerialize:
    def test_roundtrip(self, tmp_path):
        problem = make_problem()
        path = str(tmp_path / "problem.npz")
        save_problem(path, problem)
        loaded = load_problem(path)
        assert len(loaded.nodes) == 3
        assert len(loaded.vision_factors) == 2
        assert len(loaded.odometry_factors) == 2
        for a, b in zip(problem.nodes, loaded.nodes):
            assert a.node_idx == b.node_idx
            np.testing.assert_allclose(a.pose.loc, b.pose.loc)
            assert len(a.features) == len(b.features)
            for fa, fb in zip(a.features, b.features):
                np.testing.assert_allclose(fa.pixel, fb.pixel)
                np.testing.assert_allclose(fa.point3d, fb.point3d)
        assert len(loaded.vision_factors[0].feature_matches) == 2
        assert loaded.vision_factors[0].feature_matches[1].feature_idx_initial == 2
        assert loaded.vision_factors[1].feature_matches == []


class TestRosbag:
    def test_roundtrip_images_and_odometry(self, tmp_path):
        path = str(tmp_path / "test.bag")
        rng = np.random.default_rng(1)
        img = rng.uniform(0, 255, (48, 64)).astype(np.uint8)
        jpeg = encode_jpeg(img)
        with rosbag.BagWriter(path) as bag:
            conn_img = bag.get_connection(
                "/cam/image/compressed", "sensor_msgs/CompressedImage", "*", "..."
            )
            conn_odom = bag.get_connection("/odom", "nav_msgs/Odometry", "*", "...")
            for i in range(5):
                t_ns = 1_000_000_000 * (i + 1)
                bag.write(
                    conn_odom,
                    t_ns,
                    rosbag.serialize_odometry(
                        i, t_ns, [0.1 * i, 0, 0], [1.0, 0, 0, 0]
                    ),
                )
                bag.write(
                    conn_img,
                    t_ns,
                    rosbag.serialize_compressed_image(i, t_ns, "jpeg", jpeg),
                )
        msgs = list(rosbag.read_messages(path))
        assert len(msgs) == 10
        odoms = [m for m in msgs if m[0] == "/odom"]
        imgs = [m for m in msgs if m[0] == "/cam/image/compressed"]
        assert len(odoms) == 5 and len(imgs) == 5
        np.testing.assert_allclose(odoms[2][2]["position"], [0.2, 0, 0])
        np.testing.assert_allclose(odoms[2][2]["orientation_wxyz"], [1.0, 0, 0, 0])
        assert odoms[2][2]["stamp_ns"] == 3_000_000_000
        decoded = decode_image_bytes(imgs[0][2]["data"], imgs[0][2]["format"])
        assert decoded.shape == img.shape
        assert np.mean(np.abs(decoded - img)) < 10  # JPEG lossy

    def test_topic_filter(self, tmp_path):
        path = str(tmp_path / "t.bag")
        with rosbag.BagWriter(path) as bag:
            c1 = bag.get_connection("/a", "nav_msgs/Odometry", "*", "")
            c2 = bag.get_connection("/b", "nav_msgs/Odometry", "*", "")
            bag.write(c1, 10, rosbag.serialize_odometry(0, 10, [0, 0, 0], [1, 0, 0, 0]))
            bag.write(c2, 20, rosbag.serialize_odometry(0, 20, [0, 0, 0], [1, 0, 0, 0]))
        msgs = list(rosbag.read_messages(path, topics=["/b"]))
        assert len(msgs) == 1 and msgs[0][0] == "/b"

    def test_chunked_write(self, tmp_path):
        """Many messages across several chunks survive the round trip."""
        path = str(tmp_path / "big.bag")
        with rosbag.BagWriter(path, chunk_threshold=4096) as bag:
            c = bag.get_connection("/o", "nav_msgs/Odometry", "*", "")
            for i in range(100):
                bag.write(c, i * 100, rosbag.serialize_odometry(i, i * 100, [i, 0, 0], [1, 0, 0, 0]))
        msgs = list(rosbag.read_messages(path))
        assert len(msgs) == 100
        assert [m[1] for m in msgs] == [i * 100 for i in range(100)]

    def test_bad_magic(self, tmp_path):
        p = tmp_path / "bad.bag"
        p.write_bytes(b"not a bag")
        with pytest.raises(ValueError, match="not a ROS bag"):
            list(rosbag.read_messages(str(p)))


def write_synthetic_bag(path: str, num_frames: int = 8) -> None:
    rig = SyntheticRig()
    with rosbag.BagWriter(path) as bag:
        conn_l = bag.get_connection(
            "/stereo/left/image_raw/compressed", "sensor_msgs/CompressedImage", "*", ""
        )
        conn_r = bag.get_connection(
            "/stereo/right/image_raw/compressed", "sensor_msgs/CompressedImage", "*", ""
        )
        conn_o = bag.get_connection("/odometry/filtered", "nav_msgs/Odometry", "*", "")
        for i, f in enumerate(generate_sequence(num_frames=num_frames, step=0.25, rig=rig)):
            t_ns = int(f.timestamp * 1e9) + 1
            bag.write(
                conn_o,
                t_ns,
                rosbag.serialize_odometry(i, t_ns, f.odom_translation, f.odom_rotation),
            )
            bag.write(
                conn_l, t_ns, rosbag.serialize_compressed_image(i, t_ns, "jpeg", encode_jpeg(f.left))
            )
            bag.write(
                conn_r, t_ns, rosbag.serialize_compressed_image(i, t_ns, "jpeg", encode_jpeg(f.right))
            )


class TestCli:
    def test_prefetch_producer_exits_on_abandonment(self):
        """If the consumer abandons the prefetch generator early (SIGINT
        break, --max_poses), the producer thread must exit instead of
        blocking forever on the bounded queue (leaking decoded frames)."""
        import threading
        import time

        from vision_slam_frontend_tpu.cli.slam_frontend import prefetch_events

        def src():
            for i in range(1000):
                yield ("odom", float(i), None)

        g = prefetch_events(src(), depth=2, to_device=False)
        assert next(g)[0] == "odom"
        g.close()  # consumer walks away with the queue full

        def alive():
            return any(
                t.name == "vsf-prefetch" and t.is_alive()
                for t in threading.enumerate()
            )

        deadline = time.time() + 5.0
        while time.time() < deadline and alive():
            time.sleep(0.05)
        assert not alive(), "prefetch producer thread leaked after close()"

    def test_synthetic_end_to_end(self, tmp_path, capsys):
        from vision_slam_frontend_tpu.cli.slam_frontend import main

        out = str(tmp_path / "problem.npz")
        ply = str(tmp_path / "map.ply")
        rc = main(["--input", "synthetic:6", "--output", out, "--ply", ply] + CLI_ARGS)
        assert rc == 0
        captured = capsys.readouterr().out
        assert "Saved SLAM problem with 5 nodes" in captured
        problem = load_problem(out)
        assert len(problem.nodes) == 5
        assert os.path.getsize(ply) > 100
        with open(ply, "rb") as f:
            head = f.read(200)
        assert head.startswith(b"ply\nformat binary_little_endian")

    def test_bag_end_to_end(self, tmp_path, capsys):
        """Full loop: synthesize a real ROS bag, process it like the reference."""
        from vision_slam_frontend_tpu.cli.slam_frontend import main

        bag_path = str(tmp_path / "seq.bag")
        write_synthetic_bag(bag_path, num_frames=6)
        out = str(tmp_path / "problem.npz")
        rc = main(
            ["--input", bag_path, "--output", out, "--max_poses", "3",
             "--config", _write_synth_config(tmp_path)] + CLI_ARGS
        )
        assert rc == 0
        captured = capsys.readouterr().out
        assert "Saved SLAM problem with 3 nodes" in captured
        problem = load_problem(out)
        assert len(problem.nodes) == 3
        assert all(len(n.features) > 20 for n in problem.nodes)

    def test_kitti_end_to_end(self, tmp_path, capsys):
        cv2 = pytest.importorskip("cv2")
        from vision_slam_frontend_tpu.cli.slam_frontend import main

        rig = SyntheticRig()
        seq = tmp_path / "05"
        (seq / "image_0").mkdir(parents=True)
        (seq / "image_1").mkdir()
        frames = list(generate_sequence(num_frames=5, step=0.25, rig=rig))
        times, poses = [], []
        for i, f in enumerate(frames):
            cv2.imwrite(str(seq / "image_0" / f"{i:06d}.png"), f.left.astype(np.uint8))
            cv2.imwrite(str(seq / "image_1" / f"{i:06d}.png"), f.right.astype(np.uint8))
            times.append(f.timestamp)
            poses.append(np.hstack([f.cam_to_world_R, f.cam_pos[:, None]]).ravel())
        np.savetxt(seq / "times.txt", np.array(times))
        np.savetxt(seq / "poses.txt", np.array(poses))
        P0 = np.hstack([rig.K(), np.zeros((3, 1))])
        P1 = P0.copy()
        P1[0, 3] = -rig.fx * rig.baseline
        with open(seq / "calib.txt", "w") as f:
            f.write("P0: " + " ".join(str(v) for v in P0.ravel()) + "\n")
            f.write("P1: " + " ".join(str(v) for v in P1.ravel()) + "\n")
        out = str(tmp_path / "kitti.npz")
        rc = main(["--input", str(seq), "--dataset", "kitti", "--output", out] + CLI_ARGS)
        assert rc == 0
        problem = load_problem(out)
        assert len(problem.nodes) == 4  # gate closed on frame 0
        assert all(len(n.features) > 20 for n in problem.nodes)

    def test_euroc_end_to_end(self, tmp_path, capsys):
        cv2 = pytest.importorskip("cv2")
        import yaml

        from vision_slam_frontend_tpu.cli.slam_frontend import main

        rig = SyntheticRig()
        mav = tmp_path / "euroc" / "mav0"
        frames = list(generate_sequence(num_frames=5, step=0.25, rig=rig))
        for cam, get_img, T in (
            ("cam0", lambda f: f.left, np.eye(4)),
            ("cam1", lambda f: f.right, np.block([[np.eye(3), np.array([[rig.baseline], [0], [0]])], [np.zeros((1, 3)), np.ones((1, 1))]])),
        ):
            d = mav / cam / "data"
            d.mkdir(parents=True)
            rows = []
            for f in frames:
                t_ns = int(f.timestamp * 1e9) + 1
                name = f"{t_ns}.png"
                cv2.imwrite(str(d / name), get_img(f).astype(np.uint8))
                rows.append(f"{t_ns},{name}")
            (mav / cam / "data.csv").write_text("#t,name\n" + "\n".join(rows) + "\n")
            sensor = {
                "intrinsics": [rig.fx, rig.fy, rig.cx, rig.cy],
                "distortion_coefficients": [0.0, 0.0, 0.0, 0.0],
                "T_BS": {"data": [float(v) for v in T.ravel()]},
            }
            (mav / cam / "sensor.yaml").write_text("%YAML:1.0\n" + yaml.safe_dump(sensor))
        gt = mav / "state_groundtruth_estimate0"
        gt.mkdir()
        rows = []
        for f in frames:
            t_ns = int(f.timestamp * 1e9)
            q = f.odom_rotation
            p = f.odom_translation
            rows.append(f"{t_ns},{p[0]},{p[1]},{p[2]},{q[0]},{q[1]},{q[2]},{q[3]}")
        (gt / "data.csv").write_text("#gt\n" + "\n".join(rows) + "\n")
        out = str(tmp_path / "euroc.npz")
        rc = main(["--input", str(tmp_path / "euroc"), "--output", out] + CLI_ARGS)
        assert rc == 0
        problem = load_problem(out)
        assert len(problem.nodes) == 4
        assert all(len(n.features) > 20 for n in problem.nodes)

    def test_bag_extract(self, tmp_path, capsys):
        from vision_slam_frontend_tpu.cli.bag_extract import main

        bag_path = str(tmp_path / "seq.bag")
        write_synthetic_bag(bag_path, num_frames=3)
        out_dir = str(tmp_path / "imgs")
        rc = main(
            ["--input", bag_path, "--output_dir", out_dir, "--max_images", "2"]
        )
        assert rc == 0
        files = sorted(os.listdir(out_dir))
        assert files == ["000000.jpg", "000001.jpg"]


def _write_synth_config(tmp_path) -> str:
    """YAML config carrying the synthetic rig's calibration."""
    import yaml

    rig = SyntheticRig()
    path = str(tmp_path / "synth_config.yaml")
    with open(path, "w") as f:
        yaml.safe_dump({"calib": rig.calib(), "fast_threshold": 12.0}, f)
    return path
