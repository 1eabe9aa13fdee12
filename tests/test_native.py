"""Native runtime tests: C++ JPEG decode + bag scanner vs the Python paths."""

import os
import subprocess

import numpy as np
import pytest

from vision_slam_frontend_tpu.io import native_loader, rosbag
from vision_slam_frontend_tpu.io.image import encode_jpeg


@pytest.fixture(scope="module", autouse=True)
def build_native():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    subprocess.run(["make", "-C", os.path.join(root, "native")], check=True, capture_output=True)
    assert native_loader.native_available(), "native library failed to build/load"


class TestJpegDecode:
    def test_single_matches_python(self):
        rng = np.random.default_rng(0)
        img = rng.integers(0, 255, (48, 64), dtype=np.uint8)
        jpeg = encode_jpeg(img)
        out = native_loader.decode_jpeg_gray(jpeg)
        assert out is not None and out.shape == (48, 64)
        from vision_slam_frontend_tpu.io.image import decode_image_bytes

        ref = decode_image_bytes(jpeg)
        # Different JPEG decoders round slightly differently.
        assert np.mean(np.abs(out.astype(np.float32) - ref)) < 2.0

    def test_batch(self):
        rng = np.random.default_rng(1)
        imgs = [rng.integers(0, 255, (32, 48), dtype=np.uint8) for _ in range(16)]
        jpegs = [encode_jpeg(im) for im in imgs]
        out, status = native_loader.decode_jpeg_batch(jpegs, 48, 32, num_threads=4)
        assert out.shape == (16, 32, 48)
        assert (status == 0).all()
        for i in range(16):
            assert np.mean(np.abs(out[i].astype(np.float32) - imgs[i].astype(np.float32))) < 12

    def test_corrupt_jpeg_flagged(self):
        rng = np.random.default_rng(2)
        img = rng.integers(0, 255, (32, 48), dtype=np.uint8)
        good = encode_jpeg(img)
        out, status = native_loader.decode_jpeg_batch(
            [good, b"not a jpeg at all"], 48, 32
        )
        assert status[0] == 0
        assert status[1] != 0
        assert (out[1] == 0).all()

    def test_decode_garbage_returns_none(self):
        assert native_loader.decode_jpeg_gray(b"\x00\x01\x02") is None


class TestNativeBag:
    def test_scan_matches_python_reader(self, tmp_path):
        path = str(tmp_path / "native.bag")
        with rosbag.BagWriter(path) as bag:
            c1 = bag.get_connection("/odom", "nav_msgs/Odometry", "*", "")
            c2 = bag.get_connection("/img", "sensor_msgs/CompressedImage", "*", "")
            for i in range(20):
                bag.write(c1, i * 10, rosbag.serialize_odometry(i, i * 10, [i, 0, 0], [1, 0, 0, 0]))
                if i % 2 == 0:
                    bag.write(c2, i * 10 + 1, rosbag.serialize_compressed_image(i, i * 10 + 1, "jpeg", b"xx"))
        reader = native_loader.NativeBagReader(path)
        assert len(reader) == 30
        assert set(ty for _, ty in reader.connections.values()) == {
            "nav_msgs/Odometry", "sensor_msgs/CompressedImage"
        }
        native_msgs = list(reader.read_messages(topics=["/odom"]))
        python_msgs = list(rosbag.read_messages(path, topics=["/odom"], raw=True))
        assert len(native_msgs) == len(python_msgs) == 20
        for (nt, nt_ns, nraw), (pt, pt_ns, pmsg) in zip(native_msgs, python_msgs):
            assert nt == pt and nt_ns == pt_ns
            assert nraw == pmsg["raw"]
        reader.close()

    def test_bad_file(self, tmp_path):
        p = tmp_path / "bad.bag"
        p.write_bytes(b"garbage")
        with pytest.raises(ValueError):
            native_loader.NativeBagReader(str(p))
