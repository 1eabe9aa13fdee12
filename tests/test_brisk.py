"""BRISK-class descriptor family: unit + integration tests.

The second family behind the extractor-switch seam (ops/descriptors.py) —
the reference's BRISK option (src/slam_frontend.cc:216-220)."""

import numpy as np
import jax.numpy as jnp
import pytest

from vision_slam_frontend_tpu.ops import brisk
from vision_slam_frontend_tpu.ops.brief import pack_bits, unpack_bits
from vision_slam_frontend_tpu.ops.descriptors import get_family, registered_families


def _textured_image(h=120, w=160, seed=3):
    """Smooth random texture with enough corner structure for FAST."""
    rng = np.random.default_rng(seed)
    img = rng.uniform(0, 255, (h // 4, w // 4))
    img = np.kron(img, np.ones((4, 4)))  # blocky -> corners at block edges
    return img.astype(np.float32)


class TestPattern:
    def test_pattern_shapes(self):
        assert brisk._POINTS.shape == (brisk.NUM_POINTS, 2)
        assert brisk._SHORT_PAIRS.shape == (brisk.NUM_BITS, 2)
        assert len(brisk._LONG_PAIRS) > 100

    def test_short_pairs_are_the_shortest(self):
        d = np.linalg.norm(
            brisk._POINTS[brisk._SHORT_PAIRS[:, 0]]
            - brisk._POINTS[brisk._SHORT_PAIRS[:, 1]],
            axis=1,
        )
        dl = np.linalg.norm(
            brisk._POINTS[brisk._LONG_PAIRS[:, 0]]
            - brisk._POINTS[brisk._LONG_PAIRS[:, 1]],
            axis=1,
        )
        assert d.max() < dl.min()  # descriptor pairs local, orientation pairs global

    def test_rotated_indices_in_range(self):
        n_planes = len(brisk.RINGS)
        assert brisk._ROT_IDX.min() >= 0
        assert brisk._ROT_IDX.max() < n_planes * brisk.PATCH_AREA


class TestPackWidthGeneric:
    def test_roundtrip_16_words(self):
        rng = np.random.default_rng(0)
        bits = rng.integers(0, 2, (5, 512)).astype(np.float32)
        packed = pack_bits(jnp.asarray(bits))
        assert packed.shape == (5, 16)
        back = np.asarray(unpack_bits(packed))
        np.testing.assert_array_equal(back, bits)


class TestDescribe:
    def test_valid_mask_zeroes(self):
        img = _textured_image()
        kps = jnp.asarray([[40.0, 40.0], [80.0, 60.0]])
        valid = jnp.asarray([True, False])
        desc, theta = brisk.brisk_describe(jnp.asarray(img), kps, valid)
        assert desc.shape == (2, 16) and desc.dtype == jnp.uint32
        assert np.asarray(desc)[1].sum() == 0
        assert np.asarray(desc)[0].sum() > 0

    def test_distinct_keypoints_distinct_descriptors(self):
        img = _textured_image()
        kps = jnp.asarray([[40.0, 40.0], [100.0, 70.0], [60.0, 90.0]])
        valid = jnp.ones(3, bool)
        desc, _ = brisk.brisk_describe(jnp.asarray(img), kps, valid)
        bits = np.asarray(unpack_bits(desc))
        for i in range(3):
            for j in range(i + 1, 3):
                ham = np.sum(bits[i] != bits[j])
                assert ham > 64, (i, j, ham)  # >12.5% of 512 bits differ

    def test_rotation_covariant_orientation(self):
        """Rotating the image content rotates the estimated orientation."""
        img = _textured_image()
        # 180-degree rotation keeps the pixel grid exact (no resampling).
        rot = img[::-1, ::-1].copy()
        H, W = img.shape
        x, y = 50.0, 44.0
        kp = jnp.asarray([[x, y]])
        kp_rot = jnp.asarray([[W - 1 - x, H - 1 - y]])
        v = jnp.ones(1, bool)
        _, th0 = brisk.brisk_describe(jnp.asarray(img), kp, v)
        _, th1 = brisk.brisk_describe(jnp.asarray(rot), kp_rot, v)
        diff = np.angle(np.exp(1j * (np.asarray(th1)[0] - np.asarray(th0)[0] - np.pi)))
        assert abs(diff) < 2 * np.pi / brisk.NUM_BINS + 0.2, diff

    def test_rotation_invariant_descriptor(self):
        """Same physical point, 180-degree rotated image: low Hamming distance."""
        img = _textured_image()
        rot = img[::-1, ::-1].copy()
        H, W = img.shape
        pts = [(50.0, 44.0), (90.0, 60.0), (70.0, 80.0)]
        kp = jnp.asarray(pts)
        kp_rot = jnp.asarray([[W - 1 - x, H - 1 - y] for x, y in pts])
        v = jnp.ones(len(pts), bool)
        d0, _ = brisk.brisk_describe(jnp.asarray(img), kp, v)
        d1, _ = brisk.brisk_describe(jnp.asarray(rot), kp_rot, v)
        b0, b1 = np.asarray(unpack_bits(d0)), np.asarray(unpack_bits(d1))
        for i in range(len(pts)):
            ham = np.sum(b0[i] != b1[i])
            # quantized rotation + rounded offsets: allow 25% bit noise, vs
            # ~50% expected for unrelated descriptors.
            assert ham < 0.25 * brisk.NUM_BITS, (i, ham)


class TestRegistryIntegration:
    def test_registered(self):
        assert "brisk" in registered_families()
        fam = get_family("brisk")
        assert fam.words == 16 and fam.distance == "hamming"

    def test_extractor_contract(self):
        # per-pixel noise: block textures never produce a 9-contiguous FAST arc
        rng = np.random.default_rng(5)
        img = jnp.asarray(rng.uniform(0, 255, (120, 160)).astype(np.float32))
        kps, scores, desc, valid = brisk.detect_and_describe_brisk(
            img, threshold=10.0, max_keypoints=128
        )
        assert kps.shape == (128, 2) and desc.shape == (128, 16)
        assert int(valid.sum()) > 20

    def test_pyramid_levels(self):
        rng = np.random.default_rng(6)
        img = jnp.asarray(rng.uniform(0, 255, (160, 200)).astype(np.float32))
        kps, scores, desc, valid = brisk.detect_and_describe_brisk(
            img, threshold=10.0, max_keypoints=128, num_levels=2
        )
        assert kps.shape == (128, 2) and desc.shape == (128, 16)
        assert int(valid.sum()) > 20

    def test_full_frontend_with_brisk(self):
        from vision_slam_frontend_tpu.frontend import Frontend, FrontendConfig
        from vision_slam_frontend_tpu.io.synthetic import SyntheticRig, generate_sequence

        rig = SyntheticRig()
        fe = Frontend(
            FrontendConfig(
                calib=rig.calib(), max_features=256, frame_life=5,
                fast_threshold=12.0, descriptor_family="brisk",
            )
        )
        for f in generate_sequence(num_frames=6, step=0.25, rig=rig):
            fe.observe_odometry(f.odom_translation, f.odom_rotation, f.timestamp)
            fe.observe_image(f.left, f.right, f.timestamp)
        p = fe.get_slam_problem()
        assert len(p.nodes) >= 5
        feats = [len(n.features) for n in p.nodes]
        assert min(feats) > 50, feats
        assert len(p.vision_factors) > 0

    def test_cli_descriptor_family_flag(self, tmp_path):
        from vision_slam_frontend_tpu.cli.slam_frontend import main

        out = tmp_path / "p.npz"
        rc = main([
            "--input", "synthetic:5", "--output", str(out),
            "--descriptor_family", "brisk", "--max_features", "128",
        ])
        assert rc == 0 and out.exists()

    def test_brisk_temporal_matching_consistent(self):
        """Cross-frame matches under BRISK land on the same physical tracks:
        matched pixels of consecutive keyframes stay within a tight radius
        (the synthetic world moves ~px/frame)."""
        from vision_slam_frontend_tpu.frontend import Frontend, FrontendConfig
        from vision_slam_frontend_tpu.io.synthetic import SyntheticRig, generate_sequence

        rig = SyntheticRig()
        fe = Frontend(
            FrontendConfig(
                calib=rig.calib(), max_features=256, frame_life=5,
                fast_threshold=12.0, descriptor_family="brisk",
            )
        )
        for f in generate_sequence(num_frames=6, step=0.25, rig=rig):
            fe.observe_odometry(f.odom_translation, f.odom_rotation, f.timestamp)
            fe.observe_image(f.left, f.right, f.timestamp)
        p = fe.get_slam_problem()
        n_matches = sum(len(vf.feature_matches) for vf in p.vision_factors)
        assert n_matches > 100, n_matches
