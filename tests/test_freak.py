"""FREAK-class descriptor family: unit + integration tests.

The fifth family behind the extractor-switch seam (ops/descriptors.py) —
the reference's FREAK option (FAST + FREAK behind USE_XFEATURES,
src/slam_frontend.cc:235-239)."""

import numpy as np
import jax.numpy as jnp
import pytest

from vision_slam_frontend_tpu.ops import freak
from vision_slam_frontend_tpu.ops.brief import unpack_bits
from vision_slam_frontend_tpu.ops.descriptors import get_family, registered_families


def _textured_image(h=120, w=160, seed=3):
    rng = np.random.default_rng(seed)
    img = rng.uniform(0, 255, (h // 4, w // 4))
    img = np.kron(img, np.ones((4, 4)))
    return img.astype(np.float32)


class TestRetinalPattern:
    def test_pattern_shapes(self):
        assert freak._POINTS.shape == (freak.NUM_POINTS, 2)
        assert freak.NUM_POINTS == 43  # 7 rings x 6 + fovea
        assert freak._BIT_PAIRS.shape == (freak.NUM_BITS, 2)
        assert len(freak._ORIENT_PAIRS) == 21  # 3 symmetric pairs per ring

    def test_retinal_density_gradient(self):
        """The retinal property: field size grows with eccentricity —
        points farther from the fovea have strictly larger sigmas."""
        r = np.linalg.norm(freak._POINTS, axis=1)
        order = np.argsort(r)
        sig_sorted = freak._SIGMA[order]
        assert sig_sorted[0] == sig_sorted.min()  # fovea finest
        assert sig_sorted[-1] == sig_sorted.max()  # periphery coarsest
        # Exponential ring spacing: consecutive ring radii shrink by ~0.7.
        radii = sorted({round(float(x), 3) for x in r if x > 0}, reverse=True)
        ratios = [radii[i + 1] / radii[i] for i in range(len(radii) - 1)]
        assert all(0.6 < q < 0.8 for q in ratios), ratios
        # Overlap: neighbouring fields on the outer ring overlap (sigma
        # exceeds half the on-ring point spacing).
        r_out = max(radii)
        spacing = 2 * r_out * np.sin(np.pi / 6)
        assert freak._SIGMA.max() > 0.5 * spacing / 2

    def test_coarse_to_fine_bit_order(self):
        """Descriptor bits run coarse (peripheral fields) -> fine (foveal):
        the combined sigma of pair k is non-increasing in k."""
        s = freak._SIGMA[freak._BIT_PAIRS[:, 0]] + freak._SIGMA[freak._BIT_PAIRS[:, 1]]
        assert np.all(np.diff(s) <= 1e-6), "pair cascade not coarse-to-fine"

    def test_orientation_pairs_symmetric(self):
        """Orientation pairs are diametrically opposite points of one ring."""
        for a, b in freak._ORIENT_PAIRS:
            pa, pb = freak._POINTS[a], freak._POINTS[b]
            np.testing.assert_allclose(pa, -pb, atol=1e-5)

    def test_rotated_indices_in_range(self):
        assert freak._ROT_IDX.min() >= 0
        assert freak._ROT_IDX.max() < freak.NUM_PLANES * freak.PATCH_AREA


class TestDescribe:
    def test_valid_mask_zeroes(self):
        img = _textured_image()
        kps = jnp.asarray([[40.0, 40.0], [80.0, 60.0]])
        valid = jnp.asarray([True, False])
        desc, theta = freak.freak_describe(jnp.asarray(img), kps, valid)
        assert desc.shape == (2, 16) and desc.dtype == jnp.uint32
        assert np.asarray(desc)[1].sum() == 0
        assert np.asarray(desc)[0].sum() > 0

    def test_distinct_keypoints_distinct_descriptors(self):
        img = _textured_image()
        kps = jnp.asarray([[40.0, 40.0], [100.0, 70.0], [60.0, 90.0]])
        valid = jnp.ones(3, bool)
        desc, _ = freak.freak_describe(jnp.asarray(img), kps, valid)
        bits = np.asarray(unpack_bits(desc))
        for i in range(3):
            for j in range(i + 1, 3):
                ham = np.sum(bits[i] != bits[j])
                assert ham > 64, (i, j, ham)

    def test_rotation_covariant_orientation(self):
        img = _textured_image()
        rot = img[::-1, ::-1].copy()
        H, W = img.shape
        x, y = 50.0, 44.0
        kp = jnp.asarray([[x, y]])
        kp_rot = jnp.asarray([[W - 1 - x, H - 1 - y]])
        v = jnp.ones(1, bool)
        _, th0 = freak.freak_describe(jnp.asarray(img), kp, v)
        _, th1 = freak.freak_describe(jnp.asarray(rot), kp_rot, v)
        diff = np.angle(np.exp(1j * (np.asarray(th1)[0] - np.asarray(th0)[0] - np.pi)))
        assert abs(diff) < 2 * np.pi / 32 + 0.2, diff

    def test_rotation_invariant_descriptor(self):
        img = _textured_image()
        rot = img[::-1, ::-1].copy()
        H, W = img.shape
        pts = [(50.0, 44.0), (90.0, 60.0), (70.0, 80.0)]
        kp = jnp.asarray(pts)
        kp_rot = jnp.asarray([[W - 1 - x, H - 1 - y] for x, y in pts])
        v = jnp.ones(len(pts), bool)
        d0, _ = freak.freak_describe(jnp.asarray(img), kp, v)
        d1, _ = freak.freak_describe(jnp.asarray(rot), kp_rot, v)
        b0, b1 = np.asarray(unpack_bits(d0)), np.asarray(unpack_bits(d1))
        for i in range(len(pts)):
            ham = np.sum(b0[i] != b1[i])
            assert ham < 0.25 * freak.NUM_BITS, (i, ham)


class TestRegistryIntegration:
    def test_registered(self):
        assert "freak" in registered_families()
        fam = get_family("freak")
        assert fam.words == 16 and fam.distance == "hamming"

    def test_extractor_contract(self):
        rng = np.random.default_rng(5)
        img = jnp.asarray(rng.uniform(0, 255, (120, 160)).astype(np.float32))
        kps, scores, desc, valid = freak.detect_and_describe_freak(
            img, threshold=10.0, max_keypoints=128
        )
        assert kps.shape == (128, 2) and desc.shape == (128, 16)
        assert int(valid.sum()) > 20

    def test_pyramid_levels(self):
        rng = np.random.default_rng(6)
        img = jnp.asarray(rng.uniform(0, 255, (160, 200)).astype(np.float32))
        kps, scores, desc, valid = freak.detect_and_describe_freak(
            img, threshold=10.0, max_keypoints=128, num_levels=2
        )
        assert kps.shape == (128, 2) and desc.shape == (128, 16)
        assert int(valid.sum()) > 20

    def test_full_frontend_with_freak(self):
        from vision_slam_frontend_tpu.frontend import Frontend, FrontendConfig
        from vision_slam_frontend_tpu.io.synthetic import SyntheticRig, generate_sequence

        rig = SyntheticRig()
        fe = Frontend(
            FrontendConfig(
                calib=rig.calib(), max_features=256, frame_life=5,
                fast_threshold=12.0, descriptor_family="freak",
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
            "--descriptor_family", "freak", "--max_features", "128",
        ])
        assert rc == 0 and out.exists()
