"""AKAZE-class descriptor family: unit + integration tests.

The third family behind the extractor-switch seam (ops/descriptors.py) — the
reference's DEFAULT extractor (src/slam_frontend.cc:193-202, cv::AKAZE)."""

import numpy as np
import jax.numpy as jnp

from vision_slam_frontend_tpu.ops import akaze
from vision_slam_frontend_tpu.ops.brief import unpack_bits
from vision_slam_frontend_tpu.ops.descriptors import get_family, registered_families


def _textured_image(h=128, w=160, seed=3, smooth=True):
    """Smooth random texture (blob structure the Hessian detector likes)."""
    rng = np.random.default_rng(seed)
    img = rng.uniform(0, 255, (h // 8, w // 8))
    img = np.kron(img, np.ones((8, 8)))
    if smooth:
        from vision_slam_frontend_tpu.ops.image import gaussian_blur

        img = np.asarray(gaussian_blur(jnp.asarray(img.astype(np.float32)), 1.5))
    return img.astype(np.float32)


class TestConstants:
    def test_cell_weight_normalization(self):
        # Each (bin, cell) column is an average: weights sum to 1 (cells that
        # intersect the disk) or 0 (fully outside, possible for 4x4 corners).
        sums = akaze._CELL_W.sum(axis=0).reshape(akaze.NUM_BINS, akaze.NUM_CELLS)
        assert np.all((np.abs(sums - 1.0) < 1e-5) | (np.abs(sums) < 1e-7))
        # Grid-2 cells (first 4) always intersect the disk in every bin.
        assert np.all(np.abs(sums[:, :4] - 1.0) < 1e-5)

    def test_pair_count(self):
        assert akaze._PAIRS.shape == (162, 2)  # 6 + 36 + 120
        assert akaze.NUM_CHANNELS * len(akaze._PAIRS) == 486

    def test_bins_cover_rotations(self):
        assert akaze._CELL_W.shape == (
            akaze.PATCH_AREA,
            akaze.NUM_BINS * akaze.NUM_CELLS,
        )


class TestScaleSpace:
    def test_nonlinear_diffusion_preserves_edges(self):
        """The defining AKAZE property: after evolution, a strong step edge
        keeps most of its contrast while flat-region noise dies — unlike an
        equal-time Gaussian blur."""
        from vision_slam_frontend_tpu.ops.image import gaussian_blur

        rng = np.random.default_rng(0)
        img = np.full((96, 128), 40.0, np.float32)
        img[:, 64:] = 200.0  # strong vertical edge
        img += rng.normal(0, 5.0, img.shape).astype(np.float32)

        levels = akaze.build_scale_space(jnp.asarray(img), 2, 1.6)
        L = np.asarray(levels[-1])
        sigma = akaze.evolution_sigmas(2, 1.6)[-1]
        G = np.asarray(gaussian_blur(jnp.asarray(img), sigma=float(sigma)))

        edge_L = np.abs(np.diff(L[20:-20, :], axis=1))[:, 60:67].max()
        edge_G = np.abs(np.diff(G[20:-20, :], axis=1))[:, 60:67].max()
        noise_L = L[20:-20, 10:50].std()
        assert edge_L > 2.0 * edge_G, (edge_L, edge_G)  # edge survives diffusion
        assert noise_L < 3.0  # flat noise (std 5) is smoothed away

    def test_evolution_monotone_smoothing(self):
        img = _textured_image(smooth=False)
        levels = akaze.build_scale_space(jnp.asarray(img), 3, 1.4)
        tv = [float(jnp.abs(jnp.diff(L, axis=1)).mean()) for L in levels]
        assert tv[0] > tv[1] > tv[2]  # total variation strictly decreases


class TestDetector:
    def test_finds_blob_structure(self):
        img = _textured_image()
        kps, scores, valid = akaze._detect_on_response(
            akaze.hessian_response(
                akaze.build_scale_space(jnp.asarray(img), 1, 1.4)[0], akaze.SIGMA0
            ),
            100.0, 64, akaze.BORDER,
        )
        n = int(np.asarray(valid).sum())
        assert n > 10
        k = np.asarray(kps)[np.asarray(valid)]
        assert k[:, 0].min() >= akaze.BORDER and k[:, 1].min() >= akaze.BORDER

    def test_threshold_scaling(self):
        img = jnp.asarray(_textured_image())
        _, _, _, v_lo = akaze.detect_and_describe_akaze(img, threshold=5.0, max_keypoints=256)
        _, _, _, v_hi = akaze.detect_and_describe_akaze(img, threshold=60.0, max_keypoints=256)
        assert int(v_lo.sum()) >= int(v_hi.sum())


class TestDescriptor:
    def test_valid_mask_zeroes(self):
        img = jnp.asarray(_textured_image())
        L = akaze.build_scale_space(img, 1, 1.4)[0]
        Lx, Ly = akaze._grad_central(L)
        kps = jnp.asarray([[40.0, 40.0], [80.0, 60.0]])
        valid = jnp.asarray([True, False])
        desc, theta = akaze.akaze_describe(L, Lx, Ly, kps, valid)
        assert desc.shape == (2, 16) and desc.dtype == jnp.uint32
        assert np.asarray(desc)[1].sum() == 0
        assert np.asarray(desc)[0].sum() > 0

    def test_distinct_keypoints_distinct_descriptors(self):
        img = jnp.asarray(_textured_image())
        L = akaze.build_scale_space(img, 1, 1.4)[0]
        Lx, Ly = akaze._grad_central(L)
        kps = jnp.asarray([[40.0, 40.0], [100.0, 70.0], [60.0, 90.0]])
        valid = jnp.ones(3, bool)
        desc, _ = akaze.akaze_describe(L, Lx, Ly, kps, valid)
        bits = np.asarray(unpack_bits(desc))[:, :486]
        for i in range(3):
            for j in range(i + 1, 3):
                ham = np.sum(bits[i] != bits[j])
                assert ham > 60, (i, j, ham)

    def test_rotation_invariant_descriptor(self):
        """Same physical point, 180-degree rotated image (grid-exact, no
        resampling): low Hamming distance vs ~50% for unrelated points."""
        img = _textured_image()
        rot = img[::-1, ::-1].copy()
        H, W = img.shape
        pts = [(50.0, 44.0), (90.0, 60.0), (70.0, 80.0), (110.0, 50.0)]
        kp = jnp.asarray(pts)
        kp_rot = jnp.asarray([[W - 1 - x, H - 1 - y] for x, y in pts])
        v = jnp.ones(len(pts), bool)

        def desc_of(im, k):
            L = akaze.build_scale_space(jnp.asarray(im), 1, 1.4)[0]
            Lx, Ly = akaze._grad_central(L)
            d, _ = akaze.akaze_describe(L, Lx, Ly, k, v)
            return np.asarray(unpack_bits(d))[:, :486]

        b0 = desc_of(img, kp)
        b1 = desc_of(rot, kp_rot)
        for i in range(len(pts)):
            ham = np.sum(b0[i] != b1[i])
            assert ham < 0.25 * 486, (i, ham)
        # Unrelated pairs stay far: discriminativity control.
        ham_cross = np.sum(b0[0] != b1[1])
        assert ham_cross > 0.25 * 486, ham_cross


class TestRegistryIntegration:
    def test_registered(self):
        assert "akaze" in registered_families()
        fam = get_family("akaze")
        assert fam.words == 16 and fam.distance == "hamming"

    def test_extractor_contract(self):
        img = jnp.asarray(_textured_image())
        kps, scores, desc, valid = akaze.detect_and_describe_akaze(
            img, threshold=10.0, max_keypoints=128
        )
        assert kps.shape == (128, 2) and desc.shape == (128, 16)
        assert int(valid.sum()) > 20

    def test_multi_level(self):
        img = jnp.asarray(_textured_image(160, 200, seed=6))
        kps, scores, desc, valid = akaze.detect_and_describe_akaze(
            img, threshold=10.0, max_keypoints=128, num_levels=3
        )
        assert kps.shape == (128, 2) and desc.shape == (128, 16)
        assert int(valid.sum()) > 20

    def test_full_frontend_with_akaze(self):
        from vision_slam_frontend_tpu.frontend import Frontend, FrontendConfig
        from vision_slam_frontend_tpu.io.synthetic import SyntheticRig, generate_sequence

        rig = SyntheticRig()
        fe = Frontend(
            FrontendConfig(
                calib=rig.calib(), max_features=256, frame_life=5,
                fast_threshold=12.0, descriptor_family="akaze",
            )
        )
        for f in generate_sequence(num_frames=6, step=0.25, rig=rig):
            fe.observe_odometry(f.odom_translation, f.odom_rotation, f.timestamp)
            fe.observe_image(f.left, f.right, f.timestamp)
        p = fe.get_slam_problem()
        assert len(p.nodes) >= 5
        feats = [len(n.features) for n in p.nodes]
        assert min(feats) > 30, feats
        n_matches = sum(len(vf.feature_matches) for vf in p.vision_factors)
        assert n_matches > 50, n_matches

    def test_cli_descriptor_family_flag(self, tmp_path):
        from vision_slam_frontend_tpu.cli.slam_frontend import main

        out = tmp_path / "p.npz"
        rc = main([
            "--input", "synthetic:5", "--output", str(out),
            "--descriptor_family", "akaze", "--max_features", "128",
        ])
        assert rc == 0 and out.exists()
