"""SIFT-class float-descriptor family + L2 matching path: unit + integration.

Closes the reference's NORM_L2 extractor branch (SURF/SIFT/FREAK behind
USE_XFEATURES, src/slam_frontend.cc:222-247): 128-d gradient-histogram
descriptors (ops/sift.py) matched with squared-L2 MXU distances
(ops/hamming.py l2_sq_distance_matrix / _l2_knn2)."""

import numpy as np
import jax.numpy as jnp

from vision_slam_frontend_tpu.ops import sift
from vision_slam_frontend_tpu.ops.descriptors import get_family, registered_families
from vision_slam_frontend_tpu.ops.hamming import (
    l2_sq_distance_matrix,
    match_window,
    ratio_test_match,
)


def _textured_image(h=120, w=160, seed=3):
    rng = np.random.default_rng(seed)
    img = rng.uniform(0, 255, (h // 4, w // 4))
    img = np.kron(img, np.ones((4, 4)))
    return img.astype(np.float32)


class TestL2Matching:
    def test_l2_matrix_exact(self):
        rng = np.random.default_rng(0)
        q = rng.normal(size=(7, 32)).astype(np.float32)
        t = rng.normal(size=(9, 32)).astype(np.float32)
        got = np.asarray(l2_sq_distance_matrix(jnp.asarray(q), jnp.asarray(t)))
        want = ((q[:, None] - t[None, :]) ** 2).sum(-1)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)

    def test_ratio_test_match_l2(self):
        """Hand-built case: query 0 has a clear winner, query 1 is ambiguous."""
        t = jnp.asarray(
            np.stack([
                np.eye(8)[0], np.eye(8)[1], np.eye(8)[2],
                0.7 * np.eye(8)[3] + 0.7 * np.eye(8)[4],
            ]).astype(np.float32)
        )
        q = jnp.asarray(
            np.stack([
                np.eye(8)[0] * 0.98,  # near t0, far from everything else
                0.71 * np.eye(8)[3] + 0.69 * np.eye(8)[4],  # near t3 AND...
            ]).astype(np.float32)
        )
        # make query 1 ambiguous: add a near-duplicate of t3
        t = jnp.concatenate([t, t[3:4] * 1.01], axis=0)
        idx, dist, matched = ratio_test_match(
            q, jnp.ones(2, bool), t, jnp.ones(5, bool), ratio=0.6
        )
        assert bool(matched[0]) and int(idx[0]) == 0
        assert not bool(matched[1])  # d1 ~ d2: ratio test must kill it
        assert float(dist[0]) < 0.1

    def test_match_window_l2_shapes(self):
        rng = np.random.default_rng(1)
        W, K, D = 3, 16, 32
        base = rng.normal(size=(K, D)).astype(np.float32)
        base /= np.linalg.norm(base, axis=-1, keepdims=True)
        win = np.stack([base + rng.normal(0, 0.01, base.shape) for _ in range(W)])
        idx, dist, matched = match_window(
            jnp.asarray(win.astype(np.float32)), jnp.ones((W, K), bool),
            jnp.asarray(base), jnp.ones(K, bool), 0.8, 1.0,
        )
        assert idx.shape == (W, K) and matched.dtype == bool
        m = np.asarray(matched)
        i = np.asarray(idx)
        # Matches that survive must point at the right (identity) column.
        assert m.sum() > 0.5 * W * K
        np.testing.assert_array_equal(i[m], np.tile(np.arange(K), (W, 1))[m])

    def test_streamed_l2_matches_materialized(self):
        from vision_slam_frontend_tpu.ops.hamming import _knn2_match_streamed, knn2_match

        rng = np.random.default_rng(2)
        q = rng.normal(size=(64, 16)).astype(np.float32)
        t = rng.normal(size=(2048, 16)).astype(np.float32)
        v = rng.random(2048) > 0.1
        i_s, d1_s, d2_s = _knn2_match_streamed(
            jnp.asarray(q), jnp.asarray(t), jnp.asarray(v), compensated=True
        )
        dist = l2_sq_distance_matrix(jnp.asarray(q), jnp.asarray(t))
        i_m, d1_m, d2_m = knn2_match(dist, jnp.asarray(v))
        np.testing.assert_array_equal(np.asarray(i_s), np.asarray(i_m))
        np.testing.assert_allclose(np.asarray(d1_s), np.asarray(d1_m), atol=1e-3)
        np.testing.assert_allclose(np.asarray(d2_s), np.asarray(d2_m), atol=1e-3)


class TestDescriptor:
    def test_valid_mask_zeroes(self):
        img = _textured_image()
        kps = jnp.asarray([[40.0, 40.0], [80.0, 60.0]])
        valid = jnp.asarray([True, False])
        _, desc = sift.orient_and_describe_sift(jnp.asarray(img), kps, valid)
        assert desc.shape == (2, sift.DIMS) and desc.dtype == jnp.float32
        assert np.asarray(desc)[1].sum() == 0
        n0 = np.linalg.norm(np.asarray(desc)[0])
        assert 0.9 < n0 < 1.1  # L2-normalized

    def test_distinct_keypoints_distinct_descriptors(self):
        img = _textured_image()
        kps = jnp.asarray([[40.0, 40.0], [100.0, 70.0], [60.0, 90.0]])
        valid = jnp.ones(3, bool)
        _, desc = sift.orient_and_describe_sift(jnp.asarray(img), kps, valid)
        d = np.asarray(desc)
        for i in range(3):
            for j in range(i + 1, 3):
                assert np.linalg.norm(d[i] - d[j]) > 0.3, (i, j)

    def test_rotation_invariant_descriptor(self):
        """Same physical point, 180-degree rotated image (exact grid): the
        descriptor distance must be far below unrelated-pair distances."""
        img = _textured_image()
        rot = img[::-1, ::-1].copy()
        H, W = img.shape
        pts = [(50.0, 44.0), (90.0, 60.0), (70.0, 80.0)]
        kp = jnp.asarray(pts)
        kp_rot = jnp.asarray([[W - 1 - x, H - 1 - y] for x, y in pts])
        v = jnp.ones(len(pts), bool)
        _, d0 = sift.orient_and_describe_sift(jnp.asarray(img), kp, v)
        _, d1 = sift.orient_and_describe_sift(jnp.asarray(rot), kp_rot, v)
        a, b = np.asarray(d0), np.asarray(d1)
        for i in range(len(pts)):
            same = np.linalg.norm(a[i] - b[i])
            others = [np.linalg.norm(a[i] - b[j]) for j in range(len(pts)) if j != i]
            assert same < 0.6 * min(others), (i, same, others)
            assert same < 0.8, (i, same)  # normalized vectors: random ~ 1.4

    def test_spatial_tables_partition(self):
        """Cell weights near the patch center sum to ~the Gaussian window
        (bilinear tents partition unity inside the grid)."""
        S = sift._SPATIAL  # (F, A, 16)
        total = S.sum(axis=-1)  # (F, A)
        center = sift.PATCH_AREA // 2
        for f in range(sift.NUM_FINE):
            assert total[f, center] > 0.9  # gauss(0) = 1, tents sum to 1


class TestRegistryIntegration:
    def test_registered(self):
        assert "sift" in registered_families()
        fam = get_family("sift")
        assert fam.words == 128 and fam.distance == "l2"

    def test_extractor_contract(self):
        rng = np.random.default_rng(5)
        img = jnp.asarray(rng.uniform(0, 255, (120, 160)).astype(np.float32))
        kps, scores, desc, valid = sift.detect_and_describe_sift(
            img, threshold=10.0, max_keypoints=128
        )
        assert kps.shape == (128, 2) and desc.shape == (128, 128)
        assert desc.dtype == jnp.float32
        assert int(valid.sum()) > 20

    def test_pyramid_levels(self):
        rng = np.random.default_rng(6)
        img = jnp.asarray(rng.uniform(0, 255, (160, 200)).astype(np.float32))
        kps, scores, desc, valid = sift.detect_and_describe_sift(
            img, threshold=10.0, max_keypoints=128, num_levels=2
        )
        assert kps.shape == (128, 2) and desc.shape == (128, 128)
        assert int(valid.sum()) > 20

    def test_full_frontend_with_sift(self):
        from vision_slam_frontend_tpu.frontend import Frontend, FrontendConfig
        from vision_slam_frontend_tpu.io.synthetic import SyntheticRig, generate_sequence

        rig = SyntheticRig()
        fe = Frontend(
            FrontendConfig(
                calib=rig.calib(), max_features=256, frame_life=5,
                fast_threshold=12.0, descriptor_family="sift",
            )
        )
        for f in generate_sequence(num_frames=6, step=0.25, rig=rig):
            fe.observe_odometry(f.odom_translation, f.odom_rotation, f.timestamp)
            fe.observe_image(f.left, f.right, f.timestamp)
        p = fe.get_slam_problem()
        assert len(p.nodes) >= 5
        feats = [len(n.features) for n in p.nodes]
        assert min(feats) > 40, feats
        n_matches = sum(len(vf.feature_matches) for vf in p.vision_factors)
        assert n_matches > 100, n_matches

    def test_cli_descriptor_family_flag(self, tmp_path):
        from vision_slam_frontend_tpu.cli.slam_frontend import main

        out = tmp_path / "p.npz"
        rc = main([
            "--input", "synthetic:5", "--output", str(out),
            "--descriptor_family", "sift", "--max_features", "128",
        ])
        assert rc == 0 and out.exists()
