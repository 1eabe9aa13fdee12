"""Parity tests for ops: FAST vs OpenCV, BRIEF properties, Hamming matching."""

import numpy as np
import jax.numpy as jnp
import pytest

from vision_slam_frontend_tpu.ops import (
    gaussian_blur,
    fast_detect,
    compute_orientations,
    brief_describe,
    pack_bits,
    unpack_bits,
    hamming_distance_matrix,
    ratio_test_match,
    best_percent_mask,
)
from vision_slam_frontend_tpu.ops.brief import detect_and_describe
from vision_slam_frontend_tpu.ops.hamming import match_window


def synthetic_corner_image(seed=0, H=240, W=320):
    """Textured image with strong corners: random rectangles + mild noise."""
    rng = np.random.default_rng(seed)
    img = np.full((H, W), 128.0, np.float32)
    for _ in range(40):
        y, x = rng.integers(20, H - 40), rng.integers(20, W - 40)
        h, w = rng.integers(10, 30, 2)
        val = rng.uniform(0, 255)
        img[y : y + h, x : x + w] = val
    img += rng.normal(0, 2.0, (H, W)).astype(np.float32)
    return np.clip(img, 0, 255).astype(np.uint8)


class TestFast:
    def test_vs_opencv(self):
        cv2 = pytest.importorskip("cv2")
        img = synthetic_corner_image()
        det = cv2.FastFeatureDetector_create(10, True)
        cv_kps = det.detect(img)
        cv_pts = np.array([k.pt for k in cv_kps])  # (N, 2) x,y
        # Exclude the border region our detector masks.
        b = 3
        keep = (
            (cv_pts[:, 0] >= b)
            & (cv_pts[:, 0] < img.shape[1] - b)
            & (cv_pts[:, 1] >= b)
            & (cv_pts[:, 1] < img.shape[0] - b)
        )
        cv_pts = cv_pts[keep]
        kps, scores, valid = fast_detect(
            jnp.asarray(img, jnp.float32), threshold=10.0, max_keypoints=2048, border=3
        )
        ours = np.asarray(kps)[np.asarray(valid)]
        assert len(ours) > 50
        # Every OpenCV corner should have one of ours within 1.5 px.
        d = np.linalg.norm(cv_pts[:, None, :] - ours[None, :, :], axis=-1)
        recall = np.mean(d.min(axis=1) <= 1.5)
        assert recall > 0.9, f"FAST recall vs OpenCV too low: {recall}"
        # And we shouldn't hallucinate wildly: most of ours near an OpenCV corner.
        precision = np.mean(d.min(axis=0) <= 1.5)
        assert precision > 0.9, f"FAST precision vs OpenCV too low: {precision}"

    def test_topk_capacity_and_masks(self):
        img = synthetic_corner_image(1)
        kps, scores, valid = fast_detect(jnp.asarray(img, jnp.float32), max_keypoints=16)
        assert kps.shape == (16, 2)
        assert bool(np.all(np.asarray(scores)[np.asarray(valid)] > 10.0))

    def test_blank_image_no_corners(self):
        img = jnp.full((64, 64), 100.0)
        kps, scores, valid = fast_detect(img, max_keypoints=32)
        assert not bool(np.any(np.asarray(valid)))


class TestOrientation:
    def test_gradient_patch_orientation(self):
        # A patch whose intensity increases along +x has centroid to the right
        # of center: orientation ~ 0. Along +y: ~ pi/2.
        H = W = 64
        xs = np.tile(np.arange(W, dtype=np.float32), (H, 1))
        ys = xs.T
        kp = jnp.array([[32.0, 32.0]])
        v = jnp.array([True])
        th_x = float(compute_orientations(jnp.asarray(xs), kp, v)[0])
        th_y = float(compute_orientations(jnp.asarray(ys), kp, v)[0])
        assert abs(th_x) < 0.05
        assert abs(th_y - np.pi / 2) < 0.05

    def test_rotation_equivariance(self):
        img = synthetic_corner_image(2, H=128, W=128).astype(np.float32)
        # Rotate image by 90 deg CCW; a keypoint at (x, y) maps to (y, W-1-x).
        rot = np.rot90(img).copy()  # rot[i,j] = img[j, W-1-i]
        kp = np.array([[40.0, 57.0]], np.float32)
        v = jnp.array([True])
        th0 = float(compute_orientations(jnp.asarray(img), jnp.asarray(kp), v)[0])
        kp_rot = np.array([[kp[0, 1], img.shape[1] - 1 - kp[0, 0]]], np.float32)
        th1 = float(compute_orientations(jnp.asarray(rot), jnp.asarray(kp_rot), v)[0])
        # Image-axis rotation by 90 CCW (y-down coords) shifts theta by -pi/2.
        diff = (th1 - th0 + np.pi / 2 + np.pi) % (2 * np.pi) - np.pi
        assert abs(diff) < 0.1, f"orientation not equivariant: {th0} vs {th1}"


class TestBrief:
    def test_pack_unpack_roundtrip(self):
        rng = np.random.default_rng(3)
        bits = rng.integers(0, 2, size=(10, 256)).astype(np.float32)
        packed = pack_bits(jnp.asarray(bits))
        assert packed.dtype == jnp.uint32
        unpacked = unpack_bits(packed)
        np.testing.assert_array_equal(np.asarray(unpacked), bits)

    def test_descriptor_stability_under_shift(self):
        """Same world content, image shifted: descriptors should be close."""
        img = synthetic_corner_image(4).astype(np.float32)
        shift = 7
        img2 = np.roll(img, shift, axis=1)  # shift right by 7 px
        kps, scores, desc1, valid = detect_and_describe(jnp.asarray(img), max_keypoints=128)
        kps_np = np.asarray(kps)
        valid_np = np.asarray(valid)
        # Keep keypoints that stay inside the border after shifting.
        ok = valid_np & (kps_np[:, 0] + shift < img.shape[1] - 24)
        kps2 = kps_np.copy()
        kps2[:, 0] += shift
        blurred2 = gaussian_blur(jnp.asarray(img2), 2.0)
        theta2 = compute_orientations(jnp.asarray(img2), jnp.asarray(kps2), jnp.asarray(ok))
        desc2 = brief_describe(blurred2, jnp.asarray(kps2), theta2, jnp.asarray(ok))
        b1 = np.asarray(unpack_bits(desc1))
        b2 = np.asarray(unpack_bits(desc2))
        dist_same = np.sum(b1[ok] != b2[ok], axis=-1)
        # Distances between corresponding descriptors must be far below the
        # random-pair expectation of ~128.
        assert np.median(dist_same) < 40, f"median self-distance {np.median(dist_same)}"


class TestHamming:
    def test_distance_matrix_exact(self):
        rng = np.random.default_rng(5)
        a = rng.integers(0, 2**32, size=(32, 8), dtype=np.uint32)
        b = rng.integers(0, 2**32, size=(48, 8), dtype=np.uint32)
        ours = np.asarray(
            hamming_distance_matrix(unpack_bits(jnp.asarray(a)), unpack_bits(jnp.asarray(b)))
        )
        # numpy reference: popcount of xor
        av = a[:, None, :]
        bv = b[None, :, :]
        x = av ^ bv
        theirs = np.zeros((32, 48), np.int64)
        for w in range(8):
            theirs += np.vectorize(lambda v: bin(v).count("1"))(x[:, :, w])
        np.testing.assert_array_equal(ours.astype(np.int64), theirs)

    def test_knn_ratio_vs_opencv(self):
        cv2 = pytest.importorskip("cv2")
        rng = np.random.default_rng(6)
        # Build train descriptors; queries = perturbed copies (so ratio passes)
        # plus pure noise (so ratio fails).
        Kt, Kq = 64, 64
        train_bits = rng.integers(0, 2, size=(Kt, 256)).astype(np.uint8)
        query_bits = train_bits.copy()
        flip = rng.random((Kq, 256)) < 0.05
        query_bits = query_bits ^ flip
        train_u8 = np.packbits(train_bits, axis=-1, bitorder="little")
        query_u8 = np.packbits(query_bits, axis=-1, bitorder="little")
        matcher = cv2.BFMatcher(cv2.NORM_HAMMING)
        knn = matcher.knnMatch(query_u8, train_u8, k=2)
        cv_matches = {}
        for pair in knn:
            if len(pair) == 2 and pair[0].distance < 0.6 * pair[1].distance:
                cv_matches[pair[0].queryIdx] = (pair[0].trainIdx, pair[0].distance)
        packed_t = jnp.asarray(train_u8.view(np.uint32).reshape(Kt, 8))
        packed_q = jnp.asarray(query_u8.view(np.uint32).reshape(Kq, 8))
        vt = jnp.ones(Kt, bool)
        vq = jnp.ones(Kq, bool)
        idx, dist, matched = ratio_test_match(packed_q, vq, packed_t, vt, 0.6)
        ours = {
            int(i): (int(idx[i]), float(dist[i]))
            for i in range(Kq)
            if bool(matched[i])
        }
        assert set(ours.keys()) == set(cv_matches.keys())
        for k in ours:
            assert ours[k][0] == cv_matches[k][0]
            assert abs(ours[k][1] - cv_matches[k][1]) < 1e-3

    def test_best_percent(self):
        dist = jnp.asarray(np.array([5.0, 1.0, 3.0, 2.0, 4.0], np.float32))
        matched = jnp.asarray(np.array([True, True, True, True, False]))
        keep = np.asarray(best_percent_mask(dist, matched, 0.5))
        # floor(4 * 0.5) = 2 best among matched: distances 1.0 and 2.0.
        np.testing.assert_array_equal(keep, [False, True, False, True, False])

    def test_match_window_batches(self):
        rng = np.random.default_rng(7)
        W, K = 3, 32
        base = rng.integers(0, 2**32, size=(K, 8), dtype=np.uint32)
        window = np.stack([base, base, rng.integers(0, 2**32, size=(K, 8), dtype=np.uint32)])
        valid_w = np.ones((W, K), bool)
        valid_c = np.ones(K, bool)
        idx, dist, matched = match_window(
            jnp.asarray(window), jnp.asarray(valid_w), jnp.asarray(base),
            jnp.asarray(valid_c), 0.6, 1.0,
        )
        idx, matched = np.asarray(idx), np.asarray(matched)
        # Frames 0/1 are identical to current: every feature matches itself.
        assert matched[0].all() and matched[1].all()
        np.testing.assert_array_equal(idx[0], np.arange(K))
        np.testing.assert_array_equal(idx[1], np.arange(K))
        # Random frame 2: essentially no ratio-test survivors.
        assert matched[2].sum() < K // 4


class TestBriefMethods:
    def test_gather_mxu_equivalence(self):
        """The two brief_describe implementations must produce (near-)identical
        bits — 'mxu' compares in bf16, so allow a few near-tie flips."""
        img = synthetic_corner_image(4).astype(np.float32)
        blurred = gaussian_blur(jnp.asarray(img), 2.0)
        kps, scores, valid = __import__(
            "vision_slam_frontend_tpu.ops.fast", fromlist=["fast_detect"]
        ).fast_detect(jnp.asarray(img), max_keypoints=64, border=19)
        theta = compute_orientations(jnp.asarray(img), kps, valid)
        d_g = brief_describe(blurred, kps, theta, valid, method="gather")
        d_m = brief_describe(blurred, kps, theta, valid, method="mxu")
        bg = np.asarray(unpack_bits(d_g))
        bm = np.asarray(unpack_bits(d_m))
        v = np.asarray(valid)
        dist = np.sum(bg[v] != bm[v], axis=-1)
        assert dist.max() <= 2, f"gather/mxu bit disagreement up to {dist.max()}"

    def test_fused_orient_and_describe_matches_composition(self):
        """orient_and_describe (one 2-channel patch extraction + the
        quadrant-factored fine-bin matmul) must reproduce the separate
        compute_orientations + brief_describe(mxu) composition exactly —
        all four 90-degree quadrants exercised."""
        from vision_slam_frontend_tpu.ops.brief import orient_and_describe

        rng = np.random.RandomState(3)
        # Random texture: orientations land in every quadrant.
        img = rng.uniform(0, 255, size=(240, 320)).astype(np.float32)
        img = np.asarray(gaussian_blur(jnp.asarray(img), 1.0))
        kps = jnp.asarray(
            np.stack(
                [
                    rng.uniform(20, 300, size=96),
                    rng.uniform(20, 220, size=96),
                ],
                axis=-1,
            ).astype(np.float32)
        )
        valid = jnp.asarray(rng.rand(96) > 0.1)
        blurred = gaussian_blur(jnp.asarray(img), 2.0)
        theta_f, desc_f = orient_and_describe(jnp.asarray(img), blurred, kps, valid)
        # Composition convention matches the fused path: orientation from
        # the BLURRED image (equally rotation-covariant, single-channel
        # gather — see orient_and_describe's docstring).
        theta_s = compute_orientations(blurred, kps, valid)
        desc_s = brief_describe(blurred, kps, theta_s, valid, method="mxu")
        np.testing.assert_allclose(
            np.asarray(theta_f), np.asarray(theta_s), atol=1e-5
        )
        from vision_slam_frontend_tpu.ops.brief import quantize_angle

        quads = np.asarray(quantize_angle(theta_s)) // 8
        assert set(quads[np.asarray(valid)].tolist()) == {0, 1, 2, 3}
        bf = np.asarray(unpack_bits(desc_f))
        bs = np.asarray(unpack_bits(desc_s))
        v = np.asarray(valid)
        dist = np.sum(bf[v] != bs[v], axis=-1)
        assert dist.max() <= 2, f"fused/split bit disagreement up to {dist.max()}"

    def test_quadrant_factored_equals_allbins(self):
        """_describe_bits_mxu (8 fine bins + 90deg patch rotation) must be
        bit-identical to evaluating the full 32-bin pattern table directly
        (the pre-round-3 formulation), for every bin."""
        from vision_slam_frontend_tpu.ops.brief import (
            _ROT_A,
            _ROT_B,
            _describe_bits_mxu,
            PATCH_AREA,
        )

        rng = np.random.RandomState(0)
        K = 64
        patches = jnp.asarray(rng.uniform(0, 255, size=(K, PATCH_AREA)).astype(np.float32))
        bins = jnp.asarray(rng.randint(0, 32, size=K).astype(np.int32))
        got = np.asarray(_describe_bits_mxu(patches, bins))
        # Direct all-bins evaluation in f64 (exact) as the oracle.
        pn = np.asarray(patches, np.float64)
        a = _ROT_A[np.asarray(bins)]  # (K, 256)
        b = _ROT_B[np.asarray(bins)]
        va = np.take_along_axis(pn, a, axis=1)
        vb = np.take_along_axis(pn, b, axis=1)
        want = (va - vb < 0).astype(np.uint32)
        mismatches = (got != want).sum(axis=1)
        assert mismatches.max() <= 2, f"quadrant factoring broke bits: {mismatches.max()}"

    def test_quantize_angle(self):
        from vision_slam_frontend_tpu.ops.brief import NUM_BINS, quantize_angle

        th = jnp.asarray([0.0, np.pi / 2, np.pi, -np.pi / 2, 2 * np.pi])
        b = np.asarray(quantize_angle(th))
        assert b[0] == 0 and b[1] == NUM_BINS // 4 and b[2] == NUM_BINS // 2
        assert b[3] == 3 * NUM_BINS // 4 and b[4] == 0
        assert ((0 <= b) & (b < NUM_BINS)).all()


class TestDescriptorRegistry:
    """The extractor-switch seam (ops/descriptors.py): the reference's
    six-way descriptor switch (src/slam_frontend.cc:188-248) scoped to the
    ORB family, with the registry left open for more."""

    def test_orb_registered_and_resolves(self):
        from vision_slam_frontend_tpu.ops.brief import detect_and_describe
        from vision_slam_frontend_tpu.ops.descriptors import (
            get_family,
            registered_families,
        )

        assert "orb" in registered_families()
        fam = get_family("ORB")  # case-insensitive
        assert fam.extractor is detect_and_describe
        assert fam.distance == "hamming"
        assert fam.words == 8

    def test_unknown_family_lists_menu(self):
        import pytest

        from vision_slam_frontend_tpu.ops.descriptors import get_family

        # surf: the one reference extractor name deliberately out of scope
        # (README: sift covers its float/L2 class) — must fail with the menu.
        with pytest.raises(ValueError, match="registered.*orb"):
            get_family("surf")

    def test_config_validates_family(self):
        import pytest

        from vision_slam_frontend_tpu.frontend.config import FrontendConfig

        with pytest.raises(ValueError, match="unknown descriptor family"):
            FrontendConfig(descriptor_family="surf64")

    def test_registered_family_drives_keyframe_step(self):
        """A newly registered family is reachable through the jitted keyframe
        step purely via config — the switch is real, not cosmetic."""
        import jax.numpy as jnp

        from vision_slam_frontend_tpu.frontend.keyframe import (
            StepParams,
            WindowState,
            keyframe_step,
        )
        from vision_slam_frontend_tpu.frontend.config import FrontendConfig
        from vision_slam_frontend_tpu.ops.brief import detect_and_describe
        from vision_slam_frontend_tpu.ops.descriptors import (
            _REGISTRY,
            register_family,
        )

        calls = []

        def traced_extractor(image, **kw):
            calls.append(image.shape)
            return detect_and_describe(image, **kw)

        register_family("traced", traced_extractor)
        try:
            config = FrontendConfig(descriptor_family="traced", max_features=64)
            params = StepParams.from_config(config)
            state = WindowState.create(3, 64, config.stereo_threshold_init)
            import numpy as np

            rng = np.random.default_rng(0)
            img = jnp.asarray(rng.uniform(0, 255, (96, 128)), jnp.float32)
            _, result = keyframe_step(
                params, state, img, img, jnp.int32(0), capacity=64, window=3,
                descriptor_family="traced",
            )
            assert len(calls) == 2  # left + right went through the registry
        finally:
            _REGISTRY.pop("traced", None)


class TestHighKMatching:
    """Large-K matching paths: the streamed blocked top-2 and the sort+cumsum
    best-percent cut must reproduce the reference formulations bit-for-bit
    (they dispatch by K inside jit, so drift would be silent)."""

    def _random_descs(self, K, seed):
        rng = np.random.default_rng(seed)
        return jnp.asarray(rng.integers(0, 2**32, (K, 8), dtype=np.uint32))

    def test_streamed_knn2_matches_dense(self):
        from vision_slam_frontend_tpu.ops.brief import unpack_bits
        from vision_slam_frontend_tpu.ops.hamming import (
            _knn2_match_streamed,
            hamming_distance_matrix,
            knn2_match,
        )

        rng = np.random.default_rng(3)
        dq = self._random_descs(512, 1)
        dt = self._random_descs(2048, 2)
        valid_t = jnp.asarray(rng.uniform(size=2048) < 0.9)
        bq, bt = unpack_bits(dq), unpack_bits(dt)
        i_ref, d1_ref, d2_ref = knn2_match(
            hamming_distance_matrix(bq, bt), valid_t
        )
        i_s, d1_s, d2_s = _knn2_match_streamed(bq, bt, valid_t, block=512)
        np.testing.assert_array_equal(np.asarray(d1_s), np.asarray(d1_ref))
        np.testing.assert_array_equal(np.asarray(d2_s), np.asarray(d2_ref))
        # Ties in integer Hamming distances are possible across blocks; both
        # formulations must pick the LOWEST index.
        np.testing.assert_array_equal(np.asarray(i_s), np.asarray(i_ref))

    def test_knn2_tie_picks_lowest_index(self):
        from vision_slam_frontend_tpu.ops.hamming import knn2_match

        dist = jnp.asarray(
            np.array([[5.0, 3.0, 3.0, 7.0], [2.0, 2.0, 2.0, 2.0]], np.float32)
        )
        valid = jnp.ones(4, bool)
        idx, d1, d2 = knn2_match(dist, valid)
        np.testing.assert_array_equal(np.asarray(idx), [1, 0])
        np.testing.assert_array_equal(np.asarray(d1), [3.0, 2.0])
        np.testing.assert_array_equal(np.asarray(d2), [3.0, 2.0])

    def test_best_percent_large_k_matches_counting(self):
        from vision_slam_frontend_tpu.ops.hamming import best_percent_mask

        rng = np.random.default_rng(7)
        K = 4096  # > the 1024 counting/sort dispatch threshold
        # INTEGER distances: heavy ties, the hard case for cut-value logic.
        dist = jnp.asarray(rng.integers(0, 40, K).astype(np.float32))
        matched = jnp.asarray(rng.uniform(size=K) < 0.6)
        got = np.asarray(best_percent_mask(dist, matched, 0.3))

        # Reference: the O(K^2) stable counting rank, in numpy.
        d = np.where(np.asarray(matched), np.asarray(dist), 1e9)
        less = d[None, :] < d[:, None]
        idx = np.arange(K)
        tie = (d[None, :] == d[:, None]) & (idx[None, :] < idx[:, None])
        ranks = (less | tie).sum(axis=1)
        num_good = int(np.asarray(matched).sum() * 0.3)
        want = np.asarray(matched) & (ranks < num_good)
        np.testing.assert_array_equal(got, want)
        assert got.sum() == num_good  # the cut keeps exactly num_good

    def test_best_percent_large_k_zero_matches(self):
        from vision_slam_frontend_tpu.ops.hamming import best_percent_mask

        dist = jnp.zeros(2048, jnp.float32)
        matched = jnp.zeros(2048, bool)
        got = np.asarray(best_percent_mask(dist, matched, 0.3))
        assert not got.any()

    def test_match_window_large_k_dispatch(self):
        """match_window at K=2048+ (streamed path) agrees with the dense
        formulation forced via a non-1024-multiple padding."""
        from vision_slam_frontend_tpu.ops.hamming import match_window

        rng = np.random.default_rng(11)
        W, K = 3, 3072
        dw = jnp.asarray(rng.integers(0, 2**32, (W, K, 8), dtype=np.uint32))
        dc = jnp.asarray(rng.integers(0, 2**32, (K, 8), dtype=np.uint32))
        vw = jnp.asarray(rng.uniform(size=(W, K)) < 0.8)
        vc = jnp.asarray(rng.uniform(size=K) < 0.8)
        idx_s, dist_s, m_s = match_window(dw, vw, dc, vc, 0.9, 0.5)
        # Dense reference: pad the train set by one slot (K+... keeps K
        # below/off the stream dispatch) — instead just call the dense pieces.
        from vision_slam_frontend_tpu.ops.brief import unpack_bits
        from vision_slam_frontend_tpu.ops.hamming import (
            best_percent_mask,
            hamming_distance_matrix,
            knn2_match,
        )
        import jax

        bq = jax.vmap(unpack_bits)(dw)
        bt = unpack_bits(dc)
        dist = hamming_distance_matrix(bq.reshape(W * K, -1), bt).reshape(W, K, K)
        bi, d1, d2 = jax.vmap(lambda d: knn2_match(d, vc))(dist)
        matched = vw & (d1 < 0.9 * d2) & (d1 < 300.0)
        d1m = jnp.where(matched, d1, 1e9)
        keep = jax.vmap(lambda d, m: best_percent_mask(d, m, 0.5))(d1m, matched)
        np.testing.assert_array_equal(np.asarray(m_s), np.asarray(keep))
        np.testing.assert_array_equal(
            np.asarray(idx_s)[np.asarray(m_s)], np.asarray(bi)[np.asarray(keep)]
        )
