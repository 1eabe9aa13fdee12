"""Pallas kernel parity tests (interpret mode on CPU; compiled path on TPU)."""

import numpy as np
import jax.numpy as jnp

from vision_slam_frontend_tpu.ops.brief import unpack_bits
from vision_slam_frontend_tpu.ops.hamming import hamming_distance_matrix, knn2_match
from vision_slam_frontend_tpu.ops.pallas_kernels import hamming_top2


class TestHammingTop2:
    def _check(self, kq, kt, seed, invalid_frac=0.0, words=8):
        rng = np.random.default_rng(seed)
        q = jnp.asarray(rng.integers(0, 2**32, (kq, words), dtype=np.uint32))
        t = jnp.asarray(rng.integers(0, 2**32, (kt, words), dtype=np.uint32))
        vt = jnp.asarray(rng.random(kt) >= invalid_frac)
        idx_p, d1_p, d2_p = hamming_top2(q, t, vt, interpret=True)
        dist = hamming_distance_matrix(unpack_bits(q), unpack_bits(t))
        idx_x, d1_x, d2_x = knn2_match(dist, vt)
        real1 = np.asarray(d1_x) < 1e8  # both paths use different "infinities"
        np.testing.assert_array_equal(np.asarray(idx_p)[real1], np.asarray(idx_x)[real1])
        np.testing.assert_array_equal(np.asarray(d1_p)[real1], np.asarray(d1_x)[real1])
        real2 = np.asarray(d2_x) < 1e8
        np.testing.assert_array_equal(np.asarray(d2_p)[real2], np.asarray(d2_x)[real2])

    def test_square(self):
        self._check(256, 128, 0)

    def test_multi_program(self):
        self._check(1280, 256, 1)

    def test_with_invalid_train(self):
        self._check(256, 256, 2, invalid_frac=0.3)

    def test_words16_brisk_width(self):
        # 512-bit BRISK-class descriptors: 16 packed words per row.
        self._check(256, 128, 4, words=16)

    def test_words16_with_invalid(self):
        self._check(256, 256, 5, invalid_frac=0.3, words=16)

    def test_mxu_kernel_parity(self):
        """hamming_top2_mxu (+-1 bf16 matmul tiles, fused top-2) must agree
        with the XLA path exactly for valid trains, both widths."""
        from vision_slam_frontend_tpu.ops.pallas_kernels import hamming_top2_mxu

        for kq, kt, words, frac, seed in (
            (256, 512, 8, 0.0, 0),
            (2048, 1024, 8, 0.3, 1),
            (256, 512, 16, 0.2, 2),
        ):
            rng = np.random.default_rng(seed)
            q = jnp.asarray(rng.integers(0, 2**32, (kq, words), dtype=np.uint32))
            t = jnp.asarray(rng.integers(0, 2**32, (kt, words), dtype=np.uint32))
            vt = jnp.asarray(rng.random(kt) >= frac)
            idx_p, d1_p, d2_p = hamming_top2_mxu(q, t, vt, interpret=True)
            dist = hamming_distance_matrix(unpack_bits(q), unpack_bits(t))
            idx_x, d1_x, d2_x = knn2_match(dist, vt)
            real1 = np.asarray(d1_x) < 1e8
            np.testing.assert_array_equal(
                np.asarray(idx_p)[real1], np.asarray(idx_x)[real1]
            )
            np.testing.assert_array_equal(
                np.asarray(d1_p)[real1], np.asarray(d1_x)[real1]
            )
            real2 = np.asarray(d2_x) < 1e8
            np.testing.assert_array_equal(
                np.asarray(d2_p)[real2], np.asarray(d2_x)[real2]
            )

    def test_all_invalid_train(self):
        rng = np.random.default_rng(3)
        q = jnp.asarray(rng.integers(0, 2**32, (128, 8), dtype=np.uint32))
        t = jnp.asarray(rng.integers(0, 2**32, (128, 8), dtype=np.uint32))
        vt = jnp.zeros(128, bool)
        idx_p, d1_p, d2_p = hamming_top2(q, t, vt, interpret=True)
        # All distances are the sentinel; a ratio test at any ratio < 1 fails.
        assert np.all(np.asarray(d1_p) >= np.asarray(d2_p) * 0.99)


class TestFastScoresNms:
    def _xla_ref(self, img):
        import jax.numpy as jnp

        from vision_slam_frontend_tpu.ops.fast import fast_scores

        s = np.asarray(fast_scores(jnp.asarray(img)))
        H, W = s.shape
        padded = np.full((H + 2, W + 2), -np.inf)
        padded[1:-1, 1:-1] = s
        neigh = np.full((H, W), -np.inf)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                neigh = np.maximum(neigh, padded[1 + dy : 1 + dy + H, 1 + dx : 1 + dx + W])
        return np.where(s > neigh, s, -np.inf)

    def test_parity_interpret(self):
        import numpy as np

        from tests.test_ops import synthetic_corner_image
        from vision_slam_frontend_tpu.ops.pallas_kernels import fast_scores_nms

        img = synthetic_corner_image(1, H=96, W=128).astype(np.float32)
        raw, supp = fast_scores_nms(img, interpret=True)
        ours = np.asarray(supp)
        ref = self._xla_ref(img)
        b = 5  # padding modes differ at the image border (edge vs zero)
        a_in, r_in = ours[b:-b, b:-b], ref[b:-b, b:-b]
        np.testing.assert_array_equal(np.isfinite(a_in), np.isfinite(r_in))
        m = np.isfinite(a_in)
        np.testing.assert_allclose(a_in[m], r_in[m])
        # Raw (unsuppressed) scores match the XLA fast_scores interior too.
        from vision_slam_frontend_tpu.ops.fast import fast_scores

        raw_ref = np.asarray(fast_scores(img))
        np.testing.assert_allclose(
            np.asarray(raw)[b:-b, b:-b], raw_ref[b:-b, b:-b]
        )

    def test_nonmultiple_height(self):
        import numpy as np

        from vision_slam_frontend_tpu.ops.pallas_kernels import fast_scores_nms

        rng = np.random.default_rng(2)
        img = rng.uniform(0, 255, (50, 128)).astype(np.float32)
        raw, supp = fast_scores_nms(img, interpret=True)
        assert np.asarray(raw).shape == (50, 128)
        assert np.asarray(supp).shape == (50, 128)


class TestExtractPatchesVmem:
    """VMEM-resident patch extraction (ops/pallas_kernels.extract_patches_vmem)
    vs the XLA slab-gather reference (ops/brief.extract_patches): exact value
    parity including the explicit start clamping, at several image shapes and
    keypoint edge cases."""

    def test_parity_interpret(self):
        import jax.numpy as jnp

        from vision_slam_frontend_tpu.ops.brief import extract_patches
        from vision_slam_frontend_tpu.ops.pallas_kernels import (
            extract_patches_vmem,
        )

        rng = np.random.default_rng(0)
        for H, W, K, blk in ((480, 640, 256, 64), (96, 128, 64, 32), (50, 130, 32, 32)):
            img = rng.uniform(0, 255, (H, W)).astype(np.float32)
            img2 = rng.uniform(0, 255, (H, W)).astype(np.float32)
            kps = np.concatenate(
                [
                    rng.uniform(0, [W, H], (K - 8, 2)),
                    np.array(
                        [
                            [0, 0], [W - 1, H - 1], [5, 5], [W - 3, 7],
                            [2, H - 2], [W / 2 + 0.4, H / 2 + 0.6],
                            [15.5, 15.4], [W - 0.1, H - 0.1],
                        ]
                    ),
                ]
            ).astype(np.float32)
            stacked = jnp.stack([jnp.asarray(img), jnp.asarray(img2)], axis=-1)
            ref = np.asarray(extract_patches(stacked, jnp.asarray(kps)))
            out = np.asarray(
                extract_patches_vmem(
                    jnp.stack([jnp.asarray(img), jnp.asarray(img2)]),
                    jnp.asarray(kps), block=blk, interpret=True,
                )
            )
            np.testing.assert_array_equal(out[:, 0], ref[..., 0])
            np.testing.assert_array_equal(out[:, 1], ref[..., 1])

    def test_brisk_patch_size(self):
        """ps=27 (BRISK plane patches), C=5 channels."""
        import jax.numpy as jnp

        from vision_slam_frontend_tpu.ops.pallas_kernels import (
            extract_patches_vmem,
        )

        rng = np.random.default_rng(1)
        H, W, K, C = 120, 160, 32, 5
        imgs = rng.uniform(0, 255, (C, H, W)).astype(np.float32)
        kps = rng.uniform([16, 16], [W - 16, H - 16], (K, 2)).astype(np.float32)
        out = np.asarray(
            extract_patches_vmem(
                jnp.asarray(imgs), jnp.asarray(kps), ps=27, block=32,
                interpret=True,
            )
        )
        assert out.shape == (K, C, 27 * 27)
        # Spot-check one keypoint against numpy.
        x, y = np.round(kps[3]).astype(int)
        sy, sx = np.clip(y - 13, 0, H - 27), np.clip(x - 13, 0, W - 27)
        np.testing.assert_array_equal(
            out[3, 2].reshape(27, 27), imgs[2, sy : sy + 27, sx : sx + 27]
        )
