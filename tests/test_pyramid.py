"""Multi-scale pyramid detection: scale covariance the single level lacks."""

import numpy as np
import jax.numpy as jnp

from tests.test_ops import synthetic_corner_image
from vision_slam_frontend_tpu.ops.brief import detect_and_describe
from vision_slam_frontend_tpu.ops.hamming import ratio_test_match


def _match_count(img_a, img_b, num_levels):
    ka, sa, da, va = detect_and_describe(
        jnp.asarray(img_a), threshold=12.0, max_keypoints=256, num_levels=num_levels
    )
    kb, sb, db, vb = detect_and_describe(
        jnp.asarray(img_b), threshold=12.0, max_keypoints=256, num_levels=num_levels
    )
    idx, dist, matched = ratio_test_match(da, va, db, vb, 0.7)
    return int(np.sum(np.asarray(matched)))


def test_pyramid_shapes_and_validity():
    img = synthetic_corner_image(0).astype(np.float32)
    kps, scores, desc, valid = detect_and_describe(
        jnp.asarray(img), threshold=12.0, max_keypoints=256, num_levels=4
    )
    assert kps.shape == (256, 2)
    assert desc.shape == (256, 8)
    v = np.asarray(valid)
    assert v.sum() > 100
    # Coarse-level keypoints exist and land inside the image at level-0 scale.
    k = np.asarray(kps)[v]
    assert (k[:, 0] < img.shape[1]).all() and (k[:, 1] < img.shape[0]).all()
    # Each quarter of the output (one pyramid level) contributes keypoints.
    per_level = v.reshape(4, 64).sum(axis=1)
    assert (per_level > 10).all(), per_level


def test_pyramid_survives_scale_change():
    """Match a scene against its 1.6x-zoomed version: the pyramid must find
    substantially more matches than single-scale BRIEF."""
    import cv2

    img = synthetic_corner_image(3, H=320, W=400).astype(np.float32)
    zoomed = cv2.resize(img, None, fx=1.6, fy=1.6, interpolation=cv2.INTER_LINEAR)
    zoomed = zoomed[:320, :400]  # crop back to same canvas

    mono = _match_count(img, zoomed, num_levels=1)
    pyr = _match_count(img, zoomed, num_levels=4)
    assert pyr > max(2 * mono, 20), f"pyramid {pyr} vs single-scale {mono}"


def test_frontend_runs_with_pyramid():
    from vision_slam_frontend_tpu.frontend import Frontend, FrontendConfig
    from vision_slam_frontend_tpu.io.synthetic import SyntheticRig, generate_sequence

    rig = SyntheticRig()
    config = FrontendConfig(
        calib=rig.calib(), max_features=192, frame_life=3, fast_threshold=12.0,
        num_levels=3,
    )
    fe = Frontend(config)
    for f in generate_sequence(num_frames=5, step=0.25, rig=rig):
        fe.observe_odometry(f.odom_translation, f.odom_rotation, f.timestamp)
        fe.observe_image(f.left, f.right, f.timestamp)
    problem = fe.get_slam_problem()
    assert len(problem.nodes) == 4
    assert all(len(n.features) > 20 for n in problem.nodes)
