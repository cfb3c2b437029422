"""Transform golden-value tests (encode/decode geometry parity).

The reference ships no transform tests; these pin the formulas cited in
SURVEY.md §2 (pixel_std=200 center/scale, affine round trips, UDP warp,
Gaussian encode peak placement, flip-pair index math).
"""
import numpy as np
import pytest

from mindpose_tpu.data.transform.topdown_transform import (
    TopDownAffine,
    TopDownBoxToCenterScale,
    TopDownGenerateTarget,
    TopDownHorizontalRandomFlip,
)
from mindpose_tpu.data.transform.utils import (
    affine_transform,
    fliplr_joints,
    flip_index_from_pairs,
    get_affine_transform,
    get_warp_matrix,
    transform_keypoints,
    warp_affine_joints,
)

CONFIG = {
    "image_size": [192, 256],
    "heatmap_size": [48, 64],
    "pixel_std": 200.0,
    "scale_padding": 1.25,
    "flip_pairs": [[1, 2], [3, 4], [5, 6], [7, 8], [9, 10], [11, 12], [13, 14], [15, 16]],
    "upper_body_ids": [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10],
}


def test_flip_index_from_pairs():
    idx = flip_index_from_pairs(CONFIG["flip_pairs"])
    np.testing.assert_array_equal(
        idx, [0, 2, 1, 4, 3, 6, 5, 8, 7, 10, 9, 12, 11, 14, 13, 16, 15]
    )


def test_fliplr_joints():
    kpts = np.array([[10.0, 5.0], [20.0, 6.0], [30.0, 7.0]])
    flipped = fliplr_joints(kpts, 100, flip_pairs=[(1, 2)])
    # joint 1 takes joint 2's coords (and vice versa), then x -> 99 - x
    np.testing.assert_allclose(flipped[0], [89.0, 5.0])
    np.testing.assert_allclose(flipped[1], [69.0, 7.0])
    np.testing.assert_allclose(flipped[2], [79.0, 6.0])


def test_get_affine_transform_identity_center():
    # center maps to output center
    center = np.array([100.0, 150.0])
    scale = np.array([1.0, 1.0])  # 200 x 200 box
    trans = get_affine_transform(center, scale, 0.0, (192, 256))
    out = affine_transform(center, trans)
    np.testing.assert_allclose(out, [96.0, 128.0], atol=1e-4)
    # a point half a box-width right of center maps to the right edge region
    out2 = affine_transform(center + [100.0, 0.0], trans)
    np.testing.assert_allclose(out2, [96.0 + 96.0, 128.0], atol=1e-4)


def test_get_affine_transform_rotation():
    center = np.array([50.0, 50.0])
    scale = np.array([0.5, 0.5])
    trans = get_affine_transform(center, scale, 90.0, (100, 100))
    # reference convention: at rot=90 the src second point is center+[w/2, 0]
    # and maps to dst center+[0, -dst_w/2] — right of center -> above center
    out = affine_transform(center + [25.0, 0.0], trans)
    np.testing.assert_allclose(out, [50.0, 50.0 - 25.0], atol=1e-4)


def test_affine_inverse_round_trip():
    center = np.array([123.0, 77.0])
    scale = np.array([0.9, 1.4])
    fwd = get_affine_transform(center, scale, 30.0, (48, 64))
    inv = get_affine_transform(center, scale, 30.0, (48, 64), inv=True)
    pt = np.array([20.0, 30.0])
    back = affine_transform(affine_transform(pt, inv), fwd)
    np.testing.assert_allclose(back, pt, atol=1e-3)


def test_udp_warp_matrix_corners():
    # UDP: with no rotation, the ROI maps corner-to-corner with (size-1) scaling
    size_input = np.array([200.0, 200.0])
    size_dst = np.array([47.0, 63.0])  # image_size - 1
    size_target = np.array([200.0, 200.0])
    mat = get_warp_matrix(0.0, size_input, size_dst, size_target)
    c0 = warp_affine_joints(np.array([[0.0, 0.0]]), mat)[0]
    c1 = warp_affine_joints(np.array([[200.0, 200.0]]), mat)[0]
    np.testing.assert_allclose(c1 - c0, size_dst, atol=1e-4)


def test_box_to_center_scale():
    t = TopDownBoxToCenterScale(is_train=False, config=CONFIG)
    state = {"boxes": np.array([50.0, 100.0, 100.0, 50.0])}
    out = t.transform(state)
    np.testing.assert_allclose(out["center"], [100.0, 125.0])
    # aspect ratio 192/256 = 0.75; w=100 > 0.75*h=37.5 -> h = 100/0.75
    expected_scale = np.array([100.0 / 200.0, (100.0 / 0.75) / 200.0]) * 1.25
    np.testing.assert_allclose(out["scale"], expected_scale, rtol=1e-6)


def test_generate_target_peak_position():
    t = TopDownGenerateTarget(is_train=True, config=CONFIG, sigma=2.0)
    kpts = np.zeros((17, 3), np.float32)
    kpts[0] = [96.0, 128.0, 1.0]  # image center
    out = t.transform({"keypoints": kpts})
    target = out["target"]  # [H, W, K]
    assert target.shape == (64, 48, 17)
    y, x = np.unravel_index(np.argmax(target[:, :, 0]), (64, 48))
    # feat_stride = 4 -> peak at (24, 32)
    assert (x, y) == (24, 32)
    assert target[:, :, 0].max() == 1.0
    assert out["target_weight"][0] == 1.0
    assert out["target_weight"][1] == 0.0  # invisible joint


def test_generate_target_udp_subpixel():
    t = TopDownGenerateTarget(is_train=True, config=CONFIG, sigma=2.0, use_udp=True)
    kpts = np.zeros((17, 3), np.float32)
    kpts[0] = [95.0, 127.0, 1.0]
    out = t.transform({"keypoints": kpts})
    target = out["target"]
    # UDP: kernel centered at the exact sub-pixel position -> max < 1 unless
    # the position falls on the grid
    feat_stride = (np.array([192, 256]) - 1.0) / (np.array([48, 64]) - 1.0)
    mu = kpts[0, :2] / feat_stride
    if not np.allclose(mu, np.round(mu)):
        assert target[:, :, 0].max() < 1.0 + 1e-6


def test_topdown_affine_maps_keypoints():
    t = TopDownAffine(is_train=False, config=CONFIG)
    img = np.zeros((300, 300, 3), np.uint8)
    state = {
        "image": img,
        "center": np.array([150.0, 150.0]),
        "scale": np.array([0.96, 1.28]),
        "rotation": 0.0,
        "keypoints": np.array([[150.0, 150.0, 1.0]] * 2, np.float32),
    }
    out = t.transform(state)
    assert out["image"].shape == (256, 192, 3)
    np.testing.assert_allclose(out["keypoints"][0, :2], [96.0, 128.0], atol=1e-3)


def test_transform_keypoints_round_trip():
    # decoder-side transform: heatmap coords -> original frame
    coords = [np.array([[[24.0, 32.0, 0.9]]])]  # [M=1, K=1, 3]
    center = np.array([[100.0, 125.0]])
    scale = np.array([[0.48, 0.64]])
    heatmap_shape = np.array([[48.0, 64.0]])
    out = transform_keypoints(coords, center, scale, heatmap_shape)
    # scale*200 = (96, 128); coords at heatmap center -> original center
    np.testing.assert_allclose(out[0][0, 0, :2], [100.0, 125.0], atol=1e-4)


def test_random_flip_train_consistency():
    t = TopDownHorizontalRandomFlip(is_train=True, config=CONFIG, flip_prob=1.0)
    img = np.random.randint(0, 255, (64, 48, 3), np.uint8)
    kpts = np.zeros((17, 3), np.float32)
    kpts[1] = [10.0, 20.0, 1.0]
    state = {"image": img.copy(), "keypoints": kpts.copy(),
             "center": np.array([24.0, 32.0])}
    out = t.transform(state)
    # joint 1 (left eye) swaps to joint 2 slot and mirrors
    np.testing.assert_allclose(out["keypoints"][2, :2], [48 - 1 - 10.0, 20.0])
    np.testing.assert_allclose(out["image"], img[:, ::-1, :])
